package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model operators for corpus quality filtering and
  * target-distribution data selection — the two classic "model-based"
  * passes of a training-data pipeline that are still expressible as pure
  * relational algebra, because the "model" is just an n-gram count table:
  *
  *   - [[bigramScore]]: per-document mean bigram log-likelihood under a
  *     corpus-trained add-k-smoothed bigram LM (the KenLM-style
  *     perplexity quality filter — low-likelihood documents are gibberish
  *     or boilerplate relative to the corpus distribution).
  *   - [[importanceWeights]]: DSIR-style importance weights (Xie et al.,
  *     "Data Selection for Language Models via Importance Resampling"):
  *     score raw-pool documents by Σ_f c_f(doc)·ln(p_target(f)/p_raw(f))
  *     over bigram features, so the raw documents that look most like the
  *     target domain rank first. `featureBuckets > 0` switches to the
  *     paper's actual estimator — HASHED n-gram features: bigrams are
  *     hashed into a fixed bucket space before counting, so the model is
  *     bounded by construction (2^k rows regardless of corpus size) and
  *     always broadcast-safe. The raw-bigram feature map stays available
  *     at `featureBuckets = 0` for exact-feature analyses.
  *
  * Scale shape (both): ONE exploded shuffle builds the count table
  * (partial-aggregated map-side, key space = corpus vocabulary, not
  * corpus size). The fitted model is NOT blindly broadcast: it is staged
  * once ([[Staged]]), its row count checked against `maxModelRows`, and
  * only a bounded model gets the broadcast hint — an open-vocabulary
  * model on a 100 TB corpus has billions of bigram rows, and a forced
  * broadcast there is an executor OOM, not a plan. Past the threshold the
  * probe runs as a shuffled hash join on the gram key — linear, no
  * driver/executor residency requirement ([[LmSpec]] pins the non-
  * broadcast plan and its output parity with the broadcast path).
  * `minCount` optionally prunes rare grams from the model first (the
  * KenLM pruning knob); pruned grams fall back to the unseen-gram path of
  * the same null-safe join. The corpus itself is shuffled only on the
  * document id for the final fold.
  *
  * Cross-engine contract: tokenization is `TextOps.tokens(lower(text))`
  * (the BM25 convention), counts are exact integers, hashed features use
  * the established md5-hex arithmetic (`q_shuffle_shards` precedent), and
  * scores round to 4 decimals so the DuckDB oracle hash-matches (the
  * established `q_text_bm25` float protocol).
  */
object Lm {

  /** Above this many model rows the broadcast hint is dropped and the
    * model probe runs as a shuffled hash join. Sized so the broadcast
    * stays comfortably inside a default executor: ~2M gram rows × ~50 B
    * ≈ 100 MB built once per executor.
    */
  val DefaultMaxModelRows: Long = 2L * 1000 * 1000

  private def lowerToks(textCol: String): Column =
    TextOps.tokens(lower(col(textCol)))

  /** Stage the fitted model once and pick the probe-side strategy by its
    * actual size: bounded → broadcast hint; unbounded → shuffled hash
    * join (the hint pins the join shape so AQE cannot silently flip a
    * huge build side back to broadcast, and a sort on the gram key is
    * never needed). The staged count costs one scan of the model parquet
    * (vocabulary-sized, not corpus-sized), not a recompute of the corpus
    * aggregation — and the staging write is itself what lets the count
    * and the probe share one computation of the model.
    */
  private def boundedModel(model: DataFrame, maxModelRows: Long): DataFrame = {
    require(maxModelRows > 0, s"maxModelRows $maxModelRows must be positive")
    val staged = Staged.materialize(model)
    if (staged.count() <= maxModelRows) broadcast(staged)
    else staged.hint("shuffle_hash")
  }

  /** Per-document mean bigram log-probability under an add-k bigram LM
    * trained on the corpus itself:
    *
    *   P(w2|w1) = (c(w1 w2) + k) / (c1(w1) + k·V),  V = |unigram vocab|
    *   lm_score(doc) = round(mean over doc bigrams of ln P, 4)
    *
    * Documents with fewer than two tokens score NULL with n_bigrams = 0.
    * Self-trained means every document bigram exists in the model, but
    * the join stays null-safe (unseen bigram → c=0 backoff) so the same
    * code scores against a foreign count table — and so `minCount`-pruned
    * grams degrade to the same backoff instead of erroring.
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
      addK: Double = 1.0, minCount: Long = 0,
      maxModelRows: Long = DefaultMaxModelRows): DataFrame = {
    require(addK > 0, s"addK $addK must be positive")
    require(minCount >= 0, s"minCount $minCount must be non-negative")
    // tokenize ONCE into a bound column before shingling: the regex split
    // referenced straight inside the transform lambda would re-evaluate
    // per gram index (O(tokens²·regex) per doc); projecting it first
    // makes the lambda see an attribute, evaluated once per row
    val tokenized = docs.select(col(idCol), lowerToks(textCol).as("__toks"))
    val grams = TextOps.explodeShingles(tokenized, "__toks", 2,
      "__gram", Seq(idCol))

    // model: bigram counts + the left token's unigram continuation count.
    val uni = tokenized.select(explode(col("__toks")).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val bi = grams.groupBy("__gram").agg(count(lit(1)).as("__c2"))
      .where(col("__c2") >= minCount)
      .withColumn("__w1", split(col("__gram"), " ").getItem(0))
    val model = bi.join(uni, Seq("__w1")).select("__gram", "__c2", "__c1")
    val vocab = uni.agg(count(lit(1)).as("__v"))

    // score: size-guarded probe of the model, one per-doc fold. A
    // document's LAST token also ends a unigram that never opens a bigram,
    // so __c1 comes from the unigram table, not from summing __c2. An
    // unseen (or minCount-pruned) gram misses the whole model row and
    // backs off to (0 + k) / (0 + k·V) — the uniform-smoothing floor.
    val logp = grams
      .join(boundedModel(model, maxModelRows), Seq("__gram"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("__c2"), lit(0L)) + addK) /
          (coalesce(col("__c1"), lit(0L)) + lit(addK) * col("__v"))).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg("__lp"), 4).as("lm_score"))
    docs.select(col(idCol))
      .join(logp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"))
  }

  /** Per-document mean bigram log-probability under an INTERPOLATED
    * KNESER-NEY bigram LM trained on the corpus — the smoothing KenLM
    * actually ships (Kneser & Ney 1995; Chen & Goodman 1998), and thus
    * the closest relational expression of the CCNet perplexity filter
    * ([[bigramScore]]'s add-k model over-penalizes frequent-word
    * continuations; KN scores a continuation by how many distinct
    * contexts it follows):
    *
    *   P(w2|w1) = max(c(w1 w2) − D, 0) / c(w1 ·)
    *            + D · N1+(w1 ·) / c(w1 ·) · N1+(· w2) / |bigram types|
    *
    * with absolute discount `D ∈ (0,1)`, c(w1 ·) the left-context token
    * count, N1+(w1 ·) the distinct continuations of w1, N1+(· w2) the
    * distinct contexts preceding w2. Every ingredient is an exact integer
    * aggregate of the bigram table; scores round to 4 decimals.
    *
    * Self-trained contract: every document bigram exists in the model by
    * construction, so the probe is an inner join (scoring a foreign
    * corpus against this model needs a continuation-aware backoff for
    * unseen grams — out of scope here; [[bigramScore]] is the null-safe
    * foreign-model scorer).
    *
    * Scale shape: identical to [[bigramScore]] — one exploded shuffle
    * builds the bigram table; the three KN aggregates are gram-table-
    * keyed (vocabulary-sized, never corpus-sized); the fitted model joins
    * back through the same size-guarded probe (broadcast under
    * `maxModelRows`, shuffled hash join past it).
    */
  def knScore(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75,
      maxModelRows: Long = DefaultMaxModelRows): DataFrame = {
    require(discount > 0 && discount < 1, s"discount $discount must be in (0,1)")
    val tokenized = docs.select(col(idCol), lowerToks(textCol).as("__toks"))
    val grams = TextOps.explodeShingles(tokenized, "__toks", 2,
      "__gram", Seq(idCol))

    val bi = grams.groupBy("__gram").agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", split(col("__gram"), " ").getItem(0))
      .withColumn("__w2", split(col("__gram"), " ").getItem(1))
    val ctx = bi.groupBy("__w1")
      .agg(sum("__c2").as("__cctx"), count(lit(1)).as("__n1fwd"))
    val cont = bi.groupBy("__w2").agg(count(lit(1)).as("__n1back"))
    val types = bi.agg(count(lit(1)).as("__types"))
    val model = bi.join(ctx, Seq("__w1")).join(cont, Seq("__w2"))
      .select("__gram", "__c2", "__cctx", "__n1fwd", "__n1back")

    val p = (greatest(col("__c2") - discount, lit(0.0)) / col("__cctx")) +
      (lit(discount) * col("__n1fwd") / col("__cctx")) *
        (col("__n1back") / col("__types"))
    val logp = grams
      .join(boundedModel(model, maxModelRows), Seq("__gram"))
      .crossJoin(broadcast(types))
      .select(col(idCol), log(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg("__lp"), 4).as("kn_score"))
    docs.select(col(idCol))
      .join(logp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("kn_score"))
  }

  /** DSIR importance weights over bigram features: for each document of
    * the raw pool (`isTarget` false), the log importance weight
    *
    *   w(doc) = Σ over doc bigram occurrences of
    *            ln( (c_target(f)+k)/(N_target+k·F) )
    *          − ln( (c_raw(f)+k)/(N_raw+k·F) )
    *
    * with F = |observed feature space|, N = total feature occurrences on
    * each side — the log-ratio of two add-k unigram-over-features models.
    * High weight = "this raw document looks like the target"; resample
    * the raw pool by weight to match the target distribution. Returns all
    * raw-pool rows with `dsir_weight` rounded to 4 decimals (top-k
    * selection is the caller's `orderBy.limit`, which executes as
    * TakeOrderedAndProject — no global sort).
    *
    * `featureBuckets > 0` hashes each bigram into `featureBuckets`
    * buckets (md5-hex arithmetic, exactly replayable in the SQL oracle)
    * before counting — the paper's hashed-n-gram estimator. The model is
    * then ≤ `featureBuckets` rows by construction and broadcasts
    * unconditionally; the raw-bigram feature map (`featureBuckets = 0`)
    * goes through the same `maxModelRows` size guard as [[bigramScore]].
    *
    * Both sides' count tables come out of ONE exploded pass (conditional
    * aggregation on the target flag).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, addK: Double = 1.0, featureBuckets: Int = 0,
      maxModelRows: Long = DefaultMaxModelRows): DataFrame = {
    require(addK > 0, s"addK $addK must be positive")
    require(featureBuckets >= 0, s"featureBuckets $featureBuckets must be >= 0")
    // feature = the bigram itself, or its fixed-space hash bucket
    // (conv(md5-prefix) mod buckets — the cross-engine q_shuffle_shards
    // arithmetic; 8 hex digits keep conv inside positive long range)
    val feature: Column => Column =
      if (featureBuckets == 0) identity
      else g => conv(substring(md5(g), 1, 8), 16, 10).cast("long") % featureBuckets
    // tokenize once into a bound column (see bigramScore note)
    val grams = TextOps.explodeShingles(
        docs.select(col(idCol), isTarget.as("__t"),
          lowerToks(textCol).as("__toks")),
        "__toks", 2, "__g0", Seq(idCol, "__t"))
      .select(col(idCol), col("__t"), feature(col("__g0")).as("__gram"))

    val model = grams.groupBy("__gram").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("__cr"))
    val probe =
      if (featureBuckets > 0) broadcast(Staged.materialize(model))
      else boundedModel(model, maxModelRows)
    val totals = probe.agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"),
      count(lit(1)).as("__f"))

    grams.where(!col("__t"))
      .join(probe, Seq("__gram"))
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (log((col("__ct") + addK) / (col("__nt") + lit(addK) * col("__f"))) -
          log((col("__cr") + addK) / (col("__nr") + lit(addK) * col("__f"))))
          .as("__lr"))
      .groupBy(col(idCol))
      .agg(round(sum("__lr"), 4).as("dsir_weight"))
  }
}
