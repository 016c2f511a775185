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
  *     target domain rank first.
  *
  * Scale shape (both): ONE exploded shuffle builds the count table
  * (partial-aggregated map-side, key space = corpus vocabulary, not
  * corpus size); the fitted model broadcasts (an n-gram quality LM is
  * pruned/bounded by construction — if yours is bigger than the broadcast
  * threshold, pre-prune it like every production KenLM deployment does);
  * scoring is then a map-side broadcast join over the document n-gram
  * stream plus one per-document aggregation. The corpus itself is
  * shuffled only on the document id for the final fold.
  *
  * Cross-engine contract: tokenization is `TextOps.tokens(lower(text))`
  * (the BM25 convention), counts are exact integers, and scores round to
  * 4 decimals so the DuckDB oracle hash-matches (the established
  * `q_text_bm25` float protocol).
  */
object Lm {

  private def lowerToks(textCol: String): Column =
    TextOps.tokens(lower(col(textCol)))

  /** Per-document mean bigram log-probability under an add-k bigram LM
    * trained on the corpus itself:
    *
    *   P(w2|w1) = (c(w1 w2) + k) / (c1(w1) + k·V),  V = |unigram vocab|
    *   lm_score(doc) = round(mean over doc bigrams of ln P, 4)
    *
    * Documents with fewer than two tokens score NULL with n_bigrams = 0.
    * Self-trained means every document bigram exists in the model, but
    * the join stays null-safe (unseen bigram → c=0 backoff) so the same
    * code scores against a foreign count table.
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
      addK: Double = 1.0): DataFrame = {
    require(addK > 0, s"addK $addK must be positive")
    val toks = lowerToks(textCol)
    val grams = docs.select(col(idCol),
      explode(TextOps.shingles(toks, 2)).as("__gram"))

    // model: bigram counts + the left token's unigram continuation count.
    val uni = docs.select(explode(toks).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val bi = grams.groupBy("__gram").agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", split(col("__gram"), " ").getItem(0))
    val model = bi.join(uni, Seq("__w1")).select("__gram", "__c2", "__c1")
    val vocab = uni.agg(count(lit(1)).as("__v"))

    // score: map-side broadcast probe of the model, one per-doc fold. A
    // document's LAST token also ends a unigram that never opens a bigram,
    // so __c1 comes from the unigram table, not from summing __c2.
    val logp = grams
      .join(broadcast(model), Seq("__gram"), "left")
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

  /** DSIR importance weights over bigram features: for each document of
    * the raw pool (`isTarget` false), the log importance weight
    *
    *   w(doc) = Σ over doc bigram occurrences of
    *            ln( (c_target(f)+k)/(N_target+k·F) )
    *          − ln( (c_raw(f)+k)/(N_raw+k·F) )
    *
    * with F = |union feature space|, N = total feature occurrences on
    * each side — i.e. the log-ratio of two add-k unigram-over-features
    * models, the paper's hashed-n-gram estimator with raw bigrams as the
    * feature map. High weight = "this raw document looks like the
    * target"; resample the raw pool by weight to match the target
    * distribution. Returns all raw-pool rows with `dsir_weight` rounded
    * to 4 decimals (top-k selection is the caller's `orderBy.limit`,
    * which executes as TakeOrderedAndProject — no global sort).
    *
    * Both sides' count tables come out of ONE exploded pass (conditional
    * aggregation on the target flag), then broadcast.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, addK: Double = 1.0): DataFrame = {
    require(addK > 0, s"addK $addK must be positive")
    val grams = docs.select(col(idCol), isTarget.as("__t"),
      explode(TextOps.shingles(lowerToks(textCol), 2)).as("__gram"))

    val model = grams.groupBy("__gram").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("__cr"))
    val totals = model.agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"),
      count(lit(1)).as("__f"))

    grams.where(!col("__t"))
      .join(broadcast(model), Seq("__gram"))
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (log((col("__ct") + addK) / (col("__nt") + lit(addK) * col("__f"))) -
          log((col("__cr") + addK) / (col("__nr") + lit(addK) * col("__f"))))
          .as("__lr"))
      .groupBy(col(idCol))
      .agg(round(sum("__lr"), 4).as("dsir_weight"))
  }
}
