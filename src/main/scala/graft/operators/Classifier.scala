package graft.operators

import graft.functions.Sketches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text-quality classifier over hashed bag-of-n-gram features —
  * the fastText-architecture quality filter (Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification") that CCNet-style pipelines
  * run over every crawled document: hash each token unigram and bigram
  * into a fixed bucket space (the hashing trick bounds the model at
  * `2^bucketBits` weights regardless of vocabulary), average the bucket
  * weights, squash through a sigmoid, keep documents above threshold.
  *
  * INFERENCE is the corpus-scale operation (training the small linear
  * model is a driver-side/offline concern); the model here is a weight
  * vector addressed by bucket. Two sources for it:
  *
  *   - [[score]]: weights are a pure function of the bucket id (a Knuth
  *     multiplicative mix into [-1000, 1000] milli-units) — no shipped
  *     state at all, the gate/spec configuration, and the cross-engine
  *     contract that lets a SQL oracle replay every weight.
  *   - [[scoreWith]]: weights from a caller-supplied `(bucket, w_milli)`
  *     table — a REAL fitted model, broadcast-bounded by construction at
  *     `2^bucketBits` rows (18 bits → ≤262 144 rows, a few MB).
  *
  * Scale shape: scoring is integer arithmetic folded per document —
  * [[score]] is a PURE MAP-SIDE pass (one higher-order fold over the
  * concatenated feature array, zero shuffles, plan-asserted in
  * `ClassifierSpec`); [[scoreWith]] is one explode + broadcast probe +
  * one doc-keyed integer partial agg. Weights stay in exact milli-units
  * (long) until the single final division, so the fold is
  * order-insensitive and the DuckDB oracle hash-matches without any
  * float-summation protocol.
  *
  * Tokenization is the repo convention `TextOps.tokens(lower(text))`;
  * features are unigrams plus space-joined bigrams (the fastText
  * `wordNgrams=2` setting).
  */
object Classifier {

  /** Deterministic weight (milli-units, in [-1000, 1000]) for a bucket:
    * Knuth's multiplicative mix `((bucket + seed) · 2654435761) mod 2001
    * − 1000` — pure integer arithmetic, so any engine (or SQL oracle)
    * regenerates the same model with no shipped state AND no per-feature
    * second digest: the feature pays ONE md5 (the bucket hash); the
    * weight is integer ops on the result (measured 2.5× on the sf1
    * corpus vs an md5-derived weight, BENCH_NOTES round-10 postscript).
    * The product stays in signed-64 range, exact in
    * any 64-bit engine (bucketBits ≤ 30 keeps the product under 2^62).
    */
  def weightMilli(seed: Int, bucket: Long): Long =
    (bucket + seed) * 2654435761L % 2001 - 1000

  private def weightCol(seed: Int, bucket: Column): Column =
    (bucket + seed) * 2654435761L % 2001 - 1000

  /** Probe side for a `(bucket, w_milli)` weight table, size-guarded the
    * way [[Lm.boundedModel]] guards LM models — but statically: the
    * table is bounded at `2^bucketBits` rows BY CONSTRUCTION, so no
    * count is needed. Broadcast while that bound fits the broadcast
    * budget ([[Lm.DefaultMaxModelRows]], ~2M rows ≈ 100 MB); a shuffled
    * hash join past it — bucketBits in [21, 30] would otherwise force up
    * to a ~17 GB broadcast that BYPASSES AQE's size check (the exact
    * shape boundedModel exists to prevent).
    */
  private def weightProbe(w: DataFrame, bucketBits: Int): DataFrame =
    if ((1L << bucketBits) <= Lm.DefaultMaxModelRows) broadcast(w)
    else w.hint("shuffle_hash")

  /** Score every document under the hash-derived weight vector: adds
    * `n_feats`, `quality` (= round(sigmoid(mean weight), 4)) and `keep`
    * (quality ≥ threshold). NOTE: an empty/whitespace-only document is
    * scored on the single empty-string feature (the whitespace tokenizer
    * returns [""], so n_feats = 1) — the SQL oracles replay the same
    * convention; a NULL quality arises only from a genuinely empty
    * feature array (n_feats = 0), which this tokenizer never produces.
    * Zero shuffles: the integer fold runs inside the projection.
    */
  def score(docs: DataFrame, textCol: String, bucketBits: Int = 18,
      seed: Int = 7, threshold: Double = 0.5): DataFrame =
    scoreTokens(docs.withColumn("__toks", TextOps.tokens(lower(col(textCol)))),
      "__toks", bucketBits, seed, threshold)

  /** [[score]] from a PRE-TOKENIZED frame (`toksCol` holds the token
    * array) — the stage-handoff variant: a composed pipeline that
    * tokenizes the corpus once and persists the token column feeds it to
    * the classifier, the winnow dedup, and the token counter without
    * re-running the regex tokenizer per stage. The caller's token column
    * is left on the output untouched.
    */
  def scoreTokens(docs: DataFrame, toksCol: String, bucketBits: Int = 18,
      seed: Int = 7, threshold: Double = 0.5): DataFrame = {
    require(bucketBits > 0 && bucketBits <= 30, s"bucketBits $bucketBits out of range")
    val t = col(toksCol)
    // features fold as PRE-HASHED longs (GramHash.featureHash60: one
    // fused md5 pass per document, value-identical to hashing each
    // unigram/bigram string) — the per-feature work inside the lambda is
    // pure integer arithmetic
    val scored = docs
      .withColumn("__n", size(t) + greatest(size(t) - 1, lit(0)))
      .withColumn("__sum", aggregate(
        graft.functions.GramHash.featureHash60Col(t), lit(0L),
        (acc, h) => acc + weightCol(seed, h % (1L << bucketBits))))
    finish(scored, threshold)
  }

  /** (idCol, bucket) rows, one per unigram+bigram feature occurrence —
    * the count-only generator (index into unigrams, then bigrams):
    * exploding the built feature array trips the inferred-filter
    * re-tokenization (TextOps.explodeShingles note). Index i in [1, n]
    * is token i; index in (n, 2n-1] is the bigram starting at i - n.
    */
  private def featureBuckets(toks: DataFrame, idCol: String,
      bucketBits: Int): DataFrame = {
    val n = size(col("__toks"))
    // The feature hashes are computed ONCE per document by the fused
    // kernel and bound below the Generate; index i in [1, n] is token i,
    // index in (n, 2n-1] the bigram starting at i - n — featureHash60's
    // layout, identical to the old per-row string build. n > 0 guard
    // (the winnowFingerprints pattern): sequence(1, 0) would generate a
    // DESCENDING [1, 0] and element_at(.., 0) throws — the whitespace
    // tokenizer happens never to return an empty array, but that
    // invariant lives elsewhere and must not be load-bearing here
    toks.select(col(idCol), col("__toks"),
        graft.functions.GramHash.featureHash60Col(col("__toks")).as("__fh"))
      .select(col(idCol), col("__fh"),
        explode(when(n > 0, sequence(lit(1), n + greatest(n - 1, lit(0))))
          .otherwise(typedLit(Seq.empty[Int]))).as("__fi"))
      .select(col(idCol),
        (element_at(col("__fh"), col("__fi")) % (1L << bucketBits))
          .as("bucket"))
  }

  /** Score under a fitted `(bucket, w_milli)` weight table (missing
    * buckets weigh 0 — a pruned model degrades gracefully). The table is
    * bounded at `2^bucketBits` rows, so the probe is a broadcast join;
    * aggregation back to one row per document is a single integer
    * partial agg on the id.
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, bucketBits: Int = 18,
      threshold: Double = 0.5): DataFrame = {
    require(bucketBits > 0 && bucketBits <= 30, s"bucketBits $bucketBits out of range")
    val toks = docs.withColumn("__toks", TextOps.tokens(lower(col(textCol))))
    val feats = featureBuckets(toks, idCol, bucketBits)
    val sums = feats
      .join(weightProbe(weights.select(col("bucket"), col("w_milli")), bucketBits),
        Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w_milli"), lit(0L))).as("__sum"),
        count(lit(1)).as("__n"))
    // join the RAW docs, not the tokenized frame: the sums already carry
    // everything finish() needs, and joining `toks` would shuffle the
    // derived token ARRAY (text-sized) through the id join only to drop
    // it — at corpus scale that doubles the join's shuffled bytes
    finish(docs.join(sums, Seq(idCol), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn("__sum", coalesce(col("__sum"), lit(0L))), threshold)
  }

  /** Materialize the hash-derived model as the `(bucket, w_milli)` table
    * [[scoreWith]] consumes — pins the two paths to one definition.
    */
  def hashModel(spark: org.apache.spark.sql.SparkSession, bucketBits: Int,
      seed: Int = 7): DataFrame = {
    import spark.implicits._
    (0L until (1L << bucketBits)).map(b => (b, weightMilli(seed, b)))
      .toDF("bucket", "w_milli")
  }

  /** Train the linear model IN the engine: full-batch gradient descent
    * on logistic loss over the same hashed unigram+bigram features
    * [[scoreWith]] scores with — the upgrade from "training is an
    * offline concern" to distributed training as a handful of keyed
    * aggregations per epoch. Returns the fitted `(bucket, w_milli)`
    * table [[scoreWith]] consumes directly.
    *
    * Determinism contract (what makes a SQL oracle hash-match a
    * distributed float computation): weights are QUANTIZED to integer
    * milli-units after every epoch. Per-doc margins are then exact
    * integer sums (order-free); the logit is `margin/(1000·n_feats)`
    * (the [[finish]] mean-weight convention); the per-bucket gradient
    * `Σ residual·x / N` is the one floating sum per epoch, and its
    * fold-order noise (~1e-13) is crushed by the round-to-milli
    * quantization. Epoch updates:
    *
    *   w[b] ← w[b] − round(lr · 1000 · Σ_docs (σ(logit) − y)·x[b] / N)
    *
    * NOTE on the objective: the logit is the MEAN feature weight
    * (margin / (1000·n_feats), the [[finish]] scoring convention) but
    * the gradient sums raw counts x[b] WITHOUT the per-doc 1/n_feats
    * factor — a deliberately length-unnormalized update (long documents
    * contribute proportionally more per step), not the exact gradient
    * of mean-logit logistic loss. Deterministic, oracle-replayable, and
    * it converges on separable data (spec-pinned); callers needing the
    * exact gradient would scale x[b] by 1/n_feats on both sides.
    *
    * Scale shape: the (doc, bucket, x) feature table is computed once
    * and persisted (released before return); each epoch is one
    * bucket-keyed join + one doc-keyed integer agg + one bucket-keyed
    * agg, all linear; the weight table (≤ 2^bucketBits rows) is staged
    * per epoch so lineage stays constant-depth.
    */
  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
      label: Column, bucketBits: Int = 18, epochs: Int = 2,
      lr: Double = 10.0): DataFrame = {
    require(bucketBits > 0 && bucketBits <= 30, s"bucketBits $bucketBits out of range")
    require(epochs >= 1 && lr > 0, s"need epochs >= 1 and lr > 0")
    val toks = docs.withColumn("__toks", TextOps.tokens(lower(col(textCol))))
    val x = featureBuckets(toks, idCol, bucketBits)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eph = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val nf = x.groupBy(col(idCol)).agg(sum("__x").as("__nf"))
      // N = labeled AND featured docs — a NULL label drops its doc from
      // the gradient joins, so it must also leave the denominator, or
      // the effective learning rate silently scales by (N-k)/N
      val lab = docs.select(col(idCol), label.cast("double").as("__y"))
        .where(col("__y").isNotNull)
      val nDocs = lab.join(nf, Seq(idCol)).count()
      require(nDocs > 0, "trainLogistic: no labeled documents with features")
      var w: DataFrame = null
      for (epoch <- 1 to epochs) {
        // margin: exact integer sum of w·x (0 under the zero init)
        val resid =
          (if (w == null)
            lab.join(nf, Seq(idCol))
              .select(col(idCol), (lit(0.5) - col("__y")).as("__r"))
          else {
            // the weight table is bounded at 2^bucketBits rows — pin the
            // probe shape (the scoreWith shape) so a stats-blind planner
            // can't shuffle the corpus-scale feature table per epoch;
            // size-guarded so wide bucket spaces don't force a broadcast
            val m = x.join(weightProbe(w, bucketBits), Seq("bucket"))
              .groupBy(col(idCol)).agg(sum(col("__x") * col("w_milli")).as("__mm"))
            m.join(nf, Seq(idCol)).join(lab, Seq(idCol))
              .select(col(idCol),
                (lit(1.0) / (lit(1.0) +
                  exp(-(col("__mm") / (lit(1000.0) * col("__nf"))))) -
                  col("__y")).as("__r"))
          })
        val grad = x.join(resid, Seq(idCol))
          .groupBy(col("bucket"))
          .agg(round(lit(lr * 1000.0) * sum(col("__r") * col("__x")) / nDocs)
            .cast("long").as("__g"))
        val next =
          (if (w == null) grad.select(col("bucket"), (-col("__g")).as("w_milli"))
          else w.join(grad, Seq("bucket"))
            .select(col("bucket"), (col("w_milli") - col("__g")).as("w_milli")))
        // bounded (≤ 2^bucketBits rows) — staged so epoch t+1 reads a
        // plain scan, not t epochs of stacked joins. Non-final epochs are
        // intra-operator state: in-memory checkpoints (~2× cheaper than
        // the parquet trip, StagingProbe), released below; the final
        // epoch's table is what the returned frame reads, so it stays
        // parquet-staged (block-free after return, the Staged lifecycle).
        w =
          if (epoch == epochs) Staged.materialize(next)
          else { val c = Staged.ephemeral(next); eph += c; c }
      }
      w.where(col("w_milli") =!= 0)
    } finally {
      x.unpersist(false)
      eph.foreach(Staged.releaseCheckpoint)
    }
  }

  /** Confusion-matrix report for boolean predictions against boolean
    * truth: one row (tp, fp, tn, fn, accuracy, precision, recall, f1) —
    * the held-out scorecard after [[trainLogistic]] → [[scoreWith]].
    * Counts are exact integers; the four ratios round; an all-negative
    * prediction column yields NULL precision/f1 rather than a 0/0.
    * NULL `predicted` counts as false (a never-kept doc); rows whose
    * `actual` is NULL are EXCLUDED from all four counts (no truth, no
    * verdict) — tp+fp+tn+fn equals the labeled row count, not the
    * input row count. One aggregation, map-side partials.
    */
  def confusion(df: DataFrame, predicted: Column, actual: Column,
      roundTo: Int = 4): DataFrame = {
    val p = coalesce(predicted, lit(false))
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    df.where(actual.isNotNull).agg(
        cnt(p && actual).as("tp"),
        cnt(p && !actual).as("fp"),
        cnt(!p && !actual).as("tn"),
        cnt(!p && actual).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")), roundTo)
          .as("accuracy"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), roundTo))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), roundTo))
          .as("recall"),
        when(col("tp") + col("fp") + col("fn") > 0,
          round(lit(2.0) * col("tp") /
            (lit(2.0) * col("tp") + col("fp") + col("fn")), roundTo))
          .as("f1"))
  }

  /** Pick the keep-threshold maximizing F1 on a labeled validation set —
    * the calibration step between [[trainLogistic]] and production
    * [[scoreWith]] (0.5 is rarely the right cut under class imbalance).
    * Candidate thresholds are the DISTINCT rounded quality values, so
    * the sweep's cardinality is bounded by 10^roundTo+1 regardless of
    * corpus size: one (quality, counts) aggregation, a cumulative
    * window over that bounded table, argmax with the HIGHER threshold
    * winning ties. Output: one row (threshold, tp, fp, fn, f1) for the
    * rule `keep = quality >= threshold`. NULL qualities never keep;
    * with NO real quality at all the one row is (NULL, 0, 0, allpos,
    * NULL) — callers can always `.head()`.
    */
  def calibrateThreshold(scored: DataFrame, quality: Column,
      actual: Column, roundTo: Int = 4): DataFrame = {
    // ONE corpus pass: null qualities fold into the same aggregation
    // under a flag key (they can never be a cut but their positives
    // count toward every cut's fn); the total then derives from the
    // BOUNDED staged table instead of a second scan of `scored` — at
    // sf1 the second classifier fold was the whole gate's cost, 2×
    val byQ = Staged.materialize(qualityCounts(scored, quality, actual))
    val tot = byQ.agg(sum("__pos").as("__allpos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__q").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val swept = byQ.where(!col("__isnull"))
      .withColumn("__tp", sum("__pos").over(w))
      .withColumn("__fp", sum("__neg").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("__fn", col("__allpos") - col("__tp"))
      .withColumn("__f1",
        round(lit(2.0) * col("__tp") /
          (lit(2.0) * col("__tp") + col("__fp") + col("__fn")), roundTo))
      .select(col("__q").as("threshold"), col("__tp").as("tp"),
        col("__fp").as("fp"), col("__fn").as("fn"), col("__f1").as("f1"))
    // all-null / empty input leaves zero candidate cuts — the fallback
    // row keeps the one-row contract (threshold NULL, everything fn)
    val fallback = tot.select(lit(null).cast("double").as("threshold"),
      lit(0L).as("tp"), lit(0L).as("fp"),
      coalesce(col("__allpos"), lit(0L)).as("fn"),
      lit(null).cast("double").as("f1"))
    swept.unionByName(fallback)
      .orderBy(col("f1").desc_nulls_last, col("threshold").desc_nulls_last)
      .limit(1)
  }

  /** Per-distinct-quality (pos, neg) counts with NULL under a flag key
    * (`__isnull`, `__q`) — shared by [[calibrateThreshold]] and [[auc]]
    * so sentinel handling can't drift, and a legitimate −∞ quality is
    * NOT conflated with NULL. Bounded at 10^roundTo+2 rows for rounded
    * qualities.
    */
  private def qualityCounts(scored: DataFrame, quality: Column,
      actual: Column): DataFrame =
    scored.groupBy(quality.isNull.as("__isnull"),
        coalesce(quality, lit(0.0)).as("__q"))
      .agg(sum(when(actual, 1L).otherwise(0L)).as("__pos"),
        sum(when(actual, 0L).otherwise(1L)).as("__neg"))

  /** Ranking quality as AUC (Mann–Whitney form, tie-corrected): the
    * probability a random positive outranks a random negative,
    *
    *   AUC = Σ_q [ negBelow(q)·pos(q) + pos(q)·neg(q)/2 ] / (P·N)
    *
    * computed over the per-distinct-quality count table — bounded at
    * 10^roundTo+1 rows like [[calibrateThreshold]]'s sweep, so the
    * cumulative window never sees corpus-sized input. The numerator is
    * exact in halves (integer 2×U), one division at the end. NULL
    * qualities rank below every real one (a null-quality positive loses
    * to every real-quality negative, and TIES other null-quality docs —
    * the standard shared-bottom-rank treatment). Output: one row
    * (auc, n_pos, n_neg); NULL auc if either class is empty.
    */
  def auc(scored: DataFrame, quality: Column, actual: Column,
      roundTo: Int = 4): DataFrame = {
    val byQ = qualityCounts(scored, quality, actual)
    // ascending rank order with the NULL group FIRST (lowest): true
    // sorts after false, so __isnull DESCENDS
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__isnull").desc, col("__q").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byQ
      .withColumn("__negBelow", coalesce(sum("__neg").over(w), lit(0L)))
      .agg(sum(col("__pos") * col("__negBelow") * 2 + col("__pos") * col("__neg"))
          .as("__u2"),
        sum("__pos").as("n_pos"), sum("__neg").as("n_neg"))
      .select(
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), roundTo)).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  private def finish(scored: DataFrame, threshold: Double): DataFrame = {
    val mean = col("__sum") / (col("__n") * lit(1000.0))
    val quality = round(lit(1.0) / (lit(1.0) + exp(-mean)), 4)
    scored
      .withColumn("n_feats", col("__n").cast("long"))
      .withColumn("quality", when(col("__n") > 0, quality))
      .withColumn("keep", coalesce(col("quality") >= threshold, lit(false)))
      .drop("__toks", "__n", "__sum")
  }
}
