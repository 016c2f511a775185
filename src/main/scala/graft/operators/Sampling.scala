package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * All variants key off a cryptographic content hash (md5 prefix) instead
  * of `rand()`: the sample is a pure function of the data, so it is
  * reproducible across runs, engines (the DuckDB oracle computes the same
  * md5), partitionings, and cluster sizes — the property a 100 TB pipeline
  * needs for resumable / auditable subsampling. No shuffle is introduced
  * by [[hashSample]]/[[stratifiedSample]] (a pure filter that pushes into
  * the scan's codegen stage); [[capPerKey]] shuffles once on the key, which
  * is inherent to exact per-key caps.
  */
object Sampling {

  /** Granularity of the md5-prefix threshold: 4 hex digits = 16 bits. */
  private val Buckets = 0x10000

  /** True iff the row's key hashes below the fraction threshold. The
    * comparison is on the md5 hex PREFIX as a string — lowercase hex
    * compares identically in every engine, so no integer parsing of hex is
    * needed cross-engine. Resolution is 1/65536 (fractions round to the
    * nearest 2^-16; 0 and 1 fold to constant false/true).
    */
  def hashKeep(key: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    val t = math.round(fraction * Buckets).toInt
    if (t >= Buckets) lit(true)
    else if (t <= 0) lit(false)
    else substring(md5(key.cast("string")), 1, 4) < lit(f"$t%04x")
  }

  /** Deterministic Bernoulli sample: keep ~`fraction` of rows by content
    * hash of `key` (use the stable row id, not the payload, so re-ingested
    * rows sample identically).
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(hashKeep(key, fraction))

  /** Per-stratum sampling rates (e.g. language rebalancing: downsample en,
    * keep the long tail). Strata absent from `rates` fall back to
    * `defaultRate`. Compiles to one `when` chain over the stratum column —
    * still a pure pushed-down filter.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val keep = rates.foldLeft(hashKeep(key, defaultRate)) {
      case (acc, (value, rate)) =>
        when(stratum === lit(value), hashKeep(key, rate)).otherwise(acc)
    }
    df.where(keep)
  }

  /** Deterministic token-budget rebalancing (training-data mixing): each
    * `srcCol` stratum whose total tokens exceed `budgetTokens` is
    * hash-downsampled to land at the budget in expectation; under-budget
    * strata pass through whole. The per-stratum rate is derived in INTEGER
    * arithmetic — `rate16 = (65536 * budget) DIV actual` — so the
    * threshold string, and therefore the exact kept set, is reproducible
    * in any engine (no float rounding at the rate boundary).
    *
    * Scale: one tiny aggregation (a row per stratum) joined back with an
    * explicit broadcast; the keep decision remains a map-side filter, so
    * the corpus itself never shuffles.
    */
  def tokenBudgetMix(df: DataFrame, srcCol: String, key: Column,
      tokCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens $budgetTokens must be >= 0")
    val scaled = Buckets.toLong * budgetTokens
    val rates = df.groupBy(col(srcCol))
      .agg(sum(col(tokCol).cast("long")).as("__actual"))
      .select(col(srcCol),
        when(col("__actual") <= budgetTokens, lit(Buckets.toLong))
          .otherwise(expr(s"CAST($scaled DIV __actual AS BIGINT)"))
          .as("__rate16"))
    df.join(broadcast(rates), Seq(srcCol))
      .where(col("__rate16") >= Buckets.toLong ||
        substring(md5(key.cast("string")), 1, 4) <
          lpad(lower(hex(col("__rate16"))), 4, "0"))
      .drop("__rate16")
  }

  /** Exact deterministic cap of `n` rows per key — the reservoir-sample
    * shape with a content-hash order instead of a random one: rank rows
    * within each key by (md5(tiebreak), tiebreak) and keep the first `n`.
    * One hash-partitioned shuffle on the key; at scale prefer a two-phase
    * (partial per-partition cap, then final) if keys are hot — Spark's
    * window TopK pushes a partial `WindowGroupLimit` below the shuffle
    * since 3.5, which achieves exactly that.
    */
  def capPerKey(df: DataFrame, keyCol: String, tiebreakCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(tiebreakCol).cast("string")).asc, col(tiebreakCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Leakage-safe train/val/test assignment: the split is a pure function
    * of the GROUP key (source domain, author, url host …), so every row of
    * a group lands in the same split — the standard guard against
    * train/eval contamination through near-duplicate documents that share
    * a provenance group. `splits` are (label, weight) pairs summing to 1;
    * boundaries are 16-bit md5-prefix thresholds (same resolution contract
    * as [[hashKeep]]). Pure map-side `when` chain: zero shuffle, pushes
    * into the scan's codegen stage, and re-running on any cluster size (or
    * a grown corpus) never reassigns an existing group.
    */
  def groupSplit(df: DataFrame, group: Column, splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0),
      s"split weights must be positive, got ${splits.map(_._2).mkString(",")}")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val hx = substring(md5(group.cast("string")), 1, 4)
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => math.round(c * Buckets).toInt)
    val first = when(hx < lit(f"${cuts.head}%04x"), lit(splits.head._1))
    val chain = splits.tail.init.zip(cuts.tail).foldLeft(first) {
      case (acc, ((name, _), cut)) => acc.when(hx < lit(f"$cut%04x"), lit(name))
    }
    df.withColumn(outCol, chain.otherwise(lit(splits.last._1)))
  }

  /** Temperature-weighted mixture sampling (the multilingual-pretraining
    * rebalance: sample source s proportional to `count_s^alpha` with
    * alpha = 0.5, so head sources are tamed and tail sources boosted
    * relative to their natural frequency). Per-source keep rates are
    * derived entirely in INTEGER arithmetic — `w_s = floor(sqrt(count_s))`
    * (IEEE sqrt is correctly rounded, so the floor is engine-exact),
    * `rate16_s = min(2^16, (2^16 * budget * w_s) DIV (SUM(w) * count_s))` —
    * which makes the exact kept set reproducible in any engine, the same
    * contract as [[tokenBudgetMix]]. One tiny per-source aggregate joined
    * back broadcast; the corpus itself never shuffles (map-side filter).
    */
  def mixtureSample(df: DataFrame, srcCol: String, key: Column,
      budgetRows: Long): DataFrame = {
    require(budgetRows >= 0, s"budgetRows $budgetRows must be >= 0")
    df.join(broadcast(temperatureRates(df, srcCol, budgetRows, Buckets.toLong)),
        Seq(srcCol))
      .where(col("__rate16") >= Buckets.toLong ||
        conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long") <
          col("__rate16"))
      .drop("__rate16")
  }

  /** Epoch-aware mixture building — [[mixtureSample]]'s upsampling
    * counterpart. Training mixes REPEAT under-represented sources (multiple
    * epochs of a tail language per single epoch of the head) rather than
    * only downsampling: here each source's temperature rate may exceed 1,
    * and a row with rate `r` is emitted `floor(r)` times plus one more iff
    * its 16-bit content hash lands below the fractional remainder — so the
    * output multiset is exact integer arithmetic end to end (same
    * `floor(sqrt)` weights and 2^16 hash space as [[mixtureSample]]), and
    * a `epoch` column (0-based copy index) distinguishes the repeats.
    * `maxEpochs` caps the repeat factor (unbounded tail repetition hurts
    * more than it helps).
    *
    * Scale shape: the rate table is one tiny per-source aggregate joined
    * back broadcast; the fan-out is a per-row explode (no shuffle), so the
    * corpus is read once at any scale.
    */
  def mixtureEpochs(df: DataFrame, srcCol: String, key: Column,
      budgetRows: Long, maxEpochs: Int = 4): DataFrame = {
    require(budgetRows >= 0, s"budgetRows $budgetRows must be >= 0")
    require(maxEpochs >= 1, s"maxEpochs $maxEpochs must be >= 1")
    df.join(broadcast(
        temperatureRates(df, srcCol, budgetRows, maxEpochs.toLong * Buckets)),
        Seq(srcCol))
      .withColumn("__copies",
        expr(s"CAST(__rate16 DIV ${Buckets.toLong} AS BIGINT)") +
          when(conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long") <
            col("__rate16") % Buckets, 1L).otherwise(0L))
      .where(col("__copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__rate16", "__copies")
  }

  /** Exact-size deterministic sample: the `n` rows whose md5(key) is hex-
    * smallest — a content-hash total order, so the pick is a pure function
    * of the data (the [[hashSample]] reproducibility contract) with an
    * EXACT row count, where the Bernoulli variants only land in
    * expectation. `key` should be unique per row (the id); ordering is
    * (md5, key) so even a hash collision cannot make the pick ambiguous.
    * Executes as TakeOrderedAndProject — per-partition n-row heaps, one
    * driver merge of the #partitions × n finalists, no global sort — so
    * keep `n` driver-mergeable (≲10^6); beyond that use [[hashSample]].
    */
  def exactSample(df: DataFrame, key: Column, n: Int): DataFrame = {
    require(n >= 0, s"n $n must be >= 0")
    df.withColumn("__hx", md5(key.cast("string")))
      .orderBy(col("__hx").asc, key.asc)
      .limit(n)
      .drop("__hx")
  }

  /** Shared sqrt-temperature rate table for [[mixtureSample]] /
    * [[mixtureEpochs]]: one row per source with
    * `__rate16 = min(capRate16, (2^16 * budget * floor(sqrt(n))) DIV (Σw * n))`.
    * The numerator runs in DECIMAL(38,0): at the corpus scales the
    * operators document (billions of rows, billion-row budgets)
    * `2^16 * budget * w` exceeds Long.MaxValue, and non-ANSI BIGINT
    * arithmetic would wrap negative and silently drop whole sources —
    * DuckDB's BIGINT multiply promotes to HUGEINT, so 128-bit-exact on
    * both engines keeps the kept sets identical.
    */
  private def temperatureRates(df: DataFrame, srcCol: String,
      budgetRows: Long, capRate16: Long): DataFrame = {
    val weights = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    weights
      .crossJoin(broadcast(weights.agg(sum("__w").as("__tw"))))
      .select(col(srcCol),
        least(lit(capRate16),
          expr(s"CAST((CAST(${Buckets.toLong} AS DECIMAL(38,0)) * $budgetRows * __w) " +
            s"DIV (CAST(__tw AS DECIMAL(38,0)) * __n) AS BIGINT)"))
          .as("__rate16"))
  }

  /** Length-curriculum binning: split the corpus into `nBins` equal-mass
    * difficulty tiers by an INTEGER score column (document length is the
    * classic curriculum signal) and report per-bin composition — the plan
    * a curriculum-ordered training run is built from.
    *
    * Scale shape: the bin boundaries are the exact (nBins−1) interior
    * quantiles, computed in ONE tiny aggregate row, broadcast, and
    * applied map-side (`score > boundary` fold), then one
    * partial-aggregated shuffle on the nBins-sized key. No global sort,
    * no ntile window — the ntile formulation would sort the full corpus
    * on one reducer, which is exactly the shape that dies at 100 TB.
    *
    * The score must be integral: interior quantiles interpolate to
    * non-integer boundaries (or land exactly on a score value), so the
    * strict `>` compare is unambiguous cross-engine — with a float score
    * an ulp difference in the interpolated boundary could flip a row's
    * bin. Bins are 1-based; rows equal to a boundary fall in the lower
    * bin (quantile_cont semantics in both engines).
    */
  def curriculumBins(df: DataFrame, scoreCol: Column, nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins $nBins must be >= 2")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val bounds = df.agg(
      percentile(scoreCol, typedLit(ps)).as("__qs"))
    df.select(scoreCol.cast("long").as("__score"))
      .crossJoin(broadcast(bounds))
      .withColumn("bin",
        aggregate(col("__qs"), lit(1),
          (acc, q) => acc + when(col("__score") > q, 1).otherwise(0)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("__score").as("score_mass"),
        min("__score").as("min_score"), max("__score").as("max_score"))
  }

  /** Systematic weighted sampling: walk the id-ordered corpus's cumulative
    * integer weight axis and keep every document whose weight interval
    * crosses one of `k` evenly-spaced thresholds — weight-proportional
    * selection (a document with twice the tokens is twice as likely in),
    * ~k rows out, fully deterministic, NO floating point anywhere: the
    * threshold test is `(cum·k) div total > ((cum−w)·k) div total` in
    * exact long arithmetic, so an oracle replays it bit-for-bit (the
    * Efraimidis–Spirakis exponential-key scheme this replaces needs
    * pow/ln whose last-ulp behavior differs across engines). Headroom:
    * cum·k stays under 2⁶³ up to ~10¹⁵ total tokens × k=1000.
    *
    * Gate-scale plan: one global-sort window for the prefix sum.
    * Production shape at 100 TB is the standard two-pass split — per-
    * partition weight sums to the driver (one long each), broadcast
    * offsets back, map-side cum + threshold test — same numbers, no
    * global sort; the window form is kept here because it is the
    * Catalyst-native expression of the same prefix sum.
    */
  def systematicWeightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val w = Window.orderBy(col(idCol))
    val tot = df.agg(sum(weight.cast("long")).as("__tot"))
    df.select(col(idCol), weight.cast("long").as("__w"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .crossJoin(broadcast(tot))
      .where(expr(s"__cum * $k DIV __tot") > expr(s"(__cum - __w) * $k DIV __tot"))
      .select(col(idCol), col("__w").as("weight"))
  }

  /** Per-group score calibration: map a raw integral quality score to its
    * percentile rank and z-score WITHIN its group (language, source, …),
    * so thresholds compare like-with-like — a single global cutoff on a
    * raw score silently drops whole languages whose score distribution
    * sits lower (the CCNet/fastText-filter lesson). Returns (`idCol`,
    * group, raw score, `pct` = percent_rank in-group, `z` = in-group
    * z-score), both rounded to `roundTo`.
    *
    * Determinism contract (cross-engine hashable): percent_rank orders by
    * (score, id) so ties are total-ordered identically everywhere; the
    * variance comes from EXACT integer aggregates (sum, sum of squares,
    * count — partial-aggregatable longs, no float summation order
    * dependence), combined in a fixed handful of double ops. Spark's
    * stddev would be order-dependent streaming variance; this is not.
    * Shape: one window exchange on the group key + one broadcast-joined
    * per-group moment table — hot groups hit the window sort, acceptable
    * because rows carry only (id, group, score).
    */
  def calibrateScores(df: DataFrame, idCol: String, groupCol: String,
      score: Column, roundTo: Int = 4): DataFrame = {
    val slim = df.select(col(idCol), col(groupCol), score.cast("long").as("raw"))
    val moments = slim.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum("raw").as("__s"),
        sum(col("raw") * col("raw")).as("__ss"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("raw").asc, col(idCol).asc)
    slim
      .withColumn("pct", round(percent_rank().over(w), roundTo))
      .join(broadcast(moments), Seq(groupCol))
      .withColumn("__mean", col("__s").cast("double") / col("__n"))
      .withColumn("__var",
        // guarded: ANSI mode makes the n=1 division an error, not a null
        when(col("__n") > 1,
          (col("__ss").cast("double") - col("__s").cast("double") * col("__s") / col("__n")) /
            (col("__n") - 1)))
      .withColumn("z",
        when(col("__n") > 1 && col("__var") > 0,
          round((col("raw") - col("__mean")) / sqrt(col("__var")), roundTo))
          .otherwise(lit(0.0)))
      .select(col(idCol), col(groupCol), col("raw"), col("pct"), col("z"))
  }

  /** Deterministic global shuffle into `nShards` training shards: shard =
    * 32-bit md5 prefix of the content mod `nShards`, position within the
    * shard by full-hash order. A pure function of the data (same
    * reproducibility contract as [[hashSample]]) — re-running the pipeline
    * on any cluster size yields byte-identical shard files, and the order
    * is content-random, which is the "globally shuffle before training"
    * requirement. Exactly one shuffle (hash-partition on shard +
    * sort within); in production each shard then writes one file
    * (`repartitionByRange`/`sortWithinPartitions` keep the same plan shape
    * at 100 TB — no global sort ever happens).
    */
  def shardShuffle(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val hx = md5(col(textCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("__hx").asc, col(idCol).asc)
    df.select(col(idCol), hx.as("__hx"))
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
