package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as single operators: AS-OF (point-in-time)
  * join and bucketized range join — composed from existing relational ops
  * (the (a) option of the custom-operator ladder) so Catalyst keeps
  * optimizing them; no custom physical plan needed.
  *
  * AS-OF scale design: the naive formulation (join on key + rightTs <=
  * leftTs, then keep the max rightTs per left row) explodes to the full
  * history fan-out before pruning. This operator instead UNIONS the two
  * tagged sides and takes `last(right attrs, ignoreNulls)` over a
  * (key, ts)-sorted prefix window — ONE shuffle on the key, one sort, no
  * fan-out, any history depth. That is the classic time-series
  * merge-as-of re-expressed in Catalyst window form.
  *
  * Range-join scale design: equi-join on overlapping fixed-width buckets
  * (each interval/point lands in its covering buckets) then verify the
  * exact predicate — turning an O(n·m) theta-join Spark would
  * BroadcastNestedLoop into a hash join whose fan-out is bounded by
  * interval length / bucket width.
  */
object TemporalJoin {

  /** For each left row, attach the LATEST right row with the same key and
    * `rightTs <= leftTs` (strict point-in-time semantics: a right row at
    * exactly leftTs matches; ties among right rows break by the later
    * `rightSeq`). Right-side payload columns arrive null when no right row
    * precedes the left row.
    *
    * Output: all left columns + `valCols` from the right side.
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valCols: Seq[String], rightSeqCol: String): DataFrame = {
    val leftCols = left.columns
    val valSchema = org.apache.spark.sql.types.StructType(
      right.select(valCols.map(col): _*).schema.fields)
    val extras = leftCols.filterNot(c => c == keyCol || c == tsCol).toSeq
    val extraTypes = extras.map(c => left.schema(c).dataType)
    // tag both sides POSITIONALLY (key first): right rows sort BEFORE left
    // rows at equal ts so a same-instant right row is visible to the left
    // row (side asc: right=0, left=1); right ties at equal ts resolve by seq
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(Long.MaxValue).as("__seq"), lit(null).cast(valSchema).as("__payload")) ++
        extras.map(col)): _*)
    val taggedRight = right.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        col(rightSeqCol).cast("long").as("__seq"),
        struct(valCols.map(col): _*).as("__payload")) ++
        extras.zip(extraTypes).map { case (c, t) => lit(null).cast(t).as(c) }): _*)
    // partitioning-preserving union on the key: when both sides are
    // already hash-distributed on it (a bucketed fact table; the ref
    // aggregation that rides it), the downstream window adds NO exchange —
    // Spark's Union would discard that partitioning and re-shuffle the
    // whole merged stream
    val aligned = graft.plans.CoPartitionedUnion.coUnion(taggedLeft, taggedRight, 1)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = aligned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    matched.select(leftCols.map(col) ++
      valCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** An interval spanning `>= maxBucketsPerRow` covering buckets cannot be
    * expanded without either unbounded fan-out or silent match loss. The
    * two honest options, selected by the `oversized` parameter:
    *
    *  - `"error"` (default): the expansion itself raises with the
    *    offending interval's bounds and span — zero overhead on the normal
    *    path, and a mis-sized `bucketWidth` is a loud config error instead
    *    of quietly wrong results.
    *  - `"broadcast"`: oversized intervals are split out and theta-joined
    *    via a broadcast side (they are rare by construction — a month-long
    *    outage among second-scale telemetry — so the broadcast is small;
    *    if it is NOT small, Spark's broadcast threshold fails loudly too).
    */
  private def oversizeGuard(op: String, s: String, e: String,
      maxBucketsPerRow: Int): Column =
    when(col("__b1") - col("__b0") < maxBucketsPerRow, col("__b1"))
      .otherwise(raise_error(format_string(
        s"$op: interval [%s, %s) spans %s buckets > maxBucketsPerRow=" +
          s"$maxBucketsPerRow — raise bucketWidth/maxBucketsPerRow or pass " +
          """oversized="broadcast"""",
        col(s).cast("string"), col(e).cast("string"),
        (col("__b1") - col("__b0") + 1).cast("string"))))

  private def checkMode(oversized: String): Unit =
    require(oversized == "error" || oversized == "broadcast",
      s"""oversized must be "error" or "broadcast", got "$oversized"""")

  /** Join points to intervals: each left point row matches right rows
    * whose `[startCol, endCol)` interval contains the point. Both sides
    * bucket at `bucketWidth`; intervals explode to their covering buckets
    * (fan-out = ceil(len/width) + 1, bounded by `maxBucketsPerRow` — see
    * [[oversizeGuard]] for what happens past the bound), the join is a
    * plain equi-join on (bucket), and the exact containment predicate
    * verifies. Columns from both sides survive.
    */
  def rangeJoinPointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerRow: Int = 1024,
      oversized: String = "error"): DataFrame = {
    require(bucketWidth > 0)
    checkMode(oversized)
    val p = points.withColumn("__bucket",
      floor(col(pointCol).cast("double") / bucketWidth).cast("long"))
    val spanned = intervals
      .withColumn("__b0", floor(col(startCol).cast("double") / bucketWidth).cast("long"))
      .withColumn("__b1", floor(col(endCol).cast("double") / bucketWidth).cast("long"))
    val bigPred = col("__b1") - col("__b0") >= maxBucketsPerRow
    val contains = col(pointCol) >= col(startCol) && col(pointCol) < col(endCol)
    val upper =
      if (oversized == "error")
        oversizeGuard("rangeJoinPointInInterval", startCol, endCol, maxBucketsPerRow)
      else col("__b1")
    val normal = if (oversized == "broadcast") spanned.where(!bigPred) else spanned
    val bucketed = p.join(
        normal.withColumn("__bucket", explode(sequence(col("__b0"), upper)))
          .drop("__b0", "__b1"),
        Seq("__bucket"))
      .where(contains)
      .drop("__bucket")
    if (oversized == "broadcast") {
      val big = spanned.where(bigPred).drop("__b0", "__b1")
      bucketed.unionByName(
        points.join(broadcast(big), contains))
    } else bucketed
  }

  /** Interval×interval overlap join: every (left, right) pair whose
    * half-open `[start, end)` intervals intersect — the telemetry /
    * downtime-correlation / concurrent-sessions primitive. Same bucket
    * scheme as [[rangeJoinPointInInterval]] (both sides explode to their
    * covering `bucketWidth` buckets, plain equi-join on the bucket, exact
    * `ls < re AND rs < le` verify) so Spark plans a shuffled hash join
    * instead of the BroadcastNestedLoop a raw theta join would get.
    *
    * A pair sharing SEVERAL buckets must still emit once: the join keeps
    * only the canonical bucket `floor(max(ls, rs) / width)` — the
    * overlap's start lies inside both intervals, so exactly one surviving
    * bucket exists per matching pair, and the dedup is a codegen'd
    * predicate rather than a distinct shuffle. Empty intervals
    * (`end <= start`) match nothing and are filtered before expansion
    * (also keeps `sequence()` ascending). Fan-out per row is
    * `ceil(len/width)` — size `bucketWidth` near the TYPICAL interval
    * length so fan-out stays O(1) and a bucket holds few intervals. An
    * interval past `maxBucketsPerRow` buckets errors by default or rides
    * a broadcast theta-join side — see [[oversizeGuard]]; either way no
    * match is ever silently dropped.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerRow: Int = 1024,
      oversized: String = "error"): DataFrame = {
    require(bucketWidth > 0)
    checkMode(oversized)
    def spanned(df: DataFrame, s: String, e: String) = df
      .where(col(e) > col(s))
      .withColumn("__b0", floor(col(s).cast("double") / bucketWidth).cast("long"))
      .withColumn("__b1",
        floor((col(e).cast("double") - 1) / bucketWidth).cast("long"))
    val bigPred = col("__b1") - col("__b0") >= maxBucketsPerRow
    def expand(df: DataFrame, s: String, e: String) = {
      val upper =
        if (oversized == "error")
          oversizeGuard("intervalOverlapJoin", s, e, maxBucketsPerRow)
        else col("__b1")
      val base = if (oversized == "broadcast") df.where(!bigPred) else df
      base.withColumn("__bucket", explode(sequence(col("__b0"), upper)))
        .drop("__b0", "__b1")
    }
    val l = spanned(left, lStart, lEnd)
    val r = spanned(right, rStart, rEnd)
    val overlap = col(lStart) < col(rEnd) && col(rStart) < col(lEnd)
    val bucketed = expand(l, lStart, lEnd).join(expand(r, rStart, rEnd), Seq("__bucket"))
      .where(overlap)
      .where(col("__bucket") ===
        floor(greatest(col(lStart), col(rStart)).cast("double") / bucketWidth)
          .cast("long"))
      .drop("__bucket")
    if (oversized == "broadcast") {
      // oversized×anything pairs ride two broadcast theta-joins; pairing
      // big-left with ALL of right and big-right with only normal-left
      // covers (big, big) exactly once
      val lBig = l.where(bigPred).drop("__b0", "__b1")
      val rBig = r.where(bigPred).drop("__b0", "__b1")
      val lNorm = l.where(!bigPred).drop("__b0", "__b1")
      bucketed
        .unionByName(broadcast(lBig).join(r.drop("__b0", "__b1"), overlap))
        .unionByName(lNorm.join(broadcast(rBig), overlap))
    } else bucketed
  }
}
