package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton-curve) clustering for MULTI-column zone-map skipping.
  *
  * The archive's single sort-column chain (Tables.EventsSortCols, the
  * reference's ArchivingSortColumns — metastore/common/model.go:139-143)
  * gives parquet row-group stats perfect run length on the FIRST sort
  * column and nothing on an independent second column: a scan filtered
  * only by the second predicate reads every file. Interleaving the bits
  * of both columns' normalized values orders rows along a space-filling
  * curve, so every file covers a small RECTANGLE of the value space and
  * min/max stats prune scans filtered on EITHER column — the standard
  * lakehouse answer (Delta/Iceberg `ZORDER BY`) to multi-dimension
  * pruning at 100 TB, where a second full sort copy of the table is not
  * affordable.
  *
  * All arithmetic is 64-bit integer and md5-free: normalization is
  * `(v - min) * 65535 / (max - min)` in integer division, interleave is
  * bit surgery — a SQL oracle replays the exact z-value
  * (`q_zorder_scan`), keeping the layout decision itself under the
  * correctness gate.
  *
  * Scale shape: one bounded stats aggregation (2 longs per column) for
  * the normalization ranges, then the z-value is a map-side expression;
  * `clusterToFiles` range-partitions on it (one exchange, the same cost
  * as any re-sort) and sorts within partitions. No shuffle is added over
  * a plain sort-based rewrite.
  */
object ZOrder {

  /** Bits per dimension: 16 for up to 3 columns (48-bit z), 15 at 4. */
  def bitsPer(nCols: Int): Int = if (nCols <= 3) 16 else 15

  /** The z-value column for `cols` given each column's [min, max]
    * normalization range (from [[stats]] or known bounds). Columns must
    * be integral (cast first); ranges wider than 2^46 would overflow the
    * 64-bit scaling product and are rejected at eval.
    */
  def zValue(cols: Seq[Column], mins: Seq[Long], maxs: Seq[Long]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order interleaves 2-4 columns, got ${cols.size}")
    require(mins.size == cols.size && maxs.size == cols.size)
    Bridge.column(ZValueExpr(
      Bridge.expression(array(cols.map(_.cast(LongType)): _*)),
      mins.toArray, maxs.toArray))
  }

  /** One-pass min/max stats for the normalization ranges (2×n longs to
    * the driver — bounded).
    */
  def stats(df: DataFrame, cols: Seq[String]): (Seq[Long], Seq[Long]) = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast(LongType)), max(col(c).cast(LongType))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0), "z-order stats need a non-empty input")
    val mins = cols.indices.map(i => row.getLong(2 * i))
    val maxs = cols.indices.map(i => row.getLong(2 * i + 1))
    (mins, maxs)
  }

  /** `df` plus a `__z` z-value column over `cols` (stats computed here). */
  def withZValue(df: DataFrame, cols: Seq[String]): DataFrame = {
    val (mins, maxs) = stats(df, cols)
    df.withColumn("__z", zValue(cols.map(col), mins, maxs))
  }

  /** Cluster `df` along the z-curve of `cols` into `nFiles` output
    * partitions: range-partition + sort-within on the z-value, then drop
    * it. Writing the result yields files whose min/max stats prune on
    * every clustered column.
    */
  def clusterToFiles(df: DataFrame, cols: Seq[String], nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles $nFiles must be >= 1")
    withZValue(df, cols)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Reference implementation of the scaling+interleave — shared by the
    * expression's eval and codegen paths, and by specs.
    */
  def compute(vals: Array[Long], mins: Array[Long], maxs: Array[Long]): Long = {
    val n = vals.length
    val bits = bitsPer(n)
    val maxScale = (1L << bits) - 1
    var z = 0L
    var j = 0
    while (j < n) {
      val range = maxs(j) - mins(j)
      require(range >= 0 && range < (1L << 46),
        s"z-order range $range out of bounds for column $j")
      val scaled =
        if (range == 0) 0L
        else (vals(j) - mins(j)) * maxScale / range
      // bit i of column j lands at position i*n + (n-1-j): column 0 owns
      // the most significant lane, matching lexicographic intuition
      var i = 0
      while (i < bits) {
        z |= ((scaled >> i) & 1L) << (i * n + (n - 1 - j))
        i += 1
      }
      j += 1
    }
    z
  }

  /** The oracle-side SQL expression for the same z-value (DuckDB
    * dialect: `//` integer division, `<<`/`>>`/`&` bit ops) — used by
    * gate SQL so the generated 2×16-term interleave stays in ONE place.
    */
  def oracleSql(cols: Seq[String], mins: Seq[String], maxs: Seq[String]): String = {
    val n = cols.size
    val bits = bitsPer(n)
    val maxScale = (1L << bits) - 1
    val scaled = cols.indices.map { j =>
      s"(((${cols(j)} - ${mins(j)}) * $maxScale) // (${maxs(j)} - ${mins(j)}))"
    }
    val terms = for (j <- 0 until n; i <- 0 until bits)
      yield s"(((${scaled(j)} >> $i) & 1) << ${i * n + (n - 1 - j)})"
    terms.mkString("(", " + ", ")")
  }
}

/** Codegen'd z-value over an array of pre-cast long values; the scaling
  * ranges ride as expression parameters so everything is resolved at
  * plan build.
  */
case class ZValueExpr(child: Expression, mins: Array[Long], maxs: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  private def computeFrom(a: Any): Long = {
    val arr = a.asInstanceOf[ArrayData]
    val vals = new Array[Long](arr.numElements())
    var i = 0
    while (i < vals.length) { vals(i) = arr.getLong(i); i += 1 }
    ZOrder.compute(vals, mins, maxs)
  }

  /** Public entry for generated code. */
  def computePublic(a: ArrayData): Long = computeFrom(a)

  override def nullSafeEval(a: Any): Any = computeFrom(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zexpr", this,
      classOf[ZValueExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computePublic($a);")
  }

  override protected def withNewChildInternal(c: Expression): ZValueExpr =
    copy(child = c)

  override def prettyName: String = "z_value"
}
