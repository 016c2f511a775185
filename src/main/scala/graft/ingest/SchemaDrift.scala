package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-side schema-drift guard: classify the difference between an
  * incoming batch's schema and the table's schema, and either ALIGN the
  * batch (drop unknown columns, fill missing ones with null, apply safe
  * integral/float widenings) or fail loudly on a genuine conflict — the
  * decision a long-lived pipeline makes on every upstream producer
  * change. The server's schema-mutation API (api/SchemaStore, ref
  * api/schema_handler.go) governs DECLARED evolution; this guard covers
  * the UNDECLARED kind that arrives in the data itself.
  *
  * Safe widenings follow the reference's numeric lattice
  * (SURVEY §1.2: unsigned < signed < float, widths widen): byte→short→
  * int→long, float→double, and integral→double. Narrowings and
  * cross-family changes (string→int, …) are conflicts.
  *
  * Purely structural — no data pass; `align` is a projection.
  */
object SchemaDrift {

  sealed trait Change { def column: String }
  /** Batch column unknown to the table (alignment drops it). */
  final case class Added(column: String, dt: DataType) extends Change
  /** Table column absent from the batch (alignment fills null). */
  final case class Missing(column: String, dt: DataType) extends Change
  /** Batch type safely widens to the table type (alignment casts). */
  final case class Widened(column: String, from: DataType, to: DataType)
    extends Change
  /** Incompatible type change — alignment refuses. */
  final case class Conflict(column: String, from: DataType, to: DataType)
    extends Change

  private val widenOrder: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  private def safeWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => true
    case (f: DataType, t: DataType)
        if widenOrder.contains(f) && widenOrder.contains(t) =>
      widenOrder(f) < widenOrder(t)
    case (FloatType, DoubleType) => true
    case (f, DoubleType) if widenOrder.contains(f) => true
    // only byte/short fit float's 24-bit mantissa losslessly — int/long
    // values past 2^24 would silently round (ids, counters), so those
    // stay Conflicts per the documented lattice
    case (f, FloatType) if widenOrder.get(f).exists(_ <= 1) => true
    case _ => false
  }

  /** Classify every column of `batch` against `table`. */
  def diff(batch: StructType, table: StructType): Seq[Change] = {
    val b = batch.fields.map(f => f.name -> f.dataType).toMap
    val added = batch.fields.collect {
      case f if !table.fieldNames.contains(f.name) => Added(f.name, f.dataType)
    }
    val rest = table.fields.flatMap { tf =>
      b.get(tf.name) match {
        case None => Some(Missing(tf.name, tf.dataType))
        case Some(dt) if dt == tf.dataType => None
        case Some(dt) if safeWiden(dt, tf.dataType) =>
          Some(Widened(tf.name, dt, tf.dataType))
        case Some(dt) => Some(Conflict(tf.name, dt, tf.dataType))
      }
    }
    (added ++ rest).toSeq
  }

  /** Project `batch` onto `table`'s exact schema: unknown columns
    * dropped, missing ones null-filled, safe widenings cast. Throws with
    * every conflict named if any column is incompatible.
    */
  def align(batch: DataFrame, table: StructType): DataFrame = {
    val changes = diff(batch.schema, table)
    val conflicts = changes.collect { case c: Conflict => c }
    require(conflicts.isEmpty,
      s"schema drift conflicts: ${conflicts.map(c =>
        s"${c.column} (${c.from.simpleString} -> ${c.to.simpleString})")
        .mkString(", ")}")
    val cols = table.fields.map { tf =>
      if (batch.schema.fieldNames.contains(tf.name))
        col(tf.name).cast(tf.dataType).as(tf.name)
      else lit(null).cast(tf.dataType).as(tf.name)
    }
    batch.select(cols.toIndexedSeq: _*)
  }
}
