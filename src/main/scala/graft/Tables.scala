package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Role mapping (FIXTURES.md §5): `lineitem`/`orders`/`events` are fact
  * tables (event time = l_shipdate / o_orderdate / ts); `customer`,
  * `supplier`, `part`, `nation`, `region` are dimension tables with a
  * single-column primary key — the same star shape as the reference's
  * fact + dimension model (/root/reference/metastore/common/model.go:128-151).
  *
  * At 100 TB the fact tables would be day-partitioned parquet directories;
  * these helpers read whatever parquet layout sits under `dir` and rely on
  * Catalyst partition pruning + predicate pushdown for scan reduction.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables: small, single-col PK, broadcast-join candidates. */
  val dims: Set[String] = Set("region", "nation", "customer", "supplier", "part")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) rejects outright. Read it as a raw Long (ns since epoch) and
    * floor-truncate to µs (true floor via pmod, correct for pre-epoch
    * values too). Floor-truncation preserves every comparison against
    * whole-second boundaries, so filters/bucketizers stay exactly
    * consistent with engines that read the full ns value.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session construction (Verify / Bench / SparkSpec) — not mutated here.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    eventsRaw(s, d).withColumn("ts",
      timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
