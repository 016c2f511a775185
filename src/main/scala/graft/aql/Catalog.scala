package graft.aql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table metadata the AQL compiler needs, mirroring the reference's schema
  * registry surface (/root/reference/metastore/common/model.go:128-151):
  * fact vs dimension, designated time column (column 0 of fact tables),
  * single-column primary key for dimension joins.
  *
  * `timestampColumns` lists columns stored as Spark TimestampType. The AQL
  * type system has no timestamp type — time columns are Uint32 epoch
  * seconds (model.go:136) — so the compiler resolves these columns to
  * `unix_timestamp(col)` inside expressions while still applying the time
  * filter on the raw column (timestamp-literal comparison pushes down to
  * the parquet scan).
  */
/** @param dayPartitioned the table's storage is day-partitioned on a
  *   `day=yyyy-MM-dd` column derived from the time column (the
  *   [[graft.ingest.Archiver]] layout); the compiler then widens time
  *   filters with day-range predicates so Catalyst statically prunes
  *   partitions — the reference's archive day-range scan
  *   (aql_compiler.go:1047-1056)
  */
/** @param columnTypes declared AQL storage types by column name (e.g.
  *   "GeoPoint", "UUID", "Int64") where the catalog knows them — drives
  *   type-aware literal coercion in filters and the strictCompat width
  *   restrictions; columns without declared types behave as their Spark
  *   types
  */
final case class TableDef(
    name: String,
    isFact: Boolean,
    timeColumn: Option[String] = None,
    timestampColumns: Set[String] = Set.empty,
    primaryKey: Seq[String] = Nil,
    dayPartitioned: Boolean = false,
    columnTypes: Map[String, String] = Map.empty,
    load: SparkSession => DataFrame)

/** Configured timezone-table join (ref aql_compiler.go:439-465): queries
  * with `timezone: "timezone(joinKey)"` auto-join this dimension table and
  * apply the per-row timezone string from `tzColumn`.
  */
final case class TimezoneTableDef(table: String, tzColumn: String)

/** @param dynamic fallback lookup for tables created at runtime through
  *   the schema mutation API (the reference's metastore-backed registry,
  *   api/schema_handler.go:117-254) — consulted after the static map
  */
final case class Catalog(
    tables: Map[String, TableDef],
    timezoneTable: Option[TimezoneTableDef] = None,
    dynamic: String => Option[TableDef] = _ => None) {

  def apply(name: String): TableDef =
    tables.get(name).orElse(dynamic(name)).getOrElse(
      throw ParseException(s"unknown table: $name", 0))
}

object Catalog {
  /** Catalog over the driver-generated testdata star schema (TESTDATA.md).
    * `events` is the fact table with `ts` (TimestampType) as its designated
    * time column; the TPC-H-ish tables join as dimensions.
    */
  def testdata(sfDir: String): Catalog = {
    import graft.Tables
    def t(name: String, isFact: Boolean, timeCol: Option[String] = None,
        tsCols: Set[String] = Set.empty, pk: Seq[String] = Nil): (String, TableDef) =
      name -> TableDef(name, isFact, timeCol, tsCols, pk,
        load = s => Tables.load(s, sfDir, name))
    // events: the fact table is served from the day-partitioned archive by
    // DEFAULT (Tables.eventsArchived) — the reference's archive day-range
    // scan (aql_compiler.go:1047-1056) — so every compiled time filter
    // statically prunes day partitions instead of full-scanning.
    val events = "events" -> TableDef("events", isFact = true, Some("ts"),
      Set("ts"), Seq("event_id"), dayPartitioned = true,
      load = s => Tables.eventsArchived(s, sfDir))
    Catalog(Map(
      events,
      t("lineitem", isFact = true, None, Set("l_shipdate"), Seq("l_orderkey", "l_linenumber")),
      t("orders", isFact = false, None, Set("o_orderdate"), Seq("o_orderkey")),
      t("customer", isFact = false, pk = Seq("c_custkey")),
      t("supplier", isFact = false, pk = Seq("s_suppkey")),
      t("part", isFact = false, pk = Seq("p_partkey")),
      t("nation", isFact = false, pk = Seq("n_nationkey")),
      t("region", isFact = false, pk = Seq("r_regionkey")),
      t("documents", isFact = false, pk = Seq("doc_id")),
      t("embeddings", isFact = false, pk = Seq("vec_id"))))
  }
}
