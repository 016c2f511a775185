package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ingest.{Archiver, Upsert}

/** Gate queries for the ingestion/archive lifecycle (SURVEY §2.1 rows
  * 3/7/10, §2.8 row 55). The DuckDB oracles re-state upsert PK-overwrite
  * semantics with set operations and the archive day-range scan with a
  * plain time filter over the original table.
  */
object IngestQueries {

  val defs: Seq[QueryDef] = Seq(

    // PK-overwrite upsert: later in-batch record wins, miss appends
    // (ref memstore/ingestion.go:172+, cuckoo_index.go:195)
    QueryDef("q_upsert_dedup",
      """WITH existing AS (
        |  SELECT event_id, event_type, value FROM events WHERE event_id < 5000),
        |b1 AS (SELECT event_id, event_type, value + 1000 AS value
        |       FROM events WHERE event_id % 2 = 0),
        |b2 AS (SELECT event_id, event_type, value + 2000 AS value
        |       FROM events WHERE event_id % 4 = 0),
        |latest AS (SELECT * FROM b2 UNION ALL
        |           SELECT * FROM b1 WHERE event_id NOT IN (SELECT event_id FROM b2)),
        |merged AS (SELECT * FROM latest UNION ALL
        |           SELECT e.* FROM existing e
        |           WHERE e.event_id NOT IN (SELECT event_id FROM latest))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM merged GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "event_type", "value")
      val existing = ev.where(col("event_id") < 5000)
      val batch =
        ev.where(col("event_id") % 2 === 0)
          .withColumn("value", col("value") + 1000).withColumn("seq", lit(1L))
        .unionByName(
          ev.where(col("event_id") % 4 === 0)
            .withColumn("value", col("value") + 2000).withColumn("seq", lit(2L)))
      Upsert(existing, batch, Seq("event_id"), "seq")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
        .orderBy("event_type")
    },

    // archive lifecycle round-trip: day-partitioned write + pruned
    // day-range scan equals a plain time filter over the source table
    // (ref memstore/archiving.go:59-141; aql_compiler.go:1047-1056)
    QueryDef("q_archive_scan",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events
        |WHERE epoch(ts) >= 1704412800 AND epoch(ts) < 1704672000
        |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      // scan the shared build-once archive fixture (Tables.eventsArchived)
      // rather than writing a fresh archive per gate run — the gate times
      // the pruned day-range scan, not the write
      Tables.eventsArchived(s, d)
      Archiver.scan(s, Tables.eventsArchivePath(d), "ts", 1704412800L, 1704672000L)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    // z-order layout correctness: the Morton z-value that drives the
    // multi-column clustered rewrite (ZOrder/Compactor zorderCols) is
    // exact 64-bit integer arithmetic, replayed term-for-term by the
    // oracle — the layout decision itself sits under the hash gate.
    QueryDef("q_zorder_value", {
      val z = graft.ingest.ZOrder.oracleSql(
        Seq("user_id", "event_id"),
        Seq("st.amin", "st.bmin"), Seq("st.amax", "st.bmax"))
      s"""WITH st AS (SELECT MIN(user_id) AS amin, MAX(user_id) AS amax,
         |              MIN(event_id) AS bmin, MAX(event_id) AS bmax
         |            FROM events),
         |z AS (SELECT $z AS zv FROM events CROSS JOIN st)
         |SELECT CAST(zv >> 28 AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(MIN(zv) AS BIGINT) AS zmin, CAST(MAX(zv) AS BIGINT) AS zmax
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
    }) { (s, d) =>
      graft.ingest.ZOrder.withZValue(
          Tables.events(s, d).select("user_id", "event_id"),
          Seq("user_id", "event_id"))
        .groupBy(shiftright(col("__z"), 28).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min("__z").as("zmin"), max("__z").as("zmax"))
        .orderBy("bucket")
    },

    // array columns over the reference's binary upsert wire: rows round
    // the FULL client encode -> server decode hop (upsert_batch.go:509-532
    // array offset/value vectors; data_value.go:615-728 per-value layout)
    // before the aggregation, so a byte-layout bug in either direction is
    // a hash mismatch. Arrays carry a null row, an empty array (distinct
    // from null) and null elements; the oracle rebuilds the same arrays
    // with SQL list functions. The collect is the wire's own client-side
    // batching (bounded: <3k rows; the format caps at 65535).
    QueryDef("q_wire_array_ingest",
      """WITH arr AS (SELECT event_id,
        |  CASE WHEN event_id % 17 = 0 THEN NULL
        |       WHEN event_id % 11 = 0 THEN []
        |       ELSE [CAST(event_id % 7 AS INT),
        |             CASE WHEN event_id % 5 = 0 THEN NULL
        |                  ELSE CAST(event_id % 13 AS INT) END,
        |             CAST(event_id % 19 AS INT)] END AS stops
        |  FROM events WHERE event_id < 3000)
        |SELECT CAST(len(stops) AS INT) AS n_elems,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(list_extract(stops, 1)) AS BIGINT) AS first_sum,
        |  CAST(SUM(list_extract(stops, 2)) AS BIGINT) AS second_sum
        |FROM arr GROUP BY 1 ORDER BY n_elems NULLS FIRST""".stripMargin) { (s, d) =>
      import graft.api.{UpsertBatchWire, UpsertClient}
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = Tables.events(s, d).where(col("event_id") < 3000)
        .select("event_id").orderBy("event_id").collect().map(_.getLong(0))
      def stops(id: Long): Option[IndexedSeq[Option[Any]]] =
        if (id % 17 == 0) None
        else if (id % 11 == 0) Some(IndexedSeq.empty)
        else Some(IndexedSeq(Some(id % 7),
          if (id % 5 == 0) None else Some(id % 13), Some(id % 19)))
      val bytes = UpsertClient.encode(ids.length, 1706659200L, Seq(
        (0, UpsertBatchWire.Int64,
          ids.toIndexedSeq.map(i => Some(i): Option[Any])),
        (1, UpsertBatchWire.Int32 | UpsertBatchWire.ArrayBit,
          ids.toIndexedSeq.map(i => stops(i): Option[Any]))))
      val batch = UpsertBatchWire.decode(bytes)
      val rows: java.util.List[Row] = new java.util.ArrayList[Row](batch.numRows)
      (0 until batch.numRows).foreach { r =>
        val id = batch.columns(0).values(r).get.asInstanceOf[Long]
        val arr = batch.columns(1).values(r).map {
          case elems: IndexedSeq[_] => elems.map {
            case Some(v: Long) => Integer.valueOf(v.toInt)
            case _ => null
          }
        }
        rows.add(Row(id, arr.orNull))
      }
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("stops", ArrayType(IntegerType))))
      s.createDataFrame(rows, schema)
        .groupBy(size(col("stops")).as("n_elems"))
        .agg(count(lit(1)).as("cnt"),
          sum(try_element_at(col("stops"), lit(1))).cast("bigint").as("first_sum"),
          sum(try_element_at(col("stops"), lit(2))).cast("bigint").as("second_sum"))
        .orderBy(col("n_elems").asc_nulls_first)
    }
  )
}
