package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  private val table = StructType(Seq(
    StructField("id", LongType),
    StructField("score", DoubleType),
    StructField("name", StringType)))

  test("diff classifies added / missing / widened / conflict") {
    val batch = StructType(Seq(
      StructField("id", IntegerType),      // widens to long
      StructField("score", StringType),    // conflict
      StructField("extra", StringType)))   // added; 'name' missing
    val d = SchemaDrift.diff(batch, table)
    assert(d.collect { case SchemaDrift.Added(c, _) => c } == Seq("extra"))
    assert(d.collect { case SchemaDrift.Missing(c, _) => c } == Seq("name"))
    assert(d.collect { case SchemaDrift.Widened(c, _, _) => c } == Seq("id"))
    assert(d.collect { case SchemaDrift.Conflict(c, _, _) => c } == Seq("score"))
  }

  test("identical schemas diff to nothing") {
    assert(SchemaDrift.diff(table, table).isEmpty)
  }

  test("narrowings are conflicts, not widenings") {
    val batch = StructType(Seq(StructField("id", LongType)))
    val target = StructType(Seq(StructField("id", IntegerType)))
    val d = SchemaDrift.diff(batch, target)
    assert(d == Seq(SchemaDrift.Conflict("id", LongType, IntegerType)))
  }

  test("int/long to float are conflicts (24-bit mantissa), short to float widens") {
    // int→float silently rounds every value past 2^24 (ids, counters) —
    // outside the documented lattice, so it must refuse, not corrupt
    def one(from: DataType): Seq[SchemaDrift.Change] = SchemaDrift.diff(
      StructType(Seq(StructField("v", from))),
      StructType(Seq(StructField("v", FloatType))))
    assert(one(IntegerType) ==
      Seq(SchemaDrift.Conflict("v", IntegerType, FloatType)))
    assert(one(LongType) == Seq(SchemaDrift.Conflict("v", LongType, FloatType)))
    assert(one(ShortType) == Seq(SchemaDrift.Widened("v", ShortType, FloatType)))
    assert(one(ByteType) == Seq(SchemaDrift.Widened("v", ByteType, FloatType)))
  }

  test("align drops unknowns, null-fills missing, widens, preserves order") {
    val batch = Seq((1, "x", 9)).toDF("id", "extra", "n")
      .withColumnRenamed("n", "dropme")
    val aligned = SchemaDrift.align(batch, table)
    // names/types/order match the table (nullability is data-derived)
    assert(aligned.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      table.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = aligned.head()
    assert(row.getLong(0) == 1L)
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("align fails loudly naming every conflict") {
    val batch = Seq(("a", "b")).toDF("id", "score")
    val err = intercept[IllegalArgumentException] {
      SchemaDrift.align(batch, table)
    }
    assert(err.getMessage.contains("id") && err.getMessage.contains("score"),
      err.getMessage)
  }
}
