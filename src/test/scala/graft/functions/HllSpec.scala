package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate accuracy within 2% at 100k distinct") {
    val regs = new Array[Byte](Hll.M)
    (0 until 100000).foreach { i =>
      Hll.insert(regs, Hll.hashAny(i.toLong, org.apache.spark.sql.types.LongType))
    }
    val est = Hll.estimate(regs)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.02, s"estimate $est")
  }

  test("linear counting exact-ish for small cardinalities") {
    val regs = new Array[Byte](Hll.M)
    (0 until 100).foreach { i =>
      Hll.insert(regs, Hll.hashAny(i.toLong, org.apache.spark.sql.types.LongType))
    }
    val est = Hll.estimate(regs)
    assert(math.abs(est - 100) <= 2, s"estimate $est")
  }

  test("encode/decode roundtrip sparse and dense") {
    val sparse = new Array[Byte](Hll.M)
    (0 until 500).foreach { i =>
      Hll.insert(sparse, Hll.hashAny(i.toLong, org.apache.spark.sql.types.LongType))
    }
    assert(Hll.decode(Hll.encode(sparse)).toSeq == sparse.toSeq)
    assert(Hll.encode(sparse).length % 3 == 0) // sparse 3-byte records

    val dense = new Array[Byte](Hll.M)
    (0 until 200000).foreach { i =>
      Hll.insert(dense, Hll.hashAny(i.toLong, org.apache.spark.sql.types.LongType))
    }
    assert(Hll.encode(dense).length == Hll.M) // dense 16KiB
    assert(Hll.decode(Hll.encode(dense)).toSeq == dense.toSeq)
  }

  test("merge is register-max: split+merge equals direct") {
    val a = new Array[Byte](Hll.M)
    val b = new Array[Byte](Hll.M)
    val direct = new Array[Byte](Hll.M)
    (0 until 50000).foreach { i =>
      val h = Hll.hashAny(i.toLong, org.apache.spark.sql.types.LongType)
      if (i % 2 == 0) Hll.insert(a, h) else Hll.insert(b, h)
      Hll.insert(direct, h)
    }
    Hll.mergeInto(a, b)
    assert(a.toSeq == direct.toSeq)
  }

  test("DataFrame aggregate: two-level sketch merge equals direct estimate") {
    val df = (0 until 20000).map(i => (i % 7, (i % 4321).toLong)).toDF("g", "v")
    val direct = df.groupBy("g").agg(Hll.hllEstimate($"v").as("e"))
      .orderBy("g").collect().map(_.getLong(1))
    val twoLevel = df.withColumn("sub", $"v" % 13)
      .groupBy("g", "sub").agg(Hll.hllSketch($"v").as("sk"))
      .groupBy("g").agg(Hll.hllMergeEstimate($"sk").as("e"))
      .orderBy("g").collect().map(_.getLong(1))
    assert(direct.toSeq == twoLevel.toSeq)
    val exact = df.groupBy("g").agg(count_distinct($"v").as("e"))
      .orderBy("g").collect().map(_.getLong(1))
    direct.zip(exact).foreach { case (est, ex) =>
      assert(math.abs(est - ex.toDouble) / ex < 0.03, s"est $est exact $ex")
    }
  }

  test("get_hll_value packs rho<<16|index") {
    val rows = spark.range(100)
      .select(Hll.getHllValue(col("id")).as("rv"), col("id"))
      .collect()
    rows.foreach { r =>
      val rv = r.getInt(0)
      val expected = Hll.registerValue(
        Hll.hashAny(r.getLong(1), org.apache.spark.sql.types.LongType))
      assert(rv == expected)
      assert((rv & 0xFFFF) < Hll.M)
      assert((rv >> 16) >= 1 && (rv >> 16) <= 51)
    }
  }
}
