package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def top(rows: Array[Row]): Seq[(String, Long)] =
    rows.head.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))

  test("exact when capacity covers the cardinality") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .toDF("x").repartition(4)
    val out = top(df.agg(FreqItems.freqItems(col("x"), 10)).collect())
    assert(out == Seq(("a", 5L), ("b", 3L), ("c", 1L)))
  }

  test("undercount stays within n/(capacity+1) and never overcounts") {
    // 40 distinct light items + one heavy: capacity 8 forces evictions
    val light = (0 until 40).flatMap(i => Seq.fill(5)(s"item_$i"))
    val heavy = Seq.fill(100)("heavy")
    val n = light.size + heavy.size
    val df = scala.util.Random.shuffle(light ++ heavy).toDF("x").repartition(8)
    val out = top(df.agg(FreqItems.freqItems(col("x"), 8)).collect())
    val est = out.toMap.getOrElse("heavy", 0L)
    assert(est <= 100, s"overcounted: $est")
    // merge of P partials relaxes the single-pass bound by a constant
    // factor; 2·n/(cap+1) is the safe envelope for this fixture
    assert(est >= 100 - 2 * n / 9, s"undercounted past the bound: $est")
    assert(out.head._1 == "heavy", s"heavy hitter not ranked first: $out")
  }

  test("summary is deterministic across partitionings for a dominant item") {
    val data = (Seq.fill(200)("big") ++ (0 until 30).map(i => s"s$i")).toDF("x")
    val a = top(data.repartition(2).agg(FreqItems.freqItems(col("x"), 4)).collect())
    val b = top(data.repartition(13).agg(FreqItems.freqItems(col("x"), 4)).collect())
    assert(a.head._1 == "big" && b.head._1 == "big")
  }
}
