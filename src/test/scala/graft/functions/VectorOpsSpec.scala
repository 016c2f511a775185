package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)

  /** Every adjacent-id embedding pair in the corpus. */
  private def pairs = {
    val shifted = emb.select((col("vec_id") + 1).as("vec_id"),
      col("embedding").as("emb_b"))
    emb.join(shifted, "vec_id")
  }

  test("codegen cosine is bit-identical to the interpreted HOF fold") {
    val diff = pairs.select(
      VectorOps.cosine(col("embedding"), col("emb_b")).as("cg"),
      Similarity.cosineHof(col("embedding"), col("emb_b")).as("hof"))
      .where(col("cg") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("cosine of a vector with itself is exactly 1 up to fp, and is symmetric") {
    val self = emb.select(VectorOps.cosine(col("embedding"), col("embedding")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-12)
    val asym = pairs.select(
      VectorOps.cosine(col("embedding"), col("emb_b")).as("ab"),
      VectorOps.cosine(col("emb_b"), col("embedding")).as("ba"))
      .where(col("ab") =!= col("ba")).count()
    assert(asym == 0, "dot and both norms commute → cosine is exactly symmetric")
  }

  test("CosineSim participates in whole-stage codegen") {
    val df = pairs.select(VectorOps.cosine(col("embedding"), col("emb_b")).as("c"))
    df.collect() // finalize the adaptive plan before inspecting it
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE query stages hide their plans from collect(), so assert on the
    // tree rendering: `*(n)` marks a WholeStageCodegen span
    val tree = executed.treeString
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(tree).isDefined,
      s"cosine_sim not inside WholeStageCodegen:\n$tree")
  }

  test("null inputs propagate, mismatched prefix uses the common length") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1f, 0f)), Some(Seq(1f, 0f, 5f))), // prefix len 2
      (None, Some(Seq(1f, 0f)))
    ).toDF("a", "b")
    val rows = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
  }
}
