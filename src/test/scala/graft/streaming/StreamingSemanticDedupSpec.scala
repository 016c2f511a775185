package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Cross-batch embedding dedup against the persistent LSH bucket store:
  * in-batch resolution, store hits across batches, compaction, replay
  * idempotence — the [[StreamingNearDedupSpec]] contract, semantic form.
  */
class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  // deterministic vectors: `near(v)` perturbs one component slightly
  // (cosine > 0.99); `other*` are mutually far (cosine well under 0.9)
  private val vA = Array(1f, 2f, -1f, 0.5f, 3f, -2f, 1f, 0.25f)
  private def near(v: Array[Float], eps: Float): Array[Float] = {
    val out = v.clone(); out(0) += eps; out(3) -= eps; out
  }
  private val vB = Array(-2f, 1f, 3f, -1f, 0.5f, 2f, -0.5f, 1f)
  private val vC = Array(0.5f, -3f, 1f, 2f, -1f, 0.25f, 2f, -2f)

  private def rows(vs: (Long, Array[Float])*): DataFrame =
    vs.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")

  private def decisions(df: DataFrame): Map[Long, (Boolean, Option[Long])] =
    df.collect().map(r => r.getLong(0) ->
      (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  private def process(dir: String, batchId: Long, vs: (Long, Array[Float])*) =
    decisions(StreamingSemanticDedup.processBatch(
      rows(vs: _*), "vec_id", "embedding", Dim, dir, batchId, threshold = 0.98))

  test("in-batch semantic dups collapse; later batches dedup against the store") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString

    // batch 0: an original, its in-batch near-dup, an unrelated vector
    val b0 = process(dir, 0L, 1L -> vA, 2L -> near(vA, 0.05f), 3L -> vB)
    assert(b0(1L) == ((true, None)), b0.toString)
    assert(b0(2L) == ((false, Some(1L))), b0.toString)
    assert(b0(3L) == ((true, None)), b0.toString)

    // batch 1: near-dup of batch-0's keeper -> store hit; a fresh vector
    val b1 = process(dir, 1L, 10L -> near(vA, 0.08f), 11L -> vC)
    assert(b1(10L) == ((false, Some(1L))), b1.toString)
    assert(b1(11L) == ((true, None)), b1.toString)

    // batch 2: near-dup of DROPPED 10's content still traces to 1 (10
    // never entered the store); near-dup of 11 hits 11
    val b2 = process(dir, 2L, 20L -> near(vA, 0.1f), 21L -> near(vC, 0.05f))
    assert(b2(20L) == ((false, Some(1L))), b2.toString)
    assert(b2(21L) == ((false, Some(11L))), b2.toString)
  }

  test("compaction folds batch dirs; base hits and replay idempotence survive") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup-compact").toString
    def dirs(): Set[String] = {
      val f = new java.io.File(dir)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).toSet
    }
    process(dir, 0L, 1L -> vA)
    process(dir, 1L, 2L -> vB)
    process(dir, 2L, 3L -> vC)
    assert(dirs().count(_.startsWith("batch=")) == 3)

    val folded = StreamingSemanticDedup.compactStore(spark, dir, upToBatchId = 1L)
    assert(folded == 2, s"folded $folded")
    assert(dirs() == Set("base=1", "batch=2"), dirs().toString)

    // cross-batch hit against a representative now living in the base
    val b3 = process(dir, 3L, 30L -> near(vA, 0.06f))
    assert(b3(30L) == ((false, Some(1L))), b3.toString)

    // exactly-once replay: same batch id overwrites, store size unchanged
    val before = spark.read.parquet(s"$dir/batch=*").count()
    process(dir, 2L, 3L -> vC)
    val after = spark.read.parquet(s"$dir/batch=*").count()
    assert(before == after, s"replay grew the store: $before -> $after")
  }
}
