package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-stage attribution of `q_pipeline_e2e` (diagnostic main, test scope
  * — `sbt "Test/runMain graft.PipelineStageProbe <sfDir>"`): replays
  * [[graft.operators.Pipeline.curate]]'s exact stage sequence with a
  * materialization barrier after every stage, timing each, then A/Bs the
  * two persist boundaries (s1, slim) the operator carries — a boundary that
  * pays at sf0.1 can thrash at sf10. Findings go to BENCH_NOTES (r15).
  *
  * Mirrors Pipeline.curate:39-90 stage for stage; divergence here
  * invalidates the attribution, so keep the two in sync.
  */
object PipelineStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Curation, Sampling, Packing, TextOps, Staged}

    def timed(what: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pipe-stage] $what%-28s $s%7.2f s  ($n rows)")
      s
    }

    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    val input = docs
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 100000))
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", concat(col("text"), lit(" zz yy xx"))))
    timed("s0 input build")(input.count())

    def runStaged(persistBoundaries: Boolean): Double = {
      spark.catalog.clearCache()
      val total0 = System.nanoTime()
      val s1Ids = Dedup.exactKeepMin(input, "text", "doc_id").select("doc_id")
      val s1raw = input.join(s1Ids, Seq("doc_id"), "left_semi")
      val s1 = if (persistBoundaries)
        s1raw.persist(StorageLevel.MEMORY_AND_DISK) else s1raw
      val t1 = timed("s1 exact dedup")(s1.count())

      val sigs = Dedup.minhashSignatures(s1, "doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val comp = Dedup.connectedComponents(
        Dedup.minhashCandidates(sigs, "doc_id")
          .where(col("est_jaccard") >= 0.35), "a_id", "b_id")
      val compRenamed = comp.withColumnRenamed("id", "doc_id")
      val s2 = s1.join(compRenamed, Seq("doc_id"), "left")
        .where(col("component").isNull || col("component") === col("doc_id"))
        .drop("component")
      val t2 = timed("s2 minhash near-dup + CC")(s2.count())
      sigs.unpersist(false)

      // fused stage 3 (r16): benchmark grams collected once, one corpus
      // pass computes (token count, contamination flag) per document
      val benchSet = spark.sparkContext.broadcast(
        Curation.benchmarkGramSet(docs.where(col("doc_id") < 5), "text", 8))
      val probe = Curation.tokenCountContamUdf(benchSet, 8)
      val slimRaw = s2
        .select(col("doc_id"), col("source"),
          probe(TextOps.tokens(col("text"))).as("__p"))
        .where(col("__p").isNull || !col("__p._2"))
        .select(col("doc_id"), col("source"), col("__p._1").as("__n"))
      val slim = if (persistBoundaries)
        slimRaw.persist(StorageLevel.MEMORY_AND_DISK) else slimRaw
      val t3 = timed("s3 decontam + slim manifest")(slim.count())

      val s4 = Sampling.tokenBudgetMix(slim, "source", col("doc_id"), "__n", 1000L)
      val t4 = timed("s4 token-budget mix")(s4.count())

      val packed = Packing.packOffsets(
        s4.select(col("doc_id"), col("__n")), "doc_id", "__n", 128)
      val out = Staged.materialize(
        s4.select(col("doc_id"), col("source")).join(packed, Seq("doc_id")))
      val t5 = timed("s5 pack + manifest")(out.count())
      if (persistBoundaries) { s1.unpersist(false); slim.unpersist(false) }
      val total = (System.nanoTime() - total0) / 1e9
      println(f"[pipe-stage] staged total (persist=$persistBoundaries): " +
        f"$total%7.2f s  (stage sum ${t1 + t2 + t3 + t4 + t5}%.2f)")
      total
    }

    // staged attribution WITH the shipped persist boundaries, twice
    // (min-of-2 against host stalls)
    val a = runStaged(persistBoundaries = true)
    val b = runStaged(persistBoundaries = true)
    println(f"[pipe-stage] WITH boundaries min-of-2:    ${math.min(a, b)}%7.2f s")
    // A/B: same stage barriers, NO persist — does the boundary still pay?
    val c = runStaged(persistBoundaries = false)
    val d = runStaged(persistBoundaries = false)
    println(f"[pipe-stage] WITHOUT boundaries min-of-2: ${math.min(c, d)}%7.2f s")

    // and the gate as shipped (no per-stage barriers), the honest total
    def gate(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.operators.Pipeline.curate(input, "doc_id", "text", "source",
          minhashThreshold = 0.35,
          decontamBenchmark = docs.where(col("doc_id") < 5),
          decontamN = 8, budgetTokens = 1000L, packBudget = 128)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val g = math.min(gate(), gate())
    println(f"[pipe-stage] shipped gate min-of-2:       $g%7.2f s")
    spark.stop()
  }
}
