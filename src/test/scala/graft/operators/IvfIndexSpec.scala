package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Persisted IVF index: build-once/search-many, planted recall, and the
  * storage-level contract — search scans only the probed cells (dynamic
  * partition pruning on the cell partition column).
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("ivfindex").toString
    IvfIndex.build(Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      nlist = 16, dir = d)
    d
  }

  private def queries = Tables.embeddings(spark, sfDir)
    .where(col("vec_id") < 10)
    .withColumn("vec_id", col("vec_id") + 100000)
    .withColumn("embedding",
      transform(col("embedding"), (x, i) =>
        (x.cast("double") + sin(i.cast("double") * 1.3) * 0.01).cast("float")))

  test("planted sources surface from the persisted index") {
    val found = IvfIndex.search(spark, dir, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .groupBy("query_id")
      .agg(max(col("neighbor_id") === col("query_id") - 100000).as("hit"))
      .collect()
    assert(found.length == 10)
    assert(found.forall(_.getBoolean(1)), found.mkString(", "))
  }

  test("range search finds planted copies and respects the threshold") {
    import spark.implicits._
    val got = IvfIndex.searchRange(spark, dir, queries, "vec_id", "embedding",
      minCosine = 0.9, nProbe = 4)
    // every returned pair clears the threshold
    assert(got.where(col("cos") < 0.9).count() == 0)
    // every planted source (cos ≈ 0.999 with its query) is inside the radius
    val hits = got.where(col("neighbor_id") === col("query_id") - 100000)
      .select("query_id").as[Long].collect().toSet
    assert(hits == (100000L until 100010L).toSet, s"missing: ${hits.size}/10")
  }

  test("search prunes to the probed cells (dynamic partition pruning)") {
    val df = IvfIndex.search(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"assignments scan not dynamically pruned:\n${plan.take(3000)}")
  }

  test("index reloads in a fresh read path (no rebuild between searches)") {
    // second search touches only the persisted files
    val again = IvfIndex.search(spark, dir, queries.limit(3),
      "vec_id", "embedding", k = 1, nProbe = 4)
    assert(again.count() == 3)
  }

  test("append adds vectors under existing cell partitions, centroids untouched") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val base = Tables.embeddings(spark, sfDir).where(col("vec_id") < 300)
    IvfIndex.build(base, "vec_id", "embedding", nlist = 8, dir = d,
      refineIterations = 1)
    val centsBefore = IvfIndex.centroids(spark, d).map(_.toSeq)
    val twins = Tables.embeddings(spark, sfDir).where(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 300000)
    IvfIndex.append(spark, d, twins, "vec_id", "embedding")
    // append never re-trains: centroid file is bit-identical
    assert(IvfIndex.centroids(spark, d).map(_.toSeq).toSeq == centsBefore.toSeq)
    // appended rows landed inside the existing cell partition layout and
    // searches see them: each original vector's twin shares its cell, so
    // probing from the original surfaces the twin (self-id is NOT excluded
    // here because ids differ)
    val assigned = spark.read.parquet(s"$d/assignments")
    assert(assigned.where(col("vec_id") >= 300000).count() == 5)
    val queries = Tables.embeddings(spark, sfDir).where(col("vec_id") < 5)
    val hits = IvfIndex.search(spark, d, queries, "vec_id", "embedding",
        k = 1, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    queries.select("vec_id").as[Long].collect().foreach { q =>
      assert(hits(q) == q + 300000, s"$q -> ${hits(q)}")
    }
  }

  test("compact folds appended cell files; probes identical; idempotent") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    val base = Tables.embeddings(spark, sfDir).where(col("vec_id") < 300)
    IvfIndex.build(base, "vec_id", "embedding", nlist = 4, dir = d,
      refineIterations = 1)
    (0 until 5).foreach { i =>
      val batch = Tables.embeddings(spark, sfDir)
        .where(col("vec_id") >= 300 + i * 20 && col("vec_id") < 320 + i * 20)
        .withColumn("vec_id", col("vec_id") + 300000)
      IvfIndex.append(spark, d, batch, "vec_id", "embedding")
    }
    def cellFiles(): Map[String, Int] = {
      val root = new java.io.File(s"$d/assignments")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(c => c.getName ->
          c.listFiles().count(f => f.isFile && f.getName.startsWith("part-")))
        .toMap
    }
    val before = cellFiles()
    assert(before.values.max > 2, s"appends did not fragment: $before")
    val qs = Tables.embeddings(spark, sfDir).where(col("vec_id") < 10)
    val pre = IvfIndex.search(spark, d, qs, "vec_id", "embedding", k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq

    val reports = IvfIndex.compact(spark, d, maxFiles = 2, targetFiles = 1)
    assert(reports.nonEmpty)
    assert(cellFiles().values.max <= 2, s"not bounded: ${cellFiles()}")
    assert(IvfIndex.search(spark, d, qs, "vec_id", "embedding", k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq == pre,
      "probe answers changed through the rewrite")
    // centroids untouched by compaction
    assert(IvfIndex.centroids(spark, d).length == 4)
    // idempotent
    assert(IvfIndex.compact(spark, d, maxFiles = 2).isEmpty)
  }

  // ---- IVF-SQ8 -----------------------------------------------------------

  private lazy val sq8Dir = {
    val d = java.nio.file.Files.createTempDirectory("ivfsq8").toString
    IvfIndex.buildSq8(Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      nlist = 16, dir = d)
    d
  }

  test("IVF-SQ8: planted sources surface from residual ADC over probed cells") {
    val found = IvfIndex.searchSq8(spark, sq8Dir, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .groupBy("query_id")
      .agg(max(col("neighbor_id") === col("query_id") - 100000).as("hit"))
      .collect()
    assert(found.length == 10)
    assert(found.forall(_.getBoolean(1)), found.mkString(", "))
  }

  test("IVF-SQ8: search prunes to the probed cells (dynamic partition pruning)") {
    val df = IvfIndex.searchSq8(spark, sq8Dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"codes scan not dynamically pruned:\n${plan.take(3000)}")
  }

  test("IVF-SQ8: an exact corpus copy ranks 1 (ADC = source's own quant error)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val exact = emb.where(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 200000)
    val top1 = IvfIndex.searchSq8(spark, sq8Dir, exact, "vec_id", "embedding",
        k = 1, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top1.size == 5)
    top1.foreach { case (q, n) => assert(n == q - 200000, s"$q -> $n") }
  }
}
