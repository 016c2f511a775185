package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("textidx").toString + "/idx"
    TextIndex.build(Tables.documents(spark, sfDir), "doc_id", "text", d,
      nBuckets = 16)
    d
  }

  test("index search equals the from-scratch bm25TopK row-for-row") {
    val queries = Seq((0L, "hash join batch"), (1L, "vector scan"))
    val fresh = TextRank.bm25TopK(Tables.documents(spark, sfDir),
        "doc_id", "text", queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val indexed = TextIndex.search(spark, dir, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(indexed == fresh, s"\nindexed: $indexed\nfresh:   $fresh")
  }

  test("search prunes statically to the query vocabulary's buckets") {
    val queries = Seq((0L, "batch"))
    val buckets = Seq(TextIndex.bucketOf("batch", 16))
    val plan = TextIndex.search(spark, dir, queries, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    // the postings scan must carry the literal bucket IN-list, i.e. the
    // bucket value appears inside a partition filter, and the scan reads
    // a strict subset of partitions
    assert(plan.contains(s"${buckets.head}"),
      s"bucket literal ${buckets.head} not in plan:\n${plan.take(3000)}")
    val scanned = spark.read.parquet(s"$dir/postings")
      .where(col(TextIndex.BucketCol).isin(buckets.map(Integer.valueOf): _*))
      .select(TextIndex.BucketCol).distinct().count()
    assert(scanned <= 1L)
  }

  test("stats and the derived df match the corpus definition") {
    val stats = spark.read.parquet(s"$dir/stats").head()
    val docs = Tables.documents(spark, sfDir)
    assert(stats.getLong(0) == docs.count())
    val nt = spark.read.parquet(s"$dir/postings")
      .where(col("tok") === "batch").count().toDouble
    val expect = docs
      .where(array_contains(split(trim(lower(col("text"))), "\\s+"), "batch"))
      .count().toDouble
    assert(nt == expect, s"df(batch) $nt vs $expect")
  }

  test("phrase search: contiguous-only, overlapping occurrences, first position") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),   // phrase at 1
      (2L, "quick the brown quick"), // both words, never contiguous
      (3L, "a a a b"),               // 'a a' overlaps: bases 0 and 1
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val d2 = Files.createTempDirectory("textidxp").toString + "/idx"
    TextIndex.build(docs, "doc_id", "text", d2, nBuckets = 8)
    val got = TextIndex.phraseSearch(spark, d2,
        Seq((0L, "quick brown"), (1L, "a a")))
      .orderBy("query_id", "doc_id")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L, 1), (1L, 3L, 2L, 0)), got.toString)
  }

  test("phrase search prunes to the phrase vocabulary's buckets") {
    val plan = TextIndex.phraseSearch(spark, dir, Seq((0L, "hash join")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
  }

  test("scoring search column-prunes the positions array at the scan") {
    val plan = TextIndex.search(spark, dir, Seq((0L, "batch")), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("positions"),
      s"positions column must be pruned from a scoring search:\n${plan.take(3000)}")
  }

  test("append: split-then-append answers identically to a one-shot build") {
    val docs = Tables.documents(spark, sfDir)
    val d2 = Files.createTempDirectory("textidx2").toString + "/idx"
    TextIndex.build(docs.where(col("doc_id") < 60), "doc_id", "text", d2,
      nBuckets = 16)
    TextIndex.append(docs.where(col("doc_id") >= 60), "doc_id", "text", d2)
    val queries = Seq((0L, "hash join batch"), (1L, "vector scan"))
    val appended = TextIndex.search(spark, d2, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val oneShot = TextIndex.search(spark, dir, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(appended == oneShot, s"\nappended: $appended\noneShot: $oneShot")
    // stats folded exactly
    val st = spark.read.parquet(s"$d2/stats").head()
    assert(st.getLong(0) == docs.count())
    // positional postings append the same way: phrase answers identical
    val ph = Seq((0L, "hash join"))
    assert(TextIndex.phraseSearch(spark, d2, ph).orderBy("doc_id").collect().toSeq ==
      TextIndex.phraseSearch(spark, dir, ph).orderBy("doc_id").collect().toSeq)
  }

  test("compact folds appended bucket files; answers bit-identical; idempotent") {
    val docs = Tables.documents(spark, sfDir)
    val d3 = Files.createTempDirectory("textidx3").toString + "/idx"
    TextIndex.build(docs.where(col("doc_id") < 40), "doc_id", "text", d3,
      nBuckets = 4)
    // five appends: each adds a file set per touched bucket
    (0 until 5).foreach(i => TextIndex.append(
      docs.where(col("doc_id") >= 40 + i * 10 && col("doc_id") < 50 + i * 10),
      "doc_id", "text", d3))
    def bucketFiles(): Map[String, Int] = {
      val root = new java.io.File(s"$d3/postings")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(b => b.getName ->
          b.listFiles().count(f => f.isFile && f.getName.startsWith("part-")))
        .toMap
    }
    val before = bucketFiles()
    assert(before.values.max > 2, s"appends did not fragment: $before")
    val queries = Seq((0L, "hash join batch"), (1L, "vector scan"))
    val preSearch = TextIndex.search(spark, d3, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val prePhrase = TextIndex.phraseSearch(spark, d3, Seq((0L, "hash join")))
      .orderBy("doc_id").collect().toSeq

    val reports = TextIndex.compact(spark, d3, maxFiles = 2, targetFiles = 1)
    assert(reports.nonEmpty)
    val after = bucketFiles()
    assert(after.values.max <= 2,
      s"file count not bounded after compact: $after")
    reports.foreach(r => assert(r.filesAfter == 1, r.toString))
    // search and phrase answers bit-identical through the rewrite
    assert(TextIndex.search(spark, d3, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq == preSearch)
    assert(TextIndex.phraseSearch(spark, d3, Seq((0L, "hash join")))
      .orderBy("doc_id").collect().toSeq == prePhrase)
    // idempotent: everything within budget now, nothing rewritten
    assert(TextIndex.compact(spark, d3, maxFiles = 2).isEmpty)
    assert(bucketFiles() == after)
  }
}
