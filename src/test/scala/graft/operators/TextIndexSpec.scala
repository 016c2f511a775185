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

  test("stats and df match the corpus definition") {
    val stats = spark.read.parquet(s"$dir/stats").head()
    val docs = Tables.documents(spark, sfDir)
    assert(stats.getDouble(0) == docs.count().toDouble)
    val nt = spark.read.parquet(s"$dir/df")
      .where(col("tok") === "batch").head().getDouble(1)
    val expect = docs
      .where(array_contains(split(trim(lower(col("text"))), "\\s+"), "batch"))
      .count().toDouble
    assert(nt == expect, s"df(batch) $nt vs $expect")
  }
}
