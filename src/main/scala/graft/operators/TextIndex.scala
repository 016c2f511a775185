package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Persisted inverted text index: build once, search many — the lexical
  * sibling of [[IvfIndex]]. [[TextRank.bm25TopK]] re-derives term
  * frequencies from raw text on every call (right for ad-hoc queries);
  * a retrieval SERVICE over a static corpus tokenizes once at build and
  * afterwards reads only the postings of the query's terms.
  *
  * Layout: `postings/` (tok, doc_id, tf, len) PARTITIONED BY a
  * term-hash bucket; `stats/` holds the corpus scalars (N, avgdl);
  * `meta` pins nBuckets. The bucket is
  * `hash60(tok) % nBuckets` ([[Sketches.hash60]]) — computable on the
  * driver at search time, so the scan carries a LITERAL partition
  * IN-list and prunes statically to ≤ |query vocab| of the nBuckets
  * partitions ([[graft.operators.TextIndexSpec]] asserts the
  * PartitionFilters). Per-term rows within a bucket then prune by the
  * broadcast vocabulary join.
  *
  * Scoring is the exact arithmetic of [[TextRank.bm25TopK]] (RSJ idf,
  * same normalization, same rounding), so the same SQL oracle pins both
  * paths and `search == bm25TopK` row-for-row.
  */
object TextIndex {

  val BucketCol = "bucket"

  /** Driver-side bucket of a term — must match [[bucketCol]]. */
  def bucketOf(tok: String, nBuckets: Int): Int =
    (Sketches.hash60(tok) % nBuckets).toInt

  private def bucketCol(tok: Column, nBuckets: Int): Column =
    (Sketches.hash60Col(tok) % nBuckets).cast("int")

  private def postings(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    val t = docs.select(col(idCol).cast("long").as("doc_id"),
        TextRank.lowerTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("len"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
    // POSITIONAL postings (the Lucene layout): in-doc 0-based positions
    // sorted for determinism; tf kept as its own column so scoring-only
    // searches column-prune the positions array away at the parquet scan
    // (TextIndexSpec asserts the pruned ReadSchema).
    t.groupBy("doc_id", "len", "tok")
      .agg(count(lit(1)).cast("double").as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn(BucketCol, bucketCol(col("tok"), nBuckets))
  }

  /** Tokenize once, persist postings + corpus stats partitioned by term
    * bucket. Per-term document frequency is NOT materialized: search
    * derives it from the term-pruned postings (identical to the full df
    * because pruning is term-keyed), which is what keeps [[append]] an
    * append — no stored aggregate to rebuild.
    */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
      nBuckets: Int = 64): Unit = {
    require(nBuckets > 0)
    postings(docs, idCol, textCol, nBuckets)
      .write.partitionBy(BucketCol).parquet(s"$dir/postings")
    // store EXACT integers (count, token sum): the average folds
    // exactly under append and sum/n reproduces the one-shot double
    docs.select(size(TextRank.lowerTokens(col(textCol))).as("len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).cast("long").as("sum_len"))
      .write.parquet(s"$dir/stats")
    Files.write(Paths.get(dir, "meta"),
      nBuckets.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Incremental append: new documents' postings land as extra files
    * under the same bucket partitions (no rebuild, no stored aggregate
    * to merge — [[IvfIndex.append]]'s trade) and the two integer corpus
    * scalars fold exactly, so an appended index answers bit-identically
    * to a one-shot build. Callers must not re-append ids already indexed
    * (postings are additive).
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val spark = docs.sparkSession
    val nBuckets = new String(Files.readAllBytes(Paths.get(dir, "meta")),
      StandardCharsets.UTF_8).trim.toInt
    postings(docs, idCol, textCol, nBuckets)
      .write.mode("append").partitionBy(BucketCol).parquet(s"$dir/postings")
    val old = spark.read.parquet(s"$dir/stats").head()
    val add = docs.select(size(TextRank.lowerTokens(col(textCol))).as("len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).cast("long").as("sum_len"))
      .head()
    val n = old.getLong(0) + add.getLong(0)
    val sumLen = old.getLong(1) + add.getLong(1)
    import spark.implicits._
    // write-then-swap so a crash never leaves the index without stats
    val tmp = s"$dir/stats-tmp"
    Seq((n, sumLen)).toDF("n_docs", "sum_len")
      .write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    fs.delete(statsPath, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), statsPath))
      throw new java.io.IOException(s"stats swap failed for $dir")
  }

  /** Fold fragmented bucket partitions back to `targetFiles` files each —
    * [[append]] adds files per bucket without bound, and an index that
    * lives for months of appends hits the same small-file pathology the
    * archive [[graft.ingest.Compactor]] exists for. Same machinery, same
    * crash discipline (temp write + rename swap), bucket partitions
    * instead of days; rows re-sort by term inside the rewritten files so
    * parquet row-group stats skip non-query terms again. Search answers
    * are invariant: every score is an aggregate over the bucket's
    * postings multiset, which compaction preserves exactly. Buckets at or
    * under `maxFiles` are untouched — cost follows the appended tail.
    */
  def compact(spark: SparkSession, dir: String, maxFiles: Int = 8,
      targetFiles: Int = 1): Seq[graft.ingest.Compactor.DayReport] =
    graft.ingest.Compactor.compact(spark, s"$dir/postings",
      sortCols = Seq("tok"), maxFiles = maxFiles, targetFiles = targetFiles,
      partitionPrefix = s"$BucketCol=")

  /** BM25 top-k per query off the persisted index; identical output
    * contract to [[TextRank.bm25TopK]].
    */
  def search(spark: SparkSession, dir: String, queries: Seq[(Long, String)],
      k: Int, k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 4): DataFrame = {
    import spark.implicits._
    val nBuckets = new String(Files.readAllBytes(Paths.get(dir, "meta")),
      StandardCharsets.UTF_8).trim.toInt
    val qTerms = queries
      .flatMap { case (qid, text) =>
        text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => (qid, t))
      }
      .toDF("query_id", "tok")
    val vocab = queries.flatMap(_._2.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).distinct
    val buckets = vocab.map(bucketOf(_, nBuckets)).distinct
      .map(Integer.valueOf).toSeq
    val vocabDf = vocab.toDF("tok")

    val tf = spark.read.parquet(s"$dir/postings")
      .where(col(BucketCol).isin(buckets: _*))
      .join(broadcast(vocabDf), Seq("tok"))
    // per-term df derived from the pruned postings — identical to the
    // full-corpus df because pruning is term-keyed; no stored aggregate
    // means appends stay appends
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("nt"))
    val stats = spark.read.parquet(s"$dir/stats")
      .select(col("n_docs").cast("double").as("n_docs"),
        (col("sum_len").cast("double") / col("n_docs")).as("avg_len"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("nt") + 0.5) / (col("nt") + 0.5))
    val tfNorm = col("tf") * (k1 + 1.0) /
      (col("tf") + (col("len") / col("avg_len") * b + (1.0 - b)) * k1)
    val scored = tf
      .join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qTerms), Seq("tok"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(idf * tfNorm), roundTo).as("score"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Exact phrase search off the positional postings: documents where the
    * phrase's tokens occur CONTIGUOUSLY, with the occurrence count
    * (overlapping occurrences counted — "a a a" holds "a a" twice) and
    * the first match position. Returns `(query_id, doc_id, n_hits,
    * first_pos)`, one row per matching document.
    *
    * Plan: the scan prunes to the phrase vocabulary's bucket partitions
    * (same literal IN-list as [[search]]); each posting row joined to the
    * broadcast `(tok, offset)` phrase terms yields candidate base
    * positions `pos - offset`; a base where ALL `|phrase|` offsets agree
    * is a match (one doc+base-keyed integer aggregate — no positions
    * array ever crosses a shuffle un-exploded). Cost is the postings of
    * the phrase's terms, not the corpus.
    */
  def phraseSearch(spark: SparkSession, dir: String,
      queries: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    val nBuckets = new String(Files.readAllBytes(Paths.get(dir, "meta")),
      StandardCharsets.UTF_8).trim.toInt
    val phrases = queries.map { case (qid, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      require(toks.nonEmpty, s"empty phrase for query $qid")
      (qid, toks)
    }
    val terms = phrases
      .flatMap { case (qid, toks) =>
        toks.zipWithIndex.map { case (t, off) => (qid, t, off) }
      }
      .toDF("query_id", "tok", "off")
    val phraseLen = phrases.map { case (qid, toks) => (qid, toks.length) }
      .toDF("query_id", "n_terms")
    val vocab = phrases.flatMap(_._2).distinct
    val buckets = vocab.map(bucketOf(_, nBuckets)).distinct
      .map(Integer.valueOf).toSeq

    val pruned = spark.read.parquet(s"$dir/postings")
      .where(col(BucketCol).isin(buckets: _*))
      .join(broadcast(terms), Seq("tok"))
      .select(col("query_id"), col("doc_id"), col("off"),
        explode(col("positions")).as("pos"))
      .select(col("query_id"), col("doc_id"), (col("pos") - col("off")).as("base"))
      .where(col("base") >= 0)
    pruned
      .groupBy("query_id", "doc_id", "base")
      .agg(count(lit(1)).as("n_off"))
      .join(broadcast(phraseLen), Seq("query_id"))
      .where(col("n_off") === col("n_terms"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"), min(col("base")).cast("int").as("first_pos"))
  }
}
