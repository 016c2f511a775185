package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval and corpus n-gram statistics — the text-side
  * counterpart of the embedding similarity operators: BM25 scoring against
  * a (small) query set, and corpus-wide n-gram frequency tables.
  *
  * Scale design (100 TB):
  *  - BM25 never builds a materialized inverted index: per-doc term
  *    frequencies are computed map-side from the token array, then
  *    IMMEDIATELY filtered to the query vocabulary (broadcast — a few
  *    hundred terms), so the only shuffled rows are (doc, query-term)
  *    hits. Document frequencies aggregate over that filtered set (the
  *    per-term doc count is unchanged by dropping other terms). Corpus
  *    scalars (N, avg length) ride a broadcast crossJoin of two 1-row
  *    aggregates; scoring is one groupBy(doc, query) and top-k is the
  *    standard per-query window.
  *  - N-gram counting is explode → groupBy(ngram) with map-side partial
  *    aggregation; the `minCount` cutoff applies before any ordering, and
  *    the final top-k is a single `orderBy.limit` (Spark executes it as
  *    TakeOrderedAndProject — per-partition heaps, no full sort).
  */
object TextRank {

  /** Whitespace tokens, lowercased — matches [[TextOps.tokens]] splitting
    * so BM25 and the text-stats operators agree on token identity.
    */
  def lowerTokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** BM25 top-k documents per query (Robertson–Spärck Jones idf in the
    * `ln(1 + (N - n + 0.5)/(n + 0.5))` form — always positive).
    *
    * `queries` is a small in-memory set (query_id, text); its vocabulary
    * is broadcast twice: once to prune the corpus term-frequency rows,
    * once as the per-query term list for scoring. Output:
    * (query_id, rank, doc_id, score) with score rounded to `roundTo`
    * decimals so cross-engine float comparison is exact; rank ties break
    * by doc id.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], k: Int, k1: Double = 1.2,
      b: Double = 0.75, roundTo: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val qTerms = queries
      .flatMap { case (qid, text) =>
        text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => (qid, t))
      }
      .toDF("query_id", "tok")
    val vocab = qTerms.select("tok").distinct()

    // (doc, tok, tf, len) for query-vocabulary tokens only
    val toks = docs.select(col(idCol).as("doc_id"),
        lowerTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("len"),
        explode(col("toks")).as("tok"))
    val tf = toks.join(broadcast(vocab), Seq("tok"))
      .groupBy("doc_id", "len", "tok")
      .agg(count(lit(1)).cast("double").as("tf"))

    // corpus scalars: N and average doc length (over ALL docs)
    val stats = docs.select(size(lowerTokens(col(textCol))).as("len"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("len")).as("avg_len"))

    // per-term document frequency within the pruned set
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("nt"))

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

  /** Word n-grams of each document's token array as space-joined strings
    * (documents shorter than n contribute none).
    */
  def ngrams(text: Column, n: Int): Column = {
    val toks = lowerTokens(text)
    // guard: sequence(1, x) DESCENDS for x < 1, it is not empty.
    // concat_ws over element_at is O(n) per window; a slice-per-window
    // formulation allocates an array per window (O(len·n) garbage) and
    // dominated the gate's profile.
    when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** 64-bit hash of each token window, WITHOUT materializing the n-gram
    * string: multi-arg xxhash64 folds the n tokens directly, so the
    * counting pass allocates no per-window strings and shuffles 8-byte
    * keys. (xxhash64 chains per argument, so ("ab") and ("a","b") hash
    * differently — window identity is the token tuple, matching the
    * space-joined string 1:1 up to 64-bit collisions.)
    */
  private def ngramHashes(toks: Column, n: Int): Column =
    when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => xxhash64((0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<bigint>"))

  /** Top-k corpus n-grams by document-independent occurrence count,
    * keeping only n-grams with at least `minCount` occurrences. Ties
    * break lexicographically. Output: (ngram, cnt).
    *
    * Two phases, neither of which ever shuffles an n-gram string for a
    * non-finalist window:
    *  1. COUNT on the 64-bit window hash (map-side partial agg on long
    *    keys; the post-cutoff (hash, cnt) summary is persisted
    *    spill-safely — 16 bytes per surviving n-gram). The k-th highest
    *    count becomes the finalist threshold; every hash at or above it
    *    is a finalist (boundary ties inflate the candidate set, never
    *    truncate it).
    *  2. RESOLVE strings for finalists only: re-scan builds the display
    *    string just for windows whose hash is in the (tiny, broadcast)
    *    finalist set, dedups map-side, and joins counts back.
    *
    * Exactness caveat (documented trade): distinct n-grams colliding at
    * 64 bits would merge counts — probability ~(distinct windows)²/2⁶⁴,
    * negligible below ~2³⁰ distinct n-grams.
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int,
      minCount: Long = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = lowerTokens(col(textCol))

    val counts = docs.select(explode(ngramHashes(toks, n)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val topCnts = counts.orderBy(col("cnt").desc).limit(k)
        .select("cnt").collect().map(_.getLong(0))
      if (topCnts.isEmpty) return Seq.empty[(String, Long)].toDF("ngram", "cnt")
      // with fewer than k survivors everything above the cutoff is final
      val cStar = if (topCnts.length < k) minCount else topCnts.min
      val cands = counts.where(col("cnt") >= cStar)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val candHashes = cands.map(_._1)

      // resolve pass: hash first, concat only on a finalist hit (CaseWhen
      // evaluates the string branch lazily)
      val hit = (i: Column) =>
        xxhash64((0 until n).map(j => element_at(toks, i + j)): _*)
      val matches = when(size(toks) >= n,
        filter(
          transform(sequence(lit(1), size(toks) - (n - 1)), i =>
            when(hit(i).isin(candHashes: _*),
              struct(hit(i).as("h"),
                concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)
                  .as("ngram")))),
          x => x.isNotNull))
      val resolved = docs.select(explode(matches).as("m"))
        .select(col("m.h").as("h"), col("m.ngram").as("ngram"))
        .distinct()
      val candDf = cands.toSeq.toDF("h", "cnt")
      resolved.join(broadcast(candDf), Seq("h"))
        .select(col("ngram"), col("cnt"))
        .orderBy(col("cnt").desc, col("ngram").asc)
        .limit(k)
    } finally counts.unpersist(false)
  }
}
