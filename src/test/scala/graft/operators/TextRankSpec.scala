package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {

  test("bm25 ranks a doc saturated with the query term first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark"),
      (2L, "spark query engine"),
      (3L, "duck pond water"),
      (4L, "engine room")).toDF("doc_id", "text")
    val out = TextRank.bm25TopK(docs, "doc_id", "text",
      Seq((0L, "spark")), k = 3).collect()
    // docs 3 and 4 contain no query term — never scored
    assert(out.map(_.getLong(2)).toSet == Set(1L, 2L))
    val top = out.find(_.getInt(1) == 1).get
    assert(top.getLong(2) == 1L)
    assert(out.forall(_.getDouble(3) > 0.0))
  }

  test("bm25 idf downweights terms present in every doc") {
    import spark.implicits._
    // "the" is in all docs, "rare" in one; the rare-term doc must beat a
    // doc matching only the ubiquitous term
    val docs = Seq(
      (1L, "the rare find"),
      (2L, "the the the"),
      (3L, "the common word"),
      (4L, "the other thing")).toDF("doc_id", "text")
    val out = TextRank.bm25TopK(docs, "doc_id", "text",
      Seq((0L, "the rare")), k = 4).collect()
    assert(out.find(_.getInt(1) == 1).get.getLong(2) == 1L)
  }

  test("bm25 scores queries independently") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val out = TextRank.bm25TopK(docs, "doc_id", "text",
      Seq((0L, "hash join"), (1L, "vector scan")), k = 5)
    val byQ = out.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byQ == Map(0L -> 5L, 1L -> 5L))
  }

  test("ngrams emits size-n windows and nothing for short docs") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x"), (3L, "")).toDF("id", "text")
      .select(col("id"), TextRank.ngrams(col("text"), 2).as("ng"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b", "b c", "c d"))
    assert(m(2L).isEmpty)
    assert(m(3L).isEmpty)
  }

  test("topNgrams orders by count then lexicographically with a min cutoff") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"), // "a b" ×3, "b a" ×2
      (2L, "c d"),         // "c d" ×1 — cut by minCount=2
      (3L, "b a")).toDF("doc_id", "text")
    val out = TextRank.topNgrams(docs, "text", n = 2, k = 10, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a b", 3L), ("b a", 3L)))
  }

  test("tfidf ranks a doc's distinctive term above corpus-wide terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common zebra"),
      (2L, "common word word"),
      (3L, "common other thing")).toDF("doc_id", "text")
    val out = TextRank.tfidfTopK(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    // "common" is in every doc → minimal idf; "zebra" is unique to doc 1
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.head._3 == "zebra", doc1.mkString(", "))
    // idf floor is +1, so even the ubiquitous term scores > 0
    assert(out.forall(_._4 > 0.0))
    // scores within a doc are non-increasing by rank
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("tfidf k caps per-doc output and tf scales the score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "y z")).toDF("doc_id", "text")
    val out = TextRank.tfidfTopK(docs, "doc_id", "text", k = 1).collect()
    assert(out.length == 2, "exactly one row per doc at k=1")
    // doc 1: x has tf=3 and df=1 → beats y (tf=1, df=2)
    assert(out.find(_.getLong(0) == 1L).get.getString(2) == "x")
  }

  test("tie-flood fallback (distributed resolve) matches the closure path") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val viaClosure = TextRank.topNgrams(docs, "text", n = 2, k = 20, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // maxFinalistSet = 1 forces every finalist set over the cap
    val viaJoin = TextRank.topNgrams(docs, "text", n = 2, k = 20, minCount = 2,
        maxFinalistSet = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaClosure == viaJoin, s"$viaClosure vs $viaJoin")
  }

  test("textrank: the co-occurrence hub outranks peripheral words") {
    import spark.implicits._
    // hub co-occurs with 6 distinct words; each leaf sees only hub (+ one
    // disconnected pair u-v). Degree centrality must surface hub first.
    val docs = Seq(
      "hub alpha", "hub beta", "hub gamma", "hub delta",
      "hub epsilon", "hub zeta", "u v")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextRank.textRankKeywords(docs, "text", iters = 3, k = 3).collect()
    assert(out.head.getString(0) == "hub", s"expected hub first: ${out.toSeq}")
    assert(out.head.getDouble(1) > out(1).getDouble(1),
      "hub must strictly outrank the runner-up")
  }

  test("textrank: repeated co-occurrence does not inflate the unweighted graph") {
    import spark.implicits._
    // (a,b) appears 50 times, (c,d) once: identical graphs after dedup →
    // identical ranks. (a b) and (b a) directions also collapse.
    val docs = (Seq.fill(25)("a b") ++ Seq.fill(25)("b a") ++ Seq("c d"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextRank.textRankKeywords(docs, "text", iters = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out("a") == out("c") && out("b") == out("d"),
      s"edge multiplicity leaked into the unweighted ranks: $out")
  }

  test("rrfTopK fuses lexical and dense ranks; single-ranker docs still surface") {
    import spark.implicits._
    // docs: 1 is the lexical hit ("fox fox fox"), 2 the dense hit (vector
    // aligned with the query), 3 matched by both weakly.
    val docs = Seq((1L, "fox fox fox"), (2L, "unrelated words here"),
      (3L, "fox lore")).toDF("doc_id", "text")
    val emb = Seq((1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val got = TextRank.rrfTopK(docs, "doc_id", "text", emb, "vec_id",
        "embedding", Seq((9L, "fox", Array(1.0f, 0.0f))), kEach = 2, k = 3)
      .orderBy("rank").select("rank", "doc_id", "rrf")
      .as[(Int, Long, Double)].collect().toSeq
    // lexical ranks: doc1=1, doc3=2 (only docs with 'fox'); dense ranks
    // (query vec e1, self-exclusion on id 9 is vacuous): doc2=1, doc3=2.
    // rrf: doc3 = 1/62+1/62 = .032258; doc1 = 1/61 = .016393; doc2 = 1/61.
    assert(got.map(_._2) == Seq(3L, 1L, 2L), got.toString)
    assert(got.head._3 == BigDecimal(2.0 / 62).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, got.toString)
    assert(got(1)._3 == got(2)._3) // tie between single-ranker docs → id order
  }

  test("retrievalMetrics: hits, recall, precision, MRR, and silent queries") {
    import spark.implicits._
    val ranking = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val truth = Seq((1L, 20L), (1L, 40L), (2L, 99L))
      .toDF("query_id", "doc_id")
    val got = TextRank.retrievalMetrics(ranking, truth, k = 3)
      .orderBy("query_id")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dg(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    val ndcg1 = r6(dg(2) / (dg(1) + dg(2))) // hit at rank 2; idcg over min(2,3)
    assert(got == Seq(
      (1L, 2L, 1L, 0.5, 0.333333, 0.5, ndcg1),
      (2L, 1L, 0L, 0.0, 0.0, 0.0, 0.0)), // truth-only query scores zeros
      got.toString)
  }

  test("collocations: PMI ranks the glued pair above a chance pair") {
    import spark.implicits._
    // "new york" always adjacent; "the cat"/"the dog" dilute "the".
    // U = 13 tokens (the empty doc tokenizes to one "" token), B = 9.
    val docs = Seq((1L, "new york the cat"), (2L, "new york the dog"),
      (3L, "cat the new york"), (4L, "")).toDF("id", "text")
    val got = TextRank.collocations(docs, "text", minCount = 2)
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    def pmi(cnt: Long, ca: Long, cb: Long) = BigDecimal(
      math.log(cnt.toDouble * 13 * 13 / (9.0 * ca * cb)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // c(new)=c(york)=3, c(the)=3; "new york" ×3, "the cat" only ×1 (<min)
    assert(got("new york") == ((3L, pmi(3, 3, 3))), got.toString)
    assert(!got.contains("the cat"), "minCount must prune the 1-count pair")
    // every surviving PMI is below the perfect-collocation bound
    assert(got.values.forall(_._2 <= pmi(3, 3, 3)), got.toString)
  }

  test("charEntropy: uniform chars 0, two-symbol alternation ln 2, empty null") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, ""), (4L, "abcd"))
      .toDF("doc_id", "text")
    val got = TextRank.charEntropy(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 4L, 0.0), (2L, 4L, r4(math.log(2))),
      (3L, 0L, null), (4L, 4L, r4(math.log(4)))), got.toString)
  }

  test("lexicalDiversity: types, tokens, and ttr per group") {
    import spark.implicits._
    val docs = Seq(("a", "x y x"), ("a", "y z"), ("b", "w w w w"))
      .toDF("src", "text")
    val got = TextRank.lexicalDiversity(docs, "src", "text")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == Set(("a", 3L, 5L, 0.6), ("b", 1L, 4L, 0.25)), got.toString)
  }

  test("novelty: first occurrence scores 1, an exact late copy scores 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // all 2 trigrams first here
      (2L, "alpha beta gamma delta"), // exact copy -> 0.0
      (3L, "alpha beta gamma wholly novel tail"), // 1 of 4 seen before
      (4L, "xy")) // < n tokens -> (0, null)
      .toDF("doc_id", "text")
    val got = TextRank.novelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0), (2L, 2L, 0.0), (3L, 4L, 0.75),
      (4L, 0L, null)), got.toString)
  }
}
