package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-8 data-pipeline additions: radius search, cluster-balanced
  * sampling, the quality-rule filter, SQ8 quantization, and the
  * deterministic shard shuffle.
  */
class DataOpsSpec extends SparkSpec {

  import spark.implicits._

  // --- rangeSearch ---------------------------------------------------------

  test("rangeSearch matches the brute-force cosine filter") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 3)
    val got = Similarity.rangeSearch(emb, "vec_id", "embedding", queries, 0.3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val want = emb.select(col("vec_id").as("query_id"), col("embedding").as("q"))
      .where(col("query_id") < 3)
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c")))
      .where(col("neighbor_id") =!= col("query_id"))
      .where(Similarity.cosineHof(col("q"), col("c")) >= 0.3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  // --- clusterBalance ------------------------------------------------------

  test("clusterBalance assigns to the nearest centroid and caps per cluster") {
    // two well-separated crafted centroids; vectors near each
    val dim = 4
    val c0 = Array.fill(dim)(0.0)
    val c1 = Array.fill(dim)(10.0)
    val rows = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i, Array.tabulate(dim)(d => base + (i % 3) * 0.1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val kept = Similarity.clusterBalance(df, "vec_id", "embedding",
      Array(c0, c1), cap = 3)
    val byCell = kept.as[(Long, Int)].collect().groupBy(_._2)
    assert(byCell.keySet == Set(0, 1))
    // cap respected, smallest ids kept
    assert(byCell(0).map(_._1).sorted.toSeq == Seq(0L, 2L, 4L))
    assert(byCell(1).map(_._1).sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("labelConstrainedTopK respects the label predicate both ways") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 3)
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    val neg = Similarity.labelConstrainedTopK(emb, "vec_id", "embedding",
        "label", queries, k = 5, excludeSameLabel = true)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(neg.nonEmpty)
    neg.foreach { case (q, n) =>
      assert(labels(n) != labels(q), s"negative $n shares label with query $q")
    }
    val pos = Similarity.labelConstrainedTopK(emb, "vec_id", "embedding",
        "label", queries, k = 5, excludeSameLabel = false)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    pos.foreach { case (q, n) =>
      assert(labels(n) == labels(q), s"positive $n differs in label from $q")
      assert(n != q, "self must be excluded")
    }
    // the hardest negative is at least as similar as the 5th unconstrained
    // neighbor is NOT guaranteed — but the negative set must be exactly the
    // top of the label-filtered similarity order; cross-check one query
    val q0 = queries.orderBy("vec_id").select("vec_id").as[Long].head()
    val brute = emb.where(col("vec_id") =!= q0)
      .crossJoin(broadcast(queries.where(col("vec_id") === q0)
        .select(col("embedding").as("q_vec"), col("label").as("q_label"))))
      .where(col("label") =!= col("q_label"))
      .select(col("vec_id"),
        Similarity.cosineHof(col("q_vec"), col("embedding")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .select("vec_id").as[Long].take(5).toSeq
    assert(neg.filter(_._1 == q0).map(_._2).toSeq == brute)
  }

  // --- qualityRules --------------------------------------------------------

  test("qualityRules flags each rule independently") {
    // 30 distinct 6-char words + 7 stopwords: 37 words, mean length ≈ 5.2,
    // TTR = 1, max frequency 1/37 — passes every rule
    val good = (0 until 30).map(i => f"word$i%02d").mkString(" ") +
      " the a of and to in is"
    val docs = Seq(
      (1L, good), // passes everything
      (2L, "short text only here"), // fails r_nwords (<30 words)
      (3L, ("spark " * 40).trim), // fails r_ttr + r_maxfreq (one token repeated)
      (4L, (("internationalization " * 3) + ("the a of and to in is " * 5)).trim)
    ).toDF("doc_id", "text")
    val flags = Curation.qualityRules(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("r_nwords", "r_wordlen", "r_stop", "r_ttr", "r_maxfreq", "keep")
      .as[(Int, Int, Int, Int, Int, Int)].collect()

    assert(flags(0) == ((1, 1, 1, 1, 1, 1)), s"good doc: ${flags(0)}")
    assert(flags(1)._1 == 0, "doc 2 fails word count")
    assert(flags(1)._6 == 0)
    assert(flags(2)._4 == 0, "doc 3 fails type-token ratio")
    assert(flags(2)._5 == 0, "doc 3 fails max token frequency")
    // doc 4: 38 words, mean length fine? 'internationalization' ×3 (20
    // chars) + 35 short stopwords — mean < 4 → r_wordlen fails
    assert(flags(3)._2 == 0, s"doc 4 fails mean word length: ${flags(3)}")
  }

  test("qualityRules agrees with a DataFrame recomputation on real docs") {
    val docs = Tables.documents(spark, sfDir)
    val got = Curation.qualityRules(docs, "doc_id", "text")
    // recompute n_words / n_types / stopword count with spark built-ins
    val toks = TextOps.tokens(col("text"))
    val want = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_words"),
      size(array_distinct(toks)).cast("long").as("n_types"),
      size(filter(toks, t => t.isInCollection(Curation.StopwordsEn.toSeq)))
        .cast("long").as("n_stop"))
    val joined = got.join(want, "doc_id")
      .where(
        (col("r_nwords") === 1) =!= (col("n_words") >= 30) ||
        (col("r_stop") === 1) =!= (col("n_stop") >= 2) ||
        (col("r_ttr") === 1) =!= (col("n_types") * 2 >= col("n_words")))
    assert(joined.count() == 0)
    assert(got.where(col("keep") === 1).count() > 0)
  }

  // --- SQ8 -----------------------------------------------------------------

  test("Sq bounds reconstruct within half a quantization step") {
    val emb = Tables.embeddings(spark, sfDir)
    val bounds = Sq.train(emb, "embedding")
    assert(bounds.mins.length == 64)
    // reconstruction error per dim ≤ scale/2 + eps for in-range values
    val codes = Sq.encode(emb, "vec_id", "embedding", bounds)
    val joined = codes.join(emb, "vec_id")
      .select(col("codes"), col("embedding")).as[(Seq[Int], Seq[Float])]
      .collect()
    joined.foreach { case (cs, vs) =>
      cs.indices.foreach { i =>
        val recon = bounds.mins(i) + cs(i) * bounds.scales(i)
        assert(math.abs(recon - vs(i)) <= bounds.scales(i) / 2 + 1e-9,
          s"dim $i: recon $recon vs ${vs(i)} scale ${bounds.scales(i)}")
      }
    }
  }

  test("Sq handles constant dimensions (zero scale)") {
    val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val bounds = Sq.train(df, "embedding")
    assert(bounds.scales(0) == 0.0)
    val codes = Sq.encode(df, "vec_id", "embedding", bounds)
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(codes(0)._2(0) == 0 && codes(1)._2(0) == 0)
    assert(codes(0)._2(1) == 0 && codes(1)._2(1) == 255)
  }

  test("Sq ADC puts a planted exact copy at rank 1") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 10)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(queries.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding")))
    val bounds = Sq.train(emb, "embedding")
    val codes = Sq.encode(corpus, "vec_id", "embedding", bounds)
    val top1 = Sq.adcTopK(codes, "vec_id", queries, "vec_id", "embedding",
        bounds, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length == 10)
    top1.foreach { case (q, n) => assert(n == q + 100000, s"query $q -> $n") }
  }

  // --- hybrid retrieval ------------------------------------------------------

  test("hybridTopK reranks exactly the BM25 candidate set by cosine") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val qv = emb.where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val queries = Seq((0L, "hash join batch", qv))
    val got = TextRank.hybridTopK(docs, "doc_id", "text",
        emb, "vec_id", "embedding", queries, kCandidates = 10, k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    // recompute: BM25 candidates then cosine-sort driver-side
    val cands = TextRank.bm25TopK(docs, "doc_id", "text",
        Seq((0L, "hash join batch")), k = 10)
      .select("doc_id").as[Long].collect().toSet
    val byCos = emb.where(col("vec_id").isInCollection(cands))
      .select(col("vec_id"),
        Similarity.cosineHof(
          lit(qv).cast("array<float>"), col("embedding")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .select("vec_id").as[Long].take(3).toSeq
    assert(got == byCos)
  }

  // --- qualityPack composition ---------------------------------------------

  test("qualityPack packs exactly the quality-kept docs, bins within budget") {
    val docs = Tables.documents(spark, sfDir)
    val packed = Pipeline.qualityPack(docs, "doc_id", "text",
      packBudget = 128, nShards = 8)
    val keptIds = Curation.qualityRules(docs, "doc_id", "text")
      .where(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    val rows = packed.select("doc_id", "shard", "bin", "n_tokens")
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.map(_._1).toSet == keptIds)
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, bin) =>
      assert(bin.map(_._4).sum <= 128 || bin.length == 1)
    }
  }

  // --- shardShuffle --------------------------------------------------------

  test("shardShuffle is deterministic, bounded, and position-contiguous") {
    val docs = Tables.documents(spark, sfDir)
    val a = Sampling.shardShuffle(docs, "doc_id", "text", 16)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    // stable under a different partitioning of the same data
    val b = Sampling.shardShuffle(docs.repartition(13), "doc_id", "text", 16)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.length == docs.count())
    assert(a.forall { case (_, s, _) => s >= 0 && s < 16 })
    // positions within each shard are 1..n with no gaps
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("groupCentroids averages per dimension; cosineDouble scores exactly") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1f, 0f, 0f)), (0, Seq(3f, 0f, 0f)),   // centroid (2, 0, 0)
      (1, Seq(0f, 4f, 0f)),                          // centroid (0, 4, 0)
      (2, Seq(2f, 2f, 0f))).toDF("label", "vec")     // centroid (2, 2, 0)
    val cen = Similarity.groupCentroids(df, "label", "vec")
      .orderBy("group")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    assert(cen(0) == ((0, 2L, Seq(2.0, 0.0, 0.0))))
    assert(cen(1) == ((1, 1L, Seq(0.0, 4.0, 0.0))))
    assert(cen(2) == ((2, 1L, Seq(2.0, 2.0, 0.0))))
    // orthogonal centroids -> 0; 45-degree -> 1/sqrt(2)
    val cens = Similarity.groupCentroids(df, "label", "vec")
    val a = cens.select(col("group").as("ga"), col("centroid").as("ca"))
    val b = cens.select(col("group").as("gb"), col("centroid").as("cb"))
    val cos = a.join(b, col("ga") < col("gb"))
      .select(col("ga"), col("gb"),
        graft.functions.VectorOps.cosineDouble(col("ca"), col("cb")).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cos((0, 1)) == 0.0)
    assert(math.abs(cos((0, 2)) - 1.0 / math.sqrt(2)) < 1e-15)
    assert(math.abs(cos((1, 2)) - 1.0 / math.sqrt(2)) < 1e-15)
  }

  test("embeddingOutliers surfaces the planted far-from-centroid vector first") {
    // label 0: three near-identical vectors along e1 plus one along e2 —
    // the e2 vector is rank 1 (least similar to the group mean)
    val df = Seq(
      (1L, 0, Array(1.0, 0.01)), (2L, 0, Array(1.0, 0.02)),
      (3L, 0, Array(1.0, 0.0)), (4L, 0, Array(0.0, 1.0)),
      (5L, 1, Array(0.5, 0.5)), (6L, 1, Array(0.5, 0.5))
    ).toDF("id", "label", "vec")
    val got = Similarity.embeddingOutliers(df, "id", "label", "vec", k = 2)
      .orderBy("group", "rank")
      .select("group", "rank", "id")
      .as[(Int, Int, Long)].collect().toSeq
    assert(got.take(2).map(_._3) == Seq(4L, 3L), got.toString)
    assert(got.drop(2).map(_._3) == Seq(5L, 6L), got.toString) // tie → id order
  }

  test("embeddingOutliers trims map-side: WindowGroupLimit below the exchange") {
    val plan = Similarity.embeddingOutliers(Tables.embeddings(spark, sfDir),
      "vec_id", "label", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected partial window group limit:\n${plan.take(3000)}")
  }

  // --- mmrRerank / mmrSelect ----------------------------------------------

  test("mmrRerank diversifies: the planted duplicate loses to the orthogonal pick") {
    // corpus: 1=(1,0), 2=(1,0) exact duplicate, 3=(0,1); query (2,1).
    // rel(1)=rel(2)=2/√5, rel(3)=1/√5. Pure top-2 would take the
    // duplicate pair {1,2}; at λ=.5 the duplicate's margin
    // .5·rel − .5·cos(2,1)= −0.0528 falls below the orthogonal 0.2236.
    val cands = Seq(
      (0L, 1L, 2.0 / math.sqrt(5), Seq(1f, 0f)),
      (0L, 2L, 2.0 / math.sqrt(5), Seq(1f, 0f)),
      (0L, 3L, 1.0 / math.sqrt(5), Seq(0f, 1f)))
      .toDF("query_id", "neighbor_id", "cos", "c_vec")
    val got = Similarity.mmrRerank(cands, k = 3, lambda = 0.5)
      .orderBy("sel_rank")
      .select("sel_rank", "neighbor_id", "score")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L),
      s"expected relevance pick, then diversity, then the duplicate: $got")
    // rank 1 breaks the exact relevance tie toward the smaller id
    assert(got.head._1 == 1 && got.head._2 == 1L)
    assert(math.abs(got(1)._3 - 0.223607) < 1e-9, s"$got")
    assert(got(2)._3 < 0, s"redundant pick carries a negative margin: $got")
  }

  test("mmrSelect rank-1 equals brute-force top-1; picks are distinct and capped") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 3)
    val got = Similarity.mmrSelect(emb, "vec_id", "embedding", queries,
        n = 10, k = 4, lambda = 0.7)
      .select("query_id", "sel_rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    val top1 = Similarity.topKCosine(emb, "vec_id", "embedding", queries, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (q, sel) =>
      assert(sel.map(_._2).sorted == (1 to 4), s"ranks 1..4 per query: $sel")
      assert(sel.map(_._3).distinct.size == 4, s"picks must be distinct: $sel")
      assert(sel.find(_._2 == 1).get._3 == top1(q),
        s"first MMR pick is the pure-relevance top-1: $sel")
    }
    assert(got.map(_._1).distinct.size == 3)
  }
}
