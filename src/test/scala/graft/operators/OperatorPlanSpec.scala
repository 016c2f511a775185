package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions for the pipeline operators: the scale story
  * depends on joins broadcasting (not sort-merging) and top-k executing as
  * per-partition heaps — assert the plans, not just the results.
  */
class OperatorPlanSpec extends SparkSpec {

  /** The r14 TPC-H shape audits run at sf0.01: several of their filters
    * (two-nation pair, one nation's suppliers, majority-supplier parts)
    * are legitimately EMPTY at sf0.001, and AQE's empty-relation
    * propagation would erase the very joins under audit.
    */
  private val tpchDir = "/root/testdata/sf0.01"

  private def planString(df: DataFrame): String = {
    // materialize so AQE finalizes its join strategy choices
    df.collect()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val root = finalPlan(df.queryExecution.executedPlan)
    (root +: root.collect { case a: AdaptiveSparkPlanExec => a.executedPlan })
      .map(_.treeString).mkString("\n")
  }

  test("bm25 joins all broadcast — no sort-merge join at any scale of the doc side") {
    val plan = planString(TextRank.bm25TopK(Tables.documents(spark, sfDir),
      "doc_id", "text", Seq((0L, "hash join"), (1L, "vector scan")), k = 5))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"doc-side shuffle join crept into bm25:\n${plan.take(2000)}")
  }

  test("topNgrams executes the global top-k as TakeOrderedAndProject") {
    val plan = planString(
      TextRank.topNgrams(Tables.documents(spark, sfDir), "text", 2, 20, 20))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("bloomDedupAgainst never shuffle-joins the corpus") {
    import spark.implicits._
    val corpus = (0 until 200).map(i => (i.toLong, s"corpus doc $i body"))
      .toDF("doc_id", "text")
    val batch = (0 until 50).map(i => (i + 1000L,
      if (i % 3 == 0) s"corpus doc $i body" else s"fresh doc $i"))
      .toDF("doc_id", "text")
    val plan = planString(Dedup.bloomDedupAgainst(batch, corpus, Seq("text"),
      mBits = 4096, seeds = 3))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join crept into bloomDedupAgainst:\n${plan.take(2000)}")
  }

  test("corpusReport reads the corpus once (expand rewrite, single scan)") {
    val plan = planString(Pipeline.corpusReport(
      Tables.documents(spark, sfDir), "text", "source", "lang"))
    // the two exact count-distincts must fold into ONE aggregation via
    // Expand, not re-scan the table per distinct
    assert(plan.contains("Expand"), s"expected Expand rewrite:\n${plan.take(2000)}")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"corpus scanned $scans times:\n${plan.take(2000)}")
  }

  test("brute-force ANN broadcasts the query set") {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = planString(Similarity.topKCosine(emb, "vec_id", "embedding",
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 3), 2))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("rangeSearch broadcasts queries and stays shuffle-free") {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = planString(Similarity.rangeSearch(emb, "vec_id", "embedding",
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 3), 0.3))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("SortMergeJoin"),
      s"rangeSearch must not shuffle the corpus:\n${plan.take(2000)}")
  }

  test("qualityRules is a pure map-side pass — no exchange at all") {
    val plan = planString(
      Curation.qualityRules(Tables.documents(spark, sfDir), "doc_id", "text"))
    assert(!plan.contains("Exchange"),
      s"qualityRules must not shuffle:\n${plan.take(2000)}")
  }

  test("clusterBalance caps hot cells below the exchange (WindowGroupLimit)") {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Array.tabulate(4)(j => Array.tabulate(64)(i =>
      if (i == j) 1.0 else 0.0))
    val plan = planString(
      Similarity.clusterBalance(emb, "vec_id", "embedding", centroids, cap = 10))
    assert(plan.contains("WindowGroupLimit"),
      s"per-cell cap must push a partial group limit below the shuffle:\n${plan.take(2000)}")
  }

  test("qualityPack composition is exactly one shuffle (filter rides the scan)") {
    // the pack returns an RDD-backed frame, so the exchange lives in the
    // RDD lineage, not the frame's plan — count ShuffleDependency edges
    val df = Pipeline.qualityPack(Tables.documents(spark, sfDir),
      "doc_id", "text", packBudget = 128, nShards = 8)
    val rdd = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.get
    val seen = scala.collection.mutable.Set[Int]()
    def shuffles(r: org.apache.spark.rdd.RDD[_]): Int =
      if (!seen.add(r.id)) 0
      else r.dependencies.map {
        case s: org.apache.spark.ShuffleDependency[_, _, _] => 1 + shuffles(s.rdd)
        case d => shuffles(d.rdd)
      }.sum
    val n = shuffles(rdd)
    assert(n == 1, s"expected exactly the pack's shard shuffle, got $n")
  }

  test("groupSplit is a pure map-side pass — no exchange at all") {
    val plan = planString(Sampling.groupSplit(Tables.documents(spark, sfDir),
      org.apache.spark.sql.functions.col("source"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    assert(!plan.contains("Exchange"),
      s"groupSplit must not shuffle:\n${plan.take(2000)}")
  }

  test("curriculumBins has no window and no global sort — boundaries broadcast") {
    val plan = planString(Sampling.curriculumBins(
      Tables.documents(spark, sfDir),
      org.apache.spark.sql.functions.col("n_chars"), 4))
    assert(!plan.contains("Window"),
      s"curriculum tiers must not use ntile:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"quantile boundaries must broadcast:\n${plan.take(2000)}")
  }

  test("removeBoilerplate joins the boilerplate set by broadcast — corpus never shuffles") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // plant a universal header so the boilerplate set is non-empty —
    // on a boilerplate-free corpus AQE's empty-relation propagation
    // correctly erases the join altogether (covered by the gate corpus)
    val injected = Tables.documents(spark, sfDir).withColumn("text",
      concat(lit("NAV "), col("source"), lit("\n"), col("text")))
    val plan = planString(Curation.removeBoilerplate(
      injected, "doc_id", "text", "source", 0.5))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"boilerplate-set join must broadcast, not sort-merge:\n${plan.take(2000)}")
  }

  test("bigramScore probes the LM by broadcast — the gram stream never sort-merges") {
    val plan = planString(Lm.bigramScore(
      Tables.documents(spark, sfDir).where(
        org.apache.spark.sql.functions.col("doc_id") < 100), "doc_id", "text"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"LM probe must broadcast, not sort-merge:\n${plan.take(2000)}")
  }

  test("mixtureSample joins the per-source rates by broadcast — corpus never shuffles") {
    val plan = planString(Sampling.mixtureSample(Tables.documents(spark, sfDir),
      "lang", org.apache.spark.sql.functions.col("doc_id"), budgetRows = 200))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"rate join must broadcast, not sort-merge:\n${plan.take(2000)}")
  }

  test("tfidfTopK pushes a partial group limit below the per-doc window") {
    val plan = planString(TextRank.tfidfTopK(
      Tables.documents(spark, sfDir), "doc_id", "text", k = 3))
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-k must cap candidates below the exchange:\n${plan.take(2000)}")
  }

  test("contaminationScore broadcasts the benchmark gram set") {
    val docs = Tables.documents(spark, sfDir)
    val plan = planString(Curation.contaminationScore(docs,
      docs.where(org.apache.spark.sql.functions.col("doc_id") < 10),
      "doc_id", "text", n = 3))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"benchmark grams must broadcast:\n${plan.take(2000)}")
  }

  test("dedupAgainst probes the corpus with broadcasts only — corpus never shuffles") {
    val docs = Tables.documents(spark, sfDir)
    // batch re-uses corpus texts so the staged hit set is NON-empty — an
    // empty hit frame elides the anti-join and the assertion sees no join
    val corpus = docs
    val batch = docs.where(org.apache.spark.sql.functions.col("doc_id") < 100)
      .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id") + 500000)
    val plan = planString(Dedup.dedupAgainst(batch, corpus, Seq("text")))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shuffle join crept into dedupAgainst:\n${plan.take(2000)}")
  }

  test("mixtureEpochs fans out map-side off a broadcast rate table") {
    val plan = planString(Sampling.mixtureEpochs(Tables.documents(spark, sfDir),
      "lang", org.apache.spark.sql.functions.col("doc_id"), budgetRows = 1000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"rate join must broadcast:\n${plan.take(2000)}")
    assert(plan.contains("Generate"), "the epoch fan-out must be an explode")
  }

  test("exactSample executes as TakeOrderedAndProject — no global sort") {
    val plan = planString(Sampling.exactSample(Tables.documents(spark, sfDir),
      org.apache.spark.sql.functions.col("doc_id"), 100))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("trimContaminated broadcasts the benchmark gram set") {
    val docs = Tables.documents(spark, sfDir)
    val plan = planString(Curation.trimContaminated(docs,
      docs.where(org.apache.spark.sql.functions.col("doc_id") < 10),
      "doc_id", "text", n = 3))
    // scope the assertion to the GRAM probe (the semi-join against the
    // broadcast benchmark set) — the outer corpus⟕hits join's build side
    // is bounded by contamination volume, not benchmark size, and may
    // legitimately stop broadcasting at scale
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"benchmark gram probe must be a broadcast semi-join:\n${plan.take(2000)}")
  }

  test("shardShuffle is exactly one hash exchange") {
    val plan = planString(Sampling.shardShuffle(
      Tables.documents(spark, sfDir), "doc_id", "text", 16))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n${plan.take(2000)}")
  }

  test("IVF-PQ search side joins the probed cells by broadcast") {
    // ivfpqTopK materializes its result internally (staged write + cache
    // release), so the plan to audit is the staged write's — captured via
    // a QueryExecutionListener, not the returned staging scan
    val captured = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.execution.QueryExecution]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        captured.synchronized { captured += qe }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val emb = Tables.embeddings(spark, sfDir)
      val queries = emb.where(org.apache.spark.sql.functions.col("vec_id") < 5)
      Pq.ivfpqTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, nlist = 8, nProbe = 2)
      val deadline = System.currentTimeMillis() + 30000
      def hasBroadcast = captured.synchronized {
        captured.exists { qe =>
          def planOf(p: SparkPlan): SparkPlan = p match {
            case a: AdaptiveSparkPlanExec => a.executedPlan
            case other => other
          }
          planOf(qe.executedPlan).treeString.contains("BroadcastHashJoin")
        }
      }
      while (!hasBroadcast && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(hasBroadcast, "no captured execution broadcast the probed cells")
    } finally spark.listenerManager.unregister(listener)
  }

  test("collocations joins the staged count tables — no cartesian, no third corpus scan") {
    val plan = planString(TextRank.collocations(
      Tables.documents(spark, sfDir), "text", minCount = 2))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the U/B scalars aggregate off the STAGED count tables: the final
    // plan must not re-tokenize the corpus (no Generate over a split)
    assert(!plan.contains("Generate explode"),
      s"totals re-scanned the corpus:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("containmentPairs never builds an all-pairs space") {
    val docs = Tables.documents(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("doc_id") < 150)
      .select("doc_id", "text")
    val plan = planString(Dedup.containmentPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.8))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join crept into containment:\n${plan.take(2000)}")
  }

  test("intervalOverlapJoin plans an equi-join, never BroadcastNestedLoop") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = (0L until 500L).map(x => (x, x * 3, x * 3 + 10)).toDF("lid", "ls", "le")
    val r = (0L until 500L).map(x => (x, x * 5, x * 5 + 7)).toDF("rid", "rs", "re")
    val plan = planString(
      TemporalJoin.intervalOverlapJoin(l, "ls", "le", r, "rs", "re", 16L)
        .groupBy().agg(count(lit(1))))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"theta join crept into the interval join:\n${plan.take(2000)}")
    assert(plan.contains("Join"), plan.take(2000))
  }

  test("decayedCount is a plain partial/final aggregate — one exchange") {
    val plan = planString(Sessions.decayedCount(
      Tables.events(spark, sfDir), "ts", Seq("event_type"),
      1706745600L, 604800.0))
    assert(plan.split("\n").count(_.contains("Exchange")) <= 1,
      s"decay agg must shuffle once:\n${plan.take(2000)}")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      plan.take(2000))
  }

  test("anchorStats shuffles only the (domain, anchor) partial counts") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select(
      concat(lit("https://s"), (col("doc_id") % 5).cast("string"),
        lit(".com/p")).as("url"),
      concat(lit("<a href=\"https://t"), (col("doc_id") % 3).cast("string"),
        lit(".org/x\">read this</a>")).as("html"))
    val plan = planString(Curation.anchorStats(docs, "url", "html"))
    assert(plan.split("\n").count(_.contains("Exchange")) <= 1,
      s"anchor aggregation must shuffle once:\n${plan.take(2000)}")
  }

  test("tpch q5 shape: every dim broadcasts, only the fact pair shuffle-joins") {
    val plan = planString(graft.SparkEntry.queries("q_tpch_q5")(spark, sfDir))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 4, s"expected >=4 broadcast dim joins, got $bhj:\n${plan.take(3000)}")
    val shuffleJoins = "SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length
    assert(shuffleJoins <= 1,
      s"only orders⋈lineitem may shuffle, got $shuffleJoins:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("tpch q1 shape: eight measures fold into ONE scan + one partial/final agg") {
    val plan = planString(graft.SparkEntry.queries("q_tpch_q1")(spark, sfDir))
    val scans = plan.split("\n").count(l =>
      l.contains("FileScan") || l.contains("BatchScan"))
    assert(scans == 1, s"a multi-measure aggregate must read lineitem once, " +
      s"got $scans scans:\n${plan.take(3000)}")
    val aggExchanges = plan.split("\n").count(_.contains("Exchange"))
    assert(aggExchanges <= 2, // partial->final hash + the final sort
      s"expected one agg shuffle (+ordering), got $aggExchanges:\n${plan.take(3000)}")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"the ship-date filter must reach the parquet scan:\n${plan.take(3000)}")
  }

  test("tpch q18 shape: having-semi prunes, customer broadcasts, no BNLJ") {
    val plan = planString(graft.SparkEntry.queries("q_tpch_q18")(spark, sfDir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"),
      s"customer must join as a broadcast dim:\n${plan.take(3000)}")
    // the fact side: the HAVING aggregation + the semi/final joins ride
    // l_orderkey/o_orderkey hash partitioning — bounded shuffle count,
    // no join may degrade to a nested loop
    val shuffleJoins = "SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length
    assert(shuffleJoins <= 2,
      s"semi + final fact join at most, got $shuffleJoins:\n${plan.take(3000)}")
  }

  test("tpch q4/q13/q16 shapes: semi/outer/anti joins, no BNLJ anywhere") {
    val q4 = planString(graft.SparkEntry.queries("q_tpch_q4")(spark, sfDir))
    assert(q4.contains("LeftSemi"),
      s"EXISTS must compile to a semi join:\n${q4.take(2000)}")
    val q13 = planString(graft.SparkEntry.queries("q_tpch_q13")(spark, sfDir))
    assert(q13.contains("LeftOuter"),
      s"zero-order customers must survive the outer join:\n${q13.take(2000)}")
    val q16 = planString(graft.SparkEntry.queries("q_tpch_q16")(spark, sfDir))
    assert(q16.contains("LeftAnti"),
      s"the NOT-IN exclusion must be an anti join:\n${q16.take(2000)}")
    Seq("q4" -> q4, "q13" -> q13, "q16" -> q16).foreach { case (n, p) =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$n degraded:\n${p.take(2000)}")
    }
  }

  test("tpch q10/q14/q19 shapes: broadcast dims, disjunctive residual, no BNLJ") {
    val q10 = planString(graft.SparkEntry.queries("q_tpch_q10")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(q10).length >= 2,
      s"customer and nation must broadcast:\n${q10.take(2500)}")
    val q14 = planString(graft.SparkEntry.queries("q_tpch_q14")(spark, sfDir))
    assert(q14.contains("BroadcastHashJoin") && q14.contains("PushedFilters") &&
      q14.contains("l_shipdate"),
      s"part broadcasts, ship-date filter reaches the scan:\n${q14.take(2500)}")
    // Q19's OR-of-ANDs must ride as a residual on the hash join, never
    // degrade the equi-join to a nested loop
    val q19 = planString(graft.SparkEntry.queries("q_tpch_q19")(spark, sfDir))
    assert(q19.contains("BroadcastHashJoin"), q19.take(2500))
    Seq("q10" -> q10, "q14" -> q14, "q19" -> q19).foreach { case (n, p) =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$n degraded:\n${p.take(2500)}")
    }
  }

  test("tpch q2/q17 shapes: correlated scalar as aggregate-rejoin, no BNLJ, one fact shuffle") {
    // the correlated-scalar family: per-group MIN/AVG compared back to
    // the row. The demanded shape — the aggregate's partial/final hash
    // exchange is the ONLY fact shuffle; the rejoin and every dim ride
    // broadcasts; nothing degrades to a nested loop.
    Seq("q_tpch_q2", "q_tpch_q17").foreach { name =>
      val plan = planString(graft.SparkEntry.queries(name)(spark, sfDir))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name degraded:\n${plan.take(2500)}")
      assert(plan.contains("HashAggregate"),
        s"$name must compute the correlated scalar as an aggregate:\n${plan.take(2500)}")
      assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
        s"$name: part prune + threshold rejoin must broadcast:\n${plan.take(2500)}")
      val shuffleJoins = "SortMergeJoin".r.findAllIn(plan).length +
        "ShuffledHashJoin".r.findAllIn(plan).length
      assert(shuffleJoins == 0,
        s"$name: the rejoin must broadcast, not shuffle, got $shuffleJoins:\n${plan.take(2500)}")
      // fact rows themselves never shuffle: the only hash exchanges are
      // the aggregate's partial->final pair (plus a final sort for q2)
      val hashExchanges = plan.split("\n")
        .count(l => l.contains("Exchange hashpartitioning"))
      assert(hashExchanges <= 1,
        s"$name: expected only the aggregate exchange, got $hashExchanges:\n${plan.take(2500)}")
    }
  }

  test("tpch q21/q22 shapes: single-pass EXISTS/NOT-EXISTS fold; global scalar + anti, no BNLJ") {
    // q21: the double-correlated self-join family folded into ONE
    // grouped pass — no semi/anti self-joins of the fact remain, so at
    // most the fact-pair shuffle join survives and lineitem scans once
    val q21 = planString(graft.SparkEntry.queries("q_tpch_q21")(spark, sfDir))
    assert(!q21.contains("CartesianProduct") &&
      !q21.contains("BroadcastNestedLoopJoin"), q21.take(2500))
    val q21LineitemScans = q21.split("\n")
      .count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(q21LineitemScans == 1,
      s"the EXISTS/NOT-EXISTS fold must scan lineitem ONCE, got $q21LineitemScans:\n${q21.take(2500)}")
    // q22: the global average is a broadcast 1-row scalar, never a
    // shuffle; the NOT EXISTS is a genuine anti join
    val q22 = planString(graft.SparkEntry.queries("q_tpch_q22")(spark, sfDir))
    assert(q22.contains("LeftAnti"),
      s"NOT EXISTS must compile to an anti join:\n${q22.take(2500)}")
    assert(!q22.contains("CartesianProduct"), q22.take(2500))
  }

  test("tpch q6 shape: one scan, pushed range filters, one aggregate exchange") {
    val plan = planString(graft.SparkEntry.queries("q_tpch_q6")(spark, tpchDir))
    val scans = plan.split("\n").count(l =>
      l.contains("FileScan") || l.contains("BatchScan"))
    assert(scans == 1, s"the predicate aggregate reads lineitem once, " +
      s"got $scans scans:\n${plan.take(3000)}")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"the ship-date range must reach the parquet scan:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), s"q6 has no join:\n${plan.take(3000)}")
    val exchanges = plan.split("\n").count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"global agg = one partial/final exchange, got $exchanges:\n${plan.take(3000)}")
  }

  test("tpch q7/q8/q9 shapes: dim chains broadcast, at most the fact-pair shuffle") {
    Seq("q_tpch_q7", "q_tpch_q8", "q_tpch_q9").foreach { name =>
      val plan = planString(graft.SparkEntry.queries(name)(spark, tpchDir))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name degraded:\n${plan.take(2500)}")
      assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
        s"$name: nation-filtered dim chains must broadcast:\n${plan.take(2500)}")
      val shuffleJoins = "SortMergeJoin".r.findAllIn(plan).length +
        "ShuffledHashJoin".r.findAllIn(plan).length
      assert(shuffleJoins <= 1,
        s"$name: only orders⋈lineitem may shuffle, got $shuffleJoins:\n${plan.take(2500)}")
    }
  }

  test("tpch q11/q15 shapes: global scalar broadcasts; fact shuffles only at the aggregate") {
    // the scalar-over-own-aggregate family: the 1-row global (total/max)
    // rides the documented broadcast nested-loop cross join — pin that
    // it is the ONLY nested-loop and that no join shuffles fact rows
    Seq("q_tpch_q11", "q_tpch_q15").foreach { name =>
      val plan = planString(graft.SparkEntry.queries(name)(spark, tpchDir))
      assert(!plan.contains("CartesianProduct"), s"$name:\n${plan.take(2500)}")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      assert(bnlj <= 1,
        s"$name: only the 1-row scalar may nested-loop, got $bnlj:\n${plan.take(2500)}")
      val shuffleJoins = "SortMergeJoin".r.findAllIn(plan).length +
        "ShuffledHashJoin".r.findAllIn(plan).length
      assert(shuffleJoins == 0,
        s"$name: rejoin must broadcast, got $shuffleJoins shuffle joins:\n${plan.take(2500)}")
      assert(plan.contains("HashAggregate"), plan.take(2500))
    }
  }

  test("tpch q18 over the co-bucketed fact pair: zero hash exchanges") {
    // the orderkey-bucketed layout must eliminate BOTH the HAVING
    // aggregate's exchange (groups on the bucket key) and the
    // orders⋈big join's exchanges (bucket-to-bucket co-location);
    // the only data movement left is the customer broadcast and the
    // TakeOrdered final
    val plan = planString(
      graft.SparkEntry.queries("q_tpch_q18_bucketed")(spark, tpchDir))
    val hashExchanges = plan.split("\n")
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 0,
      s"co-bucketed q18 must not shuffle, got $hashExchanges:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"customer still rides a broadcast:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("tpch q10 over the co-bucketed fact pair: fact rows never shuffle") {
    // q10 is the suite's confirmed shuffle-bound gate at sf10 — the
    // bucketed layout must co-locate the fact join, leaving at most the
    // customer-grain aggregate's exchange (which moves map-side partial
    // aggregates, not fact rows)
    val plan = planString(
      graft.SparkEntry.queries("q_tpch_q10_bucketed")(spark, tpchDir))
    val hashExchanges = plan.split("\n")
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 1,
      s"only the aggregate may exchange, got $hashExchanges:\n${plan.take(3000)}")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"customer and nation must broadcast:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("tpch q21 over the co-bucketed fact pair: only the supplier rollup exchanges") {
    // the single-pass fold groups on the bucket key, so the pair join AND
    // the correlation aggregate ride the bucketed scans; what's left is
    // the |suppliers|-sized s_name rollup
    val plan = planString(
      graft.SparkEntry.queries("q_tpch_q21_bucketed")(spark, tpchDir))
    val hashExchanges = plan.split("\n")
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 1,
      s"only the s_name rollup may exchange, got $hashExchanges:\n${plan.take(3000)}")
    val q21LineitemScans = plan.split("\n")
      .count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(q21LineitemScans == 1,
      s"the fold must still scan lineitem ONCE:\n${plan.take(3000)}")
  }

  test("tpch q12/q20 shapes: non-equi residual rides the join; semi-chain stays broadcast") {
    val q12 = planString(graft.SparkEntry.queries("q_tpch_q12")(spark, tpchDir))
    assert(!q12.contains("CartesianProduct") &&
      !q12.contains("BroadcastNestedLoopJoin"),
      s"the 60-day lateness residual must ride the equi join:\n${q12.take(2500)}")
    val q12ShuffleJoins = "SortMergeJoin".r.findAllIn(q12).length +
      "ShuffledHashJoin".r.findAllIn(q12).length
    assert(q12ShuffleJoins <= 1, s"one orderkey shuffle at most:\n${q12.take(2500)}")
    val q20 = planString(graft.SparkEntry.queries("q_tpch_q20")(spark, tpchDir))
    assert(q20.contains("LeftSemi"),
      s"the IN-subquery must compile to a semi join:\n${q20.take(2500)}")
    assert(!q20.contains("CartesianProduct") &&
      !q20.contains("BroadcastNestedLoopJoin"), q20.take(2500))
    val q20ShuffleJoins = "SortMergeJoin".r.findAllIn(q20).length +
      "ShuffledHashJoin".r.findAllIn(q20).length
    assert(q20ShuffleJoins == 0,
      s"threshold rejoin + semi chain must broadcast:\n${q20.take(2500)}")
  }

  test("rollingActiveUsers: no sliding countDistinct Expand; day grid broadcasts") {
    val plan = planString(Sessions.rollingActiveUsers(
      Tables.events(spark, sfDir), "user_id", "ts", Seq(1, 7, 28)))
    assert(!plan.contains("Expand"),
      s"conditional sums must replace countDistinct expansion:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the observed-day grid must broadcast:\n${plan.take(2000)}")
  }
}
