package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: stage-composition invariants and the
  * persist-boundary contract (signatures and the deduped corpus are
  * computed once and CACHED — the candidate join's executed plan must read
  * in-memory scans, never re-derive from parquet, or the dominant
  * signature-UDF cost multiplies by the number of consumers).
  */
class PipelineSpec extends SparkSpec {

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val nested: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    pf.lift(p).toSeq ++ (p.children ++ nested).flatMap(collectAll(_)(pf))
  }

  private def input: DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    docs
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 100000))
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", concat(col("text"), lit(" zz yy xx"))))
  }

  test("pipeline output: planted dupes dead, benchmark decontaminated, packing contiguous") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    val out = graft.operators.Pipeline.curate(input, "doc_id", "text", "source",
        minhashThreshold = 0.35, decontamBenchmark = docs.where(col("doc_id") < 5),
        decontamN = 8, budgetTokens = 1000L, packBudget = 128)
      .orderBy("doc_id").collect()
    assert(out.nonEmpty)
    // exact copies (stage 1) and mutated copies (stage 2) are all dead
    assert(out.forall(_.getAs[Long]("doc_id") < 100000))
    // the benchmark docs removed themselves via decontamination
    assert(out.forall(_.getAs[Long]("doc_id") >= 5))
    // packing: start offsets are the exclusive prefix sum in doc_id order
    var acc = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("start_tok") == acc,
        s"doc ${r.getAs[Long]("doc_id")}: start ${r.getAs[Long]("start_tok")} != $acc")
      acc += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("first_seq") == r.getAs[Long]("start_tok") / 128)
    }
  }

  test("persist boundaries: the candidate join reads cached signatures, not parquet") {
    // minhashNearDups materializes its result internally (staged write) and
    // releases the signature cache before returning — so the plan to audit
    // is the STAGED WRITE's, captured via a QueryExecutionListener, not the
    // returned frame's (that one is a plain staging scan by design).
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
    // other suites share this session and may hold their own persisted
    // blocks — scope the leak assertion to NEW entries from this call
    val residentBefore = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val pairs = Dedup.minhashNearDups(input, "doc_id", "text", 0.35)
      assert(pairs.count() > 0)
      // listener delivery is asynchronous — poll for the write whose plan
      // read the signature cache
      val deadline = System.currentTimeMillis() + 30000
      def findWrite() = captured.synchronized {
        captured.find(qe =>
          collectAll(qe.executedPlan) { case m: InMemoryTableScanExec => m }.nonEmpty)
      }
      var write = findWrite()
      while (write.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        write = findWrite()
      }
      assert(write.nonEmpty, "no captured execution read the signature cache")
      val plan = write.get.executedPlan
      val memScans = collectAll(plan) { case m: InMemoryTableScanExec => m }
      val fileScans = collectAll(plan) { case f: FileSourceScanExec => f }
      // banding side + both signature join-backs read the cache; nothing
      // in the candidate join re-derives the corpus from storage
      assert(memScans.size >= 3, s"expected >=3 cached scans:\n${plan.treeString.take(3000)}")
      assert(fileScans.isEmpty,
        s"candidate join re-read parquet:\n${plan.treeString.take(3000)}")
      // and the operator released the cache on completion
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- residentBefore
      assert(leaked.isEmpty, s"minhashNearDups left persisted RDDs resident: $leaked")
    } finally spark.listenerManager.unregister(listener)
  }

  test("classify->dedup->mix handoff: stages read staged tokens and never re-tokenize") {
    // the composed gate's shape: tokenize once, score WITHOUT filtering
    // (a keep-filter inlines the md5 fold and Catalyst pushes it below
    // the exchange onto the single scan task — the measured 26 s serial
    // trap), persist, then every stage reads the cached token arrays
    val toked = input.repartition(8, col("doc_id"))
      .select(col("doc_id"), col("source"),
        TextOps.tokens(lower(col("text"))).as("tk"))
    val scored = Classifier.scoreTokens(toked, "tk")
      .select("doc_id", "source", "tk", "keep")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      scored.count() // build the cache (fold runs here, above the exchange)
      val kept = scored.where(col("keep")).select("doc_id", "source", "tk")
      val winnow = Dedup.winnowClonePairsTokens(kept, "doc_id", "tk",
        k = 3, w = 4, minShared = 3, maxDocsPerFp = 64)
      winnow.collect()
      val plan = winnow.queryExecution.executedPlan
      assert(collectAll(plan) { case m: InMemoryTableScanExec => m }.nonEmpty,
        s"winnow stage did not read the token cache:\n${plan.treeString.take(2000)}")
      assert(collectAll(plan) { case f: FileSourceScanExec => f }.isEmpty,
        s"winnow stage re-read the corpus from storage:\n${plan.treeString.take(2000)}")
      // the regex tokenizer exists ONLY in the cache build — no node
      // ABOVE the cache scan re-tokenizes (the scan's treeString embeds
      // the cached build plan, which legitimately holds the one split)
      def aboveCache(p: SparkPlan): Seq[SparkPlan] = p match {
        case _: InMemoryTableScanExec => Seq.empty
        case a: AdaptiveSparkPlanExec => aboveCache(a.executedPlan)
        case q: QueryStageExec => aboveCache(q.plan)
        case r: ReusedExchangeExec => aboveCache(r.child)
        case other => other +: other.children.flatMap(aboveCache)
      }
      val retokenizers = aboveCache(plan)
        .filter(_.simpleString(10000).contains("split("))
      assert(retokenizers.isEmpty,
        s"a stage above the token cache re-ran the regex tokenizer:\n" +
          retokenizers.map(_.simpleString(300)).mkString("\n"))

      // token-variant operators are equivalent to their text-input forms
      val keptText = input.join(kept.select("doc_id"), Seq("doc_id"))
        .select("doc_id", "source", "text")
      val fromTokens = winnow.orderBy("a_id", "b_id").collect().toSeq
      val fromText = Dedup.winnowClonePairs(keptText, "doc_id", "text",
          k = 3, w = 4, minShared = 3, maxDocsPerFp = 64)
        .orderBy("a_id", "b_id").collect().toSeq
      assert(fromTokens == fromText,
        s"winnowClonePairsTokens != winnowClonePairs (${fromTokens.size} vs ${fromText.size} rows)")
      val scoreTok = scored.select("doc_id", "keep").orderBy("doc_id").collect().toSeq
      val scoreText = Classifier.score(input, "text")
        .select("doc_id", "keep").orderBy("doc_id").collect().toSeq
      assert(scoreTok == scoreText, "scoreTokens != score")
    } finally scored.unpersist(false)
  }

  test("sourceDivergence: identical distribution has KL 0, skew is positive") {
    import spark.implicits._
    // corpus of A="x y", B="x x" → marginal: x:3 y:1.
    val docs = Seq(("A", "x y"), ("B", "x x")).toDF("source", "text")
    val got = Pipeline.sourceDivergence(docs, "source", "text")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val klA = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    val klB = 1.0 * math.log(1.0 / 0.75)
    assert(got.toSeq == Seq(("A", 2L, 2L, r4(klA)), ("B", 2L, 1L, r4(klB))),
      got.mkString(", "))
    // a source that IS the corpus diverges by zero
    val same = Pipeline.sourceDivergence(
        Seq(("A", "x y"), ("A", "y x")).toDF("source", "text"), "source", "text")
      .select("kl").as[Double].head()
    assert(same == 0.0)
  }

  test("attrition attributes each doc to its FIRST missing stage") {
    import spark.implicits._
    def ids(v: Long*) = v.map(Tuple1(_)).toDF("id")
    val docs = ids(1L, 2L, 3L, 4L, 5L)
    val s1 = ids(2L, 3L, 4L, 5L) // drops 1
    val s2 = ids(3L, 5L)         // drops 2, 4
    val s3 = ids(5L)             // drops 3
    val got = Pipeline.attrition(docs, "id",
        Seq("a" -> s1, "b" -> s2, "c" -> s3))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "b", 5L -> "kept"))
    // independent (non-nested) sets: first failing predicate wins — a doc
    // absent from an EARLIER stage is attributed there even if a later
    // set would re-admit it
    val weird = Pipeline.attrition(docs, "id",
        Seq("a" -> s2, "b" -> s1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(weird(1L) == "a" && weird(4L) == "a" && weird(3L) == "kept")
  }
}
