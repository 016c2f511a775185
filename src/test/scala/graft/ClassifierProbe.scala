package graft

import graft.operators.Classifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q_classifier_train/eval (OPTIMIZATION_r15.md):
  * times each phase of trainLogistic + scoreWith + confusion separately.
  * Run: sbt "Test/runMain graft.ClassifierProbe /root/testdata/sf0.1"
  */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_REDUCERS", cpus))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("PROBE_CACHE_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${2 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (rnd <- 1 to 2) {
      spark.catalog.clearCache()
      println(s"--- round $rnd ---")
      val docs = Tables.documents(spark, d)
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 3 === 0, repeat(lit(" qualitymarker"), 10))
            .otherwise(lit(""))))
      val train = docs.where(col("doc_id") < 300)
      // phase 1: the feature table build + count (trainLogistic's prefix)
      val toks = train.withColumn("__toks",
        graft.operators.TextOps.tokens(lower(col("text"))))
      time("  x build+count") {
        val x = toks.select(col("doc_id"), col("__toks"),
            graft.functions.GramHash.featureHash60Col(col("__toks")).as("__fh"))
          .select(col("doc_id"),
            explode(sequence(lit(1),
              size(col("__toks")) + greatest(size(col("__toks")) - 1, lit(0)))).as("__fi"))
          .count()
        println(s"    (feature rows: $x)")
      }
      var w: org.apache.spark.sql.DataFrame = null
      time("  trainLogistic total") {
        w = Classifier.trainLogistic(train, "doc_id", "text",
          col("doc_id") % 3 === 0, bucketBits = 12, epochs = 2, lr = 10.0)
        w.write.format("noop").mode("overwrite").save()
      }
      // ---- replicated internals with per-step timing ----
      locally {
        import org.apache.spark.sql.DataFrame
        val label = col("doc_id") % 3 === 0
        val idCol = "doc_id"; val bucketBits = 12; val lr = 10.0
        val toks2 = train.withColumn("__toks",
          graft.operators.TextOps.tokens(lower(col("text"))))
        val n = size(col("__toks"))
        var x: DataFrame = null
        time("    t.x persist+count") {
          x = toks2.select(col(idCol), col("__toks"),
              graft.functions.GramHash.featureHash60Col(col("__toks")).as("__fh"))
            .select(col(idCol), col("__fh"),
              explode(when(n > 0, sequence(lit(1), n + greatest(n - 1, lit(0))))
                .otherwise(typedLit(Seq.empty[Int]))).as("__fi"))
            .select(col(idCol),
              (element_at(col("__fh"), col("__fi")) % (1L << bucketBits)).as("bucket"))
            .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__x"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          x.count()
        }
        println(s"    (x cached partitions: ${x.rdd.getNumPartitions})")
        val nf = x.groupBy(col(idCol)).agg(sum("__x").as("__nf"))
        val lab = train.select(col(idCol), label.cast("double").as("__y"))
          .where(col("__y").isNotNull)
        var nDocs = 0L
        time("    t.nDocs count") { nDocs = lab.join(nf, Seq(idCol)).count() }
        var w1: DataFrame = null
        time("    t.epoch1 (ephemeral)") {
          val resid = lab.join(nf, Seq(idCol))
            .select(col(idCol), (lit(0.5) - col("__y")).as("__r"))
          val grad = x.join(resid, Seq(idCol)).groupBy(col("bucket"))
            .agg(round(lit(lr * 1000.0) * sum(col("__r") * col("__x")) / nDocs)
              .cast("long").as("__g"))
          w1 = graft.operators.Staged.ephemeral(
            grad.select(col("bucket"), (-col("__g")).as("w_milli")))
        }
        var w2: DataFrame = null
        time("    t.epoch2 (materialize)") {
          val m = x.join(broadcast(w1), Seq("bucket"))
            .groupBy(col(idCol)).agg(sum(col("__x") * col("w_milli")).as("__mm"))
          val resid = m.join(nf, Seq(idCol)).join(lab, Seq(idCol))
            .select(col(idCol),
              (lit(1.0) / (lit(1.0) + exp(-(col("__mm") / (lit(1000.0) * col("__nf"))))) -
                col("__y")).as("__r"))
          val grad = x.join(resid, Seq(idCol)).groupBy(col("bucket"))
            .agg(round(lit(lr * 1000.0) * sum(col("__r") * col("__x")) / nDocs)
              .cast("long").as("__g"))
          w2 = graft.operators.Staged.materialize(
            w1.join(grad, Seq("bucket"))
              .select(col("bucket"), (col("w_milli") - col("__g")).as("w_milli")))
        }
        time("    t.final noop") {
          w2.where(col("w_milli") =!= 0).write.format("noop").mode("overwrite").save()
        }
        graft.operators.Staged.releaseCheckpoint(w1)
        x.unpersist(false)
      }
      time("  scoreWith+confusion") {
        val scored = Classifier.scoreWith(
          docs.where(col("doc_id") >= 300 && col("doc_id") < 500),
          "doc_id", "text", w, bucketBits = 12)
        Classifier.confusion(scored, col("keep"), col("doc_id") % 3 === 0)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
