package graft

import org.apache.spark.sql.SparkSession

/** Operator entrypoint for a slice rebalance — run when the member set
  * changes (spark-submit or bare `runMain`), the role of the reference
  * controller's assignment recompute
  * (/root/reference/controller/handlers/assignment.go):
  *
  *   SPARK_GRAFT_SHARED_ARCHIVE  the authoritative day-partitioned
  *                               archive (source of truth for the day
  *                               list and the copies)
  *   SPARK_GRAFT_TOPOLOGY_DIR    where the versioned assignment document
  *                               publishes (members with
  *                               SPARK_GRAFT_ASSIGNMENT serve by it)
  *   SPARK_GRAFT_SLICE_DIRS      `slice=localDir` pairs, comma-separated
  *                               — the NEW member set and each member's
  *                               instance-local storage root
  *
  * Copy → publish → drop: safe to re-run, safe to crash anywhere (see
  * [[graft.exec.SliceRebalance]]).
  */
/** Watch mode (`SPARK_GRAFT_WATCH_SECONDS` > 0 with
  * `SPARK_GRAFT_MEMBERS_DIR` + `SPARK_GRAFT_LOCAL_ROOT`): instead of a
  * one-shot rebalance over SPARK_GRAFT_SLICE_DIRS, run the reference
  * controller's watch loop — observe broker membership heartbeats and
  * fire a rebalance over `<localRoot>/<slice>` member directories once a
  * changed slice set has held for SPARK_GRAFT_STABLE_TICKS (default 3)
  * consecutive ticks; flapping members never trigger.
  */
object RebalanceMain {
  def main(args: Array[String]): Unit = {
    val shared = sys.env.getOrElse("SPARK_GRAFT_SHARED_ARCHIVE",
      sys.error("SPARK_GRAFT_SHARED_ARCHIVE is required"))
    val topoDir = sys.env.getOrElse("SPARK_GRAFT_TOPOLOGY_DIR",
      sys.error("SPARK_GRAFT_TOPOLOGY_DIR is required"))
    val watchSeconds = sys.env.getOrElse("SPARK_GRAFT_WATCH_SECONDS", "0").toLong
    if (watchSeconds > 0) {
      val membersDir = sys.env.getOrElse("SPARK_GRAFT_MEMBERS_DIR",
        sys.error("watch mode requires SPARK_GRAFT_MEMBERS_DIR"))
      val localRoot = sys.env.getOrElse("SPARK_GRAFT_LOCAL_ROOT",
        sys.error("watch mode requires SPARK_GRAFT_LOCAL_ROOT (member dirs at <root>/<slice>)"))
      val stableTicks = sys.env.getOrElse("SPARK_GRAFT_STABLE_TICKS", "3").toInt
      val spark = buildSpark()
      val trigger = graft.exec.RebalanceTrigger.over(spark,
        new graft.exec.BrokerTopology(membersDir), shared, topoDir, localRoot,
        stableTicks)
      println(s"[rebalance] watching $membersDir every ${watchSeconds}s " +
        s"(stable ticks: $stableTicks)")
      while (true) {
        try {
          if (trigger.tick()) println(s"[rebalance] fired (total ${trigger.fires})")
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"[rebalance] tick failed: ${e.getMessage}")
        }
        Thread.sleep(watchSeconds * 1000)
      }
    }
    val pairs = sys.env.getOrElse("SPARK_GRAFT_SLICE_DIRS",
      sys.error("SPARK_GRAFT_SLICE_DIRS is required (slice=dir,slice=dir,...)"))
      .split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty && v.nonEmpty => k -> v
          case _ => sys.error(s"bad SPARK_GRAFT_SLICE_DIRS entry '$kv'")
        }
      }.toSeq
    // a duplicated slice id (usually a typo for another member) must not
    // silently collapse via toMap — the dropped member's storage would
    // keep serving stale days with no error
    val dupes = pairs.groupBy(_._1).filter(_._2.length > 1).keys
    if (dupes.nonEmpty)
      sys.error(s"duplicate slice id(s) in SPARK_GRAFT_SLICE_DIRS: ${dupes.mkString(", ")}")
    val dirs = pairs.toMap
    val spark = buildSpark()
    val r = graft.exec.SliceRebalance.rebalanceDetailed(spark, shared, dirs, topoDir)
    val a = r.assignment
    println(s"[rebalance] published assignment v${a.version}: " +
      a.owners.toSeq.sortBy(_._1).map { case (s, ds) =>
        s"$s=${ds.size} days"
      }.mkString(", "))
    r.mergedUp.toSeq.sortBy(_._1).foreach { case (s, ds) =>
      println(s"[rebalance] merged locally-drained days up from $s: ${ds.mkString(", ")}")
    }
    r.protectedDays.toSeq.sortBy(_._1).foreach { case (s, ds) =>
      println(s"[rebalance] WARNING: refused to drop local days on $s " +
        s"(not fully present in the shared archive): ${ds.mkString(", ")}")
    }
    spark.stop()
  }

  private def buildSpark(): SparkSession = {
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
