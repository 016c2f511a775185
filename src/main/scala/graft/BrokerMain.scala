package graft

/** Standalone broker entrypoint — the reference's broker deployment unit
  * (broker/handler.go fronting datanodes). Point it at N running
  * `graft.ServerMain` instances; clients POST the usual AQLRequest to the
  * broker's `/query/aql` and receive merged results.
  *
  *   SPARK_GRAFT_INSTANCES    comma-separated instance base URLs, one per
  *                            data slice (e.g. "http://a:19374,http://b:19374");
  *                            `|`-separate replicas of the same slice for
  *                            failover ("http://a1:19374|http://a2:19374,...")
  *   SPARK_GRAFT_MEMBERS_DIR  alternative to SPARK_GRAFT_INSTANCES: shared
  *                            membership directory (BrokerTopology) —
  *                            instances registering there join the
  *                            fan-out at runtime, stale ones are demoted
  *                            (the reference's etcd-watched
  *                            HealthTrackingDynamicTopology role)
  *   SPARK_GRAFT_TOPOLOGY_DIR  where the rebalancer publishes
  *                            `assignment.json` when that differs from
  *                            the members dir — the broker refuses to
  *                            serve while an ASSIGNED slice has no live
  *                            member (partial answers forbidden); default
  *                            is the members dir itself
  *   SPARK_GRAFT_BROKER_PORT  HTTP port (default 19380; 0 = ephemeral)
  *   SPARK_GRAFT_MAX_QUERY_CONN   admission bound for /query/aql
  *                            (0 = unbounded) — excess clients 503 fast
  *   SPARK_GRAFT_QUERY_TIMEOUT_SEC  per-query deadline (0 = none): an
  *                            exceeded merge returns the named
  *                            `query deadline exceeded` error
  *
  * Runs without a SparkSession — the broker is HTTP fan-out + merge.
  */
object BrokerMain {
  def main(args: Array[String]): Unit = {
    val hosts = sys.env.getOrElse("SPARK_GRAFT_INSTANCES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val membersDir = sys.env.get("SPARK_GRAFT_MEMBERS_DIR").filter(_.nonEmpty)
    require(hosts.nonEmpty || membersDir.isDefined,
      "set SPARK_GRAFT_INSTANCES (static) or SPARK_GRAFT_MEMBERS_DIR (dynamic)")
    val port = sys.env.getOrElse("SPARK_GRAFT_BROKER_PORT", "19380").toInt
    val maxConn = sys.env.getOrElse("SPARK_GRAFT_MAX_QUERY_CONN", "0").toInt
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "0").toLong
    val assignDir = sys.env.getOrElse("SPARK_GRAFT_TOPOLOGY_DIR", "")
    val server = membersDir match {
      case Some(dir) =>
        graft.exec.BrokerServer.dynamic(
          new graft.exec.BrokerTopology(dir, assignmentDir = assignDir), port,
          maxQueryConnections = maxConn, queryTimeoutSec = timeoutSec)
      case None => new graft.exec.BrokerServer(hosts, port,
        maxQueryConnections = maxConn, queryTimeoutSec = timeoutSec)
    }
    server.start()
    val over = membersDir.map(d => s"membership dir $d")
      .getOrElse(hosts.mkString(", "))
    println(s"[graft] broker on port ${server.boundPort} over $over")
    Thread.currentThread().join() // serve until killed
  }
}
