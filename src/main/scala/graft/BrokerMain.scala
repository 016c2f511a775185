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
  *   SPARK_GRAFT_BROKER_PORT  HTTP port (default 19380; 0 = ephemeral)
  *
  * Runs without a SparkSession — the broker is HTTP fan-out + merge.
  */
object BrokerMain {
  def main(args: Array[String]): Unit = {
    val hosts = sys.env.getOrElse("SPARK_GRAFT_INSTANCES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(hosts.nonEmpty,
      "SPARK_GRAFT_INSTANCES must list at least one instance base URL")
    val port = sys.env.getOrElse("SPARK_GRAFT_BROKER_PORT", "19380").toInt
    val server = new graft.exec.BrokerServer(hosts, port)
    server.start()
    println(s"[graft] broker on port ${server.boundPort} over ${hosts.mkString(", ")}")
    Thread.currentThread().join() // serve until killed
  }
}
