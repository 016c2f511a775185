package graft.exec

/** Automated rebalance on membership change — the reference controller's
  * watch loop (/root/reference/controller/ watches etcd membership and
  * recomputes placements via handlers/assignment.go;
  * util.CalculateShardAssignment spreads shards over the instance set).
  * Here the watch substrate is [[BrokerTopology]]'s heartbeat directory
  * and the action is [[SliceRebalance]]: when the FRESH slice-id set has
  * differed from the published assignment's slice set for `stableTicks`
  * CONSECUTIVE ticks — same changed set every tick — the trigger fires
  * one rebalance over the current members.
  *
  * The stability window is the flap filter: a member that bounces
  * (registers then dies, or heartbeats intermittently) changes the
  * observed set between ticks and resets the counter, so it never causes
  * a data-moving rebalance; only a membership change that HOLDS does.
  * An empty member set never fires — rebalancing to zero members is
  * always a monitoring gap, not an intent.
  *
  * Pure tick logic with injected providers (membership, published
  * assignment, fire action) — the deployment loop (RebalanceMain's
  * watch mode, or a scheduler extra job) owns the cadence and the
  * slice→directory convention; tests drive `tick()` with fakes or a
  * fake-clock topology.
  */
final class RebalanceTrigger(
    memberSlices: () => Set[String],
    publishedSlices: () => Set[String],
    fire: Set[String] => Unit,
    stableTicks: Int = 3) {
  require(stableTicks >= 1, s"stableTicks $stableTicks must be >= 1")

  private var pending: Option[Set[String]] = None
  private var seen = 0
  /** Rebalances fired over this trigger's lifetime (observability). */
  @volatile var fires: Long = 0

  /** One observation; returns true when a rebalance fired. Synchronized:
    * the tick may be driven by a scheduler thread and inspected by
    * another.
    */
  def tick(): Boolean = synchronized {
    val current = memberSlices()
    if (current.isEmpty || current == publishedSlices()) {
      pending = None
      seen = 0
      false
    } else {
      if (pending.contains(current)) seen += 1
      else { pending = Some(current); seen = 1 }
      if (seen >= stableTicks) {
        fire(current)
        fires += 1
        pending = None
        seen = 0
        true
      } else false
    }
  }
}

object RebalanceTrigger {

  /** The standard wiring: watch `topology`, compare against the
    * assignment published at `topologyDir`, and fire
    * [[SliceRebalance.rebalance]] over `localRoot/<slice>` member
    * directories (the slice→storage convention of the watch deployment).
    */
  def over(spark: org.apache.spark.sql.SparkSession, topology: BrokerTopology,
      sharedArchiveDir: String, topologyDir: String, localRoot: String,
      stableTicks: Int = 3): RebalanceTrigger = {
    val log = org.slf4j.LoggerFactory.getLogger(classOf[RebalanceTrigger])
    new RebalanceTrigger(
      () => topology.freshSliceIds(),
      () => SliceRebalance.read(topologyDir).map(_.owners.keySet).getOrElse(Set.empty),
      slices => {
        val dirs = slices.map(s => s -> s"$localRoot/$s").toMap
        // fence at fire time: the version this watcher's decision was
        // based on — a concurrent watcher that publishes first makes
        // this rebalance abort by name instead of last-writer-wins
        val expected = SliceRebalance.read(topologyDir).map(_.version)
        val r = SliceRebalance.rebalanceDetailed(spark, sharedArchiveDir, dirs,
          topologyDir, expected)
        log.info(s"membership-triggered rebalance published " +
          s"v${r.assignment.version} over slices ${slices.toSeq.sorted.mkString(", ")}")
      },
      stableTicks)
  }
}
