package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A union that PRESERVES the children's hash partitioning — the missing
  * piece between Spark's `Union` (whose `outputPartitioning` is always
  * `UnknownPartitioning`, even over identically-partitioned children) and
  * the merge-style algorithms that want to window a union by key without
  * re-shuffling it. The reference's merge-as-of consumes presorted
  * per-batch runs for the same reason (/root/reference/memstore/merge.go).
  *
  * Semantics: bag concatenation, positional schema (like UNION ALL). The
  * first `numKeys` columns of both sides are the partitioning keys: the
  * physical node REQUIRES both children clustered on them, so Catalyst
  * either reuses an existing co-partitioning (bucketed scans, upstream
  * keyed aggregations — zero exchanges) or inserts the per-side shuffles
  * needed to establish it (never worse than the shuffle Union+Window
  * would pay). Output partitioning is the left child's, so a downstream
  * Window/aggregate keyed on those columns adds no exchange.
  *
  * This is the custom-operator ladder's rung (c): LogicalPlan + Strategy
  * + SparkPlan, injected per-session via `experimental.extraStrategies`.
  */
final case class CoPartitionedUnion(left: LogicalPlan, right: LogicalPlan,
    numKeys: Int) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output.zip(right.output).map { case (l, r) =>
      l.withNullability(l.nullable || r.nullable)
    }

  /** Every child column is consumed positionally (rows pass through
    * whole). Without this the optimizer's column pruning sees the right
    * child as unreferenced — its output attributes never appear in
    * `output`, which reuses the LEFT side's exprIds — and prunes it to
    * zero columns.
    */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): CoPartitionedUnion =
    copy(left = newLeft, right = newRight)
}

final case class CoPartitionedUnionExec(left: SparkPlan, right: SparkPlan,
    numKeys: Int) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output.zip(right.output).map { case (l, r) =>
      l.withNullability(l.nullable || r.nullable)
    }

  /** Both children clustered on their first `numKeys` columns;
    * EnsureRequirements establishes compatible co-partitioning (reusing
    * bucket/aggregation partitionings when present).
    */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(left.output.take(numKeys)),
    ClusteredDistribution(right.output.take(numKeys)))

  /** The concatenation of co-partitioned inputs keeps their partitioning. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (l, r) = (left.execute(), right.execute())
    // EnsureRequirements co-partitions children of binary nodes with
    // clustered requirements (the SortMergeJoin machinery); this guard
    // turns any future planner regression into a readable error instead
    // of a zip failure deep in the scheduler
    require(l.getNumPartitions == r.getNumPartitions,
      s"CoPartitionedUnion children not co-partitioned: " +
        s"${l.getNumPartitions} vs ${r.getNumPartitions} " +
        s"($outputPartitioning vs ${right.outputPartitioning})")
    l.zipPartitions(r) { (a, b) => a ++ b }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): CoPartitionedUnionExec =
    copy(left = newLeft, right = newRight)
}

object CoPartitionedUnionStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CoPartitionedUnion(l, r, k) =>
      CoPartitionedUnionExec(planLater(l), planLater(r), k) :: Nil
    case _ => Nil
  }
}

object CoPartitionedUnion {

  /** Idempotently register the planner strategy on the session. */
  def ensureStrategy(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(CoPartitionedUnionStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ CoPartitionedUnionStrategy
    }

  /** Partitioning-preserving UNION ALL of two positionally-identical
    * frames, clustered on the first `numKeys` columns.
    */
  def coUnion(a: DataFrame, b: DataFrame, numKeys: Int): DataFrame = {
    val spark = a.sparkSession
    ensureStrategy(spark)
    val (lp, rp) = (a.queryExecution.analyzed, b.queryExecution.analyzed)
    require(lp.output.length == rp.output.length &&
      lp.output.zip(rp.output).forall { case (l, r) => l.dataType == r.dataType },
      s"coUnion sides must match positionally: ${a.schema.sql} vs ${b.schema.sql}")
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      CoPartitionedUnion(lp, rp, numKeys))
  }
}
