package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Global plan invariant over EVERY gate: no gate may plan a
  * CartesianProduct, and a BroadcastNestedLoopJoin is legal only when
  * its BROADCAST side is structurally bounded — a global aggregate
  * (exactly one row: the decimal-exact scalar threshold/max/avg pattern)
  * or a literal LocalTableScan (driver-computed boundary grids) — or the
  * gate is on the named allowlist of bounded-QUERY-set broadcasts (ANN
  * probes and planted-signal joins whose build side is a filtered
  * handful of rows, pinned by their own family audits).
  *
  * This is the sweep version of OperatorPlanSpec's per-family audits: a
  * future gate that degrades to an unbounded nested loop fails HERE even
  * before anyone writes its dedicated audit. Plans are built through
  * AQE's initial planning but not executed.
  */
class PlanGuardSpec extends SparkSpec {

  /** Bounded-query-set broadcasts: the build side is a filtered tiny
    * frame (planted queries, probe ids) rather than a scalar — each is
    * pinned by its family's dedicated audit or fixture contract.
    */
  private val boundedQueryGates: Set[String] = Set(
    "q_ann_topk", "q_ann_range", "q_ann_recall", "q_ann_pq", "q_ann_sq8",
    "q_retrieval_mmr", "q_hard_negatives", "q_margin_mining",
    "q_emb_near_dup", "q_emb_centroid_sep",
    // vec_id < 2 probe set broadcast into the corpus
    "q_retrieval_metrics",
    // the persisted index's corpus-stats side is ONE ROW by construction
    // (a global aggregate written to parquet at build time — structurally
    // invisible to the scalar detector after the round trip)
    "q_text_index_search", "q_text_index_append",
    // per-lang sketch frames theta-joined lang_a < lang_b: bounded by
    // language cardinality (~5 rows a side), pinned by the gate oracle
    "q_sketch_kmv")

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val nested: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    p +: (p.children ++ nested).flatMap(walk)
  }

  /** Bounded at the ROOT, by construction: descend only through
    * row-count-preserving (or row-count-reducing) nodes; the first node
    * that can multiply rows decides. An `exists` over all descendants
    * would bless `fact.join(broadcast(scalar))` — millions of rows that
    * merely CONSUME a scalar — which is exactly the degradation this
    * guard exists to catch.
    */
  private def boundedBuildSide(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty // global agg = exactly one row
    case _: LocalTableScanExec => true // literal driver-computed rows
    case g: org.apache.spark.sql.execution.GlobalLimitExec => true
    case b: BroadcastNestedLoopJoinExec =>
      // scalar × scalar: a cross of two bounded sides is bounded
      boundedBuildSide(b.left) && boundedBuildSide(b.right)
    case a: AdaptiveSparkPlanExec => boundedBuildSide(a.executedPlan)
    case q: QueryStageExec => boundedBuildSide(q.plan)
    case r: ReusedExchangeExec => boundedBuildSide(r.child)
    // row-preserving / row-reducing wrappers: recurse into the child
    case _: org.apache.spark.sql.execution.ProjectExec |
         _: org.apache.spark.sql.execution.FilterExec |
         _: org.apache.spark.sql.execution.SortExec |
         _: org.apache.spark.sql.execution.CoalesceExec |
         _: org.apache.spark.sql.execution.LocalLimitExec |
         _: org.apache.spark.sql.execution.WholeStageCodegenExec |
         _: org.apache.spark.sql.execution.InputAdapter |
         _: org.apache.spark.sql.execution.exchange.Exchange =>
      boundedBuildSide(p.children.head)
    case _ => false
  }

  test("no gate plans a CartesianProduct; every BNLJ broadcasts a bounded side") {
    val violations = scala.collection.mutable.ListBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val root = fn(spark, sfDir).queryExecution.executedPlan
        val nodes = walk(root)
        if (nodes.exists(_.getClass.getSimpleName.startsWith("CartesianProduct")))
          violations += s"$name: CartesianProduct"
        nodes.collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
          val bcast = b.buildSide match {
            case BuildLeft => b.left
            case BuildRight => b.right
          }
          if (!boundedBuildSide(bcast) && !boundedQueryGates(name))
            violations += s"$name: BNLJ with unbounded build side:\n" +
              bcast.treeString.take(500)
        }
      } catch { case e: Throwable =>
        violations += s"$name: plan build failed: ${e.getMessage}"
      }
    }
    assert(violations.isEmpty,
      s"plan-guard violations:\n${violations.mkString("\n")}")
  }
}
