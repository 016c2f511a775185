package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PageRank over a document-relation graph (near-dup
  * pairs, similarity edges, citation links) — the graph-centrality signal
  * a curation pass uses to pick canonical documents or weight sources.
  *
  * Textbook semantics on GENERAL directed graphs: the node set is
  * src ∪ dst (a node that only ever appears as a destination still holds
  * rank), every node keeps its `(1-d)/n` teleport mass every iteration
  * (zero in-degree included, via the left join + coalesce(0)), and the
  * mass parked on DANGLING nodes (no out-edges) is redistributed
  * uniformly — so total rank mass is exactly 1 after every iteration, on
  * sink-bearing citation graphs as much as on symmetric similarity
  * graphs ([[GraphRankSpec]] pins a sink graph by hand;
  * `q_graph_pagerank_directed` pins one against a textbook SQL oracle).
  *
  * Scale shape: the degree-annotated edge list is materialized ONCE to
  * staging ([[Staged]] — it is read every iteration, and for the
  * similarity-graph use it is itself the output of an expensive pair
  * search); each iteration is one hash-join of the rank table against the
  * edges plus one partial-aggregated shuffle on the destination id — the
  * standard Pregel/GraphX shape, expressed relationally so Catalyst/AQE
  * size the exchanges. Dangling nodes are detected ONCE up front: on a
  * dangling-free graph (symmetrized similarity graphs, the common
  * caller) the rank table is consumed once per iteration and chains
  * lazily with no staging; with dangling nodes present it is consumed
  * twice each round (the dangling-mass scalar and the contribution
  * join), so it is materialized per iteration (node-sized, (id, rank)
  * only) to keep the plan depth CONSTANT instead of letting the lazy
  * lineage chain double — the relational analog of GraphX's periodic
  * checkpoint. The rank table is never collected to the driver.
  */
object GraphRank {

  /** Ranks after `iters` power iterations at `damping`, from a uniform
    * start over src ∪ dst. Returns (id, rank) for every node, rank
    * UNROUNDED — gate consumers round for cross-engine compare.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    require(damping > 0 && damping < 1, s"damping $damping must be in (0,1)")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val withDeg = Staged.materialize(e.join(deg, Seq("__src")))
    // src ∪ dst from the STAGED edge list — deriving it from `e` would
    // recompute the (possibly expensive) upstream edge search a second
    // time; every row of e survives the degree join, so the node set is
    // identical
    val nodesLazy = withDeg.select(col("__src").as("id"))
      .unionByName(withDeg.select(col("__dst").as("id")))
      .distinct()
    val outNodes = withDeg.select(col("__src").as("id")).distinct()
    // checked ONCE up front: on a dangling-free graph (every node has
    // out-edges — true by construction for symmetrized similarity
    // graphs, the common caller) the dangling scalar is identically 0,
    // the rank table is consumed just ONCE per iteration (the
    // contribution join), and the lazy linear chain needs no
    // per-iteration staging — the dangling-aware path would pay a
    // node-table parquet round trip per iteration for nothing. Only the
    // dangling path stages the node set (its second per-iteration
    // consumer); the fast path re-derives it per consumer as a cheap
    // distinct over the staged edge parquet, saving a staging job.
    val hasDangling = !nodesLazy.join(outNodes, Seq("id"), "left_anti").isEmpty
    val nodes = if (hasDangling) Staged.materialize(nodesLazy) else nodesLazy
    val nAgg = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var ranks = nodes.crossJoin(broadcast(nAgg))
      .select(col("id"), (lit(1.0) / col("__n")).as("rank"))
    if (hasDangling) ranks = Staged.materialize(ranks)
    for (_ <- 1 to iters) {
      // mass sitting on dangling nodes (no out-edges) this iteration —
      // a 1-row scalar, redistributed uniformly below. Reading `ranks`
      // here is the second consumer per iteration, which is why the
      // dangling path stages the rank table each round (constant plan
      // depth instead of doubling).
      val dangling =
        if (!hasDangling) null
        else ranks.join(outNodes, Seq("id"), "left_anti")
          .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
      val contrib = withDeg.join(ranks, col("__src") === col("id"))
        .select(col("__dst").as("__cid"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("__cid"))
        .agg(sum("__c").as("__in"))
      val joined = nodes.join(contrib, col("id") === col("__cid"), "left")
        .crossJoin(broadcast(nAgg))
      val next =
        if (!hasDangling)
          joined.select(col("id"),
            (lit(1.0 - damping) / col("__n") +
              lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
        else
          joined.crossJoin(broadcast(dangling))
            .select(col("id"),
              (lit(1.0 - damping) / col("__n") +
                lit(damping) * (coalesce(col("__in"), lit(0.0)) +
                  col("__dm") / col("__n"))).as("rank"))
      ranks = if (hasDangling) Staged.materialize(next) else next
    }
    ranks
  }
}
