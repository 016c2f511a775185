package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PageRank over a document-relation graph (near-dup
  * pairs, similarity edges, citation links) — the graph-centrality signal
  * a curation pass uses to pick canonical documents or weight sources.
  *
  * Contract: the edge list must be out-degree-complete — every node that
  * appears anywhere appears as a source (a symmetrized similarity graph
  * satisfies this by construction). Dangling-mass redistribution is
  * deliberately out of scope: the curation graphs this serves are
  * undirected.
  *
  * Scale shape: the degree-annotated edge list is materialized ONCE to
  * staging ([[Staged]] — it is read every iteration, and for the
  * similarity-graph use it is itself the output of an expensive pair
  * search); each iteration is one hash-join of the rank table against the
  * edges plus one partial-aggregated shuffle on the destination id — the
  * standard Pregel/GraphX shape, expressed relationally so Catalyst/AQE
  * size the exchanges. Iterations form a lazy linear chain (each stage
  * computed once per action); the rank table is never collected to the
  * driver.
  */
object GraphRank {

  /** Ranks after `iters` power iterations at `damping`, from a uniform
    * start. Returns (id, rank) for every node, rank UNROUNDED — gate
    * consumers round for cross-engine compare.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    require(damping > 0 && damping < 1, s"damping $damping must be in (0,1)")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val withDeg = Staged.materialize(e.join(deg, Seq("__src")))
    val nodes = withDeg.select(col("__src").as("id")).distinct()
    val nAgg = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var ranks = nodes.crossJoin(broadcast(nAgg))
      .select(col("id"), (lit(1.0) / col("__n")).as("rank"))
    for (_ <- 1 to iters) {
      ranks = withDeg.join(ranks, col("__src") === col("id"))
        .select(col("__dst"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("__dst"))
        .agg(sum("__c").as("__in"))
        .crossJoin(broadcast(nAgg))
        .select(col("__dst").as("id"),
          (lit(1.0 - damping) / col("__n") + lit(damping) * col("__in"))
            .as("rank"))
    }
    ranks
  }
}
