package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The shared shapes of the cross-batch dedup streams
  * ([[StreamingNearDedup]] MinHash, [[StreamingSemanticDedup]] embedding
  * cosine): both run in-batch pairs → connected components → smallest-id
  * representative, probe a [[BucketStore]]-disciplined store for the
  * representatives, and project the same (id, kept, dup_of) decisions.
  * Only the signature family differs — bucket columns, payload column,
  * agreement predicate — so the rep/decision algebra lives here ONCE:
  * the two streams drifted copies of the empty-hits schema and the
  * kept/dup_of when-chain until r14-s3 factored them.
  */
private[streaming] object DedupStreamOps {

  /** Attach each row's component representative: `__rep` = the
    * connected-component minimum over `pairs` (a_id, b_id), the row's own
    * id when unpaired. Keeps `keep` (the payload column) alongside.
    */
  def withReps(rows: DataFrame, idCol: String, keep: Column,
      pairs: DataFrame): DataFrame = {
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .withColumnRenamed("id", idCol)
    rows.join(comp, Seq(idCol), "left")
      .select(col(idCol), keep,
        coalesce(col("component"), col(idCol)).as("__rep"))
  }

  /** The empty (idCol, __dup_of) hits frame — a first batch with no store
    * yet. Typed off the id column so the downstream joins stay exact.
    */
  def emptyHits(reps: DataFrame, idCol: String): DataFrame =
    reps.sparkSession.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        reps.schema(idCol),
        org.apache.spark.sql.types.StructField("__dup_of",
          reps.schema(idCol).dataType))))

  /** The decisions projection both streams emit: a row is `kept` iff it
    * is its own representative AND that representative took no store hit;
    * `dup_of` is the store's keeper for store hits (members trace through
    * their rep to the STORE's keeper), the in-batch rep otherwise, null
    * for kept rows.
    */
  def decisions(withComp: DataFrame, hits: DataFrame, idCol: String,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val repHits = hits.select(col(idCol).as("__rep"), col("__dup_of"))
    withComp.select(col(idCol), col("__rep"))
      .join(repHits, Seq("__rep"), "left")
      .select(col(idCol),
        (col(idCol) === col("__rep") && col("__dup_of").isNull).as("kept"),
        when(col("__dup_of").isNotNull, col("__dup_of"))
          .when(col(idCol) =!= col("__rep"), col("__rep"))
          .otherwise(lit(null).cast(idType)).as("dup_of"))
  }
}
