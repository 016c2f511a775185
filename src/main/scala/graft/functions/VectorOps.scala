package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, CosineSim, CosineSimDouble}

/** Native vector math over `array<float>` embedding columns.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) runs its
  * lambda INTERPRETED per element — for a 64-dim cosine that is ~190
  * interpreted expression evaluations per pair, which dominated the ANN
  * operators' profile. [[CosineSim]] is a Catalyst `BinaryExpression` with
  * `doGenCode`: whole-stage codegen emits a direct call to the primitive
  * loop in [[VectorOps.cosineSimilarity]], so the scorer stays inside the
  * generated code path (the preference order from SURVEY §7.3: native
  * Expression > UDF > interpreted HOF).
  *
  * Exactness contract: accumulation order and double arithmetic are
  * identical to the sequential-fold HOF form
  * (`dot / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`, each sum left-to-right), so
  * results are bit-identical and oracle hashes are unchanged
  * (VectorOpsSpec asserts this against the HOF form).
  */
object VectorOps {

  /** Fused cosine over the common prefix of two float vectors: one pass
    * accumulating dot, |a|², |b|² in doubles, each left-to-right exactly
    * like the sequential HOF fold. Contract: element nulls are out of
    * scope (embedding vectors are dense); zero-norm input yields NaN /
    * ±Infinity, same as the fold form.
    */
  def cosineSimilarity(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Codegen'd cosine similarity of two `array<float>` columns
    * ([[org.apache.spark.sql.graftbridge.CosineSim]]).
    */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Sequential-fold cosine over `array<double>` (derived vectors —
    * centroids, averaged embeddings — that never existed as floats).
    */
  def cosineSimilarityDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Codegen'd cosine of two `array<double>` columns. */
  def cosineDouble(a: Column, b: Column): Column =
    Bridge.column(CosineSimDouble(Bridge.expression(a), Bridge.expression(b)))
}
