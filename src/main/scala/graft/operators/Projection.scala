package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss random projection with a SIGN matrix derived
  * from the md5 hash (Achlioptas 2003: ±1 entries preserve pairwise
  * distances with the same JL guarantee as Gaussian matrices) — the
  * dimensionality-reduction rung BEFORE the ANN index when the raw
  * embedding is wide: project 768→64 once, build IVF/PQ on the
  * projection, re-rank survivors on the full vector.
  *
  * The matrix entry for (input dim i, output dim j) is
  * `sign = +1 if hash60("i:j") is even else -1`, scaled by `1/sqrt(k)` —
  * a pure function of the dimensions, so any engine regenerates the SAME
  * matrix with no shipped state, and a SQL oracle replays the projection
  * exactly ([[graft.functions.Sketches.hash60]] hex arithmetic). Output
  * dim j folds `Σ_i v[i]·sign(i,j)` sequentially in element order, the
  * repo's cross-engine double contract.
  *
  * Scale shape: the matrix (k×d doubles, e.g. 8×64) is embedded in the
  * expression and the projection is one codegen'd map-side pass — no
  * shuffle, no fitted state, nothing collected.
  */
object Projection {

  /** The deterministic ±1/√k matrix entry, exposed for specs/oracles. */
  def sign(i: Int, j: Int): Double =
    if (graft.functions.Sketches.hash60(s"$i:$j") % 2 == 0) 1.0 else -1.0

  private def matrix(inDim: Int, outDim: Int): Array[Array[Double]] = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, inDim)((j, i) => sign(i, j) * scale)
  }

  /** Project an `array<float>`/`array<double>` column to `outDim`
    * dimensions. `inDim` must match the vector length.
    */
  def project(vec: Column, inDim: Int, outDim: Int): Column = {
    require(inDim > 0 && outDim > 0)
    Bridge.column(JlProject(Bridge.expression(vec.cast(ArrayType(DoubleType))),
      inDim, outDim))
  }

  /** `df` with `vecCol` replaced by its `outDim`-dimensional projection. */
  def reduce(df: DataFrame, vecCol: String, inDim: Int, outDim: Int): DataFrame =
    df.withColumn(vecCol, project(col(vecCol), inDim, outDim))

  /** Shared eval path: sequential fold per output dim. */
  def matVec(m: Array[Array[Double]], v: ArrayData): ArrayData = {
    val out = new Array[Any](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      var acc = 0.0
      var i = 0
      val n = math.min(row.length, v.numElements())
      while (i < n) { acc += v.getDouble(i) * row(i); i += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd JL projection; the sign matrix is regenerated from the
  * (inDim, outDim) parameters at construction — no state in the plan
  * beyond two ints.
  */
case class JlProject(child: Expression, inDim: Int, outDim: Int)
    extends UnaryExpression {

  @transient private lazy val m: Array[Array[Double]] = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, inDim)((j, i) => Projection.sign(i, j) * scale)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def computePublic(v: ArrayData): ArrayData = Projection.matVec(m, v)

  override def nullSafeEval(a: Any): Any = computePublic(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jlproj", this, classOf[JlProject].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computePublic($a);")
  }

  override protected def withNewChildInternal(c: Expression): JlProject =
    copy(child = c)

  override def prettyName: String = "jl_project"
}
