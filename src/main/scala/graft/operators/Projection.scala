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

  // ---- PCA (data-aware projection) ----------------------------------------

  /** A fitted PCA model: the data mean and the top-k principal
    * components as rows (each a unit vector; rows mutually orthogonal,
    * eigenvalues descending). Sign canonicalization: each component's
    * largest-|entry| coordinate is positive (first index at ties), so
    * the fit is fully deterministic.
    */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double])

  /** Fit PCA over a vector column — the data-aware sibling of the JL
    * projection (optimal k-dim linear reconstruction vs JL's oblivious
    * distance preservation; fit PCA when you can afford one pass over
    * the data, JL when you cannot or d is huge).
    *
    * Scale shape: ONE distributed pass accumulates the d-vector of sums
    * and the upper-triangular d×d Gram matrix per partition (an
    * imperative per-partition fold — d(d+1)/2 doubles of state, the
    * [[matVec]] exception case) and reduces them; the covariance
    * eigendecomposition runs on the DRIVER over the d×d matrix (cyclic
    * Jacobi — deterministic sweep order), which is bounded by the
    * embedding dimension, not the corpus. d ≤ ~2000 keeps the driver
    * work trivial; the corpus is never shuffled at all.
    */
  def fitPca(df: DataFrame, vecCol: String, inDim: Int, k: Int): PcaModel = {
    require(inDim > 0 && k > 0 && k <= inDim)
    val d = inDim
    val tri = d * (d + 1) / 2
    val rows = df.select(col(vecCol).cast(ArrayType(DoubleType)))
      .queryExecution.toRdd
    val (n, sums, gram) = rows.mapPartitions { it =>
      val s = new Array[Double](d)
      val g = new Array[Double](tri)
      var cnt = 0L
      val buf = new Array[Double](d)
      it.foreach { r =>
        if (!r.isNullAt(0)) {
          val v = r.getArray(0)
          require(v.numElements() == d,
            s"fitPca: vector of length ${v.numElements()}, expected $d")
          var i = 0
          while (i < d) { buf(i) = v.getDouble(i); s(i) += buf(i); i += 1 }
          var t = 0
          i = 0
          while (i < d) {
            var j = i
            while (j < d) { g(t) += buf(i) * buf(j); j += 1; t += 1 }
            i += 1
          }
          cnt += 1
        }
      }
      Iterator((cnt, s, g))
    }.reduce { (a, b) =>
      var i = 0
      while (i < d) { a._2(i) += b._2(i); i += 1 }
      i = 0
      while (i < tri) { a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    require(n > 1, s"fitPca needs at least 2 vectors, got $n")
    val mean = sums.map(_ / n)
    // covariance from the Gram sums: C[i][j] = (G[i][j] - n·μi·μj)/(n-1)
    val c = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = (gram(t) - n * mean(i) * mean(j)) / (n - 1)
        c(i)(j) = v; c(j)(i) = v
        j += 1; t += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(c)
    // top-k by eigenvalue desc (index asc at ties), sign-canonicalized
    val order = values.zipWithIndex.sortBy { case (v, idx) => (-v, idx) }
    val comps = order.take(k).map { case (_, idx) =>
      val col0 = Array.tabulate(d)(r => vectors(r)(idx))
      var m = 0
      var amax = 0.0
      var r = 0
      while (r < d) {
        if (math.abs(col0(r)) > amax) { amax = math.abs(col0(r)); m = r }
        r += 1
      }
      if (col0(m) < 0) col0.map(-_) else col0
    }
    PcaModel(mean, comps, order.take(k).map(_._1))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed sweep order, fixed iteration cap), no
    * dependencies. Returns (eigenvalues, eigenvector matrix with
    * vectors in COLUMNS). Adequate for d up to a few thousand.
    */
  private def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 64 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tTan =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cCos = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val sSin = tTan * cCos
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = cCos * arp - sSin * arq
              a(r)(q) = sSin * arp + cCos * arq
              r += 1
            }
            var cIdx = 0
            while (cIdx < d) {
              val apc = a(p)(cIdx); val aqc = a(q)(cIdx)
              a(p)(cIdx) = cCos * apc - sSin * aqc
              a(q)(cIdx) = sSin * apc + cCos * aqc
              cIdx += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = cCos * vrp - sSin * vrq
              v(r)(q) = sSin * vrp + cCos * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Project a vector column under a fitted [[PcaModel]]:
    * `out_j = Σ_i (v[i] − μ[i])·W[j][i]`, computed as `vW − μW` with the
    * constant offset folded in — one codegen'd map-side pass, the JL
    * expression's shape with a fitted matrix.
    */
  def pcaProject(vec: Column, model: PcaModel): Column = {
    val offset = model.components.map(row =>
      row.zip(model.mean).map { case (w, mu) => w * mu }.sum)
    Bridge.column(AffineProject(
      Bridge.expression(vec.cast(ArrayType(DoubleType))),
      model.components, offset))
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

/** Codegen'd affine projection `vW − offset` — the fitted-matrix
  * (PCA) sibling of [[JlProject]]; the model rides in the plan as a
  * reference object (k×d doubles, bounded by the model parameters).
  */
case class AffineProject(child: Expression, m: Array[Array[Double]],
    offset: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def computePublic(v: ArrayData): ArrayData = {
    val raw = Projection.matVec(m, v)
    val out = new Array[Any](offset.length)
    var j = 0
    while (j < offset.length) {
      out(j) = raw.getDouble(j) - offset(j)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = computePublic(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affproj", this, classOf[AffineProject].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computePublic($a);")
  }

  override protected def withNewChildInternal(c: Expression): AffineProject =
    copy(child = c)

  override def prettyName: String = "pca_project"
}
