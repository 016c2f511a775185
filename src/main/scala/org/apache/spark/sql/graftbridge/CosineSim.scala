package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity of two `array<float>` columns (the scorer
  * behind [[graft.functions.VectorOps.cosine]]).
  *
  * Lives in this `org.apache.spark.sql` subpackage because
  * `AbstractDataType` (the `inputTypes` element type) is `private[sql]` in
  * Spark 4 — same technique as [[Bridge]]. The arithmetic itself is in
  * [[graft.functions.VectorOps.cosineSimilarity]] so generated code calls a
  * plain static-shaped method.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VectorOps.cosineSimilarity(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.cosineSimilarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** [[CosineSim]]'s `array<double>` sibling for DERIVED vectors (group
  * centroids, averaged embeddings) that are computed in double and must
  * not round-trip through float before scoring. Same sequential-fold
  * exactness contract.
  */
case class CosineSimDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VectorOps.cosineSimilarityDouble(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.cosineSimilarityDouble($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimDouble =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim_d"
}
