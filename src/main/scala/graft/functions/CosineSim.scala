package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two ARRAY<FLOAT>
  * embedding columns in one fused pass (dot product and both norms in a
  * single loop over the unsafe array data — no intermediate arrays, no
  * boxing, no HOF lambda interpretation).
  *
  * This is the SQL-surface twin of [[graft.ops.Similarity]]'s primitive
  * kernels: the HOF form (`aggregate(zip_with(...))`) allocates a zipped
  * array per row and interprets the lambda per element, which measured
  * ~40× slower on the semantic-dedup pair stream. doGenCode emits a call
  * into the shared static kernel from inside WholeStageCodegen, so the
  * expression composes with codegen'd filters/projections without a fence.
  *
  * Semantics match the kernels: accumulate in double, dot over the common
  * prefix when lengths differ, norms over each full array, zero/NaN
  * denominator → 0.0 (never NaN). NULL in → NULL out. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.cosine($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Shared by interpreted eval and generated code. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    while (i < na) { val x = a.getFloat(i).toDouble; sa += x * x; i += 1 }
    i = n
    while (i < nb) { val y = b.getFloat(i).toDouble; sb += y * y; i += 1 }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0 || denom.isNaN) 0.0 else dot / denom
  }
}
