package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product of two array<long> columns — the hot
  * kernel of every cosine ranking in Similarity (exact scan, LSH and
  * IVF refinement, embedding near-dup). Replaces the
  * zip_with+aggregate HOF pair, which allocates an intermediate
  * product array and evaluates interpreted lambda frames per element,
  * with one fused primitive loop in whole-stage codegen. Long math is
  * exact, so results are bit-identical to the HOF formulation
  * (LongDotSpec). */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_dot requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LongDot.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  /** Σ a(i)·b(i) over the common prefix; null elements contribute 0
    * (vectors in this library are dense and equal-width — the prefix
    * rule only defines behavior, it never triggers). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Column API: exact integer dot product of two array<long>. */
  def longDot(a: Column, b: Column): Column =
    GraftBridge.column(LongDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
