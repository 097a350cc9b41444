package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * The composable form (a 64-term `element_at(a,i)*element_at(b,i)`
  * chain) evaluates fast but costs Catalyst dearly: every use site adds
  * 64 multiply nodes × the expression's fan-out to the plan tree, and
  * optimizer time scales with tree size (measured ~0.3-0.5s of planning
  * per ANN query). This expression is ONE tree node with the same
  * left-to-right double accumulation — bit-identical results, constant
  * planning cost, tight-loop runtime.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<double> arguments, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  /** Mismatched lengths yield NULL (not a silently truncated partial
    * product) — the same answer the unrolled element_at chain gave,
    * where element_at past the short array's end nulled the whole sum.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecDot.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.expressions.VecDot.compute($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Left-to-right double fold — the same accumulation order as the
    * unrolled Column chain and DuckDB's list_sum, so oracles stay exact.
    * Callers guarantee equal lengths (the expression returns NULL for
    * mismatches before reaching here); min() is only belt-and-braces for
    * direct library use.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
