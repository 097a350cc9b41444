package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd MinHash signature bank: for a pre-hashed shingle
  * array, computes all `numPerms` permutation minima
  * `min_h((2j+3)·h + 101j+7 mod p)` in a single pass over the array.
  *
  * The composable form (`numPerms` separate `array_min(transform(...))`
  * columns) materializes one intermediate array per permutation per row
  * — 32 allocations and 32 traversals. This expression is one traversal,
  * zero allocations beyond the output, and stays inside whole-stage
  * codegen. Permutation constants match TextFns.minhash exactly, so the
  * DuckDB oracle is unchanged.
  */
case class MinHashSigs(child: Expression, numPerms: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerms > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<bigint> and numPerms > 0, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MinHashSigs.compute($c, $numPerms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  val Prime = 1000000007L

  /** Reference implementation, called from both eval and generated code. */
  def compute(hashes: ArrayData, numPerms: Int): ArrayData = {
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numPerms) {
        val v = ((2L * j + 3L) * h + (101L * j + 7L)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
