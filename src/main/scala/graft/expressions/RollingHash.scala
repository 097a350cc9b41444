package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd rolling polynomial hash over a string's UTF-8 bytes —
  * the document-fingerprint primitive (h = h*1000003 + byte, wrapping
  * int64). A Catalyst Expression rather than a UDF so it stays inside
  * whole-stage codegen: no boxing, no SerDe, vectorized scan → hash in
  * one generated loop.
  *
  * The multiplier is the CPython string-hash prime; the hash is stable
  * across JVMs (pure integer math) and suitable for shingle pre-hashing
  * or content-addressed dedup where a cryptographic digest is overkill.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Reference implementation, called from both eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }
}
