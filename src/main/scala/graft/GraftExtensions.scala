package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.RollingHash

/** Session extensions for the graft engine: registers the native
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — after
  * which `expr("rolling_hash(text)")` / SQL `rolling_hash(...)` resolve
  * to the codegen'd Catalyst expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(children.head)))
  }
}
