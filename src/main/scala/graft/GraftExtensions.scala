package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{MinHashSigs, RollingHash, VecDot}

/** Session extensions for the graft engine: registers the native
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — after
  * which `expr("rolling_hash(text)")` / SQL `rolling_hash(...)` resolve
  * to the codegen'd Catalyst expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // float discipline as an optimizer guarantee, not a convention:
    // every round(avg|sum(double)) GROUP aggregate — including ones
    // users write — lowers to the order-independent decimal form
    ext.injectOptimizerRule(_ => graft.plans.StableAggRule)
    // grouped top-k: Filter(row_number <= k, Window) lowers to the
    // map-side-heap TopKPerKey operator under the window — the exchange
    // then carries k rows per key instead of every row
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sigs numPerms must be an int literal, got $other")
        }
        MinHashSigs(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(children(0), children(1))))
  }
}
