package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension installer for the engine's custom Catalyst machinery —
  * the production path: `spark.sql.extensions=graft.functions.GraftExtensions`
  * makes `rolling_hash` (and future expressions) available in every session,
  * including pure-SQL ones, without imperative registration.
  *
  * (`RollingHash.register` remains as the imperative per-session fallback
  * used by the test/driver harness.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
  }
}
