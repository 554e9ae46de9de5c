package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extensions entry point: registers graft's native expressions for
  * every session in the cluster. The standard deployment hook —
  *
  * {{{ spark.sql.extensions=graft.functions.GraftExtensions }}}
  *
  * — makes `rolling_hash(...)` available in plain SQL on executors and in
  * thrift/connect sessions alike, without per-session registration
  * (the [[org.apache.spark.sql.graft.SqlBridge.registerFunction]] path
  * remains for ad-hoc, single-session use). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash_windows"),
      new ExpressionInfo(classOf[RollingHashWindows].getName, "rolling_hash_windows"),
      (exprs: Seq[Expression]) => RollingHashWindows(exprs(0), exprs(1))))
  }
}
