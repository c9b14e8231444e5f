package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.FloatDotProduct

/** `SparkSessionExtensions` entry point: the idiomatic way to ship the
  * engine's native Catalyst expressions to a cluster —
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`)
  * registers them at session build time on every executor-facing
  * session, replacing per-session imperative registration.
  *
  * `graft.expressions.VectorExpressions.register(spark)` remains as the
  * imperative fallback for sessions the engine did not build (tests,
  * notebooks attached to an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.DimensionBroadcast)
    ext.injectPlannerStrategy(graft.plans.CartesianGuard.apply)
  }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs.head, exprs(1))))
}
