package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, ResolvedHint, UnaryNode}
import org.apache.spark.sql.internal.SQLConf

/** Analyzer CHECK rule (`SparkSessionExtensions.injectCheckRule`) — the
  * third rung of the extension ladder after the `float_dot` expression
  * and the `DimensionBroadcast` optimizer rule: reject condition-less
  * inner/cross joins at ANALYSIS time unless some side is explicitly
  * hinted.
  *
  * Why: at 100 TB an accidental cartesian product is not a slow query,
  * it is a cluster outage — |L|×|R| rows materialize before anyone
  * notices the missing join key. Spark's legacy `crossJoin.enabled`
  * guard was removed, and by the time the optimizer or AQE sees the
  * plan the query is already accepted. Failing in the analyzer names
  * the mistake at submission, when it costs nothing.
  *
  * Deliberate tiny crosses stay expressible — every legitimate pattern
  * in this engine (`crossJoin(broadcast(scalarAgg))` in q17/q18/p12)
  * carries a broadcast hint, which is exactly the "I know this side is
  * small" signal. Hints are still `ResolvedHint` nodes at check time
  * (EliminateResolvedHint runs in the optimizer), so the guard walks
  * each join side's unary spine looking for one — the same traversal
  * Spark's own hint extraction uses, so exactly the hints Spark will
  * honor at this join waive the guard. Escape hatch for everything
  * else: `SET graft.guard.allowCartesian=true`.
  */
object CartesianGuard {

  val allowKey = "graft.guard.allowCartesian"

  /** A hint counts anywhere on the join side's UNARY spine —
    * `broadcast(df)`, `broadcast(df).distinct()`, `broadcast(df)
    * .limit(k)` all carry a hint Spark's `EliminateResolvedHint
    * .extractHintsFromPlan` propagates to this join, so the guard must
    * accept exactly those (recursing through any `UnaryNode` mirrors
    * that traversal). The walk stops at binary nodes: a hint buried
    * inside a NESTED join belongs to that join and says nothing about
    * this side's size, so `big1.join(broadcast(dim), k).crossJoin(big2)`
    * still trips the guard. */
  @tailrec
  private def hinted(p: LogicalPlan): Boolean = p match {
    case _: ResolvedHint => true
    case u: UnaryNode => hinted(u.child)
    case _ => false
  }

  def check(plan: LogicalPlan): Unit = {
    if (SQLConf.get.getConfString(allowKey, "false").toBoolean) return
    plan.foreach {
      case j @ Join(l, r, Inner | Cross, None, hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
            !hinted(l) && !hinted(r) =>
        throw new IllegalStateException(
          s"[graft] cartesian product with no join condition and no size hint — " +
            s"at scale this materializes |left|x|right| rows. Broadcast the small " +
            s"side (crossJoin(broadcast(df))) or SET $allowKey=true if the product " +
            s"is intended. Join: ${j.simpleString(3)}")
      case _ => ()
    }
  }
}
