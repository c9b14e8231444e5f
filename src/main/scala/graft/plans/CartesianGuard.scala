package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Planner-time guard (`SparkSessionExtensions.injectPlannerStrategy`):
  * reject condition-less inner/cross joins at physical-planning time
  * unless a side carries an explicit join hint.
  *
  * Why: at 100 TB an accidental cartesian product is not a slow query,
  * it is a cluster outage — |L|×|R| rows materialize before anyone
  * notices the missing join key. Spark's legacy `crossJoin.enabled`
  * guard was removed; this restores it as an opt-out check, placed the
  * same way Spark's old `CheckCartesianProducts` was: AFTER the
  * optimizer, right as the physical plan is chosen.
  *
  * Planning time (not analysis time — where round 3 put it) because by
  * then the plan has settled into its true shape:
  *
  *  - `PushDownPredicates` has run, so the standard comma-join form
  *    `SELECT … FROM a, b WHERE a.k = b.k` — analyzed as a Filter above
  *    a condition-less Join — has become an equi-join and is correctly
  *    waived. The same goes for `df1.join(df2).where(cond)`, which an
  *    analysis-time check rule rejects at `.join()` before `.where` can
  *    even attach.
  *  - `EliminateResolvedHint` has folded every `broadcast(df)` (and
  *    any other join-strategy hint) into the adjacent Join's
  *    `JoinHint`, using Spark's own hint-propagation traversal — so
  *    the guard waives exactly the joins Spark itself treats as
  *    hinted, with no hand-rolled spine walk to keep in sync. A hint
  *    buried in a NESTED join attaches to that join, not this one, so
  *    `big1.join(broadcast(dim), k).crossJoin(big2)` still trips.
  *
  * Deliberate tiny crosses stay expressible — every legitimate pattern
  * in this engine (`crossJoin(broadcast(scalarAgg))` in q17/q18/p12)
  * carries a broadcast hint, which is exactly the "I know this side is
  * small" signal. Escape hatch for everything else:
  * `SET graft.guard.allowCartesian=true`.
  *
  * The strategy never plans anything (returns Nil) — it only inspects
  * each logical subtree the planner visits and throws on a violation,
  * so join selection itself is untouched.
  */
case class CartesianGuard(session: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = {
    if (!SQLConf.get.getConfString(CartesianGuard.allowKey, "false").toBoolean) {
      plan match {
        case j @ Join(_, _, Inner | Cross, None, hint)
            if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
          throw new IllegalStateException(
            s"[graft] cartesian product with no join condition and no size hint — " +
              s"at scale this materializes |left|x|right| rows. Broadcast the small " +
              s"side (crossJoin(broadcast(df))) or SET ${CartesianGuard.allowKey}=true " +
              s"if the product is intended. Join: ${j.simpleString(3)}")
        case _ => ()
      }
    }
    Nil
  }
}

object CartesianGuard {
  val allowKey = "graft.guard.allowCartesian"
}
