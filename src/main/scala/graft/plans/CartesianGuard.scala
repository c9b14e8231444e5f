package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan, SHUFFLE_REPLICATE_NL}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Planner-time guard (`SparkSessionExtensions.injectPlannerStrategy`):
  * reject condition-less inner/cross joins at physical-planning time
  * unless a side carries a join hint that authorizes a product.
  *
  * Why: at 100 TB an accidental cartesian product is not a slow query,
  * it is a cluster outage — |L|×|R| rows materialize before anyone
  * notices the missing join key. Spark's legacy `crossJoin.enabled`
  * guard was removed; this restores it as an opt-out check, placed
  * after the optimizer — the effective position of Spark's old
  * `CheckCartesianProducts` optimizer-batch rule — right as the
  * physical plan is chosen.
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
  *    the guard sees exactly the hints Spark itself attaches to this
  *    join, with no hand-rolled spine walk to keep in sync. A hint
  *    buried in a NESTED join attaches to that join, not this one, so
  *    `big1.join(broadcast(dim), k).crossJoin(big2)` still trips.
  *
  * Only hints that legitimately AUTHORIZE a product waive the guard:
  * `BROADCAST` ("this side is small" — the product plans as
  * BroadcastNestedLoopJoin) and `SHUFFLE_REPLICATE_NL` (the explicit
  * cartesian opt-in). A `SHUFFLE_MERGE`/`SHUFFLE_HASH` hint on a
  * condition-less join carries no size signal — Spark's join selection
  * ignores it without equi-keys and falls back to a full
  * CartesianProduct anyway — so it falls through to the error.
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
  *
  * @param session required by the `injectPlannerStrategy` signature but
  *                intentionally unused: the escape-hatch conf is read
  *                via `SQLConf.get` at planning time, which is the
  *                per-query source of truth (and respects `SET` between
  *                executions of one session).
  */
case class CartesianGuard(session: SparkSession) extends SparkStrategy {

  private def authorizesProduct(h: Option[HintInfo]): Boolean =
    h.flatMap(_.strategy).exists(s => s == BROADCAST || s == SHUFFLE_REPLICATE_NL)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = {
    if (!SQLConf.get.getConfString(CartesianGuard.allowKey, "false").toBoolean) {
      plan match {
        case j @ Join(_, _, Inner | Cross, None, hint)
            if !authorizesProduct(hint.leftHint) && !authorizesProduct(hint.rightHint) =>
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
