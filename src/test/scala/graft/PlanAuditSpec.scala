package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Whole-contract plan audit: the two unconditional scale-killers —
  * a cartesian product (all-pairs shuffle explosion) and an
  * unpartitioned window (every row through one task) — must not
  * appear in ANY contract query's plan. Broadcast nested-loop joins
  * are allowed: the contract uses them only with provably tiny
  * broadcast sides (band tables, 5 query vectors, K centroids), and
  * Catalyst picks BNLJ over cartesian exactly because one side
  * broadcasts.
  *
  * Plans are inspected without writing output, which is cheap for
  * almost every query. Two caveats, accepted: p13/p14 EXECUTE their
  * iterative component rounds during plan construction (localCheckpoint
  * is eager), and only their FINAL plan over the checkpointed labels is
  * audited here — the per-round join shapes are instead covered by
  * Dedup's own specs (PipelineSpec consistency + PropertySpec
  * union-find equivalence), whose joins are plain equi-joins by
  * construction.
  */
class PlanAuditSpec extends SparkSuite {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans no cartesian product and no unpartitioned window") {
      val plan = fn(spark, sf).queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty,
        s"$name plans a cartesian product:\n${cartesian.mkString}")
      val globalWindows = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty,
        s"$name plans an unpartitioned window (single-task):\n${globalWindows.mkString}")
    }
  }
}
