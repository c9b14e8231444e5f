package graft.plans

import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule (SparkSessionExtensions `injectOptimizerRule`):
  * joins whose build side is a plain scan of a KNOWN-SMALL dimension
  * table get a broadcast hint automatically.
  *
  * Why a rule and not `broadcast()` calls: the dimension list is a
  * property of the CATALOG ("region/nation/supplier are small at any
  * scale factor"), not of each query — hand-placed hints scatter that
  * fact over every call site and silently miss new queries. Encoding
  * it once as a `Rule[LogicalPlan]` is the graduated extension path
  * from SURVEY §2 B.8: expression (`float_dot`) → optimizer rule
  * (this) → full strategy (not needed — no operator here requires a
  * custom physical node).
  *
  * Scope guards keep it safe:
  *  - only plain Project/Filter-over-scan subtrees qualify (anything
  *    with a join/agg below could be arbitrarily large);
  *  - only join sides where Spark can legally build a broadcast hash
  *    table (never the preserved side of an outer join);
  *  - existing hints on a side are left untouched.
  * AQE can still override at runtime; a wrong hint here costs a
  * broadcast of a small table, never a wrong result.
  */
object DimensionBroadcast extends Rule[LogicalPlan] {

  /** Parquet file names (table.parquet) considered broadcast-safe. */
  val dimensionFiles: Set[String] =
    graft.sources.Tables.broadcastable.map(n => s"$n.parquet")

  /** Size-gate conf key for the hint (bytes). A strategy=BROADCAST hint
    * bypasses `autoBroadcastJoinThreshold` and AQE never demotes it, so
    * the basename allowlist alone is unsafe: `supplier` grows linearly
    * with scale factor, and any unrelated file that happens to share a
    * dimension basename would be force-broadcast. The default (32 MiB
    * on-disk ≈ a few hundred MiB of rows after decompression) is far
    * below executor memory at any sane config; above it the rule stays
    * silent and Spark's own size-based join selection decides. */
  val maxBytesKey = "graft.broadcast.maxBytes"
  private def maxBytes: Long =
    conf.getConfString(maxBytesKey, (32L << 20).toString).toLong

  private def isDimScan(plan: LogicalPlan): Boolean = plan match {
    case Project(_, child) => isDimScan(child)
    case Filter(_, child) => isDimScan(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.nonEmpty &&
          fs.location.rootPaths.forall(p => dimensionFiles.contains(p.getName)) &&
          fs.sizeInBytes <= maxBytes
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, jt, _, hint) =>
      val canBuildLeft = jt match {
        case Inner | Cross | RightOuter => true
        case _ => false
      }
      val canBuildRight = jt match {
        case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
        case _ => false
      }
      val lh = if (hint.leftHint.isEmpty && canBuildLeft && isDimScan(l))
        Some(HintInfo(strategy = Some(BROADCAST))) else hint.leftHint
      val rh = if (hint.rightHint.isEmpty && canBuildRight && isDimScan(r))
        Some(HintInfo(strategy = Some(BROADCAST))) else hint.rightHint
      if ((lh eq hint.leftHint) && (rh eq hint.rightHint)) j
      else j.copy(hint = JoinHint(lh, rh))
  }
}
