package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster resolution: pair lists → connected
  * components → one representative per cluster (the step a
  * training-data dedup pipeline needs AFTER p6/p9's candidate pairs —
  * transitively, if A≈B and B≈C then A, B, C deduplicate together even
  * when A≈C was never emitted).
  *
  * Algorithm: min-label propagation WITH pointer doubling. Every
  * vertex starts labeled with itself; each round it (a) takes the
  * minimum of its own label and its neighbors' labels, then (b)
  * follows the label pointer once (lbl := lbl(lbl)) — path
  * compression, the Hash-to-Min idea. Labels only decrease and every
  * label is itself a vertex id of the component, so at fixpoint every
  * vertex carries the component's minimum id. Step (a) alone needs
  * O(diameter) rounds — a 60-edge chain took 60 rounds (measured:
  * tens of seconds of job overhead on tiny data); (b) halves the
  * remaining pointer depth each round, so rounds = O(log diameter)
  * at the cost of one extra equi-join per round. Each round is two
  * equi-joins + one partial-aggregated groupBy — no driver-side graph
  * state, so the shape survives any corpus size.
  *
  * Round pipelining (r22, guide §1.2 — fewer passes/actions): each
  * round's action ALSO computes the NEXT round's neighbor-min over its
  * output labels. That aggregate doubles as an EXACT convergence
  * witness — min-neighbor-label == own label for every vertex ⟺
  * labels are constant per component ⟺ fixpoint (labels only ever
  * hold ids of the own component, and lbl(minVertex) ≤ minVertex, so a
  * component-constant label IS the component minimum) — so the loop
  * stops in the round that REACHES the fixpoint instead of paying one
  * more zero-change round to observe it, and round t+1 starts from a
  * precomputed neighbor-min instead of re-deriving it. Net: the same
  * three joins per round, one fewer round per convergence, and no
  * eager init checkpoint (the initial labels are the ids, so the
  * initial neighbor-min is just min(dst) per src and rides round 1's
  * job). The measured fixture effect: the real near-dup pair lists
  * (shallow clusters) converge in 1 round instead of 2 + init, at
  * ~1 s per driver-side round (CcProbe).
  *
  * `localCheckpoint` truncates the per-round lineage: without it each
  * iteration's plan embeds all previous iterations and planning cost
  * grows exponentially. Superseded checkpoint blocks are reclaimed by
  * the ContextCleaner once the previous round's Dataset is
  * unreachable; the live retention is O(candidate vertices) per round
  * for O(log diameter) rounds — small by construction, since the
  * vertex set is the near-dup pair list, not the corpus.
  */
object Dedup {

  /** Connected components over an undirected pair list.
    *
    * @param pairs DataFrame with two id columns (one edge per row)
    * @param a     left id column name
    * @param b     right id column name
    * @return (cluster_rep, member) — `cluster_rep` is the minimum id in
    *         the component; every id that appears in `pairs` shows up
    *         exactly once as `member`. Ids absent from `pairs` are
    *         singletons and are not emitted (their cluster is
    *         themselves). The result is backed by an already-materialized
    *         `localCheckpoint`, so it no longer depends on `pairs`'
    *         lineage — a caller that persisted `pairs` should unpersist
    *         it as soon as this returns.
    */
  def connectedComponents(pairs: DataFrame, a: String, b: String): DataFrame =
    connectedComponentsWithRounds(pairs, a, b)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took to converge — the observable behind the O(log diameter)
    * claim, measured by DedupScaleSpec and the ScaleSmoke curve. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, a: String, b: String): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    // the pair list is tiny relative to the corpus by construction
    // (near-dups are the exception, not the rule), but each round is
    // several shuffles — let AQE coalesce them below the session
    // parallelism or every round pays full-width task overhead
    // NOTE the conf change below is session-visible for the duration of
    // the loop (RuntimeConfig has no statement scope): callers running
    // CONCURRENT queries on the same session should pass pairs through
    // `spark.newSession()` to isolate it. The single-query Verify/Bench
    // drivers run queries sequentially, so this is safe there. Restore
    // nuance: for a conf with a registered default (this one),
    // getOption returns Some(default) even when never explicitly set —
    // the public API cannot distinguish unset-with-default from
    // explicitly-set-to-default — so the finally block re-sets the same
    // VALUE the session observed before; the unset() branch only fires
    // for defaultless keys. Observable behavior round-trips either way.
    val pfKey = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    val prevPf = spark.conf.getOption(pfKey)
    spark.conf.set(pfKey, "false")
    try {
    // no distinct() on edges: duplicate edges are harmless under the
    // min() aggregation and deduping them would cost a shuffle
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
      .persist()
    var stepped: DataFrame = null // released in the finally on failure
    var doubled: DataFrame = null
    try {
    // L0 carries (v, lbl, nbr_lbl): the vertex set, the init labels
    // (the ids themselves), and the neighbor-min of that labeling —
    // which for id-labels is simply min(dst) per src, ONE lazy
    // aggregation that rides round 1's job. (The pre-r22 version eagerly
    // checkpointed a distinct() vertex list here: one extra driver
    // action per call that bought nothing — round 1 re-derived the
    // neighbor-min anyway.)
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nbr_lbl"))
      .select(col("src").as("v"), col("src").as("lbl"), col("nbr_lbl"))
    var converged = false
    var rounds = 0
    val maxRounds = 64 // >> log2(any graph); labels are monotone so a
                       // hit here still returns a refinement, not garbage
    while (!converged && rounds < maxRounds) {
      // (a) fold the neighbor-min carried from the previous round's
      // action (round 1: from L0's aggregate) into the label
      stepped = labels.select(col("v"),
        least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .persist() // the pointer-doubling self-join reads it twice
      // (b) pointer doubling: lbl := lbl(lbl). Labels are vertex ids,
      // and lbl(u) <= u, so the looked-up label can only improve ours.
      doubled = stepped
        .join(stepped.select(col("v").as("pv"), col("lbl").as("plbl")),
          stepped("lbl") === col("pv"), "left_outer")
        .select(stepped("v"),
          least(stepped("lbl"), coalesce(col("plbl"), stepped("lbl"))).as("lbl"))
        .persist() // read twice: next-round neighbor-min + the output join
      // (c) NEXT round's neighbor-min over this round's output labels,
      // computed inside the SAME action; its observe() is the EXACT
      // convergence witness (header note): 0 vertices off ⟺ fixpoint.
      // A null metric (zero rows) is an empty graph: converged trivially.
      val nbrMin = edges
        .join(doubled.select(col("v").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src")).agg(min(col("nlbl")).as("nbr_lbl"))
        .select(col("src").as("v"), col("nbr_lbl"))
      val obsName = s"cc_conv_$rounds"
      val nextObs = doubled.join(nbrMin, Seq("v"), "left_outer")
        .select(col("v"), col("lbl"), coalesce(col("nbr_lbl"), col("lbl")).as("nbr_lbl"))
        .observe(obsName, sum(when(col("nbr_lbl") =!= col("lbl"), 1L).otherwise(0L)).as("off"))
      val next = nextObs.localCheckpoint(true)
      stepped.unpersist(); stepped = null
      doubled.unpersist(); doubled = null
      val off = nextObs.queryExecution.observedMetrics.get(obsName) match {
        case Some(row) if !row.isNullAt(0) => row.getLong(0)
        case Some(_) => 0L // null sum = zero rows = empty graph
        case None => next.filter(col("nbr_lbl") =!= col("lbl")).count()
      }
      labels = next
      converged = off == 0L
      rounds += 1
    }
    (labels.select(col("lbl").as("cluster_rep"), col("v").as("member")), rounds)
    } finally {
      // release caches on EVERY exit — a job failure mid-loop would
      // otherwise leak edges (and the in-flight round's step) into a
      // long-lived session for its whole remaining lifetime
      edges.unpersist()
      if (stepped != null) stepped.unpersist()
      if (doubled != null) doubled.unpersist()
    }
    } finally prevPf match {
      case Some(v) => spark.conf.set(pfKey, v)
      case None => spark.conf.unset(pfKey)
    }
  }

  /** Survivor selection: keep the representative (minimum id) of each
    * cluster, i.e. the deduplicated id set is (all ids) minus
    * (members that are not their cluster's rep). */
  def survivors(components: DataFrame): DataFrame =
    components.filter(col("member") === col("cluster_rep"))
      .select(col("member").as("doc_id"))
}
