package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster resolution: pair lists → connected
  * components → one representative per cluster (the step a
  * training-data dedup pipeline needs AFTER p6/p9's candidate pairs —
  * transitively, if A≈B and B≈C then A, B, C deduplicate together even
  * when A≈C was never emitted).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round it takes the minimum of its own
  * label and its neighbors' labels; at fixpoint every vertex carries
  * the minimum vertex id of its component. Each round is one equi-join
  * + partial-aggregated groupBy — no driver-side graph state, so the
  * shape survives any corpus size; rounds = O(component diameter),
  * and near-dup clusters are short-diameter by construction (members
  * all overlap the same content). For adversarially long chain graphs
  * the doubling variants (large-star/small-star) drop rounds to
  * O(log n) at the cost of two joins per round — not needed here.
  *
  * `localCheckpoint` truncates the per-round lineage: without it each
  * iteration's plan embeds all previous iterations and planning cost
  * grows exponentially.
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
    *         themselves).
    */
  def connectedComponents(pairs: DataFrame, a: String, b: String): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    val maxRounds = 64 // diameter bound; labels are monotone so a hit
                       // here still returns a refinement, never garbage
    while (!converged && rounds < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("v").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src")).agg(min(col("nlbl")).as("nbr_lbl"))
        .select(col("src").as("v"), col("nbr_lbl"))
      val next = labels.join(nbrMin, Seq("v"), "left_outer")
        .select(col("v"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val changed = next.join(labels.select(col("v"), col("lbl").as("prev")), "v")
        .filter(col("lbl") < col("prev")).count()
      labels = next
      converged = changed == 0
      rounds += 1
    }
    edges.unpersist()
    labels.select(col("lbl").as("cluster_rep"), col("v").as("member"))
  }

  /** Survivor selection: keep the representative (minimum id) of each
    * cluster, i.e. the deduplicated id set is (all ids) minus
    * (members that are not their cluster's rep). */
  def survivors(components: DataFrame): DataFrame =
    components.filter(col("member") === col("cluster_rep"))
      .select(col("member").as("doc_id"))
}
