package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the latest right row whose
  * timestamp is <= (or <, when `inclusive=false`) the left timestamp,
  * per key. Spark has no ASOF primitive (SURVEY §2 B.3); the naive
  * formulation — range join + per-left-row ranking — explodes
  * quadratically per key and would be the dominant cost at 100 TB.
  *
  * This implementation is the scalable union+window form:
  *   1. tag both sides, union them (no join at all),
  *   2. one shuffle: window partitioned by key, ordered by
  *      (ts, side, tiebreak),
  *   3. `last(right_payload, ignoreNulls)` over rows unbounded
  *      preceding..current carries the most recent right image forward,
  *   4. keep left rows.
  *
  * Cost: one shuffle + one sort per key partition — O(n log n), no
  * row-count amplification, skew handled by AQE like any other window.
  * Tie semantics: among right rows with equal ts the one with the
  * greatest `rightTiebreak` wins (matches `ORDER BY ts DESC, tiebreak
  * DESC ... rn = 1` in the window-emulation oracle).
  */
object AsOf {

  /** @param left         rows to enrich (all columns preserved)
    * @param right        rows providing the as-of payload
    * @param keys         equi-join key columns (same names both sides)
    * @param leftTs       event-time column on the left
    * @param rightTs      event-time column on the right
    * @param payloadCols  right columns to carry (emitted as
    *                     `asof_<name>`, null when no match)
    * @param rightTiebreak right column breaking equal-ts ties (max wins)
    * @param inclusive    true: right.ts <= left.ts; false: strict <
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      rightTiebreak: String,
      inclusive: Boolean = true): DataFrame = {

    val reserved = Seq("__ts", "__side", "__tb", "__l", "__r", "__asof")
    require(!keys.exists(k => reserved.exists(_.equalsIgnoreCase(k))),
      s"[graft] as-of join reserves ${reserved.mkString("/")} for its bookkeeping — " +
        s"rename the colliding key column")

    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    // the tiebreak keeps its NATIVE type: a bigint cast silently nulls
    // string tiebreaks (both tie rows land in the nulls group, winner
    // arbitrary) and truncates timestamps to epoch seconds
    val tiebreakType = right.select(col(rightTiebreak)).schema.head.dataType

    val leftCols = left.columns.toSeq
    // Right rows sort before left rows at equal ts when inclusive
    // (payload visible to same-ts left rows), after them when strict.
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(leftSide).as("__side"),
        lit(null).cast(tiebreakType).as("__tb"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(payloadType).as("__r")): _*)
    // a right row with a NULL event time carries no ordering
    // information — and Spark's ascending sort puts nulls FIRST, so it
    // would otherwise sort to the partition start and its payload would
    // be carried into EVERY left row; the window-emulation oracle
    // (`right.ts <= left.ts` is false for null) matches no left row,
    // so drop it here too
    val r = right.where(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(rightSide).as("__side"),
        col(rightTiebreak).as("__tb"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        payload.as("__r")): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // getField, not col("__l.name"): a dot in a payload/left column
    // name would otherwise parse as nested access and fail resolution
    val outCols: Seq[Column] =
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c"))

    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide && col("__l").isNotNull)
      .select(outCols: _*)
  }
}
