package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE / CDC apply: fold a reduced change set into a base
  * snapshot — the materialization step of the reference's CDC pipeline
  * (`/root/reference/src/customMapper.ts:12-24` emits the per-key ops;
  * applying them to a queryable table is what a consumer does next).
  * q19 replays an envelope stream to a final state; this operator is
  * the same semantics generalized to any (base, changes) pair, i.e.
  * SQL `MERGE INTO` re-expressed as one full-outer join:
  *
  *  - change op `D`: the key disappears (matched or not — deletes are
  *    idempotent, matching the reference's at-least-once delivery);
  *  - change op `U`/`I` (any non-`D`): the change's value columns win
  *    (insert-or-update — CDC upsert);
  *  - key with no change: base row passes through unchanged.
  *
  * Scale shape: ONE shuffle on the merge key (or zero when both sides
  * are bucketed on it — `Layout.bucketWrite`); the change set is
  * typically ≪ base, so AQE broadcasts it and the base is scanned, not
  * shuffled. No driver-side state, no collect.
  */
object Merge {

  /** Apply `changes` to `base` with MERGE semantics.
    *
    * @param base    snapshot; one row per `key`
    * @param changes one row per `key` (pre-reduce a CDC stream with
    *                last-image-per-key first, as q19 does), carrying
    *                `opCol` plus any subset of base's value columns. A
    *                NULL value column in a change means "not provided —
    *                keep the base value" (CDC partial images).
    * @param key     equi-merge key column present on both sides
    * @param opCol   change-operation column on `changes`: 'D' deletes,
    *                anything else upserts
    * @param partialImages when true (default), a NULL value column in a
    *                change means "not provided" and the base value
    *                survives — wire formats that send only touched
    *                columns. When false, changes carry FULL row images
    *                and their values win verbatim, NULLs included —
    *                required for last-image semantics (a full-image
    *                update that sets a nullable column to NULL must
    *                clear it, not resurrect the stale base value).
    */
  def upsert(base: DataFrame, changes: DataFrame, key: String, opCol: String,
      partialImages: Boolean = true): DataFrame = {
    val valueCols = base.columns.filter(_ != key).toSeq
    val changeCols = changes.columns.toSet
    val merged = base.alias("b").join(changes.alias("c"), Seq(key), "full_outer")
    val matched = col(s"c.$opCol").isNotNull
    merged
      .filter(!matched || col(s"c.$opCol") =!= "D")
      .select(col(key) +: valueCols.map { v =>
        if (!changeCols.contains(v)) col(s"b.$v").as(v)
        else if (partialImages) coalesce(col(s"c.$v"), col(s"b.$v")).as(v)
        else when(matched, col(s"c.$v")).otherwise(col(s"b.$v")).as(v)
      }: _*)
  }
}
