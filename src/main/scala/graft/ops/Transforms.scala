package graft.ops

import org.apache.spark.sql.DataFrame

/** The reference's transformer registry (A3,
  * `/root/reference/src/mapping/customMapper.ts:27-34`: a list of
  * `Transformer: any => Student[]` applied in order, outputs
  * concatenated) re-expressed on DataFrames.
  *
  * Two composition modes, matching the two readings of the registry:
  *  - [[chain]]: transformers compose sequentially (each refines the
  *    previous output) — the shape the reference's single registered
  *    transformer actually exercises;
  *  - [[fanOut]]: each transformer sees the SAME input and outputs are
  *    union-all'd — the literal concat semantics of `transform`'s
  *    flatMap (`customMapper.ts:31-34`).
  *
  * Both stay lazy LogicalPlans: registering N transformers builds one
  * Catalyst plan, not N materializations.
  */
object Transforms {

  type Transformer = DataFrame => DataFrame

  /** Sequential composition: fold with `.transform`. */
  def chain(ts: Seq[Transformer]): Transformer =
    df => ts.foldLeft(df)((acc, t) => acc.transform(t))

  /** Parallel fan-out + union-all concat (requires union-compatible
    * outputs, resolved by column name). */
  def fanOut(ts: Seq[Transformer]): Transformer = {
    require(ts.nonEmpty, "fanOut needs at least one transformer")
    df => ts.map(t => df.transform(t)).reduce(_ unionByName _)
  }
}
