package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF (SURVEY §2 B.8): per-group embedding centroid.
  *
  * Buffer is (per-dim double sums, row count); finish divides once —
  * the same sum-then-divide order as the SQL oracle (`SUM(v)/COUNT(*)`
  * per dimension), so results differ only by float addition order
  * (bounded by round(4) at the query edge).
  */
class VecCentroid(dim: Int) extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    val m = math.min(dim, v.length)
    while (i < m) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.fill(dim)(0.0) else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** [[VecCentroid]] over an `array<double>` column — the whitened-space
  * trainer input (p51: IVF is trained in the conditioned serving
  * metric, whose vectors are 6-dp doubles). Same buffer, same
  * sum-then-divide order; float inputs widen to double exactly, so the
  * two variants agree bit-for-bit on any float corpus. */
class VecCentroidDouble(dim: Int) extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    val m = math.min(dim, v.length)
    while (i < m) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.fill(dim)(0.0) else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
