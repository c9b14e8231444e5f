package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 B.7, charter): media payloads
  * as opaque `binary` columns with typed metadata, and a
  * decode/feature-extract stage whose *Spark plumbing* — schema,
  * partition-preserving batch iteration, output shape — is real while
  * the codec itself is a clearly-marked deterministic stub (no
  * image/audio libraries ship in this environment).
  *
  * At 100 TB the shape matters: media bytes never pass through a
  * shuffle (decode is a narrow mapPartitions over the scan), features
  * are small fixed-width arrays, and metadata stays in a map column so
  * schema evolution doesn't rewrite payloads.
  */
object Multimodal {

  /** Media record: opaque payload + typed metadata. */
  final case class Media(doc_id: Long, media: Array[Byte], mime: String)

  /** Extracted features: byte length + fixed-width float vector. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  /** Wrap a text table into media rows (utf8 bytes stand in for image/
    * audio payloads; in production this column comes from the real
    * binary source). */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("mime"))

  /** STUB DECODER — stands in for image decode / resize / frame
    * sampling. Deterministic: feature i = byte at position (i*31 mod
    * len) scaled to [0,1). Replace the body with a real codec; keep
    * the signature and the mapPartitions batch shape. */
  private def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null || bytes.isEmpty) Array.fill(dim)(0.0f)
    else Array.tabulate(dim)(i => (bytes((i * 31) % bytes.length) & 0xff) / 256.0f)
  }

  /** Decode + feature-extract over media rows. `mapPartitions` (not a
    * per-row UDF) so a real codec can amortize per-partition init
    * (model load, decoder context) exactly like `mapInPandas` batches. */
  def extractFeatures(media: DataFrame, dim: Int = 8)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (decoder context, model)
        rows.map { case (id, bytes) =>
          MediaFeatures(id, if (bytes == null) 0 else bytes.length, stubDecode(bytes, dim))
        }
      }
  }

  /** Resize stub: nearest-neighbor downsample of the payload to at
    * most `targetBytes` (stands in for image resize — the payload
    * shrinks IN PLACE before any shuffle or feature pass, which is the
    * property that matters at scale: resize-early turns a 100 TB media
    * scan into a few-TB feature pipeline). Deterministic; payloads
    * already at or under the target pass through untouched. */
  def resize(media: DataFrame, targetBytes: Int = 256)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, mime) =>
          val out =
            if (bytes == null || bytes.length <= targetBytes) bytes
            else Array.tabulate(targetBytes)(i =>
              bytes(((i.toLong * bytes.length) / targetBytes).toInt))
          (id, out, mime)
        }
      }
      .toDF("doc_id", "media", "mime")
  }

  /** Frame sampling stub: every k-th fixed-size chunk of the payload
    * (stands in for video frame extraction; preserves the
    * one-in→many-out generator shape via flatMap). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, everyK: Int = 4)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(frameBytes).zipWithIndex
          .filter(_._2 % everyK == 0)
          .map { case (chunk, idx) => (id, idx, chunk) }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }
}
