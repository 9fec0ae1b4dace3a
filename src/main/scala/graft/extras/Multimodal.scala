package graft.extras

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata.
  * The Spark-side plumbing — schema, partition-sized batch processing,
  * executor-local decoder state — is real; the actual codec call is a
  * STUB (`FakeDecoder`): the image/audio libraries are not in this
  * container, so the decode produces deterministic fake dimensions
  * derived from the bytes. Swap `FakeDecoder` for a JNI/javacv decoder
  * and nothing else changes.
  *
  * Scale notes: decode runs via `mapPartitions` so per-partition
  * decoder init is amortized (the Scala analog of `mapInPandas`
  * batching); keep `spark.sql.files.maxPartitionBytes` sized so one
  * partition of blobs fits executor memory; blobs over ~256 MB should
  * be pointered (path column) rather than inlined.
  */
object Multimodal {

  final case class MediaMeta(
      byteLen: Long, format: String, width: Int, height: Int, ok: Boolean)

  /** The stubbed codec — deterministic from bytes; one instance per
    * partition stands in for expensive native decoder init.
    */
  final class FakeDecoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.isEmpty)
        MediaMeta(0, "unknown", 0, 0, ok = false)
      else {
        val n = bytes.length.toLong
        val fmt = (n % 3) match {
          case 0 => "png"; case 1 => "jpg"; case _ => "webp"
        }
        MediaMeta(n, fmt, (32 + (n * 7) % 64).toInt, (32 + (n * 13) % 64).toInt,
          ok = true)
      }
    }
  }

  /** Decode a binary column into typed metadata, one decoder per
    * partition.
    */
  def decodeMeta(df: DataFrame, binaryCol: String, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val ds: Dataset[(Long, MediaMeta)] = df
      .select(col(idCol).cast("long"), col(binaryCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new FakeDecoder // init once per partition
        it.map { case (id, bytes) => (id, decoder.decode(bytes)) }
      }
    ds.select(col("_1").as(idCol),
      col("_2.byteLen").as("byte_len"), col("_2.format").as("format"),
      col("_2.width").as("width"), col("_2.height").as("height"),
      col("_2.ok").as("ok"))
  }

  /** Frame-sampling shape: explode k deterministic "frames" per blob —
    * the partition/batch shape of video frame extraction.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, idCol: String,
                   k: Int): DataFrame =
    df.select(col(idCol), octet_length(col(binaryCol)).as("byte_len"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("frame_offset", col("frame_idx") * (col("byte_len") / k).cast("long"))
}
