package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride along as opaque `binary` columns
  * with typed metadata; decode / feature-extract run as per-partition
  * kernels over the binary payload.
  *
  * The decode step itself is STUBBED with a deterministic fake (image/audio
  * codecs are not in this container); everything Spark-side — schema,
  * binary column flow, partition batching, kernel signature — is real and
  * oracle-tested. A production build swaps `decodeStub` for a real codec
  * behind the same `MediaMeta` contract.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       channels: Int, first_byte: Int)

  /** Attach a binary media column (here: the doc's UTF-8 bytes stand in for
    * an image payload — deterministic and size-varied). */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  /** STUB decode: deterministic pseudo-metadata derived from the payload.
    * Real codec goes here (`???` boundary); shape/batching are production. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = n % 640 + 32,
      height = (n * 7) % 480 + 32,
      channels = 3,
      first_byte = if (n > 0) bytes(0) & 0xff else -1)
  }

  /** Per-partition decode kernel: one codec init per partition (the real
    * pattern for libjpeg/ffmpeg handles), streaming over rows. */
  def decodeMeta(docs: DataFrame, spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    withMedia(docs).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() here, closed via
        // TaskContext.addTaskCompletionListener
        it.map { case (id, b) => decodeStub(id, b) }
      }
  }

  /** Fixed-stride frame sampling over a binary payload (video stand-in):
    * emits (doc_id, frame_idx, frame_off, frame_byte) — shows explode-style
    * fan-out of a media column without materializing frames on the driver. */
  def sampleFrames(docs: DataFrame, stride: Int, spark: SparkSession): DataFrame = {
    import spark.implicits._
    withMedia(docs).as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val n = if (b == null) 0 else b.length
        (0 until n by stride).zipWithIndex.map { case (off, idx) =>
          (id, idx, off, b(off) & 0xff)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_off", "frame_byte")
  }
}
