package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride along as opaque `binary` columns
  * with typed metadata; decode / feature-extract run as per-partition
  * kernels over the binary payload.
  *
  * The decode step is REAL for the two container formats a pure JVM can
  * parse without native codecs — BMP (image: width/height/bpp from the
  * DIB header) and canonical-layout WAV (audio: channels/sample-rate/
  * bits-per-sample from the fmt chunk). Payloads in neither format fall
  * back to the deterministic pseudo-metadata stub (kind = "raw"), which
  * also marks the `???` boundary where libjpeg/ffmpeg handles would plug
  * into the same per-partition kernel.
  */
object Multimodal {

  /** Typed decode result. Field semantics by kind:
    *  - "bmp": width/height in pixels, channels = bytes per pixel.
    *  - "wav": width = sample rate (Hz), height = bits per sample,
    *           channels = audio channels (the natural audio triple, mapped
    *           onto the shared schema so one frame carries both modalities).
    *  - "raw": the stub's deterministic pseudo-metadata. */
  case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int, width: Int,
                       height: Int, channels: Int, first_byte: Int)

  /** Attach a binary media column (here: the doc's UTF-8 bytes stand in for
    * an image payload — deterministic and size-varied). */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Magic + structural pins (pixel offset 54, DIB ≥ 40): the multi-byte
    * LE integers contain zero bytes, which valid UTF-8 TEXT standing in as
    * a payload can never contain — so a document starting with "BM" cannot
    * false-positive into the BMP path. */
  private def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
      i32le(b, 10) == 54 && i32le(b, 14) >= 40 // BITMAPINFOHEADER or later

  /** RIFF/WAVE/fmt magic plus the canonical PCM fmt-chunk size (16 as
    * i32 LE — three zero bytes, impossible mid-text; see isBmp). */
  private def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
      b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ' &&
      i32le(b, 16) == 16

  /** BMP DIB header: width at 18 (i32 LE), height at 22 (i32 LE — negative
    * means top-down; report magnitude), bits-per-pixel at 28 (u16 LE). */
  private def decodeBmp(id: Long, b: Array[Byte]): MediaMeta =
    MediaMeta(id, "bmp", b.length, i32le(b, 18), math.abs(i32le(b, 22)),
      math.max(u16le(b, 28) / 8, 1), b(0) & 0xff)

  /** Canonical WAV fmt chunk: channels at 22 (u16 LE), sample rate at 24
    * (i32 LE), bits per sample at 34 (u16 LE). */
  private def decodeWav(id: Long, b: Array[Byte]): MediaMeta =
    MediaMeta(id, "wav", b.length, i32le(b, 24), u16le(b, 34),
      u16le(b, 22), b(0) & 0xff)

  /** STUB decode for unrecognized payloads: deterministic pseudo-metadata.
    * Real codecs for further formats go here (`???` boundary). */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    MediaMeta(
      doc_id = id,
      kind = "raw",
      n_bytes = n,
      width = n % 640 + 32,
      height = (n * 7) % 480 + 32,
      channels = 3,
      first_byte = if (n > 0) bytes(0) & 0xff else -1)
  }

  /** Format-dispatching decode over one payload. */
  private[ops] def decodeOne(id: Long, b: Array[Byte]): MediaMeta =
    if (isBmp(b)) decodeBmp(id, b)
    else if (isWav(b)) decodeWav(id, b)
    else decodeStub(id, b)

  /** Per-partition decode kernel: one codec init per partition (the real
    * pattern for libjpeg/ffmpeg handles), streaming over rows. */
  def decodeMeta(docs: DataFrame, spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    withMedia(docs).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl for native formats: val codec = Codec.open() here,
        // closed via TaskContext.addTaskCompletionListener
        it.map { case (id, b) => decodeOne(id, b) }
      }
  }

  /** Minimal valid 24-bit BMP (zeroed pixels) — the deterministic payload
    * generator for tests and the q_media_bmp oracle. Row stride pads to a
    * 4-byte boundary per the format, so
    *   file size = 54 + ((3·width + 3) / 4 · 4) · height. */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "encodeBmp: positive dimensions only")
    val rowSize = ((3 * width + 3) / 4) * 4
    val size = 54 + rowSize * height
    val b = new Array[Byte](size)
    def put16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(off: Int, v: Int): Unit = {
      put16(off, v & 0xffff); put16(off + 2, (v >> 16) & 0xffff)
    }
    b(0) = 'B'; b(1) = 'M'
    put32(2, size)        // file size
    put32(10, 54)         // pixel-array offset
    put32(14, 40)         // BITMAPINFOHEADER
    put32(18, width)
    put32(22, height)
    put16(26, 1)          // planes
    put16(28, 24)         // bits per pixel
    put32(34, rowSize * height) // image size
    b
  }

  /** Minimal canonical 44-byte-header WAV (zeroed samples) — the audio twin
    * of `encodeBmp` for tests. */
  def encodeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
                nSamples: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bitsPerSample % 8 == 0,
      "encodeWav: positive channels/rate, byte-aligned bits")
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val b = new Array[Byte](44 + dataSize)
    def put16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(off: Int, v: Int): Unit = {
      put16(off, v & 0xffff); put16(off + 2, (v >> 16) & 0xffff)
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => b(off + i) = c }
    tag(0, "RIFF"); put32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16); put16(20, 1) // PCM
    put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * blockAlign); put16(32, blockAlign)
    put16(34, bitsPerSample)
    tag(36, "data"); put32(40, dataSize)
    b
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
