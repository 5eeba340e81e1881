package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NumPy `.npy` tensor source/sink (SURVEY S8/S9: the reference memory-maps
  * preprocessed tensors and loads `vec.npy` word-vector matrices —
  * `GLRE+KIRE/data/loader.py:242-281`,
  * `ATLOP+KIRE/knowledge_injection_layer/kg_data_loader.py:18-58`).
  *
  * Format per the public NumPy spec (v1.0): magic `\x93NUMPY`, version
  * bytes, little-endian uint16 header length, then an ASCII Python-dict
  * header `{'descr': '<f4', 'fortran_order': False, 'shape': (N, D), }`
  * space-padded so the data section starts 64-byte aligned, then C-order
  * little-endian payload. Supported dtypes: `<f4`, `<f8`; C-order only.
  *
  * Scale notes: a single `.npy` blob is NOT splittable (no internal sync
  * markers) — `scan` parallelizes ACROSS files (one task per file via the
  * binaryFile source), which matches how the reference shards per-split
  * tensors; a >2 GB single matrix should be converted to parquet once and
  * scanned columnar after that. `loadMatrix` is the S9 driver-side path:
  * parse once, `sparkContext.broadcast` the weights to every executor. */
object Npy {

  private val Magic: Array[Byte] = 0x93.toByte +: "NUMPY".getBytes("ASCII")

  /** Write a dense float32 matrix (C-order, v1.0 header). */
  def writeFloatMatrix(path: String, rows: Seq[Array[Float]]): Unit = {
    val n = rows.size
    val d = if (n == 0) 0 else rows.head.length
    require(rows.forall(_.length == d), "ragged matrix")
    val headerDict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, $d), }"
    // pad so (magic 6 + version 2 + len 2 + header) % 64 == 0, newline-final
    val unpadded = Magic.length + 2 + 2 + headerDict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = headerDict + (" " * pad) + "\n"
    val buf = ByteBuffer.allocate(10 + header.length + n * d * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).put(1.toByte).put(0.toByte)
      .putShort(header.length.toShort)
      .put(header.getBytes("ASCII"))
    rows.foreach(r => r.foreach(buf.putFloat))
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  /** Parse an `.npy` blob → (shape, row-major float64 values). Accepts
    * `<f4`/`<f8`, C-order, 1-D or 2-D. Fails loudly on anything else —
    * silently misreading a tensor is worse than rejecting it. */
  def parseMatrix(bytes: Array[Byte]): (Seq[Int], Array[Double]) = {
    require(bytes.length >= 10 && bytes.take(6).sameElements(Magic),
      "not an .npy file (bad magic)")
    val major = bytes(6)
    require(major == 1 || major == 2, s"unsupported .npy version $major")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (headerLen, headerOff) =
      if (major == 1) ((buf.getShort(8) & 0xffff), 10)
      else (buf.getInt(8), 12)
    val header = new String(bytes, headerOff, headerLen, "ASCII")
    def field(k: String): String = {
      val i = header.indexOf(s"'$k':")
      require(i >= 0, s".npy header missing '$k': $header")
      header.substring(i + k.length + 3).dropWhile(c => c == ' ')
    }
    val descr = field("descr").dropWhile(_ == '\'').takeWhile(_ != '\'')
    require(descr == "<f4" || descr == "<f8", s"unsupported dtype $descr")
    require(field("fortran_order").startsWith("False"),
      "fortran-order tensors unsupported (C-order only)")
    val shape = field("shape").dropWhile(_ == '(').takeWhile(_ != ')')
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    require(shape.nonEmpty && shape.size <= 2 && shape.forall(_ >= 0),
      s"unsupported shape $shape")
    // Long product: an Int overflow on a hostile/corrupt shape would wrap
    // (e.g. 65536×65536 → 0), pass the truncation check, and hand the
    // caller a plausible all-zeros matrix instead of failing loudly
    val countL = shape.foldLeft(1L)(_ * _)
    require(countL >= 0 && countL <= Int.MaxValue.toLong,
      s".npy shape too large or invalid: $shape")
    val count = countL.toInt
    val width = if (descr == "<f4") 4 else 8
    val dataOff = headerOff + headerLen
    require(bytes.length - dataOff >= count.toLong * width,
      s".npy payload truncated: need ${count.toLong * width}, have ${bytes.length - dataOff}")
    val out = new Array[Double](count)
    var i = 0
    while (i < count) {
      out(i) = if (width == 4) buf.getFloat(dataOff + i * 4).toDouble
               else buf.getDouble(dataOff + i * 8)
      i += 1
    }
    (shape, out)
  }

  /** S9 driver-side path: parse one matrix for `sparkContext.broadcast`. */
  def loadMatrix(path: String): Array[Array[Double]] = {
    val (shape, flat) = parseMatrix(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val (n, d) = if (shape.size == 2) (shape(0), shape(1)) else (1, shape(0))
    Array.tabulate(n)(r => java.util.Arrays.copyOfRange(flat, r * d, (r + 1) * d))
  }

  /** Distributed S8 scan: every `.npy` under `pathGlob` → rows
    * (file, row_idx, vector). One task per file (the format is unsplittable);
    * row_idx is the 0-based row within its file. */
  def scan(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val (shape, flat) = parseMatrix(bytes)
        val (n, d) = if (shape.size == 2) (shape(0), shape(1)) else (1, shape(0))
        (0 until n).iterator.map(r =>
          (path, r.toLong, flat.slice(r * d, (r + 1) * d)))
      }
      .toDF("file", "row_idx", "vector")
  }
}
