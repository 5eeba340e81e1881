package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Npy

/** S8/S9 .npy codec: write↔parse round trip, distributed scan == driver
  * load, and loud rejection of everything the parser doesn't support. */
class NpySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_npy").resolve(name).toString

  val fixture: Seq[Array[Float]] =
    (0 until 37).map(r => Array.tabulate(11)(c => (r * 31 + c).toFloat / 7f))

  test("float32 matrix round-trips bit-exactly through the v1.0 codec") {
    val p = tmp("m.npy")
    Npy.writeFloatMatrix(p, fixture)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // header contract: data section starts 64-byte aligned (numpy's own
    // writer guarantees this for mmap friendliness)
    assert(bytes.length % 4 == 0)
    val got = Npy.loadMatrix(p)
    assert(got.length == 37 && got.head.length == 11)
    for (r <- fixture.indices; c <- fixture(r).indices)
      assert(got(r)(c) == fixture(r)(c).toDouble, s"($r,$c)")
  }

  test("distributed scan == driver-side load, with stable row indexing") {
    val p = tmp("m.npy")
    Npy.writeFloatMatrix(p, fixture)
    val rows = Npy.scan(spark, p)
      .orderBy("row_idx").collect()
    assert(rows.length == 37)
    val driver = Npy.loadMatrix(p)
    rows.foreach { row =>
      val r = row.getLong(1).toInt
      assert(row.getSeq[Double](2).toArray.sameElements(driver(r)), s"row $r")
    }
  }

  test("float64 payloads parse; 1-D shape becomes a single row") {
    // hand-build a tiny <f8 1-D blob (the writer only emits <f4 — the
    // parser must accept both, like numpy.load does)
    val header = "{'descr': '<f8', 'fortran_order': False, 'shape': (3,), }"
    val pad = (64 - (10 + header.length + 1) % 64) % 64
    val h = header + (" " * pad) + "\n"
    val buf = java.nio.ByteBuffer.allocate(10 + h.length + 3 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes("ASCII"))
      .put(1.toByte).put(0.toByte).putShort(h.length.toShort)
      .put(h.getBytes("ASCII"))
    Seq(1.5, -2.25, 3.0).foreach(buf.putDouble)
    val (shape, flat) = Npy.parseMatrix(buf.array())
    assert(shape == Seq(3))
    assert(flat.toSeq == Seq(1.5, -2.25, 3.0))
  }

  test("bad magic, fortran order, and truncated payloads fail loudly") {
    val p = tmp("m.npy")
    Npy.writeFloatMatrix(p, fixture)
    val good = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    intercept[IllegalArgumentException](Npy.parseMatrix("PKgarbage".getBytes))
    val fortran = new String(good.take(200), "ISO-8859-1")
      .replace("False", "True ").getBytes("ISO-8859-1") ++ good.drop(200)
    intercept[IllegalArgumentException](Npy.parseMatrix(fortran))
    intercept[IllegalArgumentException](Npy.parseMatrix(good.dropRight(8)))
  }
}
