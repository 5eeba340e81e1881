package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Element-wise SUM of equal-width Long vectors — the map-side-combinable
  * aggregate for "add up per-dimension integer deltas per key".
  *
  * Why it exists: summing a hub entity's gradient contributions via
  * `explode` to (key, dim, delta) + `groupBy(key, dim)` works but pays a
  * Dim× row blow-up through the shuffle, and the array-rebuild needs a
  * second aggregation. This Aggregator keeps each vector as ONE shuffle
  * row and a fixed-width buffer (`width` longs), so a key with 10^7
  * contributing rows partial-aggregates map-side into a single bounded
  * buffer — associative, commutative, partition-order exact (integer
  * addition), the same safety argument as [[BoundedCollect]].
  *
  * Width contract: all non-empty inputs must share `width`; the zero
  * buffer is empty and adopts the first vector's width, so keys with no
  * rows never materialize a vector at all.
  */
class VectorSum(width: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]]
    with Serializable {
  require(width >= 1, "VectorSum: width must be >= 1")

  def zero: Array[Long] = Array.empty[Long]

  def reduce(b: Array[Long], x: Seq[Long]): Array[Long] = {
    require(x.length == width, s"VectorSum: expected width $width, got ${x.length}")
    if (b.isEmpty) x.toArray
    else {
      var i = 0
      while (i < width) { b(i) += x(i); i += 1 }
      b
    }
  }

  def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    if (a.isEmpty) c
    else if (c.isEmpty) a
    else {
      var i = 0
      while (i < width) { a(i) += c(i); i += 1 }
      a
    }
  }

  def finish(b: Array[Long]): Seq[Long] =
    if (b.isEmpty) Seq.fill(width)(0L) else b.toSeq

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
