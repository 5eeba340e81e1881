package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** `collect_list` with a hard buffer ceiling — the 100 TB-safe shape for
  * "bucket the members of a key, but only if the bucket is small".
  *
  * `collect_list` materializes the ENTIRE group before any downstream
  * size filter can drop it: a boilerplate fingerprint shared by 10^9
  * documents would build a 10^9-element aggregation buffer and only then
  * be discarded. This Aggregator caps the buffer at `cap + 1` elements —
  * map-side partial aggregation keeps every buffer bounded, and a group
  * that exceeds `cap` surfaces as a `cap + 1`-sized array the caller
  * filters with `size(...) <= cap` exactly as it would after
  * `collect_list` (only the group's CARDINALITY crossing the cap matters
  * for the drop decision, never which elements were retained).
  *
  * Deterministic contract: for groups of size ≤ cap the result contains
  * exactly the group's elements (order unspecified — callers sort);
  * above the cap, only `size > cap` is meaningful. */
class BoundedCollect(cap: Int) extends Aggregator[Long, Array[Long], Array[Long]]
    with Serializable {
  require(cap >= 1, "BoundedCollect: cap must be >= 1")
  private val limit = cap + 1

  // fixed-capacity buffer with a fill cursor at the end: [elems..., n]
  def zero: Array[Long] = new Array[Long](limit + 1)

  private def n(b: Array[Long]): Int = b(limit).toInt

  def reduce(b: Array[Long], x: Long): Array[Long] = {
    val k = n(b)
    if (k < limit) { b(k) = x; b(limit) = k + 1 }
    b
  }

  def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    var i = 0
    val kc = n(c)
    while (i < kc && n(a) < limit) { a(n(a)) = c(i); a(limit) = n(a) + 1; i += 1 }
    // both full beyond the cap: cardinality "> cap" is already decided
    if (i < kc) a(limit) = limit
    a
  }

  def finish(b: Array[Long]): Array[Long] = java.util.Arrays.copyOf(b, n(b))

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
