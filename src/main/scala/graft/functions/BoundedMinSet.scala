package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** `collect_set` with a deterministic hard ceiling: the `cap` SMALLEST
  * distinct values of the group (lexicographic). The 100 TB-safe shape for
  * per-entity one-hop neighbor sets — a hub entity (a country, "human") has
  * 10⁵–10⁷ one-hop KB neighbors, and an unbounded `collect_set` builds that
  * entire set in one aggregation buffer and carries an unboundedly wide row
  * into every downstream kernel.
  *
  * Unlike [[BoundedCollect]] (whose over-cap result is only a "> cap"
  * cardinality witness), the retained elements here are a DETERMINISTIC
  * function of the group's value set — the `cap` smallest — so downstream
  * set arithmetic (shared-neighbor intersection) is partition-invariant and
  * exactly replayable in SQL as `row_number() OVER (PARTITION BY key
  * ORDER BY value) <= cap`.
  *
  * Buffer invariant: sorted, distinct, length ≤ cap. Per-element reduce is
  * O(1) for the common hot-group case (a full buffer rejects any value ≥ its
  * max without searching); an accepted value costs one O(cap) insertion, and
  * the expected number of accepted values over n random arrivals is
  * O(cap·ln n) (record statistics), so a 10⁷-neighbor hub costs ~10⁷ O(1)
  * rejections + ~10⁴ insertions per partial buffer. Merge is a linear merge
  * of two sorted arrays, O(cap).
  *
  * Ordering note: JVM `String.compareTo` (UTF-16 code units) — identical to
  * UTF-8 byte order (Spark, DuckDB) for ASCII keys, which entity ids are. */
class BoundedMinSet(cap: Int) extends Aggregator[String, Array[String], Array[String]]
    with Serializable {
  require(cap >= 1, "BoundedMinSet: cap must be >= 1")

  def zero: Array[String] = Array.empty[String]

  def reduce(b: Array[String], x: String): Array[String] = {
    if (x == null) return b
    val n = b.length
    if (n == cap && b(n - 1).compareTo(x) <= 0) return b // full and x ≥ max
    var lo = 0; var hi = n
    while (lo < hi) { // lower-bound binary search
      val mid = (lo + hi) >>> 1
      if (b(mid).compareTo(x) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < n && b(lo) == x) return b // already present
    val out = new Array[String](math.min(n + 1, cap))
    System.arraycopy(b, 0, out, 0, lo)
    out(lo) = x
    System.arraycopy(b, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  def merge(a: Array[String], c: Array[String]): Array[String] = {
    if (c.isEmpty) return a
    if (a.isEmpty) return c
    val out = new Array[String](math.min(a.length + c.length, cap))
    var i = 0; var j = 0; var k = 0
    while (k < out.length && (i < a.length || j < c.length)) {
      val cmp =
        if (i == a.length) 1
        else if (j == c.length) -1
        else a(i).compareTo(c(j))
      if (cmp < 0) { out(k) = a(i); i += 1; k += 1 }
      else if (cmp > 0) { out(k) = c(j); j += 1; k += 1 }
      else { out(k) = a(i); i += 1; j += 1; k += 1 }
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  def finish(b: Array[String]): Array[String] = b

  def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()

  def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
