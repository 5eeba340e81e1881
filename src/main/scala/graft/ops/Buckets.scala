package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared bucket-join machinery for the candidate-pair family (LSH bands,
  * sketch buckets, fingerprint buckets): all distinct id pairs co-bucketed
  * under some key, with a hard bucket-size ceiling.
  *
  * One aggregation, pairs emitted IN-ROW — never a bucket self-join (which
  * recomputes the uncached upstream for its second branch and shuffles both
  * sides) and never `collect_list` (which materializes a degenerate
  * bucket's full membership in one on-heap agg buffer before any size
  * filter runs). [[graft.functions.BoundedCollect]] caps every partial
  * buffer at `maxDf + 1`, so an over-cap bucket surfaces as `maxDf + 1`
  * elements and is DROPPED by the size filter — the conservative-recall
  * cap semantics all three call sites had individually. */
object Buckets {

  /** `rows(keys..., id)` → `(aCol, bCol)` with aCol < bCol, both in the
    * same `keys` bucket of size in [2, maxDf]. `id` must be LONG. With
    * `dedup = true` each pair appears once; with `dedup = false` a pair
    * appears once PER shared bucket (callers that count co-occurrence
    * multiplicity, e.g. shared-fingerprint tallies).
    *
    * PRECONDITION: input rows must be distinct per (keys..., id) — every
    * current caller feeds a groupBy/distinct output. Duplicate ids within a
    * bucket would (a) count toward the BoundedCollect cap, so a bucket whose
    * DISTINCT cardinality is under maxDf could be spuriously dropped
    * (conservative — pairs are lost, never invented), and (b) produce
    * a == b rows from the sorted in-row emission; the strict `<` guard below
    * discards those, so a violating caller degrades conservatively instead
    * of emitting self-pairs. */
  def pairsWithin(rows: DataFrame, keys: Seq[String], id: String, maxDf: Int,
                  aCol: String = "doc_a", bCol: String = "doc_b",
                  dedup: Boolean = true): DataFrame = {
    val bounded = udaf(new graft.functions.BoundedCollect(maxDf))
    val pairs = rows.groupBy(keys.map(col): _*)
      .agg(bounded(col(id)).as("docs"))
      .filter(size(col("docs")).between(2, maxDf))
      .withColumn("docs", array_sort(col("docs")))
      .select(explode(expr(
        s"""flatten(transform(docs, (a, i) ->
              transform(slice(docs, i + 2, size(docs) - i - 1), b ->
                struct(a AS $aCol, b AS $bCol))))""")).as("p"))
      .select(col(s"p.$aCol").as(aCol), col(s"p.$bCol").as(bCol))
      .filter(col(aCol) < col(bCol))
    if (dedup) pairs.distinct() else pairs
  }
}
