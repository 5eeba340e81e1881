package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe global dense-id assignment.
  *
  * `row_number() over (ORDER BY …)` with no partitioning ships EVERY row to
  * one task — fine for a 30-row fixture, fatal for a web-scale vocabulary or
  * entity dictionary. The two-phase equivalent:
  *
  *   1. range-repartition by the ordering key (non-overlapping, ordered
  *      partition ranges), pass 1 counts rows per partition;
  *   2. the exclusive prefix sums of those counts (driver-side, one row per
  *      partition) broadcast as a literal map;
  *   3. pass 2 assigns id = per-partition row_number − 1 + partition offset.
  *
  * Output ids are identical to the global window (same total order), but
  * the sort and numbering run parallel across partitions; the only
  * driver-side data is #partitions integers.
  */
object DenseIds {

  /** Append `idName` = dense 0-based rank of each row in `order` order.
    * Rows must be unique under `order` (ties would make ids nondeterministic
    * under any strategy, windowed or not).
    *
    * The ranged frame is PERSISTED and materialized by the count pass:
    * `repartitionByRange` derives its boundaries by SAMPLING and Spark
    * documents the result "may not be consistent" across evaluations — if
    * pass 2 re-executed the exchange it could see different boundaries than
    * the ones pass 1's offsets were computed from, silently corrupting ids.
    * Persisting pins one physical partitioning for both passes. The cache
    * entry is dictionary-scale (the inputs here are vocabularies), but it
    * lives until released: after FULLY consuming the returned frame (write/
    * collect), call `DenseIds.releasePersisted()` — the Verify/Bench mains
    * do this between queries. (`spark.catalog.clearCache()` alone drops the
    * cached DATA but not this object's strong references to the plan trees,
    * so a long-lived session that only clears the cache still accumulates
    * one QueryExecution per id assignment.) Unpersisting earlier would let
    * pass 2 re-execute the exchange and re-open the boundary hazard this
    * persist exists to close.
    *
    * An unseen partition id in pass 2 is a hard error (raise_error), never a
    * silent offset-0 fallback. */
  def globalDenseId(df: DataFrame, idName: String, order: Seq[Column]): DataFrame = {
    val pid = "_graft_pid"
    val ranged = df
      .repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    persisted.add(ranged)
    val counts = ranged.groupBy(col(pid)).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, n) => val o = acc; acc += n; p -> o }.toMap
    val offMap = typedLit(if (offsets.isEmpty) Map(0 -> 0L) else offsets)
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
    val off = coalesce(element_at(offMap, col(pid)),
      raise_error(concat(lit("globalDenseId: partition id unseen by the count pass: "),
        col(pid).cast("string"))).cast("long"))
    ranged
      .withColumn(idName, (row_number().over(w) - 1 + off).cast("long"))
      .drop(pid)
  }

  // internal intermediates pinned by globalDenseId, releasable by callers —
  // without this, every id assignment leaks one cached dataset for the
  // session lifetime
  private val persisted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Unpersist every intermediate pinned by prior `globalDenseId` calls.
    * Safe once their outputs are fully materialized (written/collected);
    * id frames consumed AFTER release recompute and may renumber. */
  def releasePersisted(): Unit = {
    persisted.forEach(df => { df.unpersist(); () })
    persisted.clear()
  }
}
