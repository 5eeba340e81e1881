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
    * under any strategy, windowed or not). */
  def globalDenseId(df: DataFrame, idName: String, order: Seq[Column]): DataFrame = {
    val pid = "_graft_pid"
    val ranged = df
      .repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
    val counts = ranged.groupBy(col(pid)).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, n) => val o = acc; acc += n; p -> o }.toMap
    val offMap = typedLit(if (offsets.isEmpty) Map(0 -> 0L) else offsets)
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
    ranged
      .withColumn(idName,
        (row_number().over(w) - 1 + coalesce(element_at(offMap, col(pid)), lit(0L))).cast("long"))
      .drop(pid)
  }
}
