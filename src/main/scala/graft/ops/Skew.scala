package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew handling for Zipfian keys (north_star: "salted repartitioning on
  * head entities like common domains to defeat skew").
  *
  * `saltedJoin` is semantics-preserving: hot keys on the big side get a
  * pseudo-random salt in [0, factor); the small side replicates ONLY its
  * hot rows `factor` times. Cold keys join unsalted (salt 0), so the extra
  * shuffle volume is bounded by factor × |hot small rows|.
  *
  * Hot keys come from a frequency pre-aggregation (`hotKeys`) — at scale
  * this is a cheap sampled groupBy maintained as a side table; AQE skew-join
  * splitting complements (but does not replace) this for joins where the
  * small side cannot be replicated.
  */
object Skew {

  /** Keys whose frequency in `df(key)` is at least `threshold`. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= threshold)
      .select(col(key))

  /** Equi-join of big ⋈ small on `key`, salted on the hot keys.
    * Row-for-row equivalent to `big.join(small, Seq(key), joinType)` for
    * joinType "inner" (default) and "left": the small side replicates its
    * hot rows to EVERY salt, so each (key, salt) bucket sees the complete
    * small row set for that key — an unmatched big row nulls out exactly as
    * in the unsalted left join.
    *
    * The (key, salt) join is pinned to a SHUFFLE (sort-merge) join: salting
    * only changes anything for shuffle joins — if either side were small
    * enough to broadcast, the broadcast join would already be skew-immune
    * and the salt pure overhead. The hint must sit directly on the join
    * input (hint resolution does not look through the internal hot-set
    * join). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 hot: DataFrame, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin preserves semantics only for inner/left, got $joinType")
    val hotSet = broadcast(hot.select(col(key)).distinct()
      .withColumn("__is_hot", lit(true)))
    val bigSalted = big.join(hotSet, Seq(key), "left")
      .withColumn("__salt",
        when(col("__is_hot"), pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
          .otherwise(lit(0)))
      .drop("__is_hot")
    val smallSalted = small.join(hotSet, Seq(key), "left")
      .withColumn("__salts",
        when(col("__is_hot"), sequence(lit(0), lit(factor - 1)))
          .otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts", "__is_hot")
    bigSalted.join(smallSalted.hint("merge"), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
