package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic global shuffle + shard layout — the training-data
  * materialization step (every LLM run wants its corpus in a reproducible
  * pseudo-random order, split into fixed shards, stable across reruns,
  * retries, and AQE re-planning; Spark's `rand` is none of those).
  *
  * Order and placement derive only from content: `key = md5(seed|id)`,
  * `shard = int(key[0:8]) % nShards`, `pos` = 1-based rank of `key` within
  * the shard. Re-running with the same seed reproduces the exact layout;
  * bumping the seed is a fresh epoch-level reshuffle.
  *
  * Scale shape: one hash-partitioned exchange on `shard` + a per-shard
  * sort — exactly the `repartition(shard) + sortWithinPartitions(key)`
  * layout the parquet writer wants, so the sort feeding `pos` is also the
  * write order and costs nothing extra. Shard count is a property of the
  * DATA (pick `nShards` so a shard ≈ one executor-task's worth, e.g.
  * 512 MB), which keeps the per-shard sort spillable and bounded; the md5
  * keys are uniform so shards are balanced by construction — no skew
  * handling needed.
  */
object Sharding {

  /** Epoch seed and demo shard count shared with the q_shards oracle. */
  val ShuffleSeed = "graft-shuffle-v1"
  val DemoShards = 8

  /** `df` + (shard, pos): deterministic shard assignment and 1-based
    * within-shard order. `id` must be unique per row (it is the
    * tie-break and the hash input). */
  def shuffleShards(df: DataFrame, nShards: Int, seed: String = ShuffleSeed,
                    id: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"shuffleShards: nShards must be >= 1, got $nShards")
    val keyed = df.withColumn("_key",
      md5(concat_ws("|", lit(seed), col(id)).cast("binary")))
      .withColumn("shard",
        (conv(substring(col("_key"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_key"), col(id))))
      .drop("_key")
  }
}
