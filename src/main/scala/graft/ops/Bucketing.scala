package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketed storage — the shuffle-elimination tool for
  * repeated big⋈big joins on a stable key (pages ⋈ triples ⋈ enrichments on
  * doc_id or qid at 100 TB).
  *
  * A join between two tables bucketed on the join key with the SAME bucket
  * count needs NO Exchange: each task reads bucket i of both sides — the
  * shuffle was paid once at write time and amortizes over every subsequent
  * join, the decisive trade for tables joined more often than rewritten.
  * With `sortBy` on the key the sort is pre-paid too.
  *
  * This parquet+metastore form is the sandbox stand-in for Iceberg's
  * `bucket(N, key)` partition transform (the production layout named in
  * README's architecture notes); the plan shape — scan → SortMergeJoin with
  * zero Exchange — is identical. BucketingSpec asserts that shape.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two same-bucketed tables on `key` — zero-Exchange by layout. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
