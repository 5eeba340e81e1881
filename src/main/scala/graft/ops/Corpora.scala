package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus builders shared by the dedup/similarity demo queries and their
  * DuckDB oracles. The injected-duplicate variants create known exact and
  * near duplicates deterministically so dedup operators have positive
  * matches to find (the driver corpus is fully distinct).
  */
object Corpora {

  /** documents.parquet with whitespace-normalized text (extractor contract).
    * Repartitioned at ingest: the sandbox file is one row group = one split. */
  def normDocs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select(col("doc_id"),
        trim(regexp_replace(col("text"), "[ \\t\\n\\r]+", " ")).as("text"))

  /** Version token for DERIVED staged corpora (StreamingExtraction's
    * dupdocs feed): bump on any semantic change to the dup planting or the
    * normDocs normalization so stale /tmp stages invalidate. */
  val DupPlantVersion = 1

  /** + exact copies of docs 0..19 under doc_id + 1,000,000. */
  def withExactDups(docs: DataFrame): DataFrame =
    docs.union(
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

  /** embeddings table + near-copies of vec_id 0..9: the same vector with a
    * tiny deterministic perturbation on the first component, under
    * vec_id + 100000 — planted positives for embedding-cosine dedup. */
  def withEmbeddingDups(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding"))
      .union(
        embeddings.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"),
            expr("transform(embedding, (x, i) -> CAST(CASE WHEN i = 0 THEN x + 0.001 ELSE x END AS FLOAT))")
              .as("embedding")))

  /** Deterministic PII-bearing rows (planted positives for the scrubber) —
    * mirrored verbatim into the q_pii oracle CTE. */
  val piiDocs: Seq[(Long, String)] = Seq(
    (2000000L, "contact alice@example.com or bob.smith+tag@mail.co for details"),
    (2000001L, "call +1 555-123-4567 or +44 020-794-0000 now"),
    (2000002L, "server at 192.168.0.1 and 10.0.0.255 responded"),
    (2000003L, "mixed carol@corp.io on 172.16.254.3 dial +1 650-253-0000"),
    (2000004L, "no personal data in this row at all"))

  /** + the planted PII rows. */
  def withPii(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.union(piiDocs.toDF("doc_id", "text"))
  }

  /** Version token for the DERIVED incremental-split delta stage (see
    * DupPlantVersion): bump on any semantic change to `incrementalSplit`
    * or normDocs. */
  val IncrSplitVersion = 1

  /** Incremental-dedup fixture: (standing, delta). Standing snapshot =
    * docs < 250; delta = docs ≥ 250
    *   + exact copies of STANDING docs 0..9 at +1,000,000 (must be dropped
    *     by the vs-index exact level),
    *   + near copies (first 3 of ≥13 tokens dropped) of STANDING docs
    *     10..19 at +1,000,000 (should survive with near_hit = 1),
    *   + an exact copy of DELTA doc 250 at +2,000,000 (must be dropped by
    *     the within-delta first-writer-wins level). */
  def incrementalSplit(docs: DataFrame): (DataFrame, DataFrame) = {
    val toks = split(col("text"), " ")
    val standing = docs.filter(col("doc_id") < 250)
    val delta = docs.filter(col("doc_id") >= 250)
      .union(docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .union(docs.filter(col("doc_id") >= 10 && col("doc_id") < 20 && size(toks) >= 13)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(toks, lit(4), size(toks)), " ").as("text")))
      .union(docs.filter(col("doc_id") === 250)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    (standing, delta)
  }

  /** + near copies (first 3 tokens dropped) of docs 0..19. */
  def withNearDups(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.union(
      docs.filter(col("doc_id") < 20 && size(toks) >= 13)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(toks, lit(4), size(toks)), " ").as("text")))
  }
}
