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

  /** + near copies (first 3 tokens dropped) of docs 0..19. */
  def withNearDups(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.union(
      docs.filter(col("doc_id") < 20 && size(toks) >= 13)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(toks, lit(4), size(toks)), " ").as("text")))
  }
}
