package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Alias-based coreference (the reference's deterministic coref path,
  * `ATLOP+KIRE/data/gen_coref_data.py:130-217` `get_coref_by_alias`):
  * mentions sharing a KB alias within a document corefer with prior 0.9;
  * each mention keeps its top-8 partners (W1, `gen_coref_data.py:40-41`).
  * With a constant prior the reference's score ordering is undefined, so we
  * pin the deterministic order: nearest-first, then position.
  * Entirely partition-local per document (window keyed by doc).
  */
object Coref {

  val Prior = 0.9 // gen_coref_data.py:131,198-199
  val TopPartners = 8

  /** Coref pairs from detected mentions (doc_id, sent_id, pos_start,
    * pos_end, alias) — span mentions corefer by start position:
    * (doc_id, alias, p1, p2, dist, rank, score), rank ≤ 8 per left mention. */
  def aliasCoref(mentions: DataFrame): DataFrame = {
    val m1 = mentions.select(col("doc_id"), col("alias"), col("pos_start").as("p1"))
    val m2 = mentions.select(col("doc_id"), col("alias"), col("pos_start").as("p2"))
    val w = Window.partitionBy(col("doc_id"), col("alias"), col("p1"))
      .orderBy(col("dist").asc, col("p2").asc)
    m1.join(m2, Seq("doc_id", "alias"))
      .filter(col("p1") =!= col("p2"))
      .withColumn("dist", abs(col("p1") - col("p2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopPartners)
      .withColumn("score", lit(Prior))
  }

  /** Distance-bucket histogram of coref pairs (M1 buckets over token
    * distance) — the distilled distance feature the injection layer uses. */
  def distanceHistogram(corefPairs: DataFrame): DataFrame =
    corefPairs
      .withColumn("bucket", RelationScorer.disBucketCol(col("dist")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"))
}
