package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed LLM-training-data PIPELINE POLICY — the RefinedWeb/CCNet/
  * Dolma-class cleaning chain over a crawl corpus, every stage one of the
  * already-oracle-pinned operators, composed in the order real pipelines
  * run them (cheap in-row gates first so the shuffling stages see the
  * smallest possible survivor set; dedup last because it is the only
  * corpus-global stage):
  *
  *   0 ingest
  *   1 language gate        (TextAnalysis.langId: lang_pred = 'en')
  *   2 quality gate         (TextAnalysis.quality: keep flag —
  *                           n_tokens ≥ 10 ∧ ttr ≥ 100‰)
  *   3 repetition gate      (TextAnalysis.repetitionStats:
  *                           dup_tok ≤ MaxDupTokPermille ∧
  *                           top_gram ≤ MaxTopGramPermille)
  *   4 decontamination gate (TextAnalysis.decontaminate vs the eval set)
  *   5 exact dedup          (Dedup.exact: canonical keep)
  *
  * `survivors` returns the cleaned (doc_id, text) frame the chunk / pack /
  * shard stages consume; `attrition` returns the per-stage survival report
  * (stage_id, stage, n_docs) — the attrition curve is the number a
  * pipeline operator actually watches, and here it is DuckDB-replayable
  * end-to-end (oracle q_pipeline) because every gate is integer-exact.
  *
  * Scale shape: stages 1–3 are per-doc map-side gates attached by
  * doc_id-keyed semi-joins (each stat operator is itself shuffle-minimal
  * and hot-key safe — see the per-operator scaladoc); stage 4 is the
  * broadcast n-gram probe; stage 5 the hash-keyed groupBy+join dedup.
  * Nothing in the chain introduces a window, a driver collect, or a
  * skew-blind shuffle that the component operators did not already
  * document. */
object TrainingData {

  /** Gopher-class repetition ceilings, shared with the DuckDB oracle
    * (fixture distribution: dup_tok median 537‰ / max 723‰, top_gram
    * median 33‰ / max 166‰ — 600‰ is a real gate on this corpus, not a
    * pass-through). */
  val MaxDupTokPermille = 600
  val MaxTopGramPermille = 200

  /** Progressive survivor frames, one per stage (stage_id, name, frame).
    * Each frame is (doc_id, text). */
  private def stages(docs: DataFrame, bench: DataFrame,
                     spark: SparkSession): Seq[(Int, String, DataFrame)] = {
    val s1 = docs.join(
      TextAnalysis.langId(docs).filter(col("lang_pred") === "en")
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val s2 = s1.join(
      TextAnalysis.quality(s1).filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val s3 = s2.join(
      TextAnalysis.repetitionStats(s2, spark)
        .filter(col("dup_tok_permille") <= MaxDupTokPermille &&
          col("top_gram_permille") <= MaxTopGramPermille)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val s4 = TextAnalysis.decontaminate(s3, bench)
    val s5 = s4.join(
      Dedup.exact(s4).filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    Seq((0, "ingest", docs), (1, "lang", s1), (2, "quality", s2),
      (3, "repetition", s3), (4, "decontam", s4), (5, "exact_dedup", s5))
  }

  /** The cleaned corpus after the full chain. */
  def survivors(docs: DataFrame, bench: DataFrame,
                spark: SparkSession): DataFrame =
    stages(docs, bench, spark).last._3

  /** Per-stage survival report: (stage_id, stage, n_docs). */
  def attrition(docs: DataFrame, bench: DataFrame,
                spark: SparkSession): DataFrame =
    stages(docs, bench, spark).map { case (i, name, df) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i).as("stage_id"), lit(name).as("stage"), col("n_docs"))
    }.reduce(_ union _)
}
