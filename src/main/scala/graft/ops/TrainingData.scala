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
  *   4 decontamination gate (TextAnalysis.decontaminationStats vs the
  *                           eval set: contam ≥ MaxContamPermille drops)
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

  /** Decontamination gate: drop a doc when ≥ this share of its distinct
    * n-grams appears in the eval set (the GPT-3 appendix-C "clean"
    * criterion is overlap-SHARE, not an absolute hit count). The absolute
    * `DecontamMinHits` form stays available as `TextAnalysis.decontaminate`
    * (oracle q_decontam), but it is statistically degenerate for a
    * pipeline gate on a small-vocabulary corpus: measured on the 100k-doc
    * scaling corpus, a 1k-doc bench slice saturates the 3-gram space and
    * ≥3-hits marks EVERY document — the permille form keeps incidental
    * overlap passing while verbatim eval leaks (1000‰) always drop. */
  val MaxContamPermille = 500

  /** Pipeline decontam n-gram width. WIDER than the standalone
    * q_decontam demo (DecontamN = 3) on measurement: the 30-word fixture
    * vocabulary means a 1k-doc bench slice covers ~the whole 3-gram space
    * (30³ = 27k), pushing every doc's overlap SHARE past any sane
    * threshold (the 100k-doc sweep kept 1 survivor). At n = 5 the space is
    * 30⁵ ≈ 24.3M: incidental coverage ~0.6% → ~6‰ per doc, verbatim leaks
    * still 1000‰. Real pipelines run 13-grams for exactly this separation
    * (GPT-3 appendix C). */
  val PipelineDecontamN = 5

  /** Progressive survivor frames, one per stage (stage_id, name, frame).
    * Each frame is (doc_id, text).
    *
    * EVERY stage boundary is eagerly materialized (localCheckpoint): each
    * gate consumes its input frame TWICE (the frame + the stat frame it is
    * semi-joined against), so a lazy chain duplicates the upstream subtree
    * 2× per stage — 2⁵ copies of the scan by stage 5, and the attrition
    * union multiplies that again. Measured: the lazy form exploded to
    * >9,000 Spark stages (plan/codegen storm, tasks serializing on the
    * compile lock); the checkpointed form is six linear jobs. This is
    * also the production shape — a real pipeline materializes each stage
    * boundary anyway (that is where you read the attrition numbers). */
  private def stages(docs: DataFrame, bench: DataFrame,
                     spark: SparkSession): Seq[(Int, String, DataFrame)] = {
    val d0 = docs.localCheckpoint(true)
    val s1 = d0.join(
      TextAnalysis.langId(d0).filter(col("lang_pred") === "en")
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val s2 = s1.join(
      TextAnalysis.quality(s1).filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val s3 = s2.join(
      TextAnalysis.repetitionStats(s2, spark)
        .filter(col("dup_tok_permille") <= MaxDupTokPermille &&
          col("top_gram_permille") <= MaxTopGramPermille)
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val s4 = s3.join(
      TextAnalysis.decontaminationStats(s3, bench, n = PipelineDecontamN)
        .filter(col("contam_permille") >= MaxContamPermille)
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val s5 = s4.join(
      Dedup.exact(s4).filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    Seq((0, "ingest", d0), (1, "lang", s1), (2, "quality", s2),
      (3, "repetition", s3), (4, "decontam", s4), (5, "exact_dedup", s5))
  }

  /** The cleaned corpus after the full chain. */
  def survivors(docs: DataFrame, bench: DataFrame,
                spark: SparkSession): DataFrame =
    stages(docs, bench, spark).last._3

  /** Per-stage survival report: (stage_id, stage, n_docs) — counts over
    * the materialized stage boundaries, so the report costs six cached
    * counts on top of the `survivors` work it shares. */
  def attrition(docs: DataFrame, bench: DataFrame,
                spark: SparkSession): DataFrame =
    stages(docs, bench, spark).map { case (i, name, df) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i).as("stage_id"), lit(name).as("stage"), col("n_docs"))
    }.reduce(_ union _)
}
