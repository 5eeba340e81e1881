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

  /** The chain's three materialization barriers (was six):
    *
    * Stages 1–3 are PER-DOCUMENT gates — langId, quality, and
    * repetitionStats each read only their own document (plus broadcast
    * constants), so the flag a doc gets on the ingested corpus is
    * identical to the flag it would get on any survivor subset, and the
    * nested stage populations are cumulative conjunctions over ONE flags
    * frame. The previous form materialized every boundary (six eager
    * checkpoints — each gate consumes its input twice, so a lazy chain
    * would duplicate the upstream subtree 2× per stage; measured >9,000
    * Spark stages lazy). Collapsing 1–3 into one flags pass keeps that
    * protection (the flags frame is the one eagerly-pinned producer) while
    * cutting the barrier count — under co-tenant load each barrier is a
    * straggler opportunity (guide §2.6), and each checkpoint rewrites the
    * surviving TEXT column to the block store.
    *
    * Stage 4's n-gram probe still runs only on the stage-1..3 survivors
    * (the corpus shrinks before the expensive explode), and stage 5 stays
    * corpus-global — their boundaries remain materialized, which is also
    * the production shape (those are the frames a real pipeline writes).
    *
    * Returns (flags, s4, s5): the per-doc flag frame
    * (doc_id, text, l_ok, q_ok, r_ok), the materialized decontam-survivor
    * frame, and the lazy dedup-survivor frame. */
  private def chain(docs: DataFrame, bench: DataFrame,
                    spark: SparkSession): (DataFrame, DataFrame, DataFrame) = {
    val d0 = docs.localCheckpoint(true)
    val flags = d0.select(col("doc_id"), col("text"))
      .join(TextAnalysis.langId(d0).select(col("doc_id"),
        (col("lang_pred") === "en").as("l_ok")), Seq("doc_id"))
      .join(TextAnalysis.quality(d0).select(col("doc_id"),
        col("keep").as("q_ok")), Seq("doc_id"))
      .join(TextAnalysis.repetitionStats(d0, spark).select(col("doc_id"),
        (col("dup_tok_permille") <= MaxDupTokPermille &&
          col("top_gram_permille") <= MaxTopGramPermille).as("r_ok")),
        Seq("doc_id"))
      .localCheckpoint(true)
    val s3 = flags.filter(col("l_ok") && col("q_ok") && col("r_ok"))
      .select("doc_id", "text")
    val s4 = s3.join(
      TextAnalysis.decontaminationStats(s3, bench, n = PipelineDecontamN)
        .filter(col("contam_permille") >= MaxContamPermille)
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val s5 = s4.join(
      Dedup.exact(s4).filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    (flags, s4, s5)
  }

  /** The cleaned corpus after the full chain (eagerly materialized — the
    * final stage boundary, same contract as before). */
  def survivors(docs: DataFrame, bench: DataFrame,
                spark: SparkSession): DataFrame =
    chain(docs, bench, spark)._3.localCheckpoint(true)

  /** Per-stage survival report: (stage_id, stage, n_docs). Stages 0–3 are
    * one conditional aggregation over the flags frame (cumulative
    * conjunctions ≡ the nested survivor populations); stages 4–5 count
    * their materialized/terminal frames. Same six rows as the
    * boundary-per-stage form — oracle q_pipeline pins it. */
  def attrition(docs: DataFrame, bench: DataFrame,
                spark: SparkSession): DataFrame = {
    val (flags, s4, s5) = chain(docs, bench, spark)
    import spark.implicits._
    val f = flags.agg(
      count(lit(1)).as("n0"),
      coalesce(sum(when(col("l_ok"), 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when(col("l_ok") && col("q_ok"), 1L).otherwise(0L)),
        lit(0L)).as("n2"),
      coalesce(sum(when(col("l_ok") && col("q_ok") && col("r_ok"), 1L)
        .otherwise(0L)), lit(0L)).as("n3")).head
    Seq((0, "ingest", f.getLong(0)), (1, "lang", f.getLong(1)),
      (2, "quality", f.getLong(2)), (3, "repetition", f.getLong(3)),
      (4, "decontam", s4.count()), (5, "exact_dedup", s5.count()))
      .toDF("stage_id", "stage", "n_docs")
  }
}
