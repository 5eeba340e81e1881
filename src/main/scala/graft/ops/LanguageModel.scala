package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-class n-gram language-model quality filter (Wenzek et al. 2020:
  * score web documents by perplexity under an LM trained on a curated
  * reference corpus; drop/bucket the worst). Re-expressed relationally:
  *
  *  - TRAIN: one pass over the reference slice builds Laplace-smoothed
  *    bigram statistics — a map-side-combinable `(prev, w)` count, its
  *    context marginal, and the vocabulary — nothing iterative.
  *  - SCORE: each corpus token (with `<s>` as the first context, OOV
  *    mapped to `<unk>`) probes the model and contributes
  *    `floor(-ln(p) * LogQuant + 0.5)` — an INTEGER number of 1e-4-nat
  *    quanta, so the per-doc sum is a BIGINT and partition-order-exact
  *    (the oracle re-derives the identical quanta in DuckDB; only the
  *    per-token `ln` of an identical double crosses engines, never an
  *    FP aggregation).
  *
  * Scale shape: the reference corpus is bounded BY DEFINITION (CCNet
  * trains on Wikipedia, not on the 100 TB crawl), so the three model
  * tables are broadcast and the corpus side is one explode + broadcast
  * probes + one doc_id-keyed partial aggregation — a single shuffle whose
  * volume is one row per document. An oversized model degrades to
  * sort-merge joins by dropping the hints; nothing else changes.
  */
object LanguageModel {

  /** Quantization: one quantum = 1e-4 nat. */
  val LogQuant = 10000

  /** Reference-slice selector shared with the q_perplexity oracle:
    * doc_id % TrainMod == 0 poses as the curated corpus. */
  val TrainMod = 7

  /** `low_quality` flag threshold in avg-NLL quanta per token (perplexity
    * e^3.6 ≈ 36.6). Measured on the synthetic corpus: avg NLL spans
    * 32.0k–37.7k quanta at sf0.01 (p95 = 36.2k) and 32.9k–37.7k at sf0.1
    * (p99 = 35.3k) — the fixture vocabulary is near-uniform, so the
    * absolute level is data-specific; 36_000 marks the worst few percent
    * at both scales (non-degenerate flag column either way). Real
    * deployments calibrate this against the reference corpus, as CCNet
    * does with its per-language percentile buckets. */
  val FlagAvgNllE4 = 36000L

  /** Smoothed bigram model of `trainDocs(text)`: (bigrams(prev, w, cbi),
    * contexts(prev, cctx), vocab(w), vtotRow(vtot)). `vtot` = |vocab| + 1
    * (`<unk>`), the Laplace denominator offset, kept as a 1-row DataFrame
    * so model building stays action-free. */
  def trainBigrams(trainDocs: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val pairs = bigramPairs(trainDocs)
    val bigrams = pairs.groupBy("prev", "w").agg(count(lit(1)).as("cbi"))
    val contexts = pairs.groupBy("prev").agg(count(lit(1)).as("cctx"))
    val vocab = pairs.select("w").distinct()
    val vtotRow = vocab.agg((count(lit(1)) + 1L).as("vtot"))
    (bigrams, contexts, vocab, vtotRow)
  }

  /** One row per token: (doc_id, prev, w) with `<s>` before the first
    * token — built in-row (no window, no self-join) and exploded. */
  private def bigramPairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """transform(toks, (w, i) ->
             struct(CASE WHEN i = 0 THEN '<s>' ELSE toks[i - 1] END AS prev,
                    w AS w))""")).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.w").as("w"))

  /** Per-document negative log-likelihood under the bigram LM trained on
    * `trainDocs`: (doc_id, n_tokens, nll_e4, avg_nll_e4, low_quality).
    * `nll_e4` is the BIGINT sum of per-token quanta; `avg_nll_e4` its
    * integer division by `n_tokens` (perplexity = e^(avg_nll_e4/1e4)). */
  def perplexityStats(docs: DataFrame, trainDocs: DataFrame,
                      flagAvgNllE4: Long = FlagAvgNllE4): DataFrame = {
    val (bigrams, contexts, vocab, vtotRow) = trainBigrams(trainDocs)
    val prevVocab = vocab.select(col("w").as("prev"), lit(1).as("prev_known"))
    val wVocab = vocab.select(col("w"), lit(1).as("w_known"))
    val mapped = bigramPairs(docs)
      .join(broadcast(prevVocab), Seq("prev"), "left")
      .join(broadcast(wVocab), Seq("w"), "left")
      .select(col("doc_id"),
        when(col("prev") === "<s>" || col("prev_known").isNotNull,
          col("prev")).otherwise(lit("<unk>")).as("prev"),
        when(col("w_known").isNotNull, col("w"))
          .otherwise(lit("<unk>")).as("w"))
    mapped
      .join(broadcast(bigrams), Seq("prev", "w"), "left")
      .join(broadcast(contexts), Seq("prev"), "left")
      .crossJoin(broadcast(vtotRow))
      .select(col("doc_id"), floor(
          -log((coalesce(col("cbi"), lit(0L)) + lit(1.0)) /
               (coalesce(col("cctx"), lit(0L)) + col("vtot")))
            * LogQuant + lit(0.5)).cast("long").as("q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("q").as("nll_e4"))
      .select(col("doc_id"), col("n_tokens"), col("nll_e4"),
        expr("nll_e4 div n_tokens").as("avg_nll_e4"),
        (expr("nll_e4 div n_tokens") > flagAvgNllE4).as("low_quality"))
  }

  /** Raw-pool slice selector for the importance-weighting demo, shared
    * with the q_importance oracle (doc_id % RawMod == 0, minus the
    * target slice). */
  val RawMod = 5

  /** DSIR-class importance weighting (Xie et al. 2023: select pretraining
    * data by how much more a TARGET-domain LM likes a document than a
    * generic RAW-pool LM). Re-expressed on the bigram model:
    * `weight_e4 = nll_raw - nll_target` — a difference of two INTEGER
    * quanta sums, so it is exact, partition-order-free, and positive
    * exactly when the target model assigns the doc higher likelihood.
    * `avg_weight_e4` divides each sum by n_tokens BEFORE subtracting
    * (both divisions are of non-negative ints — truncation and floor
    * agree, keeping Spark `div` and DuckDB `//` in lockstep).
    *
    * Scale shape: two broadcast-model probe passes over the corpus (one
    * per LM) + one doc_id-keyed equi-join of their per-doc aggregates —
    * no new shuffle classes beyond [[perplexityStats]]. */
  def importanceWeights(docs: DataFrame, targetDocs: DataFrame,
                        rawDocs: DataFrame): DataFrame = {
    val target = perplexityStats(docs, targetDocs)
      .select(col("doc_id"), col("n_tokens"),
        col("nll_e4").as("nll_target_e4"))
    val raw = perplexityStats(docs, rawDocs)
      .select(col("doc_id"), col("nll_e4").as("nll_raw_e4"))
    target.join(raw, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        col("nll_target_e4"), col("nll_raw_e4"),
        (col("nll_raw_e4") - col("nll_target_e4")).as("weight_e4"),
        (expr("nll_raw_e4 div n_tokens") - expr("nll_target_e4 div n_tokens"))
          .as("avg_weight_e4"),
        (col("nll_raw_e4") - col("nll_target_e4") > 0L).as("keep"))
  }

  /** The filter form: corpus docs with `low_quality` rows removed. */
  def perplexityFilter(docs: DataFrame, trainDocs: DataFrame,
                       flagAvgNllE4: Long = FlagAvgNllE4): DataFrame =
    docs.join(
      perplexityStats(docs, trainDocs, flagAvgNllE4)
        .filter(col("low_quality")).select("doc_id"),
      Seq("doc_id"), "left_anti")
}
