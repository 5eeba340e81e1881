package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's EXACT prediction decode over externally-produced
  * per-pair logit vectors — the surface that turns "a matrix of model
  * scores" into official (title, h_idx, t_idx, r) predictions:
  *
  *  - `getLabel` is ATLOP's adaptive-threshold decode
  *    (`ATLOP+KIRE/losses.py:32-42` `get_label`): class 0 is the learned
  *    threshold class TH; predicted classes are those with
  *    logit > logit(TH), intersected with the top-`numLabels` mask —
  *    topk runs over the FULL vector including TH, and the `>= kth`
  *    comparison keeps ties exactly as `torch.topk` + `>=` does.
  *  - `official` is `to_official` (`ATLOP+KIRE/evaluation.py:27-41`):
  *    one output row per non-NA predicted class, r mapped through id2rel
  *    (index i ≥ 1 → the i-th relation of the 96-vocabulary).
  *
  * This is the hook for REAL model inference at scale: a 10^12-pair logits
  * table (parquet of array<double>) decodes in one mapPartitions pass with
  * zero shuffle; the engine's deterministic scorers are a special case
  * whose logits happen to come from fixture weights. ReferenceGateSpec
  * pins the engine's extraction against a committed result.json produced
  * by THIS decode (BASELINE metric "P/R ≥ 0.95 vs reference predictions").
  */
object ReferenceDecode {

  /** `get_label` for one pair (losses.py:32-42). logits(0) = TH.
    * Returns predicted class indices (≥ 1), ascending. */
  def getLabel(logits: Array[Double], numLabels: Int = 4): Seq[Int] = {
    require(logits.length >= 1, "logit vector must include the TH class")
    val th = logits(0)
    val kth =
      if (numLabels > 0 && numLabels <= logits.length) {
        // torch.topk(logits, k)[-1]: the k-th largest value over ALL
        // classes (TH included); `>= kth` keeps ties, like the reference
        val sorted = logits.clone()
        java.util.Arrays.sort(sorted)
        sorted(logits.length - numLabels)
      } else Double.NegativeInfinity
    (1 until logits.length).filter(i => logits(i) > th && logits(i) >= kth)
  }

  /** `to_official` over a logits frame (title, h_idx, t_idx, logits):
    * one row per predicted class, r = id2rel(class). Zero-shuffle
    * mapPartitions decode. */
  def official(logitsDf: DataFrame, spark: SparkSession,
               numLabels: Int = 4): DataFrame = {
    import spark.implicits._
    val id2rel = graft.kb.DocREDVocab.relations.toArray
    logitsDf.select(col("title"), col("h_idx").cast("int"),
        col("t_idx").cast("int"), col("logits"))
      .as[(String, Int, Int, Seq[Double])]
      .flatMap { case (title, h, t, lg) =>
        getLabel(lg.toArray, numLabels).map(p => (title, h, t, id2rel(p - 1)))
      }
      .toDF("title", "h_idx", "t_idx", "r")
  }
}
