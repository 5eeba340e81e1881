package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic training-set sampling (SURVEY P9: the reference keeps
  * NA-labelled pairs with probability `NA_NUM=0.5` during training and
  * forces at least one NA to survive when the draw would drop them all —
  * `GLRE+KIRE/nnet/trainer.py:786-794`).
  *
  * `rand(seed)` would be partition-count-dependent (Spark's rand is seeded
  * per partition), so re-execution or AQE re-planning would silently change
  * the training set. Content-hash sampling is invariant under partitioning,
  * retries, and engine: keep an NA pair iff the first 3 hex digits of
  * md5(doc_id|h|t) compare below `hexThreshold` (a 3-hex-digit string;
  * "800" = 2048/4096 ≈ the reference's 0.5). Positive pairs always pass. */
object Sampling {

  /** Requires columns doc_id, h, t, is_na. Returns the same columns,
    * filtered: all positives, NA pairs under the hash threshold, plus the
    * smallest-hash NA pair of any doc whose NA pairs were all sampled out
    * (the reference's at-least-one guarantee, per doc instead of per
    * batch — batches don't exist in the relational re-expression). */
  def downsampleNa(pairs: DataFrame, hexThreshold: String): DataFrame = {
    require(hexThreshold.length == 3 &&
      hexThreshold.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      s"hexThreshold must be 3 lowercase hex digits, got '$hexThreshold'")
    val keyed = pairs.withColumn("_h",
      substring(md5(concat_ws("|", col("doc_id"), col("h"), col("t"))
        .cast("binary")), 1, 3))
    val sampledNa = keyed.filter(col("is_na") && col("_h") < hexThreshold)
    // the rescue pair is the per-doc MIN of (_h, h, t) — a map-side-
    // combinable struct-min aggregation, not a row_number window (the
    // repo's no-sort-window-for-per-key-min discipline; struct comparison
    // is field-by-field, identical to the previous orderBy). If that min's
    // _h is under the threshold the doc has a sampled NA and the anti-join
    // drops it — same rows as the old rank-1 filter.
    val rescue = keyed.filter(col("is_na"))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("_h"), col("h"), col("t"))).as("m"))
      .filter(col("m._h") >= hexThreshold)
      .join(sampledNa.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("m.h").as("h"), col("m.t").as("t"),
        lit(true).as("is_na"), col("m._h").as("_h"))
    keyed.filter(!col("is_na"))
      .unionByName(sampledNa)
      .unionByName(rescue)
      .drop("_h")
  }

  /** Demo mixture recipe shared with the q_mixture oracle: full src0,
    * half src1, quarter src2, src3 dropped, everything else at the
    * default 750‰. */
  val MixtureRates: Map[String, Int] =
    Map("src0" -> 1000, "src1" -> 500, "src2" -> 250, "src3" -> 0)
  val MixtureDefaultPermille = 750

  /** Data-mixture sampling (source re-weighting — the "X% web, Y% code,
    * Z% reference" recipe every LLM training mix specifies): keep a row
    * with its source's permille rate, decided by content hash so the mix
    * is invariant under partitioning, retries, and engine. A row survives
    * iff `int(md5(key|id)[0:3]) < rate * 4096 / 1000` — integer arithmetic
    * on a 12-bit hash band, exactly replayable in SQL (granularity 1/4096
    * ≈ 0.24‰). Sources absent from `ratesPermille` keep `defaultPermille`.
    *
    * Scale shape: a pure map-side filter — literal-map lookup + md5 + one
    * comparison per row, zero shuffle, codegen'd end-to-end. */
  def sampleByRate(df: DataFrame, key: String, id: String,
                   ratesPermille: Map[String, Int],
                   defaultPermille: Int = 1000): DataFrame = {
    (ratesPermille.values ++ Seq(defaultPermille)).foreach(r =>
      require(r >= 0 && r <= 1000, s"sampleByRate: rate permille out of [0,1000]: $r"))
    val thresholds = ratesPermille.map { case (k, r) => k -> r * 4096 / 1000 }
    val defaultThreshold = defaultPermille * 4096 / 1000
    val thrCol =
      if (thresholds.isEmpty) lit(defaultThreshold)
      else coalesce(
        element_at(typedlit(thresholds), col(key)), lit(defaultThreshold))
    val band = conv(
      substring(md5(concat_ws("|", col(key), col(id)).cast("binary")), 1, 3),
      16, 10).cast("int")
    df.filter(band < thrCol)
  }

  /** Per-key quota sampling (domain balancing — cap the documents any one
    * source/domain contributes to a training mix): keep the `n` rows per
    * key with the smallest md5(key|id), a deterministic pseudo-random
    * choice that is invariant under partitioning, retries, and engine
    * (the same argument as [[downsampleNa]]'s content-hash keep).
    *
    * Scale shape: one shuffle on the key + a per-key sort; a hot key sorts
    * all its rows in one spillable window partition — for keys at 10^8+
    * rows, pre-filter with an approximate per-key count and a coarser hash
    * band before the exact window. */
  def capPerKey(df: DataFrame, key: String, id: String, n: Int): DataFrame = {
    require(n >= 1, s"capPerKey: n must be >= 1, got $n")
    val w = Window.partitionBy(col(key))
      .orderBy(md5(concat_ws("|", col(key), col(id)).cast("binary")), col(id))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }
}
