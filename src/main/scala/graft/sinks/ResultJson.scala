package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** K3 — the official prediction sink: one `result.json` holding a JSON array
  * of `{title, h_idx, t_idx, r, dis, evidence}` rows keyed by VERTEX indexes
  * (`ATLOP+KIRE/evaluation.py:27-41` emits title/h_idx/t_idx/r/dis;
  * `GLRE+KIRE/data_processing/convert2result.py:41-44` adds evidence).
  *
  * Scale note: result.json is the official-submission format for a bounded
  * evaluation set (the reference writes one file from one process too), so
  * the single-file collect here is the contract, not a bottleneck — the
  * 10^12-doc production output stays in the partitioned parquet sink.
  */
object ResultJson {

  /** Official predictions from a DocRED-shaped corpus: the scoring kernel
    * run per vertex PAIR (h_idx/t_idx keys, the pre-linking surface the
    * reference emits), with dis = the pair's distance bucket and evidence =
    * its co-occurrence sentences. No co-occurrence gate — the reference's
    * to_official emits every non-NA decode over ALL ordered pairs
    * (`evaluation.py:27-41`); mapping (h_idx, t_idx) through the voted
    * entity ids reproduces the ungated kernel triples exactly. */
  def officialPredictions(docs: DataFrame, entityIds: DataFrame,
                          spark: SparkSession,
                          maxDisBucket: Int =
                            graft.pipeline.RelationScorer.MaxDisBucketDocRED)
      : DataFrame = {
    import graft.pipeline.RelationScorer
    val feats = graft.docred.DocRED.pairFeatures(docs, entityIds)
      .withColumn("doc_id", xxhash64(col("title")))
      .cache()
    val titleMap = feats.select("doc_id", "title").distinct()
    val scored = RelationScorer.score(
      feats.select(col("doc_id"),
        col("h").cast("string").as("h_qid"), col("h_type"),
        col("t").cast("string").as("t_qid"), col("t_type"),
        col("min_sent_dist"), col("n_cooc"), col("evidence")), spark,
      maxDisBucket)
    val dis = feats.select(col("doc_id"),
      col("h").cast("string").as("subj"), col("t").cast("string").as("obj"),
      RelationScorer.disBucketCol(col("min_sent_dist"), maxDisBucket).as("dis"))
    scored.join(titleMap, "doc_id")
      .join(dis, Seq("doc_id", "subj", "obj"))
      .select(col("title"), col("subj").cast("int").as("h_idx"),
        col("obj").cast("int").as("t_idx"), col("pred").as("r"),
        col("dis"), col("evidence"))
  }

  /** Write the official single-file JSON array, rows in deterministic
    * (title, h_idx, t_idx, r) order. */
  def write(preds: DataFrame, path: String): Unit = {
    val rows = preds
      .select(to_json(struct(
        col("title"), col("h_idx"), col("t_idx"), col("r"),
        col("dis"), col("evidence"))).as("j"),
        col("title"), col("h_idx"), col("t_idx"), col("r"))
      .orderBy(col("title"), col("h_idx"), col("t_idx"), col("r"))
      .select("j").collect().map(_.getString(0))
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), rows.mkString("[", ",\n", "]"))
  }

  /** Read a result.json array back (round-trip / external submissions). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(col("title"), col("h_idx").cast("int"), col("t_idx").cast("int"),
        col("r"), col("dis").cast("int"),
        col("evidence").cast("array<int>").as("evidence"))
}
