package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Html

/** The engine's canonical input table (BASELINE.json `input_hint`):
  *
  *   pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)
  *
  * At production scale this is an Iceberg table partitioned by
  * (bucket(url), days(warc_ts)); in this sandbox it is synthesized
  * deterministically from the driver-provided `documents.parquet` so tests,
  * the DuckDB oracle, and the bench all agree on content. No external data.
  *
  * `text` is produced by round-tripping through the HTML template +
  * extractor, which *is* the per-row byte-identity invariant: regenerating
  * text from html must reproduce the column exactly.
  */
object Pages {

  val extractUdf = udf((html: Array[Byte]) => Html.extractText(html))
  val wrapUdf = udf((text: String, title: String, lang: String) =>
    Html.wrapHtmlBytes(text, title, lang))

  /** Deterministic pages table derived from `documents.parquet` in sfDir.
    * The sandbox table is a single small row group = ONE input split, which
    * would serialize every per-doc UDF on one task — repartition up front so
    * parallelism matches the session (at production scale the Iceberg scan
    * yields thousands of splits and this is a no-op cost). */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    derive(spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism * 2))

  /** The deterministic documents→pages column derivation, shared by the
    * batch reader above and the streaming reader
    * (`graft.streaming.StreamingExtraction.pagesStream`) — stream and batch
    * must see byte-identical pages for the stream==batch pins to hold. */
  def derive(docs: DataFrame): DataFrame =
    docs
      .withColumn("url", concat(lit("https://example.org/doc/"), col("doc_id")))
      // crawl time: fixed epoch + doc_id hours — deterministic, spreads the
      // days(warc_ts) partition transform at scale
      .withColumn("warc_ts",
        expr("timestampadd(HOUR, cast(doc_id as int), timestamp'2026-01-01 00:00:00')"))
      .withColumn("html", wrapUdf(col("text"), col("url"), col("lang")))
      // the invariant: text column == extractor output over html.
      // Native Catalyst expression (codegen'd), not the ScalaUDF — same
      // semantics, pinned equal in ExpressionSpec.
      .withColumn("text", graft.functions.ExtractHtmlText(col("html")))
      .select("url", "warc_ts", "html", "text", "lang", "doc_id")
}
