package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The GLRE intermediate TSV ".data" codec (S2/T10): one document per line,
  *
  *   title \t sent1||sent2||… \t ⟨18-field pair chunk⟩*
  *
  * where each chunk is (writer `GLRE+KIRE/data_processing/docRedProcess.py:86-121`,
  * reader field map `GLRE+KIRE/data/reader.py:94-132`):
  *
  *   rel, dir, cross, headPosRange, tailPosRange,
  *   hIdx, hNames('||'), hTypes(':'), hStarts(':'), hEnds(':'), hSentIds(':'),
  *   tIdx, tNames, tTypes, tStarts, tEnds, tSentIds, indevTrain
  *
  * Arrays are encoded as delimiter-joined strings inside TSV cells — the
  * reference's "stringified array" codec. This module exists to prove
  * golden-ingest compatibility (FIXTURES.md F4): read(write(x)) == x.
  * Production data never takes this path (real ArrayType columns
  * throughout).
  */
object GlreTsv {

  val ChunkFields = 18

  /** P2 — drop pair rows flagged by the hypernym filter
    * (`GLRE+KIRE/data/reader.py:128-130`; flag written by
    * `filter_hypernyms.py:93-98`). */
  def dropNotInclude(docs: DataFrame): DataFrame =
    docs.withColumn("pairs",
      filter(col("pairs"), p => p.getField("rel") =!= "not_include"))

  /** P3 — drop documents left with no relation pairs
    * (`GLRE+KIRE/data/reader.py:149-159`). */
  def dropEmptyDocs(docs: DataFrame): DataFrame =
    docs.filter(size(col("pairs")) > 0)

  /** Encode: one row per document with a `pairs` array-of-struct column →
    * Dataset[String] of .data lines. */
  def write(docs: DataFrame, spark: SparkSession): DataFrame = {
    val pairCols = struct(
      col("p.rel"), col("p.dir"), col("p.cross"),
      col("p.headPosRange"), col("p.tailPosRange"),
      col("p.hIdx"), col("p.hNames"), col("p.hTypes"),
      col("p.hStarts"), col("p.hEnds"), col("p.hSentIds"),
      col("p.tIdx"), col("p.tNames"), col("p.tTypes"),
      col("p.tStarts"), col("p.tEnds"), col("p.tSentIds"),
      col("p.indevTrain"))
    docs.select(
      col("title"),
      array_join(transform(col("sents"), s => array_join(s, " ")), "||").as("text"),
      col("pairs"))
      .select(col("title"), col("text"),
        posexplode_outer(col("pairs")).as(Seq("idx", "p")))
      .withColumn("chunk", when(col("p").isNotNull, concat_ws("\t",
        col("p.rel"), col("p.dir"), col("p.cross"),
        col("p.headPosRange"), col("p.tailPosRange"),
        col("p.hIdx").cast("string"),
        array_join(col("p.hNames"), "||"),
        array_join(col("p.hTypes"), ":"),
        array_join(col("p.hStarts"), ":"),
        array_join(col("p.hEnds"), ":"),
        array_join(col("p.hSentIds"), ":"),
        col("p.tIdx").cast("string"),
        array_join(col("p.tNames"), "||"),
        array_join(col("p.tTypes"), ":"),
        array_join(col("p.tStarts"), ":"),
        array_join(col("p.tEnds"), ":"),
        array_join(col("p.tSentIds"), ":"),
        col("p.indevTrain"))))
      .groupBy("title", "text")
      // collect_list order is partition-order dependent after a shuffle —
      // carry the original pair index and sort so line content matches the
      // reference's document-order writer under ANY parallelism
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("idx"), col("chunk")))),
          s => s.getField("chunk")),
        "\t").as("chunks"))
      .select(concat_ws("\t", col("title"), col("text"),
        when(length(col("chunks")) > 0, col("chunks"))).as("line"))
  }

  /** Decode: .data lines → (title, sents, pairs) with the positional field
    * map of reader.py:94-132. */
  def read(lines: DataFrame, spark: SparkSession): DataFrame = {
    val f = split(col("line"), "\t")
    val nChunks = (size(f) - 2) / ChunkFields
    lines
      .select(
        element_at(f, 1).as("title"),
        transform(split(element_at(f, 2), "\\|\\|"), s => split(s, " ")).as("sents"),
        slice(f, lit(3), when(nChunks > 0, nChunks * ChunkFields).otherwise(lit(0))).as("rest"))
      .withColumn("nc", (size(col("rest")) / ChunkFields).cast("int"))
      .withColumn("pairs",
        // sequence(0, max(nc-1, 0)) is always well-formed; the filter drops
        // the phantom element for pair-less docs (nc = 0)
        transform(
          filter(sequence(lit(0), greatest(col("nc") - 1, lit(0))), i => i < col("nc")),
          i => {
            def fld(k: Int) = element_at(col("rest"), i * ChunkFields + k + 1)
            struct(
              fld(0).as("rel"), fld(1).as("dir"), fld(2).as("cross"),
              fld(3).as("headPosRange"), fld(4).as("tailPosRange"),
              fld(5).cast("int").as("hIdx"),
              split(fld(6), "\\|\\|").as("hNames"),
              split(fld(7), ":").as("hTypes"),
              split(fld(8), ":").as("hStarts"),
              split(fld(9), ":").as("hEnds"),
              split(fld(10), ":").as("hSentIds"),
              fld(11).cast("int").as("tIdx"),
              split(fld(12), "\\|\\|").as("tNames"),
              split(fld(13), ":").as("tTypes"),
              split(fld(14), ":").as("tStarts"),
              split(fld(15), ":").as("tEnds"),
              split(fld(16), ":").as("tSentIds"),
              fld(17).as("indevTrain"))
          }))
      .select("title", "sents", "pairs")
  }
}
