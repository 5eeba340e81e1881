package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PubTator scan (S3, `GLRE+KIRE/data_processing/readers.py:16-103`):
  * the CDR/GDA biomedical format — a stateful line classifier re-expressed
  * as a stateless line-type dispatch + groupBy(pmid):
  *
  *   pmid|t|Title text          → title line
  *   pmid|a|Abstract text       → abstract line
  *   pmid \t start \t end \t name \t type \t id [\t extra]  → entity line
  *   pmid \t REL \t id1 \t id2  → relation line (4 cols)
  *
  * The reference walks the file keeping "current document" state; keying
  * every line by its leading pmid makes the parse embarrassingly parallel —
  * no state, one shuffle on pmid.
  */
object PubTator {

  def parse(lines: DataFrame, spark: SparkSession): DataFrame = {
    val l = col("line")
    val typed = lines
      .filter(length(trim(l)) > 0)
      .withColumn("pmid",
        when(l.rlike("^\\d+\\|[ta]\\|"), regexp_extract(l, "^(\\d+)\\|", 1))
          .otherwise(split(l, "\t").getItem(0)))
      .withColumn("kind",
        when(l.rlike("^\\d+\\|t\\|"), "title")
          .when(l.rlike("^\\d+\\|a\\|"), "abstract")
          .when(size(split(l, "\t")) === 4, "relation")
          .when(size(split(l, "\t")) >= 6, "entity")
          .otherwise("unknown"))
    val titles = typed.filter(col("kind") === "title")
      .select(col("pmid"), regexp_extract(l, "^\\d+\\|t\\|(.*)$", 1).as("title"))
    val abstracts = typed.filter(col("kind") === "abstract")
      .select(col("pmid"), regexp_extract(l, "^\\d+\\|a\\|(.*)$", 1).as("abstract"))
    val f = split(l, "\t")
    val entities = typed.filter(col("kind") === "entity")
      .select(col("pmid"), struct(
        f.getItem(1).cast("int").as("start"),
        f.getItem(2).cast("int").as("end"),
        f.getItem(3).as("name"),
        f.getItem(4).as("ner_type"),
        f.getItem(5).as("kb_id")).as("e"))
      .groupBy("pmid").agg(array_sort(collect_list(col("e"))).as("entities"))
    val relations = typed.filter(col("kind") === "relation")
      .select(col("pmid"), struct(
        f.getItem(1).as("rel"),
        f.getItem(2).as("id1"),
        f.getItem(3).as("id2")).as("r"))
      .groupBy("pmid").agg(array_sort(collect_list(col("r"))).as("relations"))
    titles
      .join(abstracts, Seq("pmid"), "left")
      .join(entities, Seq("pmid"), "left")
      .join(relations, Seq("pmid"), "left")
      .withColumn("entities", coalesce(col("entities"), array()))
      .withColumn("relations", coalesce(col("relations"), array()))
  }
}
