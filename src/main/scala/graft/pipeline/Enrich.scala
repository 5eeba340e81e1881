package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kb.Gazetteer

/** KG enrichment joins (SURVEY J2/J3):
  *  - one-hop subgraph extraction: triples whose head OR tail is a linked
  *    document entity (`ATLOP+KIRE/data/gen_kg_data.py:370-394`)
  *  - entity-attribute fetch with default fill: description/alias fall back
  *    to label; label falls back to the entity id
  *    (`ATLOP+KIRE/data/gen_kg_data.py:578-608`)
  *
  * Scale note: in this sandbox the KB side is broadcast; at 100 TB the
  * attrs/triples tables are the big side and the join flips to a sort-merge
  * join on canonical entity id (north_star), with the doc-entity side
  * pre-partitioned by qid. The disjunctive h∈E ∪ t∈E membership is two
  * equi-joins + union — never an OR-join (which would force a nested loop).
  */
object Enrich {

  def kgTriples(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Gazetteer.kgTriples.toDF("h", "r", "t")
  }

  def kgAttrs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Gazetteer.kgAttrs.toDF("qid", "kind", "text")
  }

  /** Per-document one-hop KG subgraph: (doc_id, h, r, t) where h or t is a
    * linked entity of the doc. `excludeTypes` implements the P6 TIME-entity
    * filter (`ATLOP+KIRE/data/gen_kg_data.py:557`: TIME vertices are
    * excluded from the one-hop query). */
  def oneHop(linked: DataFrame, spark: SparkSession,
             excludeTypes: Set[String] = Set("TIME")): DataFrame = {
    val docEnts = linked
      .filter(!col("ner_type").isin(excludeTypes.toSeq: _*))
      .select(col("doc_id"), col("qid")).distinct()
    val kg = broadcast(kgTriples(spark))
    val byHead = docEnts.join(kg, docEnts("qid") === kg("h"))
      .select(col("doc_id"), col("h"), col("r"), col("t"))
    val byTail = docEnts.join(kg, docEnts("qid") === kg("t"))
      .select(col("doc_id"), col("h"), col("r"), col("t"))
    byHead.union(byTail).distinct()
  }

  /** Narrow (qid, kind, text) rows → one wide row per qid with the
    * reference's default fill applied: description/alias fall back to label,
    * label to the qid, instance_of to 'entity'. Shared by the broadcast and
    * big-KB paths. Map-side combinable groupBy — one shuffle on qid. */
  def resolvedAttrs(attrs: DataFrame): DataFrame =
    attrs.groupBy("qid").agg(
        max(when(col("kind") === "label", col("text"))).as("label_raw"),
        max(when(col("kind") === "description", col("text"))).as("desc_raw"),
        max(when(col("kind") === "instance of", col("text"))).as("inst_raw"),
        max(when(col("kind") === "alias", col("text"))).as("alias_raw"))
      .select(
        col("qid"),
        coalesce(col("label_raw"), col("qid")).as("label"),
        coalesce(col("desc_raw"), col("label_raw"), col("qid")).as("description"),
        coalesce(col("inst_raw"), lit("entity")).as("instance_of"),
        coalesce(col("alias_raw"), col("label_raw"), col("qid")).as("alias"))

  /** Entity attributes with reference default-fill, wide format:
    * (qid, label, description, instance_of, alias). Fixture-KB path: the
    * attr side is tiny, so it broadcasts. */
  def attributes(linked: DataFrame, spark: SparkSession): DataFrame = {
    val qids = linked.select(col("qid")).distinct()
    qids.join(broadcast(resolvedAttrs(kgAttrs(spark))), Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("label"), col("qid")).as("label"),
        coalesce(col("description"), col("qid")).as("description"),
        coalesce(col("instance_of"), lit("entity")).as("instance_of"),
        coalesce(col("alias"), col("qid")).as("alias"))
  }

  /** J3 at KB scale (north_star: "knowledge-injection features joined in
    * via sort-merge join on canonical entity id", with "salted
    * repartitioning on head entities"): attach attributes to a BIG
    * mention/entity table when the attr side is itself too big to broadcast
    * (the reference streams a 1.3M-attr corpus, `gen_kg_data.py:576-627`;
    * at 10^12 docs both sides are huge and qid popularity is Zipfian).
    *
    * The merge hint pins a sort-merge join — never a broadcast of the attr
    * side — and `Skew.saltedJoin` spreads the hot qids across `saltFactor`
    * shuffle partitions (the attr side replicates only its hot rows).
    *
    * LEFT join + default fill, matching `attributes`' contract exactly: a
    * KB miss (a linked qid with no attr rows — common against any real KB)
    * must arrive with label=qid / instance_of='entity', never vanish from
    * the mention table. Row-for-row equal to the broadcast path
    * (ScaleJoinSpec, including missing-qid rows).
    *
    * Measured (BENCH/BASELINE.md round 5, 16M × 10M Zipfian join): with
    * AQE on, Spark's skew-join splits the hot partition and the unsalted
    * twin ties salting; with AQE off and a 30% hub key, salting wins
    * 1.36×. Prefer AQE's handling when available — explicit salting is
    * the portable fix, and the only one when the skewed key feeds a
    * non-join operator. */
  def attachAttributesLarge(mentions: DataFrame, attrs: DataFrame,
                            hotQids: DataFrame, saltFactor: Int = 8): DataFrame =
    graft.ops.Skew.saltedJoin(
      mentions,
      // attr_alias: mention tables carry their own `alias` (surface form)
      resolvedAttrs(attrs).withColumnRenamed("alias", "attr_alias"),
      "qid", hotQids, saltFactor, joinType = "left")
      .withColumn("label", coalesce(col("label"), col("qid")))
      .withColumn("description", coalesce(col("description"), col("qid")))
      .withColumn("instance_of", coalesce(col("instance_of"), lit("entity")))
      .withColumn("attr_alias", coalesce(col("attr_alias"), col("qid")))
}
