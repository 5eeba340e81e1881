package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.kb.Gazetteer

/** Relational stages of the triple-extraction pipeline, each a pure
  * DataFrame → DataFrame function so Catalyst sees one declarative plan
  * end-to-end (filter pushdown, column pruning, broadcast selection all
  * apply across stage boundaries).
  *
  * Scale notes (100 TB / 10^12 docs):
  *  - tokens/mentions/pairs are all partition-local transforms of `pages`
  *    (explode + broadcast joins) — NO shuffle until the final distinct.
  *  - the alias dictionary and rule tables are broadcast (small dims).
  *  - per-sentence pair generation is done with array HOFs inside the row,
  *    never a relational self-join, so the n·(n−1) blowup stays inside one
  *    task and never hits the shuffle.
  */
object Stages {

  /** Flat token stream: one row per token with sentence chunking.
    * Reference analog: per-doc token concatenation with offset prefix sums
    * (`ATLOP+KIRE/data/gen_kg_data.py:249-269`). */
  def tokens(pages: DataFrame): DataFrame =
    pages
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("sent_id", (col("pos") / Gazetteer.SentenceChunk).cast("int"))

  /** Broadcast alias dictionaries. */
  def aliasDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Gazetteer.aliases.toDF("alias", "qid", "prio")
  }

  def typeDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Gazetteer.entityTypes.toDF("qid", "ner_type")
  }

  def ruleDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Gazetteer.relRules.toDF("h_type", "t_type", "pred")
  }

  /** Mention detection: exact token match against the gazetteer
    * (reference: alias substring scan `ATLOP+KIRE/data/gen_coref_data.py:163-169`;
    * token-level here because the extractor guarantees space-normalized text).
    * Broadcast hash join — no shuffle. */
  def mentions(tokens: DataFrame, spark: SparkSession): DataFrame = {
    val dict = broadcast(aliasDict(spark).select("alias").distinct())
    tokens.join(dict, tokens("tok") === dict("alias"), "inner")
      .select(col("doc_id"), col("sent_id"), col("pos"), col("alias"))
  }

  /** Entity linking: two-tier dictionary probe + deterministic vote
    * (`ATLOP+KIRE/data/gen_kg_data.py:76-87,272-304`). Vote per
    * (doc, alias): support = mention count (equal across candidates of one
    * alias), so the decisive order is (prio asc, qid asc) — mirroring the
    * reference's explicit-dict-first rule and its stable-sort tie behavior.
    * All joins broadcast; the groupBy keys on (doc_id, alias) which is
    * bounded per doc — shuffle 1 (or map-side combinable). */
  def linked(mentions: DataFrame, spark: SparkSession): DataFrame = {
    val cands = mentions
      .join(broadcast(aliasDict(spark)), Seq("alias"), "inner")
    val w = Window.partitionBy("doc_id", "alias")
      .orderBy(col("prio").asc, col("qid").asc)
    val winner = cands
      .select("doc_id", "alias", "qid", "prio").distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("alias"), col("qid"))
    mentions.join(winner, Seq("doc_id", "alias"))
      .join(broadcast(typeDict(spark)), Seq("qid"))
      .select("doc_id", "sent_id", "pos", "alias", "qid", "ner_type")
  }

  /** Fast-path entity linking: the per-doc vote is doc-independent (every
    * mention of an alias carries the same candidate set — see
    * resolvedAliases), so linking is ONE broadcast hash join against the
    * pre-resolved dictionary. Result-identical to `linked` (FusedSpec pins
    * it); `linked` keeps the reference-shaped relational vote for
    * inspection and the q_linked oracle. Use THIS in production plans —
    * the vote variant embeds the mention lineage twice (join back onto its
    * own derivation), which doubles upstream UDF work. */
  def linkedFast(mentions: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dict = broadcast(resolvedAliases.toDF("alias", "qid", "ner_type"))
    mentions.join(dict, Seq("alias"))
      .select("doc_id", "sent_id", "pos", "alias", "qid", "ner_type")
  }

  /** Per-sentence entity set then ordered-pair generation (J4,
    * `ATLOP+KIRE/prepro.py:137-143`: all ordered (h,t), h≠t). The pair
    * cross-product is generated from collected per-sentence arrays — stays
    * partition-local after the per-sentence collect. */
  def pairs(linked: DataFrame): DataFrame = {
    val sentEnts = linked
      .groupBy("doc_id", "sent_id")
      .agg(array_sort(collect_set(struct(col("qid"), col("ner_type")))).as("ents"))
    sentEnts
      .select(col("doc_id"), col("sent_id"), explode(col("ents")).as("h"), col("ents"))
      .select(col("doc_id"), col("sent_id"), col("h"), explode(col("ents")).as("t"))
      .filter(col("h.qid") =!= col("t.qid"))
      .select(col("doc_id"), col("sent_id"),
        col("h.qid").as("h_qid"), col("h.ner_type").as("h_type"),
        col("t.qid").as("t_qid"), col("t.ner_type").as("t_type"))
  }

  /** Rule-based relation classification (the deterministic decode surface of
    * the scoring kernel — see RelationScorer for the featurized path with
    * identical output contract). Emits canonical distinct triples per doc. */
  def triples(pairs: DataFrame, spark: SparkSession): DataFrame =
    pairs
      .join(broadcast(ruleDict(spark)), Seq("h_type", "t_type"), "inner")
      .select(col("doc_id"), col("h_qid").as("subj"), col("pred"), col("t_qid").as("obj"))
      .distinct()

  /** End-to-end: pages → triples through the staged relational path. */
  def extractTriples(pages: DataFrame, spark: SparkSession): DataFrame =
    triples(pairs(linked(mentions(tokens(pages), spark), spark)), spark)

  // ------------------------------------------------------------ fused path

  /** Scala-side dictionary resolution. The per-doc majority vote is
    * doc-independent in the web path: every mention of an alias carries the
    * same candidate set, so the per-(doc, alias) winner is the global
    * (prio asc, qid asc) winner. Equivalence with the relational vote is
    * enforced by the shared DuckDB oracle (q_linked) and FusedSpec. */
  def resolvedAliases: Seq[(String, String, String)] = {
    val types = Gazetteer.entityTypes.toMap
    Gazetteer.aliases.groupBy(_._1).toSeq.sortBy(_._1).map { case (a, cands) =>
      val qid = cands.minBy(c => (c._3, c._2))._2
      (a, qid, types(qid))
    }
  }

  /** Fused pages → triples: all per-document work (tokenize, chunk, link,
    * pair-gen, rule classify) happens in-row via higher-order functions and
    * two literal maps baked into the plan — the final global dedup is the
    * ONLY shuffle. This is the 100 TB shape: shuffle volume is the triple
    * set, not the token stream.
    *
    * Output is identical to `extractTriples` (asserted in FusedSpec and by
    * sharing q_triples' oracle). */
  def extractTriplesFused(pages: DataFrame, spark: SparkSession): DataFrame = {
    val aliasMap = typedLit(resolvedAliases.map(r => r._1 -> (r._2 + "|" + r._3)).toMap)
    val ruleMap = typedLit(Gazetteer.relRules.map(r => (r._1 + "|" + r._2) -> r._3).toMap)
    val chunk = Gazetteer.SentenceChunk
    pages
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (size(toks) - 1) div $chunk), s -> slice(toks, s * $chunk + 1, $chunk))"
      )).as("sent"))
      .withColumn("ents", array_sort(array_distinct(
        transform(
          filter(col("sent"), t => element_at(aliasMap, t).isNotNull),
          t => element_at(aliasMap, t)))))
      .filter(size(col("ents")) >= 2)
      .withColumn("pair", explode(
        flatten(transform(col("ents"), h =>
          transform(filter(col("ents"), x => x =!= h), t => struct(h.as("h"), t.as("t")))))))
      .select(
        col("doc_id"),
        substring_index(col("pair.h"), "|", 1).as("subj"),
        element_at(ruleMap,
          concat(substring_index(col("pair.h"), "|", -1), lit("|"),
            substring_index(col("pair.t"), "|", -1))).as("pred"),
        substring_index(col("pair.t"), "|", 1).as("obj"))
      .filter(col("pred").isNotNull)
      .distinct()
  }
}
