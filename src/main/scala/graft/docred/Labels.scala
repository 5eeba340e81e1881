package graft.docred

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.kb.Gazetteer

/** Label-side reference semantics:
  *
  *  - J5 gold-label attach: generated pairs left-joined against labels,
  *    unmatched → NA (`ATLOP+KIRE/prepro.py:126-143`)
  *  - A8 multi-label one-hot fold: multiple (h,t,r) rows collapse to one
  *    boolean vector of length |relations| (`prepro.py:126-135`)
  *  - W7 coref-id ordering: entities ranked by first-mention position
  *    (`GLRE+KIRE/data/reader.py:121-146`)
  *  - W8 sentence-offset prefix sums Ls (`ATLOP+KIRE/data/gen_kg_data.py:249-255`)
  *  - P4 truncation to max sequence length with the P5 mention guard
  *    (`ATLOP+KIRE/prepro.py:159-161`, `model.py:78-93`)
  */
object Labels {

  /** Relation vocabulary for the one-hot fold: index 0 = NA, then the 96
    * public DocRED relation ids in rel2id order — the SAME vocabulary the
    * classifier (RelationScorer.relations) decodes into
    * (`ATLOP+KIRE/prepro.py:4-6` loads rel2id.json; ours is
    * graft.kb.DocREDVocab). */
  val relVocab: Seq[String] = "NA" +: graft.kb.DocREDVocab.relations

  /** J5 + A8: every ordered pair with its multi-hot label vector.
    * Output: (title, h, t, rel_ids, label_vec, is_na). Defaults to the
    * DocRED vocabulary; DWIE passes its dataset-loaded vocabulary (the
    * reference's rel2id switch, `ATLOP+KIRE/prepro.py:20-22`). */
  def labeledPairs(docs: DataFrame): DataFrame = labeledPairs(docs, relVocab)

  def labeledPairs(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val pairs = DocRED.pairs(docs)
    val labels = docs.select(col("title"), explode(col("labels")).as("l"))
      .select(col("title"), col("l.h").as("h"), col("l.t").as("t"), col("l.r").as("r"))
      .groupBy("title", "h", "t")
      .agg(array_sort(collect_set(col("r"))).as("rels"))
    val vocabArr = array(vocab.map(lit): _*)
    pairs.join(labels, Seq("title", "h", "t"), "left")
      .withColumn("rels", coalesce(col("rels"), array()))
      // loud failure on vocabulary skew: a gold relation absent from the
      // vocabulary would otherwise fold to an all-false label vector
      // (is_na=false, no class bit) — a contradictory training row nothing
      // downstream rejects
      .withColumn("rels",
        when(size(array_except(col("rels"), vocabArr)) === 0, col("rels"))
          .otherwise(raise_error(concat(
            lit("labeledPairs: gold relation(s) absent from vocabulary: "),
            array_join(array_except(col("rels"), vocabArr), ",")))
            .cast("array<string>")))
      .withColumn("is_na", size(col("rels")) === 0)
      // one-hot fold over the full vocabulary (index 0 = NA)
      .withColumn("label_vec",
        transform(vocabArr, r =>
          (r === "NA" && size(col("rels")) === 0) || array_contains(col("rels"), r)))
      .select("title", "h", "t", "rels", "label_vec", "is_na")
  }

  /** W7: coref id per entity = rank of its first mention position within the
    * doc (1-based, ties by vertex id). */
  def corefIds(docs: DataFrame): DataFrame = {
    val m = DocRED.mentions(docs)
    val firstPos = m.groupBy("title", "vertex_id")
      .agg(min(struct(col("sent_id"), col("pos_start"))).as("first"))
    val w = Window.partitionBy("title")
      .orderBy(col("first.sent_id").asc, col("first.pos_start").asc, col("vertex_id").asc)
    firstPos.withColumn("coref_id", row_number().over(w))
      .select("title", "vertex_id", "coref_id")
  }

  /** W8: per-doc sentence-offset prefix sums Ls (Ls(i) = tokens before
    * sentence i; last element = total length). Pure HOF — partition-local. */
  def sentOffsets(docs: DataFrame): DataFrame =
    docs.select(col("title"),
      expr("aggregate(sents, array(0), (acc, s) -> array_append(acc, element_at(acc, -1) + size(s)))")
        .as("ls"))

  /** P4 + P5: truncate each doc's flat token stream to maxLen and drop
    * mentions whose span starts beyond it. DWIE-shaped corpora carry
    * precomputed absolute offsets — honored when present, else derived from
    * the Ls prefix sums. Returns the kept-mention table. */
  def truncateMentions(docs: DataFrame, maxLen: Int): DataFrame = {
    val offsets = sentOffsets(docs)
    DocRED.mentions(docs)
      .join(offsets, "title")
      .withColumn("abs_start",
        coalesce(col("abs_pos_start"),
          element_at(col("ls"), col("sent_id") + 1) + col("pos_start")))
      .filter(col("abs_start") < maxLen) // P5 guard
      .drop("ls")
  }
}
