package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDR hypernym filtering — the PRODUCER of the `not_include` flag that P2
  * (`GlreTsv.dropNotInclude`) consumes.
  *
  * Reference: `GLRE+KIRE/data_processing/filter_hypernyms.py:78-98` (itself
  * an adaptation of bran's filter script). A NEGATIVE chemical–disease pair
  * (C, D) is relabeled `not_include` when the same document holds a
  * POSITIVE pair whose MeSH tree placement makes the negative a hypernym
  * shadow of it:
  *  - clause 1 (`:93-95`): a positive (C, D′) with the SAME chemical where
  *    some tree node of D is a substring of a node of D′ — D′ is a more
  *    specific descendant of D, so the negative is D generalizing a known
  *    true disease;
  *  - clause 2 (`:95-97`): a positive (C′, D) with the SAME disease where
  *    some tree node of D (the reference iterates the negative's DISEASE
  *    nodes in both clauses — mirrored verbatim) is a substring of a node
  *    of the positive's CHEMICAL C′.
  * Containment is SUBSTRING (`neg_node in pos_node`), not prefix — MeSH
  * tree numbers make these nearly equivalent, but the reference's operator
  * is `in` and the engine mirrors it exactly.
  *
  * Scale shape: both clauses are equi-joins on (doc_id, shared-entity) with
  * the substring test as a residual predicate — per-doc example counts are
  * tiny (CDR abstracts), so the join fan-out is bounded by docs × nodes,
  * never corpus². The flag set is distinct-deduped before the final
  * broadcast-friendly left anti/semi relabel.
  */
object Hypernyms {

  val PosLabel = "1:CID:2"
  val NegLabel = "1:NR:2"
  val NotInclude = "not_include" // what P2 drops downstream

  /** Relabel hypernym-shadowed negatives.
    *
    * @param examples (doc_id, label, e1, e2) — e1 = chemical id, e2 =
    *                 disease id, label ∈ {PosLabel, NegLabel, ...}; rows
    *                 with other labels pass through untouched.
    * @param mesh     (tree_node, ent) — the MeSH hierarchy file's two
    *                 columns (`filter_hypernyms.py:29-31`), one row per
    *                 (placement, entity).
    * @return examples with matched negatives' label := NotInclude. */
  def filterHypernyms(examples: DataFrame, mesh: DataFrame): DataFrame = {
    val m = mesh.select(col("ent"), col("tree_node"))
    val neg = examples.filter(col("label") === NegLabel)
      .select(col("doc_id"), col("e1"), col("e2"))
    val pos = examples.filter(col("label") === PosLabel)
      .select(col("doc_id"), col("e1").as("p1"), col("e2").as("p2"))
    // tree nodes of each negative's DISEASE (the only nodes the reference
    // iterates, ent_tree_map[ne[11]])
    val negNodes = neg.join(m, neg("e2") === m("ent"))
      .select(col("doc_id"), col("e1"), col("e2"), col("tree_node").as("neg_node"))
    // clause 1: same chemical, negative-disease node inside positive-disease node
    val posDiseaseNodes = pos.join(m, pos("p2") === m("ent"))
      .select(col("doc_id"), col("p1"), col("tree_node").as("pos_node"))
    val byDisease = negNodes.join(posDiseaseNodes,
      Seq("doc_id")).filter(col("e1") === col("p1")
        && col("pos_node").contains(col("neg_node")))
      .select("doc_id", "e1", "e2")
    // clause 2: same disease, negative-disease node inside positive-CHEMICAL node
    val posChemNodes = pos.join(m, pos("p1") === m("ent"))
      .select(col("doc_id"), col("p2"), col("tree_node").as("pos_node"))
    val byChem = negNodes.join(posChemNodes,
      Seq("doc_id")).filter(col("e2") === col("p2")
        && col("pos_node").contains(col("neg_node")))
      .select("doc_id", "e1", "e2")
    val shadowed = byDisease.union(byChem).distinct()
      .withColumn("shadowed", lit(true))
    examples.join(shadowed, Seq("doc_id", "e1", "e2"), "left")
      .withColumn("label",
        when(col("label") === NegLabel && col("shadowed"), lit(NotInclude))
          .otherwise(col("label")))
      .drop("shadowed")
      .select(examples.columns.map(col).toIndexedSeq: _*) // keep caller's column order
  }
}
