package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.DenseIds

/** Dense-id dictionary sinks (A3 / K2): entity2id and relation2id tables
  * assigned in deterministic first-seen order, mirroring
  * `ATLOP+KIRE/data/gen_kg_data.py:333-347` (which numbers entities in
  * processing order; we pin the equivalent deterministic order:
  * first-occurrence position, tie-broken by the id string).
  *
  * Scale note: ids come from DenseIds.globalDenseId (two-phase range
  * partition + offset assignment) — at 10^12 docs the entity dictionary is
  * billions of rows, and a global row_number window would serialize them
  * onto one task.
  */
object Dictionaries {

  /** entity2id from a triples table: ids ordered by first (doc_id, subj-pos)
    * appearance, i.e. min(doc_id) then entity string. */
  def entity2id(triples: DataFrame): DataFrame = {
    val ents = triples.select(col("subj").as("entity"), col("doc_id"))
      .union(triples.select(col("obj").as("entity"), col("doc_id")))
      .groupBy("entity").agg(min(col("doc_id")).as("first_doc"))
    DenseIds.globalDenseId(ents, "id", Seq(col("first_doc").asc, col("entity").asc))
      .select("entity", "id", "first_doc")
  }

  /** relation2id, same ordering rule. */
  def relation2id(triples: DataFrame): DataFrame = {
    val rels = triples.groupBy(col("pred").as("relation"))
      .agg(min(col("doc_id")).as("first_doc"))
    DenseIds.globalDenseId(rels, "id", Seq(col("first_doc").asc, col("relation").asc))
      .select("relation", "id", "first_doc")
  }

  /** Integer-coded triples (the `*_ids.nt3` sink, gen_kg_data.py:348-355). */
  def codedTriples(triples: DataFrame): DataFrame = {
    val e = entity2id(triples)
    val r = relation2id(triples)
    triples
      .join(e.select(col("entity").as("subj"), col("id").as("h_id")), "subj")
      .join(e.select(col("entity").as("obj"), col("id").as("t_id")), "obj")
      .join(r.select(col("relation").as("pred"), col("id").as("r_id")), "pred")
      .select("doc_id", "h_id", "r_id", "t_id")
  }
}
