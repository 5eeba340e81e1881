package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Entity-keyed coreference (the reference's deterministic coref path,
  * `ATLOP+KIRE/data/gen_coref_data.py:130-217` `get_coref_by_alias`): the
  * reference collects the positions of EVERY alias and label of one entity
  * (`gen_coref_data.py:148-175`: the per-vertex `alias_set` spans all
  * `label`/`alias` attribute triplets, and `coref_pos` unions the positions
  * of all of them plus the gold mention spans) and pairs them all — so
  * "Obama" ↔ "Barack Obama" corefer because both link to one entity, even
  * though the surface forms differ. Pairs carry prior 0.9; each mention
  * keeps its top-8 partners (W1, `gen_coref_data.py:40-41`).
  * With a constant prior the reference's score ordering is undefined, so we
  * pin the deterministic order: nearest-first, then position.
  */
object Coref {

  val Prior = 0.9 // gen_coref_data.py:131,198-199
  val TopPartners = 8

  /** Coref pairs from LINKED mentions (doc_id, …, pos_start, qid) — the
    * pairing key is the linked entity, so positions of ALL aliases of one
    * qid corefer: (doc_id, qid, p1, p2, dist, rank, score), rank ≤ 8 per
    * left mention.
    *
    * 100 TB shape: positions are sorted IN-ROW per (doc, qid) and each
    * mention's candidates are its 8 predecessors + 8 successors in that
    * order — the j-th nearest partner by |Δpos| is always among the j
    * sorted-order neighbors on either side, so the top-8-by-(dist, p2) over
    * the 16-candidate window equals the top-8 over ALL partners. O(k·8)
    * output rows and O(k·16 log 16) work for an entity mentioned k times,
    * vs the self-join's O(k²) intermediate that rode through one shuffle
    * partition (the reference has the same quadratic,
    * `gen_coref_data.py:160-188`, survivable only via its 3,200-pair doc
    * cap). One shuffle (the groupBy); no self-join anywhere in the plan
    * (CorefSpec asserts both the plan shape and equality with the join
    * formulation).
    *
    * PRECONDITION: pos_start values are DISTINCT per (doc_id, qid). This
    * holds for maximal-match mention detection with unique input doc_id:
    * two distinct maximal spans can never share a start position (same
    * start ⇒ the shorter is contained in the longer ⇒ suppressed), so each
    * (doc, qid, pos_start) occurs once. Duplicate positions (a doc ingested
    * twice) crowd the 16-candidate window with copies and drop real
    * partners — and make the join formulation itself nondeterministic (its
    * row_number ties on both dist and p2). CorefSpec pins the divergence
    * explicitly. */
  def entityCoref(linked: DataFrame): DataFrame = {
    val k = TopPartners
    linked
      .groupBy(col("doc_id"), col("qid"))
      .agg(array_sort(collect_list(col("pos_start"))).as("ps"))
      .select(col("doc_id"), col("qid"), col("ps"),
        posexplode(col("ps")).as(Seq("i", "p1")))
      .withColumn("top", expr(s"""
        slice(array_sort(transform(
          filter(slice(ps, greatest(i + 1 - $k, 1),
                       least(i + 1 + $k, size(ps)) - greatest(i + 1 - $k, 1) + 1),
                 x -> x != p1),
          x -> struct(abs(x - p1) AS dist, x AS p2))), 1, $k)"""))
      .select(col("doc_id"), col("qid"), col("p1"),
        posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("doc_id"), col("qid"), col("p1"),
        col("t.p2").as("p2"), col("t.dist").as("dist"),
        (col("r0") + 1).cast("int").as("rank"))
      .withColumn("score", lit(Prior))
  }

  /** The reference-shaped self-join formulation — O(k²) intermediate, kept
    * ONLY as the equivalence twin for CorefSpec (and mirroring the oracle
    * SQL). Production plans use `entityCoref`. */
  def entityCorefJoin(linked: DataFrame): DataFrame = {
    val m1 = linked.select(col("doc_id"), col("qid"), col("pos_start").as("p1"))
    val m2 = linked.select(col("doc_id"), col("qid"), col("pos_start").as("p2"))
    val w = Window.partitionBy(col("doc_id"), col("qid"), col("p1"))
      .orderBy(col("dist").asc, col("p2").asc)
    m1.join(m2, Seq("doc_id", "qid"))
      .filter(col("p1") =!= col("p2"))
      .withColumn("dist", abs(col("p1") - col("p2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopPartners)
      .withColumn("score", lit(Prior))
  }

  /** Distance-bucket histogram of coref pairs (M1 buckets over token
    * distance) — the distilled distance feature the injection layer uses. */
  def distanceHistogram(corefPairs: DataFrame): DataFrame =
    corefPairs
      .withColumn("bucket", RelationScorer.disBucketCol(col("dist")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"))
}
