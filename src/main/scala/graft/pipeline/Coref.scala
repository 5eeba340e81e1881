package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Alias-based coreference (the reference's deterministic coref path,
  * `ATLOP+KIRE/data/gen_coref_data.py:130-217` `get_coref_by_alias`):
  * mentions sharing a KB alias within a document corefer with prior 0.9;
  * each mention keeps its top-8 partners (W1, `gen_coref_data.py:40-41`).
  * With a constant prior the reference's score ordering is undefined, so we
  * pin the deterministic order: nearest-first, then position.
  */
object Coref {

  val Prior = 0.9 // gen_coref_data.py:131,198-199
  val TopPartners = 8

  /** Coref pairs from detected mentions (doc_id, sent_id, pos_start,
    * pos_end, alias) — span mentions corefer by start position:
    * (doc_id, alias, p1, p2, dist, rank, score), rank ≤ 8 per left mention.
    *
    * 100 TB shape: positions are sorted IN-ROW per (doc, alias) and each
    * mention's candidates are its 8 predecessors + 8 successors in that
    * order — the j-th nearest partner by |Δpos| is always among the j
    * sorted-order neighbors on either side, so the top-8-by-(dist, p2) over
    * the 16-candidate window equals the top-8 over ALL partners. O(k·8)
    * output rows and O(k·16 log 16) work for an alias mentioned k times,
    * vs the self-join's O(k²) intermediate that rode through one shuffle
    * partition (the reference has the same quadratic,
    * `gen_coref_data.py:160-188`, survivable only via its 3,200-pair doc
    * cap). One shuffle (the groupBy); no self-join anywhere in the plan
    * (CorefSpec asserts both the plan shape and equality with the join
    * formulation).
    *
    * PRECONDITION: pos_start values are DISTINCT per (doc_id, alias) — the
    * mention detector emits each (doc, alias, position) once, so this holds
    * whenever input pages have unique doc_id (the same precondition the
    * extraction kernels document). Duplicate positions (a doc ingested
    * twice) crowd the 16-candidate window with copies and drop real
    * partners — and make the join formulation itself nondeterministic (its
    * row_number ties on both dist and p2). CorefSpec pins the divergence
    * explicitly. */
  def aliasCoref(mentions: DataFrame): DataFrame = {
    val k = TopPartners
    mentions
      .groupBy(col("doc_id"), col("alias"))
      .agg(array_sort(collect_list(col("pos_start"))).as("ps"))
      .select(col("doc_id"), col("alias"), col("ps"),
        posexplode(col("ps")).as(Seq("i", "p1")))
      .withColumn("top", expr(s"""
        slice(array_sort(transform(
          filter(slice(ps, greatest(i + 1 - $k, 1),
                       least(i + 1 + $k, size(ps)) - greatest(i + 1 - $k, 1) + 1),
                 x -> x != p1),
          x -> struct(abs(x - p1) AS dist, x AS p2))), 1, $k)"""))
      .select(col("doc_id"), col("alias"), col("p1"),
        posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("doc_id"), col("alias"), col("p1"),
        col("t.p2").as("p2"), col("t.dist").as("dist"),
        (col("r0") + 1).cast("int").as("rank"))
      .withColumn("score", lit(Prior))
  }

  /** The reference-shaped self-join formulation — O(k²) intermediate, kept
    * ONLY as the equivalence twin for CorefSpec (and mirroring the oracle
    * SQL). Production plans use `aliasCoref`. */
  def aliasCorefJoin(mentions: DataFrame): DataFrame = {
    val m1 = mentions.select(col("doc_id"), col("alias"), col("pos_start").as("p1"))
    val m2 = mentions.select(col("doc_id"), col("alias"), col("pos_start").as("p2"))
    val w = Window.partitionBy(col("doc_id"), col("alias"), col("p1"))
      .orderBy(col("dist").asc, col("p2").asc)
    m1.join(m2, Seq("doc_id", "alias"))
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
