package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level knowledge-graph fusion — the step after per-document
  * extraction that a 10^12-document build actually materializes.
  *
  * The reference scores each document in isolation (`ATLOP+KIRE/losses.py`
  * decode per doc); at Common-Crawl scale the SAME (subj, pred, obj) is
  * asserted by many independent pages, and the KG table a consumer reads is
  * the FUSED one: per distinct triple, how many documents support it, the
  * strongest per-document evidence, and a combined confidence (the Knowledge
  * Vault / NELL aggregation family, re-expressed deterministically).
  *
  * Confidence fusion stays in INTEGER milli-logit space so the DuckDB
  * oracle replays it bit-exactly: each independent supporting document adds
  * `WSupportMilli` on top of the best per-document score, capped at
  * `SupportCap` extra witnesses — a capped-support approximation of
  * noisy-or in logit space (each extra witness multiplies the odds by a
  * constant factor; the cap keeps a boilerplate-amplified triple from
  * growing without bound — 10^6 mirror copies of one page must not saturate
  * the KG with fake certainty).
  *
  * Scale shape: one map-side-combinable groupBy on the (subj, pred, obj)
  * key — the same uniform-key aggregation as exact dedup, no windows — plus
  * a second tiny groupBy on (subj, pred) and an equi-join back for the
  * functional-relation argmax. A viral triple ("Q1 instance-of entity" from
  * every parked domain) is ONE group row after partial aggregation.
  */
object KgFusion {

  /** Milli-logit bonus per extra supporting document. */
  val WSupportMilli = 100L

  /** Max extra witnesses that count toward fused confidence. */
  val SupportCap = 5L

  /** Fuse per-document scored triples (doc_id, subj, pred, obj,
    * score_milli) into one row per distinct (subj, pred, obj):
    *
    *   support     = #distinct supporting documents
    *   max_milli   = best per-document score
    *   first_doc   = smallest supporting doc_id (evidence pointer, the
    *                 same first-writer-wins anchor exact dedup uses)
    *   fused_milli = max_milli + WSupportMilli·min(support−1, SupportCap)
    *   is_best     = 1 iff this obj is the argmax object for (subj, pred)
    *                 under (fused_milli, support, obj) descending — the
    *                 functional-relation resolution pick ("one birthplace
    *                 per person"), deterministic total order so ties break
    *                 identically in both engines.
    */
  def fuse(scored: DataFrame): DataFrame = {
    val fused = fuseCore(scored)
    // functional-relation argmax: grouped max of the (fused, support, obj)
    // struct — map-side combinable, no window, so a hot (subj, pred) with
    // millions of asserted objects still partial-aggregates
    val best = fused
      .groupBy(col("subj"), col("pred"))
      .agg(max(struct(col("fused_milli"), col("support"), col("obj"))).as("_best"))
    fused.join(best, Seq("subj", "pred"))
      .withColumn("is_best",
        (struct(col("fused_milli"), col("support"), col("obj")) === col("_best")).cast("int"))
      .drop("_best")
      .select("subj", "pred", "obj", "support", "max_milli", "first_doc",
        "fused_milli", "is_best")
  }

  /** The support/confidence aggregation of [[fuse]] WITHOUT the
    * functional-relation argmax layer: one row per distinct (subj, pred,
    * obj) with support / max_milli / first_doc / fused_milli, values
    * identical to `fuse`'s (spec-pinned). For consumers that use none of
    * is_best — e.g. [[snapshotDelta]], which reads only `support` — the
    * argmax's extra aggregation + join is computed-then-discarded work
    * that column pruning can NOT remove (the inner join survives because
    * Catalyst cannot prove it row-preserving). */
  def fuseCore(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(
        countDistinct(col("doc_id")).as("support"),
        max(col("score_milli")).cast("long").as("max_milli"),
        min(col("doc_id")).cast("long").as("first_doc"))
      .withColumn("fused_milli",
        col("max_milli") + lit(WSupportMilli) * least(col("support") - 1, lit(SupportCap)))

  /** Max provenance pointers carried per fused triple. */
  val EvidenceCap = 5

  /** Bounded per-triple provenance — the evidence list a KG consumer
    * dereferences ("which pages assert this?"): the `EvidenceCap` SMALLEST
    * supporting doc_ids per distinct (subj, pred, obj), ascending.
    *
    * Smallest-K (not first-K) keeps the list a deterministic function of
    * the support SET — partition- and arrival-order-invariant, consistent
    * with `fuse`'s min(doc_id) first_doc anchor (which is always
    * element 0 here). The aggregation is [[graft.functions.BoundedMinSet]]
    * over zero-padded doc ids (fixed-width decimal ⇒ lexicographic ≡
    * numeric order), so a boilerplate triple asserted by 10^8 pages costs
    * a cap-sized buffer with O(1) rejections map-side — never a
    * collect_list of the whole witness set. */
  def evidence(scored: DataFrame): DataFrame = {
    val bounded = udaf(new graft.functions.BoundedMinSet(EvidenceCap))
    scored
      .select(col("subj"), col("pred"), col("obj"),
        format_string("%019d", col("doc_id")).as("d"))
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(bounded(col("d")).as("ds"))
      .select(col("subj"), col("pred"), col("obj"),
        // comma-joined string form: the cross-engine-comparable encoding
        // (array columns don't hash in the driver's compare), never empty
        // since every triple has >= 1 witness
        array_join(transform(col("ds"), s => s.cast("long").cast("string")), ",")
          .as("evidence_docs"))
  }

  /** Snapshot-to-snapshot KG delta — the incremental-build primitive (the
    * triple-side analog of `Dedup.incrementalDedup`): instead of
    * re-publishing the whole fused KG per crawl, diff the new fused table
    * against the previous snapshot and emit only what changed.
    *
    * Status per (subj, pred, obj):
    *   'added'   — in new only (a fresh crawl asserted it first)
    *   'removed' — in old only (its supporting pages left the corpus)
    *   'support_changed' — in both with different support counts
    *   'stable'  — in both, same support
    *
    * Absent supports surface as −1 (never NULL) so downstream hashing and
    * the oracle compare are null-free. Scale shape: one full outer
    * sort-merge join on the uniform (subj, pred, obj) key.
    */
  def snapshotDelta(oldFused: DataFrame, newFused: DataFrame): DataFrame = {
    val o = oldFused.select(col("subj"), col("pred"), col("obj"),
      col("support").as("old_support"))
    val n = newFused.select(col("subj"), col("pred"), col("obj"),
      col("support").as("new_support"))
    o.join(n, Seq("subj", "pred", "obj"), "full_outer")
      .withColumn("status",
        when(col("old_support").isNull, lit("added"))
          .when(col("new_support").isNull, lit("removed"))
          .when(col("old_support") =!= col("new_support"), lit("support_changed"))
          .otherwise(lit("stable")))
      .select(col("subj"), col("pred"), col("obj"),
        coalesce(col("old_support"), lit(-1L)).as("old_support"),
        coalesce(col("new_support"), lit(-1L)).as("new_support"),
        col("status"))
  }
}
