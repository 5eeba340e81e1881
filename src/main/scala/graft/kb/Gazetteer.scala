package graft.kb

/** Offline knowledge-base fixtures — the single source of truth shared by the
  * Spark pipeline and the DuckDB oracle SQL (generated from these Seqs so the
  * two can never drift).
  *
  * Mirrors the reference's offline entity-linking side tables:
  *   - two-tier alias dictionary (explicit map prio 0, label-dump fallback
  *     prio 1) — `ATLOP+KIRE/data/gen_kg_data.py:41-90`
  *   - Wikidata-style triple store for one-hop subgraph extraction —
  *     `ATLOP+KIRE/data/gen_kg_data.py:370-394`
  *   - entity attribute table (label/description/instance of/alias, with
  *     default-fill) — `ATLOP+KIRE/data/gen_kg_data.py:578-608`
  *
  * Aliases are drawn from the synthetic `documents` vocabulary so mention
  * detection has real hits. One deliberate collision ("scan" → Q11 tier-0,
  * Q12 tier-1) exercises the priority rule; one intra-tier collision
  * ("batch" → Q15/Q16, same prio) exercises the majority-vote tie rule
  * (stable: lexicographically-first qid wins, mirroring Python's stable sort
  * in `gen_kg_data.py:292-294`).
  */
object Gazetteer {

  /** (alias, qid, prio). prio 0 = explicit dictionary, 1 = label-dump fallback. */
  val aliases: Seq[(String, String, Int)] = Seq(
    ("spark", "Q1", 0),
    ("hash", "Q2", 0),
    ("merge", "Q3", 0),
    ("customer", "Q4", 0),
    ("vector", "Q5", 0),
    ("window", "Q6", 0),
    ("stream", "Q7", 0),
    ("table", "Q8", 0),
    ("query", "Q9", 0),
    ("join", "Q10", 0),
    ("scan", "Q11", 0),
    ("scan", "Q12", 1),   // cross-tier collision: prio rule keeps Q11
    ("filter", "Q13", 1),
    ("sort", "Q14", 1),
    ("batch", "Q15", 1),
    ("batch", "Q16", 1),  // intra-tier collision: tie → min(qid) = Q15
    ("column", "Q17", 1),
    ("group", "Q18", 1),
    // multi-token aliases (reference matches alias token SEQUENCES against
    // the document, `ATLOP+KIRE/data/gen_coref_data.py:163-169`); chosen to
    // overlap single-token aliases so maximal-match suppression is exercised
    // on real corpus hits: "hash join" ⊃ {"hash", "join"},
    // "sort merge join" ⊃ {"sort", "merge", "merge join", "join"}.
    ("hash join", "Q30", 0),
    ("sort merge join", "Q31", 0),
    ("merge join", "Q32", 1),
    ("table scan", "Q33", 0),
    // partially overlaps "merge join" (shares "join", neither contains the
    // other): both survive maximal-match suppression
    ("join order", "Q34", 1)
  )

  /** Distinct alias token lengths — drives the sliding-window widths of the
    * mention matcher in BOTH engines. */
  def aliasLens: Seq[Int] = aliases.map(_._1.split(" ").length).distinct.sorted

  /** qid → NER type (reference type vocabulary: ORG/LOC/NUM/TIME/MISC/PER;
    * `SSAN+KIRE/dataset.py:74`; TECH stands in for MISC-like tech entities). */
  val entityTypes: Seq[(String, String)] = Seq(
    "Q1" -> "TECH", "Q2" -> "TECH", "Q3" -> "TECH", "Q4" -> "PER",
    "Q5" -> "TECH", "Q6" -> "TECH", "Q7" -> "TECH", "Q8" -> "ORG",
    "Q9" -> "MISC", "Q10" -> "TECH", "Q11" -> "TECH", "Q12" -> "TECH",
    "Q13" -> "TECH", "Q14" -> "TECH", "Q15" -> "ORG", "Q16" -> "ORG",
    "Q17" -> "TECH", "Q18" -> "ORG",
    "Q30" -> "TECH", "Q31" -> "TECH", "Q32" -> "TECH", "Q33" -> "MISC",
    "Q34" -> "TECH"
  )

  /** Deterministic relation rules: (headType, tailType) → predicate.
    * Stands in for the reference's learned pair classifier at the fixture
    * level; the scored kernel (graft.pipeline.RelationScorer) refines these
    * with per-pair features + adaptive-threshold decode. Not all type pairs
    * produce a relation (NA class, `ATLOP+KIRE/prepro.py:126-143`). */
  val relRules: Seq[(String, String, String)] = Seq(
    ("TECH", "TECH", "P_interacts"),
    ("PER", "TECH", "P_uses"),
    ("TECH", "ORG", "P_part_of"),
    ("ORG", "PER", "P_serves"),
    ("MISC", "TECH", "P_about"),
    ("ORG", "ORG", "P_affiliate")
  )

  /** KB triple store (h, r, t) for one-hop subgraph extraction (J2). */
  val kgTriples: Seq[(String, String, String)] = Seq(
    ("Q1", "P_dev_by", "Q8"),
    ("Q1", "P_uses_kb", "Q2"),
    ("Q2", "P_variant", "Q3"),
    ("Q4", "P_member", "Q8"),
    ("Q5", "P_part", "Q1"),
    ("Q6", "P_part", "Q1"),
    ("Q7", "P_part", "Q1"),
    ("Q9", "P_runs_on", "Q1"),
    ("Q10", "P_impl", "Q2"),
    ("Q10", "P_impl", "Q3"),
    ("Q11", "P_feeds", "Q10"),
    ("Q13", "P_feeds", "Q11"),
    ("Q14", "P_feeds", "Q3"),
    ("Q15", "P_sched", "Q7"),
    ("Q30", "P_impl", "Q2"),   // multi-word-linked entity in the one-hop graph
    ("Q31", "P_variant", "Q30"),
    ("Q20", "P_ext", "Q21")  // fully outside any document: must be pruned
  )

  /** Entity attributes (qid, kind, text); kinds follow the reference's four
    * attribute strings. description/alias default to label when absent
    * (`gen_kg_data.py:578-608`) — Q9/Q10 intentionally lack them. */
  val kgAttrs: Seq[(String, String, String)] = Seq(
    ("Q1", "label", "spark engine"),
    ("Q1", "description", "distributed compute engine"),
    ("Q1", "instance of", "software"),
    ("Q1", "alias", "apache spark"),
    ("Q2", "label", "hash"),
    ("Q2", "description", "hash function"),
    ("Q2", "instance of", "algorithm"),
    ("Q3", "label", "merge"),
    ("Q3", "instance of", "algorithm"),
    ("Q4", "label", "customer"),
    ("Q4", "instance of", "person"),
    ("Q5", "label", "vector"),
    ("Q6", "label", "window"),
    ("Q7", "label", "stream"),
    ("Q8", "label", "table org"),
    ("Q8", "description", "an organization"),
    ("Q9", "label", "query"),
    ("Q10", "label", "join"),
    ("Q11", "label", "scan"),
    ("Q13", "label", "filter"),
    ("Q14", "label", "sort"),
    ("Q15", "label", "batch co"),
    ("Q17", "label", "column"),
    ("Q18", "label", "group org"),
    ("Q30", "label", "hash join"),
    ("Q30", "instance of", "algorithm"),
    ("Q31", "label", "sort merge join")
  )

  /** Cap on tokens per sentence: punctuation-delimited segments longer than
    * this are subdivided into fixed chunks (the T7 rule-based splitter's
    * run-on guard; on punctuation-less web text every doc is one segment and
    * this cap alone bounds the co-occurrence scope). */
  val SentenceChunk = 16

  // ---- SQL VALUES generation (DuckDB oracle side) ----

  private def lit(s: String) = "'" + s.replace("'", "''") + "'"

  def aliasValues: String =
    aliases.map { case (a, q, p) => s"(${lit(a)}, ${lit(q)}, $p)" }.mkString(", ")

  def typeValues: String =
    entityTypes.map { case (q, t) => s"(${lit(q)}, ${lit(t)})" }.mkString(", ")

  def ruleValues: String =
    relRules.map { case (h, t, p) => s"(${lit(h)}, ${lit(t)}, ${lit(p)})" }.mkString(", ")

  def kgTripleValues: String =
    kgTriples.map { case (h, r, t) => s"(${lit(h)}, ${lit(r)}, ${lit(t)})" }.mkString(", ")

  def kgAttrValues: String =
    kgAttrs.map { case (q, k, t) => s"(${lit(q)}, ${lit(k)}, ${lit(t)})" }.mkString(", ")
}
