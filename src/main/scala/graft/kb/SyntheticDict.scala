package graft.kb

import java.nio.file.{Files, Paths}

/** Deterministic reference-scale synthetic dictionary (~63k aliases, the
  * size of the reference's `entityLabel2WikidataId.txt` — 63,256 labels,
  * `ATLOP+KIRE/data/gen_kg_data.py:84-87`), written in the reference's own
  * file formats so `sources.DictFiles` ingests it unchanged:
  *
  *  - tier 0 (`entityLabel2WikidataId.txt`): the Gazetteer's prio-0
  *    aliases (full wikidata-URI column, exercising the `split('/')[-1]`
  *    rule), 380 LIVE two-token aliases built from the corpus's 20 most
  *    common tokens (these actually match documents, so the 63k dict
  *    changes linking results, not just probe cost), and half the cold
  *    fill;
  *  - tier 1 (`entity_labels.nt3`, id \t label): the Gazetteer's prio-1
  *    aliases and the other half of the cold fill — so the two-tier
  *    prio rule is exercised ACROSS files ("scan" → Q11 in tier 0 beats
  *    Q12 in tier 1), plus intra-tier collisions against Gazetteer
  *    bigrams ("hash join": Q30 < Q910xxx ⇒ Q30 keeps winning);
  *  - `relation_triplets.nt3`: the Gazetteer KG triples plus a malformed
  *    short line (must be skipped, `gen_kg_data.py:377-378`) and 50
  *    synthetic edges linking live-bigram entities into the KB.
  *
  * Content is a pure function of these constants — callers always
  * rewrite (cheap, ~3 MB) so no stale-cache state can survive a code
  * change. The DuckDB oracle for q_linked_file / q_triples_file reads
  * THE SAME files, so ingest + normalization + two-tier resolution are
  * all under the hash gate.
  */
object SyntheticDict {

  val Dir = "/tmp/graft_dict63k"
  def tsvPath = s"$Dir/entityLabel2WikidataId.txt"
  def nt3Path = s"$Dir/entity_labels.nt3"
  def kgPath = s"$Dir/relation_triplets.nt3"

  /** Generator guarantee shared with the oracle's candidate-window list. */
  val MaxAliasTokens = 3

  /** The corpus's 20 most common tokens (deterministic constant — the
    * synthetic documents vocabulary is fixed). */
  val LiveTokens: Seq[String] = Seq(
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream")

  val ColdCount = 62000

  def liveQid(i: Int): String = s"Q9${10000 + i}"

  def write(): Unit = {
    val a = new StringBuilder
    val b = new StringBuilder
    Gazetteer.aliases.foreach { case (alias, qid, prio) =>
      require(alias.split(" ").length <= MaxAliasTokens)
      if (prio == 0) a.append(s"$alias\thttp://www.wikidata.org/entity/$qid\n")
      else b.append(s"$qid\t$alias\n")
    }
    var i = 0
    for (x <- LiveTokens; y <- LiveTokens if x != y) {
      a.append(s"$x $y\thttp://www.wikidata.org/entity/${liveQid(i)}\n")
      i += 1
    }
    (0 until ColdCount).foreach { j =>
      val alias = f"synent$j%05d"
      val qid = s"Q8${100000 + j}"
      if (j % 2 == 0) a.append(s"$alias\thttp://www.wikidata.org/entity/$qid\n")
      else b.append(s"$qid\t$alias\n")
    }
    val kg = new StringBuilder
    Gazetteer.kgTriples.foreach { case (h, r, t) => kg.append(s"$h\t$r\t$t\n") }
    kg.append("Q1\n") // short line: the ingest must skip it
    (0 until 50).foreach(j => kg.append(s"${liveQid(j)}\tP361\tQ1\n"))
    Files.createDirectories(Paths.get(Dir))
    Files.writeString(Paths.get(tsvPath), a.toString)
    Files.writeString(Paths.get(nt3Path), b.toString)
    Files.writeString(Paths.get(kgPath), kg.toString)
  }
}
