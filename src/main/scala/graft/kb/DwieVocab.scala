package graft.kb

/** The DWIE label vocabulary (the reference's second benchmark): 66 classes
  * = NA + 65 relation types (`README.md:168-173`; ATLOP runs DWIE with
  * `--num_class 66`, `ATLOP+KIRE/scripts/run_dwie_bert.sh:44`).
  *
  * Unlike DocRED's 96 Wikidata pids (pinned in [[DocREDVocab]]), the DWIE
  * relation names ship with the DATASET's rel2id.json — the reference loads
  * them at runtime (`ATLOP+KIRE/prepro.py:5,20-22`), and so does this
  * engine: `fromRel2Id` parses the same file format. The test fixture
  * carries a small rel2id analog with real DWIE-style names. */
object DwieVocab {

  /** README-pinned class count of the full dataset (NA included). */
  val NumClasses = 66

  private val entryRx = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r

  /** Parse a rel2id.json ({"NA": 0, "based_in0": 2, ...}) into the id-ordered
    * vocabulary. Requires NA at id 0 (the reference reserves the zeroth
    * one-hot slot, `prepro.py:128,140`) and dense ids. */
  def fromRel2Id(path: String): Seq[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val pairs = entryRx.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toInt).toSeq
    require(pairs.nonEmpty, s"no rel2id entries in $path")
    val byId = pairs.sortBy(_._2)
    require(byId.head == ("NA" -> 0), "rel2id must map NA to id 0")
    require(byId.map(_._2) == byId.indices, s"rel2id ids must be dense 0..${byId.size - 1}")
    byId.map(_._1)
  }
}
