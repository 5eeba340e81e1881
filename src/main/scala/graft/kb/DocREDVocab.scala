package graft.kb

/** The public DocRED label vocabularies (the reference loads these from the
  * dataset's rel2id.json / ner2id.json, `ATLOP+KIRE/prepro.py:4-6`,
  * `GLRE+KIRE/data/loader.py:100-112`; counts pinned by the reference README
  * tables: 96 DocRED relation types, 6 NER types).
  *
  * Relation ids: index 0 is the NA class (`prepro.py:128,140` reserves the
  * zeroth one-hot slot); the 96 Wikidata property ids follow in this listed
  * order. The reference's integer assignment comes from the dataset file, so
  * the deterministic rule here (listed order) is the pinned contract for
  * this engine — all cross-engine comparisons go through the string ids.
  */
object DocREDVocab {

  /** The 96 DocRED relation types (Wikidata property ids; public dataset). */
  val relations: Seq[String] = Seq(
    "P6", "P17", "P19", "P20", "P22", "P25", "P26", "P27", "P30", "P31",
    "P35", "P36", "P37", "P39", "P40", "P50", "P54", "P57", "P58", "P69",
    "P86", "P102", "P108", "P112", "P118", "P123", "P127", "P131", "P136",
    "P137", "P140", "P150", "P155", "P156", "P159", "P161", "P162", "P166",
    "P170", "P171", "P172", "P175", "P176", "P178", "P179", "P190", "P194",
    "P205", "P206", "P241", "P264", "P272", "P276", "P279", "P355", "P361",
    "P364", "P400", "P403", "P449", "P463", "P488", "P495", "P527", "P551",
    "P569", "P570", "P571", "P576", "P577", "P580", "P582", "P585", "P607",
    "P674", "P676", "P706", "P710", "P737", "P740", "P749", "P800", "P807",
    "P840", "P937", "P1001", "P1056", "P1198", "P1336", "P1344", "P1365",
    "P1366", "P1376", "P1412", "P1441", "P3373")

  /** rel2id with the NA class at index 0. */
  val rel2id: Map[String, Int] =
    (("NA" -> 0) +: relations.zipWithIndex.map { case (r, i) => r -> (i + 1) }).toMap

  /** The 6 DocRED NER types (`SSAN+KIRE/dataset.py:74`). */
  val nerTypes: Seq[String] = Seq("PER", "ORG", "LOC", "TIME", "NUM", "MISC")

  val ner2id: Map[String, Int] = nerTypes.zipWithIndex.toMap

  /** DuckDB VALUES list of the 96 relation ids (oracle-side vocabulary,
    * generated from the same Seq the classifier decodes into). */
  def relValues: String = relations.map(r => s"('$r')").mkString(", ")
}
