package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.Normalize

/** S5/S6 file-backed dictionary ingest — the reference's offline
  * entity-linking side tables at REFERENCE scale (63k+ labels, not the
  * Gazetteer's fixture constants):
  *
  *  - `aliasTsv`: the explicit alias dictionary
  *    `entityLabel2WikidataId.txt` (`ATLOP+KIRE/data/gen_kg_data.py:41-55`):
  *    `label \t <uri-or-id>` per line; the entity id is the last
  *    '/'-segment of column 2 (`item[1].split('/')[-1]`), the label goes
  *    through `_handleLabel` normalization (T1).
  *  - `labelDump`: the Wikidata label-dump fallback tier
  *    `entity_labels.nt3` (`gen_kg_data.py:386-394`): `id \t label` per
  *    line, lines with < 2 fields skipped.
  *  - `kgTriplesNt3`: the relation-triple dump `relation_triplets.nt3`
  *    (`gen_kg_data.py:374-383`): `h \t r \t t`, lines with < 3 fields
  *    skipped.
  *
  * All three are DISTRIBUTED line scans (spark.read.text → split) so a
  * full Wikidata dump parses in parallel; `loadAliasEntries` is the
  * driver-side collect → broadcast path for dictionary-sized inputs (the
  * reference holds the same dict in one Python process,
  * `gen_kg_data.py:41-47` — bounded by construction; the 10^9-row case
  * stays a DataFrame and joins relationally via
  * `Enrich.attachAttributesLarge`'s sort-merge shape).
  */
object DictFiles {

  /** `entityLabel2WikidataId.txt` → (alias, qid, prio). */
  def aliasTsv(spark: SparkSession, path: String, prio: Int = 0): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 2)
      .select(
        Normalize.handleLabel(element_at(col("f"), 1)).as("alias"),
        element_at(split(element_at(col("f"), 2), "/"), -1).as("qid"),
        lit(prio).as("prio"))

  /** `entity_labels.nt3` (id \t label) → (alias, qid, prio). */
  def labelDump(spark: SparkSession, path: String, prio: Int = 1): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 2)
      .select(
        Normalize.handleLabel(element_at(col("f"), 2)).as("alias"),
        element_at(col("f"), 1).as("qid"),
        lit(prio).as("prio"))

  /** `relation_triplets.nt3` → (h, r, t); short lines skipped exactly as
    * the reference's `len(item) < 3: continue`. */
  def kgTriplesNt3(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 3)
      .select(element_at(col("f"), 1).as("h"),
        element_at(col("f"), 2).as("r"),
        element_at(col("f"), 3).as("t"))

  /** Two-tier dictionary load for the broadcast kernels: explicit TSV at
    * prio 0, label-dump fallback at prio 1 (`gen_kg_data.py:74-87`'s
    * explicit-first merge). Driver-side collect — dictionaries are bounded
    * (63k–1M rows), and the kernels need a broadcast hash map, not a
    * DataFrame. */
  def loadAliasEntries(spark: SparkSession, tsvPath: String,
                       nt3Path: String): Seq[(String, String, Int)] =
    aliasTsv(spark, tsvPath, 0).unionAll(labelDump(spark, nt3Path, 1))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSeq
}
