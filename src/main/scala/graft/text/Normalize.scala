package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text-normalization chain ported rule-for-rule from the
  * reference (semantics, not code). All are pure Column expressions so they
  * stay inside whole-stage codegen — no UDFs on the EL hot path.
  */
object Normalize {

  /** T1 — `_handleLabel` (`ATLOP+KIRE/data/gen_kg_data.py:92-94`):
    * '\n'→' ', drop '.', '-'→' ', lowercase. This is THE entity-linking join
    * key normalization; must be bit-exact. */
  def handleLabel(c: Column): Column =
    lower(regexp_replace(translate(c, "\n-", "  "), "\\.", ""))

  /** T2 — token space-fix (`GLRE+KIRE/data_processing/dwieProcess.py:33-39`):
    * space/newline/tab inside a token → '_'. */
  def tokenSpaceFix(tok: Column): Column = translate(tok, " \n\t", "___")

  /** T3 — entity-name cleanup (`GLRE+KIRE/data_processing/docRedProcess.py:48-52`,
    * `dwieProcess.py:54-58`): strip newlines/tabs and the '||' TSV
    * delimiter from surface names, collapse the residue. */
  def cleanupName(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "\\|\\|", " "), "[\\n\\t]+", " "))

  /** T4 — unicode punctuation normalization
    * (`GLRE+KIRE/data_processing/utils.py:53-67`): curly quotes, dashes,
    * NBSP → ASCII equivalents. */
  def asciiPunct(c: Column): Column =
    translate(c, "‘’“”–— ", "''\"\"-- ")

  /** T5 — punct tokenizer `tokenizer_1` (`ATLOP+KIRE/data/gen_kg_data.py:24-28`):
    * pad [,.|?？'"] with spaces then split on whitespace runs. */
  def punctTokenize(c: Column): Column = {
    val padded = regexp_replace(c, "([,.|?？'\"])", " $1 ")
    // drop empty leading/trailing tokens like Python .split() does
    filter(split(trim(padded), "\\s+"), t => length(t) > lit(0))
  }

  /** Whitespace tokenizer for the web corpus (already space-normalized by the
    * extractor contract). */
  def wsTokenize(c: Column): Column = split(c, " ")
}
