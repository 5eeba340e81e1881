package graft.text

import org.apache.spark.sql.functions.udf

/** Deterministic WordPiece tokenization (T6) — a from-scratch port of the
  * greedy longest-match-first algorithm the reference invokes through HF
  * (`ATLOP+KIRE/prepro.py:55-78`, `GLRE+KIRE/nnet/transformers_word_handle.py:99-148`),
  * with the same two contracts the reference relies on:
  *
  *  1. per-word start-index tracking, so mention token spans can be remapped
  *     onto the subword stream;
  *  2. entity-marker injection ('*' at mention start/end) with offset
  *     adjustment (`prepro.py:66-73`).
  *
  * No library tokenizer (SURVEY §7.4: "port the rules, don't wrap HF") —
  * the vocab is an explicit broadcastable Set and the algorithm is ~30
  * lines, bit-deterministic.
  */
object WordPiece {

  val Unk = "[UNK]"
  val MaxWordChars = 100 // HF wordpiece guard: longer words → UNK

  /** Fixture vocabulary: gazetteer surface forms whole, all single chars as
    * heads and ##-continuations, plus a few multi-char pieces to exercise
    * greedy longest-match. Deterministic constant. */
  val fixtureVocab: Set[String] = {
    val chars = ('a' to 'z') ++ ('0' to '9')
    val singles = chars.map(_.toString).toSet ++ chars.map("##" + _).toSet
    val whole = graft.kb.Gazetteer.aliases.map(_._1).toSet ++
      Set("the", "of", "fast", "slow", "big", "small", "data", "row", "line")
    val pieces = Set("##er", "##le", "##ing", "##rk", "spa", "cust", "##omer")
    singles ++ whole ++ pieces ++ Set(".", ",", "?", "'", "\"")
  }

  /** SQL VALUES literal of the fixture vocab — the DuckDB oracle replays
    * greedy longest-match-first tokenization from the SAME constant. */
  def vocabValues: String =
    fixtureVocab.toSeq.sorted
      .map(v => "('" + v.replace("'", "''") + "')").mkString(", ")

  /** Greedy longest-match-first decomposition of one word. */
  def tokenizeWord(word: String, vocab: Set[String]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    if (word.length > MaxWordChars) return Seq(Unk)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    while (start < word.length) {
      var end = word.length
      var piece: String = null
      while (end > start && piece == null) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) piece = sub else end -= 1
      }
      if (piece == null) return Seq(Unk) // unsplittable → whole word UNK
      out += piece
      start = end
    }
    out.toSeq
  }

  /** Tokenize a word sequence; returns (subwords, wordStart) where
    * wordStart(i) is the subword index at which input word i begins
    * (the reference's start-index map, transformers_word_handle.py:125). */
  def tokenize(words: Seq[String], vocab: Set[String]): (Seq[String], Seq[Int]) = {
    val subs = scala.collection.mutable.ArrayBuffer[String]()
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    for (w <- words) {
      starts += subs.length
      subs ++= tokenizeWord(w, vocab)
    }
    (subs.toSeq, starts.toSeq)
  }

  /** Entity-marker injection (prepro.py:66-73): wrap each mention span
    * [start, end) in '*' markers at the WORD level before subword
    * tokenization, remapping all span offsets. Spans must be
    * non-overlapping; processed in start order. Returns (newWords,
    * remappedSpans). */
  def injectMarkers(words: Seq[String], spans: Seq[(Int, Int)]): (Seq[String], Seq[(Int, Int)]) = {
    val sorted = spans.zipWithIndex.sortBy(_._1._1)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val remapped = new Array[(Int, Int)](spans.length)
    var src = 0
    for (((s, e), origIdx) <- sorted) {
      while (src < s) { out += words(src); src += 1 }
      val ns = out.length
      out += "*"
      while (src < e) { out += words(src); src += 1 }
      out += "*"
      remapped(origIdx) = (ns, out.length) // span includes both markers
    }
    while (src < words.length) { out += words(src); src += 1 }
    (out.toSeq, remapped.toSeq)
  }

  /** UDF: token array → struct(subwords, word_starts) with the fixture
    * vocab baked in (broadcast as part of the serialized closure). */
  val tokenizeUdf = udf((words: Seq[String]) => {
    val (subs, starts) = tokenize(words, fixtureVocab)
    (subs, starts)
  })
}
