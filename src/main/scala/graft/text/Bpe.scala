package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair encoding — the tokenizer LLM training pipelines actually run
  * (WordPiece covers the reference's BERT-era path, T6; BPE is the engine
  * addition next to it). From-scratch, deterministic, no library tokenizer.
  *
  * TRAIN (Sennrich-style): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair. The distributed part is the corpus →
  * word-frequency aggregation (map-side-combinable groupBy; the corpus is
  * never re-scanned per merge); the merge loop itself runs driver-side over
  * a deterministically CAPPED word table (count desc, word asc, top
  * `maxWords`) — the shape production tokenizer trainers use (HF/
  * sentencepiece train single-node on a sampled word table too; the corpus
  * scan is the only part that needs the cluster). Determinism: exact counts,
  * deterministic cap, ties broken (count desc, pair asc) — the merge table
  * is a pure function of corpus content, invariant under partitioning.
  *
  * ENCODE: per word, repeatedly apply the LOWEST-RANK merge whose pair is
  * adjacent somewhere in the current segmentation, merging all its
  * occurrences left-to-right non-overlapping, until no merge applies —
  * the standard greedy BPE encode. The DuckDB oracle (q_bpe) replays it
  * exactly: segmentations ride as `sep`-delimited strings where one merge
  * step IS `replace(seg, '␟a␟b␟', '␟ab␟')` (left-to-right non-overlapping,
  * boundary-anchored so a pattern can never match a token suffix), and the
  * merge-table walk is a recursive CTE picking the first applicable entry
  * of the rank-ordered merge list.
  *
  * Character note: Scala splits words into UTF-16 code units, DuckDB
  * `substr` into codepoints — identical for the BMP text this corpus holds;
  * `Sep` (0x1f) never occurs in it. */
object Bpe {

  /** Token separator in the oracle's string-encoded segmentations. */
  val Sep = "\u001f"

  /** Greedy merge of ALL left-to-right non-overlapping (a, b) adjacencies. */
  def applyMerge(seg: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < seg.length) {
      if (j < seg.length - 1 && seg(j) == a && seg(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += seg(j); j += 1 }
    }
    out.result()
  }

  /** Driver-side merge-table training over a word-frequency table.
    * Deterministic: max pair count, ties to the lexicographically smallest
    * (a, b). Stops early when no adjacent pair remains. */
  def trainMerges(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words: Vector[(Vector[String], Long)] = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (w.map(_.toString).toVector, c) }.toVector
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seg, c) <- words; i <- 0 until seg.length - 1)
        pc.updateWith((seg(i), seg(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pc.isEmpty) exhausted = true
      else {
        val ((a, b), _) = pc.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b))
        words = words.map { case (seg, c) => (applyMerge(seg, a, b), c) }
        k += 1
      }
    }
    merges.result()
  }

  /** Distributed corpus → word counts → capped table → driver training.
    * The cap (count desc, word asc) bounds driver memory at any corpus
    * scale; the groupBy is the only corpus pass. */
  def train(docs: DataFrame, nMerges: Int, maxWords: Int = 50000): Seq[(String, String)] = {
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(wc, nMerges)
  }

  /** Greedy encode of one word under rank-ordered `merges`. */
  def encodeWord(word: String, ranks: Map[(String, String), Int],
                 merges: IndexedSeq[(String, String)]): Seq[String] = {
    if (word.isEmpty) return Nil
    var seg: Vector[String] = word.map(_.toString).toVector
    var live = true
    while (live && seg.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < seg.length - 1) {
        val r = ranks.getOrElse((seg(i), seg(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) live = false
      else {
        val (a, b) = merges(bestRank)
        seg = applyMerge(seg, a, b)
      }
    }
    seg
  }

  /** Per-doc subword stats under a broadcast merge table: (doc_id,
    * n_subwords, n_words). mapPartitions kernel with a per-partition word
    * memo (web text repeats words heavily), zero shuffle. */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)],
                  spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      (merges.zipWithIndex.toMap, merges.toIndexedSeq))
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val (ranks, m) = bc.value
        val memo = scala.collection.mutable.Map.empty[String, Int]
        it.map { case (docId, text) =>
          val words = text.split(" ", -1)
          var subs = 0L
          var i = 0
          while (i < words.length) {
            subs += memo.getOrElseUpdate(words(i), encodeWord(words(i), ranks, m).length)
            i += 1
          }
          (docId, subs, words.length.toLong)
        }
      }.toDF("doc_id", "n_subwords", "n_words")
  }

  /** Committed training corpus for the oracle-gated encode path: the merge
    * table is a deterministic pure function of this constant, so the DuckDB
    * oracle replays encode from the same table. (Training on the INPUT
    * corpus is the production path — `train` — pinned by BpeSpec; an
    * oracle-checked query needs a merge table both engines can state.) */
  val fixtureCorpus: Seq[String] = Seq(
    "the spark engine scans the table and streams the rows",
    "a fast hash join and a sort merge join over the data",
    "the scan reads the column batch and the vector batch",
    "streams of data flow into the sorted table store",
    "the fast path joins the sorted batch to the table")

  lazy val fixtureMerges: Seq[(String, String)] =
    trainMerges(
      fixtureCorpus.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
        .toSeq.sortBy { case (w, c) => (-c, w) },
      nMerges = 60)

  /** DuckDB literal: the rank-ordered merge list as (pat, rep) structs over
    * boundary-anchored `Sep`-delimited patterns — one `replace(seg, pat,
    * rep)` IS one merge application. */
  def mergesSqlLiteral: String = {
    def esc(s: String) = s.replace("'", "''")
    fixtureMerges.map { case (a, b) =>
      s"{'pat': '$Sep${esc(a)}$Sep${esc(b)}$Sep', 'rep': '$Sep${esc(a + b)}$Sep'}"
    }.mkString("[", ", ", "]")
  }
}
