package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE train + encode: hand-checked merges, the greedy-encode contract,
  * and the determinism/partition-invariance the distributed trainer claims. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("trainMerges on a hand corpus: frequency order, deterministic ties") {
    // "abab" ×3, "abc" ×1: pair counts a·b=7 (two per abab), b·a=3, b·c=1
    val merges = Bpe.trainMerges(Seq(("abab", 3L), ("abc", 1L)), 3)
    assert(merges.head == ("a", "b"), s"most frequent pair first: $merges")
    // after merging a·b: abab → [ab, ab] (count 3 for ab·ab), abc → [ab, c]
    assert(merges(1) == ("ab", "ab"), s"second merge must be ab·ab: $merges")
    assert(merges(2) == ("ab", "c"))
    // exhaustion: no 4th pair remains ([abab], [abc] are single tokens)
    assert(Bpe.trainMerges(Seq(("abab", 3L), ("abc", 1L)), 10).length == 3)
  }

  test("encode applies lowest-rank merges greedily, left-to-right non-overlapping") {
    val merges = IndexedSeq(("a", "a"), ("aa", "b"))
    val ranks = merges.zipWithIndex.toMap
    // aaa: merge (a,a) left-to-right → [aa, a] (non-overlapping)
    assert(Bpe.encodeWord("aaa", ranks, merges) == Seq("aa", "a"))
    // aab: (a,a) first → [aa, b], then (aa,b) → [aab]
    assert(Bpe.encodeWord("aab", ranks, merges) == Seq("aab"))
    // rank order beats position: in "baa" only (a,a) applies
    assert(Bpe.encodeWord("baa", ranks, merges) == Seq("b", "aa"))
    // concatenation invariant: tokens always respell the word
    for (w <- Seq("aaaab", "bbb", "abcabc", ""))
      assert(Bpe.encodeWord(w, ranks, merges).mkString == w)
  }

  test("distributed training is partition-invariant and matches the driver loop") {
    val docs = graft.ops.Corpora.normDocs(spark, sfDir).cache()
    val a = Bpe.train(docs, 40)
    val b = Bpe.train(docs.repartition(13), 40)
    val c = Bpe.train(docs.repartition(1), 40)
    assert(a == b && b == c, "merge table must not depend on partitioning")
    assert(a.length == 40)
    // and equals a driver-side recount over the same corpus
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (w, cnt) => (-cnt, w) }
    assert(a == Bpe.trainMerges(wc, 40))
  }

  test("encodeStats: per-doc counts are exact and partition-invariant") {
    val docs = graft.ops.Corpora.normDocs(spark, sfDir).cache()
    val merges = Bpe.fixtureMerges
    val got = Bpe.encodeStats(docs, merges, spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val again = Bpe.encodeStats(docs.repartition(7), merges, spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == again)
    // spot-check one doc against a driver-side re-encode
    val ranks = merges.zipWithIndex.toMap
    val m = merges.toIndexedSeq
    val (id0, text0) = docs.select("doc_id", "text").orderBy("doc_id").head() match {
      case r => (r.getLong(0), r.getString(1))
    }
    val wantSubs = text0.split(" ", -1).map(w => Bpe.encodeWord(w, ranks, m).length.toLong).sum
    assert(got.find(_._1 == id0).get._2 == wantSubs)
    // merges must actually compress (fixture merge table shares the corpus
    // vocabulary): fewer subwords than characters for some doc
    val chars = docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .head().getLong(0)
    assert(got.map(_._2).sum < chars, "BPE must merge something on this corpus")
  }

  test("fixture merge table is stable (oracle depends on it)") {
    // the q_bpe oracle embeds mergesSqlLiteral — a drift here silently
    // invalidates committed expectations, so pin the head of the table
    val m = Bpe.fixtureMerges
    assert(m.length == 60)
    assert(m.take(3) == Seq(("t", "h"), ("th", "e"), ("a", "n")),
      s"fixture merges drifted: ${m.take(3)}")
  }
}
