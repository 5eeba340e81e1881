package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{WordPiece, Normalize}
import graft.sources.GlreTsv
import graft.functions.LogSumExp

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("wordpiece: greedy longest-match with ## continuations") {
    val v = WordPiece.fixtureVocab
    assert(WordPiece.tokenizeWord("spark", v) == Seq("spark"))
    // 'sparkle': whole word absent → longest prefix 'spark' + '##le'
    assert(WordPiece.tokenizeWord("sparkle", v) == Seq("spark", "##le"))
    // 'customer' is whole; 'customers' → 'customer' + '##s'
    assert(WordPiece.tokenizeWord("customers", v) == Seq("customer", "##s"))
    // falls back to char pieces, greedy multi-char first
    assert(WordPiece.tokenizeWord("spaxing", v) == Seq("spa", "##x", "##ing"))
    // unknown char → UNK for the whole word (HF semantics)
    assert(WordPiece.tokenizeWord("naïve", v) == Seq(WordPiece.Unk))
    assert(WordPiece.tokenizeWord("x" * 101, v) == Seq(WordPiece.Unk))
  }

  test("wordpiece: word-start indices align subwords to words") {
    val (subs, starts) = WordPiece.tokenize(Seq("the", "sparkle", "customers"), WordPiece.fixtureVocab)
    assert(subs == Seq("the", "spark", "##le", "customer", "##s"))
    assert(starts == Seq(0, 1, 3))
  }

  test("marker injection wraps spans and remaps offsets (prepro.py:66-73)") {
    val words = Seq("a", "b", "c", "d", "e")
    val (out, spans) = WordPiece.injectMarkers(words, Seq((3, 4), (1, 2)))
    assert(out == Seq("a", "*", "b", "*", "c", "*", "d", "*", "e"))
    assert(spans == Seq((5, 8), (1, 4)))
    // marked spans still contain the original words
    for (((s, e), orig) <- spans.zip(Seq("d", "b")))
      assert(out.slice(s, e).contains(orig))
  }

  test("GLRE .data codec round-trips (FIXTURES.md F4)") {
    import spark.implicits._
    val docs = Seq(
      ("docA",
        Seq(Seq("spark", "runs", "."), Seq("fast", "indeed", ".")),
        Seq(
          ("P_uses", "L2R", "CROSS", "0-1", "3-4", 0, Seq("spark", "sparky"), Seq("TECH"),
            Seq("0"), Seq("1"), Seq("0"), 1, Seq("fast"), Seq("MISC"),
            Seq("0"), Seq("1"), Seq("1"), "1"))),
      ("docB", Seq(Seq("empty", "doc")),
        Seq.empty[(String, String, String, String, String, Int, Seq[String], Seq[String], Seq[String], Seq[String], Seq[String], Int, Seq[String], Seq[String], Seq[String], Seq[String], Seq[String], String)])
    ).toDF("title", "sents", "rawPairs")
      .withColumn("pairs", expr(
        """transform(rawPairs, p -> named_struct(
          'rel', p._1, 'dir', p._2, 'cross', p._3,
          'headPosRange', p._4, 'tailPosRange', p._5,
          'hIdx', p._6, 'hNames', p._7, 'hTypes', p._8,
          'hStarts', p._9, 'hEnds', p._10, 'hSentIds', p._11,
          'tIdx', p._12, 'tNames', p._13, 'tTypes', p._14,
          'tStarts', p._15, 'tEnds', p._16, 'tSentIds', p._17,
          'indevTrain', p._18))"""))
      .select("title", "sents", "pairs")
    val lines = GlreTsv.write(docs, spark)
    val back = GlreTsv.read(lines, spark)
    // round-trip equality on every field
    val a = docs.orderBy("title").collect().map(_.toString).toSeq
    val b = back.orderBy("title").collect().map(_.toString).toSeq
    assert(b == a)
  }

  test("logsumexp aggregator: stable, matches exact computation, merge-safe") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 3.0, -1000.0, 700.0, 699.0) // 700 would overflow naive exp
    val got = xs.toDF("x").repartition(3) // force partial-agg merges
      .agg(udaf(LogSumExp).apply(col("x"))).head.getDouble(0)
    val m = xs.max
    val want = m + math.log(xs.map(x => math.exp(x - m)).sum)
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
  }
}
