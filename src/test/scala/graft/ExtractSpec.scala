package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Html

/** Byte-identity contract of the HTML extractor (the per-row invariant from
  * BASELINE.json input_hint; reference analog: offset-exact normalization
  * walk in GLRE+KIRE/data_processing/tools.py:308-479). */
class ExtractSpec extends AnyFunSuite {

  test("extract(wrap(text)) is byte-identical to normalized text") {
    val texts = Seq(
      "spark join merge customer window stream",
      "the fast key order sort table scan merge part window",
      "a",
      "one two three four five six seven eight nine ten eleven twelve " * 10
    )
    for (t <- texts) {
      val got = Html.extractText(Html.wrapHtmlBytes(t, "https://x/1", "en"))
      assert(got == Html.normalizeWs(t), s"drift on: $t")
    }
  }

  test("entities, nested tags, noise blocks are handled") {
    val html =
      """<html><head><script>var a = "<p>not text</p>";</script></head>
        |<body><p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f</p>
        |<p>x <b>bold</b> y</p><div>not extracted</div></body></html>""".stripMargin
    assert(Html.extractText(html) == "a & b <c> \"d\" 'e' f x bold y")
  }

  test("whitespace runs collapse deterministically") {
    assert(Html.normalizeWs("  a\t\tb \n c  ") == "a b c")
    assert(Html.extractText("<p>  a\t\tb \n c  </p>") == "a b c")
  }

  test("unterminated <p> extracts to end without crashing") {
    assert(Html.extractText("<p>tail text") == "tail text")
    assert(Html.extractText("<p >x</p") == "x")  // unterminated trailing tag is dropped
  }

  test("property: round-trip identity over 500 seeded random word texts") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz&<>\"'"
    for (_ <- 1 to 500) {
      val nWords = rng.nextInt(80)
      val t = Seq.fill(nWords) {
        Seq.fill(1 + rng.nextInt(8))(alphabet(rng.nextInt(alphabet.length))).mkString
      }.mkString(" ")
      val got = Html.extractText(Html.wrapHtmlBytes(t, "u", "en"))
      assert(got == Html.normalizeWs(t), s"drift on: $t")
    }
  }
}
