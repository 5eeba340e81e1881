package graft.extract

import java.nio.charset.StandardCharsets

/** Deterministic HTML → text extraction.
  *
  * This is the engine's single source of truth for the `pages.text` column:
  * the per-row invariant (BASELINE.json `input_hint`) is that `text` is
  * byte-identical, per url, to what this extractor produces from `html`.
  * The reference enforces the analogous contract with a char-by-char offset
  * walk that hard-fails on any drift
  * (`GLRE+KIRE/data_processing/tools.py:308-479`).
  *
  * Extraction contract (frozen; any change is a format version bump):
  *   1. decode UTF-8
  *   2. main text = the inner text of every <p>…</p> block, in document order
  *   3. inside a block: nested tags stripped, the five XML/HTML entities
  *      (&amp; &lt; &gt; &quot; &#39;) plus &nbsp; decoded
  *   4. whitespace runs ([ \t\n\r]+) collapsed to a single space, trimmed
  *   5. blocks joined with a single space
  *
  * Implemented as a hand-rolled scanner (no regex backtracking) so the hot
  * path stays allocation-light inside whole-stage codegen'd projections'
  * UDF calls.
  */
object Html {

  /** Decode the six supported entities in-place while appending to sb. */
  private def appendDecoded(sb: StringBuilder, s: String): Unit = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 6) {
          s.substring(i + 1, semi) match {
            case "amp"  => sb.append('&'); i = semi + 1
            case "lt"   => sb.append('<'); i = semi + 1
            case "gt"   => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case "#39"  => sb.append('\''); i = semi + 1
            case "nbsp" => sb.append(' '); i = semi + 1
            case _      => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
  }

  /** Strip tags from an element's inner HTML and decode entities. */
  private def innerText(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    var tagStart = -1
    var last = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') { tagStart = i; appendDecoded(sb, s.substring(last, i)) }
      else if (c == '>' && tagStart >= 0) { tagStart = -1; last = i + 1 }
      i += 1
    }
    if (tagStart < 0) appendDecoded(sb, s.substring(last, n))
    sb.toString
  }

  /** Collapse [ \t\n\r]+ runs to one space and trim. */
  def normalizeWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
      else {
        if (pendingSpace && sb.nonEmpty) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def lowerAt(html: String, i: Int, lit: String): Boolean = {
    if (i + lit.length > html.length) return false
    var k = 0
    while (k < lit.length) {
      if (Character.toLowerCase(html.charAt(i + k)) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Extract main text from raw page bytes per the frozen contract. */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return null
    extractText(new String(html, StandardCharsets.UTF_8))
  }

  /** Skip a <script>/<style> element if one opens at i; returns the index
    * just past its closing tag (or n if unterminated), or i if none opens. */
  private def skipNoise(html: String, i: Int): Int = {
    val n = html.length
    val tag =
      if (lowerAt(html, i, "<script")) "script"
      else if (lowerAt(html, i, "<style")) "style"
      else return i
    val closeLit = "</" + tag + ">"
    var j = i + tag.length + 1
    while (j < n) {
      if (html.charAt(j) == '<' && lowerAt(html, j, closeLit)) return j + closeLit.length
      j += 1
    }
    n
  }

  def extractText(html: String): String = {
    if (html == null) return null
    val out = new StringBuilder(html.length / 4)
    var i = 0
    val n = html.length
    while (i < n) {
      val skipped = if (html.charAt(i) == '<') skipNoise(html, i) else i
      if (skipped != i) { i = skipped }
      else if (html.charAt(i) == '<' && lowerAt(html, i, "<p")) {
        // must be "<p>" or "<p " (not <pre>, <param>, …)
        val after = i + 2
        if (after < n && (html.charAt(after) == '>' || html.charAt(after) == ' ')) {
          val open = html.indexOf('>', i)
          if (open < 0) { i = n }
          else {
            // find the case-insensitive closing </p>
            var j = open + 1
            var close = -1
            while (close < 0 && j < n) {
              if (html.charAt(j) == '<' && lowerAt(html, j, "</p>")) close = j
              j += 1
            }
            val end = if (close < 0) n else close
            val block = normalizeWs(innerText(html.substring(open + 1, end)))
            if (block.nonEmpty) {
              if (out.nonEmpty) out.append(' ')
              out.append(block)
            }
            i = if (close < 0) n else close + 4
          }
        } else i += 1
      } else i += 1
    }
    out.toString
  }

  /** Escape text for embedding into the synthetic HTML template. */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#39;")

  /** Deterministic synthetic page template. The body text is chunked into
    * <p> paragraphs of `parWords` words; head/nav/script/footer noise
    * exercises the extractor's skip paths. extractText(wrapHtml(t)) ==
    * normalizeWs(t) by construction — this is the byte-identity test. */
  def wrapHtml(text: String, title: String, lang: String, parWords: Int = 25): String = {
    val words = text.split(' ')
    val paras = words.grouped(parWords)
      .map(ws => s"  <p class=${"\""}body${"\""}>${escape(ws.mkString(" "))}</p>")
      .mkString("\n")
    s"""<!DOCTYPE html>
<html lang="$lang">
<head>
<meta charset="utf-8"/>
<title>${escape(title)}</title>
<style>body { font: 14px sans-serif; } .nav { color: #333; }</style>
<script type="text/javascript">var tracker = "do not extract < this >"; if (1 < 2) { tracker += "&amp;"; }</script>
</head>
<body>
<nav class="nav"><a href="/">home</a> | <a href="/about">about</a></nav>
<h1>${escape(title)}</h1>
<div class="content">
$paras
</div>
<footer>&copy; example.org &mdash; crawl fixture</footer>
</body>
</html>"""
  }

  def wrapHtmlBytes(text: String, title: String, lang: String): Array[Byte] =
    wrapHtml(text, title, lang).getBytes(StandardCharsets.UTF_8)
}
