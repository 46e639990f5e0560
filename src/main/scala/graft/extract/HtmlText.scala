package graft.extract

import java.nio.charset.StandardCharsets

/** Deterministic, byte-stable HTML → text extraction.
  *
  * The north rule requires a per-url invariant: extracted text must be
  * byte-identical across runs, partitionings and parallelism levels
  * (BASELINE.json input_hint). So this is a PURE function of the html
  * bytes: a single-pass tag stripper with a fixed entity table and a
  * fixed whitespace-collapse rule. No external parser, no locale, no
  * wall clock.
  *
  * Semantics (fixed, documented, versioned by [[version]]):
  *   1. Decode bytes as UTF-8 (malformed sequences → U+FFFD, the JDK
  *      default for CharsetDecoder REPLACE — deterministic).
  *   2. Drop <script>...</script>, <style>...</style> and <!-- -->
  *      comment contents entirely (case-insensitive tag match).
  *   3. Replace every remaining tag with a single space; block-level
  *      separation falls out of the collapse rule.
  *   4. Decode the fixed entity set: amp lt gt quot apos nbsp and
  *      numeric &#NNN; / &#xHHH; forms.
  *   5. Collapse every run of Unicode whitespace to one U+0020 and
  *      trim.
  *
  * Used from a codegen'd Column tree via a deterministic UDF only when
  * `text` is NULL in the source table — the input_hint provides both
  * `html` and `text`, and keeping extraction behind a null-gate lets
  * Parquet column pruning skip the (dominant) BINARY html column
  * whenever text is present (SURVEY.md §4.2).
  */
object HtmlText {

  /** Bump when extraction semantics change; part of the rule-set hash
    * so lineage rows invalidate on semantic change.
    */
  val version = "ht-1"

  def extract(html: Array[Byte]): String =
    extract(new String(html, StandardCharsets.UTF_8))

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val rest = html
        if (rest.regionMatches(true, i, "<!--", 0, 4)) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (rest.regionMatches(true, i, "<script", 0, 7)) {
          i = skipElement(html, i, "script")
        } else if (rest.regionMatches(true, i, "<style", 0, 6)) {
          i = skipElement(html, i, "style")
        } else {
          val close = html.indexOf('>', i)
          i = if (close < 0) n else close + 1
        }
        out.append(' ')
      } else if (c == '&') {
        val (decoded, next) = entity(html, i)
        out.append(decoded)
        i = next
      } else {
        out.append(c)
        i += 1
      }
    }
    collapse(out.toString)
  }

  /** Skip an element and its raw content: from '<' at `i` past the
    * matching case-insensitive closing tag. Unterminated → end.
    */
  private def skipElement(html: String, i: Int, tag: String): Int = {
    val closeTag = "</" + tag
    var j = html.indexOf('>', i)
    if (j < 0) return html.length
    // self-closing (<script src=x/>)
    if (j > 0 && html.charAt(j - 1) == '/') return j + 1
    var k = j + 1
    while (k < html.length) {
      if (html.regionMatches(true, k, closeTag, 0, closeTag.length)) {
        val end = html.indexOf('>', k)
        return if (end < 0) html.length else end + 1
      }
      k += 1
    }
    html.length
  }

  /** Decode one entity starting at '&'; returns (replacement, next index).
    * Unknown entities pass through literally.
    */
  private def entity(html: String, i: Int): (String, Int) = {
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val name = html.substring(i + 1, semi)
    val rep = name match {
      case "amp"  => "&"
      case "lt"   => "<"
      case "gt"   => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if name.startsWith("#x") || name.startsWith("#X") =>
        try String.valueOf(Character.toChars(Integer.parseInt(name.drop(2), 16)))
        catch { case _: Exception => null }
      case _ if name.startsWith("#") =>
        try String.valueOf(Character.toChars(Integer.parseInt(name.drop(1))))
        catch { case _: Exception => null }
      case _ => null
    }
    if (rep == null) ("&", i + 1) else (rep, semi + 1)
  }

  /** Collapse whitespace runs to a single space and trim. */
  private def collapse(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == ' ') pendingSpace = true
      else {
        if (pendingSpace && started) out.append(' ')
        out.append(c)
        pendingSpace = false
        started = true
      }
      i += 1
    }
    out.toString
  }
}
