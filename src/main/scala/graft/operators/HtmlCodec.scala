package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** REAL HTML text extraction in the typed codec slot — the WET-style
  * "strip the markup, keep the prose" stage every web-scale corpus runs
  * between the crawl and the quality screens (C4 / CCNet start from
  * exactly this step; the reference's study corpus presupposes it).
  *
  * The parser is a genuine single-pass HTML walker, not a regex strip:
  *  - comments (`<!-- ... -->`) are skipped whole, including any `<`/`>`
  *    decoys inside;
  *  - `<script>`/`<style>` are RAW-TEXT elements — their content (which
  *    legally contains `<`, `>`, quotes) is skipped to the matching
  *    case-insensitive close tag;
  *  - tag attribute values are scanned quote-aware, so a planted
  *    `data-x="a>b"` cannot terminate the tag early (the classic
  *    split-on-'>' bug);
  *  - character references decode in TEXT nodes only — named
  *    (&amp;amp; &amp;lt; &amp;gt; &amp;quot; &amp;apos;), decimal
  *    (&amp;#NN;) and hex (&amp;#xNN;); an entity inside an attribute
  *    value is markup, not text, and must NOT be counted;
  *  - visible text is collected from `<body>` only (title separately),
  *    then whitespace-collapsed (runs → one space, trimmed) — the same
  *    normalization contract qx66 pinned cross-engine.
  *
  * All outputs are strings/integers a DuckDB twin re-derives CLOSED-FORM
  * from the qx68 generator formula (it never parses HTML), so a leaked
  * attribute, an undecoded entity, a comment byte in the text or a
  * missed raw-text span each break the hash.
  *
  * Scale shape: identical to [[MultimodalCodec.decodePpm]] —
  * partition-parallel mapPartitions, no shuffle; cost is the payload
  * scan itself. At 100 TB this is the embarrassingly parallel stage.
  */
object HtmlCodec {

  final case class Extracted(title: String, text: String,
                             nLinks: Long, nEntities: Long)

  private def collapseWs(sb: StringBuilder): String = {
    val out = new StringBuilder(sb.length)
    var pendingSpace = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (out.nonEmpty) pendingSpace = true
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Decode one character reference starting at `i` (which points at
    * '&'). Returns (codepoint, charsConsumed) or (-1, 0) if not a valid
    * reference — in which case the '&' is literal text. Surrogate code
    * points (0xD800–0xDFFF) are rejected: HTML5 maps them to U+FFFD, and
    * emitting an unpaired surrogate would corrupt downstream UTF-8
    * encoding — here the whole reference stays literal text instead. */
  private def decodeEntity(html: String, i: Int): (Int, Int) = {
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return (-1, 0)
    val body = html.substring(i + 1, semi)
    val consumed = semi - i + 1
    body match {
      case "amp"  => ('&'.toInt, consumed)
      case "lt"   => ('<'.toInt, consumed)
      case "gt"   => ('>'.toInt, consumed)
      case "quot" => ('"'.toInt, consumed)
      case "apos" => ('\''.toInt, consumed)
      case b if b.length > 1 && b.charAt(0) == '#' =>
        val num = b.substring(1)
        try {
          val cp =
            if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
              Integer.parseInt(num.substring(1), 16)
            else Integer.parseInt(num, 10)
          if (cp > 0 && cp <= 0x10ffff &&
              !(cp >= 0xd800 && cp <= 0xdfff)) (cp, consumed) else (-1, 0)
        } catch { case _: NumberFormatException => (-1, 0) }
      case _ => (-1, 0)
    }
  }

  /** Find the raw-text close tag `</name` at-or-after `from`, requiring
    * the name to be followed by whitespace, '/' or '>' per HTML5 —
    * `</scriptfoo>` must NOT terminate a `<script>` span. Returns the
    * index of '<' or -1. */
  private def rawTextClose(lower: String, name: String, from: Int): Int = {
    val needle = "</" + name
    var e = lower.indexOf(needle, from)
    while (e >= 0) {
      val after = e + needle.length
      if (after >= lower.length) return e
      val ch = lower.charAt(after)
      if (ch == '>' || ch == '/' || ch == ' ' || ch == '\t' ||
          ch == '\n' || ch == '\r' || ch == '\f') return e
      e = lower.indexOf(needle, e + 1)
    }
    -1
  }

  /** Single-pass extraction. Unknown tags are stripped; unknown entities
    * stay literal; a document with no `<body>` yields empty text. */
  def extract(html: String): Extracted = {
    val n = html.length
    // Locale.ROOT: tag-name matching must be locale-independent (under
    // tr-TR a default-locale lowercase turns <TITLE> into "tıtle").
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val body = new StringBuilder
    val title = new StringBuilder
    var inBody = false
    var inTitle = false
    var links = 0L
    var ents = 0L
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
                   (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          // <!DOCTYPE ...> / processing instruction: skip to '>'
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
                   (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
          var j = i + 1
          val closing = html.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = lower.substring(ns, j)
          // scan to the tag-closing '>' honoring quoted attribute values
          var q: Char = 0
          var k = j
          var done = false
          while (k < n && !done) {
            val ch = html.charAt(k)
            if (q != 0) { if (ch == q) q = 0 }
            else if (ch == '"' || ch == '\'') q = ch
            else if (ch == '>') done = true
            k += 1
          }
          i = k
          if (!closing) name match {
            case "script" | "style" =>
              // raw-text element: content runs to the matching close tag
              val e = rawTextClose(lower, name, i)
              i = if (e < 0) n else e // close tag handled next iteration
            case "body"  => inBody = true
            case "title" => inTitle = true
            case "a"     => if (inBody) links += 1
            case _       =>
          } else name match {
            case "body"  => inBody = false
            case "title" => inTitle = false
            case _       =>
          }
        } else {
          // stray '<' that opens no tag: literal text
          if (inBody) body.append(c) else if (inTitle) title.append(c)
          i += 1
        }
      } else if (c == '&') {
        val (cp, consumed) = decodeEntity(html, i)
        if (cp >= 0) {
          if (inBody) { body.appendAll(Character.toChars(cp)); ents += 1 }
          else if (inTitle) title.appendAll(Character.toChars(cp))
          i += consumed
        } else {
          if (inBody) body.append(c) else if (inTitle) title.append(c)
          i += 1
        }
      } else {
        if (inBody) body.append(c) else if (inTitle) title.append(c)
        i += 1
      }
    }
    Extracted(collapseWs(title), collapseWs(body), links, ents)
  }

  /** The typed codec slot: (doc_id, html STRING) → extracted text and
    * markup statistics. Partition-parallel, shuffle-free. `n_chars`
    * counts Unicode CODE POINTS (not UTF-16 units) so an astral
    * reference like &#x1F600; counts as one character, matching the
    * DuckDB twin's length() semantics. */
  def extractDF(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("html")).as[(Long, String)]
      .mapPartitions(_.map { case (id, h) =>
        val x = extract(h)
        (id, x.title, x.text, x.nLinks, x.nEntities,
          x.text.codePointCount(0, x.text.length).toLong)
      })
      .toDF("doc_id", "title", "extracted", "n_links", "n_entities", "n_chars")
  }
}
