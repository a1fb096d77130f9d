package graft

import java.util.Locale

import graft.operators.HtmlCodec

/** Pins the single-pass HTML extractor (qx68's kernel): the classic
  * parser traps (comment decoys, raw-text spans, quote-aware attributes,
  * markup-vs-text entities), plus the three r7-advice hardenings —
  * locale-independent tag matching, HTML5 raw-text close-tag name
  * boundaries, and surrogate character-reference rejection — and the
  * code-point (not UTF-16) n_chars contract. */
class HtmlCodecSpec extends SparkTestBase {

  private val page =
    """<!DOCTYPE html>
      |<html><head><title>T &amp; t</title>
      |<style>p > a { color: #fff; }</style>
      |<script>if (2 < 3) { var s = "<b>no</b>"; }</script>
      |</head><body><!-- <div> decoy > -->
      |<h1 class="t">Head</h1>
      |<p data-x="a>b">body &lt;text&gt;</p>
      |<a href="/p?a=1&amp;b=2">link &gt; here</a>
      |</body></html>""".stripMargin

  test("traps: comment, raw-text, quoted attrs, markup entities") {
    val x = HtmlCodec.extract(page)
    assert(x.title === "T & t")
    assert(x.text === "Head body <text> link > here")
    assert(x.nLinks === 1L)
    assert(x.nEntities === 3L) // &lt; &gt; in <p>, &gt; in <a>; href's &amp; is markup
  }

  test("raw-text close requires a tag-name boundary (HTML5)") {
    // </scriptfoo> is NOT a close tag for <script>; </script > is.
    val h = "<body><script>a </scriptfoo> b</script >tail</body>"
    assert(HtmlCodec.extract(h).text === "tail")
    // Unterminated raw text swallows the rest of the document.
    val open = "<body>pre<script>x = 1;</body>"
    assert(HtmlCodec.extract(open).text === "pre")
  }

  test("tag matching is locale-independent (tr-TR dotless-i hazard)") {
    val saved = Locale.getDefault
    try {
      Locale.setDefault(new Locale("tr", "TR"))
      val x = HtmlCodec.extract(
        "<HTML><TITLE>Up</TITLE><BODY><SCRIPT>var x = \"<b>no</b>\";</SCRIPT>ok</BODY>")
      assert(x.title === "Up")
      assert(x.text === "ok")
    } finally Locale.setDefault(saved)
  }

  test("surrogate references stay literal; astral ones decode") {
    val x = HtmlCodec.extract("<body>a &#xD800; b &#x1F600; c</body>")
    assert(x.text === "a &#xD800; b 😀 c")
    assert(x.nEntities === 1L) // only the astral reference decoded
  }

  test("n_chars counts code points, not UTF-16 units") {
    import spark.implicits._
    val df = Seq((1L, "<body>&#x1F600;!</body>")).toDF("doc_id", "html")
    val row = HtmlCodec.extractDF(df).collect().head
    assert(row.getAs[String]("extracted") === "😀!")
    assert(row.getAs[Long]("n_chars") === 2L) // "😀!" = 2 code points, 3 UTF-16 units
  }

  test("whitespace collapse matches the oracle contract on edge shapes") {
    // Empty / padded inner text never yields a double space.
    assert(HtmlCodec.extract("<body>a <p></p> b</body>").text === "a b")
    assert(HtmlCodec.extract("<body>  x\t\r\n y  </body>").text === "x y")
  }
}
