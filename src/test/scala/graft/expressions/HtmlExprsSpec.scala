package graft.expressions

import graft.SparkSuite
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class HtmlExprsSpec extends SparkSuite {
  import spark.implicits._

  private def x(s: String): String = HtmlToText.extract(s)

  test("tags strip to spaces, content stays, whitespace collapses") {
    assert(x("<html><body><h1>A</h1>\n  <p>b c</p></body></html>")
      == "A b c")
    assert(x("a<br/>b") == "a b")
    assert(x("  plain   text  ") == "plain text")
  }

  test("script/style vanish WITH content (case/attr tolerant, " +
      "unterminated runs to EOF); comments vanish") {
    assert(x("a<script>if (1 < 2) alert('x');</script>b") == "a b")
    assert(x("a<STYLE media=\"x\">p > span { }</STYLE>b") == "a b")
    assert(x("a<ScRiPt src=\"u\">var x;</sCrIpT >b") == "a b")
    assert(x("a<script>never closed") == "a")
    assert(x("a<!-- <p>not text</p> -->b") == "a b")
    assert(x("a<!-- unterminated") == "a")
  }

  test("entities: named + decimal + hex decode AFTER tag strip; " +
      "unknown/malformed pass through; nbsp collapses") {
    assert(x("&amp;&lt;b&gt;&quot;&apos;") == "&<b>\"'")
    assert(x("&#65;&#x42;&#x1F600;") == "AB😀")
    assert(x("x&nbsp;&nbsp;y") == "x y")
    assert(x("&bogus; &amp &#xZZ; 100&#37") == "&bogus; &amp &#xZZ; 100&#37")
    // &lt;script&gt; is TEXT, not a strippable tag
    assert(x("&lt;script&gt;alert&lt;/script&gt;") == "<script>alert</script>")
    assert(x("tab&#9;sep") == "tab sep") // decoded whitespace collapses
  }

  test("column path recovers the q109 synthetic page byte-exactly " +
      "(codegen)") {
    val text = "alpha beta gamma"
    val page = "<!DOCTYPE html><html><!-- id 7 --><head><title>Doc 7" +
      "</title><STYLE media=\"all\">p > span { color: #aaa; }</STYLE>" +
      "<script type=\"text/javascript\">if (1 < 2) alert(\"x\");" +
      "</script></head><body>\n  <h1 class=\"t\">Doc 7</h1>\n  <p>" +
      text.replace(" ", "</p>\n<p>") +
      "</p>\n  <div>&amp;&nbsp;&lt;raw&gt;&#65;&#x42;</div></body></html>"
    val got = Seq(page).toDF("h")
      .select(TextFunctions.stripHtml($"h").as("t")).as[String].head()
    assert(got == s"Doc 7 Doc 7 $text & <raw>AB")
    assert(Seq(page).toDF("h").select(TextFunctions.stripHtml(lit(null)
      .cast("string")).as("t")).as[Option[String]].head().isEmpty)
  }

  test("extractLinks: quoting forms, case-insensitive tag/attr, " +
      "document order, area decoy rejected, linkless page empty") {
    import graft.expressions.ExtractLinksImpl.{extract => links}
    assert(links("""<A HREF="https://a/x">t</A>""").toSeq
      == Seq("https://a/x"))
    assert(links("""<a class="k" Href='u2'>t</a>""").toSeq == Seq("u2"))
    assert(links("""<a href=/rel/p rel=nofollow>t</a>""").toSeq
      == Seq("/rel/p"))
    assert(links("""<a href = "spaced">t</a>""").toSeq == Seq("spaced"))
    assert(links("""<area href="map"><base href="b"><link href="c">""")
      .toSeq == Seq.empty) // only <a> anchors are outlinks
    assert(links("""<a href="1st"><p><a href='2nd'><a href=3rd>""").toSeq
      == Seq("1st", "2nd", "3rd"))
    assert(links("no anchors here").toSeq == Seq.empty)
  }

  test("extractAnchors pairs each href with the stripped inner text: " +
      "nested markup, entities, unclosed anchors, column path") {
    def anchors(h: String): Seq[(String, String)] =
      ExtractAnchorsImpl.extract(h).toSeq
    assert(anchors("""<a href="u"><b>Bold</b> link &amp; more</a>""")
      == Seq(("u", "Bold link & more")))
    assert(anchors("""<A HREF='x'>  spaced   words  </A>tail""")
      == Seq(("x", "spaced words")))
    // unclosed anchor -> empty text; following anchors unaffected
    assert(anchors("""<a href="open">never closed""")
      == Seq(("open", "")))
    assert(anchors("""<a href=a1>first</a><p><a href="a2">second</A>""")
      == Seq(("a1", "first"), ("a2", "second")))
    // decoys rejected exactly like ExtractLinks
    assert(anchors("""<area href="m"><a href="real">t</a>""")
      == Seq(("real", "t")))
    // the Column form round-trips the struct array
    val got = Seq(Tuple1("""<a href="u">t1</a><a href='v'>t2</a>"""))
      .toDF("html")
      .select(posexplode(TextFunctions.extractAnchors($"html"))
        .as(Seq("pos", "a")))
      .select($"pos", $"a.href", $"a.text")
      .as[(Int, String, String)].collect().toSeq
    assert(got == Seq((0, "u", "t1"), (1, "v", "t2")))
  }
}
