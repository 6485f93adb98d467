package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — step 0 of every web-crawl training
  * pipeline (the jusText/trafilatura core loop, restated as a
  * deterministic specification an oracle can recompute):
  *
  *  1. comments (`<!-- … -->`) removed;
  *  2. `<script>` / `<style>` elements removed WITH their content
  *     (case-insensitive, attribute-tolerant, unterminated blocks run
  *     to end-of-input);
  *  3. every remaining tag (`<…>`) replaced by one space — tag
  *     CONTENT (title, headings, paragraphs) is text and stays;
  *  4. character entities decoded: the named core (amp lt gt quot
  *     apos nbsp) plus decimal `&#NNN;` and hex `&#xNN;` forms;
  *     unknown or malformed entities pass through verbatim. Decoding
  *     runs AFTER tag stripping, so text-encoded markup (`&lt;b&gt;`)
  *     comes out as literal text and can never be stripped as a tag;
  *  5. whitespace (including the nbsp's U+00A0) collapsed to single
  *     spaces, ends trimmed.
  *
  * One pass per row (three precompiled regex passes + one manual
  * entity/whitespace scan), whole-stage codegen via SelfCallCodegen.
  * The q109 gate synthesizes markup around the fixture text in closed
  * form and requires byte-exact recovery.
  */
object HtmlToText {
  private val comments = java.util.regex.Pattern.compile("<!--.*?(-->|$)",
    java.util.regex.Pattern.DOTALL)
  private val blocks = java.util.regex.Pattern.compile(
    "<(script|style)\\b[^>]*>.*?(</\\1\\s*>|$)",
    java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE)
  private val tags = java.util.regex.Pattern.compile("<[^>]*>")

  private val named = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** Decode entities and collapse whitespace in one scan. */
  private def decodeAndCollapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false // collapse state; leading run drops
    var emitted = false
    def emit(c: Char): Unit = {
      // NB: Java's isWhitespace REJECTS U+00A0 — the nbsp needs its
      // own test or "a&nbsp;b" keeps a hard space the collapse misses
      if (Character.isWhitespace(c) || c == '\u00A0') {
        if (emitted) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c); emitted = true
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        var decoded = -1
        var skip = 0
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.length >= 2 && body.charAt(0) == '#') {
            val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
            val digits = if (hex) body.substring(2) else body.substring(1)
            val radix = if (hex) 16 else 10
            try {
              val v = Integer.parseInt(digits, radix)
              if (v >= 0 && v <= 0x10ffff) { decoded = v; skip = semi - i + 1 }
            } catch { case _: NumberFormatException => }
          } else named.get(body) match {
            case Some(ch) => decoded = ch.toInt; skip = semi - i + 1
            case None     =>
          }
        }
        if (decoded >= 0) {
          if (decoded > 0xffff) { // astral: emit the surrogate pair
            val chars = Character.toChars(decoded)
            emit(chars(0)) // high surrogate is never whitespace…
            sb.append(chars(1)) // …so the low half follows directly
          } else emit(decoded.toChar)
          i += skip
        } else { emit(c); i += 1 }
      } else { emit(c); i += 1 }
    }
    sb.toString
  }

  def extract(html: String): String = {
    val noComments = comments.matcher(html).replaceAll(" ")
    val noBlocks = blocks.matcher(noComments).replaceAll(" ")
    val noTags = tags.matcher(noBlocks).replaceAll(" ")
    decodeAndCollapse(noTags)
  }
}

/** Outlink extraction — the link-graph construction step of a crawl
  * pipeline (in/out-degree, link-spam signals, seed discovery). Returns
  * every `<a … href=…>` target in document order: double-quoted,
  * single-quoted, or unquoted attribute forms, tag and attribute names
  * case-insensitive, whitespace around `=` tolerated. The raw
  * attribute value is returned verbatim (no entity decode, no
  * resolution) — feed [[UrlCanonicalize]] downstream for dedup-grade
  * keys. One precompiled-regex pass per row inside whole-stage
  * codegen. */
object ExtractLinksImpl {
  private[expressions] val href = java.util.regex.Pattern.compile(
    "<a\\b[^>]*?\\bhref\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))",
    java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.DOTALL)

  def extract(html: String): Array[String] = {
    val m = href.matcher(html)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) {
      val v =
        if (m.group(2) != null) m.group(2)
        else if (m.group(3) != null) m.group(3)
        else m.group(4)
      out += v
    }
    out.toArray
  }
}

/** Column form of [[ExtractLinksImpl.extract]]. */
case class ExtractLinks(child: Expression)
    extends UnaryExpression with SelfCallCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val links = ExtractLinksImpl.extract(v.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      links.map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column form of [[HtmlToText.extract]]. */
case class StripHtml(child: Expression)
    extends UnaryExpression with SelfCallCodegen {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      HtmlToText.extract(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Anchor extraction: every `<a … href=…>…</a>` as (href, text) in
  * document order — href exactly as [[ExtractLinksImpl]] captures it
  * (raw attribute value; canonicalize downstream), text as the
  * [[HtmlToText]] extraction of the element's inner HTML (nested markup
  * stripped, entities decoded, whitespace collapsed). Anchor text is
  * the classic off-page relevance/quality signal (it describes the
  * TARGET, written by the linking author), so link-graph pipelines
  * aggregate it per target alongside q113-style degree signals.
  *
  * Grammar limits mirror [[ExtractLinksImpl]] (regex-grade HTML): an
  * unclosed `<a>` yields empty text, and a literal `>` inside a later
  * attribute's quoted value ends the opening tag early. One
  * precompiled-regex pass + bounded forward scans per row. */
object ExtractAnchorsImpl {
  private val aClose = java.util.regex.Pattern.compile("</a\\s*>",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  def extract(html: String): Array[(String, String)] = {
    val m = ExtractLinksImpl.href.matcher(html)
    val cm = aClose.matcher(html)
    val out = new scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (m.find()) {
      val hrefVal =
        if (m.group(2) != null) m.group(2)
        else if (m.group(3) != null) m.group(3)
        else m.group(4)
      val tagEnd = html.indexOf('>', m.end)
      val text =
        if (tagEnd < 0) ""
        else if (cm.find(tagEnd + 1))
          HtmlToText.extract(html.substring(tagEnd + 1, cm.start))
        else ""
      out += ((hrefVal, text))
    }
    out.toArray
  }
}

/** Column form of [[ExtractAnchorsImpl.extract]]:
  * array<struct<href: string, text: string>>. */
case class ExtractAnchors(child: Expression)
    extends UnaryExpression with SelfCallCodegen {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("text", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val anchors =
      ExtractAnchorsImpl.extract(v.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      anchors.map { case (h, t) =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(h), UTF8String.fromString(t)): Any
      })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
