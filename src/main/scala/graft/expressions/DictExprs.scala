package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton (Aho & Corasick, CACM 18(6) 1975) over a
  * fixed phrase dictionary: goto/fail links built once, then every
  * input character advances the state exactly once and reports all
  * dictionary phrases ending at that position — O(len(text)) per
  * document INDEPENDENT of dictionary size, vs O(len · |dict|) for
  * per-phrase contains scans. Plain substring semantics (no word
  * boundaries), matching `contains`. */
private[expressions] final class AhoCorasick(dict: Seq[String]) {
  // nodes grow as the trie builds; children as per-node hash maps
  // (phrase alphabets are tiny; array-of-256 would bloat broadcast)
  private val children =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
  private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)

  dict.zipWithIndex.foreach { case (p, tag) =>
    var s = 0
    p.foreach { ch =>
      if (children(s).containsKey(ch)) s = children(s).get(ch)
      else {
        children += new java.util.HashMap[Char, Int]()
        out += Nil
        fail += 0
        children(s).put(ch, children.size - 1)
        s = children.size - 1
      }
    }
    out(s) = tag :: out(s)
  }
  // BFS failure links; outputs accumulate along fail chains
  locally {
    val q = new java.util.ArrayDeque[Int]()
    children(0).values().forEach(c => { fail(c) = 0; q.add(c) })
    while (!q.isEmpty) {
      val u = q.poll()
      children(u).entrySet().forEach { e =>
        val (ch, v) = (e.getKey, e.getValue)
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        fail(v) = if (children(f).containsKey(ch) &&
          children(f).get(ch) != v) children(f).get(ch) else 0
        out(v) = out(v) ++ out(fail(v))
        q.add(v)
      }
    }
  }

  /** Distinct matched tag ids, ascending. */
  def search(text: String): Array[Int] = {
    val hit = new Array[Boolean](dict.size)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !children(s).containsKey(ch)) s = fail(s)
      if (children(s).containsKey(ch)) s = children(s).get(ch)
      var o = out(s)
      while (o.nonEmpty) { hit(o.head) = true; o = o.tail }
      i += 1
    }
    val b = scala.collection.mutable.ArrayBuffer.empty[Int]
    var t = 0
    while (t < hit.length) { if (hit(t)) b += t; t += 1 }
    b.toArray
  }

  /** EVERY occurrence as (tag, 1-based start position) — overlapping
    * and repeated matches included — ordered by (pos, tag). */
  def searchSpans(text: String): Array[(Int, Int)] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !children(s).containsKey(ch)) s = fail(s)
      if (children(s).containsKey(ch)) s = children(s).get(ch)
      var o = out(s)
      while (o.nonEmpty) {
        // match ENDS at i (0-based): start = i - len + 1, as 1-based
        b += ((o.head, i - dict(o.head).length + 2))
        o = o.tail
      }
      i += 1
    }
    b.sortBy { case (tag, pos) => (pos, tag) }.toArray
  }
}

/** Distinct dictionary tags present in a text column, ascending tag id
  * — the taxonomy/keyword-tagging pass of a curation pipeline
  * ("label every doc that mentions any of these 10k product names").
  * The automaton rides the expression instance (one build per
  * executor via the reference object, the [[MatVec]] pattern), so the
  * corpus pass costs O(bytes) regardless of dictionary size — the
  * scale story [[graft.operators.PhraseSearch]]'s postings join (which
  * scales with phrase hits) cannot offer for large dictionaries.
  * Substring semantics == `contains(text, phrase)`, which is what
  * makes a small-dictionary SQL oracle exact. */
case class DictTags(child: Expression, dict: Seq[String])
    extends UnaryExpression with SelfCallCodegen {
  require(dict.nonEmpty, "dictionary must be non-empty")
  require(dict.forall(_.nonEmpty), "dictionary phrases must be non-empty")
  require(dict.distinct.size == dict.size, "dictionary has duplicates")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"dict_tags needs string, got ${t.simpleString}")
    }

  @transient private lazy val auto = new AhoCorasick(dict)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      auto.search(v.asInstanceOf[UTF8String].toString)
        .map(x => x: Any))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Every dictionary occurrence as struct(tag, pos) — pos the 1-based
  * start offset (SQL substr convention), overlapping and repeated
  * matches included, (pos, tag)-ordered. The SPAN form of [[DictTags]]
  * for annotation/redaction passes ("where exactly does the blocklist
  * term sit"); same one-pass automaton, same substring semantics, so
  * the oracle replays each entry's positions with substr equality. */
case class DictTagSpans(child: Expression, dict: Seq[String])
    extends UnaryExpression with SelfCallCodegen {
  require(dict.nonEmpty, "dictionary must be non-empty")
  require(dict.forall(_.nonEmpty), "dictionary phrases must be non-empty")
  require(dict.distinct.size == dict.size, "dictionary has duplicates")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tag", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"dict_tag_spans needs string, got ${t.simpleString}")
    }

  @transient private lazy val auto = new AhoCorasick(dict)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      auto.searchSpans(v.asInstanceOf[UTF8String].toString)
        .map { case (tag, pos) =>
          org.apache.spark.sql.catalyst.InternalRow(tag, pos): Any
        })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
