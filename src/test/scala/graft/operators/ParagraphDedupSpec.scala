package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkSuite {
  import spark.implicits._

  /** Scala reference: keep the globally first (id, pos) occurrence of
    * each paragraph, reassemble per doc in original order. */
  private def ref(docs: Seq[(Long, String)], sep: String = "\n")
      : Map[Long, (String, Long)] = {
    val inst = docs.flatMap { case (id, text) =>
      text.split(java.util.regex.Pattern.quote(sep), -1).zipWithIndex
        .map { case (p, pos) => (id, pos, p) }
    }
    val first = inst.groupBy(_._3).view
      .mapValues(_.map(r => (r._1, r._2)).min).toMap
    docs.map { case (id, text) =>
      val ps = text.split(java.util.regex.Pattern.quote(sep), -1).zipWithIndex
      val kept = ps.collect {
        case (p, pos) if first(p) == ((id, pos)) => p
      }
      id -> ((kept.mkString(sep), (ps.length - kept.length).toLong))
    }.toMap
  }

  private val corpus = Seq(
    (10L, "shared footer\nunique ten\nbanner A"),
    (11L, "banner A\nunique eleven\nshared footer"),
    (12L, "shared footer\nshared footer\nunique twelve"), // intra-doc dup
    (13L, "banner A"), // loses its only paragraph -> empty doc survives
    (14L, "unique fourteen\n\ntail")) // empty paragraph is a paragraph

  test("corpus-wide keep-first paragraph dedup matches the reference, " +
      "including intra-doc dups, all-dropped docs and empty paragraphs") {
    val got = ParagraphDedup
      .dedupeParagraphs(corpus.toDF("doc_id", "page"), "doc_id", "page")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == ref(corpus))
    assert(got(10L) == (("shared footer\nunique ten\nbanner A", 0L)))
    assert(got(11L) == (("unique eleven", 2L)))
    assert(got(13L) == (("", 1L))) // doc row survives with empty text
  }

  test("result is independent of input partitioning and row order") {
    val base = ParagraphDedup
      .dedupeParagraphs(corpus.toDF("doc_id", "page"), "doc_id", "page")
      .as[(Long, String, Long)].collect().toSet
    val shuffled = ParagraphDedup.dedupeParagraphs(
        corpus.reverse.toDF("doc_id", "page").repartition(7),
        "doc_id", "page")
      .as[(Long, String, Long)].collect().toSet
    assert(base == shuffled)
  }

  test("incremental paragraph dedup: corpus copies kill ALL batch " +
      "copies, fresh paragraphs keep-first within the batch, and the " +
      "corpus side never shuffles") {
    val lake = Seq(
      (0L, "shared footer\nlake only"),
      (1L, "banner A\nanother lake line"))
    val batch = Seq(
      (20L, "banner A\nfresh twenty\nshared footer"), // 2 corpus dups
      (21L, "fresh twenty\nfresh both"),   // intra-batch dup of 20's
      (22L, "fresh both\nunique tail"))    // intra-batch dup of 21's
    val got = ParagraphDedup.incrementalDedupeParagraphs(
        batch.toDF("doc_id", "page"), lake.toDF("doc_id", "page"),
        "doc_id", "page")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      20L -> (("fresh twenty", 2L)),       // both corpus dups dropped
      21L -> (("fresh both", 1L)),         // lost "fresh twenty" to 20
      22L -> (("unique tail", 1L))))       // lost "fresh both" to 21
    // partitioning independence
    val rep = ParagraphDedup.incrementalDedupeParagraphs(
        batch.reverse.toDF("doc_id", "page").repartition(5),
        lake.toDF("doc_id", "page").repartition(3),
        "doc_id", "page")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep == got)
    // plan contract: corpus paragraphs meet the batch via BROADCAST
    // joins only; hash exchanges are batch-sized (batch-key distinct,
    // corpus-hit partial distinct, winner agg, reassembly agg)
    val plan = ParagraphDedup.incrementalDedupeParagraphs(
        batch.toDF("doc_id", "page"), lake.toDF("doc_id", "page"),
        "doc_id", "page")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(plan).isDefined,
      s"corpus membership probe must be a broadcast semi join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 4, s"$shuffles exchanges — corpus shuffled?\n$plan")
  }

  test("large-delta (bloom) incremental paragraph dedup is " +
      "bit-identical to the exact path even at fpp=0.5, and the bloom " +
      "probe sits in the corpus scan") {
    val lake = Seq(
      (0L, "shared footer\nlake only"),
      (1L, "banner A\nanother lake line"))
    val batch = Seq(
      (20L, "banner A\nfresh twenty\nshared footer"),
      (21L, "fresh twenty\nfresh both"),
      (22L, "fresh both\nunique tail"))
    val exact = ParagraphDedup.incrementalDedupeParagraphs(
        batch.toDF("doc_id", "page"), lake.toDF("doc_id", "page"),
        "doc_id", "page")
      .as[(Long, String, Long)].collect().toSet
    val bloom = ParagraphDedup.incrementalDedupeParagraphsLarge(
        batch.toDF("doc_id", "page"), lake.toDF("doc_id", "page"),
        "doc_id", "page", expectedKeys = 8L, fpp = 0.5)
      .as[(Long, String, Long)].collect().toSet
    assert(bloom == exact) // false positives MUST die in the confirm
    val plan = ParagraphDedup.incrementalDedupeParagraphsLarge(
        batch.toDF("doc_id", "page"), lake.toDF("doc_id", "page"),
        "doc_id", "page", expectedKeys = 8L, fpp = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloommightcontain"),
      s"bloom probe must appear in the corpus side:\n$plan")
  }

  test("custom separator with regex metacharacters is taken literally") {
    val docs = Seq((1L, "a||b||a"), (2L, "b||c"))
    val got = ParagraphDedup
      .dedupeParagraphs(docs.toDF("doc_id", "page"), "doc_id", "page", "||")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> (("a||b", 1L)), 2L -> (("c", 1L))))
  }
}
