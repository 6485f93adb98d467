package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition profile: hand-computable
  * fixtures for each signal, then the overlap/degenerate edge cases. */
class RepetitionSpec extends SparkSuite {
  import spark.implicits._

  private def profileOf(rows: (Long, String)*) =
    Repetition.profile(rows.toSeq.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("top-n-gram fractions and dup-5-gram coverage on hand-sized docs") {
    val p = profileOf(
      // 8 tokens; "a b" occurs 3x (positions 0,2,4), top bigram
      1L -> "a b a b a b c d",
      // no repeated bigram and no dup 5-gram at all
      2L -> "t0 t1 t2 t3 t4 t5 t6 t7")
    val d1 = p(1L)
    assert(d1.getAs[Long]("n_tokens") == 8)
    assert(d1.getAs[Long]("top2_count") == 3)
    assert(d1.getAs[Double]("top2_frac") == 3.0 * 2 / 8)
    // "a b a" and "b a b" each occur twice; top3_count = 2
    assert(d1.getAs[Long]("top3_count") == 2)
    // dup 5-grams: "a b a b a" (pos 0..4)? occurs once; no 5-gram
    // repeats inside doc 1, so coverage is 0
    assert(d1.getAs[Double]("dup5_cov") == 0.0)
    val d2 = p(2L)
    assert(d2.getAs[Long]("top2_count") == 1)
    assert(d2.getAs[Double]("dup5_cov") == 0.0)
    // a document too short for any n-gram scores 0 everywhere — one
    // row per input doc, never dropped, never null (filter totality)
    val short = profileOf(9L -> "solo")
    val d9 = short(9L)
    assert(d9.getAs[Long]("n_tokens") == 1)
    assert(d9.getAs[Long]("top2_count") == 0
      && d9.getAs[Double]("top2_frac") == 0.0
      && d9.getAs[Long]("top3_count") == 0
      && d9.getAs[Double]("top3_frac") == 0.0
      && d9.getAs[Double]("dup5_cov") == 0.0)
  }

  test("dup-5-gram coverage merges overlapping windows (union, not sum)") {
    // "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5 y" : 11 tokens; the 5-gram
    // "x1 x2 x3 x4 x5" occurs at pos 0 and 5 → windows [0,4] and
    // [5,9] are both flagged and merge into one island [0,9] → 10/11
    val p = profileOf(3L -> "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5 y")
    assert(p(3L).getAs[Double]("dup5_cov") == 10.0 / 11)
    // fully degenerate doc: every 5-gram identical → coverage 1.0 and
    // top2_frac exceeds 1 by design (overlapping occurrences — the
    // paper's count, documented in Repetition)
    val q = profileOf(4L -> Seq.fill(12)("z").mkString(" "))
    assert(q(4L).getAs[Double]("dup5_cov") == 1.0)
    assert(q(4L).getAs[Double]("top2_frac") > 1.0)
  }

  test("dupLineProfile matches a brute-force reference on planted " +
      "line duplicates and stays total on degenerate docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a\nbb\na\nccc"),      // 'a' dup: 2/4 lines, 2/7 chars
      (2L, "x\ny\nz"),            // no dups
      (3L, "w\nw\nw"),            // all dup
      (4L, ""),                   // one empty line: 0-char denominator
      (5L, "\n\nq"))              // empty line duplicated
    val got = Repetition.dupLineProfile(
        docs.toDF("doc_id", "page"), "doc_id", "page")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def ref(text: String): (Long, Double, Double) = {
      val ls = text.split("\n", -1)
      val byLine = ls.groupBy(identity)
      val dupLines = byLine.values.filter(_.length >= 2).map(_.length).sum
      val chars = ls.map(_.length).sum
      val dupChars = byLine.values.filter(_.length >= 2)
        .map(g => g.length * g.head.length).sum
      (ls.length.toLong, dupLines.toDouble / ls.length,
        if (chars == 0) 0.0 else dupChars.toDouble / chars)
    }
    docs.foreach { case (id, text) =>
      assert(got(id) == ref(text), s"doc $id") }
    assert(got(1L) == ((4L, 0.5, 2.0 / 7)))
    assert(got(4L) == ((1L, 0.0, 0.0))) // NaN-free on the empty doc
    // partitioning independence
    val rep = Repetition.dupLineProfile(
        docs.reverse.toDF("doc_id", "page").repartition(7),
        "doc_id", "page")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep == got)
  }

  test("fixture corpus: profile is total (one row per doc) and the " +
      "repetition family agrees with q68's top-term signal direction") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val prof = Repetition.profile(docs, "doc_id", "text")
    assert(prof.count() == docs.count())
    // every fraction is sane
    val bad = prof.filter(col("dup5_cov") < 0 || col("dup5_cov") > 1 ||
      col("top2_frac") <= 0).count()
    assert(bad == 0)
  }

  test("noveltyProfile: first doc is fully novel, an exact copy is " +
      "fully redundant, a half-extension scores in between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),          // exact copy -> novelty 0
      (3L, "x y z w a b c d"))      // new prefix + copied suffix
      .toDF("doc_id", "text")
    val got = Repetition.noveltyProfile(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 4L, 1.0)))
    assert(got(2L) == ((2L, 4L, 0L, 0.0)))
    // doc 3 shingles: "x y z","y z w","z w a","w a b","a b c","b c d"
    // -> 6 distinct, of which "a b c" and "b c d" were seen in doc 1
    assert(got(3L) == ((3L, 6L, 4L, 4.0 / 6.0)))
  }
}
