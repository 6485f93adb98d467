package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TaggerSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)

  test("Aho-Corasick tagging == per-phrase contains brute force on the " +
      "real corpus (fail links load-bearing: dict shares prefixes and " +
      "suffixes)") {
    val dict = Seq("agg", "agg row", "row scan", "scan", "spark quer",
      "merge", "rge sl") // "rge sl" straddles "merge slow" — suffix case
    val got = Tagger.tagDocs(docs, "doc_id", "text", dict)
      .select($"doc_id", $"tag_id").as[(Long, Long)].collect().toSet
    val texts = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val expect = (for {
      (id, t) <- texts
      (p, i) <- dict.zipWithIndex
      if t.contains(p)
    } yield (id, i.toLong)).toSet
    assert(got == expect,
      s"diff: ${(got diff expect).take(5)} / ${(expect diff got).take(5)}")
    // tagCoverage is the same set aggregated
    val cov = Tagger.tagCoverage(docs, "doc_id", "text", dict)
      .select($"tag_id", $"n_docs").as[(Long, Long)].collect().toMap
    val expCov = expect.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(cov == expCov)
  }

  test("tagSpans == brute-force substr positions on the real corpus " +
      "(every occurrence, overlaps and repeats included, 1-based)") {
    val dict = Seq("agg", "agg row", "scan", "an", "a")
    val got = Tagger.tagSpans(docs, "doc_id", "text", dict)
      .select($"doc_id", $"tag_id", $"pos")
      .as[(Long, Long, Long)].collect().toSet
    val texts = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val expect = (for {
      (id, t) <- texts.toSeq
      (p, tag) <- dict.zipWithIndex
      i <- 0 to t.length - p.length
      if t.regionMatches(i, p, 0, p.length)
    } yield (id, tag.toLong, (i + 1).toLong)).toSet
    assert(got == expect,
      s"diff: ${(got diff expect).take(5)} / ${(expect diff got).take(5)}")
    // spans refine tags: the distinct (doc, tag) projection of spans
    // equals tagDocs
    val viaSpans = got.map(r => (r._1, r._2))
    val viaTags = Tagger.tagDocs(docs, "doc_id", "text", dict)
      .select($"doc_id", $"tag_id").as[(Long, Long)].collect().toSet
    assert(viaSpans == viaTags)
  }

  test("spanPairs == brute-force pair replay on the real corpus " +
      "(distinct tags only, start-offset distance, boundary inclusive)") {
    val dict = Seq("agg", "agg row", "scan", "merge")
    val maxDist = 25
    val got = Tagger.spanPairs(docs, "doc_id", "text", dict, maxDist)
      .select($"doc_id", $"tag_a", $"pos_a", $"tag_b", $"pos_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val texts = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    def spansOf(t: String) = for {
      (p, tag) <- dict.zipWithIndex
      i <- 0 to t.length - p.length
      if t.regionMatches(i, p, 0, p.length)
    } yield (tag.toLong, (i + 1).toLong)
    val expect = (for {
      (id, t) <- texts.toSeq
      sp = spansOf(t)
      (ta, pa) <- sp
      (tb, pb) <- sp
      if ta < tb && math.abs(pa - pb) <= maxDist
    } yield (id, ta, pa, tb, pb)).toSet
    assert(got == expect,
      s"diff: ${(got diff expect).take(5)} / ${(expect diff got).take(5)}")
    // same-tag pairs are excluded even at distance 0, and the boundary
    // is inclusive: both pinned on a constructed row
    val rows = Seq((1L, "agg x agg then a merge here agg")).toDF("id", "t")
    // spans: agg@1, agg@7, agg@29 (same tag - never paired),
    // merge@18; |1-18|=17, |7-18|=11, |29-18|=11
    val small = Tagger.spanPairs(rows, "id", "t", Seq("agg", "merge"), 11)
      .select($"pos_a", $"pos_b").as[(Long, Long)].collect().toSet
    assert(small == Set((7L, 18L), (29L, 18L)), small.toString)
    val atBoundary = Tagger.spanPairs(rows, "id", "t",
        Seq("agg", "merge"), 17)
      .select($"pos_a", $"pos_b").as[(Long, Long)].collect().toSet
    assert(atBoundary == Set((1L, 18L), (7L, 18L), (29L, 18L)))
    // nested entries at the same offset co-occur at distance 0
    val nested = Tagger.spanPairs(
        Seq((1L, "agg row")).toDF("id", "t"),
        "id", "t", Seq("agg", "agg row"), 0)
      .select($"tag_a", $"pos_a", $"tag_b", $"pos_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(nested == Set((0L, 1L, 1L, 1L)))
    // null text yields no pairs; negative maxDist rejected
    assert(Tagger.spanPairs(Seq((1L, Option.empty[String])).toDF("id", "t"),
      "id", "t", Seq("a", "b"), 5).count() == 0L)
    intercept[IllegalArgumentException] {
      Tagger.spanPairs(rows, "id", "t", Seq("a", "b"), -1)
    }
  }

  test("edge cases: phrase at start/end, overlapping occurrences, " +
      "phrase == whole text, no-match, null text, duplicate dict " +
      "rejected") {
    val rows = Seq((1L, Option("abcabc")), (2L, Option("xabca")),
      (3L, Option("zzz")), (4L, Option.empty[String]), (5L, Option("bc")))
      .toDF("id", "t")
    val dict = Seq("abc", "bca", "bc", "abcabc", "zzz")
    val got = Tagger.tagDocs(rows, "id", "t", dict)
      .select($"id", $"tag_id").as[(Long, Long)].collect().toSet
    val expect = Set(
      (1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), // abcabc: all but zzz
      (2L, 0L), (2L, 1L), (2L, 2L),           // xabca
      (3L, 4L),                               // zzz (whole text)
      (5L, 2L))                               // bc == whole text
    assert(got == expect, got.toString)
    intercept[IllegalArgumentException] {
      Tagger.tagDocs(rows, "id", "t", Seq("a", "a")).count()
    }
    intercept[IllegalArgumentException] {
      Tagger.tagDocs(rows, "id", "t", Seq("a", "")).count()
    }
  }
}
