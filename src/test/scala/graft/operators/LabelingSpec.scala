package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Label aggregation: majority vote's deterministic tie-break and the
  * Bradley-Terry integer fixpoint replayed by a pure-Scala reference
  * (bit-exact — the q161 oracle's SQL unroll is the same computation
  * in a third engine).
  */
class LabelingSpec extends SparkSuite {
  import spark.implicits._

  test("majorityVote: modal label, tie breaks to smallest label, " +
      "agreement ratio") {
    val votes = Seq(
      (1L, "cat"), (1L, "cat"), (1L, "dog"),
      (2L, "dog"), (2L, "cat"),              // tie -> "cat"
      (3L, "owl")
    ).toDF("item", "label")
    val got = Labeling.majorityVote(votes, "item", "label")
      .select($"item", $"n_votes", $"label", $"label_votes", $"agreement")
      .as[(Long, Long, String, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 3L, "cat", 2L, 2.0 / 3),
      (2L, 2L, "cat", 1L, 0.5),
      (3L, 1L, "owl", 1L, 1.0)))
  }

  test("majorityVote: null labels are not votes") {
    val votes = Seq((1L, Some("a")), (1L, None), (1L, Some("b")),
      (1L, Some("b"))).toDF("item", "label")
    val got = Labeling.majorityVote(votes, "item", "label")
      .select($"n_votes", $"label", $"label_votes")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((3L, "b", 2L)))
  }

  /** Pure-Scala replay of the documented scaled-long MM update. */
  private def btReference(prefs: Seq[(String, String)], iters: Int,
      scale: Long): Map[String, Long] = {
    val clean = prefs.filter { case (w, l) => w != l }
    val items = clean.flatMap(p => Seq(p._1, p._2)).distinct
    val wins = clean.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nij = clean.groupBy { case (w, l) =>
      if (w < l) (w, l) else (l, w)
    }.view.mapValues(_.size.toLong).toMap
    val s2 = scale * scale
    var g = items.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      g = items.map { i =>
        val den = nij.collect {
          case ((x, y), n) if x == i || y == i =>
            val j = if (x == i) y else x
            n * (s2 / (g(i) + g(j)))
        }.sum
        i -> math.max(1L,
          (wins.getOrElse(i, 0L) * s2) / math.max(den, 1L))
      }.toMap
    }
    g
  }

  test("bradleyTerry matches the pure-Scala integer reference " +
      "bit-for-bit (transitive chain + upsets)") {
    val prefs = Seq(
      ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("b", "c"),
      ("c", "d"), ("a", "d"), ("d", "b"), ("a", "a"))
    val got = Labeling.bradleyTerry(prefs.toDF("w", "l"), "w", "l",
        iters = 3, scale = 100000L)
      .as[(String, Long)].collect().toMap
    assert(got == btReference(prefs, 3, 100000L))
    // the chain is load-bearing: a dominates, d (one upset win) beats
    // nothing else, c never wins
    assert(got("a") > got("b") && got("b") > got("c"))
  }

  test("bradleyTerry: a never-winning item floors at 1 and later " +
      "rounds stay well-defined") {
    val prefs = Seq(("a", "z"), ("b", "z"), ("a", "b"), ("b", "a"))
    val got = Labeling.bradleyTerry(prefs.toDF("w", "l"), "w", "l",
        iters = 4, scale = 100000L)
      .as[(String, Long)].collect().toMap
    assert(got == btReference(prefs, 4, 100000L))
    assert(got("z") == 1L)
    assert(got("a") > got("z") && got("b") > got("z"))
  }

  test("bradleyTerry: symmetric record gives symmetric strengths") {
    val prefs = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a"))
    val got = Labeling.bradleyTerry(prefs.toDF("w", "l"), "w", "l",
        iters = 3, scale = 100000L)
      .as[(String, Long)].collect().toMap
    assert(got("a") == got("b"))
  }

  test("fleissKappa matches the textbook worked example and a " +
      "pure-Scala replay; perfect agreement gives kappa 1, " +
      "all-one-category gives NULL (pe = 1), ragged panels refuse") {
    // Wikipedia's standard Fleiss example (n=10 items, r=14 raters,
    // 5 categories) — published kappa 0.209930...
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val votes = table.zipWithIndex.flatMap { case (row, i) =>
      row.zipWithIndex.flatMap { case (m, c) =>
        (0 until m).map(j => (i.toLong, s"r${c}_$j", s"cat$c")) }
    }.toDF("item", "rater", "label")
    val got = Labeling.fleissKappa(votes, "item", "rater", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 10L && got._2 == 14L)
    // exact-rational replay: A = sum m^2 - n*r, B = n*r*(r-1),
    // C = sum T_c^2, D = (n*r)^2; kappa = (A*D - C*B)/(B*D - C*B)
    val a = BigInt(table.flatten.map(m => m * m).sum - 10 * 14)
    val b = BigInt(10 * 14 * 13)
    val c = (0 until 5).map(cc =>
      BigInt(table.map(_(cc)).sum).pow(2)).sum
    val dd = BigInt(10 * 14).pow(2)
    assert(math.abs(got._3 -
      (BigDecimal(a) / BigDecimal(b)).toDouble) < 1e-15)
    val kExact = (BigDecimal(a * dd - c * b)
      / BigDecimal(b * dd - c * b)).toDouble
    assert(math.abs(got._5 - kExact) < 1e-12, s"${got._5} vs $kExact")
    assert(math.abs(got._5 - 0.2099) < 5e-4, "textbook value ~0.210")
    // perfect agreement across 3 raters -> kappa exactly 1
    val perfect = (0 until 4).flatMap(i => Seq("a", "b", "c").map(r =>
      (i.toLong, r, s"cat${i % 2}"))).toDF("item", "rater", "label")
    assert(Labeling.fleissKappa(perfect, "item", "rater", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head._5 == 1.0)
    // every rating one category: pe = 1 -> NULL kappa
    val mono = (0 until 4).flatMap(i => Seq("a", "b").map(r =>
      (i.toLong, r, "only"))).toDF("item", "rater", "label")
    val kNull = Labeling.fleissKappa(mono, "item", "rater", "label")
      .select(col("kappa").isNull).as[Boolean].collect().head
    assert(kNull)
    // ragged panel refused
    val ragged = Seq((1L, "a", "x"), (1L, "b", "x"), (2L, "a", "x"))
      .toDF("item", "rater", "label")
    val err = intercept[IllegalArgumentException] {
      Labeling.fleissKappa(ragged, "item", "rater", "label")
    }
    assert(err.getMessage.contains("same number of ratings"))
  }

  test("krippendorffAlpha: hand-computed nominal cases, a BigInt " +
      "rational replay on the ragged panel Fleiss refuses, NULL on a " +
      "single-category panel, unpairable items dropped") {
    import org.apache.spark.sql.functions.col
    def df(rows: Seq[(Long, String, String)]) =
      rows.toDF("item", "rater", "label")
    // (a,a) + (a,b): Do = 2/4, De = (16-10)/(4*3) = 1/2 -> alpha = 0
    val mixed = df(Seq((1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "a"), (2L, "r2", "b")))
    val m = Labeling.krippendorffAlpha(mixed, "item", "rater", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(m == ((4L, 2L, 0.5, 0.5, 0.0)))
    // perfect agreement on two distinct labels -> alpha exactly 1
    val perfect = df(Seq((1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "b"), (2L, "r2", "b")))
    assert(Labeling.krippendorffAlpha(perfect, "item", "rater", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head._5 == 1.0)
    // the RAGGED panel fleissKappa refuses: item 1 has 3 ratings,
    // item 2 has 2, item 3 has 1 (dropped as unpairable)
    val ragged = df(Seq(
      (1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "b"),
      (2L, "r1", "a"), (2L, "r2", "a"),
      (3L, "r1", "b")))
    intercept[IllegalArgumentException] {
      Labeling.fleissKappa(ragged, "item", "rater", "label")
    }
    val got = Labeling.krippendorffAlpha(ragged, "item", "rater",
        "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 5L && got._2 == 2L) // item 3 dropped
    // BigInt rational replay: L = lcm(2, 1) = 2
    // item1: o=(a:2,b:1), m=3 -> u0 = 2*1 + 1*2 = 4, weight 2/2=1
    // item2: o=(a:2), m=2 -> u0 = 0, weight 2/1=2
    val uu = BigInt(1 * 4 + 2 * 0)
    val n = BigInt(5); val s2 = BigInt(4 * 4 + 1 * 1)
    val deNum = n * n - s2
    val alpha = (BigDecimal(BigInt(2) * deNum - uu * (n - 1))
      / BigDecimal(BigInt(2) * deNum)).toDouble
    assert(got._3 == (BigDecimal(uu) / BigDecimal(2 * 5)).toDouble)
    assert(math.abs(got._5 - alpha) < 1e-15, s"${got._5} vs $alpha")
    // every rating one category: De = 0 -> NULL alpha
    val mono = df(Seq((1L, "r1", "x"), (1L, "r2", "x"),
      (2L, "r1", "x"), (2L, "r2", "x")))
    assert(Labeling.krippendorffAlpha(mono, "item", "rater", "label")
      .select(col("alpha").isNull).as[Boolean].collect().head)
    // nothing pairable: one NULL row, zero counts
    val lonely = df(Seq((1L, "r1", "a"), (2L, "r2", "b")))
    val l0 = Labeling.krippendorffAlpha(lonely, "item", "rater",
        "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(l0 == ((0L, 0L, None, None, None)))
  }

  // the weighted-metric worked example, verified against an
  // INDEPENDENT coincidence-matrix computation in exact rationals
  // (python fractions, the Krippendorff 2011 computing-note layout):
  // a ragged 5-point panel (item 7 single-rated, dropped), marginals
  // n = (3,5,3,3,1), 15 pairable ratings over 6 items.
  private def weightedPanel = Seq(
    (1L, "r1", 1L), (1L, "r2", 1L), (1L, "r3", 2L),
    (2L, "r1", 2L), (2L, "r2", 3L),
    (3L, "r1", 3L), (3L, "r2", 3L), (3L, "r3", 4L),
    (4L, "r1", 2L), (4L, "r2", 2L),
    (5L, "r1", 1L), (5L, "r3", 2L),
    (6L, "r1", 4L), (6L, "r2", 4L), (6L, "r3", 5L),
    (7L, "r1", 3L)
  ).toDF("item", "rater", "score")

  test("krippendorffAlphaInterval matches the independent worked " +
      "example exactly (alpha = 127/162), is affine-invariant in the " +
      "scale, and degrades ordering violations more than adjacent " +
      "ones") {
    val got = Labeling.krippendorffAlphaInterval(weightedPanel,
        "item", "rater", "score")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 15L && got._2 == 6L)
    // independent reference: do = 2/3, de = 108/35, alpha = 127/162
    assert(math.abs(got._3 - 2.0 / 3.0) < 1e-15, s"do ${got._3}")
    assert(math.abs(got._4 - 108.0 / 35.0) < 1e-15, s"de ${got._4}")
    assert(math.abs(got._5 - 127.0 / 162.0) < 1e-15, s"alpha ${got._5}")
    // interval alpha is invariant under v -> a*v + b (a != 0): both
    // do and de scale by a², the ratio cancels — exact with integers
    val shifted = weightedPanel.select($"item", $"rater",
      ($"score" * 3L + 7L).as("score"))
    val a2 = Labeling.krippendorffAlphaInterval(shifted, "item",
        "rater", "score")
      .as[(Long, Long, Double, Double, Double)].collect().head._5
    assert(math.abs(a2 - got._5) < 1e-15, s"affine drift: $a2 vs ${got._5}")
    // and it is strictly gentler on ADJACENT disagreement than the
    // nominal metric is: the panel's disagreements are all 1-step
    val nominal = Labeling.krippendorffAlpha(
        weightedPanel.select($"item", $"rater",
          $"score".cast("string").as("label")),
        "item", "rater", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head._5
    assert(got._5 > nominal,
      s"interval ${got._5} should exceed nominal $nominal on " +
        "adjacent-only disagreements")
  }

  test("krippendorffAlphaOrdinal matches the independent worked " +
      "example (alpha = 1553/1980, do/de in the documented W' " +
      "metric), and collapses to interval when marginals are uniform") {
    val got = Labeling.krippendorffAlphaOrdinal(weightedPanel,
        "item", "rater", "score")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 15L && got._2 == 6L)
    // independent reference in the W' = 2·cum − n_c metric:
    // W' = (3, 11, 19, 25, 29); do = 488/15, de = 1056/7
    assert(math.abs(got._3 - 488.0 / 15.0) < 1e-12, s"do ${got._3}")
    assert(math.abs(got._4 - 1056.0 / 7.0) < 1e-12, s"de ${got._4}")
    assert(math.abs(got._5 - 1553.0 / 1980.0) < 1e-15,
      s"alpha ${got._5}")
    // uniform marginals space the W' values evenly -> ordinal ==
    // interval exactly (the q221-style structural cross-check)
    val uniform = Seq(
      (1L, "r1", 1L), (1L, "r2", 1L), (1L, "r3", 2L),
      (2L, "r1", 2L), (2L, "r2", 3L),
      (3L, "r1", 3L), (3L, "r2", 3L), (3L, "r3", 4L),
      (4L, "r1", 4L), (4L, "r2", 4L),
      (5L, "r1", 1L), (5L, "r3", 2L),
      (6L, "r1", 5L), (6L, "r2", 5L), (6L, "r3", 5L)
    ).toDF("item", "rater", "score")
    val oU = Labeling.krippendorffAlphaOrdinal(uniform, "item",
        "rater", "score")
      .as[(Long, Long, Double, Double, Double)].collect().head._5
    val iU = Labeling.krippendorffAlphaInterval(uniform, "item",
        "rater", "score")
      .as[(Long, Long, Double, Double, Double)].collect().head._5
    assert(math.abs(oU - iU) < 1e-15,
      s"uniform marginals: ordinal $oU != interval $iU")
  }
}
