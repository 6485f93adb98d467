package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CalibrateSpec extends SparkSuite {
  import spark.implicits._

  /** Reference sequential PAVA: the textbook pool-adjacent-violators
    * stack loop the minimax closed form must reproduce. Violation test
    * is exact integer cross-multiplication; block rates expand back to
    * one value per input bin. */
  private def pava(bins: Seq[(Long, Long, Long)]): Seq[Double] = {
    val stack = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    bins.sortBy(_._1).foreach { case (_, n, pos) =>
      stack += ((n, pos, 1))
      while (stack.size >= 2 && {
        val (n2, p2, _) = stack(stack.size - 2)
        val (n1, p1, _) = stack.last
        p2 * n1 >= p1 * n2 // prev mean >= last mean: pool
      }) {
        val (n1, p1, c1) = stack.remove(stack.size - 1)
        val (n2, p2, c2) = stack.remove(stack.size - 1)
        stack += ((n2 + n1, p2 + p1, c2 + c1))
      }
    }
    stack.toSeq.flatMap { case (n, p, c) =>
      Seq.fill(c)(p.toDouble / n.toDouble) }
  }

  private def fit(bins: Seq[(Long, Long, Long)]): Seq[(Long, Double)] = {
    val rows = bins.flatMap { case (s, n, pos) =>
      Seq.fill(pos.toInt)((s, 1)) ++ Seq.fill((n - pos).toInt)((s, 0)) }
    Calibrate.isotonicFit(rows.toDF("score", "label"), "score", "label")
      .select($"score", $"rate").as[(Long, Double)].collect()
      .sortBy(_._1).toSeq
  }

  test("minimax closed form == sequential PAVA, bit-exact rates " +
      "(non-monotone fixture with interior inversions and ties)") {
    val bins = Seq[(Long, Long, Long)](
      (1L, 10L, 1L), (2L, 5L, 3L), (3L, 8L, 2L),  // inversion 0.6 -> 0.25
      (4L, 4L, 2L), (5L, 6L, 3L),                 // tie 0.5 == 0.5
      (6L, 10L, 9L), (7L, 3L, 1L), (8L, 2L, 2L))  // inversion 0.9 -> 0.33
    val got = fit(bins)
    val exp = pava(bins)
    assert(got.map(_._2) == exp,
      s"got ${got.map(_._2)} vs pava $exp")
  }

  test("rates are nondecreasing in score and each pooled block's rate " +
      "is the block's exact pooled mean") {
    val bins = Seq[(Long, Long, Long)](
      (1L, 7L, 6L), (2L, 9L, 2L), (3L, 4L, 3L), (4L, 11L, 4L),
      (5L, 5L, 5L))
    val got = fit(bins)
    assert(got.map(_._2) == pava(bins))
    assert(got.map(_._2) == got.map(_._2).sorted, s"not monotone: $got")
  }

  test("already-isotonic input passes through unpooled") {
    val bins = Seq[(Long, Long, Long)](
      (1L, 10L, 1L), (2L, 10L, 3L), (3L, 10L, 7L))
    assert(fit(bins).map(_._2) == Seq(0.1, 0.3, 0.7))
  }

  test("isotonicFitGrouped: each group gets its own independent PAVA " +
      "curve, and a null group is a stratum like any other") {
    val rows =
      // group "a": inversion 0.8 -> 0.2 pools to 0.5
      Seq.fill(4)(("a", 1L, 1)) ++ Seq.fill(1)(("a", 1L, 0)) ++
      Seq.fill(1)(("a", 2L, 1)) ++ Seq.fill(4)(("a", 2L, 0)) ++
      // group "b": already isotonic 0.0 -> 1.0
      Seq.fill(2)(("b", 1L, 0)) ++ Seq.fill(2)(("b", 2L, 1)) ++
      // null group: single bin
      Seq.fill(2)((null: String, 1L, 1))
    val got = Calibrate.isotonicFitGrouped(
        rows.toDF("grp", "score", "label"), "grp", "score", "label")
      .select($"grp", $"score", $"rate")
      .as[(Option[String], Long, Double)].collect().toSet
    assert(got == Set(
      (Some("a"), 1L, 0.5), (Some("a"), 2L, 0.5),
      (Some("b"), 1L, 0.0), (Some("b"), 2L, 1.0),
      (None, 1L, 1.0)))
  }

  test("applyFit: step-function extension — exact bins, floor lookup " +
      "between bins, clamps below and above the fitted range; " +
      "single-bin fit applies everywhere") {
    val fit = Seq((10L, 0L, 0L, 0.2), (20L, 0L, 0L, 0.5),
      (40L, 0L, 0L, 0.9)).toDF("score", "n", "pos", "rate")
    val scored = Seq(5L, 10L, 15L, 20L, 39L, 40L, 99L).toDF("s")
    val got = Calibrate.applyFit(scored, fit, "s")
      .select($"s", $"calibrated").as[(Long, Double)].collect().toMap
    assert(got == Map(5L -> 0.2, 10L -> 0.2, 15L -> 0.2, 20L -> 0.5,
      39L -> 0.5, 40L -> 0.9, 99L -> 0.9))
    val one = Seq((7L, 0L, 0L, 0.4)).toDF("score", "n", "pos", "rate")
    assert(Calibrate.applyFit(Seq(1L, 100L).toDF("s"), one, "s")
      .select($"calibrated").as[Double].collect().toSeq == Seq(0.4, 0.4))
  }

  test("applyFit: a NULL (or non-castable) score calibrates to NULL, " +
      "never to the first bin's rate (ADVICE r13)") {
    val fit = Seq((10L, 0L, 0L, 0.2), (20L, 0L, 0L, 0.5))
      .toDF("score", "n", "pos", "rate")
    val scored = Seq(Some(15L), None, Some(25L)).toDF("s")
    val got = Calibrate.applyFit(scored, fit, "s")
      .select($"s", $"calibrated").as[(Option[Long], Option[Double])]
      .collect().toMap
    assert(got == Map(Some(15L) -> Some(0.2), None -> None,
      Some(25L) -> Some(0.5)))
    // a string score that fails the long cast is missing input too
    val junk = Seq("42", "not-a-number").toDF("s")
    val got2 = Calibrate.applyFit(junk, fit, "s")
      .select($"s", $"calibrated").as[(String, Option[Double])]
      .collect().toMap
    assert(got2 == Map("42" -> Some(0.5), "not-a-number" -> None))
  }

  test("conformalThreshold: qhat is the ceil((n+1)(1-alpha)/1)-th order " +
      "statistic per group, a too-small group yields NULL (no coverage " +
      "guarantee), and the split-conformal bound holds exactly") {
    // group g1: scores 10..90 step 10 (n=9); alpha=1/5 ->
    // r = ceil(10*4/5) = 8 -> qhat = 80
    val g1 = (1 to 9).map(i => ("g1", i * 10L, i.toLong))
    // group g2: n=2, alpha=1/5 -> r = ceil(3*4/5) = 3 > 2 -> NULL
    val g2 = Seq(("g2", 5L, 1L), ("g2", 7L, 2L))
    val got = Calibrate.conformalThreshold(
        (g1 ++ g2).toDF("grp", "v", "tb"), "grp", "v", "tb",
        alphaNum = 1, alphaDen = 5)
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("g1") == ((9L, Some(80L))))
    assert(got("g2") == ((2L, None)))
    // the guarantee's finite-sample form: #calibration scores > qhat
    // = n - r <= alpha*(n+1) - 1 < alpha*(n+1)
    assert(g1.count(_._2 > 80L) == 1)
    assert(1 < (9 + 1) / 5.0)
    // ties on the score: the tiebreak column makes the rank (and
    // therefore qhat) deterministic
    val ties = Seq(("t", 5L, 2L), ("t", 5L, 1L), ("t", 9L, 3L))
    val qt = Calibrate.conformalThreshold(ties.toDF("grp", "v", "tb"),
        "grp", "v", "tb", alphaNum = 1, alphaDen = 4)
      .as[(String, Long, Option[Long])].collect().head
    // r = ceil(4*3/4) = 3 -> the 3rd of (5,tb1),(5,tb2),(9,tb3) = 9
    assert(qt == (("t", 3L, Some(9L))))
  }

  test("maxBins guard refuses a corpus-sized score domain") {
    val rows = (1L to 50L).map(i => (i, (i % 2).toInt))
    val e = intercept[IllegalArgumentException] {
      Calibrate.isotonicFit(rows.toDF("score", "label"),
        "score", "label", maxBins = 10).collect()
    }
    assert(e.getMessage.contains("maxBins"))
  }
}
