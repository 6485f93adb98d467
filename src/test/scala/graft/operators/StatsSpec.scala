package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSuite {
  import spark.implicits._

  private def units(g: String, v: Int, s: Int, n: Int) =
    Seq.fill(n)((g, v, s))

  test("chiSquare2x2: statistic matches the closed-form hand " +
      "calculation and the critical-value flag splits groups") {
    // group "sig": 2x2 = [[30,10],[10,30]] -> chi2 = 80*(900-100)^2 /
    // (40*40*40*40) = 20.0 ; group "null-ish": [[20,20],[20,20]] -> 0
    val rows = (units("sig", 0, 0, 30) ++ units("sig", 0, 1, 10) ++
      units("sig", 1, 0, 10) ++ units("sig", 1, 1, 30) ++
      units("flat", 0, 0, 20) ++ units("flat", 0, 1, 20) ++
      units("flat", 1, 0, 20) ++ units("flat", 1, 1, 20))
      .toDF("g", "v", "s")
    val got = Stats.chiSquare2x2(rows, "g",
        col("v").cast("long"), col("s").cast("long"),
        critical = 3.841458820694124)
      .select($"g", $"n00", $"n01", $"n10", $"n11", $"chi2",
        $"significant")
      .as[(String, Long, Long, Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("sig") == (("sig", 30L, 10L, 10L, 30L, 20.0, true)))
    assert(got("flat") == (("flat", 20L, 20L, 20L, 20L, 0.0, false)))
  }

  test("ksTest: D matches the hand-computed ECDF sup-difference and " +
      "the rejection flips with the critical factor") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(3L, 4L).toDF("v")
    // values 1,2,3,4: cna=1,2,3,3 cnb=0,0,1,2 ->
    // |cna*m - cnb*n| = 2,4,3,0 -> D_num=4, D=4/6
    val got = Stats.ksTest(a, b, "v")
      .select($"n", $"m", $"d_num", $"d", $"reject")
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(got == ((3L, 2L, 4.0, 4.0 / 6.0, false)))
    val loose = Stats.ksTest(a, b, "v", c = 0.1)
      .select($"reject").as[Boolean].collect().head
    assert(loose)
  }

  test("ksTestGrouped == per-group ksTest, including a null group as " +
      "its own stratum") {
    val a = Seq(("x", 1L), ("x", 2L), ("x", 3L), ("y", 5L), ("y", 6L),
      (null.asInstanceOf[String], 1L)).toDF("g", "v")
    val b = Seq(("x", 3L), ("x", 4L), ("y", 5L),
      (null.asInstanceOf[String], 9L)).toDF("g", "v")
    val got = Stats.ksTestGrouped(a, b, "g", "v")
      .select($"g", $"n", $"m", $"d_num", $"d", $"reject")
      .as[(Option[String], Long, Long, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    for (g <- Seq(Some("x"), Some("y"), None)) {
      val fa = a.filter(if (g.isEmpty) $"g".isNull else $"g" === g.get)
        .select($"v")
      val fb = b.filter(if (g.isEmpty) $"g".isNull else $"g" === g.get)
        .select($"v")
      val single = Stats.ksTest(fa, fb, "v")
        .select($"n", $"m", $"d_num", $"d", $"reject")
        .as[(Long, Long, Double, Double, Boolean)].collect().head
      assert(got(g) == ((g, single._1, single._2, single._3, single._4,
        single._5)), s"group $g")
    }
    // the null group fully separates: D = 1
    assert(got(None)._5 == 1.0)
  }

  test("giniConcentration: 0 on an even mix, the closed form on a " +
      "skewed one, duplicate keys aggregate, zero total yields NULL") {
    val even = Seq(("a", 10L), ("b", 10L), ("c", 10L)).toDF("k", "w")
    assert(Stats.giniConcentration(even, "k", "w")
      .select($"gini").as[Double].collect().head == 0.0)
    // weights 1,2,3,4 ascending: G = (2*(1+4+9+16) - 5*10)/(4*10) = 0.25
    val skew = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 2L),
      ("d", 2L)).toDF("k", "w") // d aggregates to 4
    assert(Stats.giniConcentration(skew, "k", "w")
      .select($"gini").as[Double].collect().head == 0.25)
    val zero = Seq(("a", 0L)).toDF("k", "w")
    assert(Stats.giniConcentration(zero, "k", "w")
      .select($"gini".isNull).as[Boolean].collect().head)
  }

  test("ksTest degenerate inputs (ADVICE r13): one empty side yields " +
      "ONE row with NULL d/reject (never a NaN comparing false), and " +
      "both sides empty still yield the documented ONE row") {
    val a = Seq(1L, 2L, 3L).toDF("x")
    val none = Seq.empty[Long].toDF("x")
    val oneEmpty = Stats.ksTest(a, none, "x").collect()
    assert(oneEmpty.length == 1)
    assert(oneEmpty.head.getAs[Long]("n") == 3L)
    assert(oneEmpty.head.getAs[Long]("m") == 0L)
    assert(oneEmpty.head.isNullAt(oneEmpty.head.fieldIndex("d")))
    assert(oneEmpty.head.isNullAt(oneEmpty.head.fieldIndex("reject")))
    val bothEmpty = Stats.ksTest(none, none, "x").collect()
    assert(bothEmpty.length == 1)
    assert(bothEmpty.head.getAs[Long]("n") == 0L)
    assert(bothEmpty.head.isNullAt(bothEmpty.head.fieldIndex("d")))
    // non-degenerate output shape unchanged by the guard
    val ok = Stats.ksTest(a, Seq(5L, 6L).toDF("x"), "x").collect()
    assert(ok.length == 1 && ok.head.getAs[Double]("d") == 1.0)
    assert(ok.head.getAs[Boolean]("reject") == false)
  }

  test("giniConcentration with a NULL key: the null stratum ranks " +
      "FIRST among equal weights on both engines (ADVICE r13 — Spark " +
      "NULLS FIRST vs DuckDB NULLS LAST would shift every rank)") {
    // null key ties weight 2 with "b": nulls-first rank order is
    // (null,2)=1, (b,2)=2, (c,3)=3 -> sw = 2 + 4 + 9 = 15
    // G = (2*15 - 4*7)/(3*7) = 2/21
    val mixed = Seq((Option.empty[String], 2L), (Some("b"), 2L),
      (Some("c"), 3L)).toDF("k", "w")
    val got = Stats.giniConcentration(mixed, "k", "w")
      .select($"gini").as[Double].collect().head
    assert(got == 2.0 / 21.0, s"got $got")
  }

  test("chiSquare2x2: a degenerate margin (nobody in variant 1) yields " +
      "NULL statistic and NULL flag, never NaN") {
    val rows = (units("g", 0, 0, 5) ++ units("g", 0, 1, 5))
      .toDF("g", "v", "s")
    val got = Stats.chiSquare2x2(rows, "g",
        col("v").cast("long"), col("s").cast("long"), 3.84)
      .select($"chi2".isNull, $"significant".isNull)
      .as[(Boolean, Boolean)].collect().head
    assert(got == ((true, true)))
  }

  test("PoissonThresholds pin: re-derived CDF table matches, is " +
      "strictly monotone, and the induced weights are genuinely " +
      "Poisson(1) (mean ~1, P(0) ~ e^-1) over many deterministic ids") {
    var pmf = math.exp(-1.0)
    var cdf = 0.0
    val expect = (0 to 8).map { k =>
      if (k > 0) pmf /= k
      cdf += pmf
      (cdf * graft.operators.Sketch.ThetaM.toDouble).toLong
    }
    assert(Stats.PoissonThresholds.toSeq == expect)
    assert(Stats.PoissonThresholds.sliding(2).forall(p => p(0) < p(1)))
    assert(Stats.PoissonThresholds.last < graft.operators.Sketch.ThetaM)
    // weight distribution over 20k (replicate, id) draws
    val u = conv(substring(md5(concat_ws(":", lit("bs"), $"r",
      $"id".cast("string"))), 1, 12), 16, 10).cast("long") + 1
    val w = Stats.PoissonThresholds.zipWithIndex
      .foldRight(lit(9L): org.apache.spark.sql.Column) {
        case ((t, k), acc) => when(u <= t, lit(k.toLong)).otherwise(acc) }
    val ws = (0 until 20000).map(i => (i % 4, i.toLong)).toDF("r", "id")
      .select(w.as("w")).as[Long].collect()
    val mean = ws.sum.toDouble / ws.length
    val p0 = ws.count(_ == 0L).toDouble / ws.length
    assert(math.abs(mean - 1.0) < 0.03, s"weight mean $mean")
    assert(math.abs(p0 - math.exp(-1.0)) < 0.02, s"P(w=0) $p0")
  }

  test("poissonBootstrapCi: exact point mean, lo < hi, b_eff = B, the " +
      "interval brackets the truth on a well-behaved group, interval " +
      "width shrinks ~sqrt(n), and reruns are bit-identical") {
    val rows = (0 until 2000).map(i => ("big", (i % 100).toLong, i.toLong)) ++
      (0 until 120).map(i => ("small", (i % 100).toLong, (10000 + i).toLong))
    val df = rows.toDF("g", "v", "id")
    def run() = Stats.poissonBootstrapCi(df, "g", "v", "id", b = 32)
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val got = run()
    assert(got == run(), "bootstrap must be deterministic")
    val (_, n, beff, mean, lo, hi) = got("big")
    assert(n == 2000L && beff == 32L)
    assert(mean == rows.filter(_._1 == "big").map(_._2).sum.toDouble / 2000)
    assert(lo < hi && lo <= mean && mean <= hi,
      s"big: [$lo, $hi] vs $mean") // true mean 49.5, n=2000: safe
    val (_, _, _, mS, loS, hiS) = got("small")
    assert(loS < hiS && loS <= mS && mS <= hiS)
    // relative width shrinks with n (sqrt(2000/120) ~ 4x; assert > 2x)
    assert((hiS - loS) > 2.0 * (hi - lo),
      s"small width ${hiS - loS} vs big ${hi - lo}")
  }

  test("poissonBootstrapQuantileCi: median bracket contains the true " +
      "median, a constant group collapses its CI to one bucket, the " +
      "CI endpoints are ordered, and reruns are bit-identical") {
    // "big": 2000 rows over values 0..99 (true median ~ 49/50);
    // "const": every row the same value -> every replicate median is
    // that value's bucket, so ci_lo_lb == ci_hi_lb == est_lb
    val rows = (0 until 2000).map(i =>
      ("big", (i % 100).toLong, i.toLong)) ++
      (0 until 150).map(i => ("const", 77L, (10000 + i).toLong))
    val df = rows.toDF("g", "v", "id")
    def run() = Stats.poissonBootstrapQuantileCi(df, "g", "v", "id",
        b = 32, permille = 500, hdrB = 5)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val got = run()
    assert(got == run(), "bootstrap must be deterministic")
    val (_, n, beff, lb, ub, ciLo, ciHi) = got("big")
    assert(n == 2000L && beff == 32L)
    // true median of 0..99 repeated: rank 1000 -> value 49
    assert(lb <= 49L && 49L <= ub, s"bracket [$lb, $ub] misses 49")
    assert(ciLo <= ciHi && ciLo <= lb && ub >= lb)
    val (_, nC, beffC, lbC, _, ciLoC, ciHiC) = got("const")
    assert(nC == 150L && beffC == 32L)
    // 77 has e = 6 > b = 5 -> bucket width 2^(6-5) = 2, lb = 76
    assert(lbC == 76L, s"expected lb 76 for value 77 at b=5, got $lbC")
    assert(ciLoC == lbC && ciHiC == lbC,
      s"constant group CI [$ciLoC, $ciHiC] != $lbC")
  }

  test("momentCensus: hand-computed moments on {1,2,3,4}, constant " +
      "group has variance 0 and NULL shape, singleton all-NULL") {
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(("c", 7L), ("c", 7L), ("c", 7L)) ++ Seq(("s", 5L)))
      .toDF("g", "v")
    val got = Stats.momentCensus(df, "g", "v")
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // {1,2,3,4}: M2=20, M3=0, M4=656; var=20/12, g1=0,
    // g2 = 656/400 - 3 = -1.36
    assert(got("a") == (("a", 4L, 2.5, Some(20.0 / 12.0), Some(0.0),
      Some(656.0 / 400.0 - 3.0))))
    assert(got("c") == (("c", 3L, 7.0, Some(0.0), None, None)))
    assert(got("s") == (("s", 1L, 5.0, None, None, None)))
  }

  test("trimmedMeanCensus: outlier drops (trimmed) or clamps " +
      "(winsorized) by hand-computed amounts; duplicates straddling " +
      "the cut keep exactly the overlap; trim 0 = plain mean") {
    // a: {1..10, 1000}, trim 100 permille -> t=1: drop 1 and 1000,
    //    keep 2..10 (sum 54, mean 6); winsor: 54 + 2 + 10 = 66 -> 6.0
    // d: {1,5,5,5,9}, trim 200 permille -> t=1: kept mass is the 5s
    val rows = ((1L to 10L) :+ 1000L).map(("a", _)) ++
      Seq(1L, 5L, 5L, 5L, 9L).map(("d", _))
    val df = rows.toDF("g", "v")
    val got = Stats.trimmedMeanCensus(df, "g", "v", 100)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 11L, 9L, 2L, 10L, 54L, 6.0, 6.0)))
    val gotD = Stats.trimmedMeanCensus(df.filter($"g" === "d"),
        "g", "v", 200)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(gotD == (("d", 5L, 3L, 5L, 5L, 15L, 5.0, 5.0)))
    val plain = Stats.trimmedMeanCensus(df.filter($"g" === "a"),
        "g", "v", 0)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(plain._3 == 11L && plain._6 == 1055L &&
      plain._7 == 1055.0 / 11.0 && plain._8 == 1055.0 / 11.0)
  }

  test("chi2InvUpper matches the canonical chi2(1) critical values " +
      "to 1e-6 (Acklam quantile)") {
    assert(math.abs(Stats.chi2InvUpper(0.05) - 3.841458820694124) < 1e-6)
    assert(math.abs(Stats.chi2InvUpper(0.01) - 6.634896601021215) < 1e-6)
    assert(math.abs(Stats.chi2InvUpper(0.10) - 2.705543454095404) < 1e-6)
  }

  test("chiSquareBhFdr: only the perfect-association slice clears its " +
      "BH line; ranks beyond m fail closed; decisions deterministic") {
    def block(g: String, n00: Int, n01: Int, n10: Int, n11: Int) =
      Seq.fill(n00)((g, 0L, 0L)) ++ Seq.fill(n01)((g, 0L, 1L)) ++
        Seq.fill(n10)((g, 1L, 0L)) ++ Seq.fill(n11)((g, 1L, 1L))
    // g1 chi2 = 40 (perfect), g3 chi2 = 0.4, g2 chi2 = 0
    val units = (block("g1", 20, 0, 0, 20) ++ block("g2", 10, 10, 10, 10)
      ++ block("g3", 11, 9, 9, 11)).toDF("g", "va", "su")
    val got = Stats.chiSquareBhFdr(units, "g", col("va"), col("su"),
        m = 3, alphaPermille = 50)
      .select($"g", $"chi2", $"rank", $"reject")
      .as[(String, Double, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g1") == (("g1", 40.0, 1L, true)))
    assert(got("g3") == (("g3", 0.4, 2L, false)))
    assert(got("g2") == (("g2", 0.0, 3L, false)))
    // m = 2 with 3 testable groups: rank 3 has no crit, fails closed
    val m2 = Stats.chiSquareBhFdr(units, "g", col("va"), col("su"),
        m = 2, alphaPermille = 50)
      .select($"g", $"rank", $"crit".isNull, $"reject")
      .as[(String, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(m2("g2") == (("g2", 3L, true, false)))
    assert(m2("g1")._4 == true)
  }

  test("chiSquareBhFdr large-m broadcast crit path: identical " +
      "columns, crit values, and decisions as the driver-side table " +
      "(no 10^5-element literal array in the plan)") {
    def block(g: String, n00: Int, n01: Int, n10: Int, n11: Int) =
      Seq.fill(n00)((g, 0L, 0L)) ++ Seq.fill(n01)((g, 0L, 1L)) ++
        Seq.fill(n10)((g, 1L, 0L)) ++ Seq.fill(n11)((g, 1L, 1L))
    val units = (block("g1", 20, 0, 0, 20) ++ block("g2", 10, 10, 10, 10)
      ++ block("g3", 11, 9, 9, 11)).toDF("g", "va", "su")
    val m = 2000
    val got = Stats.chiSquareBhFdr(units, "g", col("va"), col("su"),
      m = m, alphaPermille = 50)
    assert(got.columns.toSeq ==
      Seq("g", "n00", "n01", "n10", "n11", "chi2", "rank", "crit",
        "reject"))
    val rows = got.select($"g", $"rank", $"crit", $"reject")
      .as[(String, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // crit_i = chi2InvUpper(alpha * i / m), same doubles either path
    (1 to 3).foreach { i =>
      val g = rows.values.find(_._2 == i.toLong).get
      assert(g._3 == Stats.chi2InvUpper(0.05 * i / m))
    }
    assert(rows("g1")._4 == true && rows("g2")._4 == false)
  }

  test("msprtThreshold: closed-form recompute, monotone in n, " +
      "DEcreasing in alpha; a rejection at alpha=10 implies one at " +
      "alpha=50") {
    val c = Stats.msprtThreshold(100, 90000.0, 10000.0, 50)
    val v2 = 180000.0; val g = v2 + 100 * 10000.0
    val exp = (4.0 * 90000.0 * g / 10000.0) *
      (math.log(20.0) + 0.5 * math.log(g / v2))
    assert((BigDecimal(c) - BigDecimal(exp)).abs <= 1)
    val ns = Seq(10L, 100L, 1000L)
    assert(ns.map(Stats.msprtThreshold(_, 90000.0, 10000.0, 50))
      == ns.map(Stats.msprtThreshold(_, 90000.0, 10000.0, 50)).sorted)
    for (n <- ns)
      assert(Stats.msprtThreshold(n, 9e4, 1e4, 10) >
        Stats.msprtThreshold(n, 9e4, 1e4, 50))
  }

  test("msprtCuped == a brute-force sequential replay: balanced looks " +
      "only, exact deltas, per-look and always-valid decisions, " +
      "monotone quantized always-valid p; a real effect rejects and " +
      "STAYS rejected, a null group never does") {
    val looks = Seq(4L, 8L, 16L)
    val sigma2 = 25.0; val tau2 = 25.0; val alphaPm = 50
    // grp "eff": treatment (arm 1) runs ~12 above control from unit 5
    // on; grp "nil": identical arms. covariate x = id % 7, theta = 1/2
    // (v = 2y - x). 20 units per arm per group, ordered by id.
    val rows = (0 until 40).flatMap { i =>
      val arm = i % 2
      val yEff = 50L + (if (arm == 1 && i >= 10) 12L else 0L) +
        (i % 5).toLong
      val yNil = 50L + (i % 5).toLong
      Seq(("eff", arm, yEff, i.toLong), ("nil", arm, yNil, i.toLong))
    }
    val df = rows.toDF("g", "arm", "y", "id")
      .withColumn("x", col("id") % 7)
    val got = Stats.msprtCuped(df, "g", col("arm"), "y", "x", "id",
        "id", looks, thetaNum = 1, thetaDen = 2, sigma2 = sigma2,
        tau2 = tau2, alphaPermille = alphaPm)
      .as[(String, Long, Long, Boolean, Boolean, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // brute force replay
    val byArm = rows.map { case (g, a, y, id) =>
      (g, a, 2L * y - (id % 7), id) }
      .groupBy(t => (t._1, t._2))
      .view.mapValues(_.sortBy(_._4).map(_._3)).toMap
    for (g <- Seq("eff", "nil")) {
      var rejAny = false; var avP = 1000L
      for (n <- looks) {
        val t = byArm((g, 1)); val c = byArm((g, 0))
        assert(t.size >= n && c.size >= n) // all looks complete here
        val delta = t.take(n.toInt).sum - c.take(n.toInt).sum
        val d2 = BigInt(delta) * BigInt(delta)
        val rej = d2 >= Stats.msprtThreshold(n, sigma2, tau2, alphaPm)
        rejAny ||= rej
        val pNow = Stats.MsprtLadder.find(a =>
          d2 >= Stats.msprtThreshold(n, sigma2, tau2, a))
          .map(_.toLong).getOrElse(1000L)
        avP = math.min(avP, pNow)
        assert(got((g, n)) == ((g, n, delta, rej, rejAny, avP)),
          s"mismatch at ($g, $n): got ${got((g, n))}")
      }
    }
    assert(got(("eff", 16L))._5, "the real effect must reject")
    assert(got(("eff", 16L))._6 < 1000L)
    assert(!got(("nil", 16L))._5, "the null group must not reject")
    assert(got(("nil", 16L))._6 == 1000L)
    // unbalanced looks vanish: drop control units so only look 4
    // completes
    val trimmed = df.filter(!(col("g") === "eff" && col("arm") === 0 &&
      col("id") >= 10))
    val looksLeft = Stats.msprtCuped(trimmed, "g", col("arm"), "y",
        "x", "id", "id", looks, 1, 2, sigma2, tau2, alphaPm)
      .filter(col("grp") === "eff").select(col("look"))
      .as[Long].collect().toSet
    assert(looksLeft == Set(4L),
      s"only the balanced look must emit, got $looksLeft")
  }

  test("msprtRatio == a brute-force sequential replay on the " +
      "cross-multiplied surface; den=1 degenerates EXACTLY to the " +
      "mean mSPRT; a zero-denominator look is skipped") {
    val looks = Seq(4L, 8L, 16L)
    val sigma2 = 25.0; val tau2 = 25.0; val alphaPm = 50
    // grp "eff": treatment ratio runs high (numerator lifted, same
    // denominators); grp "nil": identical arms. den = id % 3 + 1.
    val rows = (0 until 40).flatMap { i =>
      val arm = i % 2
      val den = (i % 3).toLong + 1
      val nuEff = den * 50L + (if (arm == 1 && i >= 6) den * 9L else 0L) +
        (i % 5).toLong
      val nuNil = den * 50L + (i % 5).toLong
      Seq(("eff", arm, nuEff, den, i.toLong),
        ("nil", arm, nuNil, den, i.toLong))
    }
    val df = rows.toDF("g", "arm", "nu", "de", "id")
    val got = Stats.msprtRatio(df, "g", col("arm"), "nu", "de", "id",
        "id", looks, sigma2, tau2, alphaPm)
      .as[(String, Long, Long, Boolean, Boolean, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val byArm = rows.groupBy(t => (t._1, t._2))
      .view.mapValues(_.sortBy(_._5)).toMap
    for (g <- Seq("eff", "nil")) {
      var rejAny = false; var avP = 1000L
      for (n <- looks) {
        val t = byArm((g, 1)).take(n.toInt)
        val c = byArm((g, 0)).take(n.toInt)
        val (sT, xT) = (t.map(_._3).sum, t.map(_._4).sum)
        val (sC, xC) = (c.map(_._3).sum, c.map(_._4).sum)
        val a = BigInt(sT) * xC - BigInt(sC) * xT
        val p = a * (BigInt(xT) + xC)
        val q = BigInt(2) * xT * xC
        val rej = p * p >=
          Stats.msprtThreshold(n, sigma2, tau2, alphaPm) * q * q
        rejAny ||= rej
        val pNow = Stats.MsprtLadder.find(al =>
          p * p >= Stats.msprtThreshold(n, sigma2, tau2, al) * q * q)
          .map(_.toLong).getOrElse(1000L)
        avP = math.min(avP, pNow)
        assert(got((g, n)) == ((g, n, a.toLong, rej, rejAny, avP)),
          s"mismatch at ($g, $n): got ${got((g, n))}")
      }
    }
    assert(got(("eff", 16L))._5, "the real ratio effect must reject")
    assert(!got(("nil", 16L))._5, "the null group must not reject")
    // degenerate anchor: den = 1 for every unit ⇒ decisions equal the
    // mean mSPRT (msprtCuped with theta = 0/1, v = y) at every look,
    // and delta_num = n·delta (A = n(St−Sc) when Xt = Xc = n)
    val ones = df.withColumn("de", lit(1L))
    val ratio1 = Stats.msprtRatio(ones, "g", col("arm"), "nu", "de",
        "id", "id", looks, sigma2, tau2, alphaPm)
      .as[(String, Long, Long, Boolean, Boolean, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val mean1 = Stats.msprtCuped(ones.withColumn("x", lit(0L)), "g",
        col("arm"), "nu", "x", "id", "id", looks, thetaNum = 0,
        thetaDen = 1, sigma2 = sigma2, tau2 = tau2,
        alphaPermille = alphaPm)
      .as[(String, Long, Long, Boolean, Boolean, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(ratio1.keySet == mean1.keySet)
    ratio1.foreach { case (k @ (_, n), r) =>
      val m = mean1(k)
      assert(r._3 == n * m._3, s"delta_num != n*delta at $k")
      assert((r._4, r._5, r._6) == ((m._4, m._5, m._6)),
        s"degenerate decisions differ at $k: $r vs $m")
    }
    // a look with a zero denominator sum on one arm emits nothing:
    // zero out control denominators up to look 4 (group "nil")
    val zeroed = df.withColumn("de",
      when(col("g") === "nil" && col("arm") === 0 && col("id") < 8,
        lit(0L)).otherwise(col("de")))
    val zl = Stats.msprtRatio(zeroed, "g", col("arm"), "nu", "de",
        "id", "id", looks, sigma2, tau2, alphaPm)
      .filter(col("grp") === "nil").select(col("look"))
      .as[Long].collect().toSet
    assert(zl == Set(8L, 16L),
      s"zero-denominator look must be skipped, got $zl")
  }

  test("cmhTest: single stratum equals Pearson chi2 * (n-1)/n (the " +
      "textbook identity); pooled strata == an ordered driver replay; " +
      "Simpson-style strata pool correctly; degenerate strata drop") {
    def block(g: String, s: String, n00: Int, n01: Int, n10: Int,
        n11: Int) =
      Seq.fill(n00)((g, s, 0L, 0L)) ++ Seq.fill(n01)((g, s, 0L, 1L)) ++
        Seq.fill(n10)((g, s, 1L, 0L)) ++ Seq.fill(n11)((g, s, 1L, 1L))
    // one-stratum group: CMH = Pearson * (n-1)/n
    val one = block("one", "s0", 20, 10, 8, 22)
    // pooled group: two strata with the same direction of effect
    val pooled = block("pool", "sa", 12, 4, 6, 10) ++
      block("pool", "sb", 30, 10, 15, 25)
    // degenerate strata: n<2 and one-armed — must drop, not NaN
    val degen = block("pool", "sc", 1, 0, 0, 0) ++
      block("pool", "sd", 3, 2, 0, 0)
    val units = (one ++ pooled ++ degen).toDF("g", "s", "va", "su")
    val got = Stats.cmhTest(units, "g", "s", col("va"), col("su"),
        critical = 3.8415)
      .as[(String, Long, Double, Double, Option[Double],
        Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    val pearson = Stats.chiSquare2x2(
        one.toDF("g", "s", "va", "su"), "g", col("va"), col("su"), 3.8415)
      .select($"chi2").as[Double].collect().head
    val n = 60.0
    assert(math.abs(got("one")._5.get - pearson * (n - 1) / n) < 1e-12,
      s"single-stratum identity: ${got("one")._5.get} vs " +
        s"${pearson * (n - 1) / n}")
    // ordered driver replay of the pooled group (strata sorted by key)
    def term(n00: Int, n01: Int, n10: Int, n11: Int) = {
      val nn = (n00 + n01 + n10 + n11).toDouble
      val n1 = (n10 + n11).toDouble; val n0 = (n00 + n01).toDouble
      val m1 = (n01 + n11).toDouble; val m0 = (n00 + n10).toDouble
      ((n11 * nn - n1 * m1) / nn,
        (n1 * n0 * m1 * m0) / (nn * nn * (nn - 1)))
    }
    val ts = Seq(term(12, 4, 6, 10), term(30, 10, 15, 25))
    val (en, ev) = ts.foldLeft((0.0, 0.0)) { case ((a, b), (x, y)) =>
      (a + x, b + y) }
    assert(got("pool")._2 == 2L, "degenerate strata must drop")
    assert(got("pool")._3 == en && got("pool")._4 == ev)
    assert(got("pool")._5.get == en * en / ev)
  }

  test("spearmanCorr: monotone = 1 (ties included), reversed = -1, " +
      "constant column = NULL, independent-ish known value") {
    val rows = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 2L, 20L),
      ("up", 3L, 30L),
      ("dn", 1L, 9L), ("dn", 2L, 5L), ("dn", 3L, 1L),
      ("cn", 1L, 7L), ("cn", 2L, 7L), ("cn", 3L, 7L),
      // mix: x = 1,2,3,4; y = 2,1,4,3 -> rho = 1 - 6*4/(4*15) = 0.6
      ("mx", 1L, 2L), ("mx", 2L, 1L), ("mx", 3L, 4L), ("mx", 4L, 3L))
      .toDF("g", "x", "y")
    val got = Stats.spearmanCorr(rows, "g", "x", "y")
      .as[(String, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("up") == (("up", 4L, Some(1.0))))
    assert(got("dn") == (("dn", 3L, Some(-1.0))))
    assert(got("cn") == (("cn", 3L, None)))
    val rho = got("mx")._3.get
    assert(math.abs(rho - 0.6) < 1e-12, s"mx rho $rho")
  }

  test("mannWhitneyTest: hand-computed z on separated samples " +
      "(rejects at the 5% line by a hair), all-tied pool NULL, " +
      "empty side NULL") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(4L, 5L, 6L).toDF("v")
    val r = Stats.mannWhitneyTest(a, b, "v").as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    // U = 0, u2c = -9; vnum = 9*(7*6*5) = 1890, den = 360
    assert(r._1 == 3L && r._2 == 3L && r._3 == -9L)
    assert(r._4.get == -9.0 / (2.0 * math.sqrt(1890.0 / 360.0)))
    assert(r._5.get, "z = -1.964 clears 1.95996 two-sided")
    val tied = Stats.mannWhitneyTest(Seq(1L, 1L).toDF("v"),
      Seq(1L, 1L).toDF("v"), "v").as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    assert(tied == ((2L, 2L, 0L, None, None)))
    val empt = Stats.mannWhitneyTest(a, a.filter($"v" > 100), "v")
      .as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    assert(empt._2 == 0L && empt._4.isEmpty && empt._5.isEmpty)
  }

  test("benfordTest: powers of 2 conform (the classic Benford " +
      "sequence), a digit-uniform fixture is rejected, counts exact, " +
      "zero/negative values drop") {
    val p2 = (0 until 64).map(i => ("pow2", BigInt(2).pow(i) match {
      // keep magnitudes in long range by taking the leading digits
      case b if b > Long.MaxValue / 2 =>
        b.toString.take(15).toLong
      case b => b.toLong
    }))
    val unif = (1 to 9).flatMap(d => Seq.fill(20)(("unif", d * 111L)))
    val junk = Seq(("unif", 0L), ("unif", -5L)) // dropped
    val df = (p2 ++ unif ++ junk).toDF("g", "v")
    val got = Stats.benfordTest(df, "g", "v")
    val rows = got.collect().map(r => r.getString(0) -> r).toMap
    val pow2 = rows("pow2")
    assert(pow2.getLong(1) == 64L)
    // known first-digit census of 2^0..2^63: d=1 appears 19 times
    assert(pow2.getLong(2) == 19L, s"o1 = ${pow2.getLong(2)}")
    assert(pow2.getAs[Boolean]("conforms"),
      s"powers of 2 must conform: chi2 = ${pow2.getAs[Double]("chi2")}")
    val u = rows("unif")
    assert(u.getLong(1) == 180L, "zero/negative rows must drop")
    assert(!u.getAs[Boolean]("conforms"),
      s"uniform digits must fail: chi2 = ${u.getAs[Double]("chi2")}")
  }

  test("effectSize: hand-computed Cohen's d and Hedges' g; a side " +
      "with n < 2 or zero pooled variance is NULL; missing sides " +
      "drop (inner join)") {
    // g: a = {2,4}, b = {1,1,1} -> means 3, 1; M2a = 4, M2b = 0;
    //    sp2 = (4/2 + 0/3)/3 = 2/3; d = 2/sqrt(2/3); g = d*(1-3/11)
    // tiny: a has one row -> NULL; flat: both constant -> NULL
    val a = Seq(("g", 2L), ("g", 4L), ("tiny", 5L),
      ("flat", 7L), ("flat", 7L)).toDF("grp", "v")
    val b = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("tiny", 1L),
      ("tiny", 2L), ("flat", 7L), ("flat", 7L), ("only_b", 1L))
      .toDF("grp", "v")
    val got = Stats.effectSize(a, b, "grp", "v")
      .as[(String, Long, Long, Double, Double, Option[Double],
        Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(!got.contains("only_b"), "sides missing a group drop")
    val d = (3.0 - 1.0) / math.sqrt((4.0 / 2.0 + 0.0 / 3.0) / 3.0)
    assert(got("g") == (("g", 2L, 3L, 3.0, 1.0, Some(d),
      Some(d * (1.0 - 3.0 / 11.0)))))
    assert(got("tiny")._6.isEmpty, "n_a = 1 is undefined")
    assert(got("flat")._6.isEmpty, "zero pooled variance is undefined")
  }

  test("cuped: a perfect covariate (y = x) gives theta = 1, rho2 = 1, " +
      "and collapses both variants' adjusted means to the global " +
      "mean; a zero-variance covariate adjusts nothing (NULLs)") {
    val rows = Seq(
      ("g", 0L, 1L, 1L), ("g", 0L, 3L, 3L),
      ("g", 1L, 2L, 2L), ("g", 1L, 6L, 6L),
      ("z", 0L, 4L, 5L), ("z", 1L, 9L, 5L)) // x constant in z
      .toDF("grp", "variant", "y", "x")
    val got = Stats.cuped(rows, "grp", "variant", "y", "x")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("g", 0L)) == (("g", 0L, 2L, 2.0, Some(3.0), Some(1.0),
      Some(1.0))))
    assert(got(("g", 1L)) == (("g", 1L, 2L, 4.0, Some(3.0), Some(1.0),
      Some(1.0))))
    val z0 = got(("z", 0L))
    assert(z0._4 == 4.0 && z0._5.isEmpty && z0._6.isEmpty &&
      z0._7.isEmpty, s"zero-variance covariate: $z0")
  }

  test("wilsonCi: matches a from-first-principles recompute at " +
      "k = 5/10, stays honest at the k = 0 and k = n edges where " +
      "Wald collapses to zero width") {
    val rows = (0 until 10).map(i => ("mid", i < 5)) ++
      (0 until 8).map(_ => ("none", false)) ++
      (0 until 8).map(_ => ("all", true))
    val got = Stats.wilsonCi(rows.toDF("g", "s"), "g", "s")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val z = 1.959963984540054; val z2 = z * z
    def wilson(k: Long, n: Long): (Double, Double) = {
      val nD = n.toDouble; val ph = k.toDouble / nD
      val denom = 1.0 + z2 / nD
      val center = (ph + z2 / (2.0 * nD)) / denom
      val half = z * math.sqrt(ph * (1.0 - ph) / nD +
        z2 / (4.0 * nD * nD)) / denom
      (center - half, center + half)
    }
    val (lo, hi) = wilson(5, 10)
    assert(got("mid") == (("mid", 10L, 5L, 0.5, lo, hi)))
    val none = got("none")
    assert(none._4 == 0.0 && math.abs(none._5) < 1e-15 &&
      none._6 > 0.2 && none._6 < 0.5,
      s"k=0 must keep a real upper bar: $none")
    val all8 = got("all")
    assert(all8._4 == 1.0 && all8._5 > 0.5 && all8._5 < 0.8 &&
      all8._6 <= 1.0 + 1e-15,
      s"k=n must keep a real lower bar: $all8")
  }

  test("captureRecapture: Chapman estimate on a known population, " +
      "defined at zero overlap, one-sided groups degenerate to n1") {
    // g: A = {1..6}, B = {4..9}: n1=6 n2=6 m=3 -> (7*7/4)-1 = 11.25
    //    (true population 9 - the estimator lands nearby)
    // dj: disjoint catches {1,2} vs {3} -> (3*2/1)-1 = 5
    // solo: only in A -> n1
    val a = ((1 to 6).map(("g", _)) ++ Seq(("dj", 1), ("dj", 2),
      ("solo", 7), ("solo", 8))).toDF("grp", "key")
    val b = ((4 to 9).map(("g", _)) ++ Seq(("dj", 3))).toDF("grp", "key")
    val got = Stats.captureRecapture(a, b, "grp", "key")
      .as[(String, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 6L, 6L, 3L, 7.0 * 7.0 / 4.0 - 1.0)))
    assert(got("dj") == (("dj", 2L, 1L, 0L, 5.0)))
    assert(got("solo") == (("solo", 2L, 0L, 0L, 2.0)))
  }

  test("topShare: top decile of 1..10 is the max row, a tie block " +
      "straddling the cut keeps exactly its overlap, all-zero mass " +
      "is NULL") {
    val rows = (1L to 10L).map(("g", _)) ++ Seq.fill(4)(("t", 5L)) ++
      Seq(("z", 0L), ("z", 0L))
    val got = Stats.topShare(rows.toDF("grp", "v"), "grp", "v", 100)
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 10L, 1L, 10L, 55L, Some(10.0 / 55.0))))
    assert(got("z") == (("z", 2L, 1L, 0L, 0L, None)))
    val half = Stats.topShare(rows.toDF("grp", "v")
        .filter($"grp" === "t"), "grp", "v", 500)
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().head
    assert(half == (("t", 4L, 2L, 10L, 20L, Some(0.5))))
  }

  test("linearFit: hand-computed slope/intercept/r2 on a textbook " +
      "fixture; perfect line gives r2 exactly 1; weights replicate " +
      "rows exactly; constant x -> all NULL, constant y -> slope 0 " +
      "with NULL r2; negative weights and 38-digit overflow raise") {
    // y = 2x + 1 exactly: slope 2, intercept 1, r2 == 1.0 bit-exact
    val exact = (0L to 4L).map(x => ("line", x, 2 * x + 1, 1L))
    // textbook scatter {(1,2),(2,2),(3,4)}: n=3, Sxx=3*14-36=6,
    // Sxy=3*18-6*8=6 -> slope 1; intercept=(8*14-6*18)/6 = 4/6;
    // Syy=3*24-64=8 -> r2=36/48
    val scatter = Seq(("sc", 1L, 2L, 1L), ("sc", 2L, 2L, 1L),
      ("sc", 3L, 4L, 1L))
    val constX = Seq(("cx", 5L, 1L, 1L), ("cx", 5L, 9L, 1L))
    val constY = Seq(("cy", 1L, 7L, 1L), ("cy", 2L, 7L, 1L))
    val df = (exact ++ scatter ++ constX ++ constY)
      .toDF("g", "x", "y", "w")
    val got = Stats.linearFit(df, "g", "x", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("line")._4 == Some(2.0) && got("line")._5 == Some(1.0)
      && got("line")._6 == Some(1.0), got("line").toString)
    assert(got("sc") == (("sc", 3L, 3L, Some(1.0), Some(4.0 / 6.0),
      Some(36.0 / 48.0))), got("sc").toString)
    assert(got("cx")._4.isEmpty && got("cx")._5.isEmpty &&
      got("cx")._6.isEmpty, got("cx").toString)
    assert(got("cy")._4 == Some(0.0) && got("cy")._6.isEmpty,
      got("cy").toString)
    // integer weights ARE replication: w=3 on one row == 3 copies
    val wDf = Seq(("g", 1L, 2L, 3L), ("g", 4L, 9L, 1L))
      .toDF("g", "x", "y", "w")
    val rDf = (Seq.fill(3)(("g", 1L, 2L, 1L)) :+ (("g", 4L, 9L, 1L)))
      .toDF("g", "x", "y", "w")
    val wFit = Stats.linearFit(wDf, "g", "x", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    val rFit = Stats.linearFit(rDf, "g", "x", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(wFit._3 == rFit._3 && wFit._4 == rFit._4 &&
      wFit._5 == rFit._5 && wFit._6 == rFit._6, s"$wFit vs $rFit")
    def causes(th: Throwable): Seq[Throwable] =
      if (th == null) Nil else th +: causes(th.getCause)
    val neg = intercept[Exception] {
      Stats.linearFit(Seq(("g", 1L, 1L, -1L)).toDF("g", "x", "y", "w"),
        "g", "x", "y", Some("w")).collect()
    }
    assert(causes(neg).exists(c => Option(c.getMessage)
      .exists(_.contains("weights must be"))), neg.toString)
    // x = 9e18 twice: sum(w*x*x) alone exceeds 38 digits -> the
    // silent-null decimal overflow must raise, not report NULL slope
    val ovf = intercept[Exception] {
      Stats.linearFit(Seq(("g", 9000000000000000000L, 1L, 1L),
          ("g", 9000000000000000000L, 2L, 1L))
          .toDF("g", "x", "y", "w"),
        "g", "x", "y", Some("w")).collect()
    }
    assert(causes(ovf).exists(c => Option(c.getMessage).exists(m =>
      m.contains("38 digits") || m.contains("overflow") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE"))), ovf.toString)
  }

  test("multiFit: recovers an exact plane with r2 == 1 bit-exact; " +
      "agrees with an independent double-precision normal-equation " +
      "solve on a scatter; collinear covariates -> NULL; a dead " +
      "covariate reduces to linearFit; weights replicate; overflow " +
      "and negative weights raise") {
    // exact plane y = 4 + 3*x1 - 2*x2 over a non-degenerate grid
    val plane = for (a <- 0L to 3L; b <- 0L to 2L)
      yield ("pl", a, b, 4 + 3 * a - 2 * b, 1L)
    // scatter with noise: cross-check against a brute-force solve
    val scatter = (0 until 12).map { i =>
      ("sc", (i % 4).toLong, (i % 3).toLong,
        5L + 2 * (i % 4) - (i % 3) + (i % 5) - 2, (i % 2).toLong + 1)
    }
    // collinear: x2 = 2*x1 exactly -> singular Gram, NULL coeffs
    val col2 = (0L to 4L).map(i => ("co", i, 2 * i, 7 + i, 1L))
    val df = (plane ++ scatter ++ col2).toDF("g", "x1", "x2", "y", "w")
    val got = Stats.multiFit(df, "g", "x1", "x2", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("pl")._4 == Some(4.0) && got("pl")._5 == Some(3.0) &&
      got("pl")._6 == Some(-2.0) && got("pl")._7 == Some(1.0),
      got("pl").toString)
    assert(got("co")._4.isEmpty && got("co")._5.isEmpty &&
      got("co")._6.isEmpty && got("co")._7.isEmpty,
      got("co").toString)
    // brute-force weighted normal equations in doubles for "sc"
    locally {
      val rows = scatter.map { case (_, x1, x2, y, w) =>
        (x1.toDouble, x2.toDouble, y.toDouble, w.toDouble) }
      val sw = rows.map(_._4).sum
      val sx1 = rows.map(r => r._4 * r._1).sum
      val sx2 = rows.map(r => r._4 * r._2).sum
      val sy = rows.map(r => r._4 * r._3).sum
      val s11 = rows.map(r => r._4 * r._1 * r._1).sum
      val s12 = rows.map(r => r._4 * r._1 * r._2).sum
      val s22 = rows.map(r => r._4 * r._2 * r._2).sum
      val s1y = rows.map(r => r._4 * r._1 * r._3).sum
      val s2y = rows.map(r => r._4 * r._2 * r._3).sum
      val dD = sw * (s11 * s22 - s12 * s12) -
        sx1 * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s12 - s11 * sx2)
      val d0 = sy * (s11 * s22 - s12 * s12) -
        sx1 * (s1y * s22 - s12 * s2y) + sx2 * (s1y * s12 - s11 * s2y)
      val d1 = sw * (s1y * s22 - s12 * s2y) -
        sy * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s2y - s1y * sx2)
      val d2 = sw * (s11 * s2y - s1y * s12) -
        sx1 * (sx1 * s2y - s1y * sx2) + sy * (sx1 * s12 - s11 * sx2)
      assert(math.abs(got("sc")._4.get - d0 / dD) < 1e-9)
      assert(math.abs(got("sc")._5.get - d1 / dD) < 1e-9)
      assert(math.abs(got("sc")._6.get - d2 / dD) < 1e-9)
      // r2 in [0, 1] and below 1 (the fixture has real residuals)
      assert(got("sc")._7.exists(r => r >= 0.0 && r < 1.0))
    }
    // a CONSTANT second covariate is absorbed by the intercept: b1
    // and r2 equal linearFit on (x1, y) alone (same sums, exactly)
    val dead = (0L to 6L).map(i =>
      ("g", i, 5L, 3 + 2 * i + (i % 3), 1L))
    val mf = Stats.multiFit(dead.toDF("g", "x1", "x2", "y", "w"),
        "g", "x1", "x2", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    val lf = Stats.linearFit(dead.map(t => (t._1, t._2, t._4, t._5))
        .toDF("g", "x", "y", "w"), "g", "x", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    // constant x2 makes the Gram singular in the (1, x2) block ONLY
    // if treated as a third direction — here [1, x2] are collinear,
    // so D = 0 and multiFit reports NULL (honest), while linearFit
    // fits the line. Pin exactly that contract:
    assert(mf._4.isEmpty && mf._5.isEmpty,
      s"constant covariate must read as singular, got $mf")
    assert(lf._4.nonEmpty)
    // integer weights ARE replication
    val wDf = Seq(("g", 1L, 2L, 2L, 3L), ("g", 4L, 0L, 9L, 1L),
      ("g", 2L, 5L, 3L, 1L)).toDF("g", "x1", "x2", "y", "w")
    val rDf = (Seq.fill(3)(("g", 1L, 2L, 2L, 1L)) ++
      Seq(("g", 4L, 0L, 9L, 1L), ("g", 2L, 5L, 3L, 1L)))
      .toDF("g", "x1", "x2", "y", "w")
    val wF = Stats.multiFit(wDf, "g", "x1", "x2", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    val rF = Stats.multiFit(rDf, "g", "x1", "x2", "y", Some("w"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(wF._3 == rF._3 && wF._4 == rF._4 && wF._5 == rF._5 &&
      wF._6 == rF._6 && wF._7 == rF._7, s"$wF vs $rF")
    def causes(th: Throwable): Seq[Throwable] =
      if (th == null) Nil else th +: causes(th.getCause)
    val neg = intercept[Exception] {
      Stats.multiFit(Seq(("g", 1L, 1L, 1L, -1L))
          .toDF("g", "x1", "x2", "y", "w"),
        "g", "x1", "x2", "y", Some("w")).collect()
    }
    assert(causes(neg).exists(c => Option(c.getMessage)
      .exists(_.contains("weights must be"))), neg.toString)
    // 38-digit overflow in the determinant product tree must raise
    // loudly, never read as NULL/collinear: x1,x2 ~ 9e15 make
    // s11,s22 ~ 2e32 each (per-row products still fit 38 digits),
    // so the s11*s22 term inside D overflows
    val ovf = intercept[Exception] {
      Stats.multiFit((0L to 2L).map(i =>
          ("g", 9000000000000000L + i, 8000000000000000L - i * i,
            i + 1, 1L))
          .toDF("g", "x1", "x2", "y", "w"),
        "g", "x1", "x2", "y", Some("w")).collect()
    }
    assert(causes(ovf).exists(c => Option(c.getMessage).exists(m =>
      m.contains("38 digits") || m.contains("overflow") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE"))), ovf.toString)
  }

  test("group-sequential boundary constants reproduce the nominal " +
      "type-I error under a brute-force sequential simulation " +
      "(400k Brownian paths per design), and OBF spends less early " +
      "than Pocock") {
    // Under H0 the look statistics are a standard random walk
    // W_k ~ N(0, k) at equally-spaced looks. OBF's flat partial-sum
    // boundary rejects when |W_k| >= c*sqrt(K); Pocock when
    // |W_k|/sqrt(k) >= c. Empirical crossing rates must reproduce the
    // tabulated alpha within MC noise (SE ~ 0.0004 at alpha=0.05).
    val rnd = new java.util.Random(7)
    val paths = 400000
    for (k <- Seq(2, 3, 5); aPm <- Seq(50, 10)) {
      val alpha = aPm / 1000.0
      val cObf = Stats.ObfC((k, aPm))
      val cPoc = Stats.PocockC((k, aPm))
      var hitObf = 0; var hitPoc = 0
      var p = 0
      while (p < paths) {
        var w = 0.0; var i = 1
        var anyO = false; var anyP = false
        while (i <= k) {
          w += rnd.nextGaussian()
          if (math.abs(w) >= cObf * math.sqrt(k.toDouble)) anyO = true
          if (math.abs(w) / math.sqrt(i.toDouble) >= cPoc) anyP = true
          i += 1
        }
        if (anyO) hitObf += 1
        if (anyP) hitPoc += 1
        p += 1
      }
      val (eO, eP) = (hitObf.toDouble / paths, hitPoc.toDouble / paths)
      val tol = if (aPm == 50) 0.004 else 0.0016
      assert(math.abs(eO - alpha) < tol,
        s"OBF K=$k alpha=$alpha: empirical $eO")
      assert(math.abs(eP - alpha) < tol,
        s"Pocock K=$k alpha=$alpha: empirical $eP")
    }
    // OBF's early boundary on the Z scale is c*sqrt(K/k) — strictly
    // wider than Pocock's constant at k < K
    assert(Stats.ObfC((5, 50)) * math.sqrt(5.0) >
      Stats.PocockC((5, 50)))
  }

  test("groupSequential: balanced looks emit only when both arms " +
      "arrive, the OBF flat boundary latches rejected_any, and the " +
      "boundary literal matches a driver replay") {
    // 100 units/arm in two groups: "hot" carries a deterministic +40
    // per-unit treatment lift (crosses mid-sequence), "cold" is null.
    val rows = (0 until 200).flatMap { i =>
      Seq(("hot", i % 2, if (i % 2 == 1) 140L else 100L, i.toLong),
        ("cold", i % 2, 100L, i.toLong))
    } ++ // a group whose arm-1 stops at 15 units: NO look completes
      (0 until 45).map(i => ("thin", if (i < 30) 0 else 1, 100L,
        i.toLong))
    val looks = Seq(20L, 40L, 60L, 80L, 100L)
    val got = Stats.groupSequential(
      rows.toDF("g", "arm", "y", "ts"), "g", col("arm"), "y", "ts",
      "ts", looks, sigma2 = 400.0, alphaPermille = 50)
      .as[(String, Long, Long, Boolean, Boolean)]
      .collect().toSeq
    assert(!got.exists(_._1 == "thin"),
      "a look neither arm completes must not emit")
    val hot = got.filter(_._1 == "hot").sortBy(_._2)
    assert(hot.map(_._2) == looks, "hot completes every look")
    // delta at look n = 40n exactly
    assert(hot.map(_._3) == looks.map(_ * 40))
    // driver replay of the flat boundary: c(5,.05)^2 * 2 * 400 * 100
    val bound = Stats.gsThreshold(5, 100L, 100L, 400.0, 50,
      pocock = false)
    assert(bound == BigInt(math.ceil(2.040 * 2.040 * 800.0 * 100.0)
      .toLong))
    hot.foreach { r =>
      assert(r._4 == (BigInt(r._3) * BigInt(r._3) >= bound),
        s"look ${r._2}")
    }
    // 40n crosses sqrt(332928) ~ 577 at n >= 15: every look rejects
    // here; the cold group never does and never latches
    assert(hot.forall(_._5), "rejected_any latches once crossed")
    val cold = got.filter(_._1 == "cold")
    assert(cold.size == looks.size && cold.forall(r => !r._4 && !r._5))
    // Pocock's per-look boundary grows with n: at look 20 it is
    // TIGHTER than OBF's flat bound (early spending), and the
    // threshold scales linearly in the look
    val p20 = Stats.gsThreshold(5, 20L, 100L, 400.0, 50, pocock = true)
    assert(p20 < bound)
    val p100 = Stats.gsThreshold(5, 100L, 100L, 400.0, 50,
      pocock = true)
    assert(p100 == BigInt(math.ceil(2.413 * 2.413 * 800.0 * 100.0)
      .toLong) && p20 == BigInt(math.ceil(2.413 * 2.413 * 800.0 * 20.0)
      .toLong))
  }
}
