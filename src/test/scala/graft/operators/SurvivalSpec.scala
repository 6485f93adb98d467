package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  private def fpFold(steps: Seq[(Long, Long)]): Seq[Long] =
    steps.scanLeft(Survival.KmFpOne) { case (fp, (risk, d)) =>
      fp * (risk - d) / risk
    }.tail

  test("kaplanMeier: the classic textbook life table — at-risk walk, " +
      "censoring keeps survival flat, fp fold == driver replay, and " +
      "fp/2^40 bands the true product within k*2^-40") {
    // durations (event=1/censor=0): 6 subjects
    //   t=1 event, t=2 censor, t=3 event x2, t=5 censor, t=7 event
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L), (5L, 0L),
      (7L, 1L)).map { case (t, e) => ("g", t, e) }
    val got = Survival.kaplanMeier(rows.toDF("g", "t", "e"),
        "g", "t", "e")
      .orderBy($"t")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    // life table: t=1 n=6 d=1; t=2 n=5 c=1; t=3 n=4 d=2; t=5 n=2 c=1;
    // t=7 n=1 d=1
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
      Seq((1L, 6L, 1L, 0L), (2L, 5L, 0L, 1L), (3L, 4L, 2L, 0L),
        (5L, 2L, 0L, 1L), (7L, 1L, 1L, 0L)))
    val expFp = fpFold(Seq((6L, 1L), (5L, 0L), (4L, 2L), (2L, 0L),
      (1L, 1L)))
    assert(got.map(_._6) == expFp, "fp fold must equal the replay")
    // censor-only steps are exact no-ops
    assert(got(1)._6 == got(0)._6 && got(3)._6 == got(2)._6)
    // true product S: 5/6, 5/6, 5/12, 5/12, 0
    val truth = Seq(5.0 / 6, 5.0 / 6, 5.0 / 12, 5.0 / 12, 0.0)
    got.map(_._7).zip(truth).zipWithIndex.foreach { case ((s, tr), k) =>
      assert(s <= tr + 1e-15 && s >= tr * (1 - (k + 1) * math.pow(2, -40)),
        s"band violated at step $k: $s vs $tr")
    }
    assert(got.last._6 == 0L, "everyone dead -> survival exactly 0")
  }

  test("kaplanMeier: per-group independence, monotone survival on a " +
      "bigger deterministic fixture, loud rejection of bad event " +
      "flags") {
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", (i * 7 % 50).toLong, (i % 4 > 0).compare(false).toLong)
    }
    val df = rows.toDF("g", "t", "e")
    val got = Survival.kaplanMeier(df, "g", "t", "e")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    got.groupBy(_._1).foreach { case (g, rs) =>
      val byT = rs.sortBy(_._2)
      assert(byT.map(_._6) == byT.map(_._6).sorted.reverse,
        s"survival not monotone for $g")
      // at-risk at the first time = group size
      val n = rows.count(_._1 == g)
      assert(byT.head._3 == n.toLong)
      // replay the fold from the emitted life table
      val exp = fpFold(byT.map(r => (r._3, r._4)))
      assert(byT.map(_._6) == exp)
    }
    val bad = Seq(("g", 1L, 2L)).toDF("g", "t", "e")
    val err = intercept[Exception] {
      Survival.kaplanMeier(bad, "g", "t", "e").collect()
    }
    def causes(th: Throwable): Seq[Throwable] =
      if (th == null) Nil else th +: causes(th.getCause)
    assert(causes(err).exists(c => Option(c.getMessage)
      .exists(_.contains("event must be"))), err.toString)
  }

  test("logRank: identical arms score exactly 0; a separated fixture " +
      "rejects; statistic == an ordered driver replay of the " +
      "hypergeometric terms; censoring enters via at-risk only") {
    // identical arms: every (t, e) appears once per arm
    val same = Seq((1L, 1L), (2L, 0L), (3L, 1L), (5L, 1L), (8L, 0L))
      .flatMap { case (t, e) => Seq(("eq", t, e, 0), ("eq", t, e, 1)) }
    // separated: arm 0 dies early, arm 1 late; some censoring
    val sep = (Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 0L), (4L, 1L))
        .map { case (t, e) => ("sp", t, e, 0) }) ++
      (Seq((6L, 1L), (7L, 1L), (8L, 0L), (9L, 1L), (10L, 1L))
        .map { case (t, e) => ("sp", t, e, 1) })
    val df = (same ++ sep).toDF("g", "t", "e", "arm")
    val got = Survival.logRank(df, "g", "t", "e", col("arm"),
        critical = 3.8415)
      .as[(String, Long, Double, Double, Option[Double],
        Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("eq")._3 == 0.0 && got("eq")._6 == Some(false),
      s"identical arms must score 0: ${got("eq")}")
    assert(got("sp")._6 == Some(true),
      s"separated arms must reject: ${got("sp")}")
    // driver replay over pooled event times (censoring only thins the
    // at-risk sets)
    val rows = sep.map { case (_, t, e, a) => (t, e, a) }
    val times = rows.filter(_._2 == 1L).map(_._1).distinct.sorted
      .filter(t => rows.count(_._1 >= t) >= 2) // nt < 2 is undefined
    val terms = times.map { t =>
      val atRisk = rows.filter(_._1 >= t)
      val nt = atRisk.size.toDouble
      val n1t = atRisk.count(_._3 == 1).toDouble
      val dt = rows.count(r => r._1 == t && r._2 == 1L).toDouble
      val d1 = rows.count(r => r._1 == t && r._2 == 1L && r._3 == 1)
        .toDouble
      ((d1 * nt - dt * n1t) / nt,
        (dt * n1t * (nt - n1t) * (nt - dt)) / (nt * nt * (nt - 1)))
    }
    val (en, ev) = terms.foldLeft((0.0, 0.0)) { case ((a, b), (x, y)) =>
      (a + x, b + y) }
    assert(got("sp")._2 == times.size.toLong)
    assert(got("sp")._3 == en && got("sp")._4 == ev,
      s"replay mismatch: ${got("sp")} vs ($en, $ev)")
    assert(got("sp")._5.get == en * en / ev)

    // Breslow weights: identical arms still exactly 0; the separated
    // fixture matches a driver replay with w_t = n_t (numerator is an
    // exact integer; nt^2 cancels in the variance terms)
    val gotB = Survival.logRankBreslow(df, "g", "t", "e", col("arm"),
        critical = 3.8415)
      .as[(String, Long, Double, Double, Option[Double],
        Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(gotB("eq")._3 == 0.0 && gotB("eq")._6 == Some(false))
    val termsB = times.map { t =>
      val atRisk = rows.filter(_._1 >= t)
      val nt = atRisk.size.toDouble
      val n1t = atRisk.count(_._3 == 1).toDouble
      val dt = rows.count(r => r._1 == t && r._2 == 1L).toDouble
      val d1 = rows.count(r => r._1 == t && r._2 == 1L && r._3 == 1)
        .toDouble
      (d1 * nt - dt * n1t,
        (dt * n1t * (nt - n1t) * (nt - dt)) / (nt - 1))
    }
    val (enB, evB) = termsB.foldLeft((0.0, 0.0)) {
      case ((a, b2), (x, y)) => (a + x, b2 + y) }
    assert(gotB("sp")._3 == enB && gotB("sp")._4 == evB,
      s"Breslow replay mismatch: ${gotB("sp")} vs ($enB, $evB)")
    assert(gotB("sp")._5.get == enB * enB / evB)

    // Peto-Prentice weights: identical arms still exactly 0 (every
    // term's numerator is 0 regardless of weight); the separated
    // fixture matches a driver replay carrying the SAME fixed-point
    // floor fold fp_i = floor(fp_{i-1}*(n_i-d_i+1)/(n_i+1)) and the
    // fixed IEEE tree w*tnb / (w*w)*tvb in fold order
    val gotP = Survival.logRankPetoPrentice(df, "g", "t", "e",
        col("arm"), critical = 3.8415)
      .as[(String, Long, Double, Double, Option[Double],
        Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(gotP("eq")._3 == 0.0 && gotP("eq")._6 == Some(false))
    var fp = Survival.KmFpOne
    var (enP, evP) = (0.0, 0.0)
    times.foreach { t =>
      val atRisk = rows.filter(_._1 >= t)
      val nt = atRisk.size.toLong
      val n1t = atRisk.count(_._3 == 1).toLong
      val dt = rows.count(r => r._1 == t && r._2 == 1L).toLong
      val d1 = rows.count(r => r._1 == t && r._2 == 1L && r._3 == 1)
        .toLong
      fp = fp * (nt - dt + 1) / (nt + 1)
      val w = fp.toDouble / Survival.KmFpOne.toDouble
      val tnb = (d1 * nt - dt * n1t).toDouble / nt.toDouble
      val tvb = (dt * n1t * (nt - n1t) * (nt - dt)).toDouble /
        (nt * nt * (nt - 1)).toDouble
      enP += w * tnb
      evP += (w * w) * tvb
    }
    assert(gotP("sp")._3 == enP && gotP("sp")._4 == evP,
      s"Peto-Prentice replay mismatch: ${gotP("sp")} vs ($enP, $evP)")
    assert(gotP("sp")._5.get == enP * enP / evP)
    // the weight DISCOUNTS late terms: |Peto num| < |log-rank num| on
    // a fixture whose every weight is < 1 after the first event
    assert(math.abs(gotP("sp")._3) < math.abs(got("sp")._3))
  }

  test("coxTwoArm: identical arms give beta exactly 0; a known-hazard " +
      "fixture matches an INDEPENDENT golden-section maximizer of the " +
      "Breslow partial likelihood to 1e-8; exact life-table integers; " +
      "complete separation clamps with the right sign") {
    // identical arms: every U(beta=0) term is d1 - dt*n1t/nt = 0
    // (d1 = dt/2, n1t = nt/2 at every time), so Newton never moves
    val same = Seq((1L, 1L), (2L, 0L), (3L, 1L), (5L, 1L), (8L, 0L))
      .flatMap { case (t, e) => Seq(("eq", t, e, 0), ("eq", t, e, 1)) }
    // mixed fixture with ties, censoring, and a real effect: arm 1
    // fails earlier on average but arms overlap (finite MLE)
    val mix = (Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 0L), (4L, 1L),
        (6L, 1L), (9L, 0L))
        .map { case (t, e) => ("mx", t, e, 1) }) ++
      (Seq((2L, 1L), (5L, 1L), (7L, 1L), (8L, 0L), (9L, 1L),
        (10L, 1L), (11L, 0L))
        .map { case (t, e) => ("mx", t, e, 0) })
    // complete separation: every arm-1 subject fails before every
    // arm-0 subject — no finite MLE, beta must clamp POSITIVE
    val sep = (1 to 4).map(i => ("sep", i.toLong, 1L, 1)) ++
      (11 to 14).map(i => ("sep", i.toLong, 1L, 0))
    val df = (same ++ mix ++ sep).toDF("g", "t", "e", "arm")
    val got = Survival.coxTwoArm(df, "g", "t", "e", col("arm"))
      .as[(String, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("eq")._4 == 0.0, s"identical arms: ${got("eq")}")
    // complete separation: the likelihood is monotone (no finite MLE)
    // — Newton walks beta up ~1 per iteration once p saturates (U and
    // I both approach sum(1-p), so U/I -> 1): 8 iterations read ~10.1,
    // and enough iterations drive the walk into the +-30 clamp
    assert(got("sep")._4 > 5.0,
      s"separation must read large positive: ${got("sep")}")
    val clamped = Survival.coxTwoArm(df.filter($"g" === "sep"),
        "g", "t", "e", col("arm"), iters = 32)
      .as[(String, Long, Long, Double)].collect().head
    assert(clamped._4 == 30.0,
      s"separation must clamp at +30 once the step explodes: $clamped")
    // exact integers: mx has event times 1,2,4,5,6,7,9,10 (3,8,11 are
    // censor-only or become censor...) — derive from the fixture
    val rows = mix.map { case (_, t, e, a) => (t, e, a) }
    val times = rows.filter(_._2 == 1L).map(_._1).distinct.sorted
      .filter(t => rows.count(_._1 >= t) >= 2)
    assert(got("mx")._2 == times.size.toLong)
    assert(got("mx")._3 ==
      times.map(t => rows.count(r => r._1 == t && r._2 == 1L)).sum)
    // INDEPENDENT maximizer: golden-section search on the Breslow
    // partial log-likelihood L(b) = sum_t [b*d1 - dt*ln(n0 + n1*e^b)]
    // — no Newton, no shared code path
    def logLik(b: Double): Double = times.map { t =>
      val atRisk = rows.filter(_._1 >= t)
      val n1 = atRisk.count(_._3 == 1).toDouble
      val n0 = atRisk.size - n1
      val dt = rows.count(r => r._1 == t && r._2 == 1L).toDouble
      val d1 = rows.count(r => r._1 == t && r._2 == 1L && r._3 == 1)
        .toDouble
      b * d1 - dt * math.log(n0 + n1 * math.exp(b))
    }.sum
    val phi = (math.sqrt(5.0) - 1) / 2
    var (lo, hi) = (-30.0, 30.0)
    while (hi - lo > 1e-11) {
      val (a, b) = (hi - phi * (hi - lo), lo + phi * (hi - lo))
      if (logLik(a) < logLik(b)) lo = a else hi = b
    }
    val bStar = (lo + hi) / 2
    // 1e-6, not 1e-8: comparing nearly-equal likelihood VALUES near
    // a flat maximum localizes the argmax only to ~sqrt(ulp) — the
    // golden-section reference is the fuzzier of the two (measured
    // 4.5e-8 apart; Newton's gradient-based solve is the sharp one)
    assert(math.abs(got("mx")._4 - bStar) < 1e-6,
      s"Newton ${got("mx")._4} vs golden-section $bStar")
    // the effect direction is the fixture's construction
    assert(got("mx")._4 > 0.1)

    // STRATIFIED: a constant stratum is the unstratified model
    // bit-exactly (identical fold rows, identical instruction stream)
    val strat1 = Survival.coxTwoArmStratified(
        df.filter($"g" === "mx").withColumn("s", lit("only")),
        "g", "s", "t", "e", col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    assert(strat1 == got("mx"), s"$strat1 vs ${got("mx")}")
    // duplicating the fixture as a second stratum with SHIFTED times
    // (different baseline hazard scale, same within-stratum structure)
    // doubles U and I at every beta, so the Newton trajectory is the
    // same up to float-summation rounding — the stratified estimate
    // ignores the cross-stratum baseline difference BY CONSTRUCTION
    val twoStrata = (mix.map { case (g, t, e, a) =>
        (g, "sa", t, e, a) } ++
      mix.map { case (g, t, e, a) => (g, "sb", t + 100L, e, a) })
      .toDF("g", "s", "t", "e", "arm")
    val strat2 = Survival.coxTwoArmStratified(twoStrata,
        "g", "s", "t", "e", col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    assert(strat2._2 == got("mx")._2 * 2 &&
      strat2._3 == got("mx")._3 * 2)
    assert(math.abs(strat2._4 - got("mx")._4) < 1e-12,
      s"stratified ${strat2._4} vs unstratified ${got("mx")._4}")
    // whereas the UNSTRATIFIED model on the pooled rows sees the
    // shifted copy as "stratum b survives longer" and mixes that
    // baseline difference into its at-risk sets — a genuinely
    // different (and here attenuated) estimate
    val pooled = Survival.coxTwoArm(twoStrata, "g", "t", "e",
        col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    assert(math.abs(pooled._4 - got("mx")._4) > 1e-3,
      s"pooled ${pooled._4} should differ from stratified")
  }

  test("breslowBaseline: identical arms (beta = 0) reduce EXACTLY to " +
      "pooled Nelson-Aalen increments dt/nt; exp(-H0) brackets and " +
      "tracks the pooled KM curve; S1 = S0^(e^beta) pointwise; life " +
      "table integers match coxTwoArm's") {
    // identical arms: beta = 0 exactly, so H0 increments are dt/nt
    val same = Seq((1L, 1L), (2L, 1L), (4L, 0L), (5L, 1L), (7L, 1L))
      .flatMap { case (t, e) => Seq(("eq", t, e, 0), ("eq", t, e, 1)) }
    val df = same.toDF("g", "t", "e", "arm")
    val got = Survival.breslowBaseline(df, "g", "t", "e", col("arm"))
      .orderBy(col("t"))
      .as[(String, Long, Long, Long, Long, Long, Double, Double,
        Double, Double)]
      .collect()
    assert(got.forall(_._7 == 0.0), "identical arms must fit beta 0")
    // hand-walk Nelson-Aalen on the pooled table (10 subjects)
    var h = 0.0
    val expected = got.map { r =>
      h += r._4.toDouble / r._6.toDouble // dt/nt at beta=0
      (r._2, h)
    }
    got.zip(expected).foreach { case (r, (t, hExp)) =>
      assert(r._2 == t && math.abs(r._8 - hExp) < 1e-12,
        s"NA mismatch at t=$t: ${r._8} vs $hExp")
      assert(math.abs(r._9 - math.exp(-hExp)) < 1e-12)
      // beta = 0: both arms share the baseline curve
      assert(r._9 == r._10, "S1 must equal S0 at beta 0")
    }
    // exp(-H0) >= KM product-limit ALWAYS (1-x <= e^-x termwise),
    // and the two agree to O(sum d/n^2) on this fixture
    var km = 1.0
    got.foreach { r =>
      val frac = r._4.toDouble / r._6.toDouble
      km *= 1.0 - frac
      assert(r._9 >= km - 1e-12,
        s"exp(-H0)=${r._9} must dominate KM=$km")
      // the O(d/n²) agreement bound holds away from risk-set
      // exhaustion — at the final time everyone dies (KM hits 0
      // while e^-H stays positive), the textbook divergence
      if (frac < 0.5)
        assert(math.abs(r._9 - km) < 0.1,
          s"NA vs KM drifted: ${r._9} $km")
    }
    // a real two-arm fixture: the proportional-hazards readout is
    // S1 = S0^(e^beta) POINTWISE by construction, and the life-table
    // integers equal coxTwoArm's (same builder, spec-pinned)
    val mix = (Seq((1L, 1L), (2L, 1L), (2L, 1L), (4L, 1L), (6L, 0L),
        (9L, 1L)).map { case (t, e) => ("mx", t, e, 1) }) ++
      (Seq((2L, 1L), (5L, 1L), (7L, 1L), (8L, 0L), (10L, 1L),
        (11L, 0L)).map { case (t, e) => ("mx", t, e, 0) })
    val mxDf = mix.toDF("g", "t", "e", "arm")
    val bb = Survival.breslowBaseline(mxDf, "g", "t", "e", col("arm"))
      .orderBy(col("t"))
      .as[(String, Long, Long, Long, Long, Long, Double, Double,
        Double, Double)]
      .collect()
    val cox = Survival.coxTwoArm(mxDf, "g", "t", "e", col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    assert(bb.head._7 == cox._4, "beta must equal coxTwoArm's")
    assert(bb.length.toLong == cox._2 && bb.map(_._4).sum == cox._3,
      "life-table shape must match coxTwoArm")
    bb.foreach { r =>
      assert(math.abs(r._10 - math.pow(r._9, math.exp(r._7))) < 1e-12,
        s"S1 != S0^(e^beta) at t=${r._2}")
      assert(r._8 > 0 && r._9 > 0 && r._9 <= 1.0 + 1e-15)
    }
    // H0 is nondecreasing in t
    assert(bb.sliding(2).forall(p => p(0)._8 <= p(1)._8))
  }

  test("coxTwoArmEfron: no ties ⇒ equals Breslow bit-exactly; " +
      "identical arms give beta exactly 0; a tie-heavy fixture " +
      "matches an INDEPENDENT golden-section maximizer of the TRUE " +
      "Efron partial likelihood and sits farther from 0 than " +
      "Breslow (whose same-risk-set approximation attenuates)") {
    // all-distinct times: the tie expansion is the identity (one
    // sub-row per time, j = 0, fr = 0) — the fold walks the SAME
    // rows with the SAME arithmetic, so beta matches bit-for-bit
    val noTies = (Seq((1L, 1L), (3L, 1L), (4L, 0L), (6L, 1L),
        (9L, 1L)).map { case (t, e) => ("nt", t, e, 1) }) ++
      (Seq((2L, 1L), (5L, 1L), (7L, 0L), (8L, 1L), (10L, 1L))
        .map { case (t, e) => ("nt", t, e, 0) })
    val ntDf = noTies.toDF("g", "t", "e", "arm")
    val efNoTies = Survival.coxTwoArmEfron(ntDf, "g", "t", "e",
        col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    val brNoTies = Survival.coxTwoArm(ntDf, "g", "t", "e",
        col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    assert(efNoTies._4 == brNoTies._4,
      s"tie-free Efron ${efNoTies._4} != Breslow ${brNoTies._4}")
    // identical arms: p_j = 1/2 at every sub-row, U(0) = 0 exactly
    val same = Seq((1L, 1L), (2L, 1L), (2L, 1L), (5L, 0L))
      .flatMap { case (t, e) => Seq(("eq", t, e, 0), ("eq", t, e, 1)) }
    val eq = Survival.coxTwoArmEfron(same.toDF("g", "t", "e", "arm"),
        "g", "t", "e", col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    assert(eq._4 == 0.0, s"identical arms: $eq")
    // tie-heavy fixture: 3 times, many tied deaths each, real effect
    val ties = (Seq((1L, 1L), (1L, 1L), (1L, 1L), (2L, 1L), (2L, 1L),
        (3L, 0L), (3L, 1L)).map { case (t, e) => ("tz", t, e, 1) }) ++
      (Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 1L), (3L, 1L),
        (3L, 1L), (3L, 0L)).map { case (t, e) => ("tz", t, e, 0) })
    val tzDf = ties.toDF("g", "t", "e", "arm")
    val ef = Survival.coxTwoArmEfron(tzDf, "g", "t", "e", col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    val br = Survival.coxTwoArm(tzDf, "g", "t", "e", col("arm"))
      .as[(String, Long, Long, Double)].collect().head
    // events == tie-expansion sub-rows
    val rows = ties.map { case (_, t, e, a) => (t, e, a) }
    val events = rows.count(_._2 == 1L).toLong
    assert(ef._2 == events && ef._3 == events, ef.toString)
    // INDEPENDENT maximizer of the true Efron partial log-likelihood
    // L(b) = Σ_t [b·d1 − Σ_{j<d} ln(R_j(b))] — no Newton, no fold
    val times = rows.filter(_._2 == 1L).map(_._1).distinct.sorted
    def logLik(b: Double): Double = times.map { t =>
      val atRisk = rows.filter(_._1 >= t)
      val n1 = atRisk.count(_._3 == 1).toDouble
      val n0 = atRisk.size - n1
      val dt = rows.count(r => r._1 == t && r._2 == 1L).toDouble
      val d1 = rows.count(r => r._1 == t && r._2 == 1L && r._3 == 1)
        .toDouble
      b * d1 - (0 until dt.toInt).map { j =>
        val fr = j / dt
        math.log((n0 - fr * (dt - d1)) + (n1 - fr * d1) * math.exp(b))
      }.sum
    }.sum
    val phi = (math.sqrt(5.0) - 1) / 2
    var (lo, hi) = (-30.0, 30.0)
    while (hi - lo > 1e-11) {
      val (a, b) = (hi - phi * (hi - lo), lo + phi * (hi - lo))
      if (logLik(a) < logLik(b)) lo = a else hi = b
    }
    val bStar = (lo + hi) / 2
    assert(math.abs(ef._4 - bStar) < 1e-6,
      s"Newton ${ef._4} vs golden-section $bStar")
    // the attenuation story: with heavy ties Breslow's estimate sits
    // closer to 0 than Efron's on the same data (textbook direction)
    assert(ef._4 > 0.0 && br._4 > 0.0, s"$ef / $br")
    assert(math.abs(br._4) < math.abs(ef._4),
      s"Breslow ${br._4} should attenuate vs Efron ${ef._4}")
  }
}
