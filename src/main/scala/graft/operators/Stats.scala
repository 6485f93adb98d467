package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment / cohort significance testing — the A/B readout next to
  * the event-analytics family ([[Funnel]], [[Attribution]],
  * [[Anomaly]]): per metric group, Pearson's chi-squared test of
  * independence on the 2×2 (variant × success) table over UNITS, the
  * decision a pipeline owner reads before trusting an uplift.
  *
  * Numerics (the q183 discipline — every data-dependent double is a
  * fixed tree of correctly-rounded IEEE ops, identical in both
  * engines): the cross-product difference a·d − b·c is formed EXACTLY
  * in 128-bit integer arithmetic (decimal(38,0) here, HUGEINT in the
  * oracle — longs overflow at 100 TB unit counts: (10¹²)² = 10²⁴) and
  * cast to double once; the statistic is then one fixed
  * multiply/divide tree: χ² = (N·diff·diff) / ((r1·r2)·(c1·c2)).
  * A degenerate table (any zero marginal) yields NULL, not a NaN —
  * the test is undefined there and the gate should say so.
  * `critical` is the caller's χ²₁ critical value (3.8415 for 95%,
  * 2.7055 for 90%, 6.6349 for 99% — a literal, so the flag is exact).
  *
  * Scale shape: one partial+final hash agg from unit rows to four
  * cells per group; the statistic is a stateless projection over the
  * group-count-sized frame. Nothing global, nothing driver-side. */
object Stats {

  /** Poisson(1) inverse-CDF thresholds over the [1, 2^48] md5-hash
    * space — the SINGLE source of truth for [[poissonBootstrapCi]]'s
    * weight expression AND its oracle SQL (the gate interpolates these
    * literals into both engines, so no cross-engine float evaluation
    * ever happens: e^-1 is computed once, HERE). u ≤ thresholds(k) ⇒
    * weight k; u beyond the last threshold (CDF ≥ 1 − 1.1e-7) ⇒ the
    * capped weight 9. StatsSpec re-derives the table and pins it. */
  val PoissonThresholds: Array[Long] = {
    var pmf = math.exp(-1.0)
    var cdf = 0.0
    (0 to 8).map { k =>
      if (k > 0) pmf /= k
      cdf += pmf
      (cdf * graft.operators.Sketch.ThetaM.toDouble).toLong
    }.toArray
  }

  /** The deterministic Poisson(1) draw shared by the bootstrap
    * operators: u = md5("bs:replicate:id") uniform on [1, 2^48],
    * mapped through [[PoissonThresholds]]. */
  /** Pre-explode repartition with an EXPLICIT partition count: AQE
    * would coalesce the tiny narrow-row exchange to 1 partition (it
    * cannot see the explode + md5 work downstream); a user-specified
    * N is never coalesced. toIntOption with a defaultParallelism
    * fallback (ADVICE r16: platforms where the conf is non-numeric,
    * e.g. "auto", threw NumberFormatException at plan time). */
  private def repartForExplode(df: DataFrame, key: Column): DataFrame = {
    val n = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    df.repartition(n, key)
  }

  private def bootstrapWeight(r: Column, id: Column): Column = {
    // native md5-prefix kernel (r19) — bit-identical to the
    // conv(substring(md5)) composition, one digest per draw
    val u = graft.functions.SketchFunctions.md5Prefix(
      concat_ws(":", lit("bs"), r, id.cast("string")), 12) + 1
    PoissonThresholds.zipWithIndex
      .foldRight(lit(9L): Column) { case ((t, k), acc) =>
        when(u <= t, lit(k.toLong)).otherwise(acc) }
  }

  /** Per-group RATIO of sums with a Poisson-bootstrap confidence
    * interval — the companion of [[poissonBootstrapCi]] for the
    * metrics that are ratios of totals (CTR = clicks/impressions,
    * tokens-per-char, revenue-per-order): the ratio estimator whose
    * row-level covariance a naive per-row-mean CI gets WRONG, which
    * is exactly what the bootstrap handles for free — each replicate
    * reweights numerator and denominator with the SAME Poisson draw,
    * so the replicate ratio (Σw·x)/(Σw·y) carries the joint
    * variation. Same determinism argument as the mean form: every
    * endpoint is a pure function of the input that the oracle
    * replays. Replicates with zero denominator drop (undefined, not
    * zero); b_eff records survivors. Output: (grp, n, b_eff, ratio,
    * ci_lo, ci_hi) — ratio = Σx/Σy, one IEEE division of exact longs.
    * Scale shape: identical to [[poissonBootstrapCi]] — one B-way
    * explode into a map-side-combined hash-agg; no resample shuffle. */
  def poissonBootstrapRatioCi(items: DataFrame, grpCol: String,
      numCol: String, denCol: String, idCol: String, b: Int = 32,
      loPermille: Int = 25, hiPermille: Int = 975): DataFrame = {
    require(b >= 2 && b <= 256, s"replicates $b out of [2, 256]")
    require(loPermille >= 1 && loPermille < hiPermille &&
      hiPermille <= 1000,
      s"bad interval permilles ($loPermille, $hiPermille)")
    val x = col(numCol).cast("long")
    val y = col(denCol).cast("long")
    val base = items
      .filter(col(grpCol).isNotNull && x.isNotNull && y.isNotNull &&
        col(idCol).isNotNull)
      .select(col(grpCol).as("grp"), x.as("x"), y.as("y"),
        col(idCol).as("id"))
    val overall = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("__sx"),
        sum(col("y")).as("__sy"))
      .filter(col("__sy") > 0)
    val w = bootstrapWeight(col("r"), col("id"))
    val perRep = repartForExplode(base, col("id"))
      .select(col("grp"), col("x"), col("y"), col("id"),
        explode(array((0 until b).map(lit(_)): _*)).as("r"))
      .select(col("grp"), col("r"), w.as("__w"), col("x"), col("y"))
      .groupBy(col("grp"), col("r"))
      .agg(sum(col("__w") * col("x")).as("__swx"),
        sum(col("__w") * col("y")).as("__swy"))
      .filter(col("__swy") > 0)
      .select(col("grp"), col("r"),
        (col("__swx").cast("double") / col("__swy").cast("double"))
          .as("m"))
    overall
      .join(intervalEndpoints(perRep, loPermille, hiPermille),
        Seq("grp"))
      .select(col("grp"), col("n"), col("b_eff"),
        (col("__sx").cast("double") / col("__sy").cast("double"))
          .as("ratio"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Both interval endpoints of the B replicate statistics in ONE
    * aggregation over the (grp, r, m) replicate frame — the shared
    * tail of the three bootstrap operators. Replaces the old
    * rank-window + double-filter shape (which made Spark evaluate the
    * whole replicate subtree once PER endpoint — no CSE across join
    * branches): sort_array(collect_list(struct(m, r))) totally orders
    * the ≤ 256 replicates per group (ties in m break by replicate id
    * — the exact row_number order the windows used), and both order
    * statistics are element_at lookups on the same array. One
    * consumer → the explode/agg pipeline runs ONCE; the two window
    * exchanges disappear. B ≤ 256 bounds the array. */
  private def intervalEndpoints(perRep: DataFrame, loPermille: Int,
      hiPermille: Int, loAs: String = "ci_lo",
      hiAs: String = "ci_hi"): DataFrame = {
    def at(p: Int) = element_at(col("__ms"), greatest(lit(1L),
      expr(s"(${p}L * size(__ms) + 999) DIV 1000")).cast("int"))
      .getField("m")
    perRep.groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("m"), col("r"))))
        .as("__ms"))
      .select(col("grp"), size(col("__ms")).cast("long").as("b_eff"),
        at(loPermille).as(loAs), at(hiPermille).as(hiAs))
  }

  /** Per-group mean with a Poisson-bootstrap confidence interval
    * (Chamandy, Muralidharan, Najmi & Naidu, "Estimating Uncertainty
    * for Massive Data Streams", Google 2012; Kleiner et al.'s BLB is
    * the heavier cousin) — THE distributed bootstrap: instead of
    * resampling n rows with replacement B times (a shuffle per
    * replicate), every row draws an independent Poisson(1) weight per
    * replicate, and replicate statistics are one weighted hash-agg.
    * Here the draws are DETERMINISTIC — u = md5("bs:r:id") mapped
    * through the precomputed [[PoissonThresholds]] — so weights,
    * replicate means, and both interval endpoints are pure functions
    * of the input that a DuckDB oracle replays exactly: a
    * hash-exact-gateable bootstrap (a seeded RNG bootstrap never
    * crosses engines).
    *
    * Output per group: (grp, n, b_eff, mean, ci_lo, ci_hi) — mean =
    * Σv/n as ONE IEEE division of exact longs; ci bounds are the
    * loPermille/hiPermille ORDER STATISTICS (the q164 integer rank
    * arithmetic) of the B replicate means, each itself one division
    * of two exact longs; ties in replicate means break by replicate
    * id. Replicates whose total weight is 0 are undefined and drop —
    * b_eff records how many survived (P(drop) = e^-n: only microscopic
    * groups ever lose one).
    *
    * Scale shape: the B-way explode is the only expansion (B·rows,
    * map-side combined immediately into B·groups cells); no
    * resample-shuffle of data ever happens — the reason this bootstrap
    * is the 100 TB one. The narrow base projection repartitions by
    * unit id BEFORE the explode (the Multimodal.idScan precedent):
    * the explode amplifies per-input-split map work ×B, so on a
    * few-split extract the weight hashing would otherwise run on one
    * core while 31 idle — a narrow-row shuffle buys split-independent
    * parallelism and is noise next to the ×B map cost. Interval
    * selection is ONE sort_array aggregation over the B replicate
    * rows per group ([[intervalEndpoints]]). */
  def poissonBootstrapCi(items: DataFrame, grpCol: String,
      valCol: String, idCol: String, b: Int = 32,
      loPermille: Int = 25, hiPermille: Int = 975): DataFrame = {
    require(b >= 2 && b <= 256, s"replicates $b out of [2, 256]")
    require(loPermille >= 1 && loPermille < hiPermille &&
      hiPermille <= 1000,
      s"bad interval permilles ($loPermille, $hiPermille)")
    val v = col(valCol).cast("long")
    val base = items
      .filter(col(grpCol).isNotNull && v.isNotNull &&
        col(idCol).isNotNull)
      .select(col(grpCol).as("grp"), v.as("v"), col(idCol).as("id"))
    val overall = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("__sx"))
    val w = bootstrapWeight(col("r"), col("id"))
    val perRep = repartForExplode(base, col("id"))
      .select(col("grp"), col("v"), col("id"),
        explode(array((0 until b).map(lit(_)): _*)).as("r"))
      .select(col("grp"), col("r"), w.as("__w"), col("v"))
      .groupBy(col("grp"), col("r"))
      .agg(sum(col("__w") * col("v")).as("__swx"),
        sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0)
      .select(col("grp"), col("r"),
        (col("__swx").cast("double") / col("__sw").cast("double"))
          .as("m"))
    overall
      .join(intervalEndpoints(perRep, loPermille, hiPermille),
        Seq("grp"))
      .select(col("grp"), col("n"), col("b_eff"),
        (col("__sx").cast("double") / col("n").cast("double"))
          .as("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Per-group QUANTILE with a Poisson-bootstrap confidence interval,
    * riding the HDR sketch ([[Sketch.hdrSketch]]'s bucketing) — the
    * uncertainty companion of [[poissonBootstrapCi]] for medians/p99s,
    * where the plain bootstrap is useless at scale (B resamples = B
    * per-group sorts). Here each replicate is a WEIGHTED HDR sketch:
    * rows draw the same deterministic md5 Poisson(1) weights as the
    * mean form, per-replicate bucket masses are ONE hash-agg
    * (b·buckets cells per group — never a resample, never a sort),
    * and each replicate's quantile is bracketed by its weighted
    * cumulative bucket walk.
    *
    * The whole surface is LONGS — bucket lower bounds and counts —
    * so point estimate AND interval endpoints gate hash-exact (the
    * q240 determinism argument with zero IEEE ops at all): est_lb ≤
    * the true permille-th order statistic ≤ est_ub (the 2^-hdrB HDR
    * bracket law), and ci_lo_lb/ci_hi_lb are the loPermille/hiPermille
    * order statistics (q164 integer rank arithmetic, ties by
    * replicate id) of the B replicate quantile brackets — a CI of
    * brackets, with each endpoint carrying the same 2^-hdrB relative
    * quantization as the point estimate. Replicates with zero total
    * weight drop (undefined, not zero); b_eff records survivors.
    * Domain is the HDR contract: nonnegative values; null
    * group/value/id rows are excluded (the filter is the contract).
    *
    * Output: (grp, n, b_eff, est_lb, est_ub, ci_lo_lb, ci_hi_lb).
    *
    * Scale shape: the B-way explode is the only expansion, map-side
    * combined into b·buckets cells per group (≤ ~1.9k buckets at
    * hdrB = 5); the cumulative walks and rank selection run on
    * sketch-sized frames only. */
  def poissonBootstrapQuantileCi(items: DataFrame, grpCol: String,
      valCol: String, idCol: String, b: Int = 32, permille: Int = 500,
      hdrB: Int = 5, loPermille: Int = 25,
      hiPermille: Int = 975): DataFrame = {
    require(b >= 2 && b <= 256, s"replicates $b out of [2, 256]")
    require(permille >= 1 && permille <= 1000,
      s"permille $permille out of [1, 1000]")
    require(loPermille >= 1 && loPermille < hiPermille &&
      hiPermille <= 1000,
      s"bad interval permilles ($loPermille, $hiPermille)")
    val v = col(valCol).cast("long")
    val base = items
      .filter(col(grpCol).isNotNull && v.isNotNull && v >= 0 &&
        col(idCol).isNotNull)
      .select(col(grpCol).as("grp"),
        Sketch.hdrBucketLb(v, hdrB).as("lb"), col(idCol).as("id"))
    val byLb = Window.partitionBy(col("grp")).orderBy(col("lb"))
    val whole = Window.partitionBy(col("grp"))
    val pt = base.groupBy(col("grp"), col("lb"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byLb))
      .withColumn("n", sum(col("cnt")).over(whole))
      .filter(col("cum") >= greatest(lit(1L),
        expr(s"(${permille}L * n + 999) DIV 1000")))
      .groupBy(col("grp"))
      .agg(min(col("lb")).as("est_lb"), first(col("n")).as("n"))
    val w = bootstrapWeight(col("r"), col("id"))
    val byLbR = Window.partitionBy(col("grp"), col("r"))
      .orderBy(col("lb"))
    val wholeR = Window.partitionBy(col("grp"), col("r"))
    val repMed = repartForExplode(base, col("id"))
      .select(col("grp"), col("lb"), col("id"),
        explode(array((0 until b).map(lit(_)): _*)).as("r"))
      .select(col("grp"), col("r"), col("lb"), w.as("__w"))
      .groupBy(col("grp"), col("r"), col("lb"))
      .agg(sum(col("__w")).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byLbR))
      .withColumn("nr", sum(col("cnt")).over(wholeR))
      .filter(col("nr") > 0 && col("cum") >= greatest(lit(1L),
        expr(s"(${permille}L * nr + 999) DIV 1000")))
      .groupBy(col("grp"), col("r"))
      .agg(min(col("lb")).as("m"))
    pt.join(intervalEndpoints(repMed, loPermille, hiPermille,
        "ci_lo_lb", "ci_hi_lb"), Seq("grp"))
      .select(col("grp"), col("n"), col("b_eff"), col("est_lb"),
        (col("est_lb") + Sketch.hdrWidth(col("est_lb"), hdrB) - 1)
          .as("est_ub"),
        col("ci_lo_lb"), col("ci_hi_lb"))
  }

  /** Per-group distribution-SHAPE census — mean, sample variance,
    * population skewness g1, and population excess kurtosis g2 — the
    * "did the length/score distribution change shape, not just
    * location?" readout next to [[ksTest]] (which answers yes/no;
    * this says HOW: tail direction, peakedness).
    *
    * Exactness (the q183 discipline): the power sums S1..S4 are exact
    * 128-bit integers (decimal(38,0) / HUGEINT), the scaled central
    * moments are exact integer combinations —
    *   M2 = n·S2 − S1²            (= n²·m2)
    *   M3 = n²·S3 − 3n·S1·S2 + 2S1³    (= n³·m3)
    *   M4 = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3S1⁴  (= n⁴·m4)
    * — and the n-powers cancel in the ratios, so each statistic is a
    * FIXED tree of correctly-rounded IEEE ops over exact integers:
    *   variance = M2 / (n(n−1))        (sample, n ≥ 2)
    *   g1 = M3 / (M2·√M2)              (= m3/m2^1.5; √ is exact IEEE)
    *   g2 = M4 / (M2·M2) − 3
    * g1/g2 are NULL when M2 = 0 (constant group — undefined, not 0;
    * the chiSquare2x2 degenerate convention), variance NULL when
    * n < 2.
    *
    * Envelope: every product must fit 38 digits — S1⁴ is the binding
    * term. Central moments are SHIFT-INVARIANT, so when n·v̄⁴ products
    * approach 10³⁸ the caller pre-centers with any constant anchor
    * (one projection: v − anchor) and only the mean moves; values
    * like chars/tokens/scores at 10⁹ rows fit without shifting.
    *
    * Scale shape: ONE map-side-combined hash-agg to five cells per
    * group; the statistics are a stateless projection over the
    * group-count-sized frame. */
  def momentCensus(items: DataFrame, grpCol: String,
      valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val agg = items
      .filter(col(grpCol).isNotNull && v.isNotNull)
      .select(col(grpCol).as("grp"), d38(v).as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"),
        sum(col("v") * col("v") * col("v")).as("s3"),
        sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
    val n = d38(col("n"))
    val s1 = col("s1"); val s2 = col("s2")
    val s3 = col("s3"); val s4 = col("s4")
    val m2 = n * s2 - s1 * s1
    val m3 = n * n * s3 - lit(3) * n * s1 * s2 + lit(2) * s1 * s1 * s1
    val m4 = n * n * n * s4 - lit(4) * n * n * s1 * s3 +
      lit(6) * n * s1 * s1 * s2 - lit(3) * s1 * s1 * s1 * s1
    val dbl = (c: Column) => c.cast("double")
    agg
      .withColumn("__m2", m2).withColumn("__m3", m3)
      .withColumn("__m4", m4)
      .select(col("grp"), col("n"),
        (dbl(s1) / dbl(col("n"))).as("mean"),
        when(col("n") >= 2, dbl(col("__m2")) /
          dbl(d38(col("n")) * d38(col("n") - 1))).as("variance"),
        when(col("__m2") > 0, dbl(col("__m3")) /
          (dbl(col("__m2")) * sqrt(dbl(col("__m2"))))).as("g1_skew"),
        when(col("__m2") > 0, dbl(col("__m4")) /
          (dbl(col("__m2")) * dbl(col("__m2"))) - lit(3.0d))
          .as("g2_kurt"))
  }

  /** Per-group TRIMMED and WINSORIZED means — the robust location
    * estimates a curation dashboard wants when means are dragged by
    * outlier documents (one 100 MB page moves a source's mean length;
    * it cannot move the 5%-trimmed mean): drop (trimmed) or clamp
    * (winsorized) the t = ⌊trim‰·n/1000⌋ most extreme rows per end.
    *
    * Exactness: ranks never materialize — per distinct value v with
    * count c starting after C cumulative rows, the kept mass is the
    * interval overlap min(C+c, n−t) − max(C, t) clamped at 0 (exact
    * integer arithmetic; the [[Classifier.aucRoc]] walk), the
    * trim-boundary order statistics q_lo (rank t+1) and q_hi (rank
    * n−t) fall out of the same cumulative frame, the winsorized sum
    * adds t·q_lo + t·q_hi to the trimmed sum, and each mean is ONE
    * IEEE division of exact 128-bit integers — every column gates
    * hash-exact. trim‰ = 0 degrades to the plain mean.
    *
    * Output: (grp, n, n_kept, q_lo, q_hi, trimmed_sum, trimmed_mean,
    * winsor_mean); n_kept = n − 2t ≥ 1 always (trim‰ < 500).
    *
    * Scale shape: one map-side-combined hash-agg to (grp, v) cells,
    * then the cumulative walk and the sums run on the value-distinct
    * frame — bounded by distinct values per group, not rows. */
  def trimmedMeanCensus(items: DataFrame, grpCol: String,
      valCol: String, trimPermille: Int): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500,
      s"trim permille $trimPermille out of [0, 500)")
    val v = col(valCol).cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cells = items
      .filter(col(grpCol).isNotNull && v.isNotNull)
      .select(col(grpCol).as("grp"), v.as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(col("grp")).orderBy(col("v"))
    val whole = Window.partitionBy(col("grp"))
    val walk = cells
      .withColumn("n", sum(col("c")).over(whole))
      .withColumn("cum", sum(col("c")).over(byV) - col("c"))
      .withColumn("t", expr(s"(${trimPermille}L * n) DIV 1000"))
      .withColumn("kept", greatest(lit(0L),
        least(col("cum") + col("c"), col("n") - col("t")) -
          greatest(col("cum"), col("t"))))
    walk.groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("t")).as("__t"),
        min(when(col("cum") + col("c") >= col("t") + 1, col("v")))
          .as("q_lo"),
        min(when(col("cum") + col("c") >= col("n") - col("t"),
          col("v"))).as("q_hi"),
        sum(d38(col("v")) * d38(col("kept"))).as("__tsum"))
      .select(col("grp"), col("n"),
        (col("n") - lit(2L) * col("__t")).as("n_kept"),
        col("q_lo"), col("q_hi"),
        col("__tsum").cast("long").as("trimmed_sum"),
        (col("__tsum").cast("double") /
          (col("n") - lit(2L) * col("__t")).cast("double"))
          .as("trimmed_mean"),
        ((col("__tsum") + d38(col("__t")) * d38(col("q_lo")) +
          d38(col("__t")) * d38(col("q_hi"))).cast("double") /
          col("n").cast("double")).as("winsor_mean"))
  }

  /** Per-group standardized EFFECT SIZE between two samples — Cohen's
    * d with the pooled SD, plus Hedges' small-sample correction g =
    * d·(1 − 3/(4n−9)) (Hedges 1981) — the magnitude companion of
    * [[mannWhitneyTest]]/[[chiSquare2x2]]: at corpus n everything is
    * "significant"; d says whether the difference is worth acting on
    * (0.2 small / 0.5 medium / 0.8 large, Cohen's benchmarks).
    *
    * Exactness (the [[momentCensus]] discipline): per side, n and the
    * exact 128-bit M2 = n·Σv² − (Σv)²; then
    *   s_p² = (M2a/n_a + M2b/n_b) / (n_a + n_b − 2)
    * (using (n−1)·s² = M2/n — each term ONE division of exact ints),
    * and d = (mean_a − mean_b)/√s_p² — a fixed divide/subtract/sqrt
    * tree, so d and g gate hash-exact. NULL when either side has
    * n < 2 or the pooled variance is 0 (the degenerate convention).
    *
    * Scale shape: one map-side-combined hash-agg per side to three
    * cells per group, a group equi-join of group-count-sized frames,
    * stateless projection. Output: (grp, n_a, n_b, mean_a, mean_b,
    * cohen_d, hedges_g). */
  def effectSize(a: DataFrame, b: DataFrame, grpCol: String,
      valCol: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    def side(df: DataFrame, sfx: String) = {
      val v = col(valCol).cast("long")
      df.filter(col(grpCol).isNotNull && v.isNotNull)
        .select(col(grpCol).as("grp"), d38(v).as("v"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as(s"n_$sfx"), sum(col("v")).as(s"__s$sfx"),
          sum(col("v") * col("v")).as(s"__q$sfx"))
        .withColumn(s"__m2$sfx", d38(col(s"n_$sfx")) * col(s"__q$sfx")
          - col(s"__s$sfx") * col(s"__s$sfx"))
    }
    val joined = side(a, "a").join(side(b, "b"), Seq("grp"))
    val meanA = dbl(col("__sa")) / dbl(col("n_a"))
    val meanB = dbl(col("__sb")) / dbl(col("n_b"))
    val sp2 = (dbl(col("__m2a")) / dbl(col("n_a")) +
      dbl(col("__m2b")) / dbl(col("n_b"))) /
      dbl(col("n_a") + col("n_b") - 2)
    val defined = col("n_a") >= 2 && col("n_b") >= 2 &&
      (col("__m2a") > 0 || col("__m2b") > 0)
    joined
      .withColumn("mean_a", meanA).withColumn("mean_b", meanB)
      .withColumn("cohen_d", when(defined,
        (col("mean_a") - col("mean_b")) / sqrt(sp2)))
      .withColumn("hedges_g", when(defined, col("cohen_d") *
        (lit(1.0d) - lit(3.0d) /
          dbl(lit(4L) * (col("n_a") + col("n_b")) - 9))))
      .select(col("grp"), col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"), col("cohen_d"), col("hedges_g"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    * — the industry-standard A/B sharpener: adjust each unit's metric
    * by its pre-experiment covariate, Y' = Y − θ(X − X̄) with θ =
    * cov(X,Y)/var(X) POOLED across variants (θ from pooled data keeps
    * the adjustment unbiased under randomization), cutting metric
    * variance by the squared correlation ρ² — a ρ = 0.7 covariate
    * halves the experiment duration for the same power.
    *
    * Exactness: per group the pooled sums (n, Sx, Sy, Sxx, Syy, Sxy)
    * and per (group, variant) the sums (n_v, Sx_v, Sy_v) are exact
    * 128-bit integers; θ = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) is ONE
    * division of exact ints, mean_adj = Sy_v/n_v − θ·(Sx_v/n_v −
    * Sx/n) a fixed tree, and ρ² = (c·c)/(vx·vy) with c the exact
    * covariance numerator — all hash-exact. θ/ρ²/mean_adj are NULL
    * when the covariate has zero pooled variance (nothing to adjust
    * with — the degenerate convention); mean_raw always reports.
    *
    * Scale shape: two map-side-combined hash-aggs (group grain,
    * group×variant grain) over one pass each; the θ frame is
    * group-count-sized and joins broadcast-style. Output: (grp,
    * variant, n, mean_raw, mean_adj, theta, rho2). */
  def cuped(units: DataFrame, grpCol: String, variantCol: String,
      yCol: String, xCol: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val base = units
      .filter(col(grpCol).isNotNull && col(variantCol).isNotNull &&
        x.isNotNull && y.isNotNull)
      .select(col(grpCol).as("grp"), col(variantCol).as("variant"),
        d38(x).as("x"), d38(y).as("y"))
    val pooled = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("__n"), sum(col("x")).as("__sx"),
        sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"),
        sum(col("x") * col("y")).as("__sxy"))
    val n = d38(col("__n"))
    val c = n * col("__sxy") - col("__sx") * col("__sy")
    val vx = n * col("__sxx") - col("__sx") * col("__sx")
    val vy = n * col("__syy") - col("__sy") * col("__sy")
    val thetas = pooled
      .withColumn("__c", c).withColumn("__vx", vx)
      .withColumn("__vy", vy)
      .select(col("grp"), col("__n"), col("__sx"),
        when(col("__vx") > 0, dbl(col("__c")) / dbl(col("__vx")))
          .as("theta"),
        when(col("__vx") > 0 && col("__vy") > 0,
          (dbl(col("__c")) * dbl(col("__c"))) /
            (dbl(col("__vx")) * dbl(col("__vy")))).as("rho2"))
    val perVariant = base.groupBy(col("grp"), col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("__sxv"),
        sum(col("y")).as("__syv"))
    perVariant.join(thetas, Seq("grp"))
      .select(col("grp"), col("variant"), col("n"),
        (dbl(col("__syv")) / dbl(col("n"))).as("mean_raw"),
        (dbl(col("__syv")) / dbl(col("n")) - col("theta") *
          (dbl(col("__sxv")) / dbl(col("n")) -
            dbl(col("__sx")) / dbl(col("__n")))).as("mean_adj"),
        col("theta"), col("rho2"))
  }

  /** Per-group Wilson score interval for a proportion (Wilson, JASA
    * 1927) — the rate CI that behaves at the edges where the naive
    * Wald interval collapses (k = 0 or k = n give zero Wald width;
    * Wilson stays honest), the recommended default (Brown, Cai &
    * DasGupta 2001). The per-slice "keep-rate with error bars"
    * readout of a curation dashboard.
    *
    * Exactness: n and k are exact longs from one hash-agg, z and z²
    * are LITERALS (z² is computed once in Scala, not squared
    * in-plan — one fewer op to mirror), and center/half-width are
    * fixed trees of correctly-rounded IEEE ops:
    *   denom  = 1 + z²/n
    *   center = (p̂ + z²/2n) / denom
    *   half   = z·√(p̂(1−p̂)/n + z²/4n²) / denom
    * so p_hat, ci_lo, and ci_hi all gate hash-exact.
    *
    * Scale shape: one map-side-combined hash-agg to two cells per
    * group; the interval is a stateless projection. Output: (grp, n,
    * k, p_hat, ci_lo, ci_hi). */
  def wilsonCi(items: DataFrame, grpCol: String, successCol: String,
      z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be > 0, got $z")
    val dbl = (c: Column) => c.cast("double")
    val agg = items
      .filter(col(grpCol).isNotNull && col(successCol).isNotNull)
      .select(col(grpCol).as("grp"),
        col(successCol).cast("boolean").as("__s"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("k"))
    val nD = dbl(col("n"))
    val ph = dbl(col("k")) / nD
    val z2 = lit(z * z)
    val denom = lit(1.0d) + z2 / nD
    val center = (ph + z2 / (lit(2.0d) * nD)) / denom
    val half = lit(z) * sqrt(ph * (lit(1.0d) - ph) / nD +
      z2 / (lit(4.0d) * nD * nD)) / denom
    agg
      .withColumn("p_hat", ph)
      .withColumn("ci_lo", center - half)
      .withColumn("ci_hi", center + half)
  }

  /** Per-group capture–recapture population estimate — Chapman's
    * bias-corrected Lincoln–Petersen (Chapman 1951):
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 from two independent "catches" of
    * the same population (two samples' vocabularies, two dedup
    * methods' pair catches, two crawlers' URL frontiers): the
    * two-sample companion of [[Drift.vocabRichness]]'s within-sample
    * Chao1 — same question, answered from catch OVERLAP instead of
    * the frequency spectrum. Chapman's +1s keep the estimator defined
    * at m = 0 (a disjoint pair of catches estimates n₁·n₂-ish, large
    * — honest about how little overlap proves) and remove the
    * classical estimator's small-m bias.
    *
    * Exactness: n₁, n₂, m are exact distinct counts; the estimate is
    * ONE division of an exact 128-bit product by an exact long,
    * minus 1 — hash-exact. Groups present in only one catch report
    * the degenerate N̂ = n₁ (the other factor collapses to 1/(0+1)).
    *
    * Scale shape: two distinct-aggs + one equi-join on (grp, key),
    * all map-side combined; the per-group frames then merge
    * full-outer so a group caught by one side still reports. */
  def captureRecapture(a: DataFrame, b: DataFrame, grpCol: String,
      keyCol: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    def catchOf(df: DataFrame) = df
      .filter(col(grpCol).isNotNull && col(keyCol).isNotNull)
      .select(col(grpCol).as("grp"), col(keyCol).as("key"))
      .distinct()
    val ca = catchOf(a); val cb = catchOf(b)
    def cnt(df: DataFrame, as: String) =
      df.groupBy(col("grp")).agg(count(lit(1)).as(as))
    val overlap = ca.join(cb, Seq("grp", "key"))
      .groupBy(col("grp")).agg(count(lit(1)).as("m"))
    cnt(ca, "n1").join(cnt(cb, "n2"), Seq("grp"), "full_outer")
      .join(overlap, Seq("grp"), "left")
      .select(col("grp"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("m"), lit(0L)).as("m"))
      .withColumn("est_total",
        dbl(d38(col("n1") + 1) * d38(col("n2") + 1)) /
          dbl(col("m") + 1) - lit(1.0d))
  }

  /** Per-group TOP-SHARE concentration — the mass fraction held by
    * the top p‰ of rows by value (the Lorenz-curve point behind
    * "the top 1% of documents hold 38% of the bytes"): the
    * interpretable companion of [[giniConcentration]]'s single
    * index, and the number a storage/budget planner actually uses.
    *
    * Exactness: the [[trimmedMeanCensus]] walk with a one-sided cut —
    * the top-t kept mass per distinct value is the integer interval
    * overlap min(C+c, n) − max(C, n−t) on the cumulative frame
    * (t = ⌈p‰·n/1000⌉ rows, ties broken by the walk's value order:
    * a tie block straddling the cut contributes exactly its
    * overlap), sums are exact 128-bit, and share = top_sum/total is
    * ONE IEEE division — hash-exact. Domain: v ≥ 0 (mass); share
    * NULL when total = 0 (all-zero mass — undefined).
    *
    * Scale shape: one (grp, v) hash-agg + the value-distinct walk —
    * never a row sort. Output: (grp, n, n_top, top_sum, total_sum,
    * share). */
  def topShare(items: DataFrame, grpCol: String, valCol: String,
      topPermille: Int): DataFrame = {
    require(topPermille >= 1 && topPermille <= 1000,
      s"top permille $topPermille out of [1, 1000]")
    val v = col(valCol).cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val cells = items
      .filter(col(grpCol).isNotNull && v.isNotNull && v >= 0)
      .select(col(grpCol).as("grp"), v.as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(col("grp")).orderBy(col("v"))
    val whole = Window.partitionBy(col("grp"))
    cells
      .withColumn("n", sum(col("c")).over(whole))
      .withColumn("cum", sum(col("c")).over(byV) - col("c"))
      .withColumn("t", expr(s"(${topPermille}L * n + 999) DIV 1000"))
      .withColumn("kept", greatest(lit(0L),
        least(col("cum") + col("c"), col("n")) -
          greatest(col("cum"), col("n") - col("t"))))
      .groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("t")).as("n_top"),
        sum(d38(col("v")) * d38(col("kept"))).as("__top"),
        sum(d38(col("v")) * d38(col("c"))).as("__tot"))
      .select(col("grp"), col("n"), col("n_top"),
        col("__top").cast("long").as("top_sum"),
        col("__tot").cast("long").as("total_sum"),
        when(col("__tot") > 0, dbl(col("__top")) / dbl(col("__tot")))
          .as("share"))
  }

  /** Per-group 2×2 chi-squared census. `variant01`/`success01` must
    * evaluate to 0/1 longs per unit row. Output: (group, n00, n01,
    * n10, n11, chi2, significant) — cell nXY = units with variant X
    * and success Y; chi2/significant NULL on degenerate margins. */
  def chiSquare2x2(units: DataFrame, groupCol: String,
      variant01: Column, success01: Column,
      critical: Double): DataFrame = {
    require(critical > 0, s"critical value must be > 0, got $critical")
    def cell(v: Int, sv: Int) =
      sum(when(variant01 === v && success01 === sv, lit(1L))
        .otherwise(lit(0L)))
    val agg = units.groupBy(col(groupCol))
      .agg(cell(0, 0).as("n00"), cell(0, 1).as("n01"),
        cell(1, 0).as("n10"), cell(1, 1).as("n11"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val diff = (d38(col("n11")) * d38(col("n00"))
      - d38(col("n10")) * d38(col("n01"))).cast("double")
    val num = dbl(col("n00") + col("n01") + col("n10") + col("n11")) *
      diff * diff
    val den = (dbl(col("n00") + col("n01")) * dbl(col("n10") + col("n11"))) *
      (dbl(col("n00") + col("n10")) * dbl(col("n01") + col("n11")))
    agg
      .withColumn("chi2", when(den > 0, num / den))
      .withColumn("significant", when(den > 0, col("chi2") > critical))
  }

  /** Acklam's rational approximation to the standard normal quantile
    * Φ⁻¹(p) (public-domain algorithm, |relative error| < 1.15e-9) —
    * used ONLY to precompute [[chiSquareBhFdr]]'s critical-value
    * literals in Scala; it never evaluates inside either engine. */
  private def normInv(p: Double): Double = {
    require(p > 0 && p < 1, s"normInv domain (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val plow = 0.02425
    if (p < plow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q +
        c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - plow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r +
        a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q +
        c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }

  /** χ²₁ upper-tail critical value at tail probability p:
    * Φ⁻¹(1 − p/2)² — exposed package-private for the spec's pins. */
  private[graft] def chi2InvUpper(p: Double): Double = {
    val z = normInv(1 - p / 2); z * z
  }

  /** Benjamini–Hochberg FDR control over per-group 2×2 χ² tests
    * (Benjamini & Hochberg, JRSS-B 1995) — the multiple-testing
    * correction [[chiSquare2x2]] needs the moment you run it on
    * 10 000 slices at once: at α = 0.05, five hundred null slices
    * "fire" by chance; BH rejects the largest prefix of the
    * χ²-descending ranking whose statistics clear crit(i·α/m), and
    * bounds the expected false-discovery RATE at α.
    *
    * Determinism: the critical values crit_i = Φ⁻¹(1 − (α·i/m)/2)²
    * are precomputed HERE (Acklam's [[normInv]], ~1e-9 — they are
    * approximate as statistics but LITERALS to the gate: both engines
    * receive the same doubles, so decisions replay exactly); the
    * ranking orders by the hash-exact χ² descending (crit_i decreases
    * in i, so equal-χ² ties land on the same side of i* regardless of
    * their tie-break order — decisions are tie-safe). `m` is the
    * caller's hypothesis count: the denominator of the BH line, NOT
    * inferred from the data, because absent/degenerate slices still
    * count as tested hypotheses (untestable groups — NULL χ² — drop
    * from the ranking but not from m). Ranks beyond m fail closed
    * (no crit → no rejection).
    *
    * Output: one row per testable group — (grp, n00..n11, chi2, rank,
    * crit, reject).
    *
    * Scale shape: [[chiSquare2x2]]'s one corpus hash-agg, then
    * ranking/decision on the HYPOTHESIS-count frame (≤ m rows — the
    * one place a whole-frame window is the right call, and the reason
    * m is capped at 10^5). The crit table ships as in-plan literals
    * only while m ≤ 1024; past that it becomes a broadcast rank→crit
    * lookup joined on the ≤ m-row frame, so no plan ever carries a
    * 10^5-element literal array (and the driver-side Acklam cost is
    * a one-time m-length table build either way). */
  def chiSquareBhFdr(units: DataFrame, groupCol: String,
      variant01: Column, success01: Column, m: Int,
      alphaPermille: Int = 50): DataFrame = {
    require(m >= 1 && m <= 100000, s"hypothesis count $m out of [1, 1e5]")
    require(alphaPermille >= 1 && alphaPermille <= 500,
      s"alpha permille $alphaPermille out of [1, 500]")
    val crits = (1 to m).map(i =>
      chi2InvUpper(alphaPermille.toDouble / 1000.0 * i / m))
    val base = chiSquare2x2(units, groupCol, variant01, success01, 1.0)
      .drop("significant")
      .filter(col("chi2").isNotNull)
    val byChi = Window.orderBy(col("chi2").desc, col(groupCol))
    val whole = Window.partitionBy()
    val ranked = base
      .withColumn("rank", row_number().over(byChi).cast("long"))
    // the crit table: a small-m literal array stays a pure projection;
    // past 1024 entries a 10^5-double literal would bloat every plan
    // copy, so ship it as a broadcast rank->crit lookup instead (same
    // driver-computed doubles either way — decisions are identical)
    val withCrit =
      if (m <= 1024) {
        val critArr = array(crits.map(lit(_)): _*)
        ranked.withColumn("crit", when(col("rank") <= m,
          element_at(critArr, col("rank").cast("int"))))
      } else {
        import units.sparkSession.implicits._
        val critDf = broadcast(crits.zipWithIndex
          .map { case (c, i) => (i + 1L, c) }
          .toDF("rank", "crit"))
        ranked.join(critDf, Seq("rank"), "left")
          .select(ranked.columns.map(col) :+ col("crit"): _*)
      }
    withCrit
      .withColumn("__pass",
        col("crit").isNotNull && col("chi2") >= col("crit"))
      .withColumn("__istar",
        max(when(col("__pass"), col("rank"))).over(whole))
      .withColumn("reject",
        col("__istar").isNotNull && col("rank") <= col("__istar"))
      .drop("__pass", "__istar")
  }

  /** Per-group Spearman rank correlation with midrank ties — the
    * robust "do these two signals move together?" readout (doc length
    * vs token count, quality score vs dedup survival): Pearson on
    * ranks, so one pathological document bends it by one rank step,
    * not by its magnitude.
    *
    * Exactness: each value's DOUBLED midrank is the integer
    * 2C + c + 1 of its cumulative walk (the [[Classifier.aucRoc]]
    * identity), rows pick their midranks up by value equi-join (never
    * a per-row rank window), and the rank power sums are exact
    * 128-bit integers. The ×2 cancels in the correlation, so
    *   rho = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²))
    * is a fixed tree of correctly-rounded IEEE ops (two sqrts, one
    * divide — the [[momentCensus]] g1 discipline) and gates
    * hash-exact, ties included. A group where either column is
    * constant reports NULL rho (zero rank variance — undefined, not
    * 0). Null group/value rows drop.
    *
    * Envelope: Σ(2r)² ≤ 4n³ must fit 38 digits — n ≤ ~10¹² rows per
    * group, far past any real slice.
    *
    * Scale shape: two (grp, value)-cell walks (each bounded by
    * distinct values per group), two value equi-joins back to rows,
    * one map-side-combined hash-agg to six cells per group. Output:
    * (grp, n, rho). */
  def spearmanCorr(items: DataFrame, grpCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val base = items
      .filter(col(grpCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(grpCol).as("grp"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
    def midranks(valName: String, as: String) = {
      val byV = Window.partitionBy(col("grp")).orderBy(col(valName))
      base.groupBy(col("grp"), col(valName))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(byV) - col("c"))
        .select(col("grp"), col(valName),
          (lit(2L) * col("cum") + col("c") + 1).as(as))
    }
    val joined = base
      .join(midranks("x", "rx2"), Seq("grp", "x"))
      .join(midranks("y", "ry2"), Seq("grp", "y"))
    val agg = joined.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("rx2"))).as("sx"), sum(d38(col("ry2"))).as("sy"),
        sum(d38(col("rx2")) * d38(col("rx2"))).as("sxx"),
        sum(d38(col("ry2")) * d38(col("ry2"))).as("syy"),
        sum(d38(col("rx2")) * d38(col("ry2"))).as("sxy"))
    val n = d38(col("n"))
    val dbl = (c: Column) => c.cast("double")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    agg
      .withColumn("__vx", vx).withColumn("__vy", vy)
      .select(col("grp"), col("n"),
        // clamp: √vx·√vx can land 1 ulp past vx, pushing a perfect
        // correlation to 1+2^-52 — [−1, 1] is the mathematical range,
        // and both engines clamp the same pre-clamp double
        when(col("__vx") > 0 && col("__vy") > 0,
          least(lit(1.0d), greatest(lit(-1.0d),
            dbl(n * col("sxy") - col("sx") * col("sy")) /
              (sqrt(dbl(col("__vx"))) * sqrt(dbl(col("__vy")))))))
          .as("rho"))
  }

  /** Benford's-law expected first-digit proportions p_d =
    * log10(1 + 1/d), d = 1..9 — computed ONCE here and interpolated
    * into both engines as double literals (the PoissonThresholds /
    * ndcgDiscounts single-source-of-truth rule; log10 never evaluates
    * cross-engine). */
  val BenfordP: Array[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d)).toArray

  /** Per-group Benford first-digit conformity test (Benford 1938;
    * Nigrini's forensic-accounting usage) — the data-quality forensic
    * for "naturally grown" magnitude columns: fabricated, truncated,
    * or unit-mangled numbers break the log-uniform first-digit law
    * long before they break a range check. Pearson χ² over the nine
    * digit cells against [[BenfordP]], df = 8.
    *
    * Exactness: digit counts are one hash-agg pivoted to NINE fixed
    * columns, and χ² is a FIXED nine-term chain
    * Σ_d (o_d − n·p_d)²/(n·p_d) built left-to-right as one expression
    * — no float aggregation order exists to diverge, every term is
    * correctly-rounded IEEE over exact counts and shared literals, so
    * the statistic gates hash-exact. `critical` is the caller's χ²₈
    * value (15.50731305586545 for 95%); conforms = chi2 ≤ critical,
    * NULL for empty groups. Domain: v > 0 (zero/negative magnitudes
    * have no Benford first digit; the filter is the contract).
    *
    * Scale shape: one map-side-combined hash-agg to ten cells per
    * group; the statistic is a stateless projection. */
  def benfordTest(items: DataFrame, grpCol: String, valCol: String,
      critical: Double = 15.50731305586545): DataFrame = {
    require(critical > 0, s"critical must be > 0, got $critical")
    val v = col(valCol).cast("long")
    val digit = substring(v.cast("string"), 1, 1).cast("int")
    val agg = items
      .filter(col(grpCol).isNotNull && v.isNotNull && v > 0)
      .select(col(grpCol).as("grp"), digit.as("__d"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        (1 to 9).map(d => sum(when(col("__d") === d, 1L).otherwise(0L))
          .as(s"o$d")): _*)
    val dbl = (c: Column) => c.cast("double")
    val chi2 = (1 to 9).map { d =>
      val exp = dbl(col("n")) * lit(BenfordP(d - 1))
      val diff = dbl(col(s"o$d")) - exp
      diff * diff / exp
    }.reduce(_ + _)
    agg.withColumn("chi2", when(col("n") > 0, chi2))
      .withColumn("conforms",
        when(col("n") > 0, col("chi2") <= lit(critical)))
  }

  /** Two-sample Mann–Whitney U test (Mann & Whitney 1947; the
    * Wilcoxon rank-sum) — the LOCATION companion of [[ksTest]]: KS
    * fires on any distributional difference, this asks specifically
    * "does corpus A rank higher than corpus B?", robustly (a 100 MB
    * outlier document moves U by one rank, not its magnitude). The
    * normal approximation with the standard tie-corrected variance:
    *   z = (U − n_a·n_b/2) / σ,
    *   σ² = n_a·n_b·[(n+1)·n(n−1) − Σ(t³−t)] / (12·n(n−1))
    * (t = tie-block sizes over the pooled values).
    *
    * Exactness: doubled midranks are the integers 2C + c + 1 of the
    * pooled cumulative walk (the [[Classifier.aucRoc]] identity), so
    * 2U − n_a·n_b, the tie sum Σ(t³−t), and both variance factors are
    * exact 128-bit integers, and z is a fixed tree — one division
    * inside the sqrt, one sqrt, one outer division — of
    * correctly-rounded IEEE ops: the z VALUE gates hash-exact, and
    * the rejection is a literal comparison. No continuity correction
    * (documented choice: at corpus n the 0.5 shift is noise, and
    * omitting it keeps the tree minimal). z is NULL when either side
    * is empty or ALL pooled values tie (σ = 0) — the chiSquare2x2
    * degenerate convention.
    *
    * Scale shape: one count-agg per side, a full-outer value join,
    * and the cumulative walk rides the distributed [[PrefixSum]]
    * scan (the ksTest shape — never a single-partition window).
    * Output is ONE row: (n_a, n_b, u2_num, z, reject). */
  def mannWhitneyTest(a: DataFrame, b: DataFrame, valCol: String,
      zCritical: Double = 1.959963984540054): DataFrame = {
    require(zCritical > 0, s"z critical must be > 0, got $zCritical")
    def cnt(df: DataFrame, as: String) =
      df.select(col(valCol).cast("long").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as(as))
    val merged = cnt(a, "ca").join(cnt(b, "cb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .withColumn("ct", col("ca") + col("cb"))
    val cum = PrefixSum.withRunningTotal(merged, Seq("v"), "ct")
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val dbl = (x: Column) => x.cast("double")
    val s = cum.agg(
      sum(d38(col("ca")) * d38(lit(2L) * (col("ct_cum") - col("ct")) +
        col("ct") + 1)).as("__ra2"),
      sum(d38(col("ct")) * d38(col("ct")) * d38(col("ct")) -
        d38(col("ct"))).as("__tcorr"),
      coalesce(sum(col("ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("cb")), lit(0L)).as("n_b"))
    val na = d38(col("n_a")); val nb = d38(col("n_b"))
    val n = d38(col("n_a") + col("n_b"))
    val u2c = col("__ra2") - na * (na + 1) - na * nb
    val vnum = na * nb * ((n + 1) * n * (n - 1) - col("__tcorr"))
    val den = d38(lit(12L)) * n * (n - 1)
    s.withColumn("__u2c", u2c).withColumn("__vnum", vnum)
      .withColumn("__den", den)
      .select(col("n_a"), col("n_b"),
        col("__u2c").cast("long").as("u2_num"),
        when(col("n_a") > 0 && col("n_b") > 0 && col("__vnum") > 0,
          dbl(col("__u2c")) / (lit(2.0d) *
            sqrt(dbl(col("__vnum")) / dbl(col("__den"))))).as("z"))
      .withColumn("reject",
        when(col("z").isNotNull, abs(col("z")) > lit(zCritical)))
  }

  /** Two-sample Kolmogorov–Smirnov drift test — "did this numeric
    * feature's DISTRIBUTION change?" between two corpora (doc lengths
    * across snapshots, scores across sources): the numeric-feature
    * sibling of [[Drift.keynessTopK]] (token drift) and
    * [[Anomaly.burstBuckets]] (rate drift). D = sup |F_a − F_b| over
    * the empirical CDFs.
    *
    * Exactness: at every distinct value, |F_a − F_b| = |cna·m − cnb·n|
    * / (n·m) — the numerator is EXACT 128-bit integer arithmetic
    * (decimal(38) here, HUGEINT in the oracle; cna·m reaches n·m,
    * past long at 10⁹-row sides), and D_num = max of exact integers,
    * so the statistic's numerator gates hash-exact. The reported D
    * and the rejection (D > c·√((n+m)/(n·m)), c = 1.358 at α = 0.05)
    * are fixed trees of correctly-rounded IEEE ops — sqrt, multiply,
    * divide — identical in both engines (the q183 sqrt-chain rule).
    *
    * Scale shape: one count agg per side, a full-outer value join,
    * totals derived from the per-value aggregates (never a second
    * corpus scan — the keynessTopK lesson), and the running CDFs ride
    * the distributed [[PrefixSum]] scan, never a single-partition
    * window. Output is ONE row; with an empty side the test is
    * undefined and d/reject are NULL (the [[chiSquare2x2]]
    * degenerate-margin convention). */
  def ksTest(a: DataFrame, b: DataFrame, valCol: String,
      c: Double = 1.358): DataFrame = {
    require(c > 0, s"critical factor must be > 0, got $c")
    def cnt(df: DataFrame, as: String) =
      df.select(col(valCol).as("v")).filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as(as))
    // localCheckpoint: merged feeds the CDF scan, the totals agg, AND
    // (since the r13-advice degenerate guard) the output row's totals —
    // without the barrier the full-outer join subtree re-executes per
    // consumer (the r14 plan dump showed shuffles 8 -> 14)
    val merged = cnt(a, "na").join(cnt(b, "nb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
      .localCheckpoint(false)
    // BOTH CDFs ride ONE two-pass scan (r19): the nested form paid the
    // range shuffle + bounds sampling + totals collect twice
    val cum = PrefixSum.withRunningTotals(merged, Seq("v"),
      Seq("na", "nb"))
    val tot = merged.agg(coalesce(sum(col("na")), lit(0L)).as("n"),
      coalesce(sum(col("nb")), lit(0L)).as("m"))
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val dbl = (x: Column) => x.cast("double")
    // the max-diff agg runs WITHOUT a group key so an empty input still
    // yields its one row (ADVICE r13: the groupBy(n,m) form returned
    // ZERO rows with both sides empty, against the documented "output
    // is ONE row"), and the degenerate guard follows the chiSquare2x2
    // convention: one empty side -> NULL d/reject, never a silent
    // NaN > x = false
    val dnum = cum.crossJoin(broadcast(tot))
      .select(abs(d38(col("na_cum")) * d38(col("m"))
        - d38(col("nb_cum")) * d38(col("n"))).as("__diff"))
      .agg(max(col("__diff")).cast("double").as("d_num"))
    val defined = col("n") > 0 && col("m") > 0
    tot.crossJoin(broadcast(dnum))
      .withColumn("d",
        when(defined, col("d_num") / (dbl(col("n")) * dbl(col("m")))))
      .withColumn("reject", when(defined, col("d") > lit(c) *
        sqrt(dbl(col("n") + col("m")) / (dbl(col("n")) * dbl(col("m"))))))
      .select(col("n"), col("m"), col("d_num"), col("d"), col("reject"))
  }

  /** Per-group two-sample KS — the drift MATRIX: one [[ksTest]] per
    * stratum (per language, per source) in a single pass, the report
    * a crawl-over-crawl review actually reads ("which languages'
    * length distributions moved?"). Same exact 128-bit numerator and
    * sqrt-chain rejection as [[ksTest]]; the running CDFs here use a
    * window PARTITIONED BY GROUP over the per-group distinct-value
    * series (stratum-sized partitions — the burstBuckets executor-fit
    * argument — so no global PrefixSum is needed), and a null group
    * is a stratum like any other (null-safe joins, the temperatureMix
    * contract). Output: one row per group present on either side. */
  def ksTestGrouped(a: DataFrame, b: DataFrame, groupCol: String,
      valCol: String, c: Double = 1.358): DataFrame = {
    require(c > 0, s"critical factor must be > 0, got $c")
    def cnt(df: DataFrame, as: String) =
      df.select(col(groupCol).as("g"), col(valCol).as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as(as))
    val ca = cnt(a, "na")
    val cb = cnt(b, "nb")
    val merged = ca.join(cb,
        ca("g") <=> cb("g") && ca("v") === cb("v"), "full_outer")
      .select(coalesce(ca("g"), cb("g")).as("g"),
        coalesce(ca("v"), cb("v")).as("v"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val wg = Window.partitionBy(col("g"))
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val dbl = (x: Column) => x.cast("double")
    merged
      .withColumn("__cna", sum(col("na")).over(w))
      .withColumn("__cnb", sum(col("nb")).over(w))
      .withColumn("__n", sum(col("na")).over(wg))
      .withColumn("__m", sum(col("nb")).over(wg))
      .withColumn("__diff", abs(d38(col("__cna")) * d38(col("__m"))
        - d38(col("__cnb")) * d38(col("__n"))))
      .groupBy(col("g"))
      .agg(max(col("__n")).as("n"), max(col("__m")).as("m"),
        max(col("__diff")).cast("double").as("d_num"))
      .select(col("g").as(groupCol), col("n"), col("m"), col("d_num"))
      .withColumn("d", col("d_num") / (dbl(col("n")) * dbl(col("m"))))
      .withColumn("reject", col("d") > lit(c) *
        sqrt(dbl(col("n") + col("m")) / (dbl(col("n")) * dbl(col("m")))))
  }

  /** Gini concentration of a weighted mix — "how concentrated is my
    * training corpus across sources/domains/languages?", the headline
    * inequality number a mixture report leads with (0 = perfectly
    * even, →1 = one item dominates). Standard weighted form over
    * items sorted ascending by weight:
    * G = (2·Σᵢ i·wᵢ − (n+1)·Σw) / (n·Σw).
    *
    * Exactness: ranks ride the distributed [[PrefixSum]] scan (item
    * tie-broken — millions of domains never funnel through one
    * task), Σ i·wᵢ accumulates in decimal(38) (rank·weight reaches
    * n·Σw — past long at web scale), and G is ONE correctly-rounded
    * double division of two exact integers. Items are aggregated
    * internally (duplicate keys sum), so callers can pass raw
    * (item, weight) rows. Output is ONE row: (n_items, total, gini);
    * gini is NULL when the total weight is zero. Rank order is
    * (w, k) ascending with a NULL key FIRST — Spark's ascending
    * default, pinned as NULLS FIRST in the q212 oracle because
    * DuckDB's default is NULLS LAST (ADVICE r13: a null stratum is
    * first-class here, as in q183/q209/q213). */
  def giniConcentration(items: DataFrame, keyCol: String,
      weightCol: String): DataFrame = {
    val base = items
      .select(col(keyCol).as("k"), col(weightCol).cast("long").as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("k")).agg(sum(col("w")).as("w"))
      .withColumn("__one", lit(1L))
    val ranked = PrefixSum.withRunningTotal(base, Seq("w", "k"), "__one")
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val dbl = (x: Column) => x.cast("double")
    ranked.agg(
        count(lit(1)).as("n_items"),
        coalesce(sum(col("w")), lit(0L)).as("total"),
        sum(d38(col("__one_cum")) * d38(col("w"))).as("__sw"))
      .select(col("n_items"), col("total"),
        when(col("total") > 0,
          dbl(lit(2) * col("__sw")
            - d38(col("n_items") + 1) * d38(col("total")))
          / dbl(d38(col("n_items")) * d38(col("total")))).as("gini"))
  }

  /** The always-valid p-value ladder [[msprtCuped]] quantizes to, in
    * permille: the standard reporting grid (0.01 .. 0.5). */
  val MsprtLadder: Seq[Int] = Seq(10, 25, 50, 100, 250, 500)

  /** mSPRT rejection threshold on the SQUARED sum-difference surface:
    * the minimal integer Δ² (Δ = Σ_treat v − Σ_ctrl v at a balanced
    * look of n units per arm) for which the mixture likelihood ratio
    *   Λ_n = √(2σ²/(2σ²+nτ²)) · exp(n²τ²·D̄²/(4σ²(2σ²+nτ²)))
    * (Johari, Koomen, Pekelis & Walsh, "Peeking at A/B Tests",
    * KDD 2017 — normal mixture N(0, τ²) over the effect, per-unit
    * variance σ²) clears 1/α. Since n²D̄² = Δ², the test is
    *   Δ² ≥ C(n, α) = ⌈(4σ²(2σ²+nτ²)/τ²)·(ln(1/α) + ½ln(1 + nτ²/2σ²))⌉
    * — computed HERE once (the Acklam / PoissonThresholds single-
    * source-of-truth rule: ln/exp of data-dependent values can never
    * gate cross-engine, so the boundary is a LITERAL both engines
    * compare the exact integer Δ² against). */
  def msprtThreshold(n: Long, sigma2: Double, tau2: Double,
      alphaPermille: Int): BigInt = {
    require(n >= 1 && sigma2 > 0 && tau2 > 0)
    require(alphaPermille >= 1 && alphaPermille <= 500,
      s"alpha permille $alphaPermille out of [1, 500]")
    val v2 = 2.0 * sigma2
    val g = v2 + n.toDouble * tau2
    val c = (4.0 * sigma2 * g / tau2) *
      (math.log(1000.0 / alphaPermille) + 0.5 * math.log(g / v2))
    BigDecimal(c).setScale(0, BigDecimal.RoundingMode.CEILING).toBigInt
  }

  /** Sequential A/B testing with always-valid p-values — the mSPRT
    * over the CUPED-adjusted metric: the streaming-experimentation
    * readout that lets a pipeline owner PEEK at every look without
    * inflating false positives (the fixed-horizon χ²/t test is only
    * valid once; Λ_n is a martingale under H0, so by Ville's
    * inequality P(∃n: Λ_n ≥ 1/α) ≤ α — rejection at ANY look controls
    * α, and p_n = min_{m≤n} 1/Λ_m only ever decreases).
    *
    * The metric is the CUPED composite v = θDen·y − θNum·x with the
    * adjustment coefficient FROZEN as the rational θ = θNum/θDen
    * (fitted on pre-period data, the deployed pattern — [[cuped]]
    * fits θ in-experiment for the fixed-horizon readout; freezing it
    * keeps v exact integer arithmetic and the adjustment unbiased).
    * The −θ·X̄ centering constant cancels in the balanced difference,
    * so Δ = Σ_t v − Σ_c v needs no mean at all. σ² is the caller's
    * pre-period variance OF v, τ² the mixture scale (both literals —
    * they parameterize the boundary table, never touch the data).
    *
    * Looks are BALANCED: look n compares the first n units of EACH
    * arm in (orderCol, idCol) arrival order, and emits only when both
    * arms have reached n (a look you could not yet take does not
    * exist — no partial looks, so the boundary C(n, α) depends only
    * on the literal n). Output per (group, complete look):
    * (grp, look, delta, rejected, rejected_any, av_p_permille) —
    * rejected tests the caller's α at THIS look, rejected_any is the
    * always-valid running decision (monotone: once crossed, stays),
    * av_p_permille the running-min always-valid p quantized to
    * [[MsprtLadder]] (1000 = not significant at any ladder level).
    * Every emitted value is exact integer arithmetic against literal
    * boundaries — hash-exact cross-engine, despite the test being
    * built from exp/ln mixtures.
    *
    * Envelope: |v| sums must fit decimal(38,0) (they do for any real
    * metric); delta is checked into a long LOUDLY.
    *
    * Scale shape: one (grp, arm)-keyed rank window (pruned map-side
    * to looks.max by WindowGroupLimit — the corpus beyond the last
    * look is never sorted), ONE hash-agg straight to group grain
    * (4·L conditional sums), a stack() unpivot of the L looks, and
    * the running-decision window on the ≤L-rows-per-group frame. */
  def msprtCuped(units: DataFrame, grpCol: String, variant01: Column,
      yCol: String, xCol: String, orderCol: String, idCol: String,
      looks: Seq[Long], thetaNum: Long, thetaDen: Long,
      sigma2: Double, tau2: Double, alphaPermille: Int = 50)
      : DataFrame = {
    require(looks.nonEmpty && looks.size <= 32 &&
      looks == looks.sorted && looks.distinct == looks &&
      looks.head >= 1,
      s"looks must be <= 32 strictly increasing positives, got $looks")
    require(thetaDen > 0, s"thetaDen must be > 0, got $thetaDen")
    require(sigma2 > 0 && tau2 > 0, "sigma2/tau2 must be > 0")
    require(alphaPermille >= 1 && alphaPermille <= 500,
      s"alpha permille $alphaPermille out of [1, 500]")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val y = col(yCol).cast("long"); val x = col(xCol).cast("long")
    val arm = variant01.cast("int")
    val base = units
      .filter(col(grpCol).isNotNull && y.isNotNull && x.isNotNull &&
        arm.isin(0, 1) && col(orderCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(grpCol).as("grp"), arm.as("arm"),
        (d38(y) * thetaDen - d38(x) * thetaNum).as("v"),
        col(orderCol).as("ord"), col(idCol).as("id"))
    val w = Window.partitionBy(col("grp"), col("arm"))
      .orderBy(col("ord"), col("id"))
    val ranked = base
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= looks.max) // literal bound: map-side prune
    val aggs = looks.zipWithIndex.flatMap { case (nl, i) =>
      def side(a: Int, nm: String) = Seq(
        sum(when(col("arm") === a && col("rk") <= nl, col("v")))
          .as(s"__s${nm}_$i"),
        count(when(col("arm") === a && col("rk") <= nl, lit(1)))
          .as(s"__c${nm}_$i"))
      side(1, "t") ++ side(0, "c")
    }
    val wide = ranked.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
    val stackArgs = looks.indices.map(i =>
      s"${looks(i)}L, $i, __st_$i, __ct_$i, __sc_$i, __cc_$i")
      .mkString(", ")
    val perLook = wide
      .select(col("grp"), expr(s"stack(${looks.size}, $stackArgs) AS " +
        "(look, __li, __st, __ct, __sc, __cc)"))
      .filter(col("__ct") === col("look") && col("__cc") === col("look"))
      .withColumn("__dd", col("__st") - col("__sc"))
      // check into long BEFORE squaring: long² ≤ 8.5e37 always fits
      // decimal(38,0), so __d2 can never silently overflow-NULL
      .withColumn("delta", when(col("__dd").between(
          lit(Long.MinValue), lit(Long.MaxValue)),
          col("__dd").cast("long"))
        .otherwise(raise_error(lit(
          "msprtCuped: delta overflows long — rescale theta"))))
      .withColumn("__d2", d38(col("delta")) * d38(col("delta")))
    def critArr(alpha: Int) = array(looks.map(n =>
      lit(new java.math.BigDecimal(
        msprtThreshold(n, sigma2, tau2, alpha).bigInteger))): _*)
    val rejectNow = col("__d2") >=
      element_at(critArr(alphaPermille), col("__li") + 1)
    // smallest ladder alpha cleared at THIS look (C(α) shrinks as α
    // grows, so the first hit in ascending ladder order is minimal)
    val pNow = MsprtLadder.map(a =>
      when(col("__d2") >= element_at(critArr(a), col("__li") + 1),
        lit(a.toLong)): Column)
      .reduceRight(_ otherwise _)
    val byLook = Window.partitionBy(col("grp")).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLook
      .withColumn("rejected", rejectNow)
      .withColumn("__p_now", coalesce(pNow, lit(1000L)))
      .withColumn("rejected_any",
        max(rejectNow.cast("int")).over(byLook) === 1)
      .withColumn("av_p_permille", min(col("__p_now")).over(byLook))
      .select(col("grp"), col("look"), col("delta"), col("rejected"),
        col("rejected_any"), col("av_p_permille"))
  }

  /** Sequential A/B testing for RATIO metrics — the mSPRT over the
    * difference of per-arm ratios R = Σnum/Σden (clicks-per-view,
    * tokens-per-char, revenue-per-session: the metric most dashboards
    * actually chart, where [[msprtCuped]]'s frozen-θ composite needs a
    * pre-period reference ratio this test does not have). The
    * statistic is the delta-method linearization of the ratio
    * difference evaluated at the pooled IN-LOOK denominator mean
    * (Deng, Knoblich & Lu, "Applying the Delta Method in Metric
    * Analytics", KDD 2018), lifted onto the sum scale so everything
    * gates as exact integer arithmetic: with per-arm look sums
    * (St, Xt, Sc, Xc),
    *   Δ_eff = n·(St/Xt − Sc/Xc)·x̄_pool
    *         = (St·Xc − Sc·Xt)·(Xt + Xc) / (2·Xt·Xc)
    * and the mixture-boundary test Δ_eff² ≥ C(n, α)
    * ([[msprtThreshold]], Johari-Koomen-Pekelis-Walsh KDD 2017, with
    * σ² = per-unit variance of the linearized influence
    * num − R·den) CROSS-MULTIPLIES to
    *   ((St·Xc − Sc·Xt)·(Xt + Xc))² ≥ C(n, α)·(2·Xt·Xc)²
    * — both sides exact integers, so per-look rejections, the
    * monotone always-valid decision, and the [[MsprtLadder]]-quantized
    * always-valid p gate hash-exact cross-engine. When every unit has
    * den = 1 the test degenerates EXACTLY to the mean mSPRT
    * (Δ_eff = St − Sc), which is the correctness anchor StatsSpec
    * pins against [[msprtCuped]].
    *
    * Balanced looks as in [[msprtCuped]] (first n units per arm in
    * (orderCol, idCol) order; a look emits only when both arms
    * reached n). A look whose denominator sum is zero on either arm
    * has no ratio and is SKIPPED (row-set load-bearing). Negative
    * denominators raise loudly — a ratio metric's denominator is an
    * exposure count.
    *
    * Envelope (all breaches raise, never silently null): num/den
    * sums fit long; the cross products St·Xc − Sc·Xt, ·(Xt+Xc) and
    * 2·Xt·Xc are checked into long BEFORE squaring (long² always
    * fits decimal(38,0)); C(n,α)·(2XtXc)² is guarded against 38-digit
    * overflow. Practical reading: |num|,den ≤ 1e6 at looks ≤ 1e3 sit
    * comfortably inside.
    *
    * Scale shape: identical to [[msprtCuped]] — one (grp, arm)-keyed
    * rank window pruned map-side to looks.max (WindowGroupLimit), ONE
    * hash-agg to group grain (6·L conditional sums), a stack()
    * unpivot, and the running-decision window over ≤L rows/group. */
  def msprtRatio(units: DataFrame, grpCol: String, variant01: Column,
      numCol: String, denCol: String, orderCol: String, idCol: String,
      looks: Seq[Long], sigma2: Double, tau2: Double,
      alphaPermille: Int = 50): DataFrame = {
    require(looks.nonEmpty && looks.size <= 32 &&
      looks == looks.sorted && looks.distinct == looks &&
      looks.head >= 1,
      s"looks must be <= 32 strictly increasing positives, got $looks")
    require(sigma2 > 0 && tau2 > 0, "sigma2/tau2 must be > 0")
    require(alphaPermille >= 1 && alphaPermille <= 500,
      s"alpha permille $alphaPermille out of [1, 500]")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val num = col(numCol).cast("long")
    val denRaw = col(denCol).cast("long")
    val den = when(denRaw < 0, raise_error(lit(
      "msprtRatio: denominator must be >= 0 (an exposure count)")))
      .otherwise(denRaw)
    val arm = variant01.cast("int")
    val base = units
      .filter(col(grpCol).isNotNull && num.isNotNull &&
        denRaw.isNotNull && arm.isin(0, 1) &&
        col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(col(grpCol).as("grp"), arm.as("arm"),
        d38(num).as("nu"), d38(den).as("de"),
        col(orderCol).as("ord"), col(idCol).as("id"))
    val w = Window.partitionBy(col("grp"), col("arm"))
      .orderBy(col("ord"), col("id"))
    val ranked = base
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= looks.max) // literal bound: map-side prune
    val aggs = looks.zipWithIndex.flatMap { case (nl, i) =>
      def side(a: Int, nm: String) = Seq(
        sum(when(col("arm") === a && col("rk") <= nl, col("nu")))
          .as(s"__s${nm}_$i"),
        sum(when(col("arm") === a && col("rk") <= nl, col("de")))
          .as(s"__x${nm}_$i"),
        count(when(col("arm") === a && col("rk") <= nl, lit(1)))
          .as(s"__c${nm}_$i"))
      side(1, "t") ++ side(0, "c")
    }
    val wide = ranked.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
    val stackArgs = looks.indices.map(i =>
      s"${looks(i)}L, $i, __st_$i, __xt_$i, __ct_$i, " +
        s"__sc_$i, __xc_$i, __cc_$i").mkString(", ")
    // a null cross product can only mean decimal(38) overflow (inputs
    // are non-null by construction) — raise, never read as degenerate
    def guarded(c: Column, name: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"msprtRatio: $name exceeds 38 digits — rescale num/den " +
          "(see the documented envelope)")))
    def intoLong(c: Column, name: String): Column =
      when(c.between(lit(Long.MinValue), lit(Long.MaxValue)),
        c.cast("long")).otherwise(raise_error(lit(
        s"msprtRatio: $name overflows long — rescale num/den")))
    val perLook = wide
      .select(col("grp"), expr(s"stack(${looks.size}, $stackArgs) AS " +
        "(look, __li, __st, __xt, __ct, __sc, __xc, __cc)"))
      .filter(col("__ct") === col("look") && col("__cc") === col("look") &&
        col("__xt") > 0 && col("__xc") > 0)
      // A = St·Xc − Sc·Xt (the exact ratio-difference numerator)
      .withColumn("__a", intoLong(guarded(
        col("__st") * col("__xc") - col("__sc") * col("__xt"),
        "St*Xc - Sc*Xt"), "ratio-delta numerator"))
      .withColumn("__b", intoLong(col("__xt") + col("__xc"),
        "Xt + Xc"))
      // P = A·B — checked into long so P² always fits decimal(38,0)
      .withColumn("__p", intoLong(guarded(
        d38(col("__a")) * d38(col("__b")), "A*(Xt+Xc)"),
        "scaled ratio delta"))
      // Q = 2·Xt·Xc — same discipline
      .withColumn("__q", intoLong(guarded(
        lit(2).cast("decimal(38,0)") * col("__xt") * col("__xc"),
        "2*Xt*Xc"), "denominator product"))
      .withColumn("__p2", d38(col("__p")) * d38(col("__p")))
      .withColumn("__q2", d38(col("__q")) * d38(col("__q")))
      .withColumn("delta_num", col("__a"))
    def critRhs(alpha: Int): Column = {
      // C(n,α)·Q² per look — guarded: Spark nulls a 38-digit decimal
      // overflow where DuckDB's HUGEINT errors, so raise to match
      val cArr = array(looks.map(n =>
        lit(new java.math.BigDecimal(
          msprtThreshold(n, sigma2, tau2, alpha).bigInteger))): _*)
      guarded(element_at(cArr, col("__li") + 1) * col("__q2"),
        s"C(n,$alpha)*(2XtXc)^2")
    }
    val rejectNow = col("__p2") >= critRhs(alphaPermille)
    val pNow = MsprtLadder.map(a =>
      when(col("__p2") >= critRhs(a), lit(a.toLong)): Column)
      .reduceRight(_ otherwise _)
    val byLook = Window.partitionBy(col("grp")).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLook
      .withColumn("rejected", rejectNow)
      .withColumn("__p_now", coalesce(pNow, lit(1000L)))
      .withColumn("rejected_any",
        max(rejectNow.cast("int")).over(byLook) === 1)
      .withColumn("av_p_permille", min(col("__p_now")).over(byLook))
      .select(col("grp"), col("look"), col("delta_num"),
        col("rejected"), col("rejected_any"), col("av_p_permille"))
  }

  /** Cochran–Mantel–Haenszel pooled χ² (Mantel & Haenszel, JNCI 1959;
    * Cochran 1954) — the STRATIFIED A/B test: pool the per-stratum
    * 2×2 tables (per country, per device, per day) into one
    * common-odds-ratio test instead of testing each slice alone
    * ([[chiSquareBhFdr]]'s problem) or collapsing the strata and
    * getting Simpson's-paradox'd ([[chiSquare2x2]] on the pooled
    * table). χ²_CMH = (Σᵢ (aᵢ − Eᵢ))² / Σᵢ Vᵢ with Eᵢ = n1ᵢm1ᵢ/nᵢ and
    * Vᵢ = n1ᵢn0ᵢm1ᵢm0ᵢ/(nᵢ²(nᵢ−1)); uncorrected (R's mantelhaen.test
    * correct=FALSE — a literal-boundary decision needs no continuity
    * fudge).
    *
    * Crossing the float-sum-order wall (NEXT r15 called this family
    * blocked): each stratum's num/var term is a fixed IEEE tree over
    * exact 128-bit integers (one cast, one division — the
    * chiSquare2x2 discipline), and the cross-stratum sums run as an
    * ORDERED fold over strata sorted by stratum key — the
    * [[Survival.kaplanMeier]] construction: Spark folds the sorted
    * list with aggregate(), the oracle replays the identical
    * recurrence in a RECURSIVE CTE, and an ordered chain of
    * correctly-rounded additions is bit-exact cross-engine. χ² and
    * the literal-critical decision gate hash-exact.
    *
    * Strata with n < 2 carry no information (V undefined) and drop,
    * as do strata with a degenerate variant margin (E and a both
    * collapse); a group whose pooled V = 0 reports NULL (the
    * chiSquare2x2 degenerate convention). Envelope, documented: per
    * stratum n < 10^9 (the 4-factor V numerator must fit 38 digits);
    * ≤ 4096 strata per group (the fold grain), ENFORCED loudly.
    *
    * Output: (grp, n_strata, num, var, chi2, significant).
    * Scale shape: one corpus hash-agg to (grp, stratum) cells, the
    * fold on the strata frame. */
  def cmhTest(units: DataFrame, groupCol: String, stratumCol: String,
      variant01: Column, success01: Column,
      critical: Double): DataFrame = {
    require(critical > 0, s"critical value must be > 0, got $critical")
    def cell(v: Int, sv: Int) =
      sum(when(variant01 === v && success01 === sv, lit(1L))
        .otherwise(lit(0L)))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val agg = units
      .filter(col(groupCol).isNotNull && col(stratumCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(stratumCol).as("s"))
      .agg(cell(0, 0).as("n00"), cell(0, 1).as("n01"),
        cell(1, 0).as("n10"), cell(1, 1).as("n11"))
    val n = col("n00") + col("n01") + col("n10") + col("n11")
    val n1 = col("n10") + col("n11") // variant-1 row margin
    val n0 = col("n00") + col("n01")
    val m1 = col("n01") + col("n11") // success column margin
    val m0 = col("n00") + col("n10")
    // tn = a − E = (a·n − n1·m1)/n; tv = n1·n0·m1·m0 / (n²(n−1)) —
    // each ONE division of two exactly-formed 128-bit integers
    val terms = agg
      .filter(n >= 2 && n1 > 0 && n0 > 0)
      .select(col("grp"), col("s"),
        (dbl(d38(col("n11")) * d38(n) - d38(n1) * d38(m1)) /
          dbl(n)).as("tn"),
        (dbl(d38(n1) * d38(n0) * d38(m1) * d38(m0)) /
          dbl(d38(n) * d38(n) * d38(n - 1))).as("tv"))
    terms
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("s"), col("tn"),
        col("tv")))).as("__rows"))
      .withColumn("__rows", when(size(col("__rows")) <= 4096,
        col("__rows"))
        .otherwise(raise_error(lit(
          "cmhTest: more than 4096 strata in a group"))))
      .withColumn("__f", expr(
        """aggregate(__rows, named_struct('n', 0.0D, 'v', 0.0D),
           (acc, x) -> named_struct('n', acc.n + x.tn,
                                    'v', acc.v + x.tv))"""))
      .select(col("grp"), size(col("__rows")).cast("long")
          .as("n_strata"),
        col("__f.n").as("num"), col("__f.v").as("var"))
      .withColumn("chi2", when(col("var") > 0,
        (col("num") * col("num")) / col("var")))
      .withColumn("significant",
        when(col("var") > 0, col("chi2") > critical))
  }

  /** Per-group weighted least squares y ~ x over integer data — the
    * EXACT regression readout the NEXT r16 seam asked for ("the
    * ordered-fold could make a gateable EXACT variance/regression
    * family"), and it needs NO fold at all: with integer x, y and
    * integer weights w, every normal-equation sum (Σw, Σwx, Σwy,
    * Σwx², Σwy², Σwxy) is an exact order-free 128-bit integer, so
    *   slope     = Sxy/Sxx,  Sxy = Σw·Σwxy − Σwx·Σwy,
    *                         Sxx = Σw·Σwx² − (Σwx)²
    *   intercept = (Σwy·Σwx² − Σwx·Σwxy)/Sxx
    *   r²        = Sxy²/(Sxx·Syy),  Syy = Σw·Σwy² − (Σwy)²
    * are fixed IEEE trees over exactly-formed integers (Sxy² would
    * overflow 38 digits, so r² multiplies the correctly-rounded
    * DOUBLES — the same tree in both engines, hash-exact like q267).
    * The per-group trend/calibration line a pipeline report carries
    * (bytes ~ tokens, score drift ~ time bucket) with none of the
    * float-summation nondeterminism of a naive Σxy over doubles.
    *
    * Degenerate groups answer honestly: Sxx = 0 (constant x) → NULL
    * slope/intercept/r²; Syy = 0 with Sxx > 0 (constant y) → slope 0,
    * r² NULL (R convention: correlation with a constant is
    * undefined). Rows with null group/x/y drop; null/negative weights
    * reject LOUDLY (a silent w=0 drop would hide data).
    *
    * Envelope, documented: |w·x·y|·n and w·x²·n must fit 38 digits —
    * e.g. n ≤ 10^9 rows/group with |x|,|y| ≤ 10^6 and w ≤ 10^3 is
    * within bounds everywhere.
    *
    * Output: (grp, n, w_total, slope, intercept, r2).
    * Scale shape: ONE corpus hash-agg to group grain — six partial
    * sums, map-side combined; nothing else. */
  def linearFit(df: DataFrame, grpCol: String, xCol: String,
      yCol: String, weightCol: Option[String] = None): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val x = d38(col(xCol).cast("long"))
    val y = d38(col(yCol).cast("long"))
    val w = weightCol match {
      case Some(wc) =>
        val raw = col(wc).cast("long")
        when(raw.isNull || raw < 0,
          raise_error(lit("linearFit: weights must be non-null and " +
            ">= 0"))).otherwise(d38(raw))
      case None => d38(lit(1L))
    }
    val agg = df
      .filter(col(grpCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(w).as("sw"),
        sum(w * x).as("sx"), sum(w * y).as("sy"),
        sum(w * x * x).as("sxx"), sum(w * y * y).as("syy"),
        sum(w * x * y).as("sxy"))
    // every raw sum is non-null by construction (groups are non-empty,
    // inputs filtered non-null), so a null PRODUCT can only mean
    // decimal(38) overflow — Spark nulls silently outside ANSI mode,
    // and a silently-null slope would read as "degenerate x". Raise.
    def guarded(c: Column, name: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"linearFit: $name exceeds 38 digits — rescale x/y/weights " +
          "(see the documented envelope)")))
    // "__bxx" not "Sxx": the default analyzer is case-insensitive, so
    // a derived Sxx next to the raw sxx is AMBIGUOUS_REFERENCE
    val cSxx = guarded(col("sw") * col("sxx") - col("sx") * col("sx"),
      "Sxx").as("__bxx")
    val cSyy = guarded(col("sw") * col("syy") - col("sy") * col("sy"),
      "Syy").as("__byy")
    val cSxy = guarded(col("sw") * col("sxy") - col("sx") * col("sy"),
      "Sxy").as("__bxy")
    // sw itself fits 38 digits by construction, but the LONG readout
    // can't: past Long.MaxValue Spark's non-ANSI cast nulls silently
    // while DuckDB's CAST(HUGEINT AS BIGINT) errors — guard loudly so
    // both engines fail the same way at the envelope edge.
    val wTotal = when(col("sw") <= lit(Long.MaxValue).cast(
        "decimal(38,0)"),
      col("sw").cast("long")).otherwise(raise_error(lit(
      "linearFit: total weight exceeds long range — rescale weights " +
        "(see the documented envelope)"))).as("w_total")
    agg.select(col("grp"), col("n"), wTotal,
        col("sy"), col("sxx"), col("sx"), col("sxy"), cSxx, cSyy, cSxy)
      .select(col("grp"), col("n"), col("w_total"),
        when(col("__bxx") > 0, dbl(col("__bxy")) / dbl(col("__bxx")))
          .as("slope"),
        when(col("__bxx") > 0,
          dbl(guarded(col("sy") * col("sxx") - col("sx") * col("sxy"),
            "intercept numerator")) / dbl(col("__bxx"))).as("intercept"),
        when(col("__bxx") > 0 && col("__byy") > 0,
          (dbl(col("__bxy")) * dbl(col("__bxy"))) /
            (dbl(col("__bxx")) * dbl(col("__byy")))).as("r2"))
  }

  /** Per-group MULTIPLE linear regression with two integer covariates
    * — exact normal equations via 3×3 Cramer determinants over the
    * [[linearFit]] sums (the NEXT r17 seam): y = b0 + b1·x1 + b2·x2
    * fitted by weighted least squares, where every entry of the Gram
    * matrix X'WX and right-hand side X'Wy is an exact order-free
    * 128-bit integer sum, so each coefficient det_i/D is a ratio of
    * exact integers and the published doubles are fixed IEEE trees
    * both engines evaluate identically — multiple regression through
    * the float-summation wall with NO fold at all.
    *
    * r² rides the same trick: weighted SSE·D = syy·D − Σ rhs_i·det_i
    * and SST·sw = sw·syy − sy² are exact integers, so
    * r² = 1 − (E·sw)/(D·S) is a fixed tree too.
    *
    * Degenerates stay honest: a singular Gram matrix (collinear or
    * constant covariates) has D = 0 → NULL coefficients (never a
    * made-up pseudo-inverse); D < 0 cannot happen (X'WX is PSD).
    * Negative weights raise; and the ENVELOPE pressure is real —
    * determinant terms are products of THREE sums (plus one more for
    * E), so unlike [[linearFit]]'s two-sum products they overflow
    * 38 digits at ~1e12-per-sum scale. Every overflow RAISES with
    * the rescale message (Spark nulls silently outside ANSI where
    * DuckDB's HUGEINT errors; a silent null would read as
    * "collinear"). Practical reading: |x|,|y| ≤ 1e4, w ≤ 1e2 at
    * n ≤ 1e9 rows/group sits inside; shift/scale covariates toward
    * zero to buy headroom (centering is the statistical advice
    * anyway).
    *
    * Scale shape: ONE corpus hash-agg (eleven map-side-combined
    * sums straight to group grain), then per-group scalar math —
    * no shuffle beyond the single aggregation exchange, no window,
    * no iteration. At 100 TB this is the cheapest shape a
    * regression can have. */
  def multiFit(df: DataFrame, grpCol: String, x1Col: String,
      x2Col: String, yCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val x1 = d38(col(x1Col).cast("long"))
    val x2 = d38(col(x2Col).cast("long"))
    val y = d38(col(yCol).cast("long"))
    val w = weightCol match {
      case Some(wc) =>
        val raw = col(wc).cast("long")
        when(raw.isNull || raw < 0,
          raise_error(lit("multiFit: weights must be non-null and " +
            ">= 0"))).otherwise(d38(raw))
      case None => d38(lit(1L))
    }
    val agg = df
      .filter(col(grpCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull && col(yCol).isNotNull)
      .groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(w).as("sw"),
        sum(w * x1).as("sx1"), sum(w * x2).as("sx2"),
        sum(w * y).as("sy"),
        sum(w * x1 * x1).as("s11"), sum(w * x1 * x2).as("s12"),
        sum(w * x2 * x2).as("s22"),
        sum(w * x1 * y).as("s1y"), sum(w * x2 * y).as("s2y"),
        sum(w * y * y).as("syy"))
    // raw sums are non-null by construction, so a null DETERMINANT can
    // only mean decimal(38) overflow somewhere in its product tree —
    // null propagates, so guarding the final column catches them all
    def guarded(c: Column, name: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"multiFit: $name exceeds 38 digits — rescale/center x/y/" +
          "weights (see the documented envelope)")))
    val sw = col("sw"); val sx1 = col("sx1"); val sx2 = col("sx2")
    val sy = col("sy"); val s11 = col("s11"); val s12 = col("s12")
    val s22 = col("s22"); val s1y = col("s1y"); val s2y = col("s2y")
    val syy = col("syy")
    // Cramer over M = [[sw,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]],
    // rhs = [sy,s1y,s2y]
    val dD = guarded(
      sw * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2) +
        sx2 * (sx1 * s12 - s11 * sx2), "det(X'WX)").as("__d")
    val d0 = guarded(
      sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y) +
        sx2 * (s1y * s12 - s11 * s2y), "det0").as("__d0")
    val d1 = guarded(
      sw * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2) +
        sx2 * (sx1 * s2y - s1y * sx2), "det1").as("__d1")
    val d2 = guarded(
      sw * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2) +
        sy * (sx1 * s12 - s11 * sx2), "det2").as("__d2")
    // the same loud-readout discipline as linearFit's w_total
    val wTotal = when(sw <= lit(Long.MaxValue).cast("decimal(38,0)"),
      sw.cast("long")).otherwise(raise_error(lit(
      "multiFit: total weight exceeds long range — rescale weights")))
      .as("w_total")
    val stage = agg.select(col("grp"), col("n"), wTotal,
      sy, s1y, s2y, syy, sw, dD, d0, d1, d2)
    // E = SSE·D (exact, ≥ 0 when D > 0); S = SST·sw (exact)
    val e = guarded(
      col("syy") * col("__d") - (col("sy") * col("__d0") +
        col("s1y") * col("__d1") + col("s2y") * col("__d2")),
      "SSE*det").as("__e")
    val sst = guarded(col("sw") * col("syy") - col("sy") * col("sy"),
      "SST*sw").as("__s")
    stage.select(col("grp"), col("n"), col("w_total"),
        col("__d"), col("__d0"), col("__d1"), col("__d2"), e, sst)
      .select(col("grp"), col("n"), col("w_total"),
        when(col("__d") > 0, dbl(col("__d0")) / dbl(col("__d")))
          .as("b0"),
        when(col("__d") > 0, dbl(col("__d1")) / dbl(col("__d")))
          .as("b1"),
        when(col("__d") > 0, dbl(col("__d2")) / dbl(col("__d")))
          .as("b2"),
        when(col("__d") > 0 && col("__s") > 0,
          lit(1.0).cast("double") -
            dbl(col("__e")) * dbl(col("w_total")) /
              (dbl(col("__d")) * dbl(col("__s")))).as("r2"))
  }

  /** Two-sided group-sequential boundary constants c(K, α) for K
    * equally-spaced looks — the LITERAL tables (O'Brien & Fleming,
    * Biometrics 1979; Pocock, Biometrika 1977; the standard tabulation
    * in Jennison & Turnbull, Group Sequential Methods, Tables
    * 2.1/2.3), keyed by (K, alphaPermille). MC-validated in StatsSpec
    * (400k Brownian paths reproduce the nominal α within simulation
    * noise for every entry). O'Brien-Fleming rejects at look k when
    * |Z_k| ≥ c/√(t_k) (conservative early, ~nominal at the end);
    * Pocock uses the constant |Z_k| ≥ c at every look. */
  val ObfC: Map[(Int, Int), Double] = Map(
    (1, 50) -> 1.960, (2, 50) -> 1.977, (3, 50) -> 2.004,
    (4, 50) -> 2.024, (5, 50) -> 2.040,
    (1, 10) -> 2.576, (2, 10) -> 2.580, (3, 10) -> 2.595,
    (4, 10) -> 2.609, (5, 10) -> 2.621)
  val PocockC: Map[(Int, Int), Double] = Map(
    (1, 50) -> 1.960, (2, 50) -> 2.178, (3, 50) -> 2.289,
    (4, 50) -> 2.361, (5, 50) -> 2.413,
    (1, 10) -> 2.576, (2, 10) -> 2.772, (3, 10) -> 2.873,
    (4, 10) -> 2.939, (5, 10) -> 2.986)

  /** Group-sequential rejection threshold on the SQUARED
    * sum-difference surface (the [[msprtThreshold]] move): at a
    * balanced look of n units per arm with literal per-unit variance
    * σ², Z_k = Δ_k/√(2nσ²), and the O'Brien-Fleming test
    * |Z_k| ≥ c/√(t_k) with t_k = n_k/n_K collapses to the FLAT
    * partial-sum boundary Δ_k² ≥ ⌈c²·2σ²·n_K⌉ (the classic "OBF is
    * constant on the B-value scale"); Pocock's |Z_k| ≥ c becomes the
    * per-look Δ_k² ≥ ⌈c²·2σ²·n_k⌉. Computed HERE once — both engines
    * compare the exact integer Δ² against the same literal. */
  def gsThreshold(kTotal: Int, look: Long, lastLook: Long,
      sigma2: Double, alphaPermille: Int, pocock: Boolean): BigInt = {
    require(sigma2 > 0, s"sigma2 must be > 0, got $sigma2")
    val table = if (pocock) PocockC else ObfC
    val c = table.getOrElse((kTotal, alphaPermille),
      throw new IllegalArgumentException(
        s"gsThreshold: no boundary constant tabulated for K=$kTotal, " +
          s"alpha=$alphaPermille permille (K in 1..5, alpha in " +
          "{10, 50})"))
    val n = if (pocock) look else lastLook
    BigDecimal(c * c * 2.0 * sigma2 * n.toDouble)
      .setScale(0, BigDecimal.RoundingMode.CEILING).toBigInt
  }

  /** Classic planned-interim-analysis A/B testing — the
    * group-sequential test with O'Brien-Fleming (default) or Pocock
    * boundaries, next to [[msprtCuped]]'s always-valid peeking: K
    * PRE-PLANNED equally-spaced balanced looks, reject when the look's
    * statistic crosses the literal boundary; overall type-I error is
    * the caller's α by construction of c(K, α). O'Brien-Fleming spends
    * almost nothing early (the look-1 boundary at K=5 is ~4.6σ) and
    * ~α at the final look — the shape a data-pipeline owner wants when
    * early stops should need overwhelming evidence.
    *
    * Exactness: Δ_k = Σ_treat y − Σ_ctrl y at balanced look k is exact
    * integer arithmetic; both engines compare Δ_k² (decimal 128-bit)
    * against [[gsThreshold]]'s literal — the whole readout gates
    * hash-exact, like q264. Looks are balanced exactly as
    * [[msprtCuped]]: look n emits only when BOTH arms reached n units
    * in (orderCol, idCol) arrival order.
    *
    * Output per (group, complete look): (grp, look, delta, rejected,
    * rejected_any) — rejected_any is the monotone stop decision (a
    * planned design STOPS at the first crossing; later looks are
    * reported for audit with the flag already latched).
    *
    * Scale shape: identical to [[msprtCuped]] — one rank window pruned
    * map-side to looks.max, ONE hash-agg to group grain, a stack()
    * unpivot of the K looks, the running-max window on ≤K rows per
    * group. */
  def groupSequential(units: DataFrame, grpCol: String,
      variant01: Column, yCol: String, orderCol: String, idCol: String,
      looks: Seq[Long], sigma2: Double, alphaPermille: Int = 50,
      pocock: Boolean = false): DataFrame = {
    require(looks.nonEmpty && looks.size <= 5 &&
      looks == looks.sorted && looks.distinct == looks &&
      looks.head >= 1,
      s"looks must be <= 5 strictly increasing positives, got $looks")
    require(looks.zipWithIndex.forall { case (n, i) =>
        n == looks.head * (i + 1) },
      s"looks must be equally spaced (the tabulated-constant " +
        s"assumption), got $looks")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val y = col(yCol).cast("long")
    val arm = variant01.cast("int")
    val base = units
      .filter(col(grpCol).isNotNull && y.isNotNull && arm.isin(0, 1) &&
        col(orderCol).isNotNull && col(idCol).isNotNull)
      // decimal(38,0) BEFORE summing: a long-typed sum would overflow
      // silently at corpus scale (the msprtCuped discipline)
      .select(col(grpCol).as("grp"), arm.as("arm"), d38(y).as("v"),
        col(orderCol).as("ord"), col(idCol).as("id"))
    val w = Window.partitionBy(col("grp"), col("arm"))
      .orderBy(col("ord"), col("id"))
    val ranked = base
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= looks.max)
    val aggs = looks.zipWithIndex.flatMap { case (nl, i) =>
      def side(a: Int, nm: String) = Seq(
        sum(when(col("arm") === a && col("rk") <= nl, col("v")))
          .as(s"__s${nm}_$i"),
        count(when(col("arm") === a && col("rk") <= nl, lit(1)))
          .as(s"__c${nm}_$i"))
      side(1, "t") ++ side(0, "c")
    }
    val wide = ranked.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
    val stackArgs = looks.indices.map(i =>
      s"${looks(i)}L, $i, __st_$i, __ct_$i, __sc_$i, __cc_$i")
      .mkString(", ")
    val crit = array(looks.map(n =>
      lit(new java.math.BigDecimal(
        gsThreshold(looks.size, n, looks.max, sigma2, alphaPermille,
          pocock).bigInteger))): _*)
    val byLook = Window.partitionBy(col("grp")).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wide
      .select(col("grp"), expr(s"stack(${looks.size}, $stackArgs) AS " +
        "(look, __li, __st, __ct, __sc, __cc)"))
      .filter(col("__ct") === col("look") && col("__cc") === col("look"))
      .withColumn("__dd", col("__st") - col("__sc"))
      .withColumn("delta", when(col("__dd").between(
          lit(Long.MinValue), lit(Long.MaxValue)),
          col("__dd").cast("long"))
        .otherwise(raise_error(lit(
          "groupSequential: delta overflows long — rescale the metric"))))
      .withColumn("rejected", d38(col("delta")) * d38(col("delta")) >=
        element_at(crit, col("__li") + 1))
      .withColumn("rejected_any",
        max(col("rejected").cast("int")).over(byLook) === 1)
      .select(col("grp"), col("look"), col("delta"), col("rejected"),
        col("rejected_any"))
  }
}
