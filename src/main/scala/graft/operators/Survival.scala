package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis — the Kaplan-Meier product-limit estimator
  * (Kaplan & Meier, JASA 1958) over right-censored durations: the
  * "how long until churn / failure / removal?" readout next to the
  * retention cohorts (q203), with censoring done RIGHT — a user still
  * alive at the observation horizon is at-risk until their censor
  * time, never an event, never silently dropped.
  *
  * The exactness wall, and how it is crossed: S(t) = Π_{t_i ≤ t}
  * (1 − d_i/n_i) is an ORDER-DEPENDENT float product — the one shape
  * the q183 fixed-IEEE-tree discipline cannot gate (NEXT r15). The
  * life table itself (event counts d_i, censor counts c_i, at-risk
  * n_i) is exact integer arithmetic and gates hash-exact; for the
  * product, the engine's fixed-point treatment (the HDR / NDCG
  * discount move): survival is computed as the multiply-then-floor
  * fold  fp_0 = 2^40,  fp_i = ⌊fp_{i−1}·(n_i − d_i) / n_i⌋  over
  * event times ascending — pure integer ops with a well-defined
  * order, so BOTH engines replay it bit-exactly (Spark: one
  * aggregate() higher-order fold per group; DuckDB: a recursive CTE
  * with the same recurrence). Each step floors away < 2^-40 relative,
  * so after k distinct event times fp/2^40 ∈ [S·(1−k·2^-40), S] —
  * at k = 4096 that is < 2^-28 relative, eleven orders below any
  * confidence band. `surv` = fp/2^40 is ONE exact IEEE division.
  *
  * Envelope, ENFORCED: n_at_risk < 2^23 per group (fp·n_i must fit a
  * long) and ≤ 4096 distinct durations per group (the fold's array
  * grain — a life-table resolution, not a corpus bound; bucket
  * durations upstream for finer-grained data). Violations raise.
  *
  * Scale shape: one (grp, t) hash-agg builds the life table, the
  * at-risk walk and the fold run on the life-table frame (≤ 4096
  * rows per group), one posexplode back out. Nothing corpus-wide
  * after the first agg. */
object Survival {

  /** Fixed-point scale of the survival fold: 2^40. */
  val KmFpOne: Long = 1L << 40

  /** Kaplan-Meier life table + fixed-point survival per (group,
    * distinct duration): (grp, t, n_at_risk, d, c, surv_fp, surv).
    * `eventCol` is 1 for an observed event, 0 for right-censoring
    * (rows with other values are rejected loudly); durations are
    * nonnegative longs; null group/duration/event rows drop.
    * surv_fp is S(t)·2^40 under the documented floor fold —
    * monotone nonincreasing in t; censor-only times keep the
    * previous survival (d = 0 steps multiply by exactly 1). */
  def kaplanMeier(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String): DataFrame = {
    val t = col(durCol).cast("long")
    val e = col(eventCol).cast("long")
    val base = df
      .filter(col(grpCol).isNotNull && t.isNotNull && e.isNotNull)
      .select(col(grpCol).as("grp"), t.as("t"),
        when(e.isin(0L, 1L) && t >= 0L, e)
          .otherwise(raise_error(lit("kaplanMeier: event must be " +
            "0/1 and duration >= 0"))).as("e"))
    val lt = base.groupBy(col("grp"), col("t"))
      .agg(sum(col("e")).as("d"),
        sum(lit(1L) - col("e")).as("c"),
        count(lit(1)).as("__m"))
    val byT = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val whole = Window.partitionBy(col("grp"))
    val risky = lt
      .withColumn("__tot", sum(col("__m")).over(whole))
      .withColumn("n_at_risk",
        col("__tot") - coalesce(sum(col("__m")).over(byT), lit(0L)))
      .withColumn("n_at_risk",
        when(col("__tot") < lit(1L << 23), col("n_at_risk"))
          .otherwise(raise_error(lit("kaplanMeier: group exceeds " +
            "2^23 at-risk rows — the fixed-point fold would overflow"))))
    val folded = risky
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("t"), col("d"),
        col("c"), col("n_at_risk")))).as("__rows"))
      .withColumn("__rows", when(size(col("__rows")) <= 4096,
        col("__rows"))
        .otherwise(raise_error(lit("kaplanMeier: more than 4096 " +
          "distinct durations in a group — bucket durations upstream"))))
      // fps(i+1) = survival AFTER the i-th distinct time; fps(0) = 2^40
      .withColumn("__fps", expr(
        s"""aggregate(__rows, array(${KmFpOne}L), (acc, x) ->
            concat(acc, array((element_at(acc, -1) *
              (x.n_at_risk - x.d)) DIV x.n_at_risk)))"""))
      .select(col("grp"),
        posexplode(col("__rows")).as(Seq("__i", "__r")),
        col("__fps"))
    folded.select(col("grp"), col("__r.t").as("t"),
      col("__r.n_at_risk").as("n_at_risk"), col("__r.d").as("d"),
      col("__r.c").as("c"),
      element_at(col("__fps"), col("__i") + 2).as("surv_fp"))
      .withColumn("surv",
        col("surv_fp").cast("double") / lit(KmFpOne.toDouble))
  }

  /** Log-rank test (Mantel 1966; Peto & Peto 1972) — "do these two
    * survival curves differ?", the hypothesis test next to
    * [[kaplanMeier]]'s estimate: at every pooled event time, compare
    * arm 1's observed events d1ₜ against the hypergeometric
    * expectation dₜ·n1ₜ/nₜ under H0, pool, and χ²₁ = (Σ(O−E))²/ΣV.
    * Structurally the [[Stats.cmhTest]] statistic with event times as
    * the strata — and it gates hash-exact by the same two moves:
    * each time's tn = (d1ₜ·nₜ − dₜ·n1ₜ)/nₜ and
    * tv = dₜ·n1ₜ(nₜ−n1ₜ)(nₜ−dₜ)/(nₜ²(nₜ−1)) are ONE division of
    * exactly-formed 128-bit integers, and the cross-time sums run as
    * the ordered fold (time ascending) both engines replay
    * identically.
    *
    * Times with no events contribute nothing and drop; times with
    * nₜ < 2 are undefined (single subject left) and drop; a group
    * with pooled V = 0 reports NULL. Censoring enters through the
    * at-risk walks only — exactly the Kaplan-Meier discipline.
    * Envelope: per-group rows < 10^9 (tv's 4-factor numerator), ≤
    * 4096 distinct event times (the fold grain, ENFORCED loudly).
    *
    * Output: (grp, n_times, num, var, chi2, significant).
    * Scale shape: one (grp, t, arm) hash-agg, two at-risk window
    * walks on the time frame, the fold on ≤ 4096 rows per group. */
  def logRank(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String, arm01: Column, critical: Double): DataFrame = {
    require(critical > 0, s"critical value must be > 0, got $critical")
    val t = col(durCol).cast("long")
    val e = col(eventCol).cast("long")
    val arm = arm01.cast("int")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val base = df
      .filter(col(grpCol).isNotNull && t.isNotNull && e.isNotNull &&
        arm.isin(0, 1))
      .select(col(grpCol).as("grp"), t.as("t"),
        when(e.isin(0L, 1L) && t >= 0L, e)
          .otherwise(raise_error(lit("logRank: event must be 0/1 " +
            "and duration >= 0"))).as("e"),
        arm.as("arm"))
    val cells = base.groupBy(col("grp"), col("t"))
      .agg(sum(when(col("arm") === 1, col("e")).otherwise(lit(0L)))
          .as("d1"),
        sum(col("e")).as("dt"),
        sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L)))
          .as("m1"),
        count(lit(1)).as("m"))
    val byT = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val whole = Window.partitionBy(col("grp"))
    val risky = cells
      .withColumn("n1t", sum(col("m1")).over(whole)
        - coalesce(sum(col("m1")).over(byT), lit(0L)))
      .withColumn("nt", sum(col("m")).over(whole)
        - coalesce(sum(col("m")).over(byT), lit(0L)))
      .filter(col("dt") > 0 && col("nt") >= 2)
    val terms = risky.select(col("grp"), col("t"),
      (dbl(d38(col("d1")) * d38(col("nt"))
        - d38(col("dt")) * d38(col("n1t"))) / dbl(col("nt"))).as("tn"),
      (dbl(d38(col("dt")) * d38(col("n1t"))
          * d38(col("nt") - col("n1t")) * d38(col("nt") - col("dt"))) /
        dbl(d38(col("nt")) * d38(col("nt")) * d38(col("nt") - 1)))
        .as("tv"))
    terms
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("t"), col("tn"),
        col("tv")))).as("__rows"))
      .withColumn("__rows", when(size(col("__rows")) <= 4096,
        col("__rows"))
        .otherwise(raise_error(lit(
          "logRank: more than 4096 distinct event times in a group"))))
      .withColumn("__f", expr(
        """aggregate(__rows, named_struct('n', 0.0D, 'v', 0.0D),
           (acc, x) -> named_struct('n', acc.n + x.tn,
                                    'v', acc.v + x.tv))"""))
      .select(col("grp"), size(col("__rows")).cast("long")
          .as("n_times"),
        col("__f.n").as("num"), col("__f.v").as("var"))
      .withColumn("chi2", when(col("var") > 0,
        (col("num") * col("num")) / col("var")))
      .withColumn("significant",
        when(col("var") > 0, col("chi2") > critical))
  }

  /** Breslow-weighted log-rank (Gehan-Breslow generalized Wilcoxon;
    * Breslow 1970) — [[logRank]] with weight wₜ = nₜ: early
    * differences count harder (each term scales by how many subjects
    * still watch), the test a churn analyst wants when the curves
    * cross late but separate early. The nₜ weight CANCELS the
    * denominator: the pooled numerator Σ (d1ₜ·nₜ − dₜ·n1ₜ) becomes an
    * EXACT 128-bit integer sum — order-free, no fold needed — and
    * only the variance Σ nₜ²·Vₜ = Σ dₜ·n1ₜ(nₜ−n1ₜ)(nₜ−dₜ)/(nₜ−1)
    * (nₜ² cancels) rides the ordered fold. Same drop rules, envelope
    * (per-group rows < 10^9 — the same 4-factor numerator), and
    * output shape as [[logRank]]: (grp, n_times, num, var, chi2,
    * significant); num here is the exact integer checked into a
    * double for the χ² ratio. */
  def logRankBreslow(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String, arm01: Column, critical: Double): DataFrame = {
    require(critical > 0, s"critical value must be > 0, got $critical")
    val t = col(durCol).cast("long")
    val e = col(eventCol).cast("long")
    val arm = arm01.cast("int")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dbl = (c: Column) => c.cast("double")
    val base = df
      .filter(col(grpCol).isNotNull && t.isNotNull && e.isNotNull &&
        arm.isin(0, 1))
      .select(col(grpCol).as("grp"), t.as("t"),
        when(e.isin(0L, 1L) && t >= 0L, e)
          .otherwise(raise_error(lit("logRankBreslow: event must be " +
            "0/1 and duration >= 0"))).as("e"),
        arm.as("arm"))
    val cells = base.groupBy(col("grp"), col("t"))
      .agg(sum(when(col("arm") === 1, col("e")).otherwise(lit(0L)))
          .as("d1"),
        sum(col("e")).as("dt"),
        sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L)))
          .as("m1"),
        count(lit(1)).as("m"))
    val byT = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val whole = Window.partitionBy(col("grp"))
    val risky = cells
      .withColumn("n1t", sum(col("m1")).over(whole)
        - coalesce(sum(col("m1")).over(byT), lit(0L)))
      .withColumn("nt", sum(col("m")).over(whole)
        - coalesce(sum(col("m")).over(byT), lit(0L)))
      .filter(col("dt") > 0 && col("nt") >= 2)
    val terms = risky.select(col("grp"), col("t"),
      (d38(col("d1")) * d38(col("nt"))
        - d38(col("dt")) * d38(col("n1t"))).as("tn"),
      (dbl(d38(col("dt")) * d38(col("n1t"))
          * d38(col("nt") - col("n1t")) * d38(col("nt") - col("dt"))) /
        dbl(col("nt") - 1)).as("tv"))
    terms
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_times"),
        sum(col("tn")).as("__num"), // exact integer — order-free
        sort_array(collect_list(struct(col("t"), col("tv"))))
          .as("__rows"))
      .withColumn("__rows", when(size(col("__rows")) <= 4096,
        col("__rows"))
        .otherwise(raise_error(lit("logRankBreslow: more than 4096 " +
          "distinct event times in a group"))))
      .withColumn("__v", expr(
        "aggregate(__rows, 0.0D, (acc, x) -> acc + x.tv)"))
      .select(col("grp"), col("n_times"),
        dbl(col("__num")).as("num"), col("__v").as("var"))
      .withColumn("chi2", when(col("var") > 0,
        (col("num") * col("num")) / col("var")))
      .withColumn("significant",
        when(col("var") > 0, col("chi2") > critical))
  }

  /** Peto-Prentice weighted log-rank (Peto & Peto 1972; Prentice
    * 1978) — [[logRank]] with weight wₜ = S̃(t), the Prentice-modified
    * survival estimate S̃(tᵢ) = Π_{j≤i} (nⱼ − dⱼ + 1)/(nⱼ + 1): late
    * differences are discounted by how much of the population has
    * already left, the censoring-robust counterpart to
    * [[logRankBreslow]]'s raw-nₜ weight (Breslow's weight is known to
    * be censoring-pattern-sensitive; Prentice's is not). Completes the
    * early-vs-late test menu: w = 1 (log-rank), w = nₜ (Breslow),
    * w = S̃ (Peto-Prentice).
    *
    * Exactness: the weight is an order-dependent product of rationals
    * — the Kaplan-Meier wall — so it rides the SAME 2^-40
    * multiply-then-floor integer fold as [[kaplanMeier]]:
    * fp₀ = 2^40, fpᵢ = ⌊fpᵢ₋₁·(nᵢ − dᵢ + 1)/(nᵢ + 1)⌋ over retained
    * pooled event times ascending (the product skips dropped times —
    * self-consistent in both engines). wᵢ = fpᵢ/2^40 is one exact IEEE
    * division (fp ≤ 2^40 < 2^53); each term is then the fixed tree
    * tn = w·tnb, tv = (w·w)·tvb over [[logRank]]'s one-division-exact
    * base terms, and the cross-time sums accumulate inside the same
    * ordered fold — one aggregate() pass carrying (fp, n, v), which a
    * DuckDB recursive CTE replays bit-for-bit.
    *
    * Envelope, ENFORCED: per-group at-risk < 2^23 (fp·(n+1) must fit
    * a long — the kaplanMeier bound) and ≤ 4096 distinct event times.
    * Output and drop rules exactly as [[logRank]]:
    * (grp, n_times, num, var, chi2, significant). */
  def logRankPetoPrentice(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String, arm01: Column, critical: Double): DataFrame = {
    require(critical > 0, s"critical value must be > 0, got $critical")
    val t = col(durCol).cast("long")
    val e = col(eventCol).cast("long")
    val arm = arm01.cast("int")
    val base = df
      .filter(col(grpCol).isNotNull && t.isNotNull && e.isNotNull &&
        arm.isin(0, 1))
      .select(col(grpCol).as("grp"), t.as("t"),
        when(e.isin(0L, 1L) && t >= 0L, e)
          .otherwise(raise_error(lit("logRankPetoPrentice: event must " +
            "be 0/1 and duration >= 0"))).as("e"),
        arm.as("arm"))
    val cells = base.groupBy(col("grp"), col("t"))
      .agg(sum(when(col("arm") === 1, col("e")).otherwise(lit(0L)))
          .as("d1"),
        sum(col("e")).as("dt"),
        sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L)))
          .as("m1"),
        count(lit(1)).as("m"))
    val byT = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val whole = Window.partitionBy(col("grp"))
    val risky = cells
      .withColumn("__tot", sum(col("m")).over(whole))
      .withColumn("__tot",
        when(col("__tot") < lit(1L << 23), col("__tot"))
          .otherwise(raise_error(lit("logRankPetoPrentice: group " +
            "exceeds 2^23 at-risk rows — the fixed-point weight fold " +
            "would overflow"))))
      .withColumn("n1t", sum(col("m1")).over(whole)
        - coalesce(sum(col("m1")).over(byT), lit(0L)))
      .withColumn("nt", col("__tot")
        - coalesce(sum(col("m")).over(byT), lit(0L)))
      .filter(col("dt") > 0 && col("nt") >= 2)
    // ONE ordered fold carries the fixed-point weight AND both sums:
    // the fp update repeats per field (named_struct fields evaluate
    // against the PREVIOUS acc), all integer ops, deterministic.
    terms2Fold(risky, critical)
  }

  /** Cox proportional hazards, two-arm (Cox, JRSS-B 1972; Breslow
    * tie handling, Biometrics 1974) — the semi-parametric effect-size
    * estimate completing the survival family: [[kaplanMeier]]
    * estimates each curve, [[logRank]] tests the difference, Cox
    * QUANTIFIES it as a log hazard ratio β (e^β = the multiplicative
    * risk of arm 1 vs arm 0 at every instant). For a single binary
    * covariate the Breslow partial likelihood lives entirely on the
    * life-table grain:
    *   U(β)  = Σ_t [d1ₜ − dₜ·pₜ],   pₜ = n1ₜ·e^β/(n0ₜ + n1ₜ·e^β)
    *   I(β)  = Σ_t dₜ·pₜ·(1−pₜ)
    * maximized by Newton with a FIXED iteration count (8 — quadratic
    * convergence from β₀ = 0 reaches machine precision for any
    * |β| ≲ 5) so both engines execute the identical instruction
    * sequence: the whole solve is ONE ordered fold over
    * iterations × event times (step s reads life-table row s mod k;
    * at each k-boundary β ← β + U/I and the sums reset), which a
    * DuckDB recursive CTE replays step-for-step.
    *
    * NOT hash-exact BY NATURE, and gated accordingly: e^β of a
    * data-dependent β differs between libm and the JVM in the last
    * ulp, so β agrees cross-engine only to ~1e-13 — the gate (q272)
    * therefore reads RANKS and SIGNS off β (the q77/q94/q98 rank
    * discipline; fixture gaps are checked ≫ 1e-6), never raw doubles.
    * Degenerate steps guard loudly in math, not control flow: a step
    * with I ≤ 0 (every retained time one-armed) keeps β; β clamps to
    * ±30 (complete separation has no finite MLE — the sign is the
    * answer there).
    *
    * Envelope: ≤ 4096 distinct event times per group (fold grain,
    * ENFORCED); the flattened walk is ≤ 8·4096 steps per group.
    * Output: (grp, n_times, events, beta). Scale shape: one
    * (grp, t, arm) hash-agg, two at-risk windows on the time frame,
    * the fold on ≤ 4096-row frames — nothing corpus-wide after the
    * first agg. */
  def coxTwoArm(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String, arm01: Column, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"iters must be in 1..32, got $iters")
    val risky = twoArmLifeTable(df, grpCol, durCol, eventCol, arm01,
      "coxTwoArm")
    coxNewtonFold(risky,
      Seq(col("t"), col("d1"), col("dt"), col("n1t"), col("nt")),
      iters, "coxTwoArm")
  }

  /** The two-arm life table shared by [[coxTwoArm]],
    * [[coxTwoArmEfron]] and [[breslowBaseline]]: per (grp, t) the
    * arm-1/total death counts (d1, dt) and at-risk counts (n1t, nt)
    * via the two standard at-risk windows, retaining only rows with
    * dt > 0 and nt >= 2 (a time with no events or a singleton risk
    * set carries no partial-likelihood information). */
  private def twoArmLifeTable(df: DataFrame, grpCol: String,
      durCol: String, eventCol: String, arm01: Column,
      opName: String): DataFrame = {
    val t = col(durCol).cast("long")
    val e = col(eventCol).cast("long")
    val arm = arm01.cast("int")
    val base = df
      .filter(col(grpCol).isNotNull && t.isNotNull && e.isNotNull &&
        arm.isin(0, 1))
      .select(col(grpCol).as("grp"), t.as("t"),
        when(e.isin(0L, 1L) && t >= 0L, e)
          .otherwise(raise_error(lit(s"$opName: event must be 0/1 " +
            "and duration >= 0"))).as("e"),
        arm.as("arm"))
    val cells = base.groupBy(col("grp"), col("t"))
      .agg(sum(when(col("arm") === 1, col("e")).otherwise(lit(0L)))
          .as("d1"),
        sum(col("e")).as("dt"),
        sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L)))
          .as("m1"),
        count(lit(1)).as("m"))
    val byT = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val whole = Window.partitionBy(col("grp"))
    cells
      .withColumn("n1t", sum(col("m1")).over(whole)
        - coalesce(sum(col("m1")).over(byT), lit(0L)))
      .withColumn("nt", sum(col("m")).over(whole)
        - coalesce(sum(col("m")).over(byT), lit(0L)))
      .filter(col("dt") > 0 && col("nt") >= 2)
  }

  /** Stratified Cox proportional hazards, two-arm — [[coxTwoArm]]
    * with per-stratum baseline hazards and a SHARED log hazard ratio
    * β: the standard confounder control (per country, per source, per
    * signup cohort) when baseline risk differs by stratum but the
    * treatment effect is common. The Breslow partial likelihood is
    * the SUM over strata of per-stratum terms — at-risk sets and
    * event times are computed WITHIN each stratum, and the same fixed
    * 8-iteration Newton walk runs over the rows sorted (stratum,
    * time). Gated like q272 (rank surface), with the same degenerate
    * and clamp conventions; a stratum with no retained event times
    * simply contributes nothing (it carries no information about β).
    * Envelope: ≤ 4096 (stratum × event time) rows per group total.
    * Output: (grp, n_times, events, beta); n_times counts retained
    * (stratum, time) rows. */
  def coxTwoArmStratified(df: DataFrame, grpCol: String,
      stratumCol: String, durCol: String, eventCol: String,
      arm01: Column, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"iters must be in 1..32, got $iters")
    val t = col(durCol).cast("long")
    val e = col(eventCol).cast("long")
    val arm = arm01.cast("int")
    val base = df
      .filter(col(grpCol).isNotNull && col(stratumCol).isNotNull &&
        t.isNotNull && e.isNotNull && arm.isin(0, 1))
      .select(col(grpCol).as("grp"), col(stratumCol).as("s"),
        t.as("t"),
        when(e.isin(0L, 1L) && t >= 0L, e)
          .otherwise(raise_error(lit("coxTwoArmStratified: event " +
            "must be 0/1 and duration >= 0"))).as("e"),
        arm.as("arm"))
    val cells = base.groupBy(col("grp"), col("s"), col("t"))
      .agg(sum(when(col("arm") === 1, col("e")).otherwise(lit(0L)))
          .as("d1"),
        sum(col("e")).as("dt"),
        sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L)))
          .as("m1"),
        count(lit(1)).as("m"))
    val byT = Window.partitionBy(col("grp"), col("s"))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val whole = Window.partitionBy(col("grp"), col("s"))
    val risky = cells
      .withColumn("n1t", sum(col("m1")).over(whole)
        - coalesce(sum(col("m1")).over(byT), lit(0L)))
      .withColumn("nt", sum(col("m")).over(whole)
        - coalesce(sum(col("m")).over(byT), lit(0L)))
      .filter(col("dt") > 0 && col("nt") >= 2)
    coxNewtonFold(risky,
      Seq(col("s"), col("t"), col("d1"), col("dt"), col("n1t"),
        col("nt")),
      iters, "coxTwoArmStratified")
  }

  /** Cox proportional hazards with EFRON tie handling (Efron, JASA
    * 1977) — [[coxTwoArm]]'s Breslow approximation treats the d tied
    * deaths at a time as d draws from the SAME risk set, biasing β
    * toward 0 when ties are heavy; day-granular durations make ties
    * the common case, so Efron is what R's coxph does by default and
    * the first thing a survival user will question. Efron removes the
    * already-dead fraction progressively: the j-th of d tied deaths
    * (j = 0..d−1) sees the risk set minus j/d of the tied deaths'
    * own risk. Mechanically that is the SAME flattened fixed-Newton
    * fold over a life table whose tied times are EXPANDED into d
    * sub-rows (t, j) — each sub-row contributes
    * U += d1/d − p_j, I += p_j(1−p_j) with the downweighted p_j —
    * which a DuckDB recursive CTE replays step-for-step over the
    * identical (t, j) walk. With no ties (every dt = 1) the expansion
    * is the identity and β equals [[coxTwoArm]] bit-for-bit
    * (spec-pinned).
    *
    * Gated like q272: rank/sign/life-table surface (e^β ulp drift),
    * SurvivalSpec cross-checks β against an independent
    * golden-section maximizer of the true Efron partial likelihood.
    * Envelope: ≤ 4096 tie-expansion rows (= events) per group,
    * ENFORCED in the fold. Scale shape: one (grp, t, arm) hash-agg,
    * two at-risk windows, a sequence() explode on the ≤time-grain
    * frame, the fold on ≤ 4096-row frames. */
  def coxTwoArmEfron(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String, arm01: Column, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"iters must be in 1..32, got $iters")
    val risky = twoArmLifeTable(df, grpCol, durCol, eventCol, arm01,
      "coxTwoArmEfron")
      // tie expansion: one sub-row per tied death, j = 0..dt−1 —
      // the fold's per-group grain becomes Σdt (= events), enforced
      // at 4096 like every Cox fold
      .withColumn("j", explode(expr("sequence(0L, dt - 1)")))
    coxNewtonFold(risky,
      Seq(col("t"), col("j"), col("d1"), col("dt"), col("n1t"),
        col("nt")),
      iters, "coxTwoArmEfron", efron = true)
  }

  /** Breslow baseline cumulative hazard (Breslow, Biometrics 1974
    * discussion of Cox 1972) — the readout that turns [[coxTwoArm]]'s
    * relative β into ABSOLUTE survival predictions per arm:
    *   Ĥ₀(t) = Σ_{s ≤ t} dₛ / (n0ₛ + n1ₛ·e^β̂)
    * on the life-table grain, with Ŝ₀(t) = e^(−Ĥ₀(t)) and the
    * proportional-hazards prediction Ŝ₁(t) = e^(−Ĥ₀(t)·e^β̂) for the
    * treated arm. At β = 0 this is EXACTLY the pooled Nelson-Aalen
    * estimator (increments dₛ/nₛ), which is the spec's consistency
    * anchor against [[kaplanMeier]] (NA and KM agree to O(d/n²)
    * per step and exp(−H) ≥ KM always).
    *
    * Output per retained (grp, t): exact life-table integers
    * (d1, dt, n1t, nt — hash-exact cross-engine), beta, h0, s0, s1.
    * The float columns carry e^β̂ of a data-dependent β̂ — libm-vs-JVM
    * ulp territory like q272 — so gates read RANKS off h0, never raw
    * doubles. The running sum is ordered by t within ≤4096-row
    * groups; its sequential association matters only below the rank
    * gate's audited gaps.
    *
    * Scale shape: [[coxTwoArm]]'s shapes plus ONE broadcast join of
    * the per-group β (one row per group, broadcast by construction)
    * back onto the life-table frame and one ordered window on it —
    * nothing corpus-wide after the first agg. */
  def breslowBaseline(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String, arm01: Column, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"iters must be in 1..32, got $iters")
    val risky = twoArmLifeTable(df, grpCol, durCol, eventCol, arm01,
      "breslowBaseline")
    val beta = coxNewtonFold(risky,
      Seq(col("t"), col("d1"), col("dt"), col("n1t"), col("nt")),
      iters, "breslowBaseline")
      .select(col("grp"), col("beta"))
    val byT = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risky
      .join(org.apache.spark.sql.functions.broadcast(beta), "grp")
      .withColumn("__inc", col("dt").cast("double") /
        ((col("nt") - col("n1t")).cast("double") +
          col("n1t").cast("double") * exp(col("beta"))))
      .withColumn("h0", sum(col("__inc")).over(byT))
      .withColumn("s0", exp(-col("h0")))
      .withColumn("s1", exp(-col("h0") * exp(col("beta"))))
      .select(col("grp"), col("t"), col("d1"), col("dt"),
        col("n1t"), col("nt"), col("beta"), col("h0"), col("s0"),
        col("s1"))
  }

  /** The flattened Newton walk shared by [[coxTwoArm]],
    * [[coxTwoArmStratified]] and [[coxTwoArmEfron]]: collect the
    * life-table rows sorted by the leading struct fields, then ONE
    * aggregate over iterations × rows — step s reads row (s mod k)+1,
    * β updates at each k-boundary. The fold reads d1/dt/n1t/nt (and,
    * for Efron, j) by NAME, so any leading sort-key fields (t, or
    * stratum+t, or t+j) ride along untouched. Subexpressions repeat
    * because SQL lambdas have no let-binding — each is deterministic,
    * so repetition is cost, not correctness. The score/information
    * increments are injected per tie-handling scheme: Breslow reads a
    * whole life-table row per step; Efron reads one TIE SUB-ROW
    * (time t, tie index j) per step with the j-th downweighted risk
    * set. */
  private def coxNewtonFold(risky: DataFrame, rowStruct: Seq[Column],
      iters: Int, opName: String, efron: Boolean = false): DataFrame = {
    val xs = "element_at(__rows, CAST(s % size(__rows) AS INT) + 1)"
    val (du, dI) = if (!efron) {
      val a1 = s"(CAST($xs.n1t AS DOUBLE) * exp(acc.b))"
      val p = s"($a1 / (CAST($xs.nt - $xs.n1t AS DOUBLE) + $a1))"
      (s"(CAST($xs.d1 AS DOUBLE) - CAST($xs.dt AS DOUBLE) * $p)",
        s"(CAST($xs.dt AS DOUBLE) * $p * (1.0D - $p))")
    } else {
      // Efron (Efron, JASA 1977): for tie index j of d = dt tied
      // deaths, the risk set is downweighted by j/d of the tied
      // deaths' own risk — p_j = R1_j / (R0_j + R1_j) with
      // R1_j = (n1t − (j/d)·d1)·e^β, R0_j = (nt−n1t) − (j/d)(dt−d1);
      // U += d1/d − p_j, I += p_j(1−p_j). Summed over j this is the
      // textbook Efron score/information; with d = 1 it reduces to
      // Breslow exactly.
      val fr = s"(CAST($xs.j AS DOUBLE) / CAST($xs.dt AS DOUBLE))"
      val a1 = s"((CAST($xs.n1t AS DOUBLE) - $fr * " +
        s"CAST($xs.d1 AS DOUBLE)) * exp(acc.b))"
      val a0 = s"(CAST($xs.nt - $xs.n1t AS DOUBLE) - $fr * " +
        s"CAST($xs.dt - $xs.d1 AS DOUBLE))"
      val p = s"($a1 / ($a0 + $a1))"
      (s"(CAST($xs.d1 AS DOUBLE) / CAST($xs.dt AS DOUBLE) - $p)",
        s"($p * (1.0D - $p))")
    }
    val atEnd = "(s % size(__rows)) = (size(__rows) - 1)"
    val newB = s"""CASE WHEN acc.f + $dI > 0.0D
        THEN greatest(-30.0D, least(30.0D,
          acc.b + (acc.u + $du) / (acc.f + $dI)))
        ELSE acc.b END"""
    risky
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(rowStruct: _*)))
          .as("__rows"),
        sum(col("dt")).as("events"))
      .withColumn("__rows", when(size(col("__rows")) <= 4096,
        col("__rows"))
        .otherwise(raise_error(lit(
          s"$opName: more than 4096 life-table rows in a group"))))
      .withColumn("__w", expr(
        s"""aggregate(
            sequence(0L, CAST($iters * size(__rows) - 1 AS LONG)),
            named_struct('b', 0.0D, 'u', 0.0D, 'f', 0.0D),
            (acc, s) -> named_struct(
              'b', CASE WHEN $atEnd THEN $newB ELSE acc.b END,
              'u', CASE WHEN $atEnd THEN 0.0D ELSE acc.u + $du END,
              'f', CASE WHEN $atEnd THEN 0.0D ELSE acc.f + $dI END))"""))
      .select(col("grp"),
        size(col("__rows")).cast("long").as("n_times"),
        // tie-expanded rows each CARRY the full dt, so summing dt
        // over sub-rows would count Σdt² — for Efron the event count
        // IS the sub-row count (one sub-row per tied death)
        (if (efron) size(col("__rows")).cast("long")
         else col("events")).as("events"),
        col("__w.b").as("beta"))
  }

  /** The Peto-Prentice fold + readout, factored for plan clarity: one
    * sorted collect_list per group, one aggregate() carrying
    * (fp, n, v) over ≤ 4096 life-table rows. */
  private def terms2Fold(risky: DataFrame, critical: Double)
      : DataFrame = {
    risky
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("t"), col("d1"),
        col("dt"), col("n1t"), col("nt")))).as("__rows"))
      .withColumn("__rows", when(size(col("__rows")) <= 4096,
        col("__rows"))
        .otherwise(raise_error(lit("logRankPetoPrentice: more than " +
          "4096 distinct event times in a group"))))
      .withColumn("__f", expr(
        s"""aggregate(__rows,
            named_struct('fp', ${KmFpOne}L, 'n', 0.0D, 'v', 0.0D),
            (acc, x) -> named_struct(
              'fp', (acc.fp * (x.nt - x.dt + 1)) DIV (x.nt + 1),
              'n', acc.n +
                (CAST((acc.fp * (x.nt - x.dt + 1)) DIV (x.nt + 1)
                   AS DOUBLE) / ${KmFpOne}.0D) *
                (CAST(CAST(x.d1 AS DECIMAL(38,0)) * x.nt
                    - CAST(x.dt AS DECIMAL(38,0)) * x.n1t AS DOUBLE)
                  / CAST(x.nt AS DOUBLE)),
              'v', acc.v +
                ((CAST((acc.fp * (x.nt - x.dt + 1)) DIV (x.nt + 1)
                    AS DOUBLE) / ${KmFpOne}.0D) *
                 (CAST((acc.fp * (x.nt - x.dt + 1)) DIV (x.nt + 1)
                    AS DOUBLE) / ${KmFpOne}.0D)) *
                (CAST(CAST(x.dt AS DECIMAL(38,0)) * x.n1t
                    * (x.nt - x.n1t) * (x.nt - x.dt) AS DOUBLE)
                  / CAST(CAST(x.nt AS DECIMAL(38,0)) * x.nt
                      * (x.nt - 1) AS DOUBLE))))"""))
      .select(col("grp"),
        size(col("__rows")).cast("long").as("n_times"),
        col("__f.n").as("num"), col("__f.v").as("var"))
      .withColumn("chi2", when(col("var") > 0,
        (col("num") * col("num")) / col("var")))
      .withColumn("significant",
        when(col("var") > 0, col("chi2") > critical))
  }
}
