package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone) probability calibration — the PAV fit that maps
  * a classifier's raw score to a calibrated P(label=1 | score), the
  * step a pipeline runs between [[Classifier]] scoring and any
  * decision that treats the score as a probability (threshold picking
  * against a precision target, expected-quality weighting, mixture
  * budgeting). Zadrozny & Elkan (KDD'02) is the standard recipe;
  * the estimator itself is Ayer et al. (Ann. Math. Stat. 1955).
  *
  * Algorithm: pool-adjacent-violators, computed via the CLOSED-FORM
  * minimax identity (Robertson, Wright & Dykstra 1988, Thm 1.4.4)
  * instead of the sequential pooling loop:
  *
  *   rate_k = min_{j>=k} max_{i<=k} mean(pos_i..pos_j / n_i..n_j)
  *
  * which needs only the O(B²) table of interval means over the B
  * score bins — two running-extreme windows over that table, no
  * iteration, no driver loop, so a SQL oracle replays it verbatim.
  *
  * Numerics: bin counts and positives are exact longs; every interval
  * mean is ONE correctly-rounded double division of exact longs, so
  * both engines build bit-identical mean tables, and running max/min
  * over identical doubles select identically (the q183 house rule:
  * data-dependent doubles gate exactly iff every step is a single
  * correctly-rounded IEEE op). Two true means closer than one ulp
  * (~1e-16 — counts would need to exceed 1e12 per bin) could round
  * together; the selection is still deterministic and identical in
  * both engines, so the gate holds regardless.
  *
  * Scale shape: the corpus-sized work is ONE partial+final hash agg
  * (score → n, pos). Everything after runs on the BIN frame, which is
  * model-sized by contract: `maxBins` is require-guarded after a
  * localCheckpoint (the [[Allocate.waterFill]] pattern — the guard
  * count and the downstream branches share one materialization), and
  * the O(B²) pair frame plus its two windows stay bounded by the
  * guard, never by the corpus. Callers with continuous scores bin
  * them first (quantile or fixed-width) — which is also what keeps
  * the calibration statistically honest. */
object Calibrate {

  /** Isotonic calibration curve over score bins. Input: one row per
    * observation with an orderable `scoreCol` (the bin key) and a 0/1
    * `labelCol`. Output: one row per distinct score —
    * (score, n, pos, rate) with rate nondecreasing in score, the
    * PAV-pooled empirical positive rate. */
  def isotonicFit(df: DataFrame, scoreCol: String, labelCol: String,
      maxBins: Int = 1024): DataFrame =
    isotonicFitGrouped(
      df.withColumn("__grp", lit(0)), "__grp", scoreCol, labelCol,
      maxBins).drop("__grp")

  /** Per-group isotonic calibration — one independent PAV curve per
    * `groupCol` value (per language, per source, per classifier
    * head…), which is the shape a real calibration pass takes: one
    * global curve is wrong whenever the score distribution shifts
    * across strata. A null group is a stratum like any other (the
    * q183/temperatureMix contract): grouping keeps it and the
    * pair join is null-safe. Output: (group, score, n, pos, rate),
    * rate nondecreasing within each group.
    *
    * `maxBins` bounds the TOTAL bin frame across all groups, which
    * also bounds the pair frame (Σ_g B_g² <= (Σ_g B_g)²). */
  def isotonicFitGrouped(df: DataFrame, groupCol: String,
      scoreCol: String, labelCol: String,
      maxBins: Int = 1024): DataFrame = {
    require(maxBins >= 1 && maxBins <= 4096,
      s"maxBins=$maxBins out of range — the pair frame is O(maxBins²)")
    val bins = df.select(col(groupCol).as("__g0"),
        col(scoreCol).as("score"), col(labelCol).cast("long").as("__l"))
      .filter(col("score").isNotNull)
      .groupBy(col("__g0"), col("score"))
      .agg(count(lit(1)).as("n"), sum(col("__l")).as("pos"))
      .limit(maxBins + 1)
      .localCheckpoint(false)
    require(bins.count() <= maxBins,
      s"more than maxBins=$maxBins (group, score) bins — isotonicFit " +
        "runs over score BINS (a model-sized frame); bin continuous " +
        "scores before calibrating")
    // bounded-frame windows (post-guard — the waterFill precedent):
    // bin index + cumulative counts in ascending score order per group
    val ord = Window.partitionBy(col("__g0")).orderBy(col("score"))
    val cum = bins
      .withColumn("__k", row_number().over(ord))
      .withColumn("__cn", sum(col("n")).over(ord))
      .withColumn("__cp", sum(col("pos")).over(ord))
    val lo = cum.select(col("__g0").as("__ga"), col("__k").as("__i"),
      col("__cn").as("__cni"), col("__cp").as("__cpi"),
      col("n").as("__ni"), col("pos").as("__pi"))
    val hi = cum.select(col("__g0").as("__gb"), col("__k").as("__j"),
      col("__cn").as("__cnj"), col("__cp").as("__cpj"))
    // interval means m(i, j) = (S_j - S_{i-1}) / (C_j - C_{i-1}) for
    // i <= j — prefixes difference via (cum_j - cum_i + bin_i)
    val means = lo.join(hi,
        col("__ga") <=> col("__gb") && col("__i") <= col("__j"))
      .select(col("__ga").as("__g"), col("__i"), col("__j"),
        ((col("__cpj") - col("__cpi") + col("__pi")).cast("double") /
         (col("__cnj") - col("__cni") + col("__ni")).cast("double"))
          .as("__m"))
    // G(k, j) = max_{i<=k} m(i, j): running max over i within each j;
    // rate_k = min_{j>=k} G(k, j): reverse running min within each k,
    // read off at j = k
    val g = means.withColumn("__gmax", max(col("__m")).over(
      Window.partitionBy(col("__g"), col("__j")).orderBy(col("__i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("__g"), col("__i").as("__k"), col("__j"),
        col("__gmax"))
    val fit = g.withColumn("__r", min(col("__gmax")).over(
      Window.partitionBy(col("__g"), col("__k")).orderBy(col("__j").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__j") === col("__k"))
      .select(col("__g"), col("__k"), col("__r"))
    cum.join(fit,
        cum("__g0") <=> fit("__g") && cum("__k") === fit("__k"))
      .select(col("__g0").as(groupCol), col("score"), col("n"),
        col("pos"), col("__r").as("rate"))
  }

  /** SERVE the fitted curve: attach a `calibrated` column to scored
    * rows by step-function extension of an [[isotonicFit]] output —
    * each row takes the rate of the LARGEST fitted bin ≤ its score
    * (the standard isotonic-regression extension between training
    * bins), clamped to the first bin's rate below the fitted range.
    * The fit is MODEL-SIZED by isotonicFit's own maxBins contract, so
    * it collects to the driver and inlines as a sorted array literal
    * (the PQ-codebook pattern) — the scoring pass is a stateless
    * projection doing one in-row array walk per row: zero joins, zero
    * shuffles, streaming-safe. Scores must be castable to long; a NULL
    * (or non-castable) score calibrates to NULL, never to a bin's rate
    * (ADVICE r13: silently emitting a confident probability for
    * missing input is a labeling bug waiting to happen). */
  def applyFit(df: DataFrame, fit: DataFrame, scoreCol: String,
      as: String = "calibrated"): DataFrame = {
    val rows = fit.select(col("score").cast("long"), col("rate"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    require(rows.nonEmpty, "empty calibration fit")
    require(rows.map(_._1).distinct.length == rows.length,
      "duplicate scores in calibration fit")
    val scores = typedLit(rows.map(_._1).toSeq)
    val rates = typedLit(rows.map(_._2).toSeq)
    // index of the largest fitted score <= s, via one aggregate walk;
    // 0 (the first bin) when s is below the fitted range. try_cast:
    // a malformed score is missing input (NULL output below), not an
    // ANSI runtime error killing the scoring job
    val s = col(scoreCol).try_cast("long")
    val idx =
      if (rows.length == 1) lit(0) // Spark sequence(1, 0) descends
      else aggregate(
        sequence(lit(1), lit(rows.length - 1)),
        lit(0),
        (acc, i) => when(element_at(scores, i + 1) <= s, i)
          .otherwise(acc))
    df.withColumn(as, when(s.isNotNull, element_at(rates, idx + 1)))
  }

  /** Split-conformal quantile threshold per group (Vovk's conformal
    * prediction, in the split form of Papadopoulos et al. ECML 2002 /
    * Lei et al. JASA 2018): over a calibration set of nonconformity
    * scores, qhat = the r-th smallest score with
    * r = ⌈(n+1)·(1−α)⌉ — then, for exchangeable data, a FRESH point's
    * score exceeds qhat with probability ≤ α, distribution-free. The
    * uncertainty-quantification sibling of [[isotonicFit]]: isotonic
    * recalibrates probabilities, conformal turns any score into a
    * guaranteed-coverage accept/flag rule (the screen a filtering
    * pipeline wants before trusting a quality score's tail).
    *
    * Exactness: r is pure integer arithmetic
    * ((n+1)·(αDen−αNum) + αDen−1) div αDen, and qhat is an ORDER
    * STATISTIC — an actual row value selected at rank r under a
    * (score, tiebreak) sort — so it is exact in any engine (the
    * [[Privacy.quantileProfile]] rule: order statistics, never
    * interpolated percentiles). Groups too small for the guarantee
    * (r > n, i.e. n < (αDen−αNum)/αNum roughly 1/α − 1) yield a NULL
    * qhat rather than a threshold that cannot hold its coverage.
    *
    * Scale shape: one row_number window per group (group-sized
    * partitions — the quantileProfile executor-fit argument) and one
    * group agg. Output: (group, n, qhat). */
  def conformalThreshold(df: DataFrame, groupCol: String,
      scoreCol: String, tieCol: String, alphaNum: Long,
      alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaDen > 0 && alphaNum < alphaDen,
      s"alpha $alphaNum/$alphaDen must be in (0, 1)")
    val keep = alphaDen - alphaNum
    df.select(col(groupCol).as("grp"),
        col(scoreCol).cast("long").as("v"), col(tieCol).as("tb"))
      .filter(col("v").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("tb"))))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("grp"))))
      .withColumn("__r",
        expr(s"((__n + 1) * ${keep}L + ${alphaDen - 1}L) " +
          s"div ${alphaDen}L"))
      .groupBy(col("grp"))
      .agg(max(col("__n")).as("n"),
        max(when(col("__rn") === col("__r"), col("v"))).as("qhat"))
  }
}
