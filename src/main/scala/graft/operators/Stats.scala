package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
