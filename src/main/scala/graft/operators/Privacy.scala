package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy / release-risk profiling over structured metadata — the
  * k-anonymity audit (Sweeney, IJUFKS 2002) a pipeline runs before
  * shipping a dataset whose quasi-identifier columns (demographics,
  * geography, account tier…) could single people out: every
  * equivalence class of the quasi-identifier tuple is counted, and
  * classes smaller than k are the re-identification risk surface.
  * Complements the text-side PII redaction operator (q75) on the
  * structured side. No reference analogue.
  */
object Privacy {

  /** k-anonymity profile: one row per quasi-identifier equivalence
    * class with its size and an `at_risk` flag (size < k). One
    * hash-agg keyed by the QI tuple, map-side combine — the exact
    * shape of exact dedup, and like it safe under a mega-class (hot
    * reduce key, partial counts combine upstream). */
  def kAnonymityClasses(df: DataFrame, quasiIds: Seq[Column],
      k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity profile (Machanavajjhala et al., ICDE 2006) — the
    * audit k-anonymity misses: a class can be large yet leak the
    * sensitive attribute outright when every member SHARES it
    * (homogeneity attack). One row per quasi-identifier equivalence
    * class with its size, the number of DISTINCT sensitive values,
    * and an `at_risk` flag (distinct sensitive < l). Same hash-agg
    * shape as [[kAnonymityClasses]]; the distinct count is Spark's
    * two-phase partial-distinct aggregate, so a mega-class combines
    * upstream exactly like exact dedup. */
  def lDiversityClasses(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** Corpus-level k-anonymity summary: class census plus the headline
    * numbers a release review reads — how many records sit in
    * sub-k classes and what fraction of the corpus that is. */
  def kAnonymitySummary(df: DataFrame, quasiIds: Seq[Column],
      k: Long): DataFrame =
    kAnonymityClasses(df, quasiIds, k)
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_records"),
        sum(when(col("at_risk"), lit(1L)).otherwise(lit(0L)))
          .as("risk_classes"),
        sum(when(col("at_risk"), col("class_size")).otherwise(lit(0L)))
          .as("risk_records"))
      .withColumn("risk_fraction",
        col("risk_records").cast("double") / col("n_records"))

  /** Exact ORDER-STATISTIC quantile profile per group — p25/p50/p75/p90
    * of a numeric column as the value at row ceil(p·n) of the
    * (value, tiebreak) sort order. Deliberately NOT an interpolated
    * percentile: the selected value is an actual row value, so it is
    * exact in any engine (interpolation definitions and their double
    * arithmetic differ between engines; order statistics do not).
    *
    * Scale shape: one window (row_number partitioned by group — the
    * documented skew bound: the biggest group must sort within its
    * partition's executor; per-source/per-shard groupings hold that
    * easily) + one group count join, then a filter to the four
    * selected rows per group and a pivot-style conditional agg. */
  def quantileProfile(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String): DataFrame = {
    val ranked = df.select(col(groupCol).as("grp"),
        col(valCol).cast("long").as("v"), col(tieCol).as("tb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("tb"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("grp"))))
    def pick(num: Int, den: Int): Column =
      // ceil(p*n) with integer arithmetic: (num*n + den - 1) div den
      max(when(col("rn") === expr(s"($num * n + ${den - 1}) div $den"),
        col("v")))
    ranked.groupBy(col("grp"))
      .agg(max(col("n")).as("n"),
        pick(1, 4).as("p25"), pick(2, 4).as("p50"),
        pick(3, 4).as("p75"), pick(9, 10).as("p90"))
      .select(col("grp"), col("n"), col("p25"), col("p50"), col("p75"),
        col("p90"))
  }
}
