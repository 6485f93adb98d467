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

  /** t-closeness profile (Li, Li & Venkatasubramanian, ICDE 2007) —
    * the audit l-diversity misses: a class can carry l distinct
    * sensitive values and STILL leak when its distribution is skewed
    * far from the table's (skewness attack: "90% of this class has
    * condition X" is a disclosure even with 3 distinct conditions).
    * For a categorical sensitive attribute the paper's Earth Mover's
    * Distance under uniform ground distance reduces to total
    * variation: EMD(class, table) = ½·Σ_s |p_class(s) − p_table(s)|.
    *
    * Exactness: with class counts c_gs, class size n_g, table counts
    * c_s, table size n, the distance is Σ_s|c_gs·n − c_s·n_g| /
    * (2·n_g·n) — the numerator is EXACT decimal(38) integer
    * arithmetic (c_gs·n reaches n², past long at 10¹⁰ rows) and the
    * at_risk decision cross-multiplies (emd_num·tDen > 2·n_g·n·tNum),
    * so the flag gates hash-exact; the reported emd is one fixed
    * divide chain. Categories ABSENT from a class contribute their
    * full c_s·n_g term, so the sum runs over a class × category
    * scaffold — bounded by (#classes · #categories), both
    * catalog-sized, never corpus-sized.
    *
    * Scale shape: one (QI, sensitive) hash agg off the corpus (the
    * only corpus-sized stage, map-side combined), then broadcast-sized
    * joins over the class/category frames. Computed quasi-identifiers
    * must be aliased (`expr("...").as("name")`) — the class columns
    * pass through to the output by name. */
  def tClosenessClasses(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, tNum: Long, tDen: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"t $tNum/$tDen must be in (0, 1]")
    val proj = df.select((quasiIds :+ sensitive.as("__s")): _*)
    val qi = proj.columns.dropRight(1).toSeq
    val cells = proj
      .groupBy((qi.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // feeds class totals, category totals, n, join
    val classes = cells.groupBy(qi.map(col): _*)
      .agg(sum(col("__c")).as("class_size"))
    val cats = cells.groupBy(col("__s")).agg(sum(col("__c")).as("__cs"))
    val total = cells.agg(sum(col("__c")).as("__n"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val term = abs(d38(coalesce(col("__c"), lit(0L))) * d38(col("__n"))
      - d38(col("__cs")) * d38(col("class_size")))
    // null-safe join keys: a null quasi-identifier or sensitive value
    // is a stratum like any other (the q183/q209/q213 contract) — a
    // null-unsafe join would zero its cell and break Σ_s p_class = 1
    val cellsR = cells.select((qi.map(c => col(c).as(s"__q_$c")) :+
      col("__s").as("__s2") :+ col("__c")): _*)
    val joinCond = (qi.map(c => col(c) <=> col(s"__q_$c")) :+
      (col("__s") <=> col("__s2"))).reduce(_ && _)
    classes
      .crossJoin(broadcast(cats))
      .crossJoin(broadcast(total))
      .join(cellsR, joinCond, "left")
      .groupBy((qi.map(col) :+ col("class_size") :+ col("__n")): _*)
      .agg(sum(term).as("__emd_num"))
      .select((qi.map(col) :+ col("class_size") :+
        (d(col("__emd_num")) / (lit(2.0) * d(col("class_size"))
          * d(col("__n")))).as("emd") :+
        (col("__emd_num") * lit(tDen) >
          d38(lit(2L) * col("class_size")) * d38(col("__n")) * lit(tNum))
          .as("at_risk")): _*)
  }

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
