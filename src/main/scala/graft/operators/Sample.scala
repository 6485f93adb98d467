package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Pipelines need
  * samples that are (a) reproducible across runs, clusters, and
  * engines — a rerun must pick the same rows or downstream caches and
  * ablations diverge — and (b) balanced across strata (language,
  * source, quality bucket) rather than proportional to raw corpus
  * skew. Spark's `df.sample` is seeded per-partition, so its output
  * changes with partitioning; these operators instead derive the
  * "random" order from a hash of the row's stable id, which is
  * partition-independent and reproducible anywhere — including in a
  * different engine entirely (md5 is md5 everywhere), which is what
  * makes the q69 gate oracle-checkable.
  *
  * Scale shape: one shuffle on the strata key, per-partition top-n
  * heap inside the window — no global sort, no driver collection.
  */
object Sample {

  /** The portable per-row sort key: md5 of the id's decimal string.
    * Uniform enough for sampling, stable everywhere; id itself breaks
    * hash ties so the order is total. */
  private def hashOrder(id: Column): Seq[Column] =
    Seq(md5(id.cast("string")), id)

  /** Up to `n` rows per stratum, chosen by hash order — a deterministic
    * stratified sample with exact per-stratum counts. `rank` (1-based
    * within the stratum) rides along so callers can thin further
    * (rank <= m) without resampling. */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashOrder(col(idCol)): _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Deterministic Bernoulli-style sample: keeps a row iff its hash
    * falls below the rate threshold. Uses the first 8 hex chars of the
    * md5 as a uniform 32-bit value — reproducible across engines and
    * partitionings, unlike df.sample. */
  def deterministicFraction(df: DataFrame, idCol: String,
      rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate out of [0,1]")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long")
    df.filter(bucket < lit((rate * (1L << 32)).toLong))
  }
}
