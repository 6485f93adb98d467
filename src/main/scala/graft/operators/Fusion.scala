package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25) with a dense-embedding ranking is the standard two-tower
  * retrieval recipe, and Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR'09) is the standard way to combine them without
  * score calibration: fused(d) = Σ_r 1/(C + rank_r(d)).
  *
  * Engine-portable by construction: the reciprocal is computed as
  * `num div (C + rank)` on longs (floor division, identical in Spark
  * and DuckDB), so fused scores are exact integer sums — no float
  * accumulation, no libm — and the gate hash-matches the scores
  * themselves, not just an order. With the default num = 10⁹ the
  * quantization error vs the real 1/(C+r) is < 10⁻⁹·|rankings| —
  * far below any decision boundary RRF is used at.
  *
  * Scale shape: rankings arrive as (id, rank) tables (each typically a
  * top-k, so small relative to the corpus); fusion is one union + one
  * hash-agg keyed by id with map-side combine, then a
  * TakeOrderedAndProject for the fused top-k. Nothing shuffles but the
  * candidate ids.
  */
object Fusion {

  /** Fuse rank tables by RRF. Each input must carry `idCol` and
    * `rankCol` (1-based ranks). Items absent from a ranking simply
    * contribute nothing (the usual top-k-lists convention). Returns
    * the fused top-`k`: (id, fused, rk) ordered by (fused DESC, id),
    * with `fused` the exact integer RRF score. */
  def rrfTopK(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, c: Long = 60L, num: Long = 1000000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(c >= 0 && num > 0, s"bad RRF constants c=$c num=$num")
    val contrib = rankings.map(r =>
        r.select(col(idCol).as("id"),
          expr(s"$num div ($c + ${rankCol})").as("p")))
      .reduce(_ union _)
    contrib.groupBy(col("id")).agg(sum(col("p")).as("fused"))
      .orderBy(col("fused").desc, col("id")).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("fused").desc, col("id"))).cast("long"))
  }
}
