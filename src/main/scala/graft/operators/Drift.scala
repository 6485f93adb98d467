package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus drift / keyness analysis — which tokens are statistically
  * over-represented in corpus A vs corpus B (Dunning, "Accurate
  * methods for the statistics of surprise and coincidence", CL 19(1)
  * 1993): the log-likelihood-ratio G² over each token's 2×2
  * contingency table. THE report a pipeline owner reads when a new
  * crawl snapshot lands ("what changed?"), when comparing a filtered
  * corpus against its input ("what did the filter remove?"), or when
  * auditing a source against the rest of the mix.
  *
  * G² = 2·Σ O·ln(O/E) over the four cells — computed per token from
  * exact long counts; every ln input is formed as ONE double ratio of
  * double products of exact counts (correctly rounded, so both
  * engines build bit-identical ln inputs), and the gate surface is
  * the token-tiebroken RANK, never the raw G² (the q77 rule for
  * log-bearing scores). Zero cells contribute 0 (the 0·ln 0 = 0
  * convention). `direction` reports which corpus the token is
  * enriched in by exact integer cross-multiplication
  * (a·totalB vs b·totalA).
  *
  * Scale shape: one token-count agg per corpus (partial+final,
  * map-side combine), a full-outer equi-join on the token key, totals
  * as broadcast 1-row frames, the G² expression stateless per token,
  * and top-k through TakeOrderedAndProject — no global sort, nothing
  * driver-side. */
object Drift {

  private def counts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  /** Top-`k` drifted tokens between `a` and `b`: (rk, tok, ca, cb,
    * direction) with rk 1..k by G² descending, token tiebreak. */
  def keynessTopK(a: DataFrame, b: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ca = counts(a, textCol).select(col("tok"), col("c").as("ca"))
    val cb = counts(b, textCol).select(col("tok"), col("c").as("cb"))
    val ta = a.select(explode(TextFunctions.tokens(col(textCol)))
      .as("t")).agg(count(lit(1)).as("__ta"))
    val tb = b.select(explode(TextFunctions.tokens(col(textCol)))
      .as("t")).agg(count(lit(1)).as("__tb"))
    val joined = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
    val d = (x: Column) => x.cast("double")
    val tt = col("__ta") + col("__tb")
    // one G² cell: obs·ln((obs·total)/(corpusTotal·colTotal)), formed
    // as a single division of two double products so both engines
    // build the identical ln input; empty cells contribute 0
    def cell(obs: Column, corpusTotal: Column, colTotal: Column): Column =
      when(obs === 0, lit(0.0)).otherwise(
        d(obs) * log((d(obs) * d(tt)) / (d(corpusTotal) * d(colTotal))))
    val ab = col("ca") + col("cb")
    val rest = tt - ab
    val g2 = (cell(col("ca"), col("__ta"), ab)
      + cell(col("cb"), col("__tb"), ab)
      + cell(col("__ta") - col("ca"), col("__ta"), rest)
      + cell(col("__tb") - col("cb"), col("__tb"), rest)) * lit(2.0)
    // exact integer cross-multiplication in decimal(38) — long would
    // overflow at 100 TB token totals (1e13 · 1e13); exact ties read
    // as enrichment in b (deterministic)
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val dir = when(d38(col("ca")) * d38(col("__tb")) >
      d38(col("cb")) * d38(col("__ta")), lit("a")).otherwise(lit("b"))
    joined
      .select(col("tok"), col("ca"), col("cb"), dir.as("direction"),
        g2.as("__g2"))
      .orderBy(col("__g2").desc, col("tok")).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("__g2").desc, col("tok"))).cast("long"))
      .select(col("rk"), col("tok"), col("ca"), col("cb"),
        col("direction"))
  }
}
