package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget allocation across domains — the planning step a
  * data-mixing pass runs BEFORE sampling: given each domain's
  * available token count n_i and a mixing weight w_i, split a total
  * budget B proportionally to the weights, capping every domain at
  * what it actually has and re-flowing its surplus to the rest
  * (capped proportional allocation / "water-filling"). The output
  * feeds [[Sample.weightedMix]] / token-budget selection (q135) as
  * per-domain targets.
  *
  * Algorithm (exact, closed-form): sort domains ascending by n_i/w_i
  * (scarcity per unit weight; ties by domain). The capped set is a
  * PREFIX of that order: scanning in order with
  * B̂_i = B − Σ_{j<i} n_j and Ŵ_i = W − Σ_{j<i} w_j (as if every
  * earlier domain were capped), domain i is capped iff
  * n_i·Ŵ_i ≤ B̂_i·w_i, and the standard exchange argument gives that
  * once the condition fails it fails for every later domain (later
  * domains have larger n/w, the pool ratio B̂/Ŵ is unchanged by
  * skipping them) — so the boundary k is the FIRST failure, capped
  * domains take n_i, and each uncapped domain takes
  * floor(B̂_k·w_i / Ŵ_k). Floor remainders (< one token per uncapped
  * domain) are deliberately left unallocated. B̂_k ≥ 0 by induction
  * (each capped take removes at most its proportional share).
  *
  * Numerics: all comparisons and the final floor division are exact
  * LONG arithmetic (Spark `div` == DuckDB `//` on non-negatives —
  * the PageRank idiom), with the documented overflow bound
  * max(n_i, B)·Σw_i < 2^63 — at 10^14 tokens and weight sums ≤ 10^4
  * that leaves 900× headroom. The sort key n_i/w_i is one
  * correctly-rounded double division, identical in every engine, with
  * the domain as tiebreak — so a SQL oracle replays the whole
  * allocation and the gate hash-matches.
  *
  * Scale shape: the input is ONE ROW PER DOMAIN (thousands at most —
  * the caller already aggregated the corpus), so the unpartitioned
  * windows here run over a bounded model-sized frame, not a corpus:
  * `maxDomains` is require-guarded and a literal `.limit` rides above
  * the window so the plan itself is provably bounded. The
  * corpus-sized work (counting tokens per domain) happens upstream in
  * an ordinary scalable agg. */
object Allocate {

  /** Water-fill `budget` over `avail` rows (domainCol, availCol,
    * weightCol; weights >= 1). Returns (domainCol, avail, weight,
    * capped, allocation). */
  /** Hamilton largest-remainder apportionment (Hamilton 1792; the
    * quota method, Balinski & Young 1982) — turn stratum weights into
    * EXACT integer sample quotas summing to `total`: each stratum gets
    * base_i = floor(total·w_i / W) slots, and the `total − Σ base`
    * leftover slots go to the largest remainders total·w_i mod W
    * (ties by stratum keys). The companion planning step to
    * [[waterFill]] (capped proportional budget) and
    * [[Sample.matchComposition]] (resample to a target profile):
    * waterFill caps at availability, apportion rounds a proportional
    * plan to whole slots with ZERO drift — Σ slots == total exactly,
    * and no stratum deviates from its real-valued quota by ≥ 1 (the
    * quota property; largest-remainder is the method that satisfies
    * it, which divisor roundings don't).
    *
    * Exactness: products run in decimal(38) (total·w_i reaches 10²¹
    * at a 10⁹-slot plan over 10¹²-row strata — past long), the floor
    * division is integral `div` (identical to DuckDB `//` on
    * non-negatives), remainders derive as total·w − base·W, and the
    * remainder rank is a row_number with full key tie-break —
    * everything integer, hash-exact.
    *
    * Scale shape: one corpus-sized hash agg to (keys, w); everything
    * after runs on the strata frame — catalog-sized by definition (a
    * mixing plan with 10⁶ strata is a 10⁶-row frame), so the global
    * remainder-rank window's single partition is a non-issue, exactly
    * like the 1-row-per-group frames in [[waterFill]]. Output:
    * (keys..., w, slots). */
  def apportion(df: DataFrame, keyCols: Seq[String], weightCol: String,
      total: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one stratum key")
    require(total >= 0, s"total must be >= 0, got $total")
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val w = df
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(weightCol).cast("long")).as("w"))
      .filter(col("w") > 0)
    val t = w.agg(sum(col("w")).as("__tot"))
    val wOrd = Window.orderBy(
      (col("__rem").desc +: keyCols.map(col(_).asc)): _*)
    val wAll = Window.partitionBy()
    w.crossJoin(broadcast(t))
      .withColumn("__base",
        expr(s"(CAST($total AS DECIMAL(38,0)) * w) div __tot"))
      .withColumn("__rem",
        (d38(lit(total)) * d38(col("w"))
          - d38(col("__base")) * d38(col("__tot"))).cast("long"))
      .withColumn("__rr", row_number().over(wOrd))
      .withColumn("__leftover", lit(total) - sum(col("__base")).over(wAll))
      .select((keyCols.map(col) :+ col("w") :+
        (col("__base") + when(col("__rr") <= col("__leftover"), lit(1L))
          .otherwise(lit(0L))).as("slots")): _*)
  }

  def waterFill(avail: DataFrame, domainCol: String, availCol: String,
      weightCol: String, budget: Long, maxDomains: Int = 100000)
      : DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // localCheckpoint the limit(maxDomains+1)-bounded projection FIRST,
    // then guard on the checkpointed frame: the caller's `avail` is
    // typically a CORPUS aggregation, and the plan below references it
    // from four branches (prefix windows, totals, the boundary agg,
    // and the final projection) — checkpointing before the guard means
    // the upstream aggregation executes exactly once (ADVICE r12: the
    // separate limit(maxDomains+1).count() guard was re-running it)
    val base = avail.select(col(domainCol).as("__d"),
        col(availCol).cast("long").as("__n"),
        col(weightCol).cast("long").as("__w"))
      .limit(maxDomains + 1)
      .localCheckpoint(false)
    val got = base.count()
    require(got <= maxDomains,
      s"allocation frame has > maxDomains=$maxDomains rows — waterFill " +
        "runs over per-domain aggregates, not a corpus")
    // scarcity order: ascending n/w, domain tiebreak (a total order —
    // one correctly-rounded double division, portable)
    val ord = Window.orderBy(
      (col("__n").cast("double") / col("__w")).asc, col("__d").asc)
    val staged = base
      .withColumn("__pn",
        coalesce(sum(col("__n")).over(ord.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__pw",
        coalesce(sum(col("__w")).over(ord.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__pos", row_number().over(ord))
    val totals = base.agg(sum(col("__w")).as("__tw"))
    val cond = staged.crossJoin(broadcast(totals))
      .withColumn("__brem", lit(budget) - col("__pn"))
      .withColumn("__wrem", col("__tw") - col("__pw"))
      .withColumn("__capped",
        col("__n") * col("__wrem") <= col("__brem") * col("__w"))
    // the boundary: first position where the cap test fails (the
    // exchange argument makes the capped set exactly the positions
    // before it); its B̂_k/Ŵ_k is the shared pool for the uncapped
    val boundary = cond.filter(!col("__capped"))
      .agg(min(struct(col("__pos"), col("__brem"), col("__wrem")))
        .as("__b"))
      .select(col("__b").getField("__pos").as("__k"),
        col("__b").getField("__brem").as("__bk"),
        col("__b").getField("__wrem").as("__wk"))
    cond.crossJoin(broadcast(boundary))
      .withColumn("__isCapped",
        col("__k").isNull || col("__pos") < col("__k"))
      .withColumn("allocation",
        when(col("__isCapped"), col("__n"))
          .otherwise(expr("(__bk * __w) div __wk")))
      .select(col("__d").as(domainCol), col("__n").as("avail"),
        col("__w").as("weight"), col("__isCapped").as("capped"),
        col("allocation"))
  }
}
