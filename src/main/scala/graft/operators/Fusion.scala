package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rank-biased overlap of two top-k rankings (Webber, Moffat &
    * Zobel, TOIS 2010) — "how much do two retrieval runs / quality
    * signals agree, weighted toward the top?": RBO@k =
    * Σ_{d=1..k} (1−p)·p^{d−1}·|A_{1:d} ∩ B_{1:d}|/d, the truncated
    * prefix of the RBO series (the unseen tail mass p^k is a known
    * constant, reported by the caller if needed). Top-weightedness is
    * the point: Kendall/Spearman over a top-k treat a swap at rank 1
    * and rank 10 the same; RBO discounts geometrically.
    *
    * Exactness: a pair present in both runs with m = max(rank_a,
    * rank_b) contributes W(m) = Σ_{d=m..k} (1−p)p^{d−1}/d — a k-entry
    * rational table the operator materializes EXACTLY over the common
    * denominator den = lcm of the term denominators (BigInt-built,
    * required to fit a long; at p=9/10, k=10: den = 7·10¹¹, max
    * numerator 38 bits). rbo_num = Σ W-numerators is an exact long
    * sum; rbo = one double division rbo_num/den. Hash-exact.
    *
    * Scale shape: the runs are top-k by contract (rank ≤ depth
    * enforced by filter), so the join is k-bounded per group — one
    * (group, item) equi-join plus one group agg over ≤ k rows per
    * group, map-side combined. Items in only one run contribute 0
    * (inner join).
    *
    * Dup hardening (ADVICE r14): an input violating the top-k contract
    * with duplicate (group, item) rows would multiply through the
    * inner join and silently yield rbo > 1, so each side collapses to
    * its BEST (minimum) rank per (group, item) before joining — a
    * deterministic resolution that is the identity on contract-clean
    * input. Duplicate RANKS (two items at the same rank) remain the
    * caller's contract; they cannot be detected without an action.
    */
  def rboTopK(runA: DataFrame, runB: DataFrame, groupCol: String,
      idCol: String, rankCol: String, pNum: Long = 9, pDen: Long = 10,
      depth: Int = 10): DataFrame = {
    require(pNum > 0 && pDen > 0 && pNum < pDen,
      s"p $pNum/$pDen must be in (0, 1)")
    require(depth >= 1 && depth <= 32,
      s"depth $depth out of [1, 32] (the weight table is exact longs)")
    val (den, nums) = rboWeights(pNum, pDen, depth)
    def side(df: DataFrame, as: String) =
      df.select(col(groupCol).as("grp"), col(idCol).as("__item"),
          col(rankCol).cast("long").as(as))
        .filter(col(as).between(1L, depth.toLong))
        // collapse contract-violating duplicate (grp, item) rows to
        // their best rank so the join below cannot multiply (see doc)
        .groupBy(col("grp"), col("__item"))
        .agg(min(col(as)).as(as))
    val w = (1 to depth).foldRight(lit(0L)) { (m, acc) =>
      when(greatest(col("__ra"), col("__rb")) === m,
        lit(nums(m - 1))).otherwise(acc)
    }
    side(runA, "__ra")
      .join(side(runB, "__rb"), Seq("grp", "__item"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_common"), sum(w).as("rbo_num"))
      .withColumn("rbo",
        col("rbo_num").cast("double") / lit(den.toDouble))
  }

  /** Retrieval evaluation — precision@k, recall@k, reciprocal rank,
    * and average precision (MAP's per-query term) for a ranked run
    * against a relevance-truth table: the metrics every retrieval /
    * hard-negative / RAG-corpus pipeline reports (TREC definitions;
    * Manning, Raghavan & Schütze, IR book §8.4).
    *
    * Exactness (the q220/q223 discipline): every metric is ONE IEEE
    * division of two exact integers, so values are bit-identical
    * cross-engine. AP's rational terms P@i = hits_≤i / i are carried
    * over the canonical denominator L = lcm(1..k): each hit at rank i
    * contributes hits_≤i · (L div i) — exact, since i | L — and
    * ap = ap_num / (L · min(R, k)). Reciprocal rank is rr_num = L div
    * first_rel_rank over the same L. k ≤ 42 keeps L = lcm(1..k) a
    * long.
    *
    * Contract: `run` carries 1-based ranks, one item per (group,
    * rank); duplicate (group, item) rows collapse to their best rank
    * (the [[rboTopK]] dup hardening). `truth` lists relevant (group,
    * item) pairs — its per-group count R is the recall denominator,
    * INCLUDING relevant items the run never retrieved. Groups with
    * R = 0 report NULL recall/AP (undefined, not zero — the
    * ksTest/applyFit NULL discipline); groups with no hit report
    * rr = 0 and first_rel_rank NULL.
    *
    * Scale shape: runs are top-k by contract, so everything after the
    * run-truth equi-join is ≤ k rows per group; the truth-count agg is
    * one map-side-combined hash-agg over the truth table. Nothing
    * scans a corpus; a 10⁹-query eval is 10⁹·k rows through one
    * equi-join + two group aggs.
    *
    * NDCG lives in [[ndcgAtK]]: its 1/log2(i+1) discount is
    * irrational, so the exact surface there is a FIXED-POINT discount
    * table ([[ndcgDiscounts]]) computed once in Scala and interpolated
    * into both engines — the PoissonThresholds single-source-of-truth
    * rule applied to ranking discounts. */
  def retrievalMetrics(run: DataFrame, truth: DataFrame,
      groupCol: String, idCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 42,
      s"k $k out of [1, 42] (lcm(1..k) must stay a long)")
    val L = (1 to k).map(BigInt(_))
      .reduce((a, b) => a / a.gcd(b) * b)
    require(L.isValidLong, s"lcm(1..$k) overflows long")
    val lcmL = L.toLong
    val runSide = run
      .select(col(groupCol).as("grp"), col(idCol).as("__item"),
        col(rankCol).cast("long").as("__r"))
      .filter(col("__r").between(1L, k.toLong))
      .groupBy(col("grp"), col("__item"))
      .agg(min(col("__r")).as("__r"))
    val rel = truth.select(col(groupCol).as("grp"),
      col(idCol).as("__item")).distinct()
    val nRel = rel.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rel"))
    val hitW = Window.partitionBy(col("grp")).orderBy(col("__r"))
    val perGrp = runSide.join(rel, Seq("grp", "__item"))
      .withColumn("__hidx", row_number().over(hitW).cast("long"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("hits_at_k"),
        min(col("__r")).as("first_rel_rank"),
        sum(col("__hidx") * expr(s"${lcmL}L DIV __r")).as("ap_num"))
    // domain = run ∪ truth groups (the ndcgAtK convention): a group
    // whose run retrieved nothing inside top-k still reports
    // p@k = recall = rr = ap = 0 instead of vanishing from the mean
    runSide.select(col("grp"))
      .union(rel.select(col("grp"))).distinct()
      .join(nRel, Seq("grp"), "left")
      .join(perGrp, Seq("grp"), "left")
      .select(col("grp"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        col("first_rel_rank"),
        coalesce(when(col("first_rel_rank").isNotNull,
          expr(s"${lcmL}L DIV first_rel_rank")), lit(0L)).as("rr_num"),
        coalesce(col("ap_num"), lit(0L)).as("ap_num"))
      .withColumn("p_at_k",
        col("hits_at_k").cast("double") / lit(k.toDouble))
      .withColumn("r_at_k", when(col("n_rel") > 0,
        col("hits_at_k").cast("double") / col("n_rel").cast("double")))
      .withColumn("rr",
        col("rr_num").cast("double") / lit(lcmL.toDouble))
      .withColumn("ap", when(col("n_rel") > 0,
        col("ap_num").cast("double") /
          (lit(lcmL) * least(col("n_rel"), lit(k.toLong))).cast("double")))
  }

  /** Fixed-point NDCG discount table: disc(i) = round(2^32 /
    * log2(i+1)) for ranks i = 1..k — the SINGLE source of truth for
    * [[ndcgAtK]]'s Spark expression AND its oracle SQL (both engines
    * get these integer literals interpolated; log2 never evaluates
    * cross-engine — the [[graft.operators.Stats.PoissonThresholds]]
    * rule). Each entry quantizes its irrational discount to ≤ 2^-32
    * relative error — eleven orders below any gain's resolution —
    * while making DCG sums exact integer arithmetic. disc(1) = 2^32
    * exactly (log2(2) = 1). */
  def ndcgDiscounts(k: Int): Array[Long] = {
    require(k >= 1 && k <= 64, s"k $k out of [1, 64]")
    (1 to k).map { i =>
      math.round(4294967296.0 / (math.log(i + 1.0) / math.log(2.0)))
    }.toArray
  }

  /** NDCG@k with GRADED relevance over the fixed-point discount table
    * (Järvelin & Kekäläinen, TOIS 2002; linear gain) — the
    * top-weighted retrieval metric [[retrievalMetrics]] omits, made
    * hash-exact: DCG_num = Σ_hits rel·disc(rank) and IDCG_num =
    * Σ_{i≤min(R,k)} rel_(i)·disc(i) (grades sorted descending — ties
    * in grade are sum-invariant, so the item tie-break only totalizes
    * the window order) are exact integers (decimal(38,0) sums —
    * HUGEINT in the oracle — checked into longs at output), and
    * ndcg = dcg_num / idcg_num is ONE IEEE division of two exact
    * longs, bit-identical cross-engine.
    *
    * Contract: `run` carries 1-based ranks; duplicate (group, item)
    * rows collapse to best rank, duplicate truth rows to max grade
    * (the [[rboTopK]] dup hardening). `truth` grades are positive
    * integers (rows with rel ≤ 0 are non-relevant and drop);
    * rel·2^32 must fit the decimal product — any real grading scale
    * does. The output domain is run ∪ truth groups: groups with NO
    * relevant items report NULL idcg_num/ndcg (undefined, not zero —
    * the ksTest NULL discipline); groups whose run retrieved no
    * relevant item — including groups absent from the run entirely —
    * report dcg_num = 0, ndcg = 0.
    * Output: (grp, n_rel, dcg_num, idcg_num, ndcg).
    *
    * Scale shape: the [[retrievalMetrics]] argument — runs are top-k
    * by contract, so the run-truth equi-join and the DCG agg touch
    * ≤ k rows per group; the ideal side ranks only each group's truth
    * rows (window + filter i ≤ k). Nothing scans a corpus. */
  def ndcgAtK(run: DataFrame, truth: DataFrame, groupCol: String,
      idCol: String, rankCol: String, relCol: String,
      k: Int): DataFrame = {
    val discArr = array(ndcgDiscounts(k).map(lit(_)): _*)
    def discAt(pos: Column) =
      element_at(discArr, pos.cast("int")).cast("decimal(38,0)")
    val runSide = run
      .select(col(groupCol).as("grp"), col(idCol).as("__item"),
        col(rankCol).cast("long").as("__r"))
      .filter(col("__r").between(1L, k.toLong))
      .groupBy(col("grp"), col("__item"))
      .agg(min(col("__r")).as("__r"))
    val rel = truth
      .select(col(groupCol).as("grp"), col(idCol).as("__item"),
        col(relCol).cast("long").as("__rel"))
      .filter(col("__rel") > 0)
      .groupBy(col("grp"), col("__item"))
      .agg(max(col("__rel")).as("__rel"))
    val nRel = rel.groupBy(col("grp")).agg(count(lit(1)).as("n_rel"))
    val dcg = runSide.join(rel, Seq("grp", "__item"))
      .groupBy(col("grp"))
      .agg(sum(col("__rel").cast("decimal(38,0)") * discAt(col("__r")))
        .as("__dcg"))
    val idealW = Window.partitionBy(col("grp"))
      .orderBy(col("__rel").desc, col("__item"))
    val idcg = rel
      .withColumn("__i", row_number().over(idealW).cast("long"))
      .filter(col("__i") <= k.toLong)
      .groupBy(col("grp"))
      .agg(sum(col("__rel").cast("decimal(38,0)") * discAt(col("__i")))
        .as("__idcg"))
    // domain = run ∪ truth groups: a group present only in truth
    // (its run retrieved nothing inside top-k) must still report
    // dcg_num = 0 / ndcg = 0 — dropping it would silently exclude
    // exactly the worst queries from any mean-NDCG over the result
    runSide.select(col("grp"))
      .union(rel.select(col("grp"))).distinct()
      .join(nRel, Seq("grp"), "left")
      .join(dcg, Seq("grp"), "left")
      .join(idcg, Seq("grp"), "left")
      .select(col("grp"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("__dcg").cast("long"), lit(0L)).as("dcg_num"),
        col("__idcg").cast("long").as("idcg_num"))
      .withColumn("ndcg", when(col("idcg_num").isNotNull,
        col("dcg_num").cast("double") / col("idcg_num").cast("double")))
  }

  /** The exact weight table behind [[rboTopK]]: W(m)·den for
    * m = 1..depth plus the common denominator den =
    * lcm over d of (pDen^depth · d); BigInt arithmetic, then checked
    * into longs. */
  private[graft] def rboWeights(pNum: Long, pDen: Long,
      depth: Int): (Long, Array[Long]) = {
    def gcd(a: BigInt, b: BigInt): BigInt = if (b == 0) a else gcd(b, a % b)
    // term_d = (pDen-pNum) * pNum^(d-1) / (pDen^d * d), REDUCED — the
    // common denominator must be the canonical (smallest) one so
    // rbo_num is a well-defined exact surface any replay agrees on
    val terms = (1 to depth).map { d =>
      val n = BigInt(pDen - pNum) * BigInt(pNum).pow(d - 1)
      val dd = BigInt(pDen).pow(d) * d
      val g = gcd(n, dd)
      (n / g, dd / g)
    }
    val den = terms.map(_._2).reduce((a, b) => a / gcd(a, b) * b)
    val termNums = terms.map { case (n, d) => n * (den / d) }
    val nums = (1 to depth).map(m =>
      termNums.drop(m - 1).sum).toArray
    require(den.isValidLong && nums.forall(_.isValidLong),
      s"RBO weight table overflows long at p=$pNum/$pDen depth=$depth")
    (den.toLong, nums.map(_.toLong))
  }
}
