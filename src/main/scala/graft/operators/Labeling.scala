package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-aggregation operators for annotation and preference data —
  * the consolidation step between raw human/model judgments and a
  * training set: crowd labels become one gold label per item
  * ([[majorityVote]]), pairwise preferences become per-item strengths
  * ([[bradleyTerry]], the Bradley-Terry model preference-tuning
  * pipelines fit over comparison data). No reference analogue
  * (hematite has no labeling surface); both are deterministic and
  * engine-portable by construction.
  */
object Labeling {

  /** Majority-vote consolidation: one row per item with the vote
    * count, the MODAL label (most votes; ties break to the
    * lexicographically smallest label — deterministic, no annotator
    * order dependence), the modal count, and the agreement ratio
    * (modal/total — the per-item inter-annotator agreement that
    * curation thresholds filter on).
    *
    * Scale shape: two hash aggregations — (item, label) counts, then a
    * per-item min-struct reduction — both with map-side partial
    * combine; no window, no per-item list materialization, so a
    * mega-item (millions of votes on one id) is a hot reduce key with
    * map-side combine, not a memory hazard. */
  def majorityVote(votes: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val cnt = votes.select(col(itemCol).as("item"),
        col(labelCol).as("label"))
      .filter(col("label").isNotNull)
      .groupBy(col("item"), col("label"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("item"))
      .agg(sum(col("c")).as("n_votes"),
        min(struct((-col("c")).as("nc"), col("label"))).as("m"))
      .select(col("item"),
        col("n_votes"),
        col("m.label").as("label"),
        (-col("m.nc")).as("label_votes"),
        ((-col("m.nc")).cast("double") / col("n_votes")).as("agreement"))
  }

  /** Bradley-Terry preference strengths via `iters` fixed
    * minorization-maximization rounds (Hunter, Ann. Statist. 2004) in
    * scaled-LONG integer arithmetic — the [[Graph.pageRank]] recipe
    * applied to the preference model: every sum is an exact long sum,
    * every division a floor `div` identical in Spark and DuckDB, so a
    * SQL oracle replays the fixpoint bit-for-bit and the gate is
    * hash-exact rather than rank-only.
    *
    * Update, with strengths g as longs in units of scale⁻¹ (g0 =
    * scale), W_i = wins of i, n_ij = comparisons between i and j:
    *
    *   c_ij = (scale·scale) div (g_i + g_j)
    *   D_i  = Σ_{j≠i} n_ij · c_ij
    *   g'_i = max(1, (W_i · scale · scale) div max(D_i, 1))
    *
    * The max(1, …) floors a never-winning item at the smallest
    * positive strength so later rounds never divide by zero. Self
    * comparisons (winner == loser) are discarded — they carry no
    * information in the model. Overflow bound (documented, not free):
    * W_i·scale² and Σ n_ij·c_ij ≤ N_i·scale² must fit a long, where
    * N_i is ONE item's comparison count — at the default scale 10⁵
    * that is ~9·10⁸ comparisons per item; lower `scale` to trade
    * strength resolution for headroom on denser corpora.
    *
    * Scale shape per round: the ordered comparison table (two rows per
    * unordered pair, built once and checkpointed) joins the current
    * strength vector on each side and reduces per item — one hash-agg
    * shuffle keyed by item with map-side combine, a Pregel superstep
    * over the comparison graph. Items are typically a bounded catalog
    * (models, sources, policies) while comparisons are the big table;
    * nothing driver-side ever holds the comparisons. */
  def bradleyTerry(prefs: DataFrame, winCol: String, loseCol: String,
      iters: Int = 3, scale: Long = 100000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale > 1 && scale <= 3000000000L,
      s"scale $scale out of range (scale*scale must fit a long comfortably)")
    val p = prefs.select(col(winCol).as("w"), col(loseCol).as("l"))
      .filter(col("w").isNotNull && col("l").isNotNull &&
        col("w") =!= col("l"))
    val items = p.select(col("w").as("item"))
      .union(p.select(col("l").as("item"))).distinct()
      .localCheckpoint(false)
    val wins = p.groupBy(col("w").as("item")).agg(count(lit(1)).as("wi"))
    // ordered comparison counts: one row per (i, j) direction so each
    // round is a single join+agg; built once, lineage cut
    val nij = p.select(least(col("w"), col("l")).as("x"),
        greatest(col("w"), col("l")).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    val dirs = nij.select(col("x").as("i"), col("y").as("j"), col("n"))
      .union(nij.select(col("y").as("i"), col("x").as("j"), col("n")))
      .localCheckpoint(false)
    val s2 = scale * scale
    var g = items.select(col("item"), lit(scale).as("r"))
    var it = 0
    while (it < iters) {
      val den = dirs
        .join(g.select(col("item").as("i"), col("r").as("ri")), Seq("i"))
        .join(g.select(col("item").as("j"), col("r").as("rj")), Seq("j"))
        .select(col("i"),
          (col("n") * expr(s"$s2 div (ri + rj)")).as("t"))
        .groupBy(col("i")).agg(sum(col("t")).as("den"))
      val next = items
        .join(wins, Seq("item"), "left")
        .join(den.select(col("i").as("item"), col("den")), Seq("item"),
          "left")
        .select(col("item"),
          greatest(lit(1L), expr(
            s"(coalesce(wi, 0L) * $s2) div greatest(coalesce(den, 1L), 1L)"))
            .as("r"))
      // lineage cut on the shared Graph.cpCadence (ADVICE r18: the
      // inline hardcoded 8 could drift from Graph.CpEvery if the
      // cadence is retuned): per-round checkpoints are eager jobs that
      // dominated short fixed-iteration walks
      g = Graph.cpCadence(next, it, iters)
      it += 1
    }
    g.select(col("item"), col("r").as("strength"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    * two label columns on the same items: the label-QA number behind
    * "are these two annotators / this model and the gold labels /
    * this heuristic and the metadata actually measuring the same
    * thing", where raw accuracy flatters any skewed label
    * distribution. κ = (p_o − p_e)/(1 − p_e) with p_o the observed
    * agreement rate and p_e = Σ_c (a_c/n)(b_c/n) the chance agreement
    * from the two raters' marginals.
    *
    * Contract: rows where EITHER column is null are excluded (an
    * abstention is not a judgment); if p_e = 1 (both raters constant)
    * κ is undefined and reported null. Exactness: p_o and p_e are
    * single divisions of exact integers (marginal products summed in
    * DECIMAL(38,0) — long overflows at 1e12-row classes squared; the
    * scale-0 decimal→double cast converts once, the q197 rule), and
    * κ is a fixed chain of correctly-rounded ops — all three VALUES
    * gate hash-exact cross-engine.
    *
    * Scale shape: one count agg for (n, agree), two class-keyed
    * marginal aggs (class cardinality is model-sized, but the aggs
    * are partial+final either way), an inner join of the marginals
    * (classes missing from either side contribute 0 to p_e), three
    * 1-row frames broadcast-crossed. Output 1 row:
    * (n_items, n_agree, po, pe, kappa). */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val base = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).as("__a"), col(colB).as("__b"))
      .localCheckpoint(false) // feeds the pair agg + both marginals
    val d = (c: Column) => c.cast("double")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val nAgree = base.agg(count(lit(1)).as("__n"),
      sum(when(col("__a") === col("__b"), lit(1L)).otherwise(lit(0L)))
        .as("__agree"))
    val ma = base.groupBy(col("__a").as("__ca"))
      .agg(count(lit(1)).as("__na"))
    val mb = base.groupBy(col("__b").as("__cb"))
      .agg(count(lit(1)).as("__nb"))
    val prod = ma.join(mb, col("__ca") === col("__cb"))
      .agg(coalesce(sum(d38(col("__na")) * d38(col("__nb"))),
        lit(0).cast("decimal(38,0)")).as("__s"))
    val po = d(col("__agree")) / d(col("__n"))
    val pe = d(col("__s")) / (d(col("__n")) * d(col("__n")))
    val kappa = when(pe === lit(1.0), lit(null).cast("double"))
      .otherwise((po - pe) / (lit(1.0) - pe))
    nAgree.crossJoin(broadcast(prod))
      .select(col("__n").as("n_items"), col("__agree").as("n_agree"),
        po.as("po"), pe.as("pe"), kappa.as("kappa"))
  }

  /** Fleiss' kappa (Fleiss, Psych. Bull. 1971) — chance-corrected
    * agreement for MANY raters per item, where [[cohenKappa]] compares
    * exactly two: with m_ic = raters assigning category c to item i,
    * r raters per item and n items,
    *
    *   P̄  = (Σ_i Σ_c m_ic² − n·r) / (n·r·(r−1))
    *   P_e = Σ_c (Σ_i m_ic)² / (n·r)²
    *   κ   = (P̄ − P_e) / (1 − P_e)
    *
    * The multi-annotator QA number for crowdsourced label audits
    * (3-way heuristic ensembles, rater pools).
    *
    * Exactness: κ is computed as ONE division of two exact integers —
    * with A = Σ m_ic² − n·r, B = n·r(r−1), C = Σ T_c², D = (n·r)²,
    * κ = (A·D − C·B)/(B·D − C·B), every product in decimal(38)
    * (A·D reaches n³r⁴ — 10³⁶ at 10¹² ratings, inside both
    * decimal(38) and HUGEINT) — so κ, P̄, P_e all gate hash-exact.
    * NULL κ when P_e = 1 (the denominator is exactly zero — every
    * rating one category).
    *
    * Fleiss requires the SAME rating count per item; the operator
    * verifies it with one bounded driver action (the distinct
    * per-item counts — a handful of values by contract, like the
    * Mmr.maxPool check) and fails fast on ragged panels rather than
    * returning a silently-undefined statistic.
    *
    * Scale shape: one (item, category) hash agg off the votes (the
    * only corpus-sized stage), then item- and category-keyed aggs of
    * the cell frame, three 1-row frames broadcast-crossed. Output 1
    * row: (n_items, n_raters, pbar, pe, kappa). */
  def fleissKappa(votes: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m = votes
      .filter(col(itemCol).isNotNull && col(raterCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__c"))
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(false) // feeds per-item, per-category, and totals
    val perItem = m.groupBy(col("__i"))
      .agg(sum(col("__m")).as("__r"),
        sum(col("__m") * col("__m")).as("__m2"))
      .localCheckpoint(false) // feeds the ragged-panel check + the totals
    val rs = perItem.select(col("__r")).distinct()
      .limit(3).collect().map(_.getLong(0))
    require(rs.length == 1,
      s"Fleiss' kappa requires the same number of ratings per item; " +
        s"got rating counts ${rs.sorted.mkString(", ")}" +
        (if (rs.length == 3) ", ..." else ""))
    val r = rs.head
    require(r >= 2, s"need >= 2 raters per item, got $r")
    val items = perItem.agg(count(lit(1)).as("__ni"),
      sum(col("__m2")).as("__sm2"))
    val catSq = m.groupBy(col("__c")).agg(sum(col("__m")).as("__tc"))
      .agg(sum(d38(col("__tc")) * d38(col("__tc"))).as("__c2"))
    val a = d38(col("__sm2") - col("__ni") * lit(r))
    val b = d38(col("__ni") * lit(r * (r - 1)))
    val dd = d38(col("__ni") * lit(r)) * d38(col("__ni") * lit(r))
    val c2 = col("__c2")
    val denom = b * dd - c2 * b
    val kappa = when(denom === lit(0).cast("decimal(38,0)"),
        lit(null).cast("double"))
      .otherwise(d(a * dd - c2 * b) / d(denom))
    items.crossJoin(broadcast(catSq))
      .select(col("__ni").as("n_items"), lit(r).as("n_raters"),
        (d(a) / d(b)).as("pbar"), (d(c2) / d(dd)).as("pe"),
        kappa.as("kappa"))
  }

  /** Krippendorff's alpha, nominal metric (Krippendorff, "Content
    * Analysis" / the 2011 computing note) — the agreement statistic
    * for RAGGED panels: [[fleissKappa]] refuses items whose rating
    * counts differ, alpha is DEFINED for them (missing ratings are
    * the norm in real annotation: raters time out, items get
    * re-queued). Items with fewer than 2 ratings cannot witness
    * (dis)agreement and drop; with o_ic = ratings of category c on
    * item i and m_i = Σ_c o_ic:
    *
    *   D_o = (1/n) Σ_i Σ_c o_ic·(m_i − o_ic)/(m_i − 1)
    *   D_e = (n² − Σ_c n_c²) / (n·(n−1)),  n = Σ m_i, n_c = Σ_i o_ic
    *   α   = 1 − D_o/D_e
    *
    * Exactness: the only non-integer ingredient is the per-item
    * 1/(m_i − 1); multiplying through by L = lcm of the DISTINCT
    * (m_i − 1) values (a panel-sized set — rating counts per item
    * range over the panel size; one bounded driver action collects
    * them, the [[fleissKappa]] check's shape, refused past 64
    * distinct values) makes U = Σ_i L/(m_i−1)·Σ_c o_ic(m_i − o_ic)
    * an exact integer, and
    *
    *   α = (L·(n² − Σn_c²) − U·(n−1)) / (L·(n² − Σn_c²))
    *
    * is ONE division of two exact decimal(38) integers (≤ n²·L ~
    * 2.5·10²⁷ at a trillion ratings — inside 128 bits). D_o and D_e
    * are each a single exact-integer division too. NULL α when
    * D_e = 0 (every rating one category).
    *
    * Scale shape: one (item, category) hash agg off the vote log is
    * the only corpus-sized stage; per-item and per-category
    * reductions collapse to 1-row frames that broadcast-cross.
    * Output 1 row: (n_ratings, n_items, do, de, alpha). */
  def krippendorffAlpha(votes: DataFrame, itemCol: String,
      raterCol: String, labelCol: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val o = votes
      .filter(col(itemCol).isNotNull && col(raterCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__c"))
      .agg(count(lit(1)).as("__o"))
      .withColumn("__m", sum(col("__o")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__i"))))
      .filter(col("__m") >= 2) // unpairable items witness nothing
      .localCheckpoint(false) // feeds the lcm probe + per-item + marginals
    val ms = o.select((col("__m") - 1).as("__d")).distinct()
      .limit(65).collect().map(_.getLong(0))
    require(ms.length <= 64,
      "krippendorffAlpha: more than 64 distinct per-item rating " +
        "counts — rating counts are panel-sized by contract")
    if (ms.isEmpty)
      return votes.sparkSession.range(1).select(
        lit(0L).as("n_ratings"), lit(0L).as("n_items"),
        lit(null).cast("double").as("do"),
        lit(null).cast("double").as("de"),
        lit(null).cast("double").as("alpha"))
    def gcd(a: BigInt, b: BigInt): BigInt = if (b == 0) a else gcd(b, a % b)
    val lBig = ms.map(BigInt(_)).reduce((a, b) => a / gcd(a, b) * b)
    require(lBig.isValidLong && lBig.toLong <= 1000000L,
      s"krippendorffAlpha: lcm of per-item (ratings-1) is $lBig — " +
        "panel sizes this ragged are not a statistic, audit the log")
    val lcmL = lBig.toLong
    // U = sum_i L/(m_i-1) * sum_c o_ic*(m_i - o_ic), exact
    val perItem = o.groupBy(col("__i"), col("__m"))
      .agg(sum(col("__o") * (col("__m") - col("__o"))).as("__u0"))
      .agg(count(lit(1)).as("__ni"), sum(col("__m")).as("__n"),
        sum(d38(expr(s"${lcmL}L div (__m - 1)") * col("__u0")))
          .as("__uu"))
    val marg = o.groupBy(col("__c")).agg(sum(col("__o")).as("__nc"))
      .agg(sum(d38(col("__nc")) * d38(col("__nc"))).as("__s2"))
    val n = col("__n")
    val deNum = d38(n) * d38(n) - col("__s2") // n^2 - sum nc^2
    val denom = d38(lit(lcmL)) * deNum
    val num = denom - col("__uu") * d38(n - 1)
    val alpha = when(deNum === lit(0).cast("decimal(38,0)"),
        lit(null).cast("double"))
      .otherwise(d(num) / d(denom))
    perItem.crossJoin(broadcast(marg))
      .select(col("__n").as("n_ratings"), col("__ni").as("n_items"),
        (d(col("__uu")) / d(lit(lcmL) * n)).as("do"),
        (d(deNum) / d(d38(n) * d38(n - 1))).as("de"),
        alpha.as("alpha"))
  }

  /** Krippendorff's alpha, INTERVAL metric — δ(c, c') = (v_c − v_c')²
    * over an INTEGER-VALUED scale (multiply a fixed-point scale
    * through before calling): the agreement statistic when distances
    * between ratings matter, not just identity (a 1-vs-5 disagreement
    * is worse than 1-vs-2). Same ragged-panel semantics as
    * [[krippendorffAlpha]] (items with < 2 ratings drop; missing
    * ratings are first-class).
    *
    * Exactness (the lcm-rational machinery generalized): the ordered-
    * pair disagreement of item i collapses to exact integer moments —
    * Σ_{c,c'} o_ic·o_ic'·(v_c−v_c')² = 2·(m_i·Σ_c o_ic·v_c² −
    * (Σ_c o_ic·v_c)²) — so U = Σ_i L/(m_i−1)·diss_i and E =
    * 2·(n·Σ_c n_c·v_c² − (Σ_c n_c·v_c)²) are exact decimal(38)
    * integers and α = (L·E − U·(n−1)) / (L·E) is ONE division, as are
    * do = U/(L·n) and de = E/(n·(n−1)). Bound: products stay inside
    * 128 bits through ~10¹⁰ ratings on a |v| ≤ 10⁴ scale.
    *
    * Scale shape: one (item, value) hash agg is the only corpus-sized
    * stage — identical to the nominal form. Output 1 row:
    * (n_ratings, n_items, do, de, alpha). */
  def krippendorffAlphaInterval(votes: DataFrame, itemCol: String,
      raterCol: String, valueCol: String): DataFrame =
    alphaFromValues(pairableValues(votes, itemCol, raterCol, valueCol),
      votes.sparkSession)

  /** Krippendorff's alpha, ORDINAL metric — δ(c, c') =
    * (Σ_{g=c..c'} n_g − (n_c + n_c')/2)², distances measured in
    * MARGINAL MASS between ranks rather than in scale units (the
    * metric for ordered categories whose spacing is not meaningful:
    * severity grades, Likert points). `valueCol` supplies the category
    * ORDER (integer-valued); the marginals n_c come from the pairable
    * panel itself.
    *
    * Reduction to the interval machinery: with W_c = cum_c − n_c/2
    * (cumulative marginal mass to the middle of category c), the
    * ordinal δ is exactly (W_c − W_c')² — so this maps each category
    * to the INTEGER W'_c = 2·cum_c − n_c and reuses
    * [[krippendorffAlphaInterval]]'s exact core. The ×4 metric scale
    * from doubling cancels in α (scale-invariant); the reported
    * do/de are in the W' metric — document that when comparing to a
    * textbook replay (LabelingSpec pins both α and the W'-scaled
    * do/de against an independent hand computation). Bound: W' ≤ 2n,
    * so 128-bit exactness holds through ~10⁷ ratings — panels, not
    * corpora, which is what alpha is for. */
  def krippendorffAlphaOrdinal(votes: DataFrame, itemCol: String,
      raterCol: String, valueCol: String): DataFrame = {
    val o = pairableValues(votes, itemCol, raterCol, valueCol)
    // W' per category over the pairable panel, in category order — a
    // label-space-sized frame (the single-partition window is over
    // #categories rows, not ratings)
    val margW = o.groupBy(col("__v")).agg(sum(col("__o")).as("__nc"))
      .withColumn("__cum", sum(col("__nc")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__v"))))
      .select(col("__v"), (lit(2L) * col("__cum") - col("__nc")).as("__w"))
    val oW = o.join(broadcast(margW), Seq("__v"))
      .select(col("__i"), col("__w").as("__v"), col("__o"), col("__m"))
      .localCheckpoint(false)
    alphaFromValues(oW, votes.sparkSession)
  }

  /** Shared input stage of the value-metric alphas: one (item, value)
    * hash agg with per-item totals, unpairable items dropped, barrier
    * for the multi-consumer reads (lcm probe + per-item + marginals). */
  private def pairableValues(votes: DataFrame, itemCol: String,
      raterCol: String, valueCol: String): DataFrame =
    votes
      .filter(col(itemCol).isNotNull && col(raterCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(itemCol).as("__i"),
        col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__o"))
      .withColumn("__m", sum(col("__o")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__i"))))
      .filter(col("__m") >= 2)
      .localCheckpoint(false)

  /** The exact interval-metric core over (__i, __v, __o, __m) rows:
    * the [[krippendorffAlpha]] lcm-rational chain with the nominal
    * per-item kernel swapped for the moment-collapsed quadratic one. */
  private def alphaFromValues(oV: DataFrame,
      session: org.apache.spark.sql.SparkSession): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val ms = oV.select((col("__m") - 1).as("__d")).distinct()
      .limit(65).collect().map(_.getLong(0))
    require(ms.length <= 64,
      "krippendorffAlpha(Interval|Ordinal): more than 64 distinct " +
        "per-item rating counts — rating counts are panel-sized by " +
        "contract")
    if (ms.isEmpty)
      return session.range(1).select(
        lit(0L).as("n_ratings"), lit(0L).as("n_items"),
        lit(null).cast("double").as("do"),
        lit(null).cast("double").as("de"),
        lit(null).cast("double").as("alpha"))
    def gcd(a: BigInt, b: BigInt): BigInt = if (b == 0) a else gcd(b, a % b)
    val lBig = ms.map(BigInt(_)).reduce((a, b) => a / gcd(a, b) * b)
    require(lBig.isValidLong && lBig.toLong <= 1000000L,
      s"krippendorffAlpha(Interval|Ordinal): lcm of per-item " +
        s"(ratings-1) is $lBig — panel sizes this ragged are not a " +
        "statistic, audit the log")
    val lcmL = lBig.toLong
    // diss_i = 2*(m_i * Σ o v² − (Σ o v)²); U = Σ_i L/(m_i−1)·diss_i
    val perItem = oV.groupBy(col("__i"), col("__m"))
      .agg(sum(d38(col("__o")) * d38(col("__v")) * d38(col("__v")))
          .as("__q2"),
        sum(d38(col("__o")) * d38(col("__v"))).as("__q1"))
      .withColumn("__diss", lit(2).cast("decimal(38,0)") *
        (d38(col("__m")) * col("__q2") - col("__q1") * col("__q1")))
      .agg(count(lit(1)).as("__ni"), sum(col("__m")).as("__n"),
        sum(d38(expr(s"${lcmL}L div (__m - 1)")) * col("__diss"))
          .as("__uu"))
    // E = 2*(n * Σ n_c v² − (Σ n_c v)²) over the marginals
    val marg = oV.groupBy(col("__v")).agg(sum(col("__o")).as("__nc"))
      .agg(sum(d38(col("__nc")) * d38(col("__v")) * d38(col("__v")))
          .as("__e2"),
        sum(d38(col("__nc")) * d38(col("__v"))).as("__e1"))
    val n = col("__n")
    val eNum = lit(2).cast("decimal(38,0)") *
      (d38(n) * col("__e2") - col("__e1") * col("__e1"))
    val denom = d38(lit(lcmL)) * eNum
    val num = denom - col("__uu") * d38(n - 1)
    val alpha = when(eNum === lit(0).cast("decimal(38,0)"),
        lit(null).cast("double"))
      .otherwise(d(num) / d(denom))
    perItem.crossJoin(broadcast(marg))
      .select(col("__n").as("n_ratings"), col("__ni").as("n_items"),
        (d(col("__uu")) / d(lit(lcmL) * n)).as("do"),
        (d(eNum) / d(d38(n) * d38(n - 1))).as("de"),
        alpha.as("alpha"))
  }
}
