package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the bounded-memory frequency summary for heavy-hitter detection
  * over streams and corpora too wide to count exactly. Unlike the
  * HLL surface (q45), this sketch is fully DETERMINISTIC here: the d
  * row hashes are md5-derived (the q78/q98 portable-hash rule), so
  * the counter matrix, every point estimate, and every collision are
  * pure functions of the input that a DuckDB oracle replays exactly —
  * the gate hash-matches estimates INCLUDING their overestimation
  * error, not just "close enough".
  *
  * Scale shape: the counter matrix is one hash-agg over (row, bucket)
  * — at most d·w cells regardless of corpus size (the whole point),
  * with map-side partial counts; estimates for a candidate key set
  * are d probe rows each, joined against the d·w-cell matrix (which
  * broadcasts — d·w is KBs). est = min over rows ≥ true count, with
  * equality exactly when no heavier key shares all d buckets.
  */
object Sketch {

  /** Portable row-r bucket of a key: md5("r:key") first 4 hex chars
    * mod w — independent-enough rows, identical in both engines.
    * Computed by the native [[graft.expressions.Md5Prefix]] kernel
    * (bit-identical to the conv(substring(md5)) composition; r19). */
  def cmBucket(key: Column, row: Int, w: Int): Column =
    (graft.functions.SketchFunctions
      .md5Prefix(concat(lit(s"$row:"), key), 4)
      .cast("int") % w).cast("int")

  /** The d×w counter matrix of `keys` instances: (r, bucket, c). */
  def countMinMatrix(items: DataFrame, keyCol: String, d: Int,
      w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"bad sketch dims d=$d w=$w")
    items.select((0 until d).map(r =>
        cmBucket(col(keyCol), r, w).as(s"__b$r")): _*)
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), col(s"__b$r").as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketch matrices by cell-wise sum — the property that makes
    * count-min THE distributed/streaming frequency summary: every
    * shard (or micro-batch, or day partition) sketches independently
    * and the union's sketch is the exact cell sum, with zero
    * re-reading. merge(matrix(A), matrix(B)) == matrix(A ∪ B)
    * bit-exactly, because cells are plain counts (SketchSpec pins the
    * identity; the q168 gate runs estimates through a merged pair of
    * half-corpus sketches against the full-corpus oracle). */
  def mergeMatrices(mats: Seq[DataFrame]): DataFrame = {
    require(mats.nonEmpty, "need at least one matrix")
    mats.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** Point estimates for every key of `probes` against the matrix:
    * (key, est) with est = min_r counter(r, bucket_r(key)). A bucket
    * never touched estimates 0 via the left-join coalesce. */
  def countMinEstimates(matrix: DataFrame, probes: DataFrame,
      keyCol: String, d: Int, w: Int): DataFrame = {
    val probed = probes.select(col(keyCol).as("key")).distinct()
      .select(col("key"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"),
          cmBucket(col("key"), r, w).as("bucket"))): _*)).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probed.join(broadcast(matrix), Seq("r", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  // ---- Theta / KMV distinct sketch ---------------------------------
  //
  // The k-minimum-values sketch (Bar-Yossef et al., RANDOM'02) under
  // the theta-sketch set-operation framing (Dasgupta, Lang, Rhodes &
  // Thaler, "The Theta-Sketch Framework", 2016): retain the k smallest
  // distinct hash values per group; theta = the k-th smallest (or the
  // hash-space max M while unsaturated), and any set expression is
  // evaluated over the retained samples below theta. INTERSECTION is
  // estimated DIRECTLY — |S_A ∩ S_B below min(theta)| · M / theta —
  // not by inclusion-exclusion over three cardinality estimates, whose
  // subtraction inflates relative error exactly when the intersection
  // is small (the NEXT.md caveat; the direct estimator's error scales
  // with the retained-common count instead, and the quality band in
  // QUALITY.json records it on the small-intersection pairs
  // explicitly).
  //
  // Like count-min above (and unlike q45's HLL), the sketch is fully
  // DETERMINISTIC: hashes are md5-derived, so retained sets, thetas,
  // and estimates are pure functions of the input that a DuckDB oracle
  // replays exactly — the gate hash-matches estimates INCLUDING their
  // sampling error. Estimates are exact integer surfaces: est =
  // (k-1)·M div theta (one integral division, identical cross-engine).
  //
  // Scale shape: building costs one (grp, h) distinct (map-side
  // combined) plus a per-group sort for the k smallest — disk-backed
  // sort-merge, no unbounded buffers. The 100 TB property is MERGE
  // (thetaMerge): shard/day partitions sketch independently to ≤ k
  // rows per group, and union-then-rank over sketches — k·shards rows,
  // not data — reproduces the whole corpus's sketch exactly
  // (SketchSpec pins merge(sketch(A), sketch(B)) == sketch(A ∪ B)),
  // so distinct/overlap dashboards never re-scan history.

  /** Hash-space size: hashes land in [1, 2^48] (12 md5 hex digits + 1,
    * portable to any engine with a 64-bit integer). */
  val ThetaM: Long = 1L << 48

  /** Portable theta hash of a key — uniform on [1, 2^48]. Computed by
    * the native [[graft.expressions.Md5Prefix]] kernel (bit-identical
    * to the conv(substring(md5)) composition; r19). */
  def thetaHash(key: Column): Column =
    graft.functions.SketchFunctions
      .md5Prefix(concat(lit("th:"), key.cast("string")), 12) + 1

  /** Per-group KMV sketch: the k smallest DISTINCT hashes per group,
    * as (grp, h) rows (≤ k per group). Key collisions collapse by
    * construction (distinct is on the hash — at 2^48 the collision
    * rate is negligible and the oracle replays it either way). */
  def thetaSketch(items: DataFrame, grpCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"theta sketch needs k >= 2, got $k")
    val dedup = items.select(col(grpCol).as("grp"),
      thetaHash(col(keyCol)).as("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"))
    dedup.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Merge sketches (same k, same hash) into the sketch of the union:
    * union the retained sets, keep the k smallest per group. Input is
    * sketch-sized (≤ k rows per group per shard), so this never
    * touches data — the streaming/partitioned-build property. */
  def thetaMerge(sketches: Seq[DataFrame], k: Int): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    val u = sketches.reduce(_ unionByName _).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"))
    u.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Per-group distinct estimate: (grp, n_retained, theta_h, est).
    * Unsaturated groups (< k retained) report their EXACT distinct
    * count; saturated ones est = (k-1)·M div theta (the unbiased KMV
    * estimator, floored to an exact integer surface). */
  def thetaEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_retained"), max(col("h")).as("__max_h"))
      .withColumn("theta_h",
        when(col("n_retained") < k, lit(ThetaM)).otherwise(col("__max_h")))
      .withColumn("est", when(col("n_retained") < k, col("n_retained"))
        .otherwise(expr(s"${(k - 1).toLong}L * ${ThetaM}L DIV __max_h")))
      .drop("__max_h")

  /** Theta-intersection estimate for every unordered pair of groups in
    * one sketch: (grp_a, grp_b, n_common, theta_h, est_inter) with
    * theta_h = min of the two groups' thetas, n_common = retained
    * hashes present in BOTH groups at or below theta_h, and est_inter
    * = n_common·M div theta_h (exact n_common when both groups are
    * unsaturated — the sketch IS the set then).
    *
    * Scale shape: the common-hash self-join is an equi-join on h over
    * ≤ k rows per group; the per-group summary table (one row per
    * group) pairs through a broadcast — group summaries are
    * model-sized, the [[countMinEstimates]] broadcast argument. */
  def thetaIntersectPairs(sketch: DataFrame, k: Int): DataFrame = {
    // The CHECKPOINT sits on the sketch (≤ k rows per group): the
    // corpus-sized build runs once and all four consumers below read
    // the materialization. The per-group summary stays a LIVE
    // aggregate over it — recomputing a groupBy of k·groups rows per
    // consumer is free, and the group-pair inequality join below then
    // broadcasts a subtree whose bound (the aggregate: one row per
    // group) is VISIBLE to the PlanShape audit, not erased behind a
    // checkpoint scan.
    val sk = sketch.localCheckpoint(false)
    val est = thetaEstimate(sk, k)
    val pairs = est.select(col("grp").as("grp_a"),
        col("n_retained").as("__na"), col("theta_h").as("__ta"))
      .join(est.select(col("grp").as("grp_b"),
        col("n_retained").as("__nb"), col("theta_h").as("__tb")),
        col("grp_a") < col("grp_b"))
      .withColumn("theta_h", least(col("__ta"), col("__tb")))
    val common = sk.select(col("grp").as("grp_a"), col("h"))
      .join(sk.select(col("grp").as("grp_b"), col("h")), Seq("h"))
      .filter(col("grp_a") < col("grp_b"))
      .join(broadcast(pairs.select(col("grp_a"), col("grp_b"),
        col("theta_h"))), Seq("grp_a", "grp_b"))
      .filter(col("h") <= col("theta_h"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs.join(common, Seq("grp_a", "grp_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("est_inter",
        when(col("__na") < k && col("__nb") < k, col("n_common"))
          .otherwise(expr(s"n_common * ${ThetaM}L DIV theta_h")))
      .select(col("grp_a"), col("grp_b"), col("n_common"),
        col("theta_h"), col("est_inter"))
  }

  // ---- HDR quantile histogram --------------------------------------
  //
  // A base-2 significant-bits histogram for quantile estimation — the
  // HdrHistogram bucketing (Gil Tene, public domain spec) with the
  // relative-error guarantee framing of DDSketch (Masson, Rim & Lee,
  // VLDB 2019): a nonnegative value v with highest set bit e keeps its
  // top b+1 bits (bucket width 2^(e-b) once e > b; exact below 2^b),
  // so every bucket's span is a ≤ 2^-b relative slice of its value.
  // Any rank-r order statistic is then bracketed by the bucket where
  // the cumulative count crosses r: est_lb ≤ true ≤ est_ub with
  // (est_ub − est_lb + 1) / est_lb ≤ 2^-b.
  //
  // Unlike KLL/t-digest, whose compaction schedules depend on arrival
  // order (not reproducible across engines or shuffles), this sketch
  // is a pure per-value function: buckets are integer arithmetic both
  // engines share (bin()/shift), so sketches, cumulative ranks, and
  // bracket estimates gate hash-EXACT against a DuckDB replay — the
  // count-min/theta determinism discipline applied to quantiles.
  //
  // Scale shape: building is ONE hash-agg over (grp, bucket) — at most
  // (64−b)·2^b cells per group (b=5 → ≤ ~1.9k) regardless of corpus
  // size, map-side combined. Merge is cell-wise sum (shards/days/
  // micro-batches sketch independently; history never re-scans — the
  // count-min mergeMatrices property). The quantile step runs on
  // sketch-sized frames only. The exact twin (q231) needs a per-group
  // sort of the DATA — exactly the cost the sketch amortizes away.

  /** Bucket width at value v (v ≥ 0): 1 while v < 2^(b+1), else
    * 2^(e−b) for e = floor(log2 v) — integer-exact via bin()+shift,
    * the two primitives Spark and DuckDB compute identically. */
  def hdrWidth(v: Column, b: Int): Column = {
    val e = (length(bin(v)) - lit(1)).cast("int")
    when(e <= b, lit(1L)).otherwise(
      call_function("shiftleft", lit(1L), (e - lit(b)).cast("int")))
  }

  /** Bucket LOWER BOUND of v: v rounded down to a multiple of its
    * width. bin-length is preserved by the rounding (lb ≥ 2^e), so
    * the width is recomputable from lb alone — buckets need no
    * side-channel schema. */
  def hdrBucketLb(v: Column, b: Int): Column =
    v - v % hdrWidth(v, b)

  /** Per-group HDR sketch: (grp, lb, cnt) — cnt is a row count, or a
    * weight MASS when `weightCol` is given (token-budget quantiles:
    * "the doc-length p99 by token mass"). Domain is NONNEGATIVE
    * values; null groups, null/negative values, and null weights are
    * out of contract and excluded (documented, not silent: the
    * filter is the contract). */
  def hdrSketch(items: DataFrame, grpCol: String, valCol: String,
      b: Int, weightCol: Option[String] = None): DataFrame = {
    require(b >= 1 && b <= 20, s"hdr sketch needs 1 <= b <= 20, got $b")
    val v = col(valCol).cast("long")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    items.filter(col(grpCol).isNotNull && v.isNotNull && v >= 0 &&
        w.isNotNull && w >= 0)
      .select(col(grpCol).as("grp"), hdrBucketLb(v, b).as("lb"),
        w.as("__w"))
      .groupBy(col("grp"), col("lb"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Merge HDR sketches by cell-wise sum — merge(sketch(A),
    * sketch(B)) == sketch(A ∪ B) bit-exactly, because buckets are a
    * pure per-value function and cells are plain counts (SketchSpec
    * pins the identity; the q232 gate proves merged-shards == the
    * oracle's direct sketch end to end). Input is sketch-sized. */
  def hdrMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("grp"), col("lb"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Bracketed quantile estimates per group: for each permille p, the
    * bucket where the cumulative count first reaches rank
    * r = max(1, ceil(p·n/1000)) (the q164 order-statistic rank
    * arithmetic, exact in integers — permilles, not double quantiles,
    * so the rank never depends on float rounding). Output (grp,
    * permille, n, est_lb, est_ub): est_lb ≤ the true r-th order
    * statistic ≤ est_ub, rel. bracket width ≤ 2^-b. Runs entirely on
    * the sketch: one window cumsum + a |permilles|-way explode over
    * ≤ ~2k rows per group. */
  def hdrQuantiles(sketch: DataFrame, permilles: Seq[Int],
      b: Int): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000], got $permilles")
    val byLb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("lb"))
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
    sketch
      .withColumn("cum", sum(col("cnt")).over(byLb))
      .withColumn("n", sum(col("cnt")).over(whole))
      .select(col("grp"), col("lb"), col("cum"), col("n"),
        explode(array(permilles.map(lit(_)): _*)).as("permille"))
      .filter(col("cum") >= greatest(lit(1L),
        expr("(CAST(permille AS BIGINT) * n + 999) DIV 1000")))
      .groupBy(col("grp"), col("permille"))
      .agg(min(col("lb")).as("est_lb"), first(col("n")).as("n"))
      .select(col("grp"), col("permille"), col("n"), col("est_lb"),
        (col("est_lb") + hdrWidth(col("est_lb"), b) - 1).as("est_ub"))
  }

  // ---- Paned sliding-window theta ----------------------------------
  //
  // The pane decomposition for sliding windows (Li, Maier, Tufte,
  // Papadimos & Tucker, "No pane, no gain", SIGMOD Record 2005)
  // applied to the KMV sketch: when slide ≪ size, assigning DATA rows
  // to windows replicates the corpus size/slide times (q236's 4× — the
  // right call there, wrong at 8× or 48×). Panes cut that to one pass:
  // each row belongs to exactly ONE pane (the slide-width tumbling
  // grain), each pane keeps its own k-smallest sketch, and a window's
  // sketch is the MERGE of the size/slide panes it covers — replication
  // happens on SKETCH rows (≤ k per pane), never on data.
  //
  // The merge is EXACT, not an approximation of the direct sliding
  // sketch: any of the k smallest hashes of a union is among its own
  // pane's k smallest (the [[thetaMerge]] identity), so
  // windows-from-panes ≡ sketch-the-window-directly, hash for hash —
  // SketchSpec pins the equivalence against the q236 replicate-data
  // shape. Estimates then carry the usual theta guarantees.

  /** Per-(group, pane) KMV sketch: the k smallest distinct key hashes
    * within each (grp, pane) cell, as (grp, pane, h) rows. `paneCol`
    * is the pane START (a long — epoch micros floored to the slide
    * width upstream: pure integer arithmetic both engines share).
    * One (grp, pane, h) distinct (map-side combined) + a per-pane
    * rank; data is touched ONCE regardless of the window/slide
    * ratio. */
  def thetaPaneSketch(items: DataFrame, grpCol: String, keyCol: String,
      paneCol: String, k: Int): DataFrame = {
    require(k >= 2, s"theta sketch needs k >= 2, got $k")
    val dedup = items.select(col(grpCol).as("grp"),
        col(paneCol).cast("long").as("pane"),
        thetaHash(col(keyCol)).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"), col("pane")).orderBy(col("h"))
    dedup.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Sliding windows from pane sketches: every window of
    * `panesPerWindow` consecutive panes (win_start = pane −
    * j·slideMicros, j = 0..panesPerWindow−1 — the q236 window-
    * assignment arithmetic at pane grain), merged per window to the k
    * smallest DISTINCT hashes (a key seen in two panes of one window
    * has the same hash twice — the distinct collapses it, exactly as
    * the direct window sketch would). Output: (grp, win_start, h).
    *
    * Scale shape: the size/slide-way explode runs over pane-SKETCH
    * rows (≤ k per pane) — at slide ≪ size this is the whole point:
    * a 24h/30min dashboard replicates ≤ 48·k sketch rows per pane,
    * not 48× the event stream. */
  def thetaPaneWindows(paneSketch: DataFrame, slideMicros: Long,
      panesPerWindow: Int, k: Int): DataFrame = {
    require(slideMicros > 0, s"slide must be > 0, got $slideMicros")
    require(panesPerWindow >= 1,
      s"panesPerWindow must be >= 1, got $panesPerWindow")
    val u = paneSketch
      .select(col("grp"), col("pane"), col("h"),
        explode(sequence(lit(0L), lit((panesPerWindow - 1).toLong)))
          .as("j"))
      .select(col("grp"),
        (col("pane") - col("j") * lit(slideMicros)).as("win_start"),
        col("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"), col("win_start")).orderBy(col("h"))
    u.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** The full theta set algebra for every unordered pair of groups:
    * union, intersection, and BOTH differences, from one sketch.
    * Below min(theta) the retained sets are uniform samples of the
    * true sets, so every count is a below-theta count and every
    * estimate the same `cnt·M div theta` scale-up:
    *
    *   n_union  = |A≤θ| + |B≤θ| − |A∩B≤θ|   (inclusion-exclusion on
    *              EXACT retained counts — integer bookkeeping, NOT
    *              the error-inflating estimate subtraction)
    *   n_only_a = |A≤θ| − |A∩B≤θ|, n_only_b symmetric
    *
    * Output: (grp_a, grp_b, theta_h, n_common, est_inter, n_union,
    * est_union, n_only_a, est_only_a, n_only_b, est_only_b); all
    * counts/estimates exact integers (unsaturated pairs report exact
    * set sizes), so gates hash-match. Scale shape: two group-pair
    * broadcasts + one hash equi-join over ≤ k rows per group — the
    * [[thetaIntersectPairs]] shape with two extra k-bounded counts. */
  def thetaSetOpPairs(sketch: DataFrame, k: Int): DataFrame = {
    val sk = sketch.localCheckpoint(false)
    val est = thetaEstimate(sk, k)
    val pairs = est.select(col("grp").as("grp_a"),
        col("n_retained").as("__na"), col("theta_h").as("__ta"))
      .join(est.select(col("grp").as("grp_b"),
        col("n_retained").as("__nb"), col("theta_h").as("__tb")),
        col("grp_a") < col("grp_b"))
      .withColumn("theta_h", least(col("__ta"), col("__tb")))
    val pKeys = broadcast(pairs.select(col("grp_a"), col("grp_b"),
      col("theta_h")))
    def below(side: String, as: String) =
      sk.select(col("grp").as(side), col("h"))
        .join(pKeys, Seq(side))
        .filter(col("h") <= col("theta_h"))
        .groupBy(col("grp_a"), col("grp_b"))
        .agg(count(lit(1)).as(as))
    val common = sk.select(col("grp").as("grp_a"), col("h"))
      .join(sk.select(col("grp").as("grp_b"), col("h")), Seq("h"))
      .filter(col("grp_a") < col("grp_b"))
      .join(pKeys, Seq("grp_a", "grp_b"))
      .filter(col("h") <= col("theta_h"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    // est = cnt·M DIV theta — the SAME multiply-then-floor order as
    // [[thetaIntersectPairs]] (floor(M/θ)·cnt would round differently);
    // cnt ≤ 2k so cnt·2^48 stays far inside a long
    def scaled(cntName: String) =
      when(col("__na") < k && col("__nb") < k, col(cntName))
        .otherwise(expr(s"$cntName * ${ThetaM}L DIV theta_h"))
    pairs
      .join(below("grp_a", "__nab"), Seq("grp_a", "grp_b"), "left")
      .join(below("grp_b", "__nbb"), Seq("grp_a", "grp_b"), "left")
      .join(common, Seq("grp_a", "grp_b"), "left")
      .withColumn("__nab", coalesce(col("__nab"), lit(0L)))
      .withColumn("__nbb", coalesce(col("__nbb"), lit(0L)))
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("n_union",
        col("__nab") + col("__nbb") - col("n_common"))
      .withColumn("n_only_a", col("__nab") - col("n_common"))
      .withColumn("n_only_b", col("__nbb") - col("n_common"))
      .select(col("grp_a"), col("grp_b"), col("theta_h"),
        col("n_common"), scaled("n_common").as("est_inter"),
        col("n_union"), scaled("n_union").as("est_union"),
        col("n_only_a"), scaled("n_only_a").as("est_only_a"),
        col("n_only_b"), scaled("n_only_b").as("est_only_b"))
  }
}
