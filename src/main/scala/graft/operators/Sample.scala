// (leakage-safe split lives at the bottom of this file)
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

  /** The portable per-row uniform variate: md5 of a per-OPERATOR salt
    * prepended to the id's decimal string. The salt is what makes the
    * operators composable: with a shared unsalted hash, mixing a
    * stratum at rate 0.8 and then split-assigning 80/10/10 leaves that
    * stratum's val/test splits EMPTY — exactly the rows below the 0.8
    * threshold survive the mix, and those are precisely the 'train'
    * rows (r05 ADVICE). Distinct salts give each decision an
    * independent variate while staying engine-portable (md5 of the
    * salted string is the same everywhere). */
  private def saltedMd5(salt: String, id: Column): Column =
    md5(concat(lit(salt), id.cast("string")))

  /** Portable per-row sort key for stratified ranking; id itself breaks
    * hash ties so the order is total. */
  private def hashOrder(id: Column): Seq[Column] =
    Seq(saltedMd5("strat:", id), id)

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

  /** Deterministic train/val/test assignment: buckets a row by the
    * first 8 md5 hex chars of its id — fixed-width lowercase hex
    * compares lexicographically as the 32-bit value it encodes, so the
    * thresholds are plain STRING comparisons, reproducible bit-for-bit
    * in any engine and under any partitioning (the property ablation
    * reruns need). `splits` are (name, weight) with weights summing to
    * ~1; the last split absorbs rounding. Adds a `split` column.
    * Per-row expression — no shuffle, no state. */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val h = substring(saltedMd5("split:", col(idCol)), 1, 8)
    val thresholds = splits.init.scanLeft(0.0)(_ + _._2).tail
      .map(c => f"${(c * 4294967296.0).toLong}%08x")
    val assigned = splits.init.zip(thresholds)
      .foldRight(lit(splits.last._1)) { case (((name, _), th), other) =>
        when(h < lit(th), lit(name)).otherwise(other)
      }
    df.withColumn("split", assigned)
  }

  /** LEAKAGE-SAFE split: [[splitAssign]] at the duplicate-GROUP grain.
    * A per-document split leaks whenever near-identical documents land
    * on both sides (the classic eval-contamination bug a later
    * decontamination pass then has to mop up); here every member of a
    * duplicate group inherits the split of the group's KEEPER (min id
    * per `key` — a fingerprint, a fold key, or a connected-component
    * id from the near-dup family), so a group is atomically train OR
    * val OR test. Same md5 "split:" salt as [[splitAssign]]: splitting
    * an already-deduplicated corpus by keeper id gives bit-identical
    * assignments.
    *
    * Scale shape: one key-grouped partial agg for the keepers (group
    * count rows, not corpus rows, ride the exchange), the per-row hash
    * assignment on that group frame, and one key-keyed equi-join back
    * — AQE-splittable under group skew, no window over key content. */
  def groupedSplitAssign(df: DataFrame, idCol: String, key: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    val keepers = df.groupBy(key.as("__k"))
      .agg(min(col(idCol)).as("__keeper"))
    val assigned = splitAssign(keepers, "__keeper", splits)
      .select(col("__k"), col("split"))
    df.withColumn("__k", key).join(assigned, Seq("__k")).drop("__k")
  }

  /** Deterministic data mixing: per-stratum keep rates (the training-
    * mix weights step — "keep 100% of wiki, 10% of crawl"), applied as
    * stratum-conditional hash thresholds. Mixes are reproducible
    * anywhere, nest across rate changes (raising a rate only ADDS
    * rows — the variate is fixed per id, only the threshold moves),
    * and strata missing from `rates` fall back to `defaultRate`. The
    * "mix:" salt makes the decision independent of [[splitAssign]] /
    * [[deterministicFraction]] on the same ids. Per-row expression
    * over the scan — no shuffle, no state. */
  def weightedMix(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate $r out of [0,1]"))
    val bucket = graft.functions.SketchFunctions.md5Prefix(
      concat(lit("mix:"), col(idCol).cast("string")), 8)
    def threshold(r: Double) = lit((r * (1L << 32)).toLong)
    val limit = rates.foldLeft(threshold(defaultRate)) {
      case (other, (stratum, r)) =>
        when(col(stratumCol) === stratum, threshold(r)).otherwise(other)
    }
    // explicit null guard: a null id already hashes to null and drops,
    // but Concat is not null-intolerant in Catalyst, so without this
    // the scan loses its inferred IsNotNull pushdown (r06 plan diff)
    df.filter(col(idCol).isNotNull && bucket < limit)
  }

  /** Temperature-based mixture reweighting — the multilingual
    * pretraining recipe (Raffel et al. JMLR 2020 §3.4.3 / mC4: sample
    * stratum s with probability ∝ p_s^α, α < 1 upweighting the tail so
    * low-resource languages are not drowned by the head): realized as
    * per-stratum Bernoulli keep-rates r_s = maxRate·(n_min/n_s)^(1−α)
    * — the surviving composition is ∝ n_s^α with the smallest stratum
    * kept at maxRate. Rates are derived IN-PLAN from the corpus's own
    * counts (one tiny stratum agg + broadcast join back; the corpus
    * itself never shuffles), then applied through the same salted-md5
    * thresholds as [[weightedMix]] — reproducible anywhere, and
    * raising maxRate only ADDS rows.
    *
    * α is restricted to {1/4, 1/2, 3/4}: dyadic exponents evaluate as
    * sqrt chains, and IEEE 754 sqrt/divide/multiply are CORRECTLY
    * ROUNDED everywhere, so the data-dependent thresholds are
    * bit-identical across engines and the operator gates oracle-exact.
    * pow(x, 0.3) is not correctly rounded and differs across libm
    * implementations — an α outside the dyadic set would make every
    * threshold engine-dependent, the same reason q77 emits ranks over
    * log scores (NEXT.md numerics rules).
    *
    * NULL strata are a stratum: the count agg keeps the null group and
    * the join back is null-safe (`<=>`), so rows with a missing
    * language tag are temperature-thinned by the null group's own
    * count instead of silently dropped (ADVICE r11: the earlier inner
    * equality join never matched null and shrank the corpus —
    * inconsistent with [[weightedMix]], which keeps unknown strata at
    * defaultRate). */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
      alpha: Double = 0.5, maxRate: Double = 1.0): DataFrame = {
    require(maxRate > 0 && maxRate <= 1,
      s"maxRate $maxRate out of (0,1]")
    // (n_min/n_s)^(1-α) as a chain of correctly-rounded sqrt steps
    def dyadicPow(x: Column): Column = alpha match {
      case 0.5 => sqrt(x)
      case 0.75 => sqrt(sqrt(x))
      case 0.25 => sqrt(x) * sqrt(sqrt(x))
      case a => throw new IllegalArgumentException(
        s"alpha must be 0.25, 0.5, or 0.75 (dyadic exponents stay " +
          s"correctly rounded cross-engine; pow does not), got $a")
    }
    val counts = df.groupBy(col(stratumCol).as("__s"))
      .agg(count(lit(1)).as("__ns"))
    val nmin = counts.agg(min(col("__ns")).as("__nmin"))
    val th = counts.crossJoin(broadcast(nmin))
      .select(col("__s"),
        floor(lit(maxRate) *
            dyadicPow(col("__nmin").cast("double") / col("__ns")) *
            lit(4294967296.0))
          .cast("long").as("__lim"))
    val bucket = graft.functions.SketchFunctions.md5Prefix(
      concat(lit("temp:"), col(idCol).cast("string")), 8)
    // null guard restores the scan's IsNotNull pushdown (see
    // weightedMix); the stratum join is NULL-SAFE so a null stratum
    // matches its own count row instead of dropping (scaladoc contract)
    df.filter(col(idCol).isNotNull)
      .join(broadcast(th), col(stratumCol) <=> col("__s"))
      .filter(bucket < col("__lim"))
      .drop("__s", "__lim")
  }

  /** Deterministic Bernoulli-style sample: keeps a row iff its hash
    * falls below the rate threshold. Uses the first 8 hex chars of the
    * md5 as a uniform 32-bit value — reproducible across engines and
    * partitionings, unlike df.sample. */
  def deterministicFraction(df: DataFrame, idCol: String,
      rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate out of [0,1]")
    val bucket = graft.functions.SketchFunctions.md5Prefix(
      concat(lit("frac:"), col(idCol).cast("string")), 8)
    // null guard restores the scan's IsNotNull pushdown (see weightedMix)
    df.filter(col(idCol).isNotNull &&
      bucket < lit((rate * (1L << 32)).toLong))
  }

  /** Per-key diversity cap — the Gopher-style "at most N documents per
    * domain" rule (any over-represented host/source/license key):
    * keeps the first `cap` rows of each key under the caller's order
    * columns (make them a total order — append the id — or ties are
    * engine-dependent). One row_number window, one shuffle keyed by
    * `key`; per-key skew is bounded because the window emits at most
    * `cap` survivors per key and WindowGroupLimit prunes rank > cap
    * before the sort spills. */
  def capPerKey(df: DataFrame, key: Column, order: Seq[Column],
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(key).orderBy(order: _*)))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * IPL 97(5) 2006): select `n` rows where row i's inclusion
    * probability scales with its weight, by taking the top-n under the
    * key u_i^(1/w_i) with u_i a per-row uniform. The quality-weighted
    * corpus-selection step ("sample 1M docs, preferring high quality
    * scores") that per-stratum rates ([[weightedMix]]) cannot express:
    * here the SAMPLE SIZE is exact and the preference is per-row.
    *
    * Determinism/portability: u_i = (2·bucket + 1) / 2^33 with bucket
    * the first 8 md5 hex chars of the salted id — a dyadic rational,
    * so both engines build the bit-identical double. The key is
    * compared as ln(u)/w (same argmax as u^(1/w); w > 0 required):
    * ln() can differ in the last ulp across libm implementations, so
    * the gate surface is the RANK (id-tiebroken), never the raw key —
    * the q77 rule — and key gaps on md5 uniforms are ~1/n relative,
    * twelve orders above ulp noise (gap-asserted in SampleSpec).
    *
    * Scale shape: one stateless projection computes the key, then a
    * TakeOrderedAndProject top-n (per-partition heaps — no full sort,
    * no exchange of the corpus); rank assignment runs over the n
    * survivors only. Output: (idCol, rk 1..n) in selection order. */
  def weightedTopN(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val bucket = graft.functions.SketchFunctions.md5Prefix(
      concat(lit("wsamp:"), col(idCol).cast("string")), 8)
    val u = (bucket * 2 + 1).cast("double") / lit(8589934592.0)
    val key = log(u) / col(weightCol).cast("double")
    df.filter(col(idCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), key.as("__k"))
      .orderBy(col("__k").desc, col(idCol)).limit(n)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("__k").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("rk"))
  }

  /** EXACT composition matching — resample a corpus onto a target
    * stratum profile: given integer target shares p_b (e.g. en:3,
    * fr:2, de:1), keep m_b = k·p_b rows of stratum b with
    * k = min_b floor(n_b / p_b), the LARGEST corpus whose composition
    * is exactly p_b-proportional (the binding stratum is kept at its
    * full multiple). This is the "match the reference corpus profile"
    * curation step — [[temperatureMix]] flattens a power law,
    * [[weightedMix]] applies fixed rates; this hits an arbitrary
    * target composition with exact counts. Strata not listed in
    * `shares` are dropped (a profile is a whitelist); a listed stratum
    * absent from the corpus makes k = 0 — the profile is infeasible
    * and the result is deliberately EMPTY, never silently
    * disproportionate.
    *
    * All arithmetic is integer (counts, floors, products), so the
    * operator gates hash-exact. Rows within a stratum are chosen in
    * salted-md5 hash order (rank m_b ≤ k·p_b), reproducible anywhere.
    *
    * Scale shape: one stratum-count agg (|shares| rows) collected
    * driver-side — model-sized, the PQ-codebook pattern — so the
    * per-stratum limits inline as LITERALS: when max_b m_b sits under
    * `spark.sql.window.group.limit.threshold` (default 1000) the rank
    * window prunes through WindowGroupLimit (per-partition top-m heaps
    * before the one stratum-keyed exchange); above it Spark's rule
    * deliberately declines and the window sorts each stratum — the
    * cost exact-count rank selection fundamentally carries (raise the
    * session threshold to keep the prune for bigger profiles). Output:
    * (stratumCol, idCol, rank). */
  def matchComposition(df: DataFrame, stratumCol: String, idCol: String,
      shares: Seq[(String, Long)]): DataFrame = {
    require(shares.nonEmpty, "need at least one target share")
    require(shares.map(_._1).distinct.size == shares.size,
      "duplicate stratum in shares")
    shares.foreach { case (s, p) =>
      require(p >= 1, s"share for $s must be >= 1, got $p") }
    val listed = df.filter(col(stratumCol).isin(shares.map(_._1): _*))
    val counts = listed.groupBy(col(stratumCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = shares.map { case (s, p) => counts.getOrElse(s, 0L) / p }.min
    val limits = shares.map { case (s, p) => s -> k * p }.toMap
    val maxLim = limits.values.max
    val lim = (shares.map { case (s, _) =>
      when(col(stratumCol) === s, lit(limits(s))): Column } :+ lit(0L))
      .reduceRight((w, o) => w.otherwise(o))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(saltedMd5("prof:", col(idCol)), col(idCol))
    listed
      .withColumn("rank", row_number().over(w).cast("long"))
      // literal bound first: WindowGroupLimit prunes rank > maxLim
      // map-side; the per-stratum exact cut follows
      .filter(col("rank") <= maxLim && col("rank") <= lim)
      .select(col(stratumCol), col(idCol), col("rank"))
  }

  /** WEIGHTED sampling without replacement, fixed size k per group —
    * priority sampling (Duffield, Lund & Thorup, JACM 2007): each row
    * draws priority q = w/u for a uniform u, the k highest-priority
    * rows are the sample, and τ = the (k+1)-th priority makes
    * ŵ = max(w, τ) an (near-)unbiased estimator of any subset sum —
    * THE way to keep a 10k-doc sample that still answers "how many
    * bytes does source X hold" without rescanning 100 TB. DLT prove
    * its variance is within a factor 1 + O(1/k) of the optimal
    * scheme.
    *
    * Determinism (the [[stratified]] rule, extended to weights): u is
    * the md5("pri:" + id) 32-bit variate, and the priority is the
    * FIXED-POINT quotient q_fp = w·2^32 div u — exact integer
    * arithmetic both engines share (decimal/HUGEINT product, integral
    * divide), so sample membership, τ, and every ŵ gate hash-exact.
    * The floor quantizes each priority by ≤ 2^-32 relative — far
    * below the sampling noise it perturbs. Ties (same q_fp) break by
    * id. Contract: weights are positive longs below 2^31 (the
    * quotient must fit a long — any byte/token/char weight does),
    * ENFORCED: a row with w ≥ 2^31 raises at runtime rather than
    * silently overflowing its priority to NULL (which would sort the
    * heaviest rows LAST — exactly the rows a weighted sample must
    * keep); w ≤ 0 or null rows drop (zero-weight items carry no
    * mass).
    *
    * Unsaturated groups (≤ k rows) return ALL rows with τ = 0 and
    * ŵ = w — the estimator is exact there, the theta-sketch
    * unsaturated convention. Output: (grp, id, w, q_fp, tau, w_est),
    * k rows per saturated group.
    *
    * Scale shape: one projection computes priorities, one per-group
    * top-(k+1) (WindowGroupLimit prunes map-side — no global sort),
    * and the τ join runs on the one-row-per-group rk = k+1 frame,
    * which broadcasts. The checkpoint bounds the window subtree to
    * ONE run for its two consumers (sample + τ). */
  def prioritySample(df: DataFrame, grpCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val w = col(weightCol).cast("long")
    val base = df
      .filter(col(grpCol).isNotNull && col(idCol).isNotNull &&
        w.isNotNull && w > 0)
      .select(col(grpCol).as("grp"), col(idCol).as("id"), w.as("w"))
      .withColumn("__u", graft.functions.SketchFunctions.md5Prefix(
        concat(lit("pri:"), col("id").cast("string")), 8) + 1)
      .withColumn("q_fp", when(col("w") < lit(2147483648L),
        expr("CAST(w AS DECIMAL(38,0)) * 4294967296 DIV __u"))
        .otherwise(raise_error(concat(lit("prioritySample: weight "),
          col("w").cast("string"),
          lit(" >= 2^31 overflows the fixed-point priority")))))
    val win = Window.partitionBy(col("grp"))
      .orderBy(col("q_fp").desc, col("id"))
    val ranked = base
      .withColumn("__rk", row_number().over(win))
      .filter(col("__rk") <= k + 1)
      .localCheckpoint(false)
    val tau = ranked.filter(col("__rk") === k + 1)
      .select(col("grp"), col("q_fp").as("tau"))
    ranked.filter(col("__rk") <= k)
      .join(tau, Seq("grp"), "left")
      .withColumn("tau", coalesce(col("tau"), lit(0L)))
      .select(col("grp"), col("id"), col("w"), col("q_fp"), col("tau"),
        greatest(col("w"), col("tau")).as("w_est"))
  }
}
