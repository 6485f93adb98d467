package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate anomaly detection — the "did something spike?" monitor a
  * pipeline owner runs over an ingest or crawl event log: per key
  * (event type, source, host…), each hour's arrival count is compared
  * against the trailing-window hourly average, and hours whose rate
  * exceeds `factorNum/factorDen` times that baseline are flagged. The
  * operational sibling of [[Drift.keynessTopK]] (content drift) and
  * [[Curation.robustOutliers]] (static distribution outliers), on the
  * time axis.
  *
  * Exactness: the decision is pure integer cross-multiplication —
  * n · trailing · factorDen > factorNum · baseline — over exact hour
  * buckets (`date_trunc` then epoch-hour integer division, identical
  * in both engines), so the flag gates hash-exact. The trailing
  * baseline is a RANGE window over the integer hour index, which
  * makes empty hours contribute zero WITHOUT materializing them (a
  * calendar scaffold join would manufacture corpus-independent rows;
  * the range frame reads only rows that exist). Hours earlier than
  * `trailing` hours after a key's first activity are withheld — their
  * baseline window is not fully covered by observed history.
  *
  * Scale shape: one partial+final hash agg to (key, hour) — the only
  * corpus-sized stage — then one window over the per-key hourly
  * series (years of hours per key is ~10⁴ rows: executor-trivial,
  * and keys partition independently). */
object Anomaly {

  /** Hourly burst census per key. Output: (key, bucket_hour
    * (epoch-hours), n, baseline, is_burst) for every observed hour
    * with a fully-covered trailing window; is_burst ⟺
    * n · trailing · factorDen > factorNum · baseline. */
  def burstBuckets(events: DataFrame, keyCol: String, tsCol: String,
      trailing: Int, factorNum: Long, factorDen: Long): DataFrame = {
    require(trailing >= 1, s"trailing must be >= 1, got $trailing")
    require(factorNum > 0 && factorDen > 0,
      s"factor $factorNum/$factorDen must be positive")
    val b = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(date_trunc('hour', `$tsCol`)) div 3600")
          .as("h"))
      .groupBy(col("key"), col("h"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy(col("key")).orderBy(col("h"))
      .rangeBetween(-trailing, -1)
    val perKey = Window.partitionBy(col("key"))
    b.withColumn("baseline",
        coalesce(sum(col("n")).over(trail), lit(0L)))
      .withColumn("__h0", min(col("h")).over(perKey))
      .filter(col("h") >= col("__h0") + trailing)
      .select(col("key"), col("h").as("bucket_hour"), col("n"),
        col("baseline"),
        (col("n") * trailing * factorDen >
          lit(factorNum) * col("baseline")).as("is_burst"))
  }

  /** One-sided upper CUSUM drift census per key (Page, Biometrika
    * 1954 — the classic sequential change-point detector):
    * S_t = max(0, S_{t−1} + (n_t − k)) over EVERY hour t from the
    * key's first activity (empty hours contribute −k, draining the
    * statistic), alarm when S_t > threshold. Where [[burstBuckets]]
    * flags single loud hours against a trailing average, CUSUM
    * integrates a SUSTAINED shift: a rate creeping to 1.5× baseline
    * never trips a 3× spot check but accumulates here — the
    * slow-leak monitor next to the spike monitor. The allowance k is
    * self-scaling per key: k = (factorNum·N) div (factorDen·span) + 1
    * (strictly above factorNum/factorDen × the key's own mean hourly
    * rate, so a stationary Poisson stream drains to 0 and only a
    * sustained shift beyond the factor accumulates).
    *
    * Exactness + the no-scaffold discipline: the recurrence is NOT
    * computed row by row — with P_t = Σ_{j≤t}(n_j − k) (the
    * unclamped drift), the classic identity S_t = P_t − min(0,
    * min_{j<t} P_j) holds, and because P falls LINEARLY through a gap
    * of empty hours, the minimum inside the run after observed hour j
    * is attained just before the next observed hour — so the running
    * minimum over all (including empty) hours is the running minimum
    * of R_j = min(P_j, P_j − gapAfter_j·k) over observed rows only.
    * Empty hours contribute exactly −k each WITHOUT being
    * materialized (the [[burstBuckets]] range-frame argument, carried
    * to a prefix-scan identity), and every quantity is exact long
    * arithmetic — the statistic and the flag gate hash-exact.
    *
    * Scale shape: one partial+final hash agg to (key, hour), then
    * windows over the per-key hourly series (executor-trivial — the
    * burstBuckets argument). Output: (key, bucket_hour, n, allowance,
    * cusum, is_alarm) for every OBSERVED hour (S can only cross the
    * threshold upward at an observed hour; it only decays in gaps). */
  def cusumFlags(events: DataFrame, keyCol: String, tsCol: String,
      factorNum: Long, factorDen: Long, threshold: Long): DataFrame = {
    require(factorNum > 0 && factorDen > 0,
      s"factor $factorNum/$factorDen must be positive")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val wAll = Window.partitionBy(col("key"))
    cusumTail(hourCounts(events, keyCol, tsCol)
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("__span",
        max(col("h")).over(wAll) - min(col("h")).over(wAll) + lit(1L))
      .withColumn("__k",
        expr(s"(${factorNum}L * __tot) div (${factorDen}L * __span)")
          + lit(1L))
      .drop("__tot", "__span"), threshold)
  }

  /** [[cusumFlags]] with an EXPLICIT per-hour allowance — the deployed
    * monitor's form (the allowance was chosen when the alarm was
    * configured, not re-derived from whatever window of data is at
    * hand), and the form the stateful streaming twin
    * ([[graft.streaming.Streams.cusumFlags]]) replays: a stream
    * cannot know its future total, so the self-scaling variant is
    * batch-only by construction. Same prefix-scan identity, same
    * exact-long surface. */
  def cusumFlagsFixed(events: DataFrame, keyCol: String, tsCol: String,
      allowance: Long, threshold: Long): DataFrame = {
    require(allowance > 0, s"allowance must be > 0, got $allowance")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    cusumTail(hourCounts(events, keyCol, tsCol)
      .withColumn("__k", lit(allowance)), threshold)
  }

  private def hourCounts(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(date_trunc('hour', `$tsCol`)) div 3600")
          .as("h"))
      .groupBy(col("key"), col("h"))
      .agg(count(lit(1)).as("n"))

  /** The prefix-scan CUSUM tail over an hourly count frame carrying a
    * per-row `__k` allowance column — the identity and its empty-hour
    * argument live in [[cusumFlags]]'s scaladoc. */
  private def cusumTail(b: DataFrame, threshold: Long): DataFrame = {
    val wOrd = Window.partitionBy(col("key")).orderBy(col("h"))
    val wAll = Window.partitionBy(col("key"))
    b.withColumn("__cn", sum(col("n")).over(wOrd))
      .withColumn("__h0", min(col("h")).over(wAll))
      .withColumn("__hn", lead(col("h"), 1).over(wOrd))
      .withColumn("__pt",
        col("__cn") - (col("h") - col("__h0") + lit(1L)) * col("__k"))
      .withColumn("__rj", when(col("__hn").isNull, col("__pt"))
        .otherwise(col("__cn")
          - (col("__hn") - col("__h0")) * col("__k")))
      .withColumn("__mprev", coalesce(
        min(least(col("__pt"), col("__rj"))).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("key"), col("h").as("bucket_hour"), col("n"),
        col("__k").as("allowance"),
        (col("__pt") - least(lit(0L), col("__mprev"), col("__pt")))
          .as("cusum"))
      .withColumn("is_alarm", col("cusum") > threshold)
  }

  /** SEASONAL burst census — [[burstBuckets]] with a diurnal-aware
    * baseline: each (key, day, hour-of-day) count is compared against
    * the SAME hour-of-day over the trailing `trailingDays` days, not
    * the raw previous hours. The distinction matters on any traffic
    * with a daily cycle: a flat trailing-24h average flags every
    * morning peak and sleeps through a 3 a.m. spike; the seasonal
    * window compares like with like. Mechanically it is ONE extra
    * dimension in the range key — the window partitions by
    * (key, hour-of-day) and ranges over the integer day index — so
    * every exactness and scale argument of [[burstBuckets]] carries
    * over verbatim (empty same-hour days contribute zero without a
    * scaffold; under-covered early history per (key, hour-of-day) is
    * withheld; the decision is exact integer cross-multiplication).
    * Output: (key, bucket_day (epoch days), hour_of_day, n, baseline,
    * is_burst). */
  def seasonalBurstBuckets(events: DataFrame, keyCol: String,
      tsCol: String, trailingDays: Int, factorNum: Long,
      factorDen: Long): DataFrame = {
    require(trailingDays >= 1,
      s"trailingDays must be >= 1, got $trailingDays")
    require(factorNum > 0 && factorDen > 0,
      s"factor $factorNum/$factorDen must be positive")
    val b = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(date_trunc('day', `$tsCol`)) div 86400")
          .as("d"),
        hour(col(tsCol)).cast("long").as("hod"))
      .groupBy(col("key"), col("d"), col("hod"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy(col("key"), col("hod"))
      .orderBy(col("d")).rangeBetween(-trailingDays, -1)
    val perSlot = Window.partitionBy(col("key"), col("hod"))
    b.withColumn("baseline",
        coalesce(sum(col("n")).over(trail), lit(0L)))
      .withColumn("__d0", min(col("d")).over(perSlot))
      .filter(col("d") >= col("__d0") + trailingDays)
      .select(col("key"), col("d").as("bucket_day"),
        col("hod").as("hour_of_day"), col("n"), col("baseline"),
        (col("n") * trailingDays * factorDen >
          lit(factorNum) * col("baseline")).as("is_burst"))
  }

  /** Exponentially-decayed event counts — the "what is hot RIGHT NOW"
    * trending score: each event contributes weight 2^(−age) with age
    * in halflife buckets, so yesterday's burst fades while this
    * hour's ramp ranks first — the recency signal [[burstBuckets]]'s
    * fixed trailing window cannot express.
    *
    * Exactness: the decay base is DYADIC — weights are
    * 2^(maxBuckets − b) as exact longs (a per-bucket halflife is the
    * natural parameterization anyway, and it is the one decay family
    * with an exact integer surface; an e-folding decay never gates
    * cross-engine). Ages are integer bucket arithmetic off epoch
    * micros relative to the corpus max event time ("now" = the data's
    * own horizon, so replays are deterministic); events older than
    * maxBuckets halflives weigh 0 (< 2^-40 of a fresh event — already
    * sub-ulp). decayed_fp = Σ weights in 128-bit; decayed =
    * decayed_fp / 2^maxBuckets, ONE IEEE division — everything gates
    * hash-exact.
    *
    * Envelope, ENFORCED: decayed_fp must fit a long, so a key may
    * carry at most 2^(63−maxBuckets) fresh-bucket events (~8.4M at
    * the default 40 — a per-key-per-halflife rate no trending
    * dashboard approaches; shrink maxBuckets to widen it). A key
    * whose sum exceeds 2^63−1 raises at runtime — matching the
    * oracle's CAST(HUGEINT AS BIGINT) error — rather than Spark's
    * silent NULL under the non-ANSI narrowing cast. maxBuckets is
    * capped at 40 so at least ~8.4M fresh events per key always fit.
    *
    * Scale shape: one scalar max-ts agg broadcast into one
    * map-side-combined hash-agg per key; no windows, no state.
    * Output: (key, n_events, decayed_fp, decayed). */
  def decayedCounts(events: DataFrame, keyCol: String, tsCol: String,
      bucketMicros: Long, maxBuckets: Int = 40): DataFrame = {
    require(bucketMicros > 0, s"bucket must be > 0, got $bucketMicros")
    require(maxBuckets >= 1 && maxBuckets <= 40,
      s"maxBuckets $maxBuckets out of [1, 40]")
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        unix_micros(col(tsCol)).as("__us"))
    val now = base.agg(max(col("__us")).as("__now"))
    base.crossJoin(broadcast(now))
      .withColumn("__b",
        expr(s"(__now - __us) DIV ${bucketMicros}L"))
      .withColumn("__w", when(col("__b") <= maxBuckets,
        call_function("shiftleft", lit(1L),
          (lit(maxBuckets) - col("__b")).cast("int")))
        .otherwise(lit(0L)))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w").cast("decimal(38,0)")).as("__fp"))
      .select(col("key"), col("n_events"),
        when(col("__fp") <= lit(Long.MaxValue),
          col("__fp").cast("long"))
          .otherwise(raise_error(concat(
            lit("decayedCounts: decayed_fp overflows long for key "),
            col("key").cast("string"))))
          .as("decayed_fp"),
        (col("__fp").cast("double") /
          lit(math.pow(2.0, maxBuckets))).as("decayed"))
  }

  /** Bucket-ALIGNED, per-key-horizon decayed counts — the batch form
    * whose streaming twin is exact
    * ([[graft.streaming.Streams.decayedTrend]] pins stream == batch
    * at every prefix against THIS operator): ages are differences of
    * ABSOLUTE bucket indexes (idx = epoch_micros DIV bucket — the
    * q237 window-assignment alignment), so a bounded per-bucket-count
    * state can reproduce every emission, which [[decayedCounts]]'s
    * exact-max-timestamp relative ages cannot (two events in one
    * absolute bucket can differ in relative age). The horizon is
    * PER KEY (the key's own latest bucket): a key's score is a pure
    * function of its own history — replay-deterministic, and the
    * form a per-key streaming state can emit without global
    * coordination. Same dyadic weights, same 128-bit sum, same loud
    * overflow guard, same envelope as [[decayedCounts]].
    *
    * Scale shape: one (key, bucket) hash-agg over the corpus, a
    * per-key max window + the weighted fold on the CELL frame
    * (≤ distinct buckets per key), nothing corpus-wide after the
    * first agg. Output: (key, n_events, decayed_fp, decayed). */
  def decayedCountsAligned(events: DataFrame, keyCol: String,
      tsCol: String, bucketMicros: Long,
      maxBuckets: Int = 40): DataFrame = {
    require(bucketMicros > 0, s"bucket must be > 0, got $bucketMicros")
    require(maxBuckets >= 1 && maxBuckets <= 40,
      s"maxBuckets $maxBuckets out of [1, 40]")
    val cells = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros(`$tsCol`) DIV ${bucketMicros}L").as("idx"))
      .groupBy(col("key"), col("idx"))
      .agg(count(lit(1)).as("n"))
    val perKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
    val age = max(col("idx")).over(perKey) - col("idx")
    cells
      .withColumn("__w", when(age <= maxBuckets,
        call_function("shiftleft", lit(1L),
          (lit(maxBuckets) - age).cast("int"))).otherwise(lit(0L)))
      .groupBy(col("key"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("__w").cast("decimal(38,0)") *
          col("n").cast("decimal(38,0)")).as("__fp"))
      .select(col("key"), col("n_events"),
        when(col("__fp") <= lit(Long.MaxValue),
          col("__fp").cast("long"))
          .otherwise(raise_error(concat(lit(
            "decayedCountsAligned: decayed_fp overflows long for key "),
            col("key").cast("string"))))
          .as("decayed_fp"),
        (col("__fp").cast("double") /
          lit(math.pow(2.0, maxBuckets))).as("decayed"))
  }
}
