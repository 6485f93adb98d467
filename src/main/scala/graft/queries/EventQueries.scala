package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's event-store read surface re-expressed as Spark queries
  * over the fixture `events` table (stream key = user_id, arrival order =
  * ts, event_id):
  *
  *  - q20 revision assignment = the engine-side analogue of hematite's
  *    dense per-stream rownum (reference src/db.rs:103-113, 233-237;
  *    openapi.yaml:54-59 "index number ... starting at zero").
  *  - q21 positional range scan = `Database::query(start, limit)`
  *    (reference src/db.rs:133-177): the u64 offset-index seek becomes a
  *    revision-range predicate the optimizer prunes on.
  *  - q22 stream metadata = `AppState::get_stream` (reference
  *    src/server.rs:233-248): revision/count (db.rs:103-113), last_modified/
  *    max (db.rs:78-88), usage-bytes/sum (db.rs:91-100).
  *  - q23 stream listing + sort = `GET /streams?sort=` (reference
  *    src/api.rs:320-335).
  *
  * Scale: every query here groups or windows on the stream key, so the
  * single shuffle partitions by stream — exactly how a 1000-executor
  * cluster would parallelize per-stream work. Window functions over
  * (user_id) need no global sort, only a per-stream sort within partitions.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Arrival order within a stream: event time, tie-broken by event_id —
    * deterministic, which `row_number` requires for a stable result. */
  private val arrival = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  private def withRevision(df: DataFrame): DataFrame =
    df.withColumn("revision", (row_number().over(arrival) - 1).cast("long"))

  /** q19: JSON extraction from the open `props` payload (hematite stores
    * arbitrary JSON in `data` — schema-on-read via get_json_object). */
  val q19_json_extract: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).cast("long").as("sum_k"),
        max(col("k")).as("max_k"),
        count(col("k")).as("n_with_k"),
        count(lit(1)).as("n_events"))

  val q19_oracle: String =
    """SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       count(*) AS n_events
       FROM events GROUP BY event_type"""

  /** q20: dense 0-based per-stream revision assignment (the core hematite
    * invariant). One shuffle on the stream key; sort is per-partition. */
  val q20_revision_assign: Q = (s, d) =>
    withRevision(Tables.events(s, d))
      .select(col("user_id"), col("event_id"), col("revision"))

  val q20_oracle: String =
    """SELECT user_id, event_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS revision
       FROM events"""

  /** q21: positional range scan — `query(start=20, limit=30)` on stream 13
    * (reference db.rs:133-177). The revision predicate plays the role of
    * the byte-offset index; partition pruning on the stream key plays the
    * role of the per-stream file. */
  val q21_positional_scan: Q = (s, d) =>
    withRevision(Tables.events(s, d).filter(col("user_id") === 13))
      .filter(col("revision") >= 20 && col("revision") < 50)
      .select(col("user_id"), col("revision"), col("event_id"),
        col("ts"), col("event_type"), col("value"))

  val q21_oracle: String =
    """SELECT user_id, revision, event_id, ts, event_type, value FROM (
         SELECT user_id, event_id, ts, event_type, value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS revision
         FROM events WHERE user_id = 13)
       WHERE revision >= 20 AND revision < 50"""

  /** q22: stream metadata aggregate (reference server.rs:233-248):
    * revision = count, last_modified = max(ts), usage = serialized bytes
    * (sum of payload lengths — the NDJSON-bytes analogue). */
  val q22_stream_metadata: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("revision"),
        max(col("ts")).as("last_modified"),
        sum((length(col("props")) + length(col("event_type")) + lit(24))
          .cast("long")).cast("long").as("usage"))

  val q22_oracle: String =
    """SELECT user_id, count(*) AS revision, max(ts) AS last_modified,
       CAST(sum(length(props) + length(event_type) + 24) AS BIGINT) AS usage
       FROM events GROUP BY user_id"""

  /** q23: stream listing sorted by usage desc then id (reference
    * api.rs:320-335 `?sort=-usage`) — agg + order, driver-side top page. */
  val q23_stream_listing: Q = (s, d) =>
    q22_stream_metadata(s, d)
      .orderBy(col("usage").desc, col("user_id"))
      .limit(50)

  val q23_oracle: String =
    """SELECT user_id, count(*) AS revision, max(ts) AS last_modified,
       CAST(sum(length(props) + length(event_type) + 24) AS BIGINT) AS usage
       FROM events GROUP BY user_id
       ORDER BY usage DESC, user_id LIMIT 50"""

  /** q24: sessionization — gaps-and-islands with a 30-minute inactivity
    * gap, per stream. The batch analogue of session_window; expressed with
    * lag + running sum so it is oracle-checkable (the streaming variant
    * lives in graft.streaming). */
  val q24_sessionize: Q = (s, d) => {
    val newSess = when(
      lag(col("ts"), 1).over(arrival).isNull ||
        col("ts") > lag(col("ts"), 1).over(arrival) +
          expr("INTERVAL 30 MINUTES"), 1).otherwise(0)
    Tables.events(s, d)
      .withColumn("new_sess", newSess)
      .withColumn("sess_id",
        sum(col("new_sess")).over(
          arrival.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(
        max(col("sess_id")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  val q24_oracle: String =
    """WITH marked AS (
         SELECT user_id, ts,
           CASE WHEN lag(ts, 1) OVER w IS NULL
                  OR ts > lag(ts, 1) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         FROM marked)
       SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
         count(*) AS n_events
       FROM sess GROUP BY user_id"""

  /** q25: tumbling-window aggregate over event time (hourly) — the batch
    * shape of the streaming windowed agg. date_trunc keeps the result
    * oracle-comparable (window() emits a struct). */
  val q25_tumbling_hourly: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(14, 2))).cast("double")
          .as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  val q25_oracle: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1, 2"""

  /** q44: as-of join — every purchase event paired with the user's most
    * recent strictly-earlier click. Expressed as a running conditional
    * max over the arrival window instead of a range join: one shuffle on
    * the stream key, no O(n·m) range-join blowup at scale. */
  val q44_asof_join: Q = (s, d) => {
    val w = arrival.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("last_click_ts"))
  }

  val q44_oracle: String =
    """SELECT user_id, event_id, ts, last_click_ts FROM (
         SELECT user_id, event_id, ts, event_type,
           max(CASE WHEN event_type = 'click' THEN ts END) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS last_click_ts
         FROM events)
       WHERE event_type = 'purchase'"""

  /** q45: sketch aggregates — HyperLogLog++ approximate distinct counts
    * next to exact ones. Rows-only check (HLL estimates are
    * engine-specific); the ScalaTest suite asserts the estimate lands
    * within 5% of exact. At scale the approx path is the only one that
    * doesn't shuffle per-distinct-value state. */
  val q45_approx_distinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** q64: the exact columns of q45 under a DuckDB oracle — splitting
    * them out of the rows-only approx query means the distinct-count
    * path is hash-verified while q45 keeps exercising the HLL sketch. */
  val q64_exact_distinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))

  val q64_oracle: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events
       FROM events GROUP BY event_type"""

  /** q52: sliding-window aggregate in batch form — 2h windows sliding
    * 1h via Spark's window() (each event lands in exactly two windows);
    * the oracle replicates the slot assignment with an explicit unnest. */
  val q52_sliding_2h: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"))

  val q52_oracle: String =
    """SELECT ws, event_type, count(*) AS n_events FROM (
         SELECT unnest([date_trunc('hour', ts),
                        date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
           event_type
         FROM events)
       GROUP BY ws, event_type"""

  /** q56: VariantType JSON access (Spark 4) — parse the open `props`
    * payload once into a variant and extract typed fields, the
    * schema-on-read upgrade over per-path get_json_object (SURVEY.md
    * §1.4's `data` treatment). Oracle via DuckDB's JSON functions. */
  val q56_variant_json: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("v", expr("parse_json(props)"))
      .groupBy(col("event_type"))
      .agg(
        sum(expr("variant_get(v, '$.k', 'bigint')")).cast("long")
          .as("sum_k"),
        min(expr("variant_get(v, '$.k', 'bigint')")).as("min_k"),
        count(lit(1)).as("n_events"))

  val q56_oracle: String =
    """SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       count(*) AS n_events
       FROM events GROUP BY event_type"""

  /** q65: range join — high-value purchase windows [ts, ts+2d) counting
    * the same user's clicks inside each window. Runs through the
    * bucketed equi-join operator (operators.RangeJoin): a naive
    * inequality join plans as a nested loop; binning makes it one
    * ordinary hash join + residual filter, the shape that survives
    * 100 TB. Empty windows are kept (left join of counts back onto the
    * window set) so the result is decided by the data, not the match
    * rate. */
  val q65_range_join: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val windows = ev
      .filter(col("event_type") === "purchase" && col("value") > 200)
      .select(col("user_id"), col("ts").as("ws"),
        (col("ts") + expr("INTERVAL 2 DAYS")).as("we"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val pairs = graft.operators.RangeJoin.pointInInterval(
      windows, clicks, "ws", "we", "cts",
      keys = Seq("user_id"), binWidthSec = 2 * 24 * 3600L)
    val counts = pairs.groupBy(col("user_id"), col("ws"))
      .agg(count(lit(1)).as("n_clicks"))
    windows.join(counts, Seq("user_id", "ws"), "left")
      .select(col("user_id"), col("ws"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }

  val q65_oracle: String =
    """WITH w AS (
         SELECT user_id, ts AS ws, ts + INTERVAL 2 DAY AS we
         FROM events WHERE event_type = 'purchase' AND value > 200)
       SELECT w.user_id, w.ws, CAST(count(e.ts) AS BIGINT) AS n_clicks
       FROM w LEFT JOIN events e
         ON e.user_id = w.user_id AND e.event_type = 'click'
        AND e.ts >= w.ws AND e.ts < w.we
       GROUP BY w.user_id, w.ws"""

  /** q79: CDC log compaction (operators.Merge.latestSnapshot) — the
    * events table read as a change log: last writer per user wins
    * ((ts, event_id) total order), users whose final event is an
    * 'error' are treated as tombstoned and vanish from the snapshot.
    * One shuffle; WindowGroupLimit turns the rank filter into a
    * per-partition top-1 before the exchange. */
  val q79_latest_snapshot: Q = (s, d) =>
    graft.operators.Merge.latestSnapshot(Tables.events(s, d),
      keys = Seq("user_id"), orderCols = Seq("ts", "event_id"),
      deleteWhen = Some(col("event_type") === "error"))

  val q79_oracle: String =
    """SELECT user_id, event_id, ts, event_type, value, props FROM (
         SELECT *, row_number() OVER (PARTITION BY user_id
           ORDER BY ts DESC, event_id DESC) AS rn
         FROM events)
       WHERE rn = 1 AND NOT coalesce(event_type = 'error', FALSE)"""

  /** q153: funnel analysis ([[graft.operators.Funnel.funnel]]) —
    * per-user ordered-sequence matching view → click → purchase, the
    * product-analytics staple the event surface was missing: earliest-
    * completion greedy anchors (provably optimal — an earlier anchor
    * only admits more later completions), strict ts ordering between
    * steps, users keep their prefix when they stall. Three type-
    * filtered scans aggregated to per-user rows before user-keyed
    * joins — never a window over the full log. The oracle replays the
    * same left-join CTE chain. */
  val q153_funnel: Q = (s, d) =>
    graft.operators.Funnel.funnel(Tables.events(s, d), "user_id",
      "event_type", "ts", Seq("view", "click", "purchase"))

  val q153_oracle: String =
    """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1 FROM events
         WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT s1.u, s1.t1, min(e.ts) AS t2
         FROM s1 LEFT JOIN events e ON e.user_id = s1.u
           AND e.event_type = 'click' AND e.ts > s1.t1
         GROUP BY s1.u, s1.t1),
       s3 AS (SELECT s2.u, s2.t1, s2.t2, min(e.ts) AS t3
         FROM s2 LEFT JOIN events e ON e.user_id = s2.u
           AND e.event_type = 'purchase' AND e.ts > s2.t2
         GROUP BY s2.u, s2.t1, s2.t2)
       SELECT u AS user_id, t1, t2, t3,
         CAST((CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)
           + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
           + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS depth
       FROM s3"""

  /** q160: majority-vote label consolidation
    * ([[graft.operators.Labeling.majorityVote]]) — the events stream
    * read as an annotation log (item = user_id, one vote per event):
    * modal label with the deterministic smallest-label tie-break, vote
    * counts, agreement ratio. Two hash-aggs, no window, no per-item
    * list. The tie-break is load-bearing in the fixture: users with
    * an equal top-2 label count must pick the lexicographically
    * smaller label identically in both engines. */
  val q160_majority_label: Q = (s, d) =>
    graft.operators.Labeling.majorityVote(Tables.events(s, d),
        "user_id", "event_type")
      .select(col("item").as("user_id"), col("n_votes"), col("label"),
        col("label_votes"), col("agreement"))

  val q160_oracle: String =
    """WITH c AS (SELECT user_id, event_type AS label, count(*) AS c
         FROM events GROUP BY 1, 2)
       SELECT user_id, CAST(n_votes AS BIGINT) AS n_votes, label,
         CAST(c AS BIGINT) AS label_votes,
         CAST(c AS DOUBLE) / n_votes AS agreement
       FROM (SELECT user_id, label, c,
           sum(c) OVER (PARTITION BY user_id) AS n_votes,
           row_number() OVER (PARTITION BY user_id
             ORDER BY c DESC, label) AS rn
         FROM c)
       WHERE rn = 1"""

  /** q161: Bradley-Terry preference strengths
    * ([[graft.operators.Labeling.bradleyTerry]]) — pairwise
    * preferences derived from the event log (within each user's
    * (ts, event_id) order, consecutive events of different types
    * duel; the higher `value` wins, exact-equal values and same-type
    * pairs abstain), then 3 MM rounds in scaled-long integer
    * arithmetic. The oracle replays the preference derivation AND
    * unrolls all three rounds — floor divisions, the max(1,·)
    * zero-win floor, and the left-join null handling are all
    * hash-load-bearing. Scale shape: one window over the log to form
    * duels, then per-round one item-keyed hash-agg over the bounded
    * ordered-pair table. */
  val q161_bradley_terry: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val duels = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("t"),
        col("value").as("v"), col("ts"), col("event_id"))
      .withColumn("pt", lag(col("t"), 1).over(w))
      .withColumn("pv", lag(col("v"), 1).over(w))
      .filter(col("pt").isNotNull && col("t") =!= col("pt") &&
        col("v") =!= col("pv"))
      .select(
        when(col("v") > col("pv"), col("t")).otherwise(col("pt")).as("win"),
        when(col("v") > col("pv"), col("pt")).otherwise(col("t")).as("lose"))
    graft.operators.Labeling.bradleyTerry(duels, "win", "lose",
      iters = 3, scale = 100000L)
  }

  private def btIterSql(k: Int): String =
    s"""d$k AS (SELECT i, CAST(sum(n * (10000000000 // (ri.r + rj.r)))
           AS BIGINT) AS den
         FROM dirs JOIN r${k - 1} ri ON ri.item = dirs.i
           JOIN r${k - 1} rj ON rj.item = dirs.j
         GROUP BY i),
       r$k AS (SELECT items.item,
           greatest(1, (COALESCE(wi, 0) * 10000000000)
             // greatest(COALESCE(den, 1), 1)) AS r
         FROM items LEFT JOIN wins USING (item)
           LEFT JOIN d$k ON d$k.i = items.item)"""

  val q161_oracle: String =
    s"""WITH o AS (SELECT user_id, event_type AS t, value AS v,
         lag(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS pt,
         lag(value) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS pv
       FROM events),
       p AS (SELECT CASE WHEN v > pv THEN t ELSE pt END AS w,
           CASE WHEN v > pv THEN pt ELSE t END AS l
         FROM o WHERE pt IS NOT NULL AND t <> pt AND v <> pv),
       items AS (SELECT w AS item FROM p UNION SELECT l FROM p),
       wins AS (SELECT w AS item, count(*) AS wi FROM p GROUP BY 1),
       nij AS (SELECT least(w, l) AS x, greatest(w, l) AS y,
           count(*) AS n FROM p GROUP BY 1, 2),
       dirs AS (SELECT x AS i, y AS j, n FROM nij
         UNION ALL SELECT y, x, n FROM nij),
       r0 AS (SELECT item, CAST(100000 AS BIGINT) AS r FROM items),
       ${btIterSql(1)},
       ${btIterSql(2)},
       ${btIterSql(3)}
       SELECT item, CAST(r AS BIGINT) AS strength FROM r3"""

  /** q169: Markov transition matrix
    * ([[graft.operators.Markov.transitions]]) — consecutive-event
    * state transitions per user under the (ts, event_id) total order:
    * counts, per-from totals, conditional probabilities. The user-flow
    * graph next to q24's sessions and q153's funnels; one per-stream
    * window, then |states|²-bounded aggregates. */
  val q169_markov_transitions: Q = (s, d) =>
    graft.operators.Markov.transitions(Tables.events(s, d),
      "user_id", "event_type", Seq("ts", "event_id"))

  val q169_oracle: String =
    """WITH o AS (SELECT event_type AS to_state,
         lag(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS from_state
       FROM events),
       t AS (SELECT from_state, to_state, count(*) AS n
         FROM o WHERE from_state IS NOT NULL GROUP BY 1, 2),
       f AS (SELECT from_state, sum(n) AS n_from FROM t GROUP BY 1)
       SELECT t.from_state, t.to_state, CAST(t.n AS BIGINT) AS n,
         CAST(f.n_from AS BIGINT) AS n_from,
         CAST(t.n AS DOUBLE) / f.n_from AS p
       FROM t JOIN f USING (from_state)"""

  /** q203: retention cohort matrix
    * ([[graft.operators.Funnel.retentionCohorts]]) — users grouped by
    * their first-event DAY, counted on each later active day offset:
    * the product-analytics staple next to q153's funnel. The log
    * collapses to distinct (user, day) before anything else touches
    * it; exact integers and dates — hash-exact. */
  val q203_retention_cohorts: Q = (s, d) =>
    graft.operators.Funnel.retentionCohorts(Tables.events(s, d),
      "user_id", "ts")

  val q203_oracle: String =
    """WITH days AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
         FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       c0 AS (SELECT u, min(d) AS c0 FROM days GROUP BY u)
       SELECT c0.c0 AS cohort_date,
         CAST(days.d - c0.c0 AS BIGINT) AS day_offset,
         CAST(count(*) AS BIGINT) AS n_users
       FROM days JOIN c0 USING (u) GROUP BY 1, 2"""

  /** q206: hourly burst detection ([[graft.operators.Anomaly
    * .burstBuckets]] scaladoc — per-type hourly counts vs a
    * trailing-24h RANGE-window baseline, empty hours contributing
    * zero without a calendar scaffold). factor 3/1 cuts through the
    * fixture's Poisson noise at both SFs (measured: 549/833 flagged
    * at sf0.001, 21/3272 at sf0.01) and the decision is exact integer
    * cross-multiplication, so the flag gates hash-exact. */
  val q206_burst_hours: Q = (s, d) =>
    graft.operators.Anomaly.burstBuckets(Tables.events(s, d),
      "event_type", "ts", trailing = 24, factorNum = 3, factorDen = 1)

  val q206_oracle: String =
    """WITH b AS (SELECT event_type AS key,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(count(*) AS BIGINT) AS n
       FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       GROUP BY 1, 2),
     w AS (SELECT key, h, n,
         CAST(coalesce(sum(n) OVER (PARTITION BY key ORDER BY h
           RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS baseline,
         min(h) OVER (PARTITION BY key) AS h0
       FROM b)
     SELECT key, h AS bucket_hour, n, baseline,
       n * 24 * 1 > 3 * baseline AS is_burst
     FROM w WHERE h >= h0 + 24"""

  /** q217: CUSUM sustained-drift census ([[graft.operators.Anomaly
    * .cusumFlags]] scaladoc — Page's sequential detector computed via
    * the prefix-scan identity S_t = P_t − min(0, min_{j<t} P_j), with
    * empty hours contributing −k each WITHOUT a calendar scaffold).
    * The fixture's traffic is stationary Poisson (nothing sustains —
    * q206's spot bursts are single loud hours), so the gate PLANTS a
    * sustained shift, the q146/q213 discipline: every event in
    * Jan 15–17 is replicated ×3 more (a 4× rate for 48 hours). With
    * the self-scaling allowance at 2× each key's mean rate and
    * threshold 10, alarms concentrate in and just after the planted
    * window (measured 55–80 alarm hours of ~680 per key at sf0.01)
    * and the statistic drains back to 0 after — both alarm states
    * load-bearing. All-integer surface: hash-exact. */
  val q217_cusum_drift: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"), col("ts"))
    val planted = e.filter(
        col("ts") >= to_timestamp(lit("2024-01-15 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-17 00:00:00")))
      .withColumn("__r", explode(array(lit(1), lit(2), lit(3))))
      .drop("__r")
    graft.operators.Anomaly.cusumFlags(e.unionByName(planted),
      "event_type", "ts", factorNum = 2, factorDen = 1, threshold = 10)
  }

  val q217_oracle: String =
    """WITH ev AS (
         SELECT event_type, ts FROM events
         UNION ALL
         SELECT event_type, ts FROM events, (VALUES (1),(2),(3)) rep(i)
         WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
           AND ts < TIMESTAMP '2024-01-17 00:00:00'),
       b AS (SELECT event_type AS key,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
           CAST(count(*) AS BIGINT) AS n
         FROM ev WHERE event_type IS NOT NULL AND ts IS NOT NULL
         GROUP BY 1, 2),
       w AS (SELECT key, h, n,
           CAST(sum(n) OVER (PARTITION BY key ORDER BY h) AS BIGINT)
             AS cn,
           min(h) OVER (PARTITION BY key) AS h0,
           CAST(sum(n) OVER (PARTITION BY key) AS BIGINT) AS tot,
           max(h) OVER (PARTITION BY key)
             - min(h) OVER (PARTITION BY key) + 1 AS span,
           lead(h) OVER (PARTITION BY key ORDER BY h) AS hn
         FROM b),
       p AS (SELECT key, h, n, (2 * tot) // (1 * span) + 1 AS k,
           cn, h0, hn FROM w),
       q AS (SELECT key, h, n, k,
           cn - (h - h0 + 1) * k AS pt,
           CASE WHEN hn IS NULL THEN cn - (h - h0 + 1) * k
                ELSE cn - (hn - h0) * k END AS rj
         FROM p),
       m AS (SELECT key, h, n, k,
           pt - least(0, coalesce(
             min(least(pt, rj)) OVER (PARTITION BY key ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
             pt) AS s
         FROM q)
       SELECT key, h AS bucket_hour, n, k AS allowance, s AS cusum,
         s > 10 AS is_alarm FROM m"""

  /** q208: multi-touch attribution ([[graft.operators.Attribution
    * .touchCredits]] scaladoc — view/click touches credited to the
    * purchase that closes their path; deliberately ALL-INTEGER
    * surface per (channel, path_len): participations, first-touch
    * closures, last-touch closures — linear credit reads off as
    * Σ n_touches/path_len without ever gating a float sum). */
  val q208_attribution: Q = (s, d) =>
    graft.operators.Attribution.touchCredits(Tables.events(s, d),
      "user_id", "event_type", Seq("ts", "event_id"),
      touchTypes = Seq("view", "click"), convType = "purchase")

  val q208_oracle: String =
    """WITH e AS (SELECT user_id u, event_type t, ts, event_id,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           END) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pk
       FROM events
       WHERE user_id IS NOT NULL AND ts IS NOT NULL
         AND event_id IS NOT NULL
         AND event_type IN ('view', 'click', 'purchase')),
     closed AS (SELECT u, pk FROM e WHERE t = 'purchase'),
     t2 AS (SELECT e.u, e.pk, e.t AS channel, e.ts, e.event_id
       FROM e JOIN closed USING (u, pk) WHERE e.t <> 'purchase'),
     t3 AS (SELECT u, pk, channel,
         CAST(count(*) OVER (PARTITION BY u, pk) AS BIGINT)
           AS path_len,
         row_number() OVER (PARTITION BY u, pk
           ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY u, pk
           ORDER BY ts DESC, event_id DESC) AS rl
       FROM t2),
     tc AS (SELECT channel, path_len,
         CAST(count(*) AS BIGINT) AS n_touches
       FROM t3 GROUP BY 1, 2),
     fc AS (SELECT channel, path_len,
         CAST(count(*) AS BIGINT) AS n_first
       FROM t3 WHERE rf = 1 GROUP BY 1, 2),
     lc AS (SELECT channel, path_len,
         CAST(count(*) AS BIGINT) AS n_last
       FROM t3 WHERE rl = 1 GROUP BY 1, 2)
     SELECT tc.channel, tc.path_len, tc.n_touches,
       CAST(coalesce(fc.n_first, 0) AS BIGINT) AS n_first,
       CAST(coalesce(lc.n_last, 0) AS BIGINT) AS n_last
     FROM tc LEFT JOIN fc USING (channel, path_len)
     LEFT JOIN lc USING (channel, path_len)"""

  /** q215: SEASONAL burst detection ([[graft.operators.Anomaly
    * .seasonalBurstBuckets]] scaladoc — the diurnal-aware baseline:
    * each (type, day, hour-of-day) count vs the SAME hour-of-day over
    * the trailing 7 days, one extra dimension in q206's range key).
    * factor 3 flags 408/567 slots at sf0.001 and 35/2589 at sf0.01 —
    * the decision varies at both SFs and stays exact integer
    * cross-multiplication. */
  val q215_seasonal_burst: Q = (s, d) =>
    graft.operators.Anomaly.seasonalBurstBuckets(Tables.events(s, d),
      "event_type", "ts", trailingDays = 7, factorNum = 3,
      factorDen = 1)

  val q215_oracle: String =
    """WITH b AS (SELECT event_type AS key,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d,
         CAST(hour(ts) AS BIGINT) AS hod, CAST(count(*) AS BIGINT) AS n
       FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       GROUP BY 1, 2, 3),
     w AS (SELECT key, d, hod, n,
         CAST(coalesce(sum(n) OVER (PARTITION BY key, hod ORDER BY d
           RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS baseline,
         min(d) OVER (PARTITION BY key, hod) AS d0
       FROM b)
     SELECT key, d AS bucket_day, hod AS hour_of_day, n, baseline,
       n * 7 * 1 > 3 * baseline AS is_burst
     FROM w WHERE d >= d0 + 7"""

  /** q236: SLIDING-WINDOW theta distinct users — per event type, the
    * distinct-user estimate for every 24h window sliding by 6h
    * ([[graft.operators.Sketch.thetaSketch]] keyed by
    * (type, window-start)), WITH the exact count beside it in the
    * same surface (both SQL-expressible, so one gate hash-checks the
    * estimator against its own truth — the event-time version of the
    * q224-vs-q225 split). Window assignment is pure integer
    * arithmetic on epoch micros (j = 0..3 slide replicas, keep
    * win_start ≤ t < win_start + 24h), so both engines agree exactly.
    * k = 64 against ~150 users/type: busy windows SATURATE (the
    * estimator path), partial head/tail windows stay exact — both
    * regimes in one gate. Scale shape: the 4× sliding replication
    * dedupes to (type, window, user) FIRST — map-side combined,
    * bounded by windows×users — and that deduped frame checkpoints
    * for the sketch + exact twin (the q235 lesson); this is the
    * dashboard shape that replaces exact distinct at 100 TB. */
  val q236_theta_windows: Q = (s, d) => {
    val S = 6L * 3600 * 1000000L
    val W = 24L * 3600 * 1000000L
    val k = 64
    // (A pane-grain pre-dedupe before the 4× replication was measured
    // r19 and REVERTED: the fixture repeats a (type, user) within a
    // pane only ~5% of the time, so the extra distinct cost more than
    // the explode it saved — q243 is the paned shape for streams where
    // within-pane repetition is real.)
    val u = Tables.events(s, d)
      .filter(col("event_type").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        explode(sequence(lit(0L), lit(3L))).as("j"))
      .withColumn("win_start",
        expr(s"(us DIV ${S}L) * ${S}L - j * ${S}L"))
      .filter(col("us") < col("win_start") + lit(W))
      .select(col("event_type"), col("win_start"), col("user_id"))
      .distinct()
      .localCheckpoint(false)
    val sk = graft.operators.Sketch.thetaSketch(
      u.select(concat_ws("/", col("event_type"), col("win_start"))
        .as("g"), col("user_id")), "g", "user_id", k)
    val exact = u.groupBy(col("event_type"), col("win_start"))
      .agg(count(lit(1)).as("exact_users"))
    graft.operators.Sketch.thetaEstimate(sk, k)
      .select(substring_index(col("grp"), "/", 1).as("event_type"),
        substring_index(col("grp"), "/", -1).cast("long")
          .as("win_start"),
        col("n_retained"), col("theta_h"), col("est"))
      .join(exact, Seq("event_type", "win_start"))
  }

  val q236_oracle: String =
    """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS us
         FROM events
         WHERE event_type IS NOT NULL AND ts IS NOT NULL
           AND user_id IS NOT NULL),
       a AS (SELECT DISTINCT event_type,
           (us // 21600000000) * 21600000000 - j * 21600000000
             AS win_start, user_id
         FROM e CROSS JOIN range(4) AS r(j)
         WHERE us < (us // 21600000000) * 21600000000
           - j * 21600000000 + 86400000000),
       hh AS (SELECT DISTINCT event_type, win_start,
           CAST(('0x' || substr(md5('th:' || CAST(user_id AS VARCHAR)),
             1, 12)) AS BIGINT) + 1 AS h
         FROM a),
       sk AS (SELECT event_type, win_start, h FROM (
           SELECT event_type, win_start, h, row_number() OVER (
             PARTITION BY event_type, win_start ORDER BY h) AS rk
           FROM hh) WHERE rk <= 64),
       est AS (SELECT event_type, win_start,
           CAST(count(*) AS BIGINT) AS n_retained,
           CASE WHEN count(*) < 64 THEN 281474976710656
                ELSE max(h) END AS theta_h,
           CAST(CASE WHEN count(*) < 64 THEN count(*)
             ELSE (63 * 281474976710656) // max(h) END AS BIGINT) AS est
         FROM sk GROUP BY 1, 2),
       ex AS (SELECT event_type, win_start,
           CAST(count(*) AS BIGINT) AS exact_users
         FROM a GROUP BY 1, 2)
       SELECT est.event_type, est.win_start, est.n_retained,
         est.theta_h, est.est, ex.exact_users
       FROM est JOIN ex USING (event_type, win_start)"""

  /** q237: TUMBLING-WINDOW HDR value percentiles — per event type and
    * hour, the p50/p99 bracket of the event value in fixed-point
    * millis (floor(value·1000), exact on both engines)
    * ([[graft.operators.Sketch.hdrSketch]] keyed by (type, hour)) —
    * the latency/metric dashboard query: per-hour p99 at 100 TB
    * without a per-window sort, state bounded by ~1.9k cells per
    * (type, hour), and hour cells MERGE into day/week rollups by
    * cell-wise sum (hdrMerge) without re-reading events. Same 2^-5
    * bracket guarantee and bin()+shift determinism as q230. */
  val q237_hdr_windows: Q = (s, d) => {
    val H = 3600L * 1000000L
    val items = Tables.events(s, d)
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("value"))
      .select(concat_ws("/", col("event_type"),
          expr(s"(us DIV ${H}L) * ${H}L")).as("g"),
        floor(col("value") * 1000).cast("long").as("v"))
    val sk = graft.operators.Sketch.hdrSketch(items, "g", "v", b = 5)
    graft.operators.Sketch.hdrQuantiles(sk, Seq(500, 990), b = 5)
      .select(substring_index(col("grp"), "/", 1).as("event_type"),
        substring_index(col("grp"), "/", -1).cast("long")
          .as("win_start"),
        col("permille"), col("n"), col("est_lb"), col("est_ub"))
  }

  val q237_oracle: String =
    """WITH e AS (SELECT event_type,
         (epoch_us(ts) // 3600000000) * 3600000000 AS win_start,
         CAST(floor(value * 1000) AS BIGINT) AS v
       FROM events
       WHERE event_type IS NOT NULL AND ts IS NOT NULL
         AND value IS NOT NULL AND floor(value * 1000) >= 0),
       bkt AS (SELECT event_type, win_start,
           v - v % (CASE WHEN length(bin(v)) - 1 <= 5 THEN 1
             ELSE 1::BIGINT << (length(bin(v)) - 6) END) AS lb,
           CAST(count(*) AS BIGINT) AS cnt
         FROM e GROUP BY 1, 2, 3),
       c AS (SELECT event_type, win_start, lb,
           CAST(sum(cnt) OVER (PARTITION BY event_type, win_start
             ORDER BY lb) AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY event_type, win_start)
             AS BIGINT) AS n
         FROM bkt),
       p AS (SELECT c.*, q.permille FROM c
         CROSS JOIN (VALUES (500), (990)) AS q(permille)),
       hit AS (SELECT event_type, win_start, permille, n,
           min(lb) AS est_lb
         FROM p
         WHERE cum >= greatest(1,
           (CAST(permille AS BIGINT) * n + 999) // 1000)
         GROUP BY 1, 2, 3, 4)
       SELECT event_type, win_start, CAST(permille AS INT) AS permille,
         n, est_lb,
         est_lb + (CASE WHEN length(bin(est_lb)) - 1 <= 5 THEN 1
           ELSE 1::BIGINT << (length(bin(est_lb)) - 6) END) - 1
           AS est_ub
       FROM hit"""

  /** q243: PANED sliding-window theta distinct users — the q236
    * dashboard at slide ≪ size, computed the "No pane, no gain" way
    * ([[graft.operators.Sketch.thetaPaneSketch]] +
    * [[graft.operators.Sketch.thetaPaneWindows]], Li et al. SIGMOD
    * Record 2005): 24h windows sliding by 3h (8 panes per window —
    * q236's replicate-the-data shape would scan events 8×; here data
    * is touched ONCE to build per-pane sketches, and the 8× explode
    * runs over ≤ k sketch rows per pane). The pane merge is EXACT —
    * windows-from-panes ≡ the direct window sketch hash-for-hash
    * (SketchSpec pins it) — so the gate surface is the same estimator
    * q236 checks, at half the slide and an eighth of the data
    * replication. k = 64 vs ~150 users/type: busy windows saturate,
    * partial head/tail windows stay exact. */
  val q243_theta_panes: Q = (s, d) => {
    val S = 3L * 3600 * 1000000L
    val k = 64
    val ev = Tables.events(s, d)
      .filter(col("event_type").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("pane", expr(s"(us DIV ${S}L) * ${S}L"))
    val panes = graft.operators.Sketch.thetaPaneSketch(
      ev, "event_type", "user_id", "pane", k)
    val win = graft.operators.Sketch.thetaPaneWindows(panes, S, 8, k)
    graft.operators.Sketch.thetaEstimate(
        win.select(concat_ws("/", col("grp"), col("win_start"))
          .as("grp"), col("h")), k)
      .select(substring_index(col("grp"), "/", 1).as("event_type"),
        substring_index(col("grp"), "/", -1).cast("long")
          .as("win_start"),
        col("n_retained"), col("theta_h"), col("est"))
  }

  val q243_oracle: String =
    """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS us
         FROM events
         WHERE event_type IS NOT NULL AND ts IS NOT NULL
           AND user_id IS NOT NULL),
       p AS (SELECT DISTINCT event_type,
           (us // 10800000000) * 10800000000 AS pane,
           CAST(('0x' || substr(md5('th:' || CAST(user_id AS VARCHAR)),
             1, 12)) AS BIGINT) + 1 AS h
         FROM e),
       ps AS (SELECT event_type, pane, h FROM (
           SELECT event_type, pane, h, row_number() OVER (
             PARTITION BY event_type, pane ORDER BY h) AS rk
           FROM p) WHERE rk <= 64),
       wu AS (SELECT DISTINCT event_type,
           pane - j * 10800000000 AS win_start, h
         FROM ps CROSS JOIN range(8) AS r(j)),
       ws AS (SELECT event_type, win_start, h FROM (
           SELECT event_type, win_start, h, row_number() OVER (
             PARTITION BY event_type, win_start ORDER BY h) AS rk
           FROM wu) WHERE rk <= 64)
       SELECT event_type, win_start,
         CAST(count(*) AS BIGINT) AS n_retained,
         CASE WHEN count(*) < 64 THEN 281474976710656
              ELSE max(h) END AS theta_h,
         CAST(CASE WHEN count(*) < 64 THEN count(*)
           ELSE (63 * 281474976710656) // max(h) END AS BIGINT) AS est
       FROM ws GROUP BY 1, 2"""

  /** q257: Poisson-bootstrap CI for the p99 event value per event
    * type ([[graft.operators.Stats.poissonBootstrapQuantileCi]] at
    * permille = 990): the TAIL regime of the q244 machinery — p99
    * ranks sit in the top bucket shelf where replicate reweighting
    * moves the bracket between adjacent HDR buckets, the case a
    * median gate never exercises. Values are fixed-point millis
    * (floor(value·1000) — exact on both engines); the whole surface
    * stays longs, hash-exact, zero IEEE ops. */
  val q257_p99_bootstrap: Q = (s, d) =>
    graft.operators.Stats.poissonBootstrapQuantileCi(
        Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 1000).cast("long").as("v_ms"),
            col("event_id")),
        "event_type", "v_ms", "event_id", b = 32, permille = 990,
        hdrB = 5)
      .select(col("grp").as("event_type"), col("n"), col("b_eff"),
        col("est_lb"), col("est_ub"), col("ci_lo_lb"), col("ci_hi_lb"))

  private val bootCaseSqlEv: String =
    graft.operators.Stats.PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN u <= $t THEN $k" }
      .mkString("(CASE ", " ", " ELSE 9 END)")

  val q257_oracle: String =
    s"""WITH base AS (SELECT event_type AS grp,
           CAST(floor(value * 1000) AS BIGINT) AS v, event_id AS id
         FROM events
         WHERE event_type IS NOT NULL AND value IS NOT NULL
           AND floor(value * 1000) >= 0 AND event_id IS NOT NULL),
       bb AS (SELECT grp,
           v - v % (CASE WHEN length(bin(v)) - 1 <= 5 THEN 1
             ELSE 1::BIGINT << (length(bin(v)) - 6) END) AS lb, id
         FROM base),
       sk AS (SELECT grp, lb, CAST(count(*) AS BIGINT) AS cnt
         FROM bb GROUP BY 1, 2),
       c AS (SELECT grp, lb,
           CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY lb)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
         FROM sk),
       pt AS (SELECT grp, n, min(lb) AS est_lb FROM c
         WHERE cum >= greatest(1, (990 * n + 999) // 1000)
         GROUP BY 1, 2),
       uu AS (SELECT grp, lb, r,
           CAST(('0x' || substr(md5('bs:' || r || ':'
             || CAST(id AS VARCHAR)), 1, 12)) AS BIGINT) + 1 AS u
         FROM bb CROSS JOIN range(32) AS t(r)),
       rs AS (SELECT grp, r, lb, CAST(sum($bootCaseSqlEv) AS BIGINT)
           AS cnt
         FROM uu GROUP BY 1, 2, 3),
       rc AS (SELECT grp, r, lb,
           CAST(sum(cnt) OVER (PARTITION BY grp, r ORDER BY lb)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY grp, r) AS BIGINT) AS nr
         FROM rs),
       rm AS (SELECT grp, r, min(lb) AS m FROM rc
         WHERE nr > 0 AND cum >= greatest(1, (990 * nr + 999) // 1000)
         GROUP BY 1, 2),
       rk AS (SELECT grp, r, m,
           row_number() OVER (PARTITION BY grp ORDER BY m, r) AS rk,
           CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS b_eff
         FROM rm),
       lo AS (SELECT grp, b_eff, m AS ci_lo_lb FROM rk
         WHERE rk = greatest(1, (25 * b_eff + 999) // 1000)),
       hi AS (SELECT grp, m AS ci_hi_lb FROM rk
         WHERE rk = greatest(1, (975 * b_eff + 999) // 1000))
       SELECT pt.grp AS event_type, pt.n, lo.b_eff, pt.est_lb,
         pt.est_lb + (CASE WHEN length(bin(pt.est_lb)) - 1 <= 5 THEN 1
           ELSE 1::BIGINT << (length(bin(pt.est_lb)) - 6) END) - 1
           AS est_ub,
         lo.ci_lo_lb, hi.ci_hi_lb
       FROM pt JOIN lo ON lo.grp = pt.grp JOIN hi ON hi.grp = pt.grp"""

  /** q262: exponentially-decayed trending counts per event type
    * ([[graft.operators.Anomaly.decayedCounts]], 6h halflife): the
    * "what is hot right now" score — each event weighs 2^(−age in
    * halflives), so yesterday's burst fades under this hour's ramp,
    * the recency signal q206's fixed trailing window cannot express.
    * Dyadic decay is the ONE decay family with an exact integer
    * surface: weights are 2^(40−b) longs, the sum is 128-bit, and the
    * score is one IEEE division by 2^40 — hash-exact; "now" is the
    * corpus max event time, so replays are deterministic. */
  val q262_decayed_trend: Q = (s, d) =>
    graft.operators.Anomaly.decayedCounts(Tables.events(s, d),
        "event_type", "ts", bucketMicros = 6L * 3600 * 1000000L)
      .select(col("key").as("event_type"), col("n_events"),
        col("decayed_fp"), col("decayed"))

  val q262_oracle: String =
    """WITH e AS (SELECT event_type AS key, epoch_us(ts) AS us
         FROM events
         WHERE event_type IS NOT NULL AND ts IS NOT NULL),
       nn AS (SELECT max(us) AS now FROM e),
       w AS (SELECT key,
           CASE WHEN (now - us) // 21600000000 <= 40
             THEN 1::BIGINT << CAST(40 - (now - us) // 21600000000
               AS INT)
             ELSE 0 END AS w
         FROM e CROSS JOIN nn)
       SELECT key AS event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(w AS HUGEINT)) AS BIGINT) AS decayed_fp,
         CAST(sum(CAST(w AS HUGEINT)) AS DOUBLE)
           / CAST(1099511627776 AS DOUBLE) AS decayed
       FROM w GROUP BY 1"""

  /** q265: bucket-aligned, per-key-horizon decayed trending counts
    * ([[graft.operators.Anomaly.decayedCountsAligned]], 6h buckets) —
    * q262's streaming-exact sibling: ages are absolute-bucket-index
    * differences from the KEY'S OWN latest bucket, the form whose
    * per-key bounded state gives a live dashboard the identical
    * number ([[graft.streaming.Streams.decayedTrend]] pins
    * stream == this batch fold at every prefix). Same dyadic exact
    * surface: integer weights 2^(40−age), 128-bit sum, one IEEE
    * division — hash-exact. */
  val q265_decayed_aligned: Q = (s, d) =>
    graft.operators.Anomaly.decayedCountsAligned(Tables.events(s, d),
        "event_type", "ts", bucketMicros = 6L * 3600 * 1000000L)
      .select(col("key").as("event_type"), col("n_events"),
        col("decayed_fp"), col("decayed"))

  val q265_oracle: String =
    """WITH e AS (SELECT event_type AS key,
           epoch_us(ts) // 21600000000 AS idx
         FROM events
         WHERE event_type IS NOT NULL AND ts IS NOT NULL),
       c AS (SELECT key, idx, count(*) AS n FROM e GROUP BY 1, 2),
       w AS (SELECT key, n,
           CASE WHEN max(idx) OVER (PARTITION BY key) - idx <= 40
             THEN 1::BIGINT << CAST(
               40 - (max(idx) OVER (PARTITION BY key) - idx) AS INT)
             ELSE 0 END AS w
         FROM c)
       SELECT key AS event_type, CAST(sum(n) AS BIGINT) AS n_events,
         CAST(sum(CAST(w AS HUGEINT) * n) AS BIGINT) AS decayed_fp,
         CAST(sum(CAST(w AS HUGEINT) * n) AS DOUBLE)
           / CAST(1099511627776 AS DOUBLE) AS decayed
       FROM w GROUP BY 1"""

  val all: Map[String, Q] = Map(
    "q265_decayed_aligned" -> q265_decayed_aligned,
    "q262_decayed_trend" -> q262_decayed_trend,
    "q257_p99_bootstrap" -> q257_p99_bootstrap,
    "q243_theta_panes" -> q243_theta_panes,
    "q236_theta_windows" -> q236_theta_windows,
    "q237_hdr_windows" -> q237_hdr_windows,
    "q215_seasonal_burst" -> q215_seasonal_burst,
    "q206_burst_hours" -> q206_burst_hours,
    "q217_cusum_drift" -> q217_cusum_drift,
    "q208_attribution" -> q208_attribution,
    "q203_retention_cohorts" -> q203_retention_cohorts,
    "q160_majority_label" -> q160_majority_label,
    "q169_markov_transitions" -> q169_markov_transitions,
    "q161_bradley_terry" -> q161_bradley_terry,
    "q153_funnel" -> q153_funnel,
    "q79_latest_snapshot" -> q79_latest_snapshot,
    "q65_range_join" -> q65_range_join,
    "q56_variant_json" -> q56_variant_json,
    "q52_sliding_2h" -> q52_sliding_2h,
    "q44_asof_join" -> q44_asof_join,
    "q45_approx_distinct" -> q45_approx_distinct,
    "q64_exact_distinct" -> q64_exact_distinct,
    "q19_json_extract" -> q19_json_extract,
    "q20_revision_assign" -> q20_revision_assign,
    "q21_positional_scan" -> q21_positional_scan,
    "q22_stream_metadata" -> q22_stream_metadata,
    "q23_stream_listing" -> q23_stream_listing,
    "q24_sessionize" -> q24_sessionize,
    "q25_tumbling_hourly" -> q25_tumbling_hourly)

  val oracles: Map[String, String] = Map(
    "q265_decayed_aligned" -> q265_oracle,
    "q262_decayed_trend" -> q262_oracle,
    "q257_p99_bootstrap" -> q257_oracle,
    "q243_theta_panes" -> q243_oracle,
    "q236_theta_windows" -> q236_oracle,
    "q237_hdr_windows" -> q237_oracle,
    "q215_seasonal_burst" -> q215_oracle,
    "q206_burst_hours" -> q206_oracle,
    "q217_cusum_drift" -> q217_oracle,
    "q208_attribution" -> q208_oracle,
    "q203_retention_cohorts" -> q203_oracle,
    "q160_majority_label" -> q160_oracle,
    "q169_markov_transitions" -> q169_oracle,
    "q161_bradley_terry" -> q161_oracle,
    "q153_funnel" -> q153_oracle,
    "q79_latest_snapshot" -> q79_oracle,
    "q65_range_join" -> q65_oracle,
    "q64_exact_distinct" -> q64_oracle,
    "q56_variant_json" -> q56_oracle,
    "q52_sliding_2h" -> q52_oracle,
    "q44_asof_join" -> q44_oracle,
    "q19_json_extract" -> q19_oracle,
    "q20_revision_assign" -> q20_oracle,
    "q21_positional_scan" -> q21_oracle,
    "q22_stream_metadata" -> q22_oracle,
    "q23_stream_listing" -> q23_oracle,
    "q24_sessionize" -> q24_oracle,
    "q25_tumbling_hourly" -> q25_oracle)
}
