package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel analysis over an event stream — "users who did A, then B,
  * then C, in order": the product-analytics staple the events surface
  * was missing (sessionization q24 groups by gap, windows q25/q52
  * bucket by time; neither matches ORDERED sequences). Semantics are
  * the standard earliest-completion greedy walk: step 1 anchors at the
  * user's earliest A; step k at the earliest matching event STRICTLY
  * after step k-1 — greedy is optimal here (an earlier anchor can only
  * admit more later completions), so depth is exact, not heuristic.
  *
  * Scale shape: one pass per step over the events scan, each filtered
  * to a single event type (predicate pushed into the scan — a funnel
  * step usually selects a tiny slice of the log), aggregated to at
  * most one row per user before the join. The running frame is
  * user-keyed and at most |users| rows; every join and group is on
  * the user key, so the whole funnel is |steps| small joins — never a
  * per-event window over the full log. Users who stall keep their
  * prefix (left joins; a null anchor nulls every later step). */
object Funnel {

  /** Per-user funnel timestamps and depth for `steps` event types.
    * Output: (userCol, t1..tk timestamps — null once the user stalls —
    * and depth: how many steps completed). Users with no step-1 event
    * don't appear (they are the complement of the t1 column). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("t1"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val k = i + 2
      val ev = events.filter(col(typeCol) === st)
        .select(col(userCol).as("__u2"), col(tsCol).as("__ts"))
      val prevCols = (1 until k).map(j => col(s"t$j"))
      cur = cur.join(ev,
          cur("__u") === ev("__u2") && ev("__ts") > cur(s"t${k - 1}"),
          "left")
        .groupBy(col("__u") +: prevCols: _*)
        .agg(min(col("__ts")).as(s"t$k"))
    }
    val depth = (1 to steps.length).map(j =>
        when(col(s"t$j").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    cur.select(col("__u").as(userCol) +:
      (1 to steps.length).map(j => col(s"t$j")) :+
      depth.as("depth"): _*)
  }

  /** Retention cohort matrix — the other product-analytics staple
    * next to [[funnel]]: group users by the DAY of their first event
    * (their cohort), then count how many of each cohort were active
    * again N days later. Output one row per observed
    * (cohort_date, day_offset): (cohort_date, day_offset, n_users),
    * offset 0 being the cohort's own size (every user is active on
    * their first day). Day boundaries are calendar dates of `tsCol`
    * in the session time zone (UTC here — the Tables.events
    * contract); all arithmetic is exact integers and dates, so the
    * matrix gates hash-exact.
    *
    * Scale shape: the log collapses to DISTINCT (user, active-day)
    * rows first (one dedup agg — the only pass over raw events);
    * first-day per user is a user-keyed min agg over THAT frame; one
    * user-keyed join back and one (cohort, offset) count agg. Every
    * shuffle is keyed on users or the date matrix (both ≪ the event
    * log); no windows, nothing driver-side. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val days = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
      .localCheckpoint(false) // feeds the cohort agg + the join back
    val cohort = days.groupBy(col("__u")).agg(min(col("__d")).as("__c0"))
    days.join(cohort, Seq("__u"))
      .groupBy(col("__c0").as("cohort_date"),
        datediff(col("__d"), col("__c0")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
