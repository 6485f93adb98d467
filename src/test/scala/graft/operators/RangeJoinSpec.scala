package graft.operators

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed point-in-interval join equals the naive inequality " +
      "join, including bin-boundary and multi-bin intervals") {
    val intervals = Seq(
      // exactly bin-aligned (1h bins): [10:00, 12:00)
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      // spans three bins with ragged edges
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:10:00")),
      // sub-bin interval
      (2L, ts("2024-01-01 00:15:00"), ts("2024-01-01 00:20:00")),
      // empty interval set for key 3 — no output rows
      (3L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00"))
    ).toDF("k", "s", "e")
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: included
      (1L, ts("2024-01-01 12:00:00")), // == end: excluded for interval 1
      (1L, ts("2024-01-01 11:59:59")),
      (1L, ts("2024-01-01 12:09:59")),
      (2L, ts("2024-01-01 00:15:00")),
      (2L, ts("2024-01-01 00:20:00")), // == end: excluded
      (3L, ts("2024-01-01 05:00:00")), // empty interval: excluded
      (9L, ts("2024-01-01 10:30:00")) // key with no intervals
    ).toDF("k", "p")

    val binned = RangeJoin.pointInInterval(intervals, points,
        "s", "e", "p", keys = Seq("k"), binWidthSec = 3600L)
      .select($"k", $"s", $"p")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2))).toSet
    val naive = intervals.as("i")
      .join(points.as("pt"), $"i.k" === $"pt.k" &&
        $"pt.p" >= $"i.s" && $"pt.p" < $"i.e")
      .select($"i.k", $"i.s", $"pt.p")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2))).toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
    // the == start point is in; the == end points are out
    assert(binned.contains((1L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:00:00"))))
    // == end excluded for the [10:00, 12:00) interval (but that same
    // point IS inside the overlapping [10:30, 12:10) one)
    assert(!binned.contains((1L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 12:00:00"))))
    assert(binned.contains((1L, ts("2024-01-01 10:30:00"),
      ts("2024-01-01 12:00:00"))))
  }

  test("bucketed range join on the events fixture equals the naive " +
      "inequality join (q65 shape), and no pair is emitted twice") {
    val ev = graft.Tables.events(spark, sfDir)
    val windows = ev
      .filter($"event_type" === "purchase" && $"value" > 200)
      .select($"user_id", $"ts".as("ws"),
        ($"ts" + expr("INTERVAL 2 DAYS")).as("we"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("cts"))
    val pairs = RangeJoin.pointInInterval(windows, clicks,
        "ws", "we", "cts", keys = Seq("user_id"),
        binWidthSec = 2 * 24 * 3600L)
      .select($"user_id", $"ws", $"cts")
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(got.length == got.toSet.size) // exactly-once per pair
    val naive = windows.as("w")
      .join(clicks.as("c"), col("w.user_id") === col("c.user_id") &&
        $"cts" >= $"ws" && $"cts" < $"we")
      .select(col("w.user_id"), $"ws", $"cts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2)))
    assert(got.toSet == naive.toSet)
  }
}
