package graft.operators

import graft.SparkSuite
import java.sql.Timestamp

/** Funnel semantics: earliest-completion greedy, strict ordering
  * between steps, stalled users keep their prefix. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def run(evs: Seq[(Long, String, Timestamp)]) =
    Funnel.funnel(evs.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("a", "b", "c"))
      .as[(Long, Option[Timestamp], Option[Timestamp],
        Option[Timestamp], Long)]
      .collect().map(r => r._1 -> r).toMap

  test("full completion walks earliest anchors; later extras ignored") {
    val r = run(Seq((1L, "a", ts(1)), (1L, "b", ts(2)),
      (1L, "c", ts(3)), (1L, "a", ts(4))))
    assert(r(1L) == ((1L, Some(ts(1)), Some(ts(2)), Some(ts(3)), 3L)))
  }

  test("greedy earliest anchor is optimal: a@1 b@2 c@3 completes " +
      "even though b@2 also follows a later a") {
    // b BEFORE the first a must not anchor step 2
    val r = run(Seq((2L, "b", ts(1)), (2L, "a", ts(2)),
      (2L, "b", ts(5)), (2L, "c", ts(6))))
    assert(r(2L) == ((2L, Some(ts(2)), Some(ts(5)), Some(ts(6)), 3L)))
  }

  test("stalled users keep their prefix; strictly-after ordering " +
      "excludes same-timestamp completions") {
    val r = run(Seq(
      (3L, "a", ts(1)),                    // depth 1
      (4L, "a", ts(1)), (4L, "b", ts(1)),  // b NOT after a -> depth 1
      (5L, "b", ts(1)), (5L, "c", ts(2)))) // no a -> absent
    assert(r(3L)._5 == 1L && r(3L)._3.isEmpty)
    assert(r(4L)._5 == 1L)
    assert(!r.contains(5L))
  }
}
