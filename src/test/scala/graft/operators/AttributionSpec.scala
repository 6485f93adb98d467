package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // user 1: view,click,view -> BUY ; click -> BUY ; view (never converts)
  // user 2: BUY with no touches (unassisted — excluded)
  // user 3: touches only, never converts (excluded)
  private lazy val log = Seq(
    (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"),
    (1L, ts(3), 3L, "view"), (1L, ts(4), 4L, "buy"),
    (1L, ts(5), 5L, "click"), (1L, ts(6), 6L, "buy"),
    (1L, ts(7), 7L, "view"),
    (2L, ts(1), 8L, "buy"),
    (3L, ts(1), 9L, "view"), (3L, ts(2), 10L, "click")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("touchCredits: paths split at conversions, unconverted and " +
      "unassisted tails are excluded, first/last land on the right " +
      "channels, and linear credit reads off the integer surface") {
    val got = Attribution.touchCredits(log, "user_id", "event_type",
        Seq("ts", "event_id"), touchTypes = Seq("view", "click"),
        convType = "buy")
      .select($"channel", $"path_len", $"n_touches", $"n_first",
        $"n_last")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // path A (len 3): view,click,view — first=view, last=view
    // path B (len 1): click — first=last=click
    assert(got == Set(
      ("view", 3L, 2L, 1L, 1L),
      ("click", 3L, 1L, 0L, 0L),
      ("click", 1L, 1L, 1L, 1L)))
    // linear credit: view = 2/3, click = 1/3 + 1/1 — derivable exactly
    val linear = got.groupBy(_._1).view.mapValues(
      _.map(r => r._3.toDouble / r._2).sum).toMap
    assert(math.abs(linear("view") - 2.0 / 3) < 1e-15)
    assert(math.abs(linear("click") - (1.0 / 3 + 1.0)) < 1e-15)
  }

  test("touchCredits: a touch tying the conversion's timestamp counts " +
      "into the path iff its event_id orders before the conversion") {
    val t = ts(1)
    val log2 = Seq(
      (1L, t, 1L, "view"), (1L, t, 2L, "buy"),   // view before buy: in
      (2L, t, 4L, "buy"), (2L, t, 5L, "view")    // view after buy: out
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Attribution.touchCredits(log2, "user_id", "event_type",
        Seq("ts", "event_id"), Seq("view", "click"), "buy")
      .select($"channel", $"path_len", $"n_touches")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("view", 1L, 1L)))
  }
}
