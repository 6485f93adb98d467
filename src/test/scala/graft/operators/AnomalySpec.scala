package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSuite {
  import spark.implicits._

  // hand-built hourly log for key "a": hours 0..3 quiet (1 event each),
  // hour 5 a spike of 9, hour 6 back to 1; key "b" never has enough
  // history. Hour 4 is EMPTY — the range window must treat it as zero
  // without a scaffold row.
  private def ts(h: Int, m: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private lazy val log = (
    Seq.tabulate(4)(h => ("a", ts(h))) ++
    Seq.tabulate(9)(m => ("a", ts(5, m))) ++
    Seq(("a", ts(6))) ++
    Seq(("b", ts(0)), ("b", ts(1)))
  ).toDF("key", "ts")

  test("burstBuckets: trailing-3h range baseline skips the empty hour, " +
      "withholds under-covered history, and the integer decision " +
      "matches the hand calculation") {
    val got = Anomaly.burstBuckets(log, "key", "ts",
        trailing = 3, factorNum = 2, factorDen = 1)
      .select($"key", $"bucket_hour", $"n", $"baseline", $"is_burst")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2 % 24, r._3, r._4, r._5)).sortBy(r => (r._1, r._2))
    // hour 3: baseline = hours 0,1,2 = 3; 1*3*1 > 2*3 ? no
    // hour 5: baseline = hours 2,3 (+ empty 4) = 2; 9*3 > 2*2 ? yes
    // hour 6: baseline = hours 3,(4),5 = 1+9 = 10; 1*3 > 20 ? no
    // key b: first hour 0, nothing at h >= 3 -> no rows
    assert(got.toSeq == Seq(
      ("a", 3L, 1L, 3L, false),
      ("a", 5L, 9L, 2L, true),
      ("a", 6L, 1L, 10L, false)))
  }

  test("cusumFlags == a driver replay of the literal Page recurrence " +
      "S_t = max(0, S_{t-1} + n_t - k) over EVERY hour including the " +
      "unmaterialized empty ones (the prefix-scan identity is exact), " +
      "and a sustained shift alarms where a single spike cannot") {
    // key "a": 12 quiet hours at 1/hr with one empty hour, then a
    // sustained 8/hr for 6 hours, then quiet again — the mean rate
    // puts the self-scaling allowance at k=6, so the shift accumulates
    // +2/hr and the quiet tail drains at -5/hr. Also a singleton key
    // (degenerate span).
    val rows =
      (0 until 12).filter(_ != 7).map(h => ("a", ts(h), 1)) ++
      (12 until 18).map(h => ("a", ts(h), 8)) ++
      (18 until 24).map(h => ("a", ts(h), 1)) :+ (("b", ts(3), 2))
    val log = rows.flatMap { case (k, t, n) =>
      Seq.fill(n)((k, t)) }.toDF("key", "ts")
    val got = Anomaly.cusumFlags(log, "key", "ts",
        factorNum = 2, factorDen = 1, threshold = 5)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // driver replay: literal recurrence over the dense hour range
    def replay(counts: Map[Long, Long]): Map[Long, (Long, Long)] = {
      val h0 = counts.keys.min; val h1 = counts.keys.max
      val tot = counts.values.sum
      val k = (2 * tot) / (h1 - h0 + 1) + 1
      var s = 0L
      (h0 to h1).flatMap { h =>
        s = math.max(0L, s + counts.getOrElse(h, 0L) - k)
        if (counts.contains(h)) Some(h -> ((k, s))) else None
      }.toMap
    }
    for (key <- Seq("a", "b")) {
      val counts = rows.filter(_._1 == key).map { case (_, t, n) =>
        (t.getTime / 3600000L) -> n.toLong }.toMap
      val exp = replay(counts)
      exp.foreach { case (h, (k, s)) =>
        val (n, ka, cus, alarm) = got((key, h))
        assert(n == counts(h) && ka == k && cus == s &&
          alarm == (s > 5), s"$key@$h: got ($n,$ka,$cus,$alarm) " +
            s"want (${counts(h)},$k,$s,${s > 5})")
      }
    }
    // the shift alarms; the quiet head never does; the tail drains
    val aAlarms = got.collect { case ((k, h), (_, _, _, true)) if k == "a"
      => h - ts(0).getTime / 3600000L }
    assert(aAlarms.nonEmpty && aAlarms.forall(_ >= 12), s"$aAlarms")
    assert(got(("a", ts(23).getTime / 3600000L))._4 == false,
      "CUSUM must drain back below threshold after the shift ends")
  }

  test("cusumFlagsFixed: explicit allowance == the same replay with " +
      "that k (the deployed-monitor form the streaming twin mirrors)") {
    val rows =
      (0 until 12).filter(_ != 7).map(h => ("a", ts(h), 1)) ++
      (12 until 18).map(h => ("a", ts(h), 8)) ++
      (18 until 24).map(h => ("a", ts(h), 1))
    val log = rows.flatMap { case (k, t, n) =>
      Seq.fill(n)((k, t)) }.toDF("key", "ts")
    val got = Anomaly.cusumFlagsFixed(log, "key", "ts",
        allowance = 3, threshold = 10)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._4, r._5, r._6))).toMap
    val counts = rows.map { case (_, t, n) =>
      (t.getTime / 3600000L) -> n.toLong }.toMap
    val h0 = counts.keys.min
    var s = 0L
    (h0 to counts.keys.max).foreach { h =>
      s = math.max(0L, s + counts.getOrElse(h, 0L) - 3L)
      if (counts.contains(h))
        assert(got(h) == ((3L, s, s > 10L)), s"h=${h - h0}: ${got(h)} " +
          s"want (3,$s,${s > 10L})")
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("seasonalBurstBuckets: the baseline reads the SAME hour-of-day " +
      "across days — a spike at a normally-quiet hour flags even when " +
      "the flat-trailing view would absorb it into busier hours") {
    def at(day: Int, h: Int, m: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(
        f"2024-01-${day + 1}%02d $h%02d:$m%02d:00")
    // key "a": hour 9 is busy (3/day), hour 3 quiet (1/day), for days
    // 0..2; on day 3 hour 3 spikes to 4 while hour 9 stays at 3
    val rows = (for (d <- 0 to 2; i <- 0 until 3) yield ("a", at(d, 9, i))) ++
      (for (d <- 0 to 2) yield ("a", at(d, 3))) ++
      Seq.tabulate(4)(i => ("a", at(3, 3, i))) ++
      Seq.tabulate(3)(i => ("a", at(3, 9, i)))
    val got = Anomaly.seasonalBurstBuckets(rows.toDF("key", "ts"),
        "key", "ts", trailingDays = 3, factorNum = 2, factorDen = 1)
      .select($"hour_of_day", $"n", $"baseline", $"is_burst")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // day 3, hod 3: baseline = 3 (one per day); 4*3 > 2*3 -> burst
    // day 3, hod 9: baseline = 9; 3*3 > 18 ? no
    assert(got == Seq((3L, 4L, 3L, true), (9L, 3L, 9L, false)))
  }

  test("burstBuckets: a quiet-history key's first activity after a gap " +
      "flags against a zero baseline (any rate beats an empty window)") {
    val sparse = Seq(("k", ts(0)), ("k", ts(10))).toDF("key", "ts")
    val got = Anomaly.burstBuckets(sparse, "key", "ts",
        trailing = 3, factorNum = 2, factorDen = 1)
      .select($"bucket_hour" % 24, $"n", $"baseline", $"is_burst")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((10L, 1L, 0L, true)))
  }

  test("decayedCounts: dyadic weights halve per bucket exactly, " +
      "events beyond maxBuckets weigh zero, recency outranks raw " +
      "count") {
    // bucket = 100us, now = 1000: ages in buckets = (1000 - us) DIV 100
    // hot: us 1000 (2^5) + 900 (2^4); cold: us 800 (2^3) + five at
    // us 400 (b=6 > maxBuckets=5 -> 0)
    val rows = Seq(("hot", 1000L), ("hot", 900L), ("cold", 800L),
      ("cold", 400L), ("cold", 400L), ("cold", 400L), ("cold", 400L),
      ("cold", 400L)).toDF("k", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val got = Anomaly.decayedCounts(rows, "k", "ts",
        bucketMicros = 100L, maxBuckets = 5)
      .as[(String, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("hot") == (("hot", 2L, 32L + 16L, 48.0 / 32.0)))
    assert(got("cold") == (("cold", 6L, 8L, 8.0 / 32.0)),
      "five stale events must weigh zero")
    assert(got("hot")._4 > got("cold")._4,
      "2 fresh events must outrank 6 stale ones")
  }

  test("decayedCounts: decayed_fp overflow raises loudly (matching " +
      "the oracle's HUGEINT->BIGINT cast error) instead of Spark's " +
      "silent NULL; maxBuckets capped at 40") {
    intercept[IllegalArgumentException] {
      Anomaly.decayedCounts(Seq(("k", 0L)).toDF("k", "us")
        .withColumn("ts", expr("timestamp_micros(us)")),
        "k", "ts", bucketMicros = 100L, maxBuckets = 41)
    }
    // 2^23 + 1 fresh events at maxBuckets = 40 push the weighted sum
    // one past Long.MaxValue — the guard must raise, never NULL
    val many = spark.range((1L << 23) + 1)
      .select(lit("k").as("k"), expr("timestamp_micros(0)").as("ts"))
    val e = intercept[Exception] {
      Anomaly.decayedCounts(many, "k", "ts",
        bucketMicros = 100L, maxBuckets = 40).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("overflows long"))), e.toString)
  }
}
