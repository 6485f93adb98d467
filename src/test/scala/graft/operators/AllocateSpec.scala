package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AllocateSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], budget: Long) =
    Allocate.waterFill(rows.toDF("d", "n", "w"), "d", "n", "w", budget)
      .select($"d", $"avail", $"weight", $"capped", $"allocation")
      .as[(String, Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap

  /** Reference sequential water-filling: repeatedly allocate the
    * remaining budget proportionally, cap overflowing domains, and
    * re-flow until stable — the textbook fixpoint the closed form
    * must reproduce. */
  private def fixpoint(rows: Seq[(String, Long, Long)],
      budget: Long): Map[String, Long] = {
    var pool = rows
    var out = Map.empty[String, Long]
    var b = budget
    var changed = true
    while (changed && pool.nonEmpty) {
      changed = false
      val wSum = pool.map(_._3).sum
      val over = pool.filter { case (_, n, w) => n * wSum <= b * w }
      if (over.nonEmpty) {
        changed = true
        over.foreach { case (d, n, _) => out += d -> n; b -= n }
        pool = pool.filterNot(r => over.exists(_._1 == r._1))
      } else {
        pool.foreach { case (d, _, w) => out += d -> (b * w / wSum) }
        pool = Nil
      }
    }
    out
  }

  test("waterFill matches the sequential fixpoint, never exceeds a " +
      "domain's avail, and spends within the budget") {
    val rows = Seq(("a", 100L, 1L), ("b", 5000L, 2L), ("c", 40L, 5L),
      ("d", 900L, 1L), ("e", 2500L, 3L))
    for (budget <- Seq(0L, 100L, 1000L, 3000L, 8000L, 100000L)) {
      val got = run(rows, budget)
      val ref = fixpoint(rows, budget)
      rows.foreach { case (d, n, _) =>
        assert(got(d)._5 == ref(d), s"budget=$budget domain=$d: " +
          s"${got(d)._5} vs fixpoint ${ref(d)}")
        assert(got(d)._5 <= n)
      }
      val spent = got.values.map(_._5).sum
      assert(spent <= budget || spent == rows.map(_._2).sum.min(budget))
      // budget beyond total avail caps everyone at avail
      if (budget >= rows.map(_._2).sum)
        rows.foreach { case (d, n, _) => assert(got(d)._5 == n) }
    }
  }

  test("waterFill floor remainders stay bounded (< one unit per " +
      "uncapped domain) and the capped set is a scarcity-order prefix") {
    val rows = Seq(("a", 10L, 3L), ("b", 1000L, 3L), ("c", 11L, 2L),
      ("d", 700L, 1L))
    val budget = 500L
    val got = run(rows, budget)
    val uncapped = got.values.filter(!_._4)
    val spent = got.values.map(_._5).sum
    assert(budget - spent < uncapped.size.max(1),
      s"left ${budget - spent} unallocated with ${uncapped.size} uncapped")
    // prefix property: sorted by n/w, capped flags are a prefix
    val order = got.values.toSeq
      .sortBy(r => (r._2.toDouble / r._3, r._1)).map(_._4)
    assert(!order.dropWhile(identity).exists(identity), order.toString)
  }

  test("waterFill refuses a corpus-sized frame (the maxDomains " +
      "contract) and a negative budget") {
    val big = spark.range(0, 50).select(
      concat(lit("d"), $"id").as("d"), lit(10L).as("n"), lit(1L).as("w"))
    intercept[IllegalArgumentException] {
      Allocate.waterFill(big, "d", "n", "w", 100L, maxDomains = 10)
    }
    intercept[IllegalArgumentException] {
      Allocate.waterFill(big, "d", "n", "w", -1L)
    }
  }

  test("apportion: exact proportions pass through untouched, the quota " +
      "property holds (|slots - total*w/W| < 1, sum == total), ties " +
      "break by key, duplicates aggregate, zero weights drop") {
    import spark.implicits._
    // exactly proportional: (5,3,2) over total 10 -> (5,3,2), no
    // remainder slots at all
    val exact = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "n")
    assert(Allocate.apportion(exact, Seq("k"), "n", 10L)
      .as[(String, Long, Long)].collect().toSet ==
      Set(("a", 5L, 5L), ("b", 3L, 3L), ("c", 2L, 2L)))
    // equal remainders: 10 over (1,1,1) -> base 3 each, 1 leftover to
    // the smallest key
    val tie = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("k", "n")
    assert(Allocate.apportion(tie, Seq("k"), "n", 10L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap ==
      Map("x" -> 4L, "y" -> 3L, "z" -> 3L))
    // quota property on awkward weights; duplicates sum; zeros drop
    val rows = Seq(("a", 7L), ("a", 6L), ("b", 29L), ("c", 1L),
      ("d", 57L), ("e", 0L)).toDF("k", "n")
    val got = Allocate.apportion(rows, Seq("k"), "n", 101L)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._3).sum == 101L)
    assert(!got.map(_._1).contains("e"))
    val totW = got.map(_._2).sum.toDouble
    got.foreach { case (k, w, slots) =>
      val quota = 101L * w / totW
      assert(math.abs(slots - quota) < 1.0, s"$k: $slots vs $quota")
    }
    // total 0 allocates nothing
    assert(Allocate.apportion(exact, Seq("k"), "n", 0L)
      .as[(String, Long, Long)].collect().forall(_._3 == 0L))
  }
}
