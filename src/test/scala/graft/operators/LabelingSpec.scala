package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Label aggregation: majority vote's deterministic tie-break and the
  * Bradley-Terry integer fixpoint replayed by a pure-Scala reference
  * (bit-exact — the q161 oracle's SQL unroll is the same computation
  * in a third engine).
  */
class LabelingSpec extends SparkSuite {
  import spark.implicits._

  test("majorityVote: modal label, tie breaks to smallest label, " +
      "agreement ratio") {
    val votes = Seq(
      (1L, "cat"), (1L, "cat"), (1L, "dog"),
      (2L, "dog"), (2L, "cat"),              // tie -> "cat"
      (3L, "owl")
    ).toDF("item", "label")
    val got = Labeling.majorityVote(votes, "item", "label")
      .select($"item", $"n_votes", $"label", $"label_votes", $"agreement")
      .as[(Long, Long, String, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 3L, "cat", 2L, 2.0 / 3),
      (2L, 2L, "cat", 1L, 0.5),
      (3L, 1L, "owl", 1L, 1.0)))
  }

  test("majorityVote: null labels are not votes") {
    val votes = Seq((1L, Some("a")), (1L, None), (1L, Some("b")),
      (1L, Some("b"))).toDF("item", "label")
    val got = Labeling.majorityVote(votes, "item", "label")
      .select($"n_votes", $"label", $"label_votes")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((3L, "b", 2L)))
  }

  /** Pure-Scala replay of the documented scaled-long MM update. */
  private def btReference(prefs: Seq[(String, String)], iters: Int,
      scale: Long): Map[String, Long] = {
    val clean = prefs.filter { case (w, l) => w != l }
    val items = clean.flatMap(p => Seq(p._1, p._2)).distinct
    val wins = clean.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nij = clean.groupBy { case (w, l) =>
      if (w < l) (w, l) else (l, w)
    }.view.mapValues(_.size.toLong).toMap
    val s2 = scale * scale
    var g = items.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      g = items.map { i =>
        val den = nij.collect {
          case ((x, y), n) if x == i || y == i =>
            val j = if (x == i) y else x
            n * (s2 / (g(i) + g(j)))
        }.sum
        i -> math.max(1L,
          (wins.getOrElse(i, 0L) * s2) / math.max(den, 1L))
      }.toMap
    }
    g
  }

  test("bradleyTerry matches the pure-Scala integer reference " +
      "bit-for-bit (transitive chain + upsets)") {
    val prefs = Seq(
      ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("b", "c"),
      ("c", "d"), ("a", "d"), ("d", "b"), ("a", "a"))
    val got = Labeling.bradleyTerry(prefs.toDF("w", "l"), "w", "l",
        iters = 3, scale = 100000L)
      .as[(String, Long)].collect().toMap
    assert(got == btReference(prefs, 3, 100000L))
    // the chain is load-bearing: a dominates, d (one upset win) beats
    // nothing else, c never wins
    assert(got("a") > got("b") && got("b") > got("c"))
  }

  test("bradleyTerry: a never-winning item floors at 1 and later " +
      "rounds stay well-defined") {
    val prefs = Seq(("a", "z"), ("b", "z"), ("a", "b"), ("b", "a"))
    val got = Labeling.bradleyTerry(prefs.toDF("w", "l"), "w", "l",
        iters = 4, scale = 100000L)
      .as[(String, Long)].collect().toMap
    assert(got == btReference(prefs, 4, 100000L))
    assert(got("z") == 1L)
    assert(got("a") > got("z") && got("b") > got("z"))
  }

  test("bradleyTerry: symmetric record gives symmetric strengths") {
    val prefs = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a"))
    val got = Labeling.bradleyTerry(prefs.toDF("w", "l"), "w", "l",
        iters = 3, scale = 100000L)
      .as[(String, Long)].collect().toMap
    assert(got("a") == got("b"))
  }
}
