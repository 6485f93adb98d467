package graft.operators

import graft.SparkSuite

/** Association-mining semantics: document support counts duplicates
  * once; source overlap is set-level, not instance-level. */
class AssocSpec extends SparkSuite {
  import spark.implicits._

  test("tokenPairSupport counts a pair once per document regardless " +
      "of repetition, orders (n DESC, x, y), and applies the floor") {
    val docs = Seq(
      (1L, "a b a b c"),  // pairs {a,b},{a,c},{b,c}
      (2L, "a b"),        // {a,b}
      (3L, "a c"),        // {a,c}
      (4L, "z q"))        // below support
    val got = Assoc.tokenPairSupport(docs.toDF("doc_id", "text"),
        "doc_id", "text", minSupport = 2L, k = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L), ("a", "c", 2L)))
  }

  test("pmiTopK ranks by lift not support: a rare always-together " +
      "pair outranks a common loosely-coupled one; counts exact; " +
      "minSupport suppresses singleton-pair max lift") {
    // 8 docs; (p,q) co-occur 2/2 of their appearances (lift = 8*2/(2*2)=4)
    // while (a,b) co-occur 4 times but each appears 6 times
    // (lift = 8*4/(6*6) = 0.889) -- support would rank (a,b) first.
    val docs = Seq(
      (1L, "a b p q"), (2L, "a b p q"), (3L, "a b"), (4L, "a b"),
      (5L, "a x"), (6L, "a x"), (7L, "b y"), (8L, "b y"))
      .toDF("doc_id", "text")
    val got = Assoc.pmiTopK(docs, "doc_id", "text",
        minSupport = 2L, k = 100)
      .select($"x", $"y", $"n_xy", $"n_x", $"n_y", $"lift", $"rk")
      .as[(String, String, Long, Long, Long, Double, Long)]
      .collect().toSeq
    val byPair = got.map(r => ((r._1, r._2), r)).toMap
    val pq = byPair(("p", "q"))
    assert((pq._3, pq._4, pq._5) == ((2L, 2L, 2L)))
    assert(math.abs(pq._6 - 4.0) < 1e-15 && pq._7 == 1L)
    val ab = byPair(("a", "b"))
    assert((ab._3, ab._4, ab._5) == ((4L, 6L, 6L)))
    assert(math.abs(ab._6 - 8.0 * 4 / 36) < 1e-15)
    assert(pq._7 < ab._7, s"lift must outrank support: $got")
    // every singleton co-occurrence (e.g. (x, a) in docs 5-6...) --
    // (a,x) has support 2; a true single-doc pair like (p,x) never
    // appears; drop the floor to 1 and (b,p) support-1 pairs surface
    // with lift 8*1/(6*2) < 4 -- the floor only removes, never reorders
    assert(!got.exists(_._3 < 2))
    val noFloor = Assoc.pmiTopK(docs, "doc_id", "text",
        minSupport = 1L, k = 100)
      .select($"x", $"y").as[(String, String)].collect().toSet
    assert(got.map(r => (r._1, r._2)).toSet.subsetOf(noFloor))
    // driver replay of every lift on the real corpus slice
    val real = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sets = real.map { case (_, t) => t.split(" ", -1).distinct.toSet }
    val n = sets.length.toDouble
    val dfc = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val gotReal = Assoc.pmiTopK(graft.Tables.documents(spark, sfDir),
        "doc_id", "text", minSupport = 5L, k = 25)
      .select($"x", $"y", $"n_xy", $"n_x", $"n_y", $"lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
    gotReal.foreach { case (x, y, nxy, nx, ny, lift) =>
      assert(nx == dfc(x).toLong && ny == dfc(y).toLong)
      assert(nxy == sets.count(s => s(x) && s(y)).toLong)
      assert(lift == nxy.toDouble * n / (nx.toDouble * ny.toDouble))
    }
  }

  test("sourceOverlap is set-level: a shingle repeated across many " +
      "docs of one source counts once; jaccard uses set sizes") {
    val docs = Seq(
      ("s1", "a b c d"), ("s1", "a b c e"),   // s1 sets: {abc,bcd,bce}
      ("s2", "a b c x"), ("s2", "a b c x"))   // s2: {abc,bcx}
    val got = Assoc.sourceOverlap(docs.toDF("source", "text"),
        "source", "text", n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (a, b, common, na, nb, jac) = got.head
    assert((a, b, common, na, nb) == (("s1", "s2", 1L, 3L, 2L)))
    assert(math.abs(jac - 0.25) < 1e-15)
  }
}
