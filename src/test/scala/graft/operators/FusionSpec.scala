package graft.operators

import graft.SparkSuite

/** RRF fusion: exact integer contributions, missing-id convention,
  * deterministic tie order. */
class FusionSpec extends SparkSuite {
  import spark.implicits._

  private def contrib(rank: Long): Long = 1000000000L / (60L + rank)

  test("rrfTopK: fused scores are the exact integer sums; items in " +
      "one list only still score") {
    val r1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rk")
    val r2 = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rk")
    val got = Fusion.rrfTopK(Seq(r1, r2), "id", "rk", k = 10)
      .select($"id", $"fused", $"rk")
      .as[(Long, Long, Long)].collect().toList
    val exp = Map(
      10L -> (contrib(1) + contrib(2)),
      20L -> (contrib(2) + contrib(1)),
      30L -> contrib(3),
      40L -> contrib(3))
    // 10 and 20 tie exactly -> id ascending breaks it
    assert(got.map(_._1) == List(10L, 20L, 30L, 40L))
    assert(got.map(r => r._1 -> r._2).toMap == exp)
    assert(got.map(_._3) == List(1L, 2L, 3L, 4L))
  }

  test("rrfTopK: k cuts after fusion, not per list") {
    val r1 = (1L to 5L).map(i => (i, i)).toDF("id", "rk")
    val r2 = (1L to 5L).map(i => (i + 2, i)).toDF("id", "rk")
    val got = Fusion.rrfTopK(Seq(r1, r2), "id", "rk", k = 3)
      .select($"id").as[Long].collect().toList
    assert(got.size == 3)
    // 3 appears at ranks 3 and 1 -> strongest fused score
    assert(got.head == 3L)
  }

  test("rboTopK: the exact weight table matches the rational closed " +
      "form, identical rankings score exactly 1 - p^k, zero-overlap " +
      "groups are absent, and the table refuses long overflow") {
    // Fraction-derived pinned table at p=9/10, depth 10 (den 7e11)
    val (den, nums) = Fusion.rboWeights(9, 10, 10)
    assert(den == 700000000000L)
    assert(nums.toSeq == Seq(164791479598L, 94791479598L, 63291479598L,
      44391479598L, 31633979598L, 22448579598L, 15559529598L,
      10245119598L, 6060021723L, 2711943423L))
    // identical top-10s: X_d = d for every d -> RBO = 1 - p^10 exactly
    val run = (1L to 10L).map(i => ("g", i * 100L, i)).toDF("grp", "it", "rk")
    val ident = Fusion.rboTopK(run, run, "grp", "it", "rk")
      .as[(String, Long, Long, Double)].collect().head
    assert(ident._2 == 10L)
    assert(ident._3 == nums.sum)
    // 1 - (9/10)^10 = (10^10 - 9^10) * 70 / 7e11
    assert(ident._3 == (BigInt(10).pow(10) - BigInt(9).pow(10)) * 70)
    assert(ident._4 == nums.sum.toDouble / 700000000000.0)
    // a reversed ranking agrees less than an identical one but shares
    // every item: X_d = max(0, 2d - 10)
    val rev = (1L to 10L).map(i => ("g", i * 100L, 11L - i))
      .toDF("grp", "it", "rk")
    val rr = Fusion.rboTopK(run, rev, "grp", "it", "rk")
      .as[(String, Long, Long, Double)].collect().head
    val expectRev = (1 to 10).map(i => nums(math.max(i, 11 - i) - 1)).sum
    assert(rr._3 == expectRev && rr._3 < ident._3)
    // zero overlap -> the group is absent (inner-join semantics)
    val other = (1L to 10L).map(i => ("g", i * 7L + 3L, i))
      .toDF("grp", "it", "rk")
    assert(Fusion.rboTopK(run, other, "grp", "it", "rk").count() == 0)
    // ranks beyond depth are ignored on BOTH sides
    val deep = run.unionByName(
      Seq(("g", 9999L, 11L)).toDF("grp", "it", "rk"))
    assert(Fusion.rboTopK(deep, deep, "grp", "it", "rk")
      .as[(String, Long, Long, Double)].collect().head._2 == 10L)
    // a table that cannot fit longs is refused loudly
    val err = intercept[IllegalArgumentException] {
      Fusion.rboWeights(99, 100, 32)
    }
    assert(err.getMessage.contains("overflow"))
  }

  test("retrievalMetrics: textbook worked example at k=5 (L=60) — " +
      "P@k/R@k/RR/AP exact; R=0 reports NULL recall/AP; unretrieved " +
      "relevant items count in recall; dup run rows collapse") {
    // A: items a..e at ranks 1..5; relevant {b, d, z} (z never
    // retrieved). B: no relevant items at all. C: one relevant, hit
    // at rank 1. A dup (A, b) at rank 5 must collapse to rank 2.
    val run = Seq(
      ("A", "a", 1L), ("A", "b", 2L), ("A", "c", 3L), ("A", "d", 4L),
      ("A", "e", 5L), ("A", "b", 5L),
      ("B", "a", 1L), ("B", "b", 2L),
      ("C", "x", 1L), ("C", "y", 2L)).toDF("q", "it", "rk")
    val truth = Seq(("A", "b"), ("A", "d"), ("A", "z"), ("C", "x"))
      .toDF("q", "it")
    val got = Fusion.retrievalMetrics(run, truth, "q", "it", "rk", k = 5)
      .select($"grp", $"n_rel", $"hits_at_k", $"first_rel_rank",
        $"rr_num", $"ap_num", $"p_at_k", $"r_at_k", $"rr", $"ap")
      .as[(String, Long, Long, Option[Long], Long, Long, Double,
        Option[Double], Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // A: hits b@2 (hidx 1), d@4 (hidx 2); ap_num = 1*(60/2) + 2*(60/4)
    //    = 60; ap = 60/(60*min(3,5)) = 1/3; rr = 1/2
    assert(got("A") == ("A", 3L, 2L, Some(2L), 30L, 60L, 2.0 / 5.0,
      Some(2.0 / 3.0), 30.0 / 60.0, Some(60.0 / 180.0)))
    // B: R=0 -> recall/AP NULL (undefined), rr = 0
    assert(got("B") == ("B", 0L, 0L, None, 0L, 0L, 0.0, None, 0.0,
      None))
    // C: perfect first hit -> rr = 1, ap = 1
    assert(got("C") == ("C", 1L, 1L, Some(1L), 60L, 60L, 1.0 / 5.0,
      Some(1.0), 1.0, Some(1.0)))
  }

  test("ndcgAtK: hand-computed fixed-point DCG/IDCG, perfect ranking " +
      "scores exactly 1.0, no-relevant group is NULL (undefined)") {
    val d = Fusion.ndcgDiscounts(3)
    assert(d(0) == 4294967296L, "disc(1) must be exactly 2^32")
    assert(d(2) == 2147483648L, "disc(3) = 2^32/log2(4) = 2^31 exactly")
    // g: truth a=2, b=1, c=1 (d rel=0 drops); run = b@1, x@2, a@3
    // p: same truth, run = a@1, b@2, c@3 (the ideal order) -> ndcg 1
    // h: run only, no truth -> NULL idcg/ndcg
    val run = Seq(
      ("g", "b", 1L), ("g", "x", 2L), ("g", "a", 3L),
      ("p", "a", 1L), ("p", "b", 2L), ("p", "c", 3L),
      ("h", "a", 1L)).toDF("grp", "item", "rank")
    val truth = Seq(
      ("g", "a", 2L), ("g", "b", 1L), ("g", "c", 1L), ("g", "d", 0L),
      ("p", "a", 2L), ("p", "b", 1L), ("p", "c", 1L))
      .toDF("grp", "item", "rel")
    val got = Fusion.ndcgAtK(run, truth, "grp", "item", "rank", "rel",
        k = 3)
      .as[(String, Long, Long, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val idcg = 2L * d(0) + d(1) + d(2)
    val dcgG = d(0) + 2L * d(2) // b@1 (rel 1), a@3 (rel 2)
    assert(got("g") == ("g", 3L, dcgG, Some(idcg),
      Some(dcgG.toDouble / idcg.toDouble)))
    assert(got("p") == ("p", 3L, idcg, Some(idcg), Some(1.0)))
    assert(got("h") == ("h", 0L, 0L, None, None))
  }

  test("ndcgAtK + retrievalMetrics domain is run UNION truth: a " +
      "group whose run retrieved nothing still reports zeros instead " +
      "of vanishing from the mean") {
    val run = Seq(("g", "a", 1L)).toDF("grp", "item", "rank")
    // t exists only in truth: its run found nothing inside top-k
    val truth = Seq(("g", "a", 1L), ("t", "x", 2L), ("t", "y", 1L))
      .toDF("grp", "item", "rel")
    val d = Fusion.ndcgDiscounts(3)
    val ndcg = Fusion.ndcgAtK(run, truth, "grp", "item", "rank",
        "rel", k = 3)
      .as[(String, Long, Long, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(ndcg.keySet == Set("g", "t"))
    assert(ndcg("t") == ("t", 2L, 0L, Some(2L * d(0) + d(1)),
      Some(0.0)))
    val rm = Fusion.retrievalMetrics(run,
        truth.select($"grp", $"item"), "grp", "item", "rank",
        k = 3)
      .select($"grp", $"n_rel", $"hits_at_k",
        $"rr_num", $"ap_num")
      .as[(String, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rm.keySet == Set("g", "t"))
    assert(rm("t") == ("t", 2L, 0L, 0L, 0L))
  }
}
