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
}
