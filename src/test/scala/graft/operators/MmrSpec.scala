package graft.operators

import graft.SparkSuite

/** MMR re-rank: greedy semantics, diversity penalty, bounds. */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  // v1 and its exact duplicate, plus an orthogonal vector: the
  // diversity penalty must defer the duplicate behind the orthogonal
  // item despite its higher relevance
  private lazy val pool = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0.99),
    (2L, Array(1.0f, 0.0f, 0.0f), 0.98),
    (3L, Array(0.0f, 1.0f, 0.0f), 0.60)
  ).toDF("id", "v", "rel")

  test("diversity penalty defers an exact duplicate behind a " +
      "less-relevant orthogonal item") {
    val got = Mmr.rerank(pool, "id", "v", "rel", k = 3,
        lamNum = 7, lamDen = 10)
      .as[(Long, Long)].collect().toList
    // step2: dup scores .7*.98-.3*1=.386 < orthogonal .7*.6=.42
    assert(got == List((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("lambda=1 ignores diversity entirely (pure relevance order)") {
    val got = Mmr.rerank(pool, "id", "v", "rel", k = 3,
        lamNum = 1, lamDen = 1)
      .as[(Long, Long)].collect().toList
    assert(got == List((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("k beyond the pool stops at the pool; tie on score breaks " +
      "to the smaller id") {
    val tied = Seq(
      (5L, Array(1.0f, 0.0f), 0.5),
      (4L, Array(0.0f, 1.0f), 0.5)
    ).toDF("id", "v", "rel")
    val got = Mmr.rerank(tied, "id", "v", "rel", k = 10)
      .as[(Long, Long)].collect().toList
    assert(got == List((1L, 4L), (2L, 5L)))
  }

  test("maxPool refuses an unbounded frame") {
    val big = spark.range(0, 50).selectExpr("id",
      "array(cast(id as float)) as v", "cast(id as double) as rel")
    intercept[IllegalArgumentException] {
      Mmr.rerank(big, "id", "v", "rel", k = 2, maxPool = 10)
    }
  }

  // Deterministic multi-group fixture: 3 groups x 20 candidates with
  // hash-spread 4-dim vectors and descending relevance.
  private def groupedFixture = {
    def h(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (for (g <- 0 until 3; i <- 0 until 20) yield {
      val id = g * 100L + i
      val v = Array.tabulate(4)(d =>
        ((h(id * 4 + d) % 1000L) / 500.0f - 1.0f))
      (g, id, v, ((h(id) % 1000L).toDouble + 1000.0) / 2000.0)
    }).toDF("g", "id", "v", "rel")
  }

  test("rerankGrouped reproduces the driver-side greedy group by " +
      "group (same picks, same order)") {
    val fx = groupedFixture
    val got = Mmr.rerankGrouped(fx, "g", "id", "v", "rel",
        k = 5, m = 12)
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.sortBy(_._2).map(_._3).toList }
    for (g <- 0 until 3) {
      // the driver-side reference on the SAME top-m pool
      val pool = fx.filter($"g" === g)
        .orderBy($"rel".desc, $"id").limit(12)
        .select($"id", $"v", $"rel")
      val want = Mmr.rerank(pool, "id", "v", "rel", k = 5)
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toList
      assert(got(g) == want, s"group $g: ${got(g)} vs $want")
    }
  }

  test("pool bound binds: a candidate outside the top-m by relevance " +
      "is never picked, however diverse") {
    // group 9: m-1 near-identical high-rel vectors + one orthogonal
    // LOW-rel candidate ranked below the cap — with the cap at m the
    // orthogonal one is outside the pool and must not appear, even
    // though unbounded MMR would pick it second
    val rows = (0 until 12).map { i =>
      (9, i.toLong, Array(1.0f, 0.0f, 1e-4f * i), 0.9 - 1e-6 * i)
    } :+ ((9, 99L, Array(0.0f, 1.0f, 0.0f), 0.1))
    val got = Mmr.rerankGrouped(rows.toDF("g", "id", "v", "rel"),
        "g", "id", "v", "rel", k = 3, m = 12)
      .as[(Int, Long, Long)].collect().map(_._3).toSet
    assert(!got.contains(99L), s"out-of-pool candidate picked: $got")
  }

  test("rerankGrouped plan: WindowGroupLimit pool cap, and no " +
      "exchange after the groupBy (the greedy is pure projection)") {
    val fx = groupedFixture
    val plan = Mmr.rerankGrouped(fx, "g", "id", "v", "rel",
      k = 3, m = 8).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
    // exchanges: one for the window cap's partitioning; the groupBy
    // reuses it (same key). The greedy itself must add NONE.
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n${plan.take(1500)}")
  }
}
