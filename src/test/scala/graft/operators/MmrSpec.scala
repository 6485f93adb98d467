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
}
