package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtering (PPJoin/AllPairs) and sparse count-cosine join
  * properties: both candidate generators must be EXACT — identical
  * output to the brute-force all-pairs joins they replace — because
  * their gates (q145/q146) oracle against all-pairs SQL.
  */
class PrefixJoinSpec extends SparkSuite {
  import spark.implicits._

  // small corpus with planted threshold-straddling pairs: originals
  // plus 3/4-token-prefix twins (the q145 fixture shape)
  private lazy val corpus: DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 150)
    docs.select($"doc_id", $"text").unionByName(
      docs.select(($"doc_id" + 20000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, greatest(1, " +
          "cast((3 * size(split(text, ' '))) div 4 as int))), ' ')")
          .as("text")))
  }

  private def pairKey(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select($"id_a", $"id_b", $"common", $"na", $"nb")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def brute(tNum: Int, tDen: Int): Set[(Long, Long, Long, Long, Long)] =
    pairKey(Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        n = 3, minJaccard = 0.0)
      .filter(lit(tDen) * $"common" >=
        lit(tNum) * ($"na" + $"nb" - $"common")))

  test("ppjoinPairs == brute-force all-pairs at every threshold " +
      "(the prefix lemma is an inequality, not a coin flip)") {
    for ((tn, td) <- Seq((1, 2), (3, 5), (4, 5))) {
      val got = pairKey(PrefixJoin.ppjoinPairs(corpus, "text", "doc_id",
        n = 3, tNum = tn, tDen = td))
      val exp = brute(tn, td)
      assert(got == exp, s"threshold $tn/$td: ppjoin ${got.size} vs " +
        s"brute ${exp.size}; diff=${(got diff exp) ++ (exp diff got)}")
      assert(exp.nonEmpty, s"threshold $tn/$td has no pairs — fixture " +
        "lost its planted twins, test is vacuous")
    }
  }

  test("ppjoinPairs: higher threshold is a subset (monotone cut)") {
    val lo = pairKey(PrefixJoin.ppjoinPairs(corpus, "text", "doc_id",
      n = 3, tNum = 1, tDen = 2))
    val hi = pairKey(PrefixJoin.ppjoinPairs(corpus, "text", "doc_id",
      n = 3, tNum = 4, tDen = 5))
    assert(hi.subsetOf(lo))
    assert(hi.size < lo.size, "4/5 cut not load-bearing on fixture")
  }

  test("ppjoinPairs: short docs (no shingles) contribute nothing and " +
      "never crash") {
    val tiny = Seq((1L, "one two"), (2L, "one"), (3L, "")).toDF(
      "doc_id", "text")
    assert(PrefixJoin.ppjoinPairs(tiny, "text", "doc_id", n = 3,
      tNum = 1, tDen = 2).count() == 0)
  }

  // ---- SparseSim ----

  /** Brute-force count-cosine pairs via the test's own posting join. */
  private def bruteCosine(c: DataFrame, tNum: Int, tDen: Int,
      maxDf: Int): Set[(Long, Long, Long)] = {
    val p = c.select(col("doc_id").as("id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 3))
          .as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
    val nrm = p.groupBy("id").agg(sum($"cnt" * $"cnt").as("n2"))
    val rare = p.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDf).select("gram")
    val cand = p.join(rare, Seq("gram"))
      .select($"id".as("id_a"), $"gram")
      .join(p.join(rare, Seq("gram")).select($"id".as("id_b"), $"gram"),
        Seq("gram"))
      .filter($"id_a" < $"id_b").select("id_a", "id_b").distinct()
    cand
      .join(p.select($"id".as("id_a"), $"gram", $"cnt".as("ca")), Seq("id_a"))
      .join(p.select($"id".as("id_b"), $"gram", $"cnt".as("cb")),
        Seq("id_b", "gram"))
      .groupBy("id_a", "id_b").agg(sum($"ca" * $"cb").as("dot"))
      .join(nrm.select($"id".as("id_a"), $"n2".as("na2")), Seq("id_a"))
      .join(nrm.select($"id".as("id_b"), $"n2".as("nb2")), Seq("id_b"))
      .filter(lit(tDen.toLong * tDen) * $"dot" * $"dot" >=
        lit(tNum.toLong * tNum) * $"na2" * $"nb2")
      .select($"id_a", $"id_b", $"dot")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("countCosinePairs: cap drops candidate generation only — " +
      "output == the capped-candidates brute force, and a binding cap " +
      "on this corpus equals the UNCAPPED join (rerank is exact)") {
    val un = bruteCosine(corpus, 9, 10, Int.MaxValue)
    val gotUncapped = SparseSim.countCosinePairs(corpus, "text",
        "doc_id", n = 3, tNum = 9, tDen = 10, maxDf = Int.MaxValue)
      .select($"id_a", $"id_b", $"dot").as[(Long, Long, Long)]
      .collect().toSet
    assert(gotUncapped == un)
    assert(un.nonEmpty, "fixture lost its planted twins")
    val gotCapped = SparseSim.countCosinePairs(corpus, "text",
        "doc_id", n = 3, tNum = 9, tDen = 10, maxDf = 8)
      .select($"id_a", $"id_b", $"dot").as[(Long, Long, Long)]
      .collect().toSet
    assert(gotCapped == bruteCosine(corpus, 9, 10, 8))
    assert(gotCapped == un,
      "maxDf=8 dropped a qualifying pair on this corpus — every " +
        "qualifying pair should share at least one rare gram")
  }

  test("countCosinePairs: an exact copy scores cos == 1 exactly " +
      "(dot² == na2·nb2 in integers)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 50)
    val c = docs.select($"doc_id", $"text").unionByName(
      docs.select(($"doc_id" + 500L).as("doc_id"), $"text"))
    val copies = SparseSim.countCosinePairs(c, "text", "doc_id",
        n = 3, tNum = 1, tDen = 1)
      .filter($"id_b" - $"id_a" === 500L)
    assert(copies.count() == 50)
    assert(copies.filter($"dot" * $"dot" =!= $"na2" * $"nb2")
      .count() == 0)
    // the reported double is dot/(sqrt(n2)·sqrt(n2)) — sqrt(x)² is not
    // exactly x in floats, so only the INTEGER identity is exact
    assert(copies.filter(abs($"cos" - 1.0) > 1e-12).count() == 0)
  }
}
