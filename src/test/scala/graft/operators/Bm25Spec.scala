package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSuite {
  import spark.implicits._

  test("bm25 ranks term-dense docs first and respects tf saturation") {
    val docs = Seq(
      (0L, "spark spark spark spark spark pad pad pad pad pad"),
      (1L, "spark query pad pad pad pad pad pad pad pad"),
      (2L, "pad pad pad pad pad pad pad pad pad pad"),
      (3L, "spark pad pad pad pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val scores = Bm25.scores(docs, "text", "doc_id", Seq("spark", "query"))
      .as[(Long, Double)].collect().toMap
    // two matching terms beat one even against 5x tf (idf of the rarer
    // term + k1 saturation), and any match beats none
    assert(scores(1) > scores(0), s"$scores")
    assert(scores(0) > scores(3), s"$scores")
    assert(scores(2) == 0.0, s"$scores")
    val top = Bm25.topK(docs, "text", "doc_id", Seq("spark", "query"), 3)
      .as[(Long, Long)].collect().toSeq
    assert(top == Seq((1L, 1L), (0L, 2L), (3L, 3L)))
  }

  test("bm25 over the fixture corpus: every doc scored once, " +
      "rank is dense and id-tiebroken") {
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val scored = Bm25.scores(docs, "text", "doc_id",
      Seq("spark", "query", "vector"))
    assert(scored.count() == n)
    val top = Bm25.topK(docs, "text", "doc_id",
      Seq("spark", "query", "vector"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(top.map(_._2) == (1L to 10L))
  }
}
