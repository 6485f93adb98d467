package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("gopherFunnel fires each rule on a targeted doc, reasons keep " +
      "their fixed order, and the funnel is total on degenerate docs") {
    val docs = Seq(
      // clean: 6 tokens ≥ minTokens(5), avg len in [3,10]·, 2 stopwords
      (1L, "the cat sat upon the mat"),
      // too_short (< 5 tokens): 2 stopwords and avg word length 3.25
      // keep the other rules quiet — except repetition, which ANY
      // ≤4-token doc trips at a 50% cap (top2 ≥ 1 → 200 ≥ n·50)
      (2L, "the of cats dogs"),
      // too_long (> 12 tokens), all 2-grams distinct, 2 stopwords
      (3L, "the of " + (1 to 11).map(i => s"tok$i").mkString(" ")),
      (4L, "the of aa bb cc dd"),         // word_len: avg 2.0 < 3.0
      (5L, "alpha bravo charlie delta echo"), // stopwords: 0 hits
      (6L, "the end the end the end"),    // repetition: 'the end' 3×2/6 = 100%
      (7L, ""))                           // 1 empty token: several rules
    val got = Curation.gopherFunnel(docs.toDF("doc_id", "text"),
        "doc_id", "text",
        minTokens = 5, maxTokens = 12, minAvgWordLenX10 = 30,
        maxAvgWordLenX10 = 100, minStopwords = 2, maxTop2Pct = 50)
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 7) // total: every doc verdicted exactly once
    assert(got(1L)._2 == "" && got(1L)._3)
    assert(got(2L)._2 == "too_short,repetition" && !got(2L)._3)
    assert(got(3L)._2 == "too_long")
    assert(got(4L)._2.contains("word_len"))
    assert(got(5L)._2 == "stopwords")
    assert(got(6L)._2.contains("repetition"))
    // fixed emission order regardless of which rules fire; the empty
    // doc has NO 2-gram → top2 coalesces to 0 → repetition stays quiet
    assert(got(7L)._2 == "too_short,word_len,stopwords")
    // brute-force cross-check of the word_len rule on doc 4:
    // chars=12, n=6 → 12·10 < 6·30
    assert(12 * 10 < 6 * 30)
  }

  test("the funnel is one stateless projection: zero exchanges in the " +
      "plan, and it runs unchanged on a stream (stream == batch)") {
    val docs = Seq(
      (1L, "the cat sat upon the mat today fine"),
      (2L, "spam spam spam spam"),
      (3L, "alpha beta"))
    val plan = Curation.gopherFunnel(docs.toDF("doc_id", "text"),
        "doc_id", "text", minTokens = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc verdicts must not shuffle:\n$plan")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Curation.gopherFunnel(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", minTokens = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      input.addData(docs.take(1): _*)
      q.processAllAvailable()
      input.addData(docs.drop(1): _*)
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .as[(Long, Long, String, Boolean)].collect().toSet
      val batch = Curation.gopherFunnel(docs.toDF("doc_id", "text"),
          "doc_id", "text", minTokens = 3)
        .as[(Long, Long, String, Boolean)].collect().toSet
      assert(got == batch) // verdict-on-ingest == batch, bit-for-bit
    } finally q.stop()
  }

  test("boilerplateNgrams counts DOCUMENT frequency (within-doc " +
      "repeats count once), applies the df floor, and plans the top-k " +
      "as a TakeOrdered heap") {
    val docs = Seq(
      (1L, "buy now buy now buy now"), // 'buy now' 3x within ONE doc
      (2L, "buy now and more stuff"),
      (3L, "and more is here"),
      (4L, "all unique words four"))
    val got = Curation.boilerplateNgrams(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 2, k = 10, minDf = 2)
      .as[(String, Long)].collect().toMap
    // df('buy now') = 2 DOCS (not 4 instances); 'and more' = 2;
    // everything else df 1 → floored out
    assert(got == Map("buy now" -> 2L, "and more" -> 2L,
      "now buy" -> 1L).filter(_._2 >= 2))
    val plan = Curation.boilerplateNgrams(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 2, k = 10, minDf = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("verdicts are partitioning-independent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val a = Curation.gopherFunnel(docs, "doc_id", "text",
        minTokens = 30, maxTokens = 90)
      .as[(Long, Long, String, Boolean)].collect().toSet
    val b = Curation.gopherFunnel(docs.repartition(7), "doc_id", "text",
        minTokens = 30, maxTokens = 90)
      .as[(Long, Long, String, Boolean)].collect().toSet
    assert(a == b)
    assert(a.exists(!_._4) && a.exists(_._4)) // non-trivial split
  }
}
