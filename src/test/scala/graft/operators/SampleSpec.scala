package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SampleSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)

  test("stratified sample is exact-count per stratum, deterministic, " +
      "and independent of the input partitioning") {
    val s1 = Sample.stratified(docs, Seq("lang"), "doc_id", 20)
    val perLang = s1.groupBy($"lang").count().as[(String, Long)]
      .collect().toMap
    val corpus = docs.groupBy($"lang").count().as[(String, Long)]
      .collect().toMap
    corpus.foreach { case (lang, n) =>
      assert(perLang(lang) == math.min(n, 20L))
    }
    // re-run and repartitioned run pick the SAME rows (df.sample would not)
    val ids1 = s1.select($"doc_id").as[Long].collect().toSet
    val ids2 = Sample.stratified(docs.repartition(7), Seq("lang"),
      "doc_id", 20).select($"doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // rank thins without resampling: rank<=5 is a prefix of rank<=20
    val top5 = Sample.stratified(docs, Seq("lang"), "doc_id", 5)
      .select($"doc_id").as[Long].collect().toSet
    val top5via20 = s1.filter($"rank" <= 5)
      .select($"doc_id").as[Long].collect().toSet
    assert(top5 == top5via20)
  }

  test("deterministic fraction keeps ~rate of rows, the same rows " +
      "every time, and nests (10% sample is a subset of the 50% one)") {
    val n = docs.count().toDouble
    val s10 = Sample.deterministicFraction(docs, "doc_id", 0.1)
      .select($"doc_id").as[Long].collect().toSet
    val s50 = Sample.deterministicFraction(docs, "doc_id", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(math.abs(s10.size / n - 0.1) < 0.05, s"10% -> ${s10.size}/$n")
    assert(math.abs(s50.size / n - 0.5) < 0.08, s"50% -> ${s50.size}/$n")
    assert(s10.subsetOf(s50)) // thresholds nest
    val again = Sample.deterministicFraction(docs.repartition(5),
      "doc_id", 0.1).select($"doc_id").as[Long].collect().toSet
    assert(again == s10)
    assert(Sample.deterministicFraction(docs, "doc_id", 0.0).count() == 0)
    assert(Sample.deterministicFraction(docs, "doc_id", 1.0).count()
      == n.toLong)
  }
}
