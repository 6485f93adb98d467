package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** DSIR importance resampling: target-lookalike docs must outrank
  * off-distribution docs, weights must be bucket-hash stable, and the
  * smoothing must keep unseen features finite. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  test("docs matching the target distribution rank first; smoothing " +
      "keeps target-unseen features finite") {
    val target = Seq((100L, "alpha beta alpha beta alpha beta"),
      (101L, "alpha beta gamma alpha beta"))
      .toDF("id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta"),      // pure target-style
      (2L, "alpha beta noise1 noise2"),   // half
      (3L, "noise1 noise2 noise3 noise4") // none: every bigram unseen
    ).toDF("id", "text")
    val w = Dsir.importanceWeights(raw, "id", "text", target,
        buckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("weight")).toMap
    assert(w.size == 3 && w.values.forall(v => !v.isNaN && !v.isInfinite))
    assert(w(1L) > w(2L) && w(2L) > w(3L))
    // topK rank mirrors the weight order
    val ranked = Dsir.topK(raw, "id", "text", target, 64, 3)
      .orderBy(col("rk")).select(col("doc_id")).as[Long].collect().toSeq
    assert(ranked == Seq(1L, 2L, 3L))
  }

  test("bucket hashing is deterministic and bounded") {
    val b = spark.range(1000)
      .select(Dsir.bucketOf(concat(lit("g"), col("id")), 256).as("b"))
      .agg(min(col("b")), max(col("b"))).head()
    assert(b.getInt(0) >= 0 && b.getInt(1) < 256)
  }

  test("fixture corpus: en-target weights score en docs above the " +
      "other languages on average") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      docs.filter(col("lang") === "en"), buckets = 256)
    val scored = docs.select(col("doc_id"), col("lang"))
      .join(w, Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("weight")).as("mean_w"))
      .collect().map(r => r.getBoolean(0) -> r.getAs[Double]("mean_w"))
      .toMap
    assert(scored(true) > scored(false))
  }
}
