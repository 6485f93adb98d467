package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Count-min sketch: the deterministic overestimate contract. */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val items = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select(explode(split($"text", " ")).as("token"))

  test("estimate >= exact count for EVERY key, with equality for " +
      "most keys at a generous width") {
    val exact = items.groupBy($"token").agg(count(lit(1)).as("n"))
    val mat = Sketch.countMinMatrix(items, "token", d = 4, w = 4096)
    val joined = Sketch.countMinEstimates(mat, exact, "token", 4, 4096)
      .join(exact, $"key" === $"token")
      .select($"n", $"est").as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    assert(joined.forall { case (n, est) => est >= n },
      "count-min must never underestimate")
    val tight = joined.count { case (n, est) => est == n }
    assert(tight * 2 > joined.length,
      s"only $tight/${joined.length} exact at w=4096 — hashing broken?")
  }

  test("narrow sketch genuinely collides (est > exact somewhere) " +
      "and row totals conserve instance count") {
    val exact = items.groupBy($"token").agg(count(lit(1)).as("n"))
    val mat = Sketch.countMinMatrix(items, "token", d = 2, w = 32)
    val over = Sketch.countMinEstimates(mat, exact, "token", 2, 32)
      .join(exact, $"key" === $"token")
      .filter($"est" > $"n").count()
    assert(over > 0, "w=32 should collide on this corpus")
    val total = items.count()
    val rowTotals = mat.groupBy($"r").agg(sum($"c").as("s"))
      .select($"s").as[Long].collect()
    assert(rowTotals.length == 2 && rowTotals.forall(_ == total),
      "every sketch row must count every instance exactly once")
  }

  test("mergeMatrices(shards) == matrix(union) bit-exactly — the " +
      "property that makes the sketch distributed") {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def toks(df: DataFrame) =
      df.select(explode(split($"text", " ")).as("token"))
    val full = Sketch.countMinMatrix(toks(docs), "token", 4, 128)
      .as[(Int, Int, Long)].collect().toSet
    val merged = Sketch.mergeMatrices(Seq(
        Sketch.countMinMatrix(toks(docs.filter($"doc_id" % 3 === 0)),
          "token", 4, 128),
        Sketch.countMinMatrix(toks(docs.filter($"doc_id" % 3 === 1)),
          "token", 4, 128),
        Sketch.countMinMatrix(toks(docs.filter($"doc_id" % 3 === 2)),
          "token", 4, 128)))
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == full)
  }

  test("absent keys estimate from whatever occupies their buckets — " +
      "never negative, zero on an empty matrix") {
    val mat = Sketch.countMinMatrix(items.limit(0), "token", 4, 64)
    val probes = Seq("zzz", "qqq").toDF("token")
    val got = Sketch.countMinEstimates(mat, probes, "token", 4, 64)
      .select($"est").as[Long].collect()
    assert(got.toSeq == Seq(0L, 0L))
  }
}
