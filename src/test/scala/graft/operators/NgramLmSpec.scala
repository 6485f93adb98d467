package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity properties: junk detection, the Laplace
  * floor for fully-OOV documents, and the per-doc bigram accounting.
  */
class NgramLmSpec extends SparkSuite {
  import spark.implicits._

  // a tiny "fluent" corpus: repeated natural transitions, plus one
  // word-salad document built from the same vocabulary (every bigram
  // transition rare) — the thing the perplexity filter exists to catch
  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat and the dog sat on the rug"),
    (2L, "the dog sat on the mat and the cat sat on the rug"),
    (3L, "the cat sat on the rug and the dog sat on the mat"),
    (4L, "the dog sat on the rug and the cat sat on the mat"),
    (5L, "rug the on mat dog and sat cat the on the sat the")
  ).toDF("doc_id", "text")

  test("word salad over the same vocabulary ranks worst") {
    val worst = NgramLm.worstK(corpus, "doc_id", "text", 1).collect()
    assert(worst.length == 1)
    assert(worst.head.getLong(0) == 5L)
    assert(worst.head.getLong(1) == 1L)
  }

  test("scoreDocs: bigram counts are per-instance, short docs drop, " +
      "and fluent docs outscore the salad") {
    val lm = NgramLm.bigramLm(corpus, "text")
    val v = NgramLm.vocabSize(corpus, "text")
    val scored = NgramLm.scoreDocs(
      corpus.union(Seq((6L, "solo")).toDF("doc_id", "text")),
      "doc_id", "text", lm, v).collect()
    assert(scored.length == 5)                  // "solo" has no bigrams
    val byId = scored.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2))).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(byId.values.forall(_._1 == 12L))     // 13 tokens -> 12 bigrams
    assert(byId(5L)._2 < Seq(1L, 2L, 3L, 4L).map(byId(_)._2).min)
  }

  test("perplexityBuckets: exact per-language terciles agreeing with " +
      "a driver-side ranked reference, partitioning-independent") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang")
    val got = NgramLm.perplexityBuckets(docs, "doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
    // reference: scoreDocs + a driver-side per-lang sort and cut
    val scored = NgramLm.scoreDocs(docs, "doc_id", "text",
        NgramLm.bigramLm(docs, "text"), NgramLm.vocabSize(docs, "text"))
      .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
      .select($"doc_id", $"lang", $"logprob")
      .as[(Long, String, Double)].collect()
    val expected = scored.groupBy(_._2).toSeq.flatMap {
      case (lang, rows) =>
        val ranked = rows.sortBy { case (id, _, lp) => (-lp, id) }
        val n = ranked.length
        ranked.zipWithIndex.map { case ((id, _, _), i) =>
          val rn = i + 1
          val bucket = if (3 * rn <= n) "head"
                       else if (3 * rn <= 2 * n) "middle" else "tail"
          (id, lang, bucket)
        }
    }.toSet
    assert(got.toSet == expected)
    // tercile sizes: each bucket within one of n/3 per language
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
      assert(sizes.values.sum == n)
      assert(sizes.getOrElse("head", 0) == n / 3, s"$lang head $sizes")
    }
    assert(NgramLm.perplexityBuckets(docs.repartition(9), "doc_id",
        "text", "lang")
      .as[(Long, String, String)].collect().toSet == got.toSet)
  }

  test("fully-OOV documents hit the Laplace floor ln(1/V) exactly") {
    val lm = NgramLm.bigramLm(corpus, "text")
    val v = NgramLm.vocabSize(corpus, "text")
    val vocab = v.head().getLong(0).toDouble
    val oov = Seq((9L, "zig zag zip zap")).toDF("doc_id", "text")
    val r = NgramLm.scoreDocs(oov, "doc_id", "text", lm, v).head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == math.log(1.0 / vocab))
  }
}
