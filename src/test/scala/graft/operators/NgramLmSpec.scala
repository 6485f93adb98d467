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
