package graft.operators

import graft.SparkSuite

/** Association-mining semantics: document support counts duplicates
  * once; source overlap is set-level, not instance-level. */
class AssocSpec extends SparkSuite {
  import spark.implicits._

  test("tokenPairSupport counts a pair once per document regardless " +
      "of repetition, orders (n DESC, x, y), and applies the floor") {
    val docs = Seq(
      (1L, "a b a b c"),  // pairs {a,b},{a,c},{b,c}
      (2L, "a b"),        // {a,b}
      (3L, "a c"),        // {a,c}
      (4L, "z q"))        // below support
    val got = Assoc.tokenPairSupport(docs.toDF("doc_id", "text"),
        "doc_id", "text", minSupport = 2L, k = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L), ("a", "c", 2L)))
  }

  test("sourceOverlap is set-level: a shingle repeated across many " +
      "docs of one source counts once; jaccard uses set sizes") {
    val docs = Seq(
      ("s1", "a b c d"), ("s1", "a b c e"),   // s1 sets: {abc,bcd,bce}
      ("s2", "a b c x"), ("s2", "a b c x"))   // s2: {abc,bcx}
    val got = Assoc.sourceOverlap(docs.toDF("source", "text"),
        "source", "text", n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (a, b, common, na, nb, jac) = got.head
    assert((a, b, common, na, nb) == (("s1", "s2", 1L, 3L, 2L)))
    assert(math.abs(jac - 0.25) < 1e-15)
  }
}
