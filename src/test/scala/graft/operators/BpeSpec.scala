package graft.operators

import graft.SparkSuite

/** BPE merge-apply semantics: rank order, left-to-right non-overlap,
  * multi-char chaining — the contracts the q149 oracle replays. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def bpeOf(text: String,
      merges: Seq[(String, String)]): (String, Long) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = Bpe.applyMerges(df, "doc_id", "text", merges)
      .select($"bpe", $"n_sym").as[(String, Long)].collect()
    r.head
  }

  test("left-to-right non-overlap: aaa + (a,a) -> 'aa a', never 'a aa'") {
    assert(bpeOf("aaa", Seq("a" -> "a"))._1 == "aa a")
    assert(bpeOf("aaaa", Seq("a" -> "a"))._1 == "aa aa")
    assert(bpeOf("aaaaa", Seq("a" -> "a"))._1 == "aa aa a")
  }

  test("rank order matters: (a,b) before (b,c) consumes the b") {
    assert(bpeOf("abc", Seq("a" -> "b", "b" -> "c"))._1 == "ab c")
    assert(bpeOf("abc", Seq("b" -> "c", "a" -> "b"))._1 == "a bc")
  }

  test("multi-char chaining: a+b then ab+c builds abc") {
    assert(bpeOf("abcd", Seq("a" -> "b", "ab" -> "c"))._1 == "abc d")
  }

  test("a merged symbol cannot re-match its own left side in the " +
      "same pass") {
    // (a,ab) could only fire if a prior ab existed BEFORE this pass
    assert(bpeOf("aab", Seq("a" -> "b", "a" -> "ab"))._1 == "aab")
  }

  test("single-char and untouched words survive; n_sym counts pieces") {
    val (b, n) = bpeOf("a xyz ab", Seq("a" -> "b"))
    assert(b == "a | x y z | ab")
    assert(n == 5)
  }

  test("pairStats counts within words only, never across the space") {
    val df = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val got = Bpe.pairStats(df, "text", 10)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "a", 1L)))
  }
}
