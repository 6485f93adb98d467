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

  /** Driver-side reference trainer: the same greedy induction in plain
    * Scala over a word-count map — an independent implementation the
    * distributed loop must match pair-for-pair. */
  private def refTrain(texts: Seq[String],
      rounds: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ")).filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to rounds if vocab.exists(_._1.size >= 2)) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ((x, y), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      out += ((x, y, n))
      vocab = vocab.map { case (syms, c) =>
        val merged = syms.tail.foldLeft(Vector(syms.head)) { (acc, t) =>
          if (acc.last == x && t == y) acc.init :+ (x + y)
          else acc :+ t
        }
        merged -> c
      }
    }
    out.toSeq
  }

  test("trainMerges matches an independent driver-side greedy trainer " +
      "pair-for-pair, including frequency-at-selection and tie order") {
    val texts = Seq(
      "the cat sat on the mat", "the bat and the cat",
      "rats eat oats", "that hat is flat", "chat that cat")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.trainMerges(df, "text", rounds = 6)
    val want = refTrain(texts, rounds = 6)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("round-k induction state == applyMerges with the first k induced " +
      "merges (the trainer/apply agreement the scaladoc promises)") {
    val texts = Seq(
      "merge the merged merges", "sort the sorted sorts",
      "the the then there", "rest rested resting")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(df, "text", rounds = 5)
      .map { case (x, y, _) => (x, y) }
    for (k <- 1 until 5) {
      // After applying the first k merges with the PUBLIC apply
      // operator, merge k+1 must be the (n DESC, x, y) argmax of the
      // adjacent-pair counts over that tokenization — i.e. the
      // induction is exactly "greedy over the applied state", which is
      // what makes a trained table reproduce the trainer's state when
      // applyMerges later tokenizes the corpus. Pieces of the same
      // word pair up; " | " separates words.
      val pieces = Bpe.applyMerges(df, "doc_id", "text", merges.take(k))
        .select($"bpe").as[String].collect()
        .flatMap(_.split(" \\| ")).map(_.split(" ").toVector)
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (syms <- pieces; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + 1
      val ((bx, by), _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      assert((bx, by) == merges(k),
        s"round ${k + 1} argmax over applied state was ($bx,$by), " +
          s"trainer chose ${merges(k)}")
    }
  }
}
