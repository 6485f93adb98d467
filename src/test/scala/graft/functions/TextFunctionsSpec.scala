package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii($"t").as("r"))
      .as[String].head()

  test("redactPii masks emails, phones, and long digit runs") {
    assert(redact("mail bob.smith+x@corp.example.org now")
      == "mail [EMAIL] now")
    assert(redact("call 555-0199 or 023-456-7890 today")
      == "call [PHONE] or [PHONE] today")
    assert(redact("ssn-ish 123456789 here") == "ssn-ish [NUM] here")
    // order: the email mask runs first (it would otherwise lose its
    // digits to [NUM]); a 6+ digit run after a dash is not phone-shaped
    // (\b fails mid-run) and falls through to the generic mask
    assert(redact("a@b.co 555-123456 9999999")
      == "[EMAIL] 555-[NUM] [NUM]")
  }

  test("chunkTokens covers every token with the right overlap and a " +
      "ragged last chunk; short docs yield one chunk") {
    def chunks(s: String, w: Int, st: Int): Seq[String] =
      Seq(s).toDF("t")
        .select(TextFunctions.chunkTokens($"t", w, st).as("c"))
        .as[Seq[String]].head()
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    // window 4, stride 2 over 10 tokens → starts 0,2,4,6,8
    val c = chunks(doc, 4, 2)
    assert(c == Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8",
      "t7 t8 t9 t10", "t9 t10"))
    // every token appears; consecutive chunks overlap by window-stride
    assert(c.flatMap(_.split(' ')).toSet == doc.split(' ').toSet)
    assert(chunks("a b", 128, 64) == Seq("a b")) // short doc: one chunk
    assert(chunks("solo", 4, 4) == Seq("solo"))
    intercept[IllegalArgumentException] {
      chunks("a", 2, 4) // stride > window would skip tokens
    }
  }

  test("native positionalShingles/chunkTokens match the HOF builds on " +
      "messy whitespace (the tokenizer-parity hazard class)") {
    // the HOF references (what the DuckDB oracles also express): split
    // is Spark's regex split with limit -1 — trailing empties KEPT
    def hofShingles(n: Int) = {
      val toks = split($"t", " ", -1)
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }
    def hofChunks(w: Int, st: Int) = {
      val toks = split($"t", " ", -1)
      transform(
        sequence(lit(0L),
          floor((size(toks) - 1).cast("double") / st).cast("long")),
        i => concat_ws(" ", slice(toks, (i * st + 1).cast("int"), lit(w))))
    }
    val texts = Seq(
      "a b c d e f g", "a b", "", "solo",
      "trailing space ends here ",       // trailing empty token
      " leading", "double  space  gap",  // interior empty tokens
      "x " * 40 + "y")                   // long + trailing
    val df = texts.toDF("t").cache()
    for (n <- Seq(2, 3, 5)) {
      val got = df.select(
        TextFunctions.positionalShingles($"t", n).as("a"),
        hofShingles(n).as("b")).as[(Seq[String], Seq[String])].collect()
      got.zip(texts).foreach { case ((a, b), t) =>
        assert(a == b, s"n=$n text='$t'") }
    }
    for ((w, st) <- Seq((4, 2), (128, 64), (3, 3))) {
      val got = df.select(
        TextFunctions.chunkTokens($"t", w, st).as("a"),
        hofChunks(w, st).as("b")).as[(Seq[String], Seq[String])].collect()
      got.zip(texts).foreach { case ((a, b), t) =>
        assert(a == b, s"w=$w st=$st text='$t'") }
    }
    df.unpersist()
  }

  test("redactPii leaves non-PII digits and words alone") {
    assert(redact("ext 42 and room 9f") == "ext 42 and room 9f")
    assert(redact("v1.2.3 build 12345") == "v1.2.3 build 12345")
    assert(redact("no pii at all") == "no pii at all")
  }

  test("foldText merges case/diacritic variants to one key; raw minhash " +
      "misses what folded minhash finds (the q106 contrast)") {
    import graft.operators.Dedup
    val folded = Seq("Électricité", "électricité", "ELECTRICITÉ",
        "electricite", "naïve NAÏVE Naïve", "ｎｏｔ－ｎｆｋｃ")
      .toDF("t").select(TextFunctions.foldText($"t").as("f"))
      .as[String].collect()
    assert(folded.take(4).toSet == Set("electricite"))
    assert(folded(4) == "naive naive naive")
    // NFKC compatibility folding (full-width forms) is deliberately
    // out of scope — no DuckDB surface to oracle it against
    assert(folded(5) == "ｎｏｔ－ｎｆｋｃ")
    // contrast on a twin corpus: accented/upper twins are byte-disjoint
    // at every shingle, so RAW minhash finds zero cross pairs while the
    // folded key scores each twin pair jaccard 1.0
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val twins = base.select(($"doc_id" + 10000000L).as("doc_id"),
      upper(translate($"text", "aeiou", "áéíóú"))
        .as("text"))
    val corpus = base.unionByName(twins)
    val raw = Dedup.minhashLshPairs(corpus, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.5)
      .filter($"id_b" >= 10000000L && $"id_a" === $"id_b" - 10000000L)
    assert(raw.count() == 0)
    val fold = Dedup.minhashLshPairs(
        corpus.withColumn("__f", TextFunctions.foldText($"text")),
        "__f", "doc_id", n = 3, k = 64, bands = 32, minJaccard = 0.5)
      .filter($"id_b" >= 10000000L && $"id_a" === $"id_b" - 10000000L)
    val foldPairs = fold.select($"id_a", $"jac")
      .as[(Long, Double)].collect()
    assert(foldPairs.length == 50)
    assert(foldPairs.forall(_._2 == 1.0))
  }

  test("cleanLines keeps prose, drops blocklisted and short lines " +
      "(case-insensitive substring), and rejects non-lowercase " +
      "blocklists") {
    def clean(text: String): String =
      Seq(text).toDF("t").select(TextFunctions.cleanLines($"t", 4,
        Seq("javascript", "cookie")).as("c")).as[String].head()
    assert(clean("real prose with enough words\n" +
      "please enable JavaScript now\n" +
      "We use Cookies accept our policy\n" +
      "read more\n" +
      "another honest closing sentence here")
      == "real prose with enough words\nanother honest closing sentence here")
    assert(clean("all lines are boilerplate here about javascript") == "")
    assert(clean("one two three") == "") // under the word floor
    intercept[IllegalArgumentException] {
      clean("x"); Seq("x").toDF("t")
        .select(TextFunctions.cleanLines($"t", 4, Seq("JavaScript")))
    }
  }

  /** Scala reference of the winnowing contract (WinnowFingerprints
    * scaladoc): 52-bit md5 gram hashes, rightmost-min per w-window,
    * short tails as one window, distinct selections. */
  private def winnowRef(text: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h52(s: String): Long = {
      md.reset()
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    val toks = text.split(" ", -1)
    val hs = toks.sliding(k).filter(_.size == k)
      .map(g => h52(g.mkString(" "))).toArray
    if (hs.isEmpty) Seq.empty
    else {
      val sels = (0 until math.max(hs.length - w + 1, 1)).map { s =>
        val end = math.min(s + w, hs.length)
        val minv = (s until end).map(hs).min
        val mi = (s until end).filter(i => hs(i) == minv).max // rightmost
        (mi, hs(mi))
      }
      sels.distinct
    }
  }

  test("winnowFingerprints matches the scala reference on every fixture " +
      "doc and honours the (w+k-1)-token coverage guarantee") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = docs.map { case (id, t) => id -> winnowRef(t, 4, 5) }.toMap
    val spark_ = docs.toDF("doc_id", "text")
      .select($"doc_id",
        TextFunctions.winnowFingerprints($"text", 4, 5).as("f"))
      .as[(Long, Seq[(Int, Long)])].collect().toMap
    assert(docs.forall { case (id, _) => spark_(id) == got(id) })
    // density: the paper promises ~2/(w+1) of grams selected
    val nGrams = docs.map(_._2.split(" ", -1).length - 3).filter(_ > 0).sum
    val nFps = spark_.values.map(_.size).sum
    assert(nFps > nGrams / 6 && nFps < nGrams * 2 / 3, s"$nFps of $nGrams")
    // guarantee: two docs sharing a w+k-1 = 8-token run share a fingerprint
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = winnowRef(s"one two $shared x y z", 4, 5).map(_._2).toSet
    val b = winnowRef(s"$shared completely different tail here", 4, 5)
      .map(_._2).toSet
    assert(a.intersect(b).nonEmpty)
  }

  test("winnowFingerprints degenerate inputs: short docs one-window, " +
      "under-k docs empty, positions strictly increasing") {
    def run(t: String): Seq[(Int, Long)] =
      Seq(t).toDF("t")
        .select(TextFunctions.winnowFingerprints($"t", 4, 5).as("f"))
        .as[Seq[(Int, Long)]].head()
    assert(run("a b c") == Seq.empty)            // fewer than k tokens
    val one = run("a b c d e f")                  // 3 grams < w -> 1 window
    assert(one.size == 1)
    assert(run("a b c d e f") == winnowRef("a b c d e f", 4, 5))
    val fixture = run(("tok " * 40).trim)         // max ties everywhere
    assert(fixture == winnowRef(("tok " * 40).trim, 4, 5))
    val doc = run((1 to 60).map(i => s"w$i").mkString(" "))
    assert(doc.map(_._1) == doc.map(_._1).distinct.sorted)
  }
}
