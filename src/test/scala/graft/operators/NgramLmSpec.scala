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

  test("Kneser-Ney: scoreDocsKn matches a driver replay of the " +
      "interpolation formula on every document, and the salad still " +
      "ranks worst") {
    val texts = corpus.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    // driver-side KN stats over distinct bigrams
    val grams = texts.flatMap { case (id, t) =>
      val a = t.split(" ", -1); a.indices.dropRight(1)
        .map(i => (id, a(i) + " " + a(i + 1))) }
    val c12 = grams.map(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val w1 = c12.toSeq.groupBy(_._1.split(" ")(0)).map { case (w, gs) =>
      w -> (gs.map(_._2).sum, gs.size.toLong) } // (c1, n1w)
    val cont = c12.keys.toSeq.groupBy(_.split(" ")(1))
      .view.mapValues(_.size.toLong).toMap
    val nb = c12.size.toDouble
    def pKn(g: String): Double = {
      val (c1, n1w) = w1(g.split(" ")(0))
      val t1 = math.max(4 * c12(g) - 3, 0).toDouble / (4 * c1).toDouble
      val t2 = (3.0 * n1w * cont(g.split(" ")(1))) / ((4 * c1) * nb)
      t1 + t2
    }
    val exp = grams.groupBy(_._1).map { case (id, gs) =>
      id -> gs.map(g => math.log(pKn(g._2))).sum / gs.length }
    val lmF = NgramLm.kneserNeyLm(corpus, "text")
    val got = NgramLm.scoreDocsKn(corpus, "doc_id", "text", lmF,
        NgramLm.knContinuation(lmF), NgramLm.knTotals(lmF))
      .as[(Long, Long, Double)].collect()
    got.foreach { case (id, n, lp) =>
      assert(math.abs(lp - exp(id)) < 1e-12, s"doc $id: $lp vs ${exp(id)}")
    }
    assert(NgramLm.worstKKn(corpus, "doc_id", "text", 1)
      .head().getLong(0) == 5L)
    // per-w1 probabilities sum to 1 (the KN normalization identity:
    // Σ_w2 P(w2|w1) = 1 when every continuation is in-vocab)
    w1.keys.foreach { w =>
      // .toSeq before map: keys is a Set, and equal probabilities
      // (symmetric grams) would collapse before the sum
      val mass = c12.keys.toSeq.filter(_.startsWith(w + " "))
        .map(pKn).sum +
        // unseen-continuation mass: D/c1·N1w · Σ_{w2 not after w1} Pcont
        (3.0 * w1(w)._2 / (4.0 * w1(w)._1)) *
          cont.filter { case (w2, _) =>
            !c12.contains(w + " " + w2) }.values.sum / nb
      assert(math.abs(mass - 1.0) < 1e-9, s"w1=$w mass $mass")
    }
  }

  test("trigram Kneser-Ney: scoreDocsKn3 == driver replay on every " +
      "document; normalization Σ_w3 P = 1 holds level by level; " +
      "salad worst; every backoff branch exact") {
    val texts = corpus.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val tris = texts.flatMap { case (id, t) =>
      val a = t.split(" ", -1)
      (0 to a.length - 3).map(i => (id, (a(i), a(i + 1), a(i + 2)))) }
    val c123 = tris.map(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val hist = c123.toSeq.groupBy(t => (t._1._1, t._1._2))
      .map { case (h, gs) => h -> (gs.map(_._2).sum, gs.size.toLong) }
    // continuation-bigram table B': distinct (w2,w3), nc23 = # distinct w1
    val bp = c123.keys.toSeq.groupBy(t => (t._2, t._3))
      .view.mapValues(_.size.toLong).toMap
    val mid = bp.toSeq.groupBy(_._1._1).map { case (w2, gs) =>
      w2 -> (gs.map(_._2).sum, gs.size.toLong) } // (nmid2, ntypes2)
    val uni = bp.keys.toSeq.groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val nbv = bp.size.toDouble
    def pu(w3: String) = uni.get(w3)
      .map(n => n.toDouble / nbv).getOrElse(1.0 / (4.0 * nbv))
    def pbi(w2: String, w3: String): Double = mid.get(w2) match {
      case None => pu(w3)
      case Some((nmid2, ntypes2)) =>
        val t1 = bp.get((w2, w3)).map(nc =>
          math.max(4 * nc - 3, 0).toDouble / (4 * nmid2).toDouble)
          .getOrElse(0.0)
        t1 + (3.0 * ntypes2 * pu(w3)) / (4 * nmid2).toDouble
    }
    def p(w1: String, w2: String, w3: String): Double =
      hist.get((w1, w2)) match {
        case None => pbi(w2, w3)
        case Some((c12dot, n1w12)) =>
          val t1 = c123.get((w1, w2, w3)).map(c =>
            math.max(4 * c - 3, 0).toDouble / (4 * c12dot).toDouble)
            .getOrElse(0.0)
          t1 + (3.0 * n1w12 * pbi(w2, w3)) / (4 * c12dot).toDouble
      }
    val exp = tris.groupBy(_._1).map { case (id, gs) =>
      id -> gs.map(g => math.log(p(g._2._1, g._2._2, g._2._3))).sum /
        gs.length }
    val got = NgramLm.scoreDocsKn3(corpus, "doc_id", "text", corpus)
      .as[(Long, Long, Double)].collect()
    assert(got.length == exp.size)
    got.foreach { case (id, n, lp) =>
      assert(n == tris.count(_._1 == id).toLong)
      assert(math.abs(lp - exp(id)) < 1e-12, s"doc $id: $lp vs ${exp(id)}")
    }
    assert(NgramLm.worstKKn3(corpus, "doc_id", "text", 1)
      .head().getLong(0) == 5L)
    // normalization over the continuation vocab, level by level —
    // this is WHY the middle-level stats must come from the trigram
    // table (raw bigram counts break it); keys.toSeq before map (the
    // r12 Set-dedup lesson)
    val vocab = uni.keys.toSeq
    assert(math.abs(vocab.map(pu).sum - 1.0) < 1e-9)
    mid.keys.foreach { w2 =>
      val mass = vocab.map(w3 => pbi(w2, w3)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"w2=$w2 mass $mass") }
    hist.keys.foreach { case h @ (h1, h2) =>
      val mass = vocab.map(w3 => p(h1, h2, w3)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"hist=$h mass $mass") }
    // backoff branches, each a single-trigram probe so the score is
    // one ln with no sum — exact equality expected:
    def lp1(text: String): Double =
      NgramLm.scoreDocsKn3(Seq((99L, text)).toDF("doc_id", "text"),
        "doc_id", "text", corpus).head().getDouble(2)
    // known history, unseen trigram, unseen (w2,w3), known w2/w3
    assert(lp1("the cat dog") == math.log(p("the", "cat", "dog")))
    assert(p("the", "cat", "dog") ==
      (3.0 * hist(("the", "cat"))._2 * pbi("cat", "dog")) /
        (4 * hist(("the", "cat"))._1).toDouble)
    // unseen history, known (w2,w3) -> pure middle backoff
    assert(lp1("mat cat sat") == math.log(pbi("cat", "sat")))
    // fully alien -> the uniform floor one level down
    assert(lp1("zig zag zog") == math.log(1.0 / (4.0 * nbv)))
  }

  test("Kneser-Ney OOV contract: unseen gram with a known w1 backs " +
      "off to the continuation term alone; unseen w1 or w2 hits the " +
      "uniform floor 1/(4*NB) exactly") {
    val lm = NgramLm.kneserNeyLm(corpus, "text")
    val cont = NgramLm.knContinuation(lm)
    val tot = NgramLm.knTotals(lm)
    val nb = tot.head().getLong(0).toDouble
    // "mat cat": both tokens known, gram unseen -> pure interpolation
    val known = Seq((8L, "mat cat")).toDF("doc_id", "text")
    val r1 = NgramLm.scoreDocsKn(known, "doc_id", "text", lm, cont, tot)
      .head()
    val w1Stats = lm.filter(substring_index($"gram", " ", 1) === "mat")
      .select($"c1", $"n1w").head()
    val ncontCat = cont.filter($"__w2" === "cat").head().getLong(1)
    val expP = (3.0 * w1Stats.getLong(1) * ncontCat) /
      ((4 * w1Stats.getLong(0)) * nb)
    assert(r1.getDouble(2) == math.log(expP))
    // fully alien tokens -> the uniform continuation floor
    val alien = Seq((9L, "zig zag")).toDF("doc_id", "text")
    val r2 = NgramLm.scoreDocsKn(alien, "doc_id", "text", lm, cont, tot)
      .head()
    assert(r2.getDouble(2) == math.log(1.0 / (4.0 * nb)))
  }
}
