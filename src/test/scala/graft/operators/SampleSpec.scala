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

  test("splitAssign partitions every row exactly once, deterministically, " +
      "with ~80/10/10 proportions and engine-portable hex thresholds") {
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val assigned = Sample.splitAssign(docs, "doc_id", splits)
    val n = docs.count()
    assert(assigned.count() == n) // total partition, no loss/dup
    val bydocs = assigned.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(bydocs.keySet == Set("train", "val", "test"))
    assert(math.abs(bydocs("train").toDouble / n - 0.8) < 0.1)
    // repartitioning must not move any row between splits
    val a1 = assigned.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    val a2 = Sample.splitAssign(docs.repartition(7), "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a1 == a2)
    // the q78 oracle hardcodes these threshold strings — pin them
    val th = splits.init.scanLeft(0.0)(_ + _._2).tail
      .map(c => f"${(c * 4294967296.0).toLong}%08x")
    assert(th == Seq("cccccccc", "e6666666"))
    intercept[IllegalArgumentException] {
      Sample.splitAssign(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("weightedMix applies per-stratum rates deterministically, nests " +
      "when a rate rises, and default-rates unlisted strata") {
    val mixed = Sample.weightedMix(docs, "lang", "doc_id",
      Map("en" -> 1.0, "es" -> 0.4), defaultRate = 0.0)
    val byLang = mixed.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val corpus = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(byLang("en") == corpus("en"))           // rate 1.0 keeps all
    assert(!byLang.contains("fr"))                 // default 0.0 drops
    assert(byLang("es") > 0 && byLang("es") < corpus("es"))
    // raising a rate only ADDS rows (thresholds nest)
    val es40 = mixed.filter($"lang" === "es")
      .select($"doc_id").as[Long].collect().toSet
    val es80 = Sample.weightedMix(docs, "lang", "doc_id",
        Map("es" -> 0.8), defaultRate = 0.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(es40.subsetOf(es80))
    assert(Sample.weightedMix(docs.repartition(9), "lang", "doc_id",
        Map("en" -> 1.0, "es" -> 0.4), defaultRate = 0.0)
      .select($"doc_id").as[Long].collect().toSet
      == mixed.select($"doc_id").as[Long].collect().toSet)
  }

  test("temperatureMix matches a driver-side threshold replay, keeps " +
      "the smallest stratum whole at maxRate=1, and rejects " +
      "non-dyadic alpha") {
    val corpus = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val nmin = corpus.values.min
    val got = Sample.temperatureMix(docs, "lang", "doc_id",
        alpha = 0.5, maxRate = 1.0)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    // driver replay: same md5 bucket, same sqrt-chain threshold
    val expected = docs.select($"doc_id", $"lang")
      .as[(Long, String)].collect().filter { case (id, lang) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"temp:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val u = java.lang.Long.parseLong(md5.take(8), 16)
        val lim = math.floor(1.0 *
          math.sqrt(nmin.toDouble / corpus(lang)) * 4294967296.0).toLong
        u < lim
      }
    assert(got.toSet == expected.toSet)
    // smallest stratum kept whole; bigger strata thinned toward sqrt
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    val smallest = corpus.minBy(_._2)._1
    assert(byLang(smallest) == corpus(smallest))
    val biggest = corpus.maxBy(_._2)._1
    assert(byLang(biggest) < corpus(biggest))
    // partitioning independence
    assert(Sample.temperatureMix(docs.repartition(9), "lang", "doc_id",
        alpha = 0.5, maxRate = 1.0)
      .select($"doc_id").as[Long].collect().toSet
      == got.map(_._1).toSet)
    intercept[IllegalArgumentException] {
      Sample.temperatureMix(docs, "lang", "doc_id", alpha = 0.3)
        .count()
    }
  }

  test("temperatureMix treats a NULL stratum as its own stratum (null-" +
      "safe join — rows with a missing tag are thinned by the null " +
      "group's count, never silently dropped; ADVICE r11)") {
    // null out one language's tags: those rows form the null stratum
    val tagged = docs.withColumn("lang",
      when($"lang" === "de", lit(null: String)).otherwise($"lang"))
    val nullIn = tagged.filter($"lang".isNull)
      .select($"doc_id").as[Long].collect().toSet
    assert(nullIn.nonEmpty, "fixture must have a de stratum")
    val kept = Sample.temperatureMix(tagged, "lang", "doc_id",
      alpha = 0.5, maxRate = 1.0)
    val nullKept = kept.filter($"lang".isNull)
      .select($"doc_id").as[Long].collect().toSet
    // the null group survives at its own temperature rate — same ids
    // as running the mix with the tag present (same counts, same hash)
    val reference = Sample.temperatureMix(docs, "lang", "doc_id",
        alpha = 0.5, maxRate = 1.0)
      .filter($"lang" === "de").select($"doc_id").as[Long].collect().toSet
    assert(nullKept == reference,
      s"null stratum kept ${nullKept.size} vs tagged ${reference.size}")
    // and non-null strata are untouched by the null group's presence
    assert(kept.filter($"lang" === "en").count() ==
      Sample.temperatureMix(docs, "lang", "doc_id", alpha = 0.5,
        maxRate = 1.0).filter($"lang" === "en").count())
  }

  test("composition: weightedMix then splitAssign yields non-empty " +
      "val/test inside the mixed stratum (per-decision salts make the " +
      "variates independent — r05 ADVICE pathology)") {
    // With a SHARED unsalted variate this is exactly degenerate: the
    // rows surviving an 0.8 mix are precisely the rows below the 0.8
    // split threshold, i.e. all 'train' — val and test come out EMPTY.
    val mixed = Sample.weightedMix(docs, "lang", "doc_id",
      Map("en" -> 0.8), defaultRate = 1.0)
    val splits = Sample.splitAssign(mixed, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .filter($"lang" === "en")
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(splits.getOrElse("val", 0L) > 0, s"en val empty: $splits")
    assert(splits.getOrElse("test", 0L) > 0, s"en test empty: $splits")
    // and the mix itself is independent of deterministicFraction too
    val frac = Sample.deterministicFraction(docs, "doc_id", 0.8)
      .select($"doc_id").as[Long].collect().toSet
    val mixEn = mixed.filter($"lang" === "en")
      .select($"doc_id").as[Long].collect().toSet
    assert(mixEn != frac) // distinct salts -> distinct row choices
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

  test("groupedSplitAssign never splits a duplicate group, agrees " +
      "with splitAssign on keeper ids, and is partitioning-" +
      "independent") {
    import graft.functions.TextFunctions.fingerprint
    val base = (0L until 200L).map(i => (i, s"text number ${i % 50}"))
    // 4 copies of each of 50 texts, ids interleaved
    val df = base.toDF("id", "text")
    val got = Sample.groupedSplitAssign(df, "id", fingerprint($"text"),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select($"id", $"text", $"split")
      .as[(Long, String, String)].collect()
    assert(got.length == 200)
    // leakage-safety: one split per text group
    val perGroup = got.groupBy(_._2).values
    assert(perGroup.forall(_.map(_._3).toSet.size == 1))
    // keeper semantics: group split == splitAssign of the min id
    val keeperSplit = Sample.splitAssign(
        base.groupBy(_._2).values.map(_.map(_._1).min).toSeq
          .toDF("id"), "id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .as[(Long, String)].collect().toMap
    got.foreach { case (_, text, split) =>
      val keeper = base.filter(_._2 == text).map(_._1).min
      assert(split == keeperSplit(keeper))
    }
    // partitioning independence
    val rep = Sample.groupedSplitAssign(df.repartition(7), "id",
        fingerprint($"text"),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(rep == got.map(r => r._1 -> r._3).toMap)
  }

  test("capPerKey keeps the first cap rows per key under a total " +
      "order, independent of partitioning; WindowGroupLimit in plan") {
    val rows = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("a", 4L),
      ("b", 10L), ("c", 7L), ("c", 5L)).toDF("k", "id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sample.capPerKey(df, $"k", Seq($"id"), 2)
        .select($"k", $"id").as[(String, Long)].collect().toSet
    val expect = Set(("a", 1L), ("a", 2L), ("b", 10L), ("c", 5L), ("c", 7L))
    assert(run(rows) == expect)
    assert(run(rows.repartition(5)) == expect)
    intercept[IllegalArgumentException] {
      Sample.capPerKey(rows, $"k", Seq($"id"), 0)
    }
    // rank > cap rows must be pruned BEFORE the per-key sort spills
    val plan = Sample.capPerKey(rows, $"k", Seq($"id"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("weightedTopN matches an exact driver replay of the E-S keys, " +
      "favors heavy rows, is partition-independent, and its rank " +
      "surface sits on key gaps far above ulp noise") {
    val got = Sample.weightedTopN(docs, "doc_id", "n_chars", 50)
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(got.length == 50 && got.map(_._2).toSeq == (1L to 50L))
    // driver replay: same md5 uniform, same ln(u)/w key, same ties
    val keys = docs.select($"doc_id", $"n_chars").as[(Long, Long)]
      .collect().map { case (id, w) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"wsamp:$id".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        val u = (2.0 * java.lang.Long.parseLong(md5, 16) + 1) /
          8589934592.0
        (id, math.log(u) / w)
      }.sortBy { case (id, k) => (-k, id) }
    assert(got.map(_._1).toSeq == keys.take(50).map(_._1).toSeq)
    // the rank surface is safe: the relative key gap at the cut is
    // astronomically larger than the ~1e-16 ulp disagreement ln() can
    // carry across libm implementations
    val gap = math.abs(keys(49)._2 - keys(50)._2) /
      math.max(math.abs(keys(49)._2), 1e-300)
    assert(gap > 1e-9, s"cut gap $gap too tight for a rank surface")
    // heavier rows are preferred: the selected mean weight beats the
    // corpus mean (E-S inclusion probability rises with weight)
    val wById = docs.select($"doc_id", $"n_chars").as[(Long, Long)]
      .collect().toMap
    val selMean = got.map(r => wById(r._1)).sum.toDouble / got.length
    val allMean = wById.values.sum.toDouble / wById.size
    assert(selMean > allMean, s"selected mean $selMean <= corpus $allMean")
    // partitioning independence (TakeOrderedAndProject, not df.sample)
    val re = Sample.weightedTopN(docs.repartition(9), "doc_id",
      "n_chars", 50).as[(Long, Long)].collect().toSet
    assert(re == got.toSet)
    val plan = Sample.weightedTopN(docs, "doc_id", "n_chars", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("matchComposition hits the target profile with exact counts, " +
      "keeps the binding stratum at its full multiple, drops unlisted " +
      "strata, and returns EMPTY when a listed stratum is absent") {
    val shares = Seq(("en", 4L), ("fr", 2L), ("zh", 1L))
    val got = Sample.matchComposition(docs, "lang", "doc_id", shares)
      .select($"lang", $"doc_id").as[(String, Long)].collect()
    val counts = docs.groupBy($"lang").count().as[(String, Long)]
      .collect().toMap
    val k = shares.map { case (s, p) => counts(s) / p }.min
    val byLang = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang == shares.map { case (s, p) => s -> (k * p).toInt }.toMap,
      s"composition $byLang, k=$k")
    // unlisted strata never leak through
    assert(!got.exists(r => r._1 == "de" || r._1 == "es"))
    // infeasible profile (stratum not in the corpus) -> empty, never
    // silently disproportionate
    assert(Sample.matchComposition(docs, "lang", "doc_id",
      Seq(("en", 1L), ("xx", 1L))).count() == 0)
    // partitioning independence
    val re = Sample.matchComposition(docs.repartition(7), "lang",
        "doc_id", shares)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    assert(re == got.toSet)
    // the rank window prunes through WindowGroupLimit (literal max
    // limit) before the stratum exchange
    val plan = Sample.matchComposition(docs, "lang", "doc_id", shares)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("prioritySample: unsaturated group returns everything exactly " +
      "(tau 0, w_est = w); saturated group keeps k rows with tau > 0 " +
      "and w_est >= w; zero/negative weights drop; deterministic") {
    val rows = (0 until 400).map(i =>
      ("big", i.toLong, (i % 50 + 1).toLong)) ++
      (0 until 5).map(i => ("small", (1000 + i).toLong, 10L)) ++
      Seq(("small", 2000L, 0L), ("small", 2001L, -3L)) // dropped
    val df = rows.toDF("g", "id", "w")
    def run() = Sample.prioritySample(df, "g", "id", "w", k = 64)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val got = run()
    assert(got == run(), "priority sample must be deterministic")
    val small = got.filter(_._1 == "small")
    assert(small.map(_._2) == Set(1000L, 1001L, 1002L, 1003L, 1004L))
    assert(small.forall(r => r._5 == 0L && r._6 == r._3),
      "unsaturated: tau 0, w_est = w")
    val big = got.filter(_._1 == "big")
    assert(big.size == 64)
    assert(big.forall(_._5 > 0L), "saturated group must carry tau > 0")
    assert(big.forall(r => r._6 == math.max(r._3, r._5)))
    // every kept priority beats tau (they are the top k by q_fp)
    assert(big.forall(r => r._4 >= big.head._5))
    // the estimator lands near the true mass on this fixture (one
    // deterministic draw; the bound is loose but pinned)
    val est = big.toSeq.map(_._6).sum.toDouble
    val truth = (0 until 400).map(i => (i % 50 + 1).toLong).sum.toDouble
    assert(math.abs(est - truth) / truth < 0.3,
      s"estimate $est vs truth $truth")
  }

  test("prioritySample: a weight >= 2^31 raises loudly instead of " +
      "silently overflowing its priority to NULL (which would sort " +
      "the heaviest row LAST)") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 2147483648L))
      .toDF("g", "id", "w")
    val e = intercept[Exception] {
      Sample.prioritySample(df, "g", "id", "w", k = 1).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("2^31"))), e.toString)
  }
}
