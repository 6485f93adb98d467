package graft.operators

import graft.SparkSuite
import graft.functions.{Base32, TextFunctions}
import org.apache.spark.sql.functions._

/** Dedup operator properties on synthesized near-duplicates (the fixture
  * corpus has planted near-dups at jaccard ≈0.98 and none in (0.15,
  * 0.95), so thresholded results are stable).
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("FIXTURE GUARD: no pair sits in the LSH marginal band — the " +
      "q31/q96/q99/q101 LSH==exact-oracle identities depend on it") {
    // The probabilistic pipelines gate against EXACT all-pairs oracles;
    // that identity is only safe because every true pair clears the
    // threshold with miss probability ≈0. A fixture change that plants
    // a pair at jac just above 0.5 (k=64/bands=32 miss ≈1e-4) or at
    // cosine in [0.999, 1) on distinct vectors (12-plane/4-table miss
    // ≈6e-4) would make those gates flake NONDETERMINISTICALLY. This
    // test makes such a change fail loudly instead.
    val gateDirs = (Seq(sfDir) ++ Seq("/root/testdata/sf0.01")
      .filter(d => new java.io.File(d).isDirectory)).distinct
    gateDirs.foreach { dir =>
      val dd = spark.read.parquet(s"$dir/documents.parquet")
      val jacs = Dedup.ngramJaccardPairs(dd, "text", "doc_id",
          n = 3, minJaccard = 0.5)
        .select($"id_a", $"id_b", $"jac").as[(Long, Long, Double)]
        .collect()
      assert(jacs.nonEmpty, s"$dir lost its planted near-dups")
      // band-match miss probability (1−j²)^32: 1.3e-4 at j=0.5 (the
      // hazard), 4.4e-10 at j=0.7 (safe), 1.5e-22 at the fixture's 0.889
      val marginal = jacs.filter(_._3 < 0.7)
      assert(marginal.isEmpty,
        s"$dir pairs in the jaccard marginal band [0.5,0.7): " +
          marginal.take(5).mkString(", "))
    }
    // q99's corpus doubles the embeddings table; any pair at cosine
    // ≥ 0.999 must be BIT-IDENTICAL vectors (miss probability exactly
    // 0 — identical vectors share every LSH bucket), never merely close
    gateDirs.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val corpus = emb.select($"vec_id", $"embedding")
        .union(emb.select(($"vec_id" + 10000000L).as("vec_id"),
          $"embedding"))
      val close = Dedup.embeddingCosinePairsExact(corpus, "embedding",
          "vec_id", minCosine = 0.999)
        .join(corpus.select($"vec_id".as("id_a"), $"embedding".as("va")),
          "id_a")
        .join(corpus.select($"vec_id".as("id_b"), $"embedding".as("vb")),
          "id_b")
        .select($"id_a", $"id_b", $"va" === $"vb")
        .as[(Long, Long, Boolean)].collect()
      assert(close.nonEmpty, s"$dir lost its planted duplicate vectors")
      val nearNotIdentical = close.filter(!_._3)
      assert(nearNotIdentical.isEmpty,
        s"$dir distinct vectors at cosine ≥ 0.999 (q99 flake hazard): " +
          nearNotIdentical.take(5).mkString(", "))
    }
  }

  test("exact dedup: groups and survivors agree; survivors idempotent") {
    val base = docs.select($"doc_id", $"text")
    // plant exact duplicates with new ids
    val dups = base.limit(10)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
    val corpus = base.union(dups)
    val groups = Dedup.exactGroups(corpus, $"text", $"doc_id")
    assert(groups.count() == base.count()) // one group per distinct text
    assert(groups.filter($"n_copies" === 2).count() == 10)
    val survivors = Dedup.exactSurvivors(corpus, $"text", $"doc_id")
    assert(survivors.count() == base.count())
    // keeps the min id — no planted id survives
    assert(survivors.filter($"doc_id" >= 100000).count() == 0)
    // idempotent
    val again = Dedup.exactSurvivors(survivors, $"text", $"doc_id")
    assert(again.count() == survivors.count())
  }

  test("incremental dedup: batch survivors exclude corpus duplicates " +
      "and intra-batch repeats; corpus side never shuffles") {
    import graft.functions.TextFunctions.fingerprint
    val corpus = Seq((0L, "alpha beta"), (1L, "gamma delta"))
      .toDF("id", "text")
    val batch = Seq(
      (10L, "alpha beta"),   // dup of corpus 0 → dropped
      (11L, "epsilon zeta"), // fresh → kept
      (12L, "epsilon zeta"), // intra-batch dup of 11 → dropped
      (13L, "gamma  delta")  // different text (double space) → kept
    ).toDF("id", "text")
    val out = Dedup.incrementalSurvivors(batch, corpus,
      df => fingerprint(df("text")), col("id"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 13L))
    // repartitioned inputs give the same survivors
    val out2 = Dedup.incrementalSurvivors(batch.repartition(5),
      corpus.repartition(3), df => fingerprint(df("text")), col("id"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(out2 == out)
    // scale shape: exactly three hash exchanges, every one bounded by
    // the BATCH size — the batch's survivor window, the batch
    // fingerprint distinct, and the matched-fingerprint distinct (the
    // corpus scan feeds a partial agg of fps ∩ broadcast batch set, so
    // only ≤|batch| rows per task reach that exchange); corpus rows
    // themselves never shuffle and the corpus join is a broadcast
    val plan = Dedup.incrementalSurvivors(docs.filter($"doc_id" >= 450),
        docs.filter($"doc_id" < 450),
        df => fingerprint(df("text")), col("doc_id"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(shuffles <= 3, s"unexpected exchange:\n$plan")
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(plan).isDefined
      && "BroadcastHashJoin .*LeftAnti".r.findFirstIn(plan).isDefined,
      s"corpus membership must be broadcast joins:\n$plan")
  }

  test("large-delta incremental dedup: bloom path is bit-identical to " +
      "the exact path even at fpp=0.5 (false positives WILL fire and " +
      "must die in the exact confirm); bloom probe sits in the corpus " +
      "scan") {
    import graft.functions.TextFunctions.fingerprint
    val corpus = docs.filter($"doc_id" < 450)
    val batch = docs.filter($"doc_id" >= 450)
    val exact = Dedup.incrementalSurvivors(batch, corpus,
      df => fingerprint(df("text")), col("doc_id"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    // fpp=0.5: ~half the non-duplicate corpus passes the bloom — the
    // shuffled exact semi-join must kill every false positive
    for (fpp <- Seq(0.5, 0.03)) {
      val loose = Dedup.incrementalSurvivorsLarge(batch, corpus,
        df => fingerprint(df("text")), col("doc_id"),
        expectedKeys = 100L, fpp = fpp)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(loose == exact, s"fpp=$fpp diverged from exact path")
    }
    val planned = Dedup.incrementalSurvivorsLarge(batch, corpus,
      df => fingerprint(df("text")), col("doc_id"),
      expectedKeys = 100L, fpp = 0.03)
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("BloomMightContain") ||
      plan.toLowerCase.contains("bloommightcontain"),
      s"bloom probe missing from the plan:\n${plan.take(1200)}")
  }

  test("minhash LSH pairs == exact jaccard pairs at threshold 0.5") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty) // fixture has planted near-dups
    assert(lsh.toSet == exact.toSet)
  }

  test("df-capped jaccard equals the exact operator when the cap " +
      "clears the corpus's stop-shingles") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.1)
      .select("id_a", "id_b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.ngramJaccardPairsCapped(docs, "text", "doc_id",
        n = 3, minJaccard = 0.1, maxDf = 100)
      .select("id_a", "id_b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(capped == exact)
  }

  test("simhash: near-dup pairs have small hamming; distance to self 0") {
    val planted = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.9).select("id_a", "id_b").as[(Long, Long)]
      .collect()
    assert(planted.nonEmpty)
    val sims = docs.select($"doc_id",
        TextFunctions.simhash64On("text").as("sh"))
      .as[(Long, Long)].collect().toMap
    planted.foreach { case (a, b) =>
      val d = java.lang.Long.bitCount(sims(a) ^ sims(b))
      assert(d <= 16, s"hamming($a,$b)=$d too large for jac>=0.9")
    }
    // explode+agg formulation in simhashPairs produces identical hashes
    val aggSims = Dedup.simhashPairs(docs, "text", "doc_id",
        maxHamming = 3)
      .select("id_a", "sim_a").as[(Long, Long)].collect()
    aggSims.foreach { case (id, sh) => assert(sims(id) == sh) }
  }

  test("embedding cosine pairs: LSH candidates ⊆ exact; multi-table " +
      "OR-construction at q63's parameters EQUALS exact") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = Dedup.embeddingCosinePairsExact(emb, "embedding", "vec_id",
        minCosine = 0.42)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // single table: a subset (candidates only from one bucketing)
    val oneTable = Dedup.embeddingCosinePairs(emb, "embedding", "vec_id",
        minCosine = 0.42, numPlanes = 4, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(oneTable.subsetOf(exact))
    // q63's parameters: miss probability < 1e-6 per pair → identity
    val multi = Dedup.embeddingCosinePairs(emb, "embedding", "vec_id",
        minCosine = 0.42, numPlanes = 3, dim = 64, tables = 48)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(multi == exact)
  }

  test("q37 gate form: top-15 ranked pairs via LSH+rerank over the " +
      "near-dup corpus EQUALS the exact all-pairs top-15 (values too)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select($"vec_id", $"embedding")
      .union(emb.select(($"vec_id" + lit(10000000L)).as("vec_id"),
        $"embedding"))
    def top15(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"cos".desc, $"id_a", $"id_b").limit(15)
        .as[(Long, Long, Double)].collect().toSeq
    val viaLsh = top15(Dedup.embeddingCosinePairs(corpus, "embedding",
      "vec_id", minCosine = 0.999, numPlanes = 12, dim = 64, tables = 4))
    val viaExact = top15(Dedup.embeddingCosinePairsExact(corpus,
      "embedding", "vec_id", minCosine = 0.999))
    assert(viaLsh.size == 15)
    assert(viaLsh == viaExact) // bit-exact: same dot fold both paths
  }

  test("minhash LSH band-bucket cap: capped == uncapped == exact when " +
      "the cap clears the legitimate duplicate-cluster size") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.minhashLshPairs(docs, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.5,
        maxBucket = Some(50))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(capped == exact)
    // a cap of 1 kills every bucket with a real duplicate pair in it —
    // proves the cap actually gates candidate generation
    val starved = Dedup.minhashLshPairs(docs, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.5,
        maxBucket = Some(1))
      .count()
    assert(starved == 0)
  }

  test("connected components label chains transitively (A-B-C one " +
      "cluster) where pairwise survivor-picking would split them") {
    val ids = (0L to 9L).toDF("id")
    // chain 0-1-2-3, pair 5-6, singletons 4,7,8,9; edges deliberately
    // NOT a clique — 0-3 share no direct edge
    val pairs = Seq((1L, 0L), (1L, 2L), (3L, 2L), (5L, 6L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(ids, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
    // on the fixture corpus: components refine survivors — the number
    // of clusters equals q32's survivor count (every cluster keeps
    // exactly one canonical doc)
    val docs = graft.Tables.documents(spark, sfDir)
    val lshPairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
      n = 3, k = 64, bands = 32, minJaccard = 0.5)
    val comps = Dedup.connectedComponents(
      docs.select($"doc_id"), "doc_id", lshPairs)
    val nClusters = comps.select(countDistinct($"component")).head().getLong(0)
    val dupIds = lshPairs.select($"id_b".as("doc_id")).distinct()
    val nSurvivors = docs.join(dupIds, Seq("doc_id"), "left_anti").count()
    assert(comps.count() == docs.count())
    assert(nClusters == nSurvivors)
  }

  test("decontamination flags exactly the docs sharing an n-gram with " +
      "the probe set, with the right distinct-match counts") {
    val probes = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // one verbatim 5-gram from the probe
      (10L, "intro words then the quick brown fox jumps and more"),
      // two distinct probe 5-grams
      (11L, "quick brown fox jumps over then fox jumps over the lazy"),
      // 4-token overlap only — below the 5-gram bar
      (12L, "the quick brown fox sat still"),
      (13L, "completely unrelated text with no overlap at all")
    ).toDF("doc_id", "text")
    val flagged = Dedup.contaminatedDocs(corpus, "text", "doc_id",
        probes, "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(flagged.keySet == Set(10L, 11L))
    assert(flagged(10L) == 1L)
    assert(flagged(11L) >= 2L)
  }

  test("large-star/small-star components equal label propagation on " +
      "random graphs and converge on a 200-node chain where " +
      "diameter-bounded propagation cannot") {
    // adversarial chain: diameter 199 — propagation's default 50 rounds
    // must refuse, star converges in O(log n)
    val chainIds = (0L until 200L).toDF("id")
    val chainEdges = (0L until 199L).map(i => (i, i + 1))
      .toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(chainIds, "id", chainEdges)
      .as[(Long, Long)].collect().toMap
    assert(star.size == 200 && star.values.forall(_ == 0L))
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chainIds, "id", chainEdges)
    }
    // random graphs (deterministic seeds): star == propagation
    (0 until 3).foreach { round =>
      val rnd = new scala.util.Random(42L + round)
      val n = 60
      val ids = (0L until n.toLong).toDF("id")
      val edges = Seq.fill(50)(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val viaStar = Dedup.connectedComponentsStar(ids, "id", edges)
        .as[(Long, Long)].collect().toMap
      val viaProp = Dedup.connectedComponents(ids, "id", edges)
        .as[(Long, Long)].collect().toMap
      assert(viaStar == viaProp, s"round=$round")
    }
  }

  test("repeatedSpans finds cross-doc shared windows and merges them " +
      "into maximal disjoint spans; scrub removes exactly those tokens") {
    import spark.implicits._
    // two docs sharing an 8-token run (two overlapping flagged 5-gram
    // islands merge into ONE span), plus an unrelated doc
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = s"a0 a1 $shared a2 a3"
    val b = s"b0 $shared b1 b2 b3"
    val c = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
    // one maximal span per sharing doc, none for the unrelated doc
    assert(spans.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // doc 1: shared run sits at token positions 2..9 (4 windows)
    assert(spans(0).getLong(1) == 2 && spans(0).getLong(2) == 9 &&
      spans(0).getLong(3) == 4)
    // doc 2: positions 1..8
    assert(spans(1).getLong(1) == 1 && spans(1).getLong(2) == 8 &&
      spans(1).getLong(3) == 4)

    val clean = Dedup.scrubRepeatedSpans(df, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
    assert(clean.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(
      (1L, "a0 a1 a2 a3"), (2L, "b0 b1 b2 b3"), (3L, c)))
    assert(clean.map(_.getLong(2)).toSeq == Seq(4L, 4L, 10L))
  }

  test("repeatedSpans ignores within-doc repetition below minDocs and " +
      "short texts; a fully-duplicated doc scrubs to nothing") {
    import spark.implicits._
    val loop = "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5" // repeats only within doc
    val tiny = "t1 t2 t3"                       // shorter than the window
    val dupA = "d1 d2 d3 d4 d5 d6"
    val df = Seq((1L, loop), (2L, tiny), (3L, dupA), (4L, dupA))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, "doc_id", "text", k = 5)
    assert(spans.filter($"doc_id".isin(1L, 2L)).isEmpty)
    // docs 3 and 4 are whole-text duplicates: span covers everything...
    val full = spans.filter($"doc_id".isin(3L, 4L)).collect()
    assert(full.length == 2 &&
      full.forall(r => r.getLong(1) == 0 && r.getLong(2) == 5))
    // ...so the scrubbed corpus drops them entirely
    val clean = Dedup.scrubRepeatedSpans(df, "doc_id", "text", k = 5)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("repeatedSpans maxDf excludes corpus-wide boilerplate grams from " +
      "flagging while true duplicate spans survive") {
    import spark.implicits._
    // boilerplate footer present in EVERY doc (df = 42) — at 100 TB
    // this is the license-header gram that funnels millions of
    // (doc, pos) rows through one reducer; a true duplicate run shared
    // by exactly two docs must still be caught
    // unique separator tokens (p1/q2) keep the dup run and the footer
    // non-adjacent, so no cross-boundary gram links them
    val footer = "f1 f2 f3 f4 f5"
    val dup = "u1 u2 u3 u4 u5 u6"
    val docs = (1L to 40L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e $footer")) ++
      Seq((41L, s"p0 $dup p1 $footer"), (42L, s"q0 q1 $dup q2 $footer"))
    val df = docs.toDF("doc_id", "text")
    val capped = Dedup.repeatedSpans(df, "doc_id", "text", k = 5,
      minDocs = 2, maxDf = 10).collect()
    // only the two true-duplicate docs produce spans, covering exactly
    // the 6-token dup run and NOT the (capped) footer
    assert(capped.map(_.getLong(0)).sorted.toSeq == Seq(41L, 42L))
    assert(capped.forall(r => r.getLong(2) - r.getLong(1) == 5))
    // uncapped, the footer gram is flagged in all 42 docs
    val uncapped = Dedup.repeatedSpans(df, "doc_id", "text", k = 5)
    assert(uncapped.select("doc_id").distinct().count() == 42)
    // scrub under the cap removes the dup run but keeps the footer
    val clean = Dedup.scrubRepeatedSpans(df, "doc_id", "text", k = 5,
      minDocs = 2, maxDf = 10)
      .filter($"doc_id" === 41L).select("clean_text").as[String].head()
    assert(clean == s"p0 p1 $footer")
    // a cap below minDocs can never flag anything — rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.repeatedSpans(df, "doc_id", "text", k = 5, minDocs = 3,
        maxDf = 2)
    }
  }

  test("containment pairs: an excerpt contained in a longer doc scores " +
      "1.0 where symmetric jaccard misses it; direction is contained→" +
      "container; df-cap drops boilerplate-only pairs, keeps real ones") {
    val long = (1 to 10).map(i => s"a$i").mkString(" ") + " " +
      (1 to 10).map(i => s"x$i").mkString(" ")
    val short = (1 to 6).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, long), (2L, short), (3L, "z1 z2 z3 z4 z5"))
      .toDF("id", "text")
    val pairs = Dedup.containmentPairs(df, "text", "id",
      n = 3, minContainment = 0.9)
      .select($"id_a", $"id_b", $"containment")
      .as[(Long, Long, Double)].collect().toSeq
    // short (4 shingles, all in long) → containment exactly 1.0; the
    // reverse direction is 4/18 and must be absent
    assert(pairs == Seq((2L, 1L, 1.0)))
    // symmetric jaccard on the same pair: 4/(18+4-4) ≈ 0.22 — invisible
    // at any near-dup threshold
    assert(Dedup.ngramJaccardPairs(df, "text", "id",
      n = 3, minJaccard = 0.5).count() == 0)
    // df-cap: a boilerplate tail shared by ALL docs must not create
    // pairs on its own once capped, and the true excerpt pair survives
    // (its containment over informative shingles is 4/6 — the two
    // text↔boilerplate boundary shingles are df=1, so they stay in
    // the denominator)
    val bp = " b1 b2 b3 b4 b5"
    val bdf = Seq((1L, long + bp), (2L, short + bp),
      (3L, "z1 z2 z3 z4 z5" + bp), (4L, "w1 w2 w3 w4 w5" + bp))
      .toDF("id", "text")
    // uncapped at 0.3 the boilerplate alone pairs docs 3 and 4
    val loose = Dedup.containmentPairs(bdf, "text", "id",
      n = 3, minContainment = 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(loose.contains((3L, 4L)))
    val capped = Dedup.containmentPairs(bdf, "text", "id",
      n = 3, minContainment = 0.3, maxDf = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(capped.contains((2L, 1L)))
    // docs 3/4 share ONLY the capped boilerplate shingles with others
    assert(!capped.exists(p => p._1 == 3L || p._1 == 4L))
    // cap above every df ≡ uncapped (identical rows incl. scores)
    val un = Dedup.containmentPairs(df, "text", "id", 3, 0.9)
    val hi = Dedup.containmentPairs(df, "text", "id", 3, 0.9,
      maxDf = 1000000)
    assert(un.except(hi).count() == 0 && hi.except(un).count() == 0)
  }

  test("priority survivors: each cluster keeps its highest-priority " +
      "member (doc_id tiebreak), not the min id; singletons survive") {
    val docs = Seq(
      (0L, 5), (1L, 1), (2L, 9), // chain cluster 0-1-2 → keeper 1
      (5L, 7), (6L, 7),          // pair, tied priority → keeper 5
      (7L, 3)                    // singleton
    ).toDF("id", "prio")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.prioritySurvivors(docs, "id", pairs, $"prio")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 5L, 7L))
    // min-id survivor policy would have kept 0 — priority changed it
    // on the fixture corpus: survivor COUNT equals the min-id policy's
    // (one per cluster, only the representative differs)
    val fixture = graft.Tables.documents(spark, sfDir)
    val lshPairs = Dedup.minhashLshPairs(fixture, "text", "doc_id",
      n = 3, k = 64, bands = 32, minJaccard = 0.5)
    val surv = Dedup.prioritySurvivors(fixture, "doc_id", lshPairs,
      substring($"source", 4, 16).cast("int"))
    val comps = Dedup.connectedComponents(
      fixture.select($"doc_id"), "doc_id", lshPairs)
    assert(surv.count() ==
      comps.select(countDistinct($"component")).head().getLong(0))
  }

  test("priority survivors null contract: an unparseable source id " +
      "(null priority) sorts LAST, never silently wins the pick") {
    // the q96 priority shape — substring+cast — yields null for any
    // source not matching the srcN form; default ASC null ordering
    // would put nulls FIRST and crown the junk row (ADVICE/verdict r08)
    // try_cast, not cast: under ANSI (Spark 4 default) a plain cast
    // does not even yield null — it CRASHES the query on 'rd'
    val docs = Seq(
      (0L, "mirror-of-src9"), // try_cast → null: must NOT survive
      (1L, "src7"),           // parsed 7 → the survivor
      (2L, "src9"),
      (5L, "weird"), (6L, "src3") // pair: null vs 3 → keeper 6
    ).toDF("id", "source")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.prioritySurvivors(docs, "id", pairs,
        substring($"source", 4, 16).try_cast("int"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 6L))
    // all-null cluster still keeps exactly one row (id tiebreak)
    val allNull = Seq((3L, "a"), (4L, "b")).toDF("id", "source")
    val out2 = Dedup.prioritySurvivors(allNull, "id",
        Seq((3L, 4L)).toDF("id_a", "id_b"),
        substring($"source", 4, 16).try_cast("int"))
      .select($"id").as[Long].collect().toSeq
    assert(out2 == Seq(3L))
  }

  test("incremental near-dups == exact cross-slice jaccard; corpus " +
      "rows never shuffle (candidates + broadcasts only)") {
    val batch = docs.filter($"doc_id" % 5 === 0)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val got = Dedup.incrementalNearDups(batch, corpus, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.5)
      .select($"id_b", $"id_c").as[(Long, Long)].collect().toSet
    // exact cross-slice reference via the all-pairs operator
    val all = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val exact = all.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }.filter { case (x, y) =>
      x % 5 == 0 && y % 5 != 0 }.toSet
    assert(exact.nonEmpty && got == exact)
    // scale contract: every hash exchange is candidate/batch-bounded —
    // the corpus reaches its joins by scan + BroadcastHashJoin, never
    // by an exchange of corpus rows. The only allowed exchanges are
    // the candidate-pair distinct (2 plan instances: cand + candIds
    // derive from the same checkpoint) and AQE artifacts of the small
    // pair-side joins.
    val plan = Dedup.incrementalNearDups(batch, corpus, "text",
        "doc_id").queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"batch buckets and shingles must broadcast:\n$plan")
    // the corpus-side scans feed broadcast joins directly: no exchange
    // may sit between a parquet scan and its join
    val badShape = "Exchange hashpartitioning[^\\n]*\\n[^\\n]*Scan parquet".r
    assert(badShape.findFirstIn(plan).isEmpty,
      s"corpus scan must not feed an exchange:\n$plan")
  }

  test("incremental hamming pairs == brute-force cross-slice; corpus " +
      "never shuffles (scan → broadcast join, pairs-only exchange)") {
    val fps = docs.select($"doc_id".as("id"),
      xxhash64($"text").bitwiseAND(lit(0xffffffffL)).as("lo"),
      call_function("shiftrightunsigned", xxhash64($"text"), lit(32))
        .bitwiseAND(lit(0xffffffffL)).as("hi"))
    val corpus = fps.filter($"id" % 7 =!= 0)
    // batch = one slice + planted twins of corpus rows at hamming
    // exactly 3 (2 bits in lo, 1 in hi) under new ids
    val twins = corpus.filter($"id" % 7 === 1)
      .select(($"id" + 500000L).as("id"),
        $"lo".bitwiseXOR(lit(3L)).as("lo"),
        $"hi".bitwiseXOR(lit(1L << 7)).as("hi"))
    val batch = fps.filter($"id" % 7 === 0).unionByName(twins)
    val got = Dedup.incrementalHammingPairs(batch, corpus,
        "id", "lo", "hi", 3)
      .as[(Long, Long, Long)].collect().toSet
    val bArr = batch.as[(Long, Long, Long)].collect()
    val cArr = corpus.as[(Long, Long, Long)].collect()
    val brute = (for {
      a <- bArr; c <- cArr if a._1 != c._1
      h = java.lang.Long.bitCount(a._2 ^ c._2) +
        java.lang.Long.bitCount(a._3 ^ c._3)
      if h <= 3
    } yield (a._1, c._1, h.toLong)).toSet
    assert(brute.nonEmpty && got == brute)
    assert(got.exists(_._3 == 3L)) // the planted twins are found
    // scale contract (the q101 rule for the fingerprint family): the
    // corpus reaches its join by scan + BroadcastHashJoin; the only
    // exchange carries surviving pairs (the distinct)
    val plan = Dedup.incrementalHammingPairs(batch, corpus,
      "id", "lo", "hi").queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      s"batch buckets must broadcast:\n$plan")
    val badShape = "Exchange hashpartitioning[^\\n]*\\n[^\\n]*Scan parquet".r
    assert(badShape.findFirstIn(plan).isEmpty,
      s"corpus scan must not feed an exchange:\n$plan")
  }

  test("hamming halves pairs: pigeonhole banding equals brute force " +
      "at radius 3 and 1; out-of-radius twins excluded") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 60L).map { i =>
      (i, rnd.nextInt().toLong & 0xffffffffL,
        rnd.nextInt().toLong & 0xffffffffL)
    }
    // twins at hamming exactly 3 (2 bits in lo, 1 in hi) and exactly 4
    val in = base.take(10).map { case (i, lo, hi) =>
      (i + 1000L, lo ^ 5L, hi ^ (1L << 20)) }
    val out = base.slice(10, 20).map { case (i, lo, hi) =>
      (i + 2000L, lo ^ 0xfL, hi) }
    val all = base ++ in ++ out
    val df = all.toDF("id", "lo", "hi")
    def brute(maxH: Int) = (for {
      a <- all; b <- all if a._1 < b._1
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= maxH
    } yield (a._1, b._1, h.toLong)).toSet
    val got3 = Dedup.hammingHalvesPairs(df, "id", "lo", "hi", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got3 == brute(3))
    assert(base.take(10).forall(r => got3.exists(_._2 == r._1 + 1000L)))
    assert(!got3.exists(_._2 >= 2000L)) // hamming-4 twins excluded
    val got1 = Dedup.hammingHalvesPairs(df, "id", "lo", "hi", 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got1 == brute(1))
  }

  test("hamming halves pairs scan ONE materialized fingerprint RDD — " +
      "the joins must not recompute the (codec) input per side") {
    val df = (0L until 50L).map(i => (i, i % 7L, i % 11L))
      .toDF("id", "lo", "hi")
    val pairs = Dedup.hammingHalvesPairs(df, "id", "lo", "hi", 3)
    val rdds = pairs.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }
    // identical-pair join (2 scans), banded distinct-fp self-join (2),
    // member expansion (2) — all must read the ONE checkpointed
    // fingerprint RDD, never a recomputed copy of the upstream (codec)
    // pipeline; physical exchange reuse collapses the duplicate
    // distinct computations
    assert(rdds.size == 6 && rdds.distinct.size == 1,
      s"expected six scans of one checkpointed RDD, got $rdds")
  }

  test("hamming halves pairs: identical-fingerprint mega-group never " +
      "enters the banded join; output still has every true pair") {
    // 300 rows share ONE fingerprint (the blank-image case) + a planted
    // near-pair at hamming 2 + unrelated rows. A row-level banded join
    // would put 300 rows in every band bucket; the distinct-fp collapse
    // puts ONE.
    val mega = (0L until 300L).map(i => (i, 0xabcdL, 0x1234L))
    val near = Seq((1000L, 0x0f0fL, 0x9999L), (1001L, 0x0f0dL, 0x9998L))
    val other = (2000L until 2020L).map(i =>
      (i, i * 2654435761L & 0xffffffffL, i * 40503L & 0xffffffffL))
    val df = (mega ++ near ++ other).toDF("id", "lo", "hi")
    // a cap of 1 would drop ANY shared band bucket between distinct
    // fps; the mega-group must be immune (it is one distinct fp, so its
    // pairs flow through the identical-pair path, not banding)
    val got = Dedup.hammingHalvesPairs(df, "id", "lo", "hi", 3,
      maxBucket = Some(1)).as[(Long, Long, Long)].collect().toSet
    val megaPairs = (for {
      a <- 0L until 300L; b <- (a + 1) until 300L
    } yield (a, b, 0L)).toSet
    assert(megaPairs.subsetOf(got),
      "identical-fp pairs must survive any cap")
    // with a cap that clears the near-pair's bucket population, the
    // output equals brute force
    val all = mega ++ near ++ other
    val brute = (for {
      a <- all; b <- all if a._1 < b._1
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield (a._1, b._1, h.toLong)).toSet
    val capped = Dedup.hammingHalvesPairs(df, "id", "lo", "hi", 3,
      maxBucket = Some(5)).as[(Long, Long, Long)].collect().toSet
    assert(capped == brute)
  }

  test("hamming halves pairs mask signed 32-bit halves: INT columns " +
      "with bit 31 set must not sign-extend into phantom rerank bits") {
    // two fingerprints at true hamming 1 whose hi halves have bit 31
    // set on one side only — sign extension would add 32 phantom bits
    val df = Seq(
      (1L, 0x00000001, 0x80000001.toInt), // hi = bit 31 set (negative INT)
      (2L, 0x00000001, 0x00000001),       // differs from id 1 in hi bit 31
      (3L, 0x00000003, 0x80000001.toInt)  // hamming 1 from id 1 via lo
    ).toDF("id", "lo", "hi")
      .select($"id", $"lo".cast("int").as("lo"), $"hi".cast("int").as("hi"))
    val got = Dedup.hammingHalvesPairs(df, "id", "lo", "hi", 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L)),
      s"unsigned-mask contract broken: $got")
  }

  test("simhash pairs: identical-signature docs collapse before " +
      "banding; capped == uncapped when the cap clears real buckets") {
    val uncapped = Dedup.simhashPairs(docs, "text", "doc_id",
      maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    // a generous cap changes nothing on the fixture corpus
    val capped = Dedup.simhashPairs(docs, "text", "doc_id",
      maxHamming = 3, maxBucket = Some(1000))
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(capped == uncapped)
    // exact-duplicate texts (identical signatures) survive maxBucket=1:
    // they pre-collapse, so the cap cannot touch them
    val withDups = docs.select($"doc_id", $"text")
      .union(docs.limit(5).select(($"doc_id" + 1000000L).as("doc_id"),
        $"text"))
    val tiny = Dedup.simhashPairs(withDups, "text", "doc_id",
      maxHamming = 3, maxBucket = Some(1))
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val dupIds = docs.limit(5).select($"doc_id").as[Long].collect()
    dupIds.foreach { id =>
      assert(tiny.contains((id, id + 1000000L, 0L)),
        s"identical-signature pair for $id lost under maxBucket=1")
    }
  }

  test("semantic survivors: planted duplicate embeddings collapse to " +
      "min-id representatives with audited cluster sizes") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select($"vec_id", $"embedding")
      .union(emb.select(($"vec_id" + 10000000L).as("vec_id"),
        $"embedding"))
    val surv = Dedup.semanticSurvivors(corpus, "embedding", "vec_id",
      minCosine = 0.999, numPlanes = 12, dim = 64, tables = 4)
    // every original id survives its planted twin; cluster sizes are
    // exactly the CC sizes of the exact-cosine graph (>= 2 everywhere
    // because of the planted copy; survivors never the shifted id)
    assert(surv.count() == surv.filter($"vec_id" < 10000000L).count())
    assert(surv.filter($"cluster_size" < 2).count() == 0)
    assert(surv.agg(sum($"cluster_size")).head().getLong(0) ==
      corpus.count())
    // idempotence on the deduped side: rerunning over the survivors'
    // vectors (one per cluster) yields all-singleton clusters unless
    // two distinct originals are true near-dups — allow those, but the
    // planted twins must be gone
    val kept = corpus.join(surv.select($"vec_id"), Seq("vec_id"))
    val again = Dedup.semanticSurvivors(kept, "embedding", "vec_id",
      minCosine = 0.9999, numPlanes = 12, dim = 64, tables = 4)
    assert(again.count() == kept.count())
  }

  test("embeddingDecontaminate == exact cross pairs; eval broadcasts " +
      "and the corpus scan never feeds an exchange") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.select(($"vec_id" + 40000000L).as("vec_id"),
      $"embedding")
    val evalSet = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding")
    val q = Dedup.embeddingDecontaminate(corpus, evalSet, "embedding",
      "vec_id", minCosine = 0.999, numPlanes = 12, dim = 64,
      tables = 4)
    val got = q.select($"vec_id", $"eval_id").as[(Long, Long)]
      .collect().toSet
    // brute-force reference (double margins are huge at the 0.999
    // fixture-guarded threshold: pairs are bit-identical or far below)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cv = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val ev = cv.filter(_._1 % 10 == 0)
    val brute = (for {
      (ci, cvec) <- cv; (ei, evec) <- ev
      if cos(cvec, evec) >= 0.999
    } yield (ci + 40000000L, ei)).toSet
    assert(brute.nonEmpty && got == brute)
    // scale contract: eval buckets + vectors broadcast; the corpus
    // parquet scan feeds its join directly — no exchange between them
    // (the only exchange is the candidate-pair groupBy, match-bounded)
    val plan = q.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"eval buckets and eval vectors must broadcast:\n$plan")
    val badShape =
      "Exchange hashpartitioning[^\\n]*\\n[^\\n]*Scan parquet".r
    assert(badShape.findFirstIn(plan).isEmpty,
      s"corpus scan must not feed an exchange:\n$plan")
  }

  test("base32 codec roundtrips (server.rs:103-108 analogue) — " +
      "expression and scala sides agree") {
    val cases = Seq("simple", "user/with/slashes", "säö ünicode",
      "", "a", "ab", "abc", "abcd", "abcde")
    cases.foreach { s =>
      assert(Base32.decodeString(Base32.encodeString(s)) == s)
    }
    val viaExpr = spark.createDataset(cases).toDF("s")
      .select(Base32.unbase32(Base32.base32($"s")).as("rt"))
      .as[String].collect()
    assert(viaExpr.toSeq == cases)
    // filesystem-safe: encoded form is [A-Z2-7] only
    assert(Base32.encodeString("user/with/slashes")
      .forall(c => (c >= 'A' && c <= 'Z') || (c >= '2' && c <= '7')))
  }
}
