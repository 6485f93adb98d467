package graft

import graft.eventstore.{CloudEvent, EventStore}
import graft.functions.Base32
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): append(n batches) ⇒ dense revisions;
  * query(s,l) ⇒ exact slice semantics; dedup idempotence; base32
  * roundtrip over arbitrary strings; minhash-estimate sanity.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  /** Sample a generator `n` times under fixed seeds (scalatestplus is
    * not in the offline cache, so forAll is hand-rolled). */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("base32 roundtrips arbitrary unicode strings and stays " +
      "filesystem-safe") {
    samples(Gen.asciiPrintableStr, 50).foreach { s =>
      assert(Base32.decodeString(Base32.encodeString(s)) == s)
    }
    samples(Gen.stringOf(Gen.choose[Char](0, 0xD7FF)), 50).foreach { s =>
      assert(Base32.decodeString(Base32.encodeString(s)) == s)
      assert(Base32.encodeString(s)
        .forall(c => (c >= 'A' && c <= 'Z') || (c >= '2' && c <= '7')))
    }
  }

  test("append batches of arbitrary sizes ⇒ revisions dense 0..n-1 and " +
      "query(s,l) returns exactly the [s, s+l) slice") {
    val sizes = Gen.listOfN(4, Gen.choose(1, 5))
    samples(sizes, 5).foreach { batchSizes =>
      val es = new EventStore(spark, tempDir("prop-es-"))
      var next = 0
      batchSizes.foreach { sz =>
        val events = (0 until sz).map { _ =>
          val e = CloudEvent(id = s"e-$next", source = "prop",
            `type` = "t", data = Some(next.toString))
          next += 1; e
        }
        es.append("u", "s", events)
      }
      val n = batchSizes.sum
      assert(es.revision("u", "s") == n)
      val all = es.query("u", "s", 0, n + 10)
      assert(all.map(_.data.get.toInt) == (0 until n))
      // arbitrary slice
      val start = n / 3; val limit = math.max(1, n / 2)
      val slice = es.query("u", "s", start, limit)
      assert(slice.map(_.data.get.toInt) ==
        (start until math.min(n, start + limit)))
    }
  }

  test("exact dedup is idempotent and keeps one row per key for any " +
      "duplication pattern") {
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOfN(30, Gen.choose(0, 9)) // keys with collisions
    samples(gen, 10).foreach { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (s"key-$k", i.toLong) }
        .toDF("key", "id")
      val surv = operators.Dedup.exactSurvivors(df, col("key"), col("id"))
      assert(surv.count() == keys.distinct.size)
      val again = operators.Dedup.exactSurvivors(surv, col("key"), col("id"))
      assert(again.collect().toSet == surv.collect().toSet)
      // survivor is the min id per key
      val expected = keys.zipWithIndex.groupBy(_._1)
        .map { case (k, xs) => (s"key-$k", xs.map(_._2.toLong).min) }.toSet
      assert(surv.as[(String, Long)].collect().toSet == expected)
    }
  }

  test("minhash jaccard estimate tracks exact jaccard within banding " +
      "tolerance on synthetic near-dups") {
    // construct doc pairs with controlled overlap
    val base = (0 until 60).map(i => s"tok$i")
    val docs = (0 to 10).map { drop =>
      // doc i shares (60 - 3*drop) tokens with doc 0
      val toks = base.drop(3 * drop) ++ (0 until 3 * drop).map(j => s"x$drop-$j")
      (drop.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val exact = operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.4)
      .filter(org.apache.spark.sql.functions.col("id_a") === 0)
      .select("id_b").as[Long].collect().toSet
    val lsh = operators.Dedup.minhashLshPairs(docs, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.4)
      .filter(org.apache.spark.sql.functions.col("id_a") === 0)
      .select("id_b").as[Long].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact) // rerank is exact; banding recall ~1 at jac≥0.4
  }

  test("manifest serialization roundtrips arbitrary file lists and " +
      "revisions") {
    import graft.eventstore.EventStore.{Manifest, parseManifest, serializeManifest}
    val genName = Gen.uuid.map(u => s"batch-0-9-$u.parquet")
    val genManifest = for {
      v <- Gen.choose(1L, Long.MaxValue / 2)
      r <- Gen.choose(0L, Long.MaxValue / 2)
      fs <- Gen.listOfN(5, genName)
      ks <- Gen.listOfN(5, genName)
    } yield Manifest(v, r, fs, ks)
    val dir = java.nio.file.Files.createTempDirectory("manifest-prop-")
    samples(genManifest, 50).foreach { m =>
      val p = dir.resolve("m.log")
      java.nio.file.Files.write(p, serializeManifest(m).getBytes("UTF-8"))
      assert(parseManifest(p) == m)
    }
  }

  test("keyHash is deterministic, separator-sensitive, and spreads " +
      "arbitrary (source,id) pairs") {
    import graft.eventstore.EventStore.keyHash
    val pairs = samples(Gen.zip(Gen.asciiPrintableStr, Gen.asciiPrintableStr),
      200).distinct
    // deterministic
    pairs.foreach { case (s, i) => assert(keyHash(s, i) == keyHash(s, i)) }
    // the separator keeps ("ab","c") and ("a","bc") apart
    assert(keyHash("ab", "c") != keyHash("a", "bc"))
    // distinct pairs spread (collisions at 200 samples would mean a
    // catastrophically bad hash, p < 1e-14 for a sound 64-bit one)
    val hashes = pairs.map { case (s, i) => keyHash(s, i) }
    assert(hashes.distinct.size == pairs.size)
  }

  test("bucketed range join equals the naive inequality join on random " +
      "interval/point sets across bin widths (including widths far " +
      "smaller and larger than the intervals)") {
    import org.apache.spark.sql.functions.col
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val genIntervals = Gen.listOfN(30, for {
      k <- Gen.choose(0L, 3L)
      startSec <- Gen.choose(0L, 86400L)
      lenSec <- Gen.choose(0L, 14400L) // includes empty intervals
    } yield (k, new java.sql.Timestamp(base + startSec * 1000),
      new java.sql.Timestamp(base + (startSec + lenSec) * 1000)))
    val genPoints = Gen.listOfN(60, for {
      k <- Gen.choose(0L, 3L)
      sec <- Gen.choose(0L, 100800L)
    } yield (k, new java.sql.Timestamp(base + sec * 1000)))
    val ivsSets = samples(genIntervals, 3)
    val ptsSets = samples(genPoints, 3)
    ivsSets.zip(ptsSets).zipWithIndex.foreach { case ((ivsL, ptsL), round) =>
      val ivs = ivsL.toDF("k", "s", "e")
      val pts = ptsL.toDF("k", "p")
      val naive = ivs.as("i").join(pts.as("pt"),
          col("i.k") === col("pt.k") &&
            col("pt.p") >= col("i.s") && col("pt.p") < col("i.e"))
        .select(col("i.k"), col("i.s"), col("i.e"), col("pt.p"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSeq.sorted(
          Ordering.by((t: (Long, java.sql.Timestamp, java.sql.Timestamp,
            java.sql.Timestamp)) => (t._1, t._2.getTime, t._3.getTime,
            t._4.getTime)))
      Seq(60L, 3600L, 86400L).foreach { bin =>
        val binned = graft.operators.RangeJoin.pointInInterval(
            ivs, pts, "s", "e", "p", keys = Seq("k"), binWidthSec = bin)
          .select(col("k"), col("s"), col("e"), col("p"))
          .collect().map(r => (r.getLong(0), r.getTimestamp(1),
            r.getTimestamp(2), r.getTimestamp(3))).toSeq.sorted(
            Ordering.by((t: (Long, java.sql.Timestamp, java.sql.Timestamp,
              java.sql.Timestamp)) => (t._1, t._2.getTime, t._3.getTime,
              t._4.getTime)))
        assert(binned == naive, s"round=$round bin=$bin")
      }
    }
  }

  test("repetition profile matches a brute-force recompute on random " +
      "token documents (top-gram fractions + dup-5-gram union coverage)") {
    import org.apache.spark.sql.functions.col
    val genDoc = Gen.listOfN(40, Gen.oneOf("a", "b", "c", "d", "e"))
      .map(_.mkString(" "))
    val texts = samples(genDoc, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.Repetition
      .profile(texts.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top2_count"), r.getAs[Double]("top2_frac"),
          r.getAs[Long]("top3_count"), r.getAs[Double]("dup5_cov")))
      .toMap
    texts.foreach { case (id, t) =>
      val toks = t.split(" ").toSeq
      // mkString the grams: sliding on an Array yields Arrays, which
      // groupBy(identity) compares by REFERENCE
      def topN(n: Int): Long = toks.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size).max.toLong
      // union coverage of within-doc duplicated 5-gram windows
      val grams5 = toks.sliding(5).map(_.mkString(" ")).toSeq.zipWithIndex
      val dupPos = grams5.groupBy(_._1).values.filter(_.size >= 2)
        .flatten.map(_._2).toSeq
      val covered = dupPos.flatMap(p => p until p + 5).distinct.size
      val (t2c, t2f, t3c, cov) = got(id)
      assert(t2c == topN(2) && t3c == topN(3))
      assert(t2f == topN(2) * 2.0 / toks.length)
      assert(cov == covered.toDouble / toks.length,
        s"id=$id cov=$cov expect ${covered.toDouble / toks.length}")
    }
  }

  test("incremental near-dups equal the cross-slice filter of all-pairs " +
      "jaccard on random corpora with planted near-duplicates") {
    val genBase = Gen.listOfN(30,
      Gen.oneOf("t1", "t2", "t3", "t4", "t5", "t6", "t7", "t8"))
    samples(Gen.listOfN(12, genBase), 3).foreach { base =>
      // plant a near-dup of each even doc: same tokens, one appended
      val docs = base.zipWithIndex.flatMap { case (toks, i) =>
        val orig = (i.toLong, toks.mkString(" "))
        if (i % 2 == 0)
          Seq(orig, (i + 100L, (toks :+ "zz").mkString(" ")))
        else Seq(orig)
      }
      val df = docs.toDF("id", "text")
      val batch = df.filter($"id" < 100)
      val corpus = df.filter($"id" >= 100)
      val got = graft.operators.Dedup.incrementalNearDups(
          batch, corpus, "text", "id", n = 3, k = 64, bands = 32,
          minJaccard = 0.5)
        .select($"id_b", $"id_c").as[(Long, Long)].collect().toSet
      val exact = graft.operators.Dedup.ngramJaccardPairs(
          df, "text", "id", n = 3, minJaccard = 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect()
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .filter { case (x, y) => x < 100 && y >= 100 }.toSet
      assert(got == exact)
      assert(exact.nonEmpty) // the planted twins must register
    }
  }

  test("Hadamard rotation is a scaled involution (H(Hx) = d·x) and " +
      "preserves exact distance ratios on arbitrary integer vectors") {
    import graft.operators.Pq
    val d = 16
    val genVec = Gen.listOfN(d, Gen.choose(-1000L, 1000L))
    samples(Gen.listOfN(3, genVec), 20).foreach { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val once = Pq.hadamardRotate(df, "v", d)
        .as[(Long, Seq[Long])].collect().toMap
      val twice = Pq.hadamardRotate(
          Pq.hadamardRotate(df, "v", d), "v", d)
        .as[(Long, Seq[Long])].collect().toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        assert(twice(i.toLong) == v.map(_ * d), s"involution at $i")
        // driver-side FWHT agrees with the column path
        assert(Pq.fwhtLocal(v.toArray).toSeq == once(i.toLong))
      }
      // exact uniform distance scaling between the three vectors
      def d2(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      for (i <- 0 until 3; j <- (i + 1) until 3) {
        assert(d2(once(i.toLong), once(j.toLong)) ==
          d * d2(vecs(i), vecs(j)))
      }
    }
  }

  test("sequence packing conserves tokens exactly and tiles sequences " +
      "with no gaps for arbitrary length lists") {
    import graft.operators.Packing
    val genLens = Gen.listOfN(40, Gen.choose(0L, 50L))
    samples(genLens, 10).foreach { lens =>
      val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      val got = Packing.concatChunk(docs.toDF("id", "n"), "id", "n",
          seqLen = 32)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .sortBy(_._1)
      // offsets tile exactly: tok_start(i+1) = tok_start(i) + n(i)
      got.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._2)
        case _ =>
      }
      assert(got.head._3 == 0)
      // total conservation + consistent first/last/offset arithmetic
      assert(got.map(_._2).sum == lens.sum)
      got.foreach { case (_, n, start, first, last, off) =>
        assert(first == start / 32 && off == start % 32)
        assert(last == (if (n > 0) (start + n - 1) / 32 else first))
      }
    }
  }

  test("aligned packing never straddles a boundary and never overlaps " +
      "for arbitrary length lists") {
    import graft.operators.Packing
    val genLens = Gen.listOfN(40, Gen.choose(0L, 32L))
    samples(genLens, 10).foreach { lens =>
      val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      val got = Packing.alignedPack(docs.toDF("id", "n"), "id", "n",
          seqLen = 32)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(got.length == lens.length) // every doc placed exactly once
      got.foreach { case (_, n, pad, _, off, waste) =>
        // pad is the NEXT power of two and waste is its excess
        assert((pad & (pad - 1)) == 0 && pad >= math.max(n, 1) &&
          (pad == 1 || pad / 2 < math.max(n, 1)))
        assert(waste == pad - n)
        // the buddy alignment theorem: start is a multiple of pad, so
        // the padded span never crosses the seqLen boundary
        assert(off % pad == 0 && off + pad <= 32)
      }
      // padded spans tile each bin without overlap
      got.groupBy(_._4).values.foreach { bin =>
        val spans = bin.map(d => (d._5, d._5 + d._3)).sortBy(_._1)
        spans.sliding(2).foreach {
          case Array(a, b) => assert(b._1 >= a._2)
          case _ =>
        }
      }
      // replays the serial reference layout exactly
      var cum = 0L
      val serial = docs.map { case (i, n) =>
        val pad = Iterator.iterate(1L)(_ * 2).find(_ >= n).get
        (i, pad)
      }.sortBy { case (i, pad) => (-pad, i) }.map { case (i, pad) =>
        val start = cum; cum += pad
        i -> ((start / 32, start % 32))
      }.toMap
      got.foreach { case (i, _, _, b, off, _) =>
        assert(serial(i) == ((b, off)))
      }
    }
  }

  test("leakage-safe splits assign every row, never split a group, " +
      "and roughly respect the requested fractions") {
    import graft.operators.Sample
    val docs = (0L until 600L).map(i => (i, s"g${i % 150}"))
    val got = Sample.groupedSplitAssign(docs.toDF("id", "text"), "id",
        org.apache.spark.sql.functions.md5($"text"),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .as[(Long, String, String)].collect()
    assert(got.length == 600)
    assert(got.groupBy(_._2).values.forall(_.map(_._3).toSet.size == 1))
    val trainFrac = got.count(_._3 == "train").toDouble / got.length
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train frac $trainFrac")
  }

  test("HDR bucket law holds over the FULL nonneg long domain and the " +
      "Spark bin()-arithmetic bucket equals the JVM " +
      "numberOfLeadingZeros bucket (the streaming-twin equivalence, " +
      "pinned beyond the gate fixture's small values)") {
    import graft.operators.Sketch
    val b = 5
    def jvmWidth(v: Long): Long = {
      val e = if (v <= 0L) 0
        else 63 - java.lang.Long.numberOfLeadingZeros(v)
      if (e <= b) 1L else 1L << (e - b)
    }
    val edges = (0 to 61).flatMap(e => Seq((1L << e) - 1, 1L << e,
      (1L << e) + 1)).filter(_ >= 0)
    val rand = samples(Gen.choose(0L, 1L << 62), 300)
    val probe = (edges ++ rand).distinct
    val got = probe.toDF("v").select($"v",
        Sketch.hdrBucketLb($"v", b).as("lb"),
        Sketch.hdrWidth($"v", b).as("w"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == probe.length)
    got.foreach { case (v, lb, w) =>
      val jw = jvmWidth(v)
      assert(w == jw && lb == v - v % jw,
        s"v=$v: spark (lb=$lb, w=$w) vs jvm (lb=${v - v % jw}, w=$jw)")
      assert(lb <= v && v < lb + w)
      if (v >= (1L << (b + 1)))
        assert(w.toDouble / lb <= math.pow(2.0, -b) * 1.0001)
    }
  }

  test("retrievalMetrics equals a brute-force exact-rational reference " +
      "on random runs/truths (dup rows, missing truth, R=0 groups all " +
      "exercised)") {
    import graft.operators.Fusion
    val k = 10
    val L = 2520L // lcm(1..10)
    val genCase = for {
      nItems <- Gen.choose(5, 30)
      relFrac <- Gen.choose(0, 10)
      dups <- Gen.choose(0, 3)
    } yield (nItems, relFrac, dups)
    samples(genCase, 12).zipWithIndex.foreach {
      case ((nItems, relFrac, dups), ci) =>
        val grps = Seq("g1", "g2", "g3")
        val rng = new scala.util.Random(1000 + ci)
        val run = grps.flatMap { g =>
          val items = rng.shuffle((0 until nItems).toList).take(k)
          items.zipWithIndex.map { case (it, i) =>
            (g, s"it$it", (i + 1).toLong) } ++
            // contract-violating dup rows at a worse rank
            items.take(dups).map(it => (g, s"it$it", k.toLong))
        }
        val truth = grps.flatMap { g =>
          (0 until nItems).filter(_ => rng.nextInt(10) < relFrac)
            .map(it => (g, s"it$it"))
        }
        // brute force over collapsed best ranks, exact integers only
        val collapsed = run.groupBy(r => (r._1, r._2))
          .map { case ((g, it), rs) => (g, it, rs.map(_._3).min) }
        val expected = grps.map { g =>
          val rel = truth.filter(_._1 == g).map(_._2).toSet
          val hits = collapsed.filter(r => r._1 == g && rel(r._2))
            .map(_._3).toSeq.sorted
          val apNum = hits.zipWithIndex
            .map { case (r, i) => (i + 1) * (L / r) }.sum
          val rrNum = hits.headOption.map(L / _).getOrElse(0L)
          (g, (rel.size.toLong, hits.size.toLong, hits.headOption,
            rrNum, apNum))
        }.toMap
        val got = Fusion.retrievalMetrics(run.toDF("g", "it", "rk"),
            truth.toDF("g", "it"), "g", "it", "rk", k)
          .select($"grp", $"n_rel", $"hits_at_k", $"first_rel_rank",
            $"rr_num", $"ap_num", $"p_at_k", $"r_at_k", $"rr", $"ap")
          .as[(String, Long, Long, Option[Long], Long, Long, Double,
            Option[Double], Double, Option[Double])].collect()
        assert(got.length == grps.length)
        got.foreach { case (g, nRel, hits, first, rrNum, apNum, p, r,
            rr, ap) =>
          val (eRel, eHits, eFirst, eRr, eAp) = expected(g)
          assert((nRel, hits, first, rrNum, apNum) ==
            (eRel, eHits, eFirst, eRr, eAp),
            s"case $ci $g: got ($nRel,$hits,$first,$rrNum,$apNum) vs " +
              s"brute ($eRel,$eHits,$eFirst,$eRr,$eAp)")
          // derived doubles: single exact-integer divisions
          assert(p == hits.toDouble / k && rr == rrNum.toDouble / L)
          assert(r == (if (nRel > 0) Some(hits.toDouble / nRel) else None))
          assert(ap == (if (nRel > 0)
            Some(apNum.toDouble / (L * math.min(nRel, k.toLong)))
          else None))
          assert(p >= 0 && p <= 1 && rr >= 0 && rr <= 1)
          r.foreach(x => assert(x >= 0 && x <= 1))
          ap.foreach(x => assert(x >= 0 && x <= 1))
        }
    }
  }

  test("JWS ES384 raw<->DER signature conversion roundtrips arbitrary " +
      "(r, s) values including high-bit and short ones") {
    import graft.api.Jwt.{derToRaw, rawToDer}
    val genRaw = Gen.containerOfN[Array, Byte](96, Gen.choose(
      Byte.MinValue, Byte.MaxValue))
    samples(genRaw, 100).foreach { raw =>
      assert(derToRaw(rawToDer(raw)).sameElements(raw))
    }
    // leading-zero r/s (short integers) and high-bit values
    val edge = new Array[Byte](96)
    edge(47) = 1 // r = 1
    java.util.Arrays.fill(edge, 48, 96, 0xff.toByte) // s = 2^384-1
    assert(derToRaw(rawToDer(edge)).sameElements(edge))
  }

  test("aucRoc equals the brute-force pairwise count (ties = 1/2) on " +
      "randomized score/label fixtures — the Mann-Whitney identity " +
      "over the distinct-score walk, seeded and replayable") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 5) {
      val n = 60 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        // few distinct scores so ties are dense
        ("g", (rnd.nextInt(9)).toLong, rnd.nextBoolean())
      }
      val got = graft.operators.Classifier.aucRoc(
          rows.toDF("g", "s", "gold"), "g", "s", "gold")
        .select(col("n_pos"), col("n_neg"), col("u2_num"))
        .as[(Long, Long, Long)].collect().head
      val pos = rows.filter(_._3).map(_._2)
      val neg = rows.filterNot(_._3).map(_._2)
      // 2U = 2*(wins) + ties over all (pos, neg) pairs
      val u2 = pos.map(p => neg.map(q =>
        if (p > q) 2L else if (p == q) 1L else 0L).sum).sum
      assert((got._1, got._2) == ((pos.size.toLong, neg.size.toLong)),
        s"trial $trial class counts")
      assert(got._3 == u2, s"trial $trial: walk ${got._3} vs brute $u2")
    }
  }

  test("trimmedMeanCensus equals the sort-based brute force for " +
      "randomized values and trim levels — the interval-overlap walk " +
      "never drops or double-counts a straddling tie block") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 0 until 5) {
      val n = 30 + rnd.nextInt(70)
      val trim = Seq(0, 50, 100, 200, 450)(trial)
      val vals = (0 until n).map(_ => rnd.nextInt(12).toLong)
      val got = graft.operators.Stats.trimmedMeanCensus(
          vals.map(("g", _)).toDF("g", "v"), "g", "v", trim)
        .select(col("n"), col("n_kept"), col("q_lo"), col("q_hi"),
          col("trimmed_sum"))
        .as[(Long, Long, Long, Long, Long)].collect().head
      val sorted = vals.sorted
      val t = (trim.toLong * n) / 1000
      val kept = sorted.slice(t.toInt, n - t.toInt)
      assert(got == ((n.toLong, n - 2 * t, sorted(t.toInt),
        sorted(n - t.toInt - 1), kept.sum)),
        s"trial $trial trim $trim: $got")
    }
  }

  test("topShare equals the sort-based brute force for randomized " +
      "values and top fractions") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 0 until 5) {
      val n = 30 + rnd.nextInt(70)
      val p = Seq(1, 100, 250, 500, 1000)(trial)
      val vals = (0 until n).map(_ => rnd.nextInt(15).toLong)
      val got = graft.operators.Stats.topShare(
          vals.map(("g", _)).toDF("g", "v"), "g", "v", p)
        .select(col("n_top"), col("top_sum"), col("total_sum"))
        .as[(Long, Long, Long)].collect().head
      val t = ((p.toLong * n) + 999) / 1000
      val sorted = vals.sorted
      assert(got == ((t, sorted.takeRight(t.toInt).sum, vals.sum)),
        s"trial $trial p $p: $got")
    }
  }
}
