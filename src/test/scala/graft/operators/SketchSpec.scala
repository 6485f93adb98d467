package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Count-min sketch: the deterministic overestimate contract. */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val items = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select(explode(split($"text", " ")).as("token"))

  test("estimate >= exact count for EVERY key, with equality for " +
      "most keys at a generous width") {
    val exact = items.groupBy($"token").agg(count(lit(1)).as("n"))
    val mat = Sketch.countMinMatrix(items, "token", d = 4, w = 4096)
    val joined = Sketch.countMinEstimates(mat, exact, "token", 4, 4096)
      .join(exact, $"key" === $"token")
      .select($"n", $"est").as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    assert(joined.forall { case (n, est) => est >= n },
      "count-min must never underestimate")
    val tight = joined.count { case (n, est) => est == n }
    assert(tight * 2 > joined.length,
      s"only $tight/${joined.length} exact at w=4096 — hashing broken?")
  }

  test("narrow sketch genuinely collides (est > exact somewhere) " +
      "and row totals conserve instance count") {
    val exact = items.groupBy($"token").agg(count(lit(1)).as("n"))
    val mat = Sketch.countMinMatrix(items, "token", d = 2, w = 32)
    val over = Sketch.countMinEstimates(mat, exact, "token", 2, 32)
      .join(exact, $"key" === $"token")
      .filter($"est" > $"n").count()
    assert(over > 0, "w=32 should collide on this corpus")
    val total = items.count()
    val rowTotals = mat.groupBy($"r").agg(sum($"c").as("s"))
      .select($"s").as[Long].collect()
    assert(rowTotals.length == 2 && rowTotals.forall(_ == total),
      "every sketch row must count every instance exactly once")
  }

  test("mergeMatrices(shards) == matrix(union) bit-exactly — the " +
      "property that makes the sketch distributed") {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def toks(df: DataFrame) =
      df.select(explode(split($"text", " ")).as("token"))
    val full = Sketch.countMinMatrix(toks(docs), "token", 4, 128)
      .as[(Int, Int, Long)].collect().toSet
    val merged = Sketch.mergeMatrices(Seq(
        Sketch.countMinMatrix(toks(docs.filter($"doc_id" % 3 === 0)),
          "token", 4, 128),
        Sketch.countMinMatrix(toks(docs.filter($"doc_id" % 3 === 1)),
          "token", 4, 128),
        Sketch.countMinMatrix(toks(docs.filter($"doc_id" % 3 === 2)),
          "token", 4, 128)))
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == full)
  }

  test("absent keys estimate from whatever occupies their buckets — " +
      "never negative, zero on an empty matrix") {
    val mat = Sketch.countMinMatrix(items.limit(0), "token", 4, 64)
    val probes = Seq("zzz", "qqq").toDF("token")
    val got = Sketch.countMinEstimates(mat, probes, "token", 4, 64)
      .select($"est").as[Long].collect()
    assert(got.toSeq == Seq(0L, 0L))
  }

  // ---- theta / KMV ---------------------------------------------------

  private def thetaItems = {
    // two groups over a synthetic universe with a KNOWN overlap:
    // ga = keys 0..599, gb = keys 400..999 → |∩| = 200, |ga| = 600
    val rows = (0 until 600).map(i => ("ga", s"key-$i")) ++
      (400 until 1000).map(i => ("gb", s"key-$i"))
    rows.toDF("grp0", "key")
  }

  test("thetaEstimate is EXACT below saturation (the sketch IS the " +
      "set) and within the KMV error envelope above it") {
    val items = thetaItems
    // k larger than both sets: exact distinct counts
    val exact = Sketch.thetaEstimate(
        Sketch.thetaSketch(items, "grp0", "key", k = 1024), k = 1024)
      .select($"grp", $"est").as[(String, Long)].collect().toMap
    assert(exact == Map("ga" -> 600L, "gb" -> 600L))
    // k = 64 on 600 distinct: rel err should sit within ~4/sqrt(k)
    val est = Sketch.thetaEstimate(
        Sketch.thetaSketch(items, "grp0", "key", k = 64), k = 64)
      .select($"grp", $"est").as[(String, Long)].collect().toMap
    est.foreach { case (g, e) =>
      assert(math.abs(e - 600.0) / 600.0 < 4.0 / math.sqrt(64.0),
        s"$g estimated $e for 600 — outside the KMV envelope")
    }
  }

  test("thetaMerge(sketch(A), sketch(B)) == thetaSketch(A ∪ B) " +
      "bit-exactly — the 100 TB partitioned-build property") {
    val items = thetaItems
    val k = 64
    val full = Sketch.thetaSketch(items, "grp0", "key", k)
      .as[(String, Long)].collect().toSet
    val merged = Sketch.thetaMerge(Seq(
        Sketch.thetaSketch(items.filter(length($"key") % 2 === 0),
          "grp0", "key", k),
        Sketch.thetaSketch(items.filter(length($"key") % 2 === 1),
          "grp0", "key", k)), k)
      .as[(String, Long)].collect().toSet
    assert(merged == full)
  }

  test("thetaPaneWindows(thetaPaneSketch(data)) == the direct " +
      "sliding-window sketch hash-for-hash — the 'no pane, no gain' " +
      "identity that makes the one-pass pane build exact") {
    val S = 100L // slide width
    val m = 4 // panes per window (window size = 400)
    val k = 8
    val rows = (0 until 500).map { i =>
      (if (i % 2 == 0) "ga" else "gb", s"k${i % 97}",
        (i.toLong * 37) % 1000)
    }.toDF("g", "key", "t")
      .withColumn("pane", expr(s"(t DIV ${S}L) * ${S}L"))
    val paned = Sketch.thetaPaneWindows(
        Sketch.thetaPaneSketch(rows, "g", "key", "pane", k), S, m, k)
      .as[(String, Long, Long)].collect().toSet
    // the q236 shape: replicate DATA rows to their windows, then
    // sketch each (group, window) directly
    val direct = Sketch.thetaSketch(
        rows.select($"g", $"key", $"pane",
            explode(sequence(lit(0L), lit((m - 1).toLong))).as("j"))
          .select(concat_ws("/", $"g", $"pane" - $"j" * lit(S))
            .as("gw"), $"key"),
        "gw", "key", k)
      .select(substring_index($"grp", "/", 1),
        substring_index($"grp", "/", -1).cast("long"), $"h")
      .as[(String, Long, Long)].collect().toSet
    assert(paned == direct)
  }

  // ---- HDR quantile histogram -----------------------------------------

  /** Deterministic values spanning 6 decades plus the exact region. */
  private def hdrItems = {
    val vals = (0 until 3000).map(i => (i.toLong * i * 31 + i) % 900001L)
    vals.zipWithIndex.map { case (v, i) =>
      (if (i % 2 == 0) "ga" else "gb", v) }.toDF("g", "v")
  }

  test("hdr buckets: exact below 2^b, and bracket width obeys the " +
      "2^-b relative-error law at every magnitude") {
    val b = 5
    val probe = (0L until 64L) ++ Seq(63L, 64L, 65L, 1000L, 12345L,
      999999L, (1L << 40) + 12345L)
    val got = probe.toDF("v").select($"v",
        Sketch.hdrBucketLb($"v", b).as("lb"),
        Sketch.hdrWidth($"v", b).as("w"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (v, lb, w) =>
      assert(lb <= v && v < lb + w, s"v=$v outside [$lb, ${lb + w})")
      if (v < (1L << (b + 1))) assert(w == 1L, s"v=$v not exact")
      else assert(w.toDouble / lb <= math.pow(2.0, -b) * 1.0001,
        s"v=$v width $w at lb=$lb breaches 2^-$b")
    }
  }

  test("hdrQuantiles brackets the TRUE order statistic for every " +
      "group and permille, at sketch sizes bounded by (64-b)*2^b") {
    val b = 5
    val items = hdrItems
    val sk = Sketch.hdrSketch(items, "g", "v", b)
    val cells = sk.groupBy($"grp").agg(count(lit(1)).as("c"))
      .select($"c").as[Long].collect()
    assert(cells.forall(_ <= (64 - b).toLong * (1L << b) + (1L << b)),
      s"sketch cells ${cells.toSeq} exceed the bound")
    val est = Sketch.hdrQuantiles(sk, Seq(250, 500, 900, 990, 1000), b)
      .select($"grp", $"permille", $"n", $"est_lb", $"est_ub")
      .as[(String, Int, Long, Long, Long)].collect()
    assert(est.length == 10)
    val byGrp = items.as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    est.foreach { case (g, p, n, lo, hi) =>
      val sorted = byGrp(g)
      assert(n == sorted.length)
      val r = math.max(1, (p.toLong * n + 999) / 1000).toInt
      val truth = sorted(r - 1)
      assert(lo <= truth && truth <= hi,
        s"$g p$p: true $truth outside bracket [$lo, $hi]")
      assert(hi - lo + 1 <= math.max(1.0, lo * math.pow(2.0, -b) * 1.0001),
        s"$g p$p: bracket [$lo, $hi] wider than the guarantee")
    }
  }

  test("hdrMerge(shards) == hdrSketch(union) bit-exactly, and " +
      "integer weights == row replication") {
    val b = 5
    val items = hdrItems
    val full = Sketch.hdrSketch(items, "g", "v", b)
      .as[(String, Long, Long)].collect().toSet
    val merged = Sketch.hdrMerge(Seq(
        Sketch.hdrSketch(items.filter($"v" % 2 === 0), "g", "v", b),
        Sketch.hdrSketch(items.filter($"v" % 2 === 1), "g", "v", b)))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == full)
    // weight w == the row repeated w times (w = 0 contributes nothing)
    val weighted = items.withColumn("w", ($"v" % 4).cast("long"))
    val viaWeights = Sketch.hdrSketch(weighted, "g", "v", b,
        weightCol = Some("w"))
      .filter($"cnt" > 0).as[(String, Long, Long)].collect().toSet
    val viaRepeat = Sketch.hdrSketch(
        weighted.select($"g", explode(array_repeat($"v",
          ($"v" % 4).cast("int"))).as("v")), "g", "v", b)
      .as[(String, Long, Long)].collect().toSet
    assert(viaWeights == viaRepeat)
  }

  test("thetaIntersectPairs: exact when both groups are unsaturated; " +
      "inside the sampling envelope when saturated; the direct " +
      "estimator (no inclusion-exclusion) stays sane on a small " +
      "intersection") {
    val items = thetaItems
    // unsaturated: the retained sets ARE the sets → exact 200
    val exactRow = Sketch.thetaIntersectPairs(
        Sketch.thetaSketch(items, "grp0", "key", k = 1024), k = 1024)
      .select($"grp_a", $"grp_b", $"n_common", $"est_inter")
      .as[(String, String, Long, Long)].collect()
    assert(exactRow.toSeq == Seq(("ga", "gb", 200L, 200L)))
    // saturated at k = 128 of 600: |∩|/|set| = 1/3, so the retained
    // common count is ~k/3 ≈ 43 → σ ≈ 15%; assert a generous 4σ
    val est = Sketch.thetaIntersectPairs(
        Sketch.thetaSketch(items, "grp0", "key", k = 128), k = 128)
      .select($"est_inter").as[Long].head()
    assert(math.abs(est - 200.0) / 200.0 < 0.6,
      s"saturated intersection estimated $est for 200")
  }
}
