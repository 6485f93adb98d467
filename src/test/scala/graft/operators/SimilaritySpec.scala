package graft.operators

import graft.SparkSuite
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("native VecDot matches the HOF formulation bit-for-bit") {
    val hof = expr(
      """aggregate(zip_with(embedding, embedding,
           (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
    val diffs = emb.select(
        VectorFunctions.dot($"embedding", $"embedding").as("native"),
        hof.as("hofv"))
      .filter($"native" =!= $"hofv").count()
    assert(diffs == 0)
  }

  test("brute-force top-k: scores descend, self excluded, k respected") {
    val top = Similarity.topKForId(emb, "embedding", "vec_id",
      queryId = 0, k = 10).collect()
    assert(top.length == 10)
    val sims = top.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(!top.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("knn join agrees with per-query brute force") {
    val knn = Similarity.knnJoin(
      emb.filter($"vec_id" < 3), emb,
      "embedding", "vec_id", "embedding", "vec_id", k = 5)
    val grouped = knn.collect().groupBy(_.getAs[Long]("query_id"))
    (0L until 3L).foreach { q =>
      val mine = grouped(q).sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Long]("item_id")).toSeq
      val brute = Similarity.topKForId(emb, "embedding", "vec_id", q, 5)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(mine == brute, s"query $q: $mine vs $brute")
    }
  }

  test("marginMining == full driver replay of the Artetxe-Schwenk " +
      "ratio margin on the real corpus (bit-exact values, cut, ranks)") {
    val k = 5
    val rows = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val left = rows.filter(_._1 % 2 == 0)
    val right = rows.filter(_._1 % 2 == 1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(l: Array[Float], r: Array[Float]) =
      dot(r, l) / (math.sqrt(dot(r, r)) * math.sqrt(dot(l, l)))
    val sims = for ((lid, lv) <- left; (rid, rv) <- right)
      yield (lid, rid, cos(lv, rv))
    val bySrc = sims.groupBy(_._1).view.mapValues(
      _.sortBy(t => (-t._3, t._2)).take(k)).toMap
    val byDst = sims.groupBy(_._2).view.mapValues(
      _.sortBy(t => (-t._3, t._1)).take(k)).toMap
    // fixed-point replay: floor(cos*1e18) longs, exact integer sum,
    // then the operator's rounded-op chain in the same order
    def avg(ts: Seq[(Long, Long, Double)]) =
      ts.map(t => BigInt(math.floor(t._3 * 1e18).toLong)).sum
        .doubleValue / 1e18 / ts.length.toDouble
    val expect = bySrc.toSeq.flatMap { case (src, cands) =>
      val scored = cands.map { case (_, dst, c) =>
        (dst, c, c / ((avg(bySrc(src)) + avg(byDst(dst))) / 2.0)) }
      scored.sortBy(t => (-t._3, t._1)).headOption
        .map { case (dst, c, m) => (src, dst, c, m) }
    }.sortBy(t => (-t._4, t._1)).take(30)
      .zipWithIndex.map { case ((s0, d0, c, m), i) =>
        (s0, d0, c, m, (i + 1).toLong) }
    val got = Similarity.marginMining(
        emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1),
        "embedding", "vec_id", "embedding", "vec_id", k = k, n = 30)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
      .sortBy(_._5)
    assert(got == expect,
      s"first diff: ${got.zip(expect).find(p => p._1 != p._2)}")
    // hub discount property: an exact duplicate pair must outrank a
    // pair whose target is a hub equally close to several sources
    val l2 = Seq((0L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (4L, Array(0.1f, 0.1f, 1f))).toDF("vec_id", "embedding")
    val r2 = Seq((1L, Array(1f, 0f, 0f)),
      (3L, Array(0.6f, 0.6f, 0.52f))).toDF("vec_id", "embedding")
    val mm = Similarity.marginMining(l2, r2, "embedding", "vec_id",
        "embedding", "vec_id", k = 2, n = 10)
      .as[(Long, Long, Double, Double, Long)].collect()
    val best = mm.minBy(_._5)
    assert((best._1, best._2) == ((0L, 1L)), mm.mkString(", "))
    intercept[IllegalArgumentException] {
      Similarity.marginFromSims(l2.select($"vec_id".as("src_id"),
        $"vec_id".as("dst_id"), lit(1.0).as("cos")), 0, 5)
    }
  }

  test("marginMining maxBuild guard: a corpus-sized left side fails " +
      "fast instead of building the N^2 cross product (r13 item 2)") {
    val err = intercept[IllegalArgumentException] {
      Similarity.marginMining(
        emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1),
        "embedding", "vec_id", "embedding", "vec_id", k = 5, n = 30,
        maxBuild = 3)
    }
    assert(err.getMessage.contains("maxBuild"), err.getMessage)
    // a bounded probe batch passes the same guard
    assert(Similarity.marginMining(
      emb.filter($"vec_id" < 6 && $"vec_id" % 2 === 0),
      emb.filter($"vec_id" % 2 === 1),
      "embedding", "vec_id", "embedding", "vec_id", k = 5, n = 30,
      maxBuild = 3).count() > 0)
  }

  test("signBitCandidates == driver replay of sign buckets + per-bucket " +
      "cap + table-union pairs + exact cosine, and is a strict subset " +
      "of all pairs; marginMiningLsh over it matches marginFromSims on " +
      "the replayed candidates (bit-exact)") {
    val tables = 4; val planes = 6; val cap = 8 // small cap so it BINDS
    val rows = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val left = rows.filter(_._1 % 2 == 0).sortBy(_._1)
    val right = rows.filter(_._1 % 2 == 1).sortBy(_._1)
    def bucket(v: Array[Float], t: Int): Long =
      (0 until planes).map(j =>
        if (v(t * planes + j).toDouble >= 0) 1L << j else 0L).sum
    // per (table, bucket, side) keep the first `cap` by id
    def capped(side: Array[(Long, Array[Float])]) =
      (0 until tables).flatMap { t =>
        side.map { case (id, v) => (t, bucket(v, t), id, v) }
          .groupBy(x => (x._1, x._2)).toSeq
          .flatMap { case (_, g) => g.sortBy(_._3).take(cap) }
      }
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val expectPairs = (for {
      (t, b, lid, lv) <- capped(left)
      (t2, b2, rid, rv) <- capped(right)
      if t == t2 && b == b2
    } yield ((lid, rid),
        dotD(lv, rv) / (math.sqrt(dotD(lv, lv)) * math.sqrt(dotD(rv, rv)))))
      .toMap // table collisions dedup to one (identical) cos
    val got = Similarity.signBitCandidates(
        emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1),
        "embedding", "vec_id", "embedding", "vec_id",
        tables, planes, 64, cap)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expectPairs,
      s"sizes ${got.size} vs ${expectPairs.size}; first diff: " +
        s"${got.toSeq.sortBy(_._1).zip(expectPairs.toSeq.sortBy(_._1))
          .find(p => p._1 != p._2)}")
    assert(got.size < left.length.toLong * right.length,
      "candidates must be a strict subset of all pairs")
    // the cap binds on this fixture (some bucket exceeds `cap` rows)
    val occ = (0 until tables).flatMap(t =>
      left.groupBy(x => bucket(x._2, t)).values.map(_.length))
    assert(occ.max > cap, s"cap $cap never binds (max occupancy ${occ.max})")
    // end-to-end: marginMiningLsh == marginFromSims over the candidates
    val viaOp = Similarity.marginMiningLsh(
        emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1),
        "embedding", "vec_id", "embedding", "vec_id", k = 5, n = 30,
        numTables = tables, planesPerTable = planes, dim = 64,
        maxBucket = cap)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    val viaSims = Similarity.marginFromSims(
        expectPairs.toSeq.map { case ((s0, d0), c) => (s0, d0, c) }
          .toDF("src_id", "dst_id", "cos"), k = 5, n = 30)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(viaOp == viaSims)
  }

  test("VecMean typed Aggregator equals the long-form centroid query") {
    import graft.functions.VecMean
    val byAgg = emb.as[(Long, Array[Float], Int)]
      .groupByKey(_._3)
      .mapValues(_._2)
      .agg(VecMean.toColumn.name("centroid"))
      .collect().toMap
    // compare against plain SQL per-position means (double arithmetic)
    val longForm = emb.select($"label",
        posexplode($"embedding").as(Seq("p", "e")))
      .groupBy($"label", $"p")
      .agg((sum($"e".cast("double")) / count(lit(1))).as("m"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).map { case (l, xs) =>
        l -> xs.sortBy(_._2).map(_._3).toArray }
    longForm.foreach { case (l, exp) =>
      val got = byAgg(l)
      assert(got.length == exp.length)
      got.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("IVF ANN: probing a quarter of the lists recovers most of the " +
      "exact top-k; full probe equals brute force") {
    val k = 10
    val brute = Similarity.topKForId(emb, "embedding", "vec_id", 0, k)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val ivf = Similarity.ivfTopKForId(emb, "embedding", "vec_id",
      queryId = 0, k = k, nLists = 8, nProbes = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (ivf & brute.toSet).size.toDouble / k
    assert(recall >= 0.3, s"ivf recall $recall")
    // probing every list = exact brute force (same order, same ids)
    val full = Similarity.ivfTopKForId(emb, "embedding", "vec_id",
      queryId = 0, k = k, nLists = 8, nProbes = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == brute)
  }

  test("LSH ANN: results ⊆ corpus, no self, recall vs brute force ≥ 0.3; " +
      "probing every bucket equals brute force exactly") {
    val k = 20
    // synthetic embeddings are near-isotropic — LSH's hardest case — so
    // a quarter of the buckets is the honest probe budget for recall
    val ann = Similarity.lshTopKForId(emb, "embedding", "vec_id",
      queryId = 0, k = k, numPlanes = 8, dim = 64, probes = 64)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val brute = Similarity.topKForId(emb, "embedding", "vec_id", 0, k)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(!ann.contains(0L))
    assert(ann.size <= k)
    val recall = (ann & brute.toSet).size.toDouble / k
    assert(recall >= 0.3, s"recall $recall too low")
    // the identity anchor: all 2^planes buckets probed == exact result
    val full = Similarity.lshTopKForId(emb, "embedding", "vec_id",
      queryId = 0, k = k, numPlanes = 8, dim = 64, probes = 256)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == brute)
  }

  test("multi-table LSH: numTables=1 is exactly the single-table path, " +
      "full probe of every table equals brute force, and the union " +
      "candidate set is strictly larger than one table's at the same " +
      "per-table budget") {
    val k = 20
    val brute = Similarity.topKForId(emb, "embedding", "vec_id", 0, k)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    // table 0 uses the same seed as lshTopKForId → identical results
    val single = Similarity.lshTopKForId(emb, "embedding", "vec_id",
      queryId = 0, k = k, numPlanes = 8, dim = 64, probes = 64)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val one = Similarity.lshTopKForIdTables(emb, "embedding", "vec_id",
      queryId = 0, k = k, numTables = 1, numPlanes = 8, dim = 64,
      probesPerTable = 64)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(one == single)
    // identity anchor for the union logic: all buckets of all tables
    val full = Similarity.lshTopKForIdTables(emb, "embedding", "vec_id",
      queryId = 0, k = k, numTables = 3, numPlanes = 6, dim = 64,
      probesPerTable = 64)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == brute)
    // the OR-construction's point: more independent tables at the same
    // per-table probe budget can only widen the candidate set
    val c1 = Similarity.lshTableCandidates(emb, "embedding", "vec_id",
      0, 1, 8, 64, 8)._1.count()
    val c4 = Similarity.lshTableCandidates(emb, "embedding", "vec_id",
      0, 4, 8, 64, 8)._1.count()
    assert(c4 >= c1, s"union candidates $c4 < single-table $c1")
  }

  test("multi-probe order: own bucket first, full budget covers every " +
      "bucket, and low-margin flips probe before high-margin flips") {
    // plane 0 nearly orthogonal to q (tiny margin), plane 1 aligned
    // (huge margin): flipping bit 0 must rank before flipping bit 1
    val planes = Seq(Seq(0.01, 1.0), Seq(1.0, 0.01))
    val q = Seq(1.0, 0.0)
    val sig = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(q).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
    }.sum
    val order = Similarity.probeOrder(q, planes, sig, probes = 4)
    assert(order.head == sig, "own bucket must be probed first")
    assert(order.toSet == (0L until 4L).toSet,
      "full budget must enumerate every bucket exactly once")
    // next after the own bucket: the single-bit flip of the SMALLEST
    // margin plane (plane 0), then plane 1's flip, then both
    assert(order(1) == (sig ^ 1L),
      s"expected low-margin flip ${sig ^ 1L} second, got ${order(1)}")
    assert(order(2) == (sig ^ 2L))
    assert(order(3) == (sig ^ 3L))
    // deterministic across calls
    assert(order == Similarity.probeOrder(q, planes, sig, probes = 4))
  }

  test("persisted IVF index: probe reads only the probed list " +
      "partitions and full probe equals brute force") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tempDir("ivf-idx-")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", dir, nLists = 8)
    val qv = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head().toSeq
    val probe = Similarity.ivfProbe(spark, dir, qv, k = 10, nProbes = 2,
      excludeId = Some(0L))
    val rows = probe.collect()
    assert(rows.length == 10)
    // partition pruning: of the 8 list directories only 2 are read
    val scan = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("lists")) => f
    }.head
    assert(scan.metrics("numFiles").value == 2,
      s"expected 2 pruned files, read ${scan.metrics("numFiles").value}")
    val full = Similarity.ivfProbe(spark, dir, qv, k = 10, nProbes = 8,
      excludeId = Some(0L)).collect().map(_.getAs[Long]("vec_id")).toSeq
    val brute = Similarity.topKForId(emb, "embedding", "vec_id", 0, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == brute)
  }

  test("persisted LSH index: bucket partitions prune on probe; " +
      "full-bucket probe equals brute force") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tempDir("lsh-idx-")
    Similarity.buildLshIndex(emb, "embedding", "vec_id", dir,
      numPlanes = 6, dim = 64)
    val qv = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head().toSeq
    val probe = Similarity.lshProbe(spark, dir, qv, k = 10, probes = 4,
      excludeId = Some(0L))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val totalBuckets = spark.read.parquet(s"$dir/buckets")
      .select("bucket").distinct().count()
    assert(scan.metrics("numFiles").value <= 4,
      s"probe read ${scan.metrics("numFiles").value} files " +
        s"of $totalBuckets buckets")
    val full = Similarity.lshProbe(spark, dir, qv, k = 10, probes = 64,
      excludeId = Some(0L)).collect().map(_.getAs[Long]("vec_id")).toSeq
    val brute = Similarity.topKForId(emb, "embedding", "vec_id", 0, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == brute)
  }

  test("int8 quantization: codes bounded, error within half a step, " +
      "and quantized cosine preserves the exact top-k ranking") {
    import graft.functions.VectorFunctions._
    val scale = int8Scale($"embedding")
    val q = emb.select($"vec_id", scale.as("scale"),
      int8Codes($"embedding", scale).as("codes"),
      int8MaxError($"embedding", scale).as("max_err"))
    val rows = q.collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](2)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(codes.map(math.abs).max == 127) // max-abs element hits full range
      // half-up rounding error bound: |err| <= 0.5/scale
      assert(r.getDouble(3) <= 0.5 / r.getDouble(1) + 1e-12)
    }
    // ranking preservation: top-10 by dequantized cosine vs exact
    val deq = emb.select($"vec_id",
      transform(int8Codes($"embedding", scale),
        c => c.cast("double") / scale).as("dv"))
    val exact = Similarity.topKForId(emb, "embedding", "vec_id", 0, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val viaQ = Similarity.topKForId(deq, "dv", "vec_id", 0, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & viaQ).size >= 8, s"quantized top-10 lost ranking: " +
      s"overlap ${(exact & viaQ).size}")
  }

  test("indexStats reports per-partition counts summing to the corpus " +
      "and a sane imbalance ratio, for both index kinds") {
    val ivfDir = tempDir("ivf-stats-")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", ivfDir, nLists = 8)
    val ivf = Similarity.indexStats(spark, ivfDir).collect()
    assert(ivf.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    assert(ivf.forall(_.getAs[Double]("imbalance") >= 1.0))
    val lshDir = tempDir("lsh-stats-")
    Similarity.buildLshIndex(emb, "embedding", "vec_id", lshDir,
      numPlanes = 6, dim = 64)
    val lsh = Similarity.indexStats(spark, lshDir).collect()
    assert(lsh.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    // one imbalance value repeated on every row (max/mean of the counts)
    assert(lsh.map(_.getAs[Double]("imbalance")).distinct.length == 1)
  }

  test("incremental index upsert: building on half the corpus and " +
      "upserting the rest equals a full build — full probe still equals " +
      "brute force for both IVF and LSH") {
    val half = emb.count() / 2
    val first = emb.filter($"vec_id" < half)
    val rest = emb.filter($"vec_id" >= half)
    val qv = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head().toSeq
    val brute = Similarity.topKForId(emb, "embedding", "vec_id", 0, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq

    val ivfDir = tempDir("ivf-upsert-")
    Similarity.buildIvfIndex(first, "embedding", "vec_id", ivfDir,
      nLists = 8)
    Similarity.upsertIvfIndex(rest, "embedding", "vec_id", ivfDir)
    val ivfFull = Similarity.ivfProbe(spark, ivfDir, qv, k = 10,
        nProbes = 8, excludeId = Some(0L))
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivfFull == brute)
    assert(spark.read.parquet(s"$ivfDir/lists").count() == emb.count())

    val lshDir = tempDir("lsh-upsert-")
    Similarity.buildLshIndex(first, "embedding", "vec_id", lshDir,
      numPlanes = 6, dim = 64)
    Similarity.upsertLshIndex(rest, "embedding", "vec_id", lshDir)
    val lshFull = Similarity.lshProbe(spark, lshDir, qv, k = 10,
        probes = 64, excludeId = Some(0L))
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(lshFull == brute)
    assert(spark.read.parquet(s"$lshDir/buckets").count() == emb.count())
  }

  test("index delete: tombstoned probe equals a fresh-rebuild result, " +
      "compaction physically folds tombstones and preserves it, " +
      "tombstoned re-insert refuses until compaction — IVF and LSH") {
    import java.nio.file.{Files, Paths}
    val deleted = emb.filter($"vec_id" % 5 === 0)
    val survivors = emb.filter($"vec_id" % 5 =!= 0)
    val qv = emb.filter($"vec_id" === 1).select($"embedding")
      .as[Array[Float]].head().toSeq
    // what a fresh index built on the survivors would answer (full probe
    // == brute force, the proven identity)
    val want = Similarity.topKForId(survivors, "embedding", "vec_id", 1, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq

    val ivfDir = tempDir("ivf-del-")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", ivfDir, nLists = 8)
    Similarity.deleteFromIvfIndex(deleted.select($"vec_id"), "vec_id",
      ivfDir)
    def ivfTop: Seq[Long] =
      Similarity.ivfProbe(spark, ivfDir, qv, k = 10, nProbes = 8,
        excludeId = Some(1L)).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivfTop == want, "tombstoned probe diverged from fresh rebuild")
    // re-inserting a tombstoned id is refused until compaction
    intercept[IllegalArgumentException] {
      Similarity.upsertIvfIndex(emb.filter($"vec_id" === 0),
        "embedding", "vec_id", ivfDir)
    }
    Similarity.compactIndex(spark, ivfDir)
    assert(!Files.isDirectory(Paths.get(s"$ivfDir/tombstones")))
    assert(spark.read.parquet(s"$ivfDir/lists").count() == survivors.count())
    assert(ivfTop == want, "compaction changed the probe result")
    // across the compaction boundary the deleted id can come back
    Similarity.upsertIvfIndex(emb.filter($"vec_id" === 0),
      "embedding", "vec_id", ivfDir)
    assert(spark.read.parquet(s"$ivfDir/lists").count()
      == survivors.count() + 1)

    // a partition whose every row is deleted disappears from the layout
    val lists = spark.read.parquet(s"$ivfDir/lists")
    val victim = lists.groupBy($"__list").count()
      .orderBy($"count", $"__list").head.getInt(0)
    Similarity.deleteFromIvfIndex(
      lists.filter($"__list" === victim).select($"vec_id"), "vec_id",
      ivfDir)
    Similarity.compactIndex(spark, ivfDir)
    assert(!Files.isDirectory(Paths.get(s"$ivfDir/lists/__list=$victim")),
      s"emptied list $victim should have been dropped")

    val lshDir = tempDir("lsh-del-")
    Similarity.buildLshIndex(emb, "embedding", "vec_id", lshDir,
      numPlanes = 6, dim = 64)
    Similarity.deleteFromLshIndex(deleted.select($"vec_id"), "vec_id",
      lshDir)
    def lshTop: Seq[Long] =
      Similarity.lshProbe(spark, lshDir, qv, k = 10, probes = 64,
        excludeId = Some(1L)).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(lshTop == want)
    Similarity.compactIndex(spark, lshDir)
    assert(!Files.isDirectory(Paths.get(s"$lshDir/tombstones")))
    assert(spark.read.parquet(s"$lshDir/buckets").count()
      == survivors.count())
    assert(lshTop == want)
  }

  test("SQ8 compressed-domain top-k matches a driver-side replay of " +
      "the code cosine, and ranks close to exact cosine") {
    val rows = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().take(200)
    val got = Similarity.sq8TopKForId(
        rows.toSeq.toDF("vec_id", "embedding"),
        "embedding", "vec_id", queryId = rows.head._1, k = 15)
      .as[(Long, Double)].collect().toSeq
    // driver replay: q71's code formula, then cosine on code ints
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val qv = rows.head._2.map(_.toDouble)
    val qn = math.sqrt(dot(qv, qv))
    val expect = rows.tail.map { case (id, v) =>
      val scale = 127.0 / v.map(x => math.abs(x.toDouble)).max
      val c = v.map(x => math.floor(x.toDouble * scale + 0.5))
      id -> (dot(c, qv) / (math.sqrt(dot(c, c)) * qn))
    }.sortBy { case (id, sim) => (-sim, id) }.take(15)
    assert(got == expect.toSeq)
    // quality: overlap with exact-cosine top-15 is high (rounding-only
    // perturbation) — a regression here means the code path broke
    val exact = rows.tail.map { case (id, v) =>
      val dv = v.map(_.toDouble)
      id -> (dot(dv, qv) / (math.sqrt(dot(dv, dv)) * qn))
    }.sortBy { case (id, sim) => (-sim, id) }.take(15).map(_._1).toSet
    val overlap = got.map(_._1).count(exact) / 15.0
    assert(overlap >= 0.8, s"sq8-vs-exact overlap $overlap")
  }

  test("labelNoiseAudit flags a planted mislabeled point and nothing " +
      "else on separable clusters") {
    // three tight clusters; vec 20 sits in cluster 0 but carries
    // label 1 — its kNN majority is 0, so label 1 gets one disagree
    def vec(base: Int, j: Int): Seq[Float] =
      Seq.tabulate(4)(t =>
        (if (t == base) 10f else 0f) + 0.01f * j)
    val rows =
      (0 until 7).map(j => (j.toLong, vec(0, j), 0)) ++
      (7 until 14).map(j => (j.toLong, vec(1, j), 1)) ++
      (14 until 20).map(j => (j.toLong, vec(2, j), 2)) :+
      ((20L, vec(0, 9), 1)) // planted: cluster 0 geometry, label 1
    val e = rows.toDF("vec_id", "embedding", "label")
    val pairs = Similarity.knnJoin(e, e, "embedding", "vec_id",
      "embedding", "vec_id", k = 5)
    val got = Similarity.labelNoiseAudit(pairs, e, "vec_id", "label",
        k = 5)
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0) == ((7L, 0L)))
    assert(got(1) == ((8L, 1L)), s"label 1: ${got(1)}") // the plant
    assert(got(2) == ((6L, 0L)))
  }
}
