package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PqSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)
    .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
    .collect().toSeq.sortBy(_._1).take(150)

  test("OPQ premise on ANISOTROPIC data (r13 verdict item 3): when the " +
      "variance concentrates in one subspace's coordinates, the " +
      "rotations beat flat PQ recall — modestly for the data-blind " +
      "Hadamard, decisively for the PCA-fitted one — while the gate " +
      "fixture is near-isotropic (rotation's null case), which is why " +
      "QUALITY.json shows parity-with-noise there") {
    // deterministic SplitMix64 doubles in [-1, 1)
    def h(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def u(x: Long): Double = ((h(x) >>> 11).toDouble / (1L << 52)) - 1.0
    // the structured-PQ failure mode: dims 0..7 carry ~300x the std of
    // dims 8..63, so flat PQ's subspace 0 codebook (k=16 centroids)
    // must quantize nearly ALL the energy while subspaces 1..7 waste
    // their bits on noise
    val d = 64; val n = 512; val m = 8; val k = 16; val topK = 10
    val rows = (0 until n).map { i =>
      (i.toLong, Array.tabulate(d) { j =>
        val amp = if (j < 8) 3.0 else 0.01
        (amp * u(i.toLong * d + j)).toFloat
      })
    }
    val df = rows.toDF("vec_id", "embedding")
    val vecs = rows.toMap
    def exactTop(qid: Long): Set[Long] = {
      val qv = vecs(qid)
      rows.filter(_._1 != qid).map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) =>
          val x = a.toDouble - b.toDouble; x * x }.sum
      }.sortBy { case (id, d2) => (d2, id) }.take(topK).map(_._1).toSet
    }
    val queryIds = (0L until 8L).toSeq
    def recall(top: Long => Set[Long]): Double =
      queryIds.map(q => (top(q) & exactTop(q)).size.toDouble / topK)
        .sum / queryIds.size
    val (encF, bF) = Pq.encode(df, "vec_id", "embedding", m, k)
    val encFc = encF.localCheckpoint()
    val flat = recall(q => Pq.adcTopN(encFc, "vec_id", bF, vecs(q), topK)
      .collect().map(_.getAs[Long]("vec_id")).toSet)
    val (encR, bR) = Pq.encodeRotated(df, "vec_id", "embedding", m, k)
    val encRc = encR.localCheckpoint()
    val rot = recall(q => Pq.adcTopNRotated(encRc, "vec_id", bR, vecs(q),
      topK).collect().map(_.getAs[Long]("vec_id")).toSet)
    val r = Pq.fitRotationPca(
      rows.take(256).map(_._2.map(_.toDouble)).toArray, m)
    val (encM, bM) = Pq.encodeMatrixRotated(df, "vec_id", "embedding",
      r, m, k)
    val encMc = encM.localCheckpoint()
    val fit = recall(q => Pq.adcTopNMatrixRotated(encMc, "vec_id", bM, r,
      vecs(q), topK).collect().map(_.getAs[Long]("vec_id")).toSet)
    info(s"anisotropic recall@$topK: flat=$flat rotated=$rot fitted=$fit")
    // measured (deterministic fixture + deterministic k-means):
    // flat 0.2125, Hadamard 0.275, PCA-fitted 0.775. The data-blind
    // Hadamard spreads the energy (modest win); the data-FITTED
    // rotation with eigenvalue allocation is the real OPQ payoff.
    assert(rot >= flat + 0.05,
      s"Hadamard rotation must beat flat PQ on anisotropic data: " +
        s"flat=$flat rotated=$rot")
    assert(fit >= flat + 0.3,
      s"PCA-fitted rotation must decisively beat flat PQ on " +
        s"anisotropic data: flat=$flat fitted=$fit")
  }

  test("encode: each subspace code equals the standalone kmeansAssign " +
      "of that slice, and recon_d2 is the exact sum of subspace errors") {
    val df = emb.toDF("vec_id", "embedding")
    val (enc, books) = Pq.encode(df, "vec_id", "embedding",
      m = 4, k = 8, updates = 1)
    val got = enc.as[(Long, Seq[Int], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(books.length == 4 && books.forall(_.length == 8))
    var reconSum = Map.empty[Long, Long].withDefaultValue(0L)
    (0 until 4).foreach { s =>
      val sliceDf = df.select($"vec_id",
        slice($"embedding", s * 16 + 1, 16).as("embedding"))
      val solo = Cluster.kmeansAssign(sliceDf, "vec_id", "embedding",
          k = 8, updates = 1)
        .as[(Long, Int, Long)].collect()
      solo.foreach { case (id, cl, d2) =>
        assert(got(id)._1(s) == cl, s"sub $s id $id")
        reconSum = reconSum.updated(id, reconSum(id) + d2)
      }
    }
    assert(got.forall { case (id, (_, rec)) => rec == reconSum(id) })
  }

  test("adcTopN scores match a driver-side replay of the lookup " +
      "tables over the emitted codes, ordered (adc_d2, id)") {
    val df = emb.toDF("vec_id", "embedding")
    val (enc, books) = Pq.encode(df, "vec_id", "embedding",
      m = 4, k = 8, updates = 1)
    val qvec = emb.head._2.toArray
    val topk = Pq.adcTopN(enc, "vec_id", books, qvec, n = 15)
      .as[(Long, Long)].collect().toSeq
    // replay: quantize query, build tables, score every code row
    val qq = qvec.map(x => math.floor(x.toDouble * 10000L).toLong)
    val dsub = 16
    val tables = books.zipWithIndex.map { case (book, s) =>
      book.map(c => (0 until dsub).map { i =>
        val d = qq(s * dsub + i) - c(i); d * d
      }.sum)
    }
    val codes = enc.as[(Long, Seq[Int], Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val expected = codes.map { case (id, cs) =>
      id -> cs.zipWithIndex.map { case (c, s) => tables(s)(c) }.sum
    }.toSeq.sortBy { case (id, d2) => (d2, id) }.take(15)
    assert(topk == expected)
    // the query vector itself (vec 0) must rank first: its own cells
    assert(topk.head._1 == emb.head._1)
  }

  test("codes are partitioning-independent and in [0, k)") {
    val df = emb.toDF("vec_id", "embedding")
    val (e1, _) = Pq.encode(df, "vec_id", "embedding", 4, 8)
    val (e2, _) = Pq.encode(df.repartition(7).sortWithinPartitions(
      $"vec_id".desc), "vec_id", "embedding", 4, 8)
    val a = e1.as[(Long, Seq[Int], Long)].collect().toSet
    assert(a == e2.as[(Long, Seq[Int], Long)].collect().toSet)
    assert(a.forall(_._2.forall(c => c >= 0 && c < 8)))
  }

  test("IVF-PQ: residuals equal v minus the assigned coarse centroid, " +
      "codes equal flat PQ over those residuals, and probed ADC " +
      "matches a driver-side replay restricted to the probed lists") {
    val df = emb.take(100).toDF("vec_id", "embedding")
    val (enc, coarse, books) = Pq.encodeIvfPq(df, "vec_id", "embedding",
      kCoarse = 4, m = 4, k = 8, updates = 1)
    val rows = enc.as[(Long, Seq[Int], Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // replay: quantize + coarse-assign driver-side
    val qv = emb.take(100).map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 10000L).toLong).toArray
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    qv.foreach { case (id, v) =>
      val list = coarse.zipWithIndex
        .map { case (c, j) => (d2(v, c), j) }.min._2
      assert(rows(id)._3 == list, s"coarse list for $id")
      // recon_d2 equals the codes' reconstruction of the RESIDUAL
      val resid = v.zip(coarse(list)).map { case (a, b) => a - b }
      val rec = (0 until 4).map { s =>
        d2(resid.slice(s * 16, s * 16 + 16), books(s)(rows(id)._1(s)))
      }.sum
      assert(rows(id)._2 == rec, s"recon for $id")
    }
    // probed search replay
    val qvec = emb.head._2.toArray
    val qq = qvec.map(x => math.floor(x.toDouble * 10000L).toLong)
    val got = Pq.ivfPqTopN(enc, "vec_id", coarse, books, qvec,
        nprobe = 2, n = 10)
      .as[(Long, Int, Long)].collect().toSeq
    val probed = coarse.zipWithIndex.map { case (c, j) => (d2(qq, c), j) }
      .sorted.take(2).map(_._2).toSet
    val expect = rows.toSeq.collect {
      case (id, (codes, _, list)) if probed(list) =>
        val qr = qq.zip(coarse(list)).map { case (a, b) => a - b }
        val adc = (0 until 4).map { s =>
          d2(qr.slice(s * 16, s * 16 + 16), books(s)(codes(s)))
        }.sum
        (id, list, adc)
    }.sortBy(r => (r._3, r._1)).take(10)
    assert(got == expect)
    assert(got.forall(r => probed(r._2))) // never reads unprobed lists
  }

  test("adcTopNRotated replays exactly: fwhtLocal on the query equals " +
      "the corpus-side rotation, and scores match a driver-side table " +
      "walk over the rotated codes") {
    val df = emb.take(80).toDF("vec_id", "embedding")
    val (enc, books) = Pq.encodeRotated(df, "vec_id", "embedding",
      m = 4, k = 8, updates = 1)
    val qvec = emb.head._2.toArray
    val got = Pq.adcTopNRotated(enc, "vec_id", books, qvec, n = 10)
      .as[(Long, Long)].collect().toSeq
    // driver-side replay
    val qr = Pq.fwhtLocal(
      qvec.map(x => math.floor(x.toDouble * 10000L).toLong))
    val codes = enc.as[(Long, Seq[Int], Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val expect = codes.toSeq.map { case (id, cs) =>
      val d2 = (0 until 4).map { s =>
        val c = books(s)(cs(s))
        (0 until 16).map { i =>
          val diff = qr(s * 16 + i) - c(i); diff * diff
        }.sum
      }.sum
      (id, d2)
    }.sortBy(r => (r._2, r._1)).take(10)
    assert(got == expect)
    // fwhtLocal agrees with the column-expression butterfly
    val viaCol = Pq.hadamardRotate(
        Seq((0L, qvec.map(x =>
          math.floor(x.toDouble * 10000L).toLong).toSeq)).toDF("id", "v"),
        "v", 64)
      .as[(Long, Seq[Long])].head()._2
    assert(viaCol == qr.toSeq)
  }

  test("hadamardRotate equals the closed-form Sylvester matrix " +
      "H[i][j] = (-1)^popcount(i&j) and scales every pairwise " +
      "squared distance by exactly d") {
    val d = 16
    val vecs = (0L until 20L).map(id =>
      id -> (0 until d).map(j => ((id * 31 + j * 7) % 13 - 6)).map(_.toLong))
    val got = Pq.hadamardRotate(
        vecs.toDF("id", "v"), "v", d)
      .as[(Long, Seq[Long])].collect().toMap
    def hRow(i: Int, x: Seq[Long]): Long =
      (0 until d).map(j =>
        (if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1L else -1L)
          * x(j)).sum
    vecs.foreach { case (id, x) =>
      val expect = (0 until d).map(hRow(_, x))
      assert(got(id) == expect, s"id $id")
    }
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- 0 until 5; j <- (i + 1) until 5) {
      val (xa, xb) = (vecs(i)._2, vecs(j)._2)
      assert(d2(got(i.toLong), got(j.toLong)) == d * d2(xa, xb))
    }
  }

  test("hadamardRotate refuses NULL ELEMENTS loudly (ADVICE r18: " +
      "toLongArray reads a null slot as 0 into stored codes)") {
    val e = intercept[Exception] {
      Pq.hadamardRotate(
        Seq((1L, Seq[java.lang.Long](1L, null, 3L, 4L)))
          .toDF("id", "v"), "v", 4).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("null element"))
        || mentions(t.getCause))
    assert(mentions(e))
  }

  test("encodeRotated: codes equal encode() run on pre-rotated " +
      "input, and ADC top-k order is preserved under rotation for " +
      "a full-probe (m=1, k=n would be exact) sanity point") {
    val df = emb.take(60).toDF("vec_id", "embedding")
    val (encR, booksR) = Pq.encodeRotated(df, "vec_id", "embedding",
      m = 4, k = 8, updates = 1)
    // reference: quantize+rotate driver-side, feed through a float
    // frame at scale 1 (values already integers)
    val rotated = Pq.hadamardRotate(
        df.select($"vec_id",
          Cluster.quantize($"embedding", 10000L).as("v")),
        "v", 64)
      .select($"vec_id", transform($"v", _.cast("float")).as("embedding"))
    val (encP, booksP) = Pq.encode(rotated, "vec_id", "embedding",
      m = 4, k = 8, updates = 1, scale = 1L)
    assert(encR.as[(Long, Seq[Int], Long)].collect().toSet ==
      encP.as[(Long, Seq[Int], Long)].collect().toSet)
    assert(booksR.map(_.map(_.toSeq).toSeq).toSeq ==
      booksP.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("rotateByMatrix equals the driver-side rotLocal row by row, " +
      "and the learned fixture is rscale-orthogonal up to rounding") {
    val rot = Pq.learnedRotationFixture(16, rscale = 127L)
    // determinism across invocations (pure closed form)
    assert(rot.map(_.toSeq).toSeq ==
      Pq.learnedRotationFixture(16, rscale = 127L).map(_.toSeq).toSeq)
    // R ~= 127*Q for orthogonal Q: diag(R*Rt) near 127^2*16, off-diag
    // small relative to it (rounding-only error)
    val d = 16
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => rot(i)(t) * rot(j)(t)).sum
      if (i == j)
        assert(math.abs(dot - 127L * 127L * 1L) < 1300,
          s"row $i self-dot $dot far from ${127 * 127}")
      else
        assert(math.abs(dot) < 1300, s"rows $i,$j dot $dot")
    }
    val vecs = (0L until 25L).map(id =>
      id -> (0 until d).map(t => ((id * 37 + t * 11) % 19 - 9).toLong))
    val got = Pq.rotateByMatrix(vecs.toDF("id", "v"), "v", rot)
      .as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, x) =>
      assert(got(id) == Pq.rotLocal(rot, x.toArray).toSeq, s"id $id")
    }
  }

  test("fitRotationPca: deterministic, rscale-orthogonal, and its " +
      "snake allocation balances per-subspace eigenvalue products " +
      "on anisotropic data (and the committed fixture is valid)") {
    // strongly anisotropic deterministic sample: coordinate j has
    // scale (j+1), so identity-order subspaces have wildly unbalanced
    // variance products — the case a fitted rotation exists for
    def h(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val d = 16
    val m = 4
    val sample = Array.tabulate(200, d) { (r, j) =>
      (((h(r.toLong * d + j) >>> 11).toDouble / (1L << 53).toDouble)
        - 0.5) * (j + 1)
    }
    val rscale = 127L
    val rot = Pq.fitRotationPca(sample, m, rscale)
    // pure function of the sample
    assert(rot.map(_.toSeq).toSeq ==
      Pq.fitRotationPca(sample, m, rscale).map(_.toSeq).toSeq)
    // R ~= 127*Q: rounding-only deviation from orthogonality
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => rot(i)(t) * rot(j)(t)).sum
      if (i == j) assert(math.abs(dot - rscale * rscale) < 1300,
        s"row $i self-dot $dot")
      else assert(math.abs(dot) < 1300, s"rows $i,$j dot $dot")
    }
    // balance: per-bucket log-product of variances after the fitted
    // rotation is far tighter than contiguous identity grouping
    def logProdRange(vars: Seq[Double]): Double = {
      val sums = vars.grouped(d / m).map(_.map(math.log).sum).toSeq
      sums.max - sums.min
    }
    def colVars(rows: Array[Array[Double]]): Seq[Double] = {
      val n = rows.length
      (0 until d).map { j =>
        val mu = rows.map(_(j)).sum / n
        rows.map(v => (v(j) - mu) * (v(j) - mu)).sum / n
      }
    }
    val rotated = sample.map(v => rot.map(row =>
      row.zip(v).map { case (a, b) => a * b }.sum / rscale.toDouble))
    val natural = logProdRange(colVars(sample))
    val fitted = logProdRange(colVars(rotated))
    assert(fitted < natural / 4,
      s"fitted log-product range $fitted vs natural $natural")
    // the committed corpus fixture stays a valid rscale-rotation
    val fx = PqFitted.r64
    assert(fx.length == 64 && fx.forall(_.length == 64))
    for (i <- 0 until 64; j <- 0 until 64) {
      val dot = (0 until 64).map(t => fx(i)(t) * fx(j)(t)).sum
      if (i == j) assert(math.abs(dot - 127L * 127L) < 1300,
        s"fixture row $i self-dot $dot")
      else assert(math.abs(dot) < 1300, s"fixture rows $i,$j dot $dot")
    }
  }

  test("encodeMatrixRotated: codes equal encode() on pre-rotated " +
      "input, and the ADC query path rotates identically") {
    val df = emb.take(60).toDF("vec_id", "embedding")
    val rot = Pq.learnedRotationFixture(64)
    val (encL, booksL) = Pq.encodeMatrixRotated(df, "vec_id",
      "embedding", rot, m = 4, k = 8, updates = 1)
    val rotated = Pq.rotateByMatrix(
        df.select($"vec_id",
          Cluster.quantize($"embedding", 10000L).as("v")),
        "v", rot)
      // double, not float: matrix-rotated components reach ~1e6-1e8,
      // and float loses integer exactness above 2^24
      .select($"vec_id", transform($"v", _.cast("double")).as("embedding"))
    val (encP, booksP) = Pq.encode(rotated, "vec_id", "embedding",
      m = 4, k = 8, updates = 1, scale = 1L)
    assert(encL.as[(Long, Seq[Int], Long)].collect().toSet ==
      encP.as[(Long, Seq[Int], Long)].collect().toSet)
    assert(booksL.map(_.map(_.toSeq).toSeq).toSeq ==
      booksP.map(_.map(_.toSeq).toSeq).toSeq)
    // query path: adcTopNMatrixRotated(q) == adcTopN over the
    // pre-rotated index with the pre-rotated query at scale 1
    val qv = emb.head._2.toArray
    val qRot = Pq.rotLocal(rot,
      qv.map(x => math.floor(x.toDouble * 10000L).toLong))
    val viaOp = Pq.adcTopNMatrixRotated(encL.localCheckpoint(),
        "vec_id", booksL, rot, qv, n = 10)
      .as[(Long, Long)].collect().toSeq
    val viaRef = Pq.adcTopN(encP.localCheckpoint(), "vec_id", booksP,
        qRot.map(_.toFloat), n = 10, scale = 1L)
      .as[(Long, Long)].collect().toSeq
    assert(viaOp.map(_._1) == viaRef.map(_._1))
  }
}
