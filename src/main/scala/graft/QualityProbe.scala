package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round approximation-quality artifact (QUALITY.json).
  *
  * The two rows-only gate queries are approximate by nature — q40's
  * budgeted LSH probe and q45's HLL sketch — and each has an
  * oracle-exact twin (q85 full probe, q64 exact counts). Their
  * QUALITY, though, was only spec-asserted, never recorded, so no
  * round could see drift (r06 verdict items 5 and 8). This main
  * measures both against their exact baselines and writes one JSON
  * artifact to trend round-over-round:
  *
  *  - `recall_at_20`: mean recall of the q40 budget (64 of 256
  *    buckets, near-isotropic embeddings — LSH's hardest case) over
  *    several query points, per-query values included.
  *  - `hll_max_rel_err`: worst |approx-exact|/exact of q45's
  *    approx_count_distinct(rsd=0.02) across event_type groups.
  */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- ANN recall@20 of the q40 budget vs brute force -------------
    // q40's config: 64 tables × 16 probes of 2^12 buckets = the same
    // 25% rows-scanned budget as the pre-r08 single-table 64-of-256,
    // measured at 0.775 vs that config's 0.425 (OR-construction;
    // sweep in LshTune).
    val emb = Tables.embeddings(spark, sfDir)
    val k = 20
    val queryIds = 0L until 8L
    val brute = queryIds.map { qid =>
      qid -> operators.Similarity.topKForId(emb, "embedding",
        "vec_id", qid, k)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    }.toMap
    val perQuery = queryIds.map { qid =>
      val ann = operators.Similarity.lshTopKForIdTables(emb, "embedding",
          "vec_id", queryId = qid, k = k, numTables = 64, numPlanes = 12,
          dim = 64, probesPerTable = 16)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (ann & brute(qid)).size.toDouble / k
    }
    val meanRecall = perQuery.map(_._2).sum / perQuery.size

    // --- recall curve across probe budgets (r08 verdict item 6) -----
    // Same table/plane family as q40 (64 x 12-bit), probesPerTable
    // swept so the probe-ORDERING quality is a recorded curve, not one
    // operating point: a multi-probe ranking regression bends the low-
    // budget end of the curve long before it moves recall at p=16.
    // Keys are probesPerTable; budget (fraction of corpus scanned)
    // = 64*p/2^12 = p/64.
    val curve = Seq(4, 8, 16, 32).map { p =>
      val recalls = queryIds.map { qid =>
        val ann = operators.Similarity.lshTopKForIdTables(emb, "embedding",
            "vec_id", queryId = qid, k = k, numTables = 64, numPlanes = 12,
            dim = 64, probesPerTable = p)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        (ann & brute(qid)).size.toDouble / k
      }
      p -> recalls.sum / recalls.size
    }

    // --- IVF recall@20 at a 16-of-64-lists budget -------------------
    // q51's gate probes every list (provably exact), so the budgeted
    // behavior — the 100 TB operating point, where a probe reads
    // nProbes/nLists of the data — is what needs a recorded trend.
    // 64/16 is the best same-budget (25%) config from the LshTune
    // sweep: recall climbs monotonically with quantizer granularity
    // (8/2 = 0.50, 16/4 = 0.61, 32/8 = 0.65, 64/16 = 0.69), matching
    // the nlist ~ sqrt(n) rule of thumb's direction at this corpus
    // size.
    val ivfPerQuery = queryIds.map { qid =>
      val ann = operators.Similarity.ivfTopKForId(emb, "embedding",
          "vec_id", queryId = qid, k = k, nLists = 64, nProbes = 16)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (ann & brute(qid)).size.toDouble / k
    }
    val ivfMeanRecall = ivfPerQuery.map(_._2).sum / ivfPerQuery.size

    // --- PQ/ADC recall@20 vs exact L2 (q123/q124's operating point) --
    // The q124 gate is oracle-EXACT (ADC arithmetic is deterministic),
    // so what needs trending is the APPROXIMATION quality: how much of
    // the true L2 top-20 the 8-byte codes retain. Exact baseline is
    // driver-side over the collected corpus (probe-scale only — the
    // operator itself never collects vectors).
    val allVecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).toArray).toMap
    val (encPq, pqBooks) = operators.Pq.encode(emb, "vec_id",
      "embedding", m = 8, k = 16, updates = 1)
    val encCached = encPq.localCheckpoint()
    val pqPerQuery = queryIds.map { qid =>
      val qv = allVecs(qid)
      val exact = allVecs.toSeq.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      val adc = operators.Pq.adcTopN(encCached, "vec_id", pqBooks, qv, k)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (adc & exact).size.toDouble / k
    }
    val pqMeanRecall = pqPerQuery.map(_._2).sum / pqPerQuery.size

    // --- rotated-PQ recall at the same operating point ---------------
    // The Hadamard pre-rotation (q129/q131) spreads per-coordinate
    // energy across subspaces; whether that helps at THIS m/k point on
    // near-isotropic embeddings is an empirical number worth trending
    // next to pq_recall_at_20 (isotropic inputs are the null case —
    // OPQ's wins come from anisotropy, so parity here is expected and
    // a DROP would flag a rotation bug).
    val (encRot, rotBooks) = operators.Pq.encodeRotated(emb, "vec_id",
      "embedding", m = 8, k = 16, updates = 1)
    val encRotCached = encRot.localCheckpoint()
    val rotPerQuery = queryIds.map { qid =>
      val qv = allVecs(qid)
      val exact = allVecs.toSeq.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      val adc = operators.Pq.adcTopNRotated(encRotCached, "vec_id",
          rotBooks, qv, k)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (adc & exact).size.toDouble / k
    }
    val rotMeanRecall = rotPerQuery.map(_._2).sum / rotPerQuery.size

    // --- learned-rotation PQ recall (q175/q176 family): the same
    // operating point under the offline-trained integer rotation
    // fixture. On near-isotropic embeddings this, like the Hadamard,
    // is a null-case trend (OPQ wins come from anisotropy) — but it
    // is the number that MOVES once a data-fitted rotation replaces
    // the fixture, so the learned-vs-FWHT delta stays visible.
    val opqRot = operators.Pq.learnedRotationFixture(64)
    val (encLrn, lrnBooks) = operators.Pq.encodeMatrixRotated(emb,
      "vec_id", "embedding", opqRot, m = 8, k = 16, updates = 1)
    val encLrnCached = encLrn.localCheckpoint()
    val lrnPerQuery = queryIds.map { qid =>
      val qv = allVecs(qid)
      val exact = allVecs.toSeq.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      val adc = operators.Pq.adcTopNMatrixRotated(encLrnCached,
          "vec_id", lrnBooks, opqRot, qv, k)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (adc & exact).size.toDouble / k
    }
    val lrnMeanRecall = lrnPerQuery.map(_._2).sum / lrnPerQuery.size

    // --- DATA-FITTED rotation PQ recall (q181/q182 family): the
    // committed PqFitted matrix (offline PCA + snake eigenvalue
    // allocation over these embeddings). This is the number the
    // r10 verdict asked to make visible: fitted-vs-FWHT-vs-flat at
    // the same m/k operating point.
    val fitRot = operators.PqFitted.r64
    val (encFit, fitBooks) = operators.Pq.encodeMatrixRotated(emb,
      "vec_id", "embedding", fitRot, m = 8, k = 16, updates = 1)
    val encFitCached = encFit.localCheckpoint()
    val fitPerQuery = queryIds.map { qid =>
      val qv = allVecs(qid)
      val exact = allVecs.toSeq.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      val adc = operators.Pq.adcTopNMatrixRotated(encFitCached,
          "vec_id", fitBooks, fitRot, qv, k)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (adc & exact).size.toDouble / k
    }
    val fitMeanRecall = fitPerQuery.map(_._2).sum / fitPerQuery.size

    // --- SQ8 compressed-domain recall (q177): cosine ranking on the
    // int8 codes vs exact full-precision cosine top-k. The only error
    // source is the ±0.5 per-component rounding, so this should sit
    // near 1.0 — a drop flags a code-formula or ranking regression.
    val sq8PerQuery = queryIds.map { qid =>
      val qv = allVecs(qid)
      def dotD(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      val qn = math.sqrt(dotD(qv, qv))
      val exactCos = allVecs.toSeq.filter(_._1 != qid).map { case (id, v) =>
        id -> dotD(v, qv) / (math.sqrt(dotD(v, v)) * qn)
      }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val got = operators.Similarity.sq8TopKForId(emb, "embedding",
          "vec_id", qid, k)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (got & exactCos).size.toDouble / k
    }
    val sq8MeanRecall = sq8PerQuery.map(_._2).sum / sq8PerQuery.size

    // --- IVF-PQ recall at probe-16-of-64 (the q140/q141 family at a
    // budgeted operating point; the gate itself probes 3-of-8 and is
    // oracle-exact, so only the approximation quality needs a trend).
    // Residual coding should beat flat PQ at equal code budget.
    val (encIvf, ivfCoarse, ivfBooks) = operators.Pq.encodeIvfPq(emb,
      "vec_id", "embedding", kCoarse = 64, m = 8, k = 16, updates = 1)
    val encIvfCached = encIvf.localCheckpoint()
    val ivfPqPerQuery = queryIds.map { qid =>
      val qv = allVecs(qid)
      val exact = allVecs.toSeq.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      val adc = operators.Pq.ivfPqTopN(encIvfCached, "vec_id",
          ivfCoarse, ivfBooks, qv, nprobe = 16, n = k)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      qid -> (adc & exact).size.toDouble / k
    }
    val ivfPqMeanRecall = ivfPqPerQuery.map(_._2).sum / ivfPqPerQuery.size

    // --- corpus×corpus margin-mining recall (r14 family): q216's
    // sign-bit-LSH candidate path vs EXACT all-pairs margin mining at
    // the same (k, n). The gate is hash-exact against its own
    // candidate-bounded semantics; this number records how much of
    // the TRUE margin top-30 those candidates retain — the honest
    // approximation-quality trend every other approximate family
    // already carries. Exact side runs the guarded cross form at
    // probe scale only (250×250 pairs — eval harness, not a plan).
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("src_id"), col("dst_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactMargin = pairSet(operators.Similarity.marginMining(
      even, odd, "embedding", "vec_id", "embedding", "vec_id",
      k = 5, n = 30))
    def lshMarginRecall(tables: Int, planes: Int): Double = {
      val got = pairSet(operators.Similarity.marginMiningLsh(
        even, odd, "embedding", "vec_id", "embedding", "vec_id",
        k = 5, n = 30, numTables = tables, planesPerTable = planes,
        dim = 64, maxBucket = 64))
      (got & exactMargin).size.toDouble / exactMargin.size
    }
    // the q216 gate budget (16x4 — the measured quality point) plus
    // two lower-budget points, so the budget-vs-recall knob is a
    // recorded curve, not one number: margin normalization needs
    // wider neighborhoods than plain near-dup detection, and the
    // OR-construction's table count is where that budget lives
    // (measured 4x6: 0.17, 8x6: 0.43, 16x4: 0.93 — all three configs
    // share the identical tables·2^planes·cap² = 1M worst-case bound)
    val marginRecall4 = lshMarginRecall(4, 6)
    val marginRecall8 = lshMarginRecall(8, 6)
    val marginRecall = lshMarginRecall(16, 4)

    // --- PQ recall on an ANISOTROPIC fixture (r14 verdict item 3) ----
    // The gate fixture is near-isotropic — rotation's NULL case — so
    // the headline pq_*_recall_at_20 numbers (0.375-0.41) understate
    // the operator. This replays PqSpec's deterministic anisotropic
    // fixture (dims 0..7 carry ~300x the std of dims 8..63: flat PQ's
    // subspace 0 must quantize nearly all the energy) so QUALITY.json
    // carries the number that demonstrates OPQ works, with a floor in
    // round_report guarding the right regression.
    val (anisoFlat, anisoFit) = {
      def sm(x: Long): Long = {
        var z = x + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      def u(x: Long): Double = ((sm(x) >>> 11).toDouble / (1L << 52)) - 1.0
      val d = 64; val n = 512; val m = 8; val kk = 16; val topK = 10
      val rows = (0 until n).map { i =>
        (i.toLong, Array.tabulate(d) { j =>
          val amp = if (j < 8) 3.0 else 0.01
          (amp * u(i.toLong * d + j)).toFloat
        })
      }
      import spark.implicits._
      val df = rows.toDF("vec_id", "embedding")
      val vecs = rows.toMap
      def exactTop(qid: Long): Set[Long] = {
        val qv = vecs(qid)
        rows.filter(_._1 != qid).map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) =>
            val x = a.toDouble - b.toDouble; x * x }.sum
        }.sortBy { case (id, d2) => (d2, id) }.take(topK).map(_._1).toSet
      }
      def recall(top: Long => Set[Long]): Double =
        queryIds.map(q => (top(q) & exactTop(q)).size.toDouble / topK)
          .sum / queryIds.size
      val (encA, bA) = operators.Pq.encode(df, "vec_id", "embedding",
        m, kk)
      val encAc = encA.localCheckpoint()
      val flat = recall(q => operators.Pq.adcTopN(encAc, "vec_id", bA,
        vecs(q), topK).collect().map(_.getAs[Long]("vec_id")).toSet)
      val rFit = operators.Pq.fitRotationPca(
        rows.take(256).map(_._2.map(_.toDouble)).toArray, m)
      val (encB, bB) = operators.Pq.encodeMatrixRotated(df, "vec_id",
        "embedding", rFit, m, kk)
      val encBc = encB.localCheckpoint()
      val fit = recall(q => operators.Pq.adcTopNMatrixRotated(encBc,
          "vec_id", bB, rFit, vecs(q), topK)
        .collect().map(_.getAs[Long]("vec_id")).toSet)
      (flat, fit)
    }

    // --- theta-sketch intersection error vs the exact twin ----------
    // q224 (k=512 KMV, direct intersection estimator) against q225
    // (exact shared-vocabulary counts). The error is recorded SPLIT by
    // intersection size — the NEXT.md caveat is that small
    // intersections are where relative error inflates, so the band
    // must show that regime explicitly rather than average over it.
    val thetaPairs = queries.TextQueries.q224_theta_intersect(spark, sfDir)
      .select(col("source_a"), col("source_b"), col("est_inter"))
      .join(queries.TextQueries.q225_exact_intersect(spark, sfDir)
        .select(col("source_a"), col("source_b"), col("n_inter")),
        Seq("source_a", "source_b"))
      .collect().map { r =>
        val exact = r.getAs[Long]("n_inter").toDouble
        val est = r.getAs[Long]("est_inter").toDouble
        (exact, math.abs(est - exact) / math.max(1.0, exact))
      }
    val thetaMeanErr = thetaPairs.map(_._2).sum / thetaPairs.length
    val thetaMaxErr = thetaPairs.map(_._2).max
    val thetaSmall = thetaPairs.filter(_._1 < 100.0)
    val thetaMaxErrSmall =
      if (thetaSmall.isEmpty) 0.0 else thetaSmall.map(_._2).max

    // --- HDR quantile-bracket band vs the exact twin ----------------
    // q230 (b=5 HDR histogram brackets) against q231 (exact order
    // statistics at the same integer ranks). Two facts recorded: the
    // bracket CONTAINS the truth on every (lang, permille) row (a
    // correctness property — its violation is a bug, so it hard-fails
    // here), and the worst lower-bound relative error, whose 2^-5
    // theoretical ceiling the gate re-measures instead of trusting.
    val hdrRows = queries.TextQueries.q230_hdr_quantiles(spark, sfDir)
      .select(col("lang"), col("permille"), col("est_lb"), col("est_ub"))
      .join(queries.TextQueries.q231_exact_quantiles(spark, sfDir)
        .select(col("lang"), col("permille"), col("exact_v")),
        Seq("lang", "permille"))
      .collect().map { r =>
        val lo = r.getAs[Long]("est_lb").toDouble
        val hi = r.getAs[Long]("est_ub").toDouble
        val ex = r.getAs[Long]("exact_v").toDouble
        (lo <= ex && ex <= hi, (ex - lo) / math.max(1.0, ex))
      }
    val hdrContained = hdrRows.forall(_._1)
    val hdrMaxErr = if (hdrRows.isEmpty) 0.0 else hdrRows.map(_._2).max

    // --- HLL error band of q45 vs its exact twin --------------------
    val bands = queries.EventQueries.q45_approx_distinct(spark, sfDir)
      .select(col("event_type"), col("exact_users"), col("approx_users"))
      .collect().map { r =>
        val exact = r.getAs[Long]("exact_users").toDouble
        val approx = r.getAs[Long]("approx_users").toDouble
        r.getAs[String]("event_type") ->
          math.abs(approx - exact) / math.max(1.0, exact)
      }
    val maxErr = if (bands.isEmpty) 0.0 else bands.map(_._2).max

    def s3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val json =
      s"""{"sf":"$sfDir","recall_at_20":${s3(meanRecall)},""" +
        s""""tables":64,"planes":12,"probes_per_table":16,"k":$k,""" +
        s""""recall_curve":{${curve.map { case (p, r) =>
          s"\"$p\":${s3(r)}" }.mkString(",")}},""" +
        s""""per_query":{${perQuery.map { case (q, r) =>
          s"\"$q\":${s3(r)}" }.mkString(",")}},""" +
        s""""ivf_recall_at_20":${s3(ivfMeanRecall)},""" +
        s""""ivf_probes":16,"ivf_lists":64,""" +
        s""""ivf_per_query":{${ivfPerQuery.map { case (q, r) =>
          s"\"$q\":${s3(r)}" }.mkString(",")}},""" +
        s""""pq_recall_at_20":${s3(pqMeanRecall)},""" +
        s""""pq_m":8,"pq_k":16,""" +
        s""""pq_per_query":{${pqPerQuery.map { case (q, r) =>
          s"\"$q\":${s3(r)}" }.mkString(",")}},""" +
        s""""pq_rotated_recall_at_20":${s3(rotMeanRecall)},""" +
        s""""pq_learned_recall_at_20":${s3(lrnMeanRecall)},""" +
        s""""pq_fitted_recall_at_20":${s3(fitMeanRecall)},""" +
        s""""sq8_recall_at_20":${s3(sq8MeanRecall)},""" +
        s""""margin_recall_at_30":${s3(marginRecall)},""" +
        s""""margin_recall_curve":{"4x6":${s3(marginRecall4)},""" +
        s""""8x6":${s3(marginRecall8)},"16x4":${s3(marginRecall)}},""" +
        s""""margin_cap":64,""" +
        s""""ivfpq_recall_at_20":${s3(ivfPqMeanRecall)},""" +
        s""""ivfpq_lists":64,"ivfpq_probes":16,""" +
        s""""pq_flat_recall_anisotropic":${s3(anisoFlat)},""" +
        s""""pq_fitted_recall_anisotropic":${s3(anisoFit)},""" +
        s""""theta_k":512,"theta_pairs":${thetaPairs.length},""" +
        s""""theta_inter_mean_rel_err":${s3(thetaMeanErr)},""" +
        s""""theta_inter_max_rel_err":${s3(thetaMaxErr)},""" +
        s""""theta_inter_max_rel_err_small":${s3(thetaMaxErrSmall)},""" +
        s""""hdr_b":5,"hdr_rows":${hdrRows.length},""" +
        s""""hdr_bracket_contained":$hdrContained,""" +
        s""""hdr_max_rel_err":${s3(hdrMaxErr)},""" +
        s""""hll_rsd":0.02,"hll_max_rel_err":${s3(maxErr)},""" +
        s""""hll_groups":{${bands.sortBy(_._1).map { case (g, e) =>
          s"\"$g\":${s3(e)}" }.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("QUALITY.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
    System.out.flush()
    // The 5% band is a GATE, not just a recording (r07 verdict item
    // 6): rsd=0.02 puts 2.5 sigma inside 0.05, so a breach means the
    // sketch configuration or the twin query drifted, and the round
    // pipeline must fail loudly rather than trend it quietly.
    if (maxErr > 0.05) {
      System.err.println(
        f"[quality] FAIL: hll_max_rel_err $maxErr%.4f breaches the 5%% "
          + "band vs the exact twin")
      sys.exit(1)
    }
    // Theta ceilings are GATES too: at k=512 the deterministic chain
    // measured mean 0.130 / max 0.41 vs the exact twin; the ceilings
    // below leave ~2x headroom, so a breach means the sketch, the
    // hash, or the twin drifted — fail loudly, don't trend it.
    if (thetaMeanErr > 0.25 || thetaMaxErr > 0.7) {
      System.err.println(
        f"[quality] FAIL: theta intersection error (mean " +
          f"$thetaMeanErr%.4f, max $thetaMaxErr%.4f) breaches the " +
          "0.25/0.7 ceilings vs the exact twin")
      sys.exit(1)
    }
    // HDR gates: containment is a THEOREM of the bucketing (violation
    // = bug, not noise), and the b=5 bracket bounds the lower-edge
    // error by 2^-5; both re-measured every round, zero headroom on
    // containment, the exact theoretical ceiling on the error.
    if (!hdrContained || hdrRows.isEmpty || hdrMaxErr > 0.03125) {
      System.err.println(
        f"[quality] FAIL: hdr brackets (contained=$hdrContained, " +
          f"rows=${hdrRows.length}, max_rel_err=$hdrMaxErr%.4f) " +
          "breach the containment/2^-5 guarantee vs the exact twin")
      sys.exit(1)
    }
  }
}
