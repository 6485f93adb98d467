package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LinalgSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)

  test("distributed gram/covariance matches the exact decimal " +
      "formulation and is partition-independent to double accuracy") {
    val cov = Linalg.covariance(emb, "embedding")
    val exact = Linalg.exactCovarianceEntries(emb, "embedding", "vec_id", 8)
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i.toInt - 1, j.toInt - 1) -> c }.toMap
    exact.foreach { case ((i, j), c) =>
      assert(math.abs(cov(i)(j) - c) < 1e-9, s"cov($i,$j): ${cov(i)(j)} vs $c")
    }
    val covRepart = Linalg.covariance(emb.repartition(7), "embedding")
    for (i <- 0 until 8; j <- 0 until 8)
      assert(math.abs(cov(i)(j) - covRepart(i)(j)) < 1e-9)
  }

  test("pcaTopK returns orthonormal components ordered by explained " +
      "variance, and recovers a planted principal axis") {
    // planted: x = t * axis + small noise, axis = (3,4)/5
    val axis = Array(0.6, 0.8)
    val rnd = new scala.util.Random(7)
    val data = (0 until 500).map { _ =>
      val t = rnd.nextGaussian() * 10
      val n1 = rnd.nextGaussian() * 0.1
      val n2 = rnd.nextGaussian() * 0.1
      (0L, Seq((t * axis(0) + n1).toFloat, (t * axis(1) + n2).toFloat))
    }.toDF("vec_id", "embedding")
    val comps = Linalg.pcaTopK(data, "embedding", 2)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // orthonormal
    assert(math.abs(dot(comps(0), comps(0)) - 1.0) < 1e-6)
    assert(math.abs(dot(comps(1), comps(1)) - 1.0) < 1e-6)
    assert(math.abs(dot(comps(0), comps(1))) < 1e-4)
    // first component aligns with the planted axis (up to sign)
    assert(math.abs(math.abs(dot(comps(0), axis)) - 1.0) < 1e-2,
      comps(0).toSeq.toString)
  }

  test("whiten scales each projected dimension to unit variance and " +
      "eigenvalues equal the projected variances") {
    val (comps, values) = Linalg.pcaWithValues(emb, "embedding", 3)
    val proj = Linalg.project(emb, "embedding", comps)
    val vars = (0 until 3).map { c =>
      proj.select(expr(s"projected[$c]").as("v"))
        .agg(var_pop(col("v"))).head().getDouble(0)
    }
    vars.zip(values).foreach { case (v, lambda) =>
      assert(math.abs(v - lambda) / lambda < 1e-6, s"$v vs $lambda")
    }
    val white = Linalg.whiten(emb, "embedding", 3)
    (0 until 3).foreach { c =>
      val v = white.select(expr(s"whitened[$c]").as("v"))
        .agg(var_pop(col("v"))).head().getDouble(0)
      assert(math.abs(v - 1.0) < 1e-6, s"dim $c variance $v")
    }
  }

  test("project adds a k-dim column whose per-component variance is " +
      "non-increasing (components ordered by eigenvalue)") {
    val comps = Linalg.pcaTopK(emb, "embedding", 3)
    val proj = Linalg.project(emb, "embedding", comps)
    assert(proj.select(col("projected")).head().getSeq[Double](0).size == 3)
    val vars = (0 until 3).map { c =>
      proj.select(expr(s"projected[$c]").as("v"))
        .agg(var_pop(col("v"))).head().getDouble(0)
    }
    assert(vars(0) >= vars(1) - 1e-9 && vars(1) >= vars(2) - 1e-9,
      vars.toString)
  }

  test("signProject matches a scala replay of the md5 matrix exactly " +
      "and preserves pairwise distance within JL distortion") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" < 40)
    val got = Linalg.signProject(emb, "vec_id", "embedding",
        k = 16, dim = 64)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Long = {
      val h = md.digest(s"$i:$j".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    for ((id, v) <- vecs) {
      val q = v.map(x => math.floor(x.toDouble * 10000).toLong)
      val exp = Vector.tabulate(16)(j =>
        (0 until 64).map(i => sign(i, j) * q(i)).sum)
      assert(got(id) == exp, s"vec $id")
    }
    // JL sanity on real pairs: ||Px||² concentrates around k/d·scale²
    // times ||x||² for ±1 entries (E[(s·x)²] = ||x||²); allow wide
    // slack — this guards gross sign/index bugs, not the constant
    val ids = vecs.keys.toSeq.sorted.take(10)
    for (a <- ids; b <- ids if a < b) {
      val dx = vecs(a).zip(vecs(b)).map { case (x, y) =>
        (x.toDouble - y) * 10000 }
      val trueD2 = dx.map(d => d * d).sum
      val pd = got(a).zip(got(b)).map { case (x, y) =>
        (x - y).toDouble }
      val projD2 = pd.map(d => d * d).sum / 16.0
      assert(projD2 > trueD2 * 0.2 && projD2 < trueD2 * 5.0,
        s"pair ($a,$b): projD2/trueD2 = ${projD2 / trueD2}")
    }
  }

  test("MatVec kernel REFUSES ragged input (ADVICE r11: zero-padding " +
      "a short vector would persist a silently wrong projection) and " +
      "supports rectangular matrices") {
    import org.apache.spark.sql.GraftColumnBridge
    import spark.implicits._
    // rectangular 2x3: y = [x1+x2+x3, x1-x3]
    val rot = Seq(Seq(1L, 1L, 1L), Seq(1L, 0L, -1L))
    def mv(df: org.apache.spark.sql.DataFrame) =
      df.select(GraftColumnBridge.column(graft.expressions.MatVecLong(
        GraftColumnBridge.expression(col("v")), rot)).as("y"))
    val ok = mv(Seq(Seq(2L, 3L, 5L)).toDF("v")).as[Seq[Long]].head()
    assert(ok == Seq(10L, -3L))
    // a 2-element vector against a 3-column matrix must THROW, not
    // zero-pad — and the error must say why
    val e = intercept[Exception] {
      mv(Seq(Seq(2L, 3L)).toDF("v")).collect()
    }
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
    assert(rootMsg(e).contains("ragged input"), rootMsg(e))
  }
}
