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
}
