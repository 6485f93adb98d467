package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over an embedding column — the
  * dimensionality-reduction step a training pipeline runs before ANN
  * indexing or whitening (PCA-project 768-dim encoder output down to
  * the 64-128 dims the index actually needs).
  *
  * Scale shape: the Gram/covariance accumulation is ONE pass of
  * per-partition d×d accumulators (mapPartitions — genuine per-partition
  * imperative state, the documented RDD-justified case) reduced on the
  * driver: d²·P doubles move, never n·d². The eigen-solve happens on
  * the driver over the d×d covariance (d ≤ a few thousand — microseconds
  * at d=128), and the projection back over the corpus is a per-row
  * expression. Nothing n-sized ever leaves the executors.
  */
object Linalg {

  /** Per-partition accumulated (n, Σx, X^T X) reduced on the driver.
    * Returns (count, sums[d], gram[d][d]) — gram upper triangle filled
    * symmetric. Accumulation order varies with partitioning, so entries
    * are double-accurate, not bit-reproducible: the oracle-exact
    * formulation is [[exactCovarianceEntries]]. */
  def gram(df: DataFrame, vecCol: String)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val rows = df.select(col(vecCol)).rdd.mapPartitions { it =>
      var n = 0L
      var sums: Array[Double] = null
      var g: Array[Array[Double]] = null
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        val d = v.length
        if (sums == null) {
          sums = new Array[Double](d)
          g = Array.ofDim[Double](d, d)
        }
        n += 1
        var i = 0
        while (i < d) {
          val xi = v(i).toDouble
          sums(i) += xi
          var j = i
          while (j < d) { g(i)(j) += xi * v(j).toDouble; j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((n, sums, g))
    }.collect()
    require(rows.nonEmpty, "empty input")
    val d = rows.head._2.length
    val sums = new Array[Double](d)
    val g = Array.ofDim[Double](d, d)
    var n = 0L
    rows.foreach { case (pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < d) {
        sums(i) += ps(i)
        var j = i
        while (j < d) { g(i)(j) += pg(i)(j); j += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < d) { var j = 0; while (j < i) { g(i)(j) = g(j)(i); j += 1 }; i += 1 }
    (n, sums, g)
  }

  /** Covariance matrix from [[gram]]: cov(i,j) = g(i,j)/n − mean_i·mean_j. */
  def covariance(df: DataFrame, vecCol: String): Array[Array[Double]] = {
    val (n, sums, g) = gram(df, vecCol)
    val d = sums.length
    val mean = sums.map(_ / n)
    Array.tabulate(d, d)((i, j) => g(i)(j) / n - mean(i) * mean(j))
  }

  /** Top-k principal components by power iteration with deflation over
    * the driver-side d×d covariance — returns k orthonormal rows.
    * Deterministic start vectors (e_argmax-diagonal) so reruns agree. */
  def pcaTopK(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 60): Array[Array[Double]] =
    pcaFromCov(covariance(df, vecCol), k, iters)

  private def pcaFromCov(cov: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val d = cov.length
    require(k <= d, s"k=$k > dim=$d")
    val a = cov.map(_.clone())
    val comps = new Array[Array[Double]](k)
    for (c <- 0 until k) {
      // deterministic start: unit vector at the largest remaining diagonal
      var v = {
        val seed = new Array[Double](d)
        seed((0 until d).maxBy(i => a(i)(i))) = 1.0
        seed
      }
      for (_ <- 0 until iters) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += a(i)(j) * v(j); j += 1 }
          w(i) = s; i += 1
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        v = if (nrm > 0) w.map(_ / nrm) else w
      }
      comps(c) = v
      // deflate: a -= λ v vᵀ
      val lambda = {
        var s = 0.0; var i = 0
        while (i < d) { var j = 0; var r = 0.0
          while (j < d) { r += a(i)(j) * v(j); j += 1 }
          s += v(i) * r; i += 1 }
        s
      }
      var i = 0
      while (i < d) { var j = 0
        while (j < d) { a(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1 }
    }
    comps
  }

  /** Project the embedding column onto `components` (k orthonormal
    * vectors): adds `outCol` as array<double> of length k. Per-row
    * expression — components ride into codegen as literals, nothing
    * shuffles. */
  def project(df: DataFrame, vecCol: String, components: Array[Array[Double]],
      outCol: String = "projected"): DataFrame = {
    val comps = components.map(c => typedlit(c.toSeq))
    df.withColumn(outCol, array(comps.map(c =>
      graft.functions.VectorFunctions.dot(col(vecCol), c)): _*))
  }

  /** [[pcaTopK]] plus the eigenvalue of each component (the Rayleigh
    * quotient vᵀCv against the undeflated covariance). */
  def pcaWithValues(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 60): (Array[Array[Double]], Array[Double]) = {
    val cov = covariance(df, vecCol)
    val comps = pcaFromCov(cov, k, iters)
    val values = comps.map { v =>
      val d = v.length
      var s = 0.0; var i = 0
      while (i < d) {
        var r = 0.0; var j = 0
        while (j < d) { r += cov(i)(j) * v(j); j += 1 }
        s += v(i) * r; i += 1
      }
      s
    }
    (comps, values)
  }

  /** PCA whitening: project onto the top-k components and scale each
    * coordinate by 1/√λ so every output dimension has unit variance —
    * the normalization step before cosine-based ANN when raw dimensions
    * have wildly different spread. Per-row expression, nothing
    * shuffles. */
  def whiten(df: DataFrame, vecCol: String, k: Int,
      outCol: String = "whitened", epsilon: Double = 1e-12): DataFrame = {
    val (comps, values) = pcaWithValues(df, vecCol, k)
    val scaled = comps.zip(values).map { case (c, lambda) =>
      val s = 1.0 / math.sqrt(math.max(lambda, epsilon))
      c.map(_ * s)
    }
    project(df, vecCol, scaled, outCol)
  }

  /** The oracle-exact covariance formulation for a dimension subset:
    * explode the first `dims` entries into aligned (i, x) rows, self-
    * join per row id into (i, j≥i) pairs, and run every sum through
    * exact decimals via the float→shortest-string route (the q54 rule —
    * the string-decimal value is what BOTH engines sum, so the result
    * is bit-identical anywhere). decimal(16,15) holds a full float
    * string for |x| ≥ 1e-6; the (33,30) product and (38,30) sums never
    * round. O(n·dims²) rows: the GATE path for a handful of dims, never
    * the scale path ([[gram]] is — asserted equal to 1e-9 in spec). */
  def exactCovarianceEntries(df: DataFrame, vecCol: String, idCol: String,
      dims: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val x = df
      .select(col(idCol).as("rid"),
        posexplode(slice(col(vecCol), 1, dims)).as(Seq("i0", "x")))
      .select(col("rid"), (col("i0") + 1).cast("long").as("i"),
        col("x").cast("string").cast(DecimalType(16, 15)).as("xdec"))
    val pairs = x.as("a").join(x.as("b"),
        col("a.rid") === col("b.rid") && col("b.i") >= col("a.i"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        (col("a.xdec") * col("b.xdec")).as("p"))
    val sp = pairs.groupBy(col("i"), col("j"))
      .agg(sum(col("p")).as("spdec"), count(lit(1)).as("n"))
    val si = x.groupBy(col("i"))
      .agg(sum(col("xdec")).as("sdec"))
    val d = (c: Column) => c.cast("string").cast("double")
    sp.join(broadcast(si.select(col("i").as("li"), col("sdec").as("sl"))),
        col("i") === col("li"))
      .join(broadcast(si.select(col("i").as("rj"), col("sdec").as("sr"))),
        col("j") === col("rj"))
      .select(col("i"), col("j"),
        (d(col("spdec")) / col("n").cast("double") -
          (d(col("sl")) / col("n").cast("double")) *
          (d(col("sr")) / col("n").cast("double"))).as("cov"))
  }

  /** Johnson–Lindenstrauss SIGN projection (Achlioptas, "Database-
    * friendly random projections", JCSS 66(4) 2003: ±1 entries satisfy
    * the JL lemma with the same distortion bound as Gaussians) — the
    * training-free dimensionality reduction that PCA ([[pca]]) is not:
    * no covariance pass, no eigen-solve, no model to ship; the
    * projection matrix is a pure function of (i, j). Where PCA earns
    * its two passes when directions matter, the sign sketch is what a
    * pipeline uses to knock 768 dims down before sketching/ANN when
    * any distance-preserving map will do.
    *
    * Determinism/portability: entry (i,j) is +1 iff the first hex char
    * of md5("i:j") is below '8' — both engines share md5, so a SQL
    * oracle rebuilds the exact matrix. Inputs quantize to longs
    * (floor(x·scale), [[Cluster.quantize]]'s contract) and outputs are
    * exact integer sums — no float accumulation order anywhere.
    *
    * Scale shape: ONE stateless projection — the k·d multiply-adds run
    * as a primitive loop inside whole-stage codegen (the
    * [[graft.expressions.MatVecLong]] kernel over the flat-packed ±1
    * matrix), zero shuffles. The earlier scalar-expression formulation
    * (k sums of d element_at terms inlined into the Generate) was the
    * same arithmetic but passed janino's 64 KB method limit at
    * 16×64 and silently fell back to interpreted eval — the r11 bench
    * tail carried exactly that trace (ADVICE r11). Quantization stays
    * a bounded HOF transform (floor(x·scale) per element, the same
    * expression as before), so the output is bit-identical and the
    * q154 oracle is unchanged. Output: (idCol, j, y), j in [0, k). */
  def signProject(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, scale: Long = 10000L): DataFrame = {
    require(k >= 1 && dim >= 1, s"need k, dim >= 1; got k=$k dim=$dim")
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Long = {
      val h = md.digest(s"$i:$j".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
    // rows = output dims j, cols = input dims i (MatVec layout)
    val signs: Seq[Seq[Long]] =
      Seq.tabulate(k)(j => Seq.tabulate(dim)(i => sign(i, j)))
    val quantized = transform(col(vecCol),
      x => floor(x.cast("double") * scale).cast("long"))
    import org.apache.spark.sql.GraftColumnBridge
    val ys = GraftColumnBridge.column(graft.expressions.MatVecLong(
      GraftColumnBridge.expression(quantized), signs))
    df.select(col(idCol), posexplode(ys).as(Seq("j", "y")))
      .select(col(idCol), col("j").cast("long").as("j"), col("y"))
  }
}
