package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression + ADC search (Jégou
  * et al., "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011): split each d-dim vector into m subspaces, k-means each
  * subspace independently, store only the m sub-codebook ids — d floats
  * become m small ints (64-dim float32 → 8 bytes at m=8, k≤256, a 32×
  * compression), and approximate distances to a query need only m
  * table lookups per candidate (asymmetric distance computation).
  *
  * Built on [[Cluster]]'s DETERMINISTIC integer k-means, which is what
  * makes this gate-able at all: quantized-long arithmetic, lowest-id
  * seeds, truncating-division updates, (d2, cid) tiebreaks — codes,
  * reconstruction errors, and ADC distances are pure functions of the
  * input, so a SQL oracle replays the entire train→encode→search
  * pipeline (the "deterministic seed + exact gate" shape NEXT.md asked
  * for; centroid QUALITY tuning — k-means++, OPQ rotations — belongs
  * offline, exactly like the classifier's weights).
  */
object Pq {

  /** Train per-subspace codebooks and encode every vector.
    *
    * Returns (encoded frame, codebooks[m][k][d/m]). Frame: (idCol,
    * codes: array<int> of length m, recon_d2: long — the exact squared
    * quantized reconstruction error Σ_s ‖v_s − c_codes[s]‖², the
    * per-vector compression-quality signal for free).
    *
    * Scale shape: training runs m independent [[Cluster.fitCentroids]]
    * loops over SLICES of one shared quantized localCheckpoint (each
    * round: a no-join codegen argmin pass + one (cluster, dim)
    * partial-agg shuffle collapsing to the k×(d/m) model); the ENCODE
    * is one single projection computing all m argmins over inlined
    * codebook literals — no join, no shuffle, nothing driver-side but
    * the m·k·(d/m) = k·d-long codebooks. */
  def encode(df: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, updates: Int = 1, scale: Long = 10000L)
      : (DataFrame, Array[Array[Array[Long]]]) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val q = df.select(col(idCol).as("__id"),
        Cluster.quantize(col(vecCol), scale).as("__v"))
      .localCheckpoint(false) // shared by the training rounds + the encode
    encodeQuantized(q, idCol, dim, m, k, updates)
  }

  /** Fast Walsh–Hadamard transform of a quantized long-vector column,
    * in place: y = H·x for the Sylvester matrix H[i][j] =
    * (−1)^popcount(i AND j) — the EXACT stand-in for OPQ's learned
    * rotation (Ge et al., "Optimized Product Quantization", CVPR
    * 2013): a float rotation can't gate bit-exactly, but H has ±1
    * entries, so in integer arithmetic the rotation is exact, and
    * H·Hᵀ = d·I means every pairwise squared distance scales by the
    * same factor d — nearest-neighbour order, k-means assignments, and
    * ADC ranking are all preserved while the energy of each vector
    * spreads across ALL subspaces (the structured-PQ failure mode —
    * one high-variance coordinate block dominating its subspace — is
    * exactly what a pre-rotation fixes; SRP/Fastfood use the same
    * Hadamard trick, arXiv:1408.3060).
    *
    * Plan shape: ONE per-row projection, no shuffle, no join, nothing
    * driver-side — the d·log d butterfly loop as a native kernel
    * inside whole-stage codegen ([[graft.expressions.FwhtLong]],
    * bit-identical to [[fwhtLocal]]). History of this shape: a
    * chained array-transform formulation dies at plan time (Catalyst
    * inlines each stage into the next's element_at — (2d)^log d
    * blowup, minutes of spin at d=64); the d² scalar ±-tree that
    * replaced it was codegen-able but its kilobytes of generated
    * straight-line adds made janino compile time the query's dominant
    * cost at bench scale (r18 q128 measurement) and every Lloyd-round
    * re-plan re-walked the tree. Component growth is ≤ d·max|x|: for
    * unit-norm vectors at scale 10⁴ that is 6.4×10⁵ at d=64, leaving
    * squared distances ~10¹³ — far inside long range. */
  def hadamardRotate(q: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two, got $dim")
    import org.apache.spark.sql.GraftColumnBridge
    q.withColumn(vecCol, GraftColumnBridge.column(
      graft.expressions.FwhtLong(
        GraftColumnBridge.expression(col(vecCol)), dim)))
  }

  /** [[encode]] with the [[hadamardRotate]] pre-rotation: quantize →
    * rotate → train/encode. Same deterministic contract (the rotation
    * is exact integer arithmetic), same outputs; codes and recon_d2
    * live in the rotated space (recon_d2 is d× the unrotated-space
    * error, uniformly — comparable across vectors as a quality signal
    * exactly like unrotated recon_d2). Searches against it must rotate
    * the query vector the same way before [[adcTopN]]. */
  def encodeRotated(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, updates: Int = 1, scale: Long = 10000L)
      : (DataFrame, Array[Array[Array[Long]]]) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val q = hadamardRotate(
        df.select(col(idCol).as("__id"),
          Cluster.quantize(col(vecCol), scale).as("__v")),
        "__v", dim)
      .localCheckpoint(false)
    encodeQuantized(q, idCol, dim, m, k, updates)
  }

  /** General LEARNED-rotation application: y = R·x over a quantized
    * long-vector column, where R is an integer-scaled rotation matrix
    * trained OFFLINE (real OPQ alternates codebook fit and Procrustes
    * rotation solves over a sample — a training loop that belongs
    * offline exactly like the classifier's weights, q110's pattern;
    * Ge et al., CVPR 2013). Because R's entries are integers, the
    * rotation is exact long arithmetic and the whole rotate → train →
    * encode → ADC pipeline stays a pure function of (input, R) — a
    * SQL oracle replays it bit-exactly, which a float rotation can
    * never do. R ≈ rscale·Q for orthogonal Q preserves
    * nearest-neighbour order up to the rounding perturbation; with
    * rscale 127 the relative rounding error per entry is < 0.4%.
    *
    * Plan shape: ONE per-row projection, no shuffle, no join — a
    * native expression ([[graft.expressions.MatVecLong]]) running the
    * d² multiply-adds as a primitive loop over the flat-packed matrix
    * INSIDE whole-stage codegen. The scalar-expression formulation
    * ([[hadamardRotate]]'s shape) is correct but generates d² term
    * nodes: at d=64 the whole-stage method passes the 64 KB limit and
    * Spark silently drops to interpreted projection — the loop kernel
    * keeps the hot path generated. (Hadamard keeps the scalar
    * butterfly because its log d stages share structure codegen CSE
    * recovers; a dense learned matrix has nothing to share.)
    *
    * Overflow bound: |y_i| ≤ d·max|x|·max|R| — at d=64, scale 10⁴,
    * rscale 127 that is 8.1×10⁷, so subspace squared distances stay
    * ≤ dsub·(2·8.1×10⁷)² ≈ 2×10¹⁷ — inside long range with the same
    * headroom the Hadamard path documents. */
  def rotateByMatrix(q: DataFrame, vecCol: String,
      rot: Array[Array[Long]]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    q.withColumn(vecCol, GraftColumnBridge.column(
      graft.expressions.MatVecLong(
        GraftColumnBridge.expression(col(vecCol)),
        rot.map(_.toSeq).toSeq)))
  }

  /** [[encode]] with a learned integer rotation ([[rotateByMatrix]]):
    * quantize → rotate by R → train/encode. Same deterministic
    * contract as [[encodeRotated]]; searches must rotate the query
    * through [[adcTopNMatrixRotated]] (same R). */
  def encodeMatrixRotated(df: DataFrame, idCol: String, vecCol: String,
      rot: Array[Array[Long]], m: Int, k: Int, updates: Int = 1,
      scale: Long = 10000L)
      : (DataFrame, Array[Array[Array[Long]]]) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(rot.length == dim,
      s"rotation is ${rot.length}-dim, vectors are $dim-dim")
    val q = rotateByMatrix(
        df.select(col(idCol).as("__id"),
          Cluster.quantize(col(vecCol), scale).as("__v")),
        "__v", rot)
      .localCheckpoint(false)
    encodeQuantized(q, idCol, dim, m, k, updates)
  }

  /** Driver-side y = R·x — the query-vector half of
    * [[rotateByMatrix]], one d² integer multiply-accumulate. */
  def rotLocal(rot: Array[Array[Long]], x: Array[Long]): Array[Long] = {
    require(rot.length == x.length,
      s"rotation is ${rot.length}-dim, vector is ${x.length}-dim")
    rot.map { row =>
      var s = 0L; var j = 0
      while (j < x.length) { s += row(j) * x(j); j += 1 }
      s
    }
  }

  /** [[adcTopN]] against an [[encodeMatrixRotated]] index: the query
    * takes the same quantize → R path the corpus did, then searches
    * the rotated-space codes. */
  def adcTopNMatrixRotated(encoded: DataFrame, idCol: String,
      books: Array[Array[Array[Long]]], rot: Array[Array[Long]],
      queryVec: Array[Float], n: Int, scale: Long = 10000L): DataFrame =
    adcTopNQuantized(encoded, idCol, books,
      rotLocal(rot,
        queryVec.map(x => math.floor(x.toDouble * scale).toLong)), n)

  /** A closed-form integer "trained" rotation fixture: `sweeps`·d
    * Givens rotations with hash-derived planes and angles composed
    * onto the identity, then rounded to rscale·Q — a deterministic
    * stand-in for offline-learned OPQ weights (the q110
    * offline-weights pattern: the training loop lives outside the
    * engine; the engine's contract is exact application of a given
    * model). Pure SplitMix64 arithmetic + StrictMath trig, so the
    * matrix is bit-identical across runs and platforms; Q is exactly
    * orthogonal before rounding, and the ±0.5 entry rounding keeps
    * ‖RᵀR − rscale²·I‖ small enough that neighbour order is
    * preserved at recall-measurement fidelity. */
  def learnedRotationFixture(dim: Int, rscale: Long = 127L,
      sweeps: Int = 4): Array[Array[Long]] = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    def h(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val g = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var t = 0L
    while (t < sweeps.toLong * dim) {
      val a = java.lang.Math.floorMod(h(3 * t), dim)
      val b0 = java.lang.Math.floorMod(h(3 * t + 1), dim - 1)
      val b = if (b0 >= a) b0 + 1 else b0 // b != a, uniform
      val theta = 2.0 * StrictMath.PI *
        ((h(3 * t + 2) >>> 11).toDouble / (1L << 53).toDouble)
      val c = StrictMath.cos(theta)
      val s = StrictMath.sin(theta)
      var r = 0
      while (r < dim) {
        val ga = g(r)(a); val gb = g(r)(b)
        g(r)(a) = c * ga - s * gb
        g(r)(b) = s * ga + c * gb
        r += 1
      }
      t += 1
    }
    g.map(_.map(v => StrictMath.round(v * rscale.toDouble)))
  }

  /** Fit a rotation TO DATA offline — OPQ's non-parametric
    * initialization (Ge et al., "Optimized Product Quantization",
    * CVPR 2013 §4: PCA + eigenvalue allocation): eigendecompose the
    * sample covariance, then distribute eigenvectors across the m
    * subspaces so the PRODUCT of per-subspace eigenvalues balances
    * (quantizer distortion tracks the product — Ge §4). The
    * allocation deals the descending spectrum in SNAKE order
    * (0..m−1, m−1..0, …): each bucket gets exactly d/m eigenvalues
    * pairing large with small rounds. The naive "next eigenvalue to
    * the bucket with the smallest current product" greedy
    * death-spirals whenever the spectrum sits below 1 (the smallest
    * bucket keeps shrinking and keeps receiving — measured log-range
    * 9.6 vs snake's 0.13 on the reference embeddings); the serpentine
    * deal is the standard balanced-assignment fix and is what ships.
    * Balanced subspace spectra are the whole point of OPQ — one
    * high-variance block starving the other codebooks is the failure
    * mode a rotation exists to fix.
    *
    * This is the OFFLINE training half of the q110 weights pattern:
    * run it once over a bounded sample, round to rscale·Q, commit the
    * integer matrix as a fixture; the engine's gates stay exact
    * application of the committed model ([[rotateByMatrix]]).
    * Driver-side on a bounded sample by design (training a d×d model
    * needs thousands of rows, not the corpus; the d×d covariance
    * could equally come from [[Linalg]]'s distributed sums).
    *
    * Deterministic: cyclic Jacobi with a fixed sweep count and
    * StrictMath throughout, sign-canonicalized eigenvectors (largest
    * |component| positive, first index on ties), eigenvalue ties cut
    * by original index, allocation ties by bucket index. Pure function
    * of (sample, m, rscale, sweeps) across platforms. */
  def fitRotationPca(sample: Array[Array[Double]], m: Int,
      rscale: Long = 127L, sweeps: Int = 16): Array[Array[Long]] = {
    val n = sample.length
    require(n >= 2, s"need at least 2 sample vectors, got $n")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    // sample covariance (biased 1/n — scaling does not move eigenvectors)
    val mean = Array.tabulate(d)(j => sample.map(_(j)).sum / n)
    val a = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var r = 0
      while (r < n) {
        s += (sample(r)(i) - mean(i)) * (sample(r)(j) - mean(j)); r += 1
      }
      s / n
    }
    // cyclic-by-row Jacobi: A <- Jᵀ A J accumulating V (columns =
    // eigenvectors); fixed sweep count keeps the run deterministic
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = StrictMath.signum(theta) /
              (StrictMath.abs(theta) +
                StrictMath.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 -> t = 1
                case x => x
              }
            val c = 1.0 / StrictMath.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // eigenpairs sorted by eigenvalue desc (ties: original index), each
    // eigenvector sign-canonicalized for cross-run stability
    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      val piv = vec.indices.maxBy(i => (StrictMath.abs(vec(i)), -i))
      val canon = if (vec(piv) < 0.0) vec.map(-_) else vec
      (a(j)(j), j, canon)
    }.sortBy { case (ev, j, _) => (-ev, j) }
    // snake-order eigenvalue allocation: balance Σ log λ per bucket
    val dsub = d / m
    val buckets = Array.fill(m)(List.empty[Array[Double]])
    pairs.zipWithIndex.foreach { case ((_, _, vec), r) =>
      val round = r / m
      val pos = r % m
      val b = if (round % 2 == 0) pos else m - 1 - pos
      buckets(b) = buckets(b) :+ vec
    }
    // rows of R = eigenvectors grouped by bucket: y = R·x lands bucket
    // b's principal directions in subspace b
    buckets.flatten
      .map(_.map(x => StrictMath.round(x * rscale.toDouble)))
      .toArray
  }

  /** Train + encode over an already-quantized (__id, __v) frame —
    * the shared back half of [[encode]] / [[encodeRotated]]. */
  private def encodeQuantized(q: DataFrame, idCol: String, dim: Int,
      m: Int, k: Int, updates: Int, passthrough: Seq[String] = Nil)
      : (DataFrame, Array[Array[Array[Long]]]) = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // ALL m subspaces train together: one seed collect (slice the k
    // lowest-id full vectors driver-side) and ONE job per Lloyd round
    // — explode (subspace, code, subvector), aggregate (s, c, dim)
    // partial sums, collect the combined k·d-long model. m separate
    // fitCentroids loops would schedule 3m mini-jobs per round; at
    // bench scale the scheduling overhead dominates the math.
    val seeds = q.orderBy(col("__id")).limit(k)
      .select(col("__v")).collect().map(_.getSeq[Long](0).toArray)
    require(seeds.length == k,
      s"need at least $k vectors to seed, got ${seeds.length}")
    var books: Array[Array[Array[Long]]] = Array.tabulate(m)(s =>
      seeds.map(v => v.slice(s * dsub, (s + 1) * dsub)))
    var t = 0
    while (t < updates) {
      // staged selects: argmin structs and generators must not share a
      // projection (field names degrade during resolution — the
      // Cluster.fitCentroids lesson)
      val subCols = (0 until m).map { s =>
        val sv = slice(col("__v"), s * dsub + 1, dsub)
        struct(lit(s).as("s"),
          Cluster.nearestExpr(sv, books(s)).getField("cluster").as("c"),
          sv.as("sv"))
      }
      val sums = q.select(array(subCols: _*).as("__subs"))
        .select(explode(col("__subs")).as("e"))
        .select(col("e.s").as("__s"), col("e.c").as("__c"),
          col("e.sv").as("__sv"))
        .select(col("__s"), col("__c"),
          posexplode(col("__sv")).as(Seq("__p", "__x")))
        .groupBy(col("__s"), col("__c"), col("__p"))
        .agg(sum(col("__x")).as("__sum"), count(lit(1)).as("__n"))
        .collect() // m·k·(d/m) = k·d rows — the model, not the corpus
      val upd = books.map(_.map(_.clone()))
      sums.foreach { r =>
        upd(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getLong(3) / r.getLong(4)
      }
      books = upd
      t += 1
    }
    val nearest = (0 until m).map { s =>
      Cluster.nearestExpr(slice(col("__v"), s * dsub + 1, dsub), books(s))
        .as(s"__b$s")
    }
    val enc = q.select(col("__id") +: nearest ++: passthrough.map(col): _*)
      .select(col("__id").as(idCol) +:
        array((0 until m).map(s =>
          col(s"__b$s").getField("cluster")): _*).as("codes") +:
        (0 until m).map(s => col(s"__b$s").getField("d2"))
          .reduce(_ + _).as("recon_d2") +:
        passthrough.map(col): _*)
    (enc, books)
  }

  /** IVF-PQ — the FAISS-style composition that IS the billion-scale
    * ANN shape: coarse-quantize with [[Cluster]]'s deterministic
    * integer k-means, PQ-encode each vector's RESIDUAL against its
    * coarse centroid (residuals are exact long subtractions, so the
    * whole pipeline stays a pure function and gates bit-exactly), and
    * search by probing only the nprobe coarse lists nearest the query
    * — the candidate set shrinks by ~kCoarse/nprobe BEFORE any ADC
    * work, which is what makes PQ search sublinear at corpus scale.
    * Residual encoding is why IVF-PQ beats flat PQ at equal bits:
    * within a list the residual energy is much smaller than raw
    * vector energy, so the same k codes quantize it finer.
    *
    * Returns (encoded — (idCol, codes, recon_d2, list), coarse
    * centroids, per-subspace codebooks). Scale shape: one coarse
    * train (model-sized driver data), one residual projection off the
    * shared quantized checkpoint, then [[encode]]'s per-subspace
    * training; persist the encoded frame partitioned by `list` (the
    * [[graft.operators.Similarity]] IVF index layout) and the probe
    * becomes partition-pruned I/O. */
  def encodeIvfPq(df: DataFrame, idCol: String, vecCol: String,
      kCoarse: Int, m: Int, k: Int, updates: Int = 1,
      scale: Long = 10000L)
      : (DataFrame, Array[Array[Long]], Array[Array[Array[Long]]]) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val q = df.select(col(idCol).as("__id"),
        Cluster.quantize(col(vecCol), scale).as("__v"))
      .localCheckpoint(false)
    val coarse = Cluster.fitCentroids(q, kCoarse, updates)
    val cents2d = typedLit(coarse.map(_.toSeq).toSeq)
    // residuals in a SEPARATE projection from the argmin struct (the
    // fitCentroids staged-select lesson), then checkpointed: shared by
    // the m training loops and the final encode
    val resid = q
      .select(col("__id"), col("__v"),
        Cluster.nearestExpr(col("__v"), coarse)
          .getField("cluster").as("list"))
      .select(col("__id"),
        zip_with(col("__v"), element_at(cents2d, col("list") + 1),
          (a, b) => a - b).as("__v"),
        col("list"))
      .localCheckpoint(false)
    val (enc, books) =
      encodeQuantized(resid, idCol, dim, m, k, updates, Seq("list"))
    (enc, coarse, books)
  }

  /** ADC search over an [[encodeIvfPq]] index: rank the coarse lists
    * by exact integer distance to the query, probe the nearest
    * `nprobe`, and ADC each candidate against the QUERY RESIDUAL of
    * its own list (per-(list, subspace) lookup tables computed
    * driver-side — nprobe·m·k longs — and selected per row by a
    * when-chain on the list column). Only rows of probed lists are
    * read (partition-pruned when the frame is persisted by list);
    * (adc_d2, id) total order. Output: (idCol, list, adc_d2). */
  def ivfPqTopN(encoded: DataFrame, idCol: String,
      coarse: Array[Array[Long]], books: Array[Array[Array[Long]]],
      queryVec: Array[Float], nprobe: Int, n: Int,
      scale: Long = 10000L): DataFrame = {
    val m = books.length
    val dsub = books(0)(0).length
    val qq = queryVec.map(x => math.floor(x.toDouble * scale).toLong)
    require(qq.length == m * dsub,
      s"query dim ${qq.length} != ${m * dsub}")
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val probed = coarse.zipWithIndex
      .map { case (c, j) => (d2(qq, c), j) }.sorted.take(nprobe)
      .map(_._2)
    // per-list ADC tables over the query's residual for THAT list
    val tables: Map[Int, Array[Array[Long]]] = probed.map { l =>
      val qr = qq.zip(coarse(l)).map { case (a, b) => a - b }
      l -> books.zipWithIndex.map { case (book, s) =>
        book.map { c =>
          var acc = 0L; var i = 0
          while (i < dsub) {
            val diff = qr(s * dsub + i) - c(i); acc += diff * diff
            i += 1
          }
          acc
        }
      }
    }.toMap
    val adc = probed.map { l =>
      when(col("list") === l,
        (0 until m).map(s =>
            element_at(typedLit(tables(l)(s).toSeq),
              col("codes").getItem(s) + 1))
          .reduce(_ + _))
    }.reduceRight(_ otherwise _) // right fold: one otherwise per when
    encoded.filter(col("list").isin(probed.map(Int.box): _*))
      .select(col(idCol), col("list"), adc.as("adc_d2"))
      .orderBy(col("adc_d2"), col(idCol)).limit(n)
  }

  /** ADC top-n: approximate nearest neighbours of one query vector
    * over a PQ-encoded frame. dist(q, x) ≈ Σ_s ‖q_s − c_codes[s](x)‖²
    * in exact quantized-long arithmetic: the per-subspace lookup
    * tables (k distances each) are computed driver-side from the
    * codebooks and inlined, so scoring a candidate is m array lookups
    * + m−1 adds inside codegen, and the top-n is a
    * TakeOrderedAndProject heap — the whole search touches only the
    * m-int codes column, never the original vectors. Ties break to the
    * lowest id. */
  def adcTopN(encoded: DataFrame, idCol: String,
      books: Array[Array[Array[Long]]], queryVec: Array[Float], n: Int,
      scale: Long = 10000L): DataFrame =
    adcTopNQuantized(encoded, idCol, books,
      queryVec.map(x => math.floor(x.toDouble * scale).toLong), n)

  /** [[adcTopN]] against a [[encodeRotated]] index: the query vector
    * takes the SAME quantize→Hadamard path as the corpus did (driver-
    * side — it is one d-long butterfly), then searches the rotated-
    * space codes. Because H scales all squared distances uniformly,
    * the result ranks candidates exactly as an unrotated ADC would
    * rank them under an unrotated codebook of the same quality. */
  def adcTopNRotated(encoded: DataFrame, idCol: String,
      books: Array[Array[Array[Long]]], queryVec: Array[Float], n: Int,
      scale: Long = 10000L): DataFrame =
    adcTopNQuantized(encoded, idCol, books,
      fwhtLocal(queryVec.map(x => math.floor(x.toDouble * scale).toLong)),
      n)

  /** Driver-side in-place FWHT — the same Sylvester transform
    * [[hadamardRotate]] applies to the corpus, for query vectors. */
  def fwhtLocal(x: Array[Long]): Array[Long] = {
    val d = x.length
    require(d > 0 && (d & (d - 1)) == 0,
      s"dim must be a power of two, got $d")
    val y = x.clone()
    var h = 1
    while (h < d) {
      var i = 0
      while (i < d) {
        if ((i & h) == 0) {
          val a = y(i); val b = y(i + h)
          y(i) = a + b; y(i + h) = a - b
        }
        i += 1
      }
      h <<= 1
    }
    y
  }

  private def adcTopNQuantized(encoded: DataFrame, idCol: String,
      books: Array[Array[Array[Long]]], qq: Array[Long],
      n: Int): DataFrame = {
    val m = books.length
    val dsub = books(0)(0).length
    require(qq.length == m * dsub,
      s"query dim ${qq.length} != ${m * dsub}")
    val tables: Array[Array[Long]] = books.zipWithIndex.map {
      case (book, s) =>
        book.map { c =>
          var d2 = 0L
          var i = 0
          while (i < dsub) {
            val diff = qq(s * dsub + i) - c(i)
            d2 += diff * diff
            i += 1
          }
          d2
        }
    }
    val adc = (0 until m).map(s =>
        element_at(typedLit(tables(s).toSeq),
          col("codes").getItem(s) + 1))
      .reduce(_ + _)
    encoded.select(col(idCol), adc.as("adc_d2"))
      .orderBy(col("adc_d2"), col(idCol)).limit(n)
  }
}
