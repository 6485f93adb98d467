package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR'98) — the diversity pass between retrieval and consumption:
  * from a relevance-ranked candidate pool, greedily pick the item
  * maximizing λ·rel(i) − (1−λ)·max_{s∈selected} sim(i, s), so near-
  * duplicate hits don't crowd the result list. In a training-data
  * pipeline this is the "diverse exemplars" selector (dedup at
  * selection time rather than corpus time).
  *
  * Scale design: MMR is inherently sequential in k, and its input is
  * BY CONSTRUCTION a bounded top-m candidate list (the distributed
  * retrieval stage — brute-force, LSH or IVF top-m — did the corpus
  * work). So the greedy runs driver-side over the collected pool:
  * O(k·m) float ops on ≤ `maxPool` rows, the same bounded-collect
  * pattern as the 4096-row centroid samples in [[Similarity]]. A
  * `require` refuses an unbounded frame rather than silently
  * collecting a corpus.
  *
  * Engine portability: λ is the rational lamNum/lamDen and the
  * selection key is the lamDen-scaled score lamNum·rel −
  * (lamDen−lamNum)·maxSim (same argmax, no double λ literal);
  * similarities fold ascending-index in double precision — the
  * identical sequence of IEEE ops as the Spark VecDot expression and
  * DuckDB's list_dot_product (pinned by the q36 gate), so a SQL
  * oracle replays every pick including exact-tie id breaks.
  */
object Mmr {

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cosD(a: Array[Double], b: Array[Double]): Double =
    dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))

  /** Greedy-select `k` of the pool's candidates. `pool` must carry an
    * id, an embedding (array of float/double) and a relevance score;
    * returns (step, id) with step 1..min(k, |pool|) in pick order. */
  def rerank(pool: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int, lamNum: Int = 7, lamDen: Int = 10,
      maxPool: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lamNum >= 0 && lamDen > 0 && lamNum <= lamDen,
      s"lambda $lamNum/$lamDen not in [0,1]")
    val rows = pool.select(pool(idCol).cast("long"),
        pool(vecCol).cast("array<double>"), pool(relCol).cast("double"))
      .limit(maxPool + 1).collect()
    require(rows.length <= maxPool,
      s"MMR pool exceeds maxPool=$maxPool — pass a bounded top-m " +
        "candidate list, not a corpus")
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Double](1).toArray)
    val rels = rows.map(_.getDouble(2))
    val n = rows.length
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    // true max over the selected set — NOT clamped at zero: cosine
    // penalties can be negative (a bonus, per the standard formula),
    // and the q166 oracle's max(sim) is the true max too
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val picked = Array.fill(n)(false)
    val steps = math.min(k, n)
    var step = 0
    while (step < steps) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val score =
            if (selected.isEmpty) lamNum * rels(i)
            else lamNum * rels(i) - (lamDen - lamNum) * maxSim(i)
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(i) < ids(best))) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      picked(best) = true
      selected += best
      // fold the new pick into every survivor's max-sim
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val s = cosD(vecs(j), vecs(best))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      step += 1
    }
    val out = selected.zipWithIndex.map { case (i, s) =>
      Row((s + 1).toLong, ids(i))
    }
    pool.sparkSession.createDataFrame(
      pool.sparkSession.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField("step", LongType, nullable = false),
        StructField("id", LongType, nullable = false))))
  }
}
