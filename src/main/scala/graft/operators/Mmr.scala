package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
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

  /** Cosine in the exact arithmetic shape of [[rerank]]'s cosD and the
    * q166 oracle: dot/(sqrt(dot)·sqrt(dot)), each dot a native VecDot
    * (ascending-index double fold == DuckDB list_dot_product). */
  private def cosC(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = graft.functions.VectorFunctions.dot(x, y)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Corpus-scale MMR: the greedy diversity pass applied PER GROUP
    * (per cluster, per query, per domain — the shape a data-mixing
    * pass actually needs), with every group's pool CONTRACT-BOUNDED
    * to its top-`m` candidates by (rel DESC, id).
    *
    * Scale design: [[rerank]] is deliberately driver-side over ONE
    * bounded pool; this distributes the same greedy over millions of
    * groups with ZERO driver-side data and zero per-step shuffles.
    * Stage 1 caps each group to m rows ([[Sample.capPerKey]] — a
    * WindowGroupLimit plan, so the top-m heap runs map-side before
    * the one groupBy exchange). Stage 2 collects each group's pool
    * into a single row (bounded: m×(d+2) values). Stage 3 runs all k
    * greedy steps as ONE projection of nested higher-order
    * expressions — per step, an argmax fold over the pool indices
    * whose diversity penalty is an inner max-fold over the selected
    * set; inter-step state (the selected-index array) is bound
    * through a single-element transform so each step references its
    * predecessor exactly once (the q128/q149 exponential-reinlining
    * lesson). Per-row cost is O(k·m·(m·d)) — bounded by contract, and
    * embarrassingly parallel across groups.
    *
    * Numerics are IEEE-identical to [[rerank]] and the q166 oracle:
    * scores are lamNum·rel − (lamDen−lamNum)·maxSim in double, ties
    * break to the smaller id, and similarity folds are VecDot's
    * ascending-index double sequence — so a SQL oracle replays every
    * pick per group. Output: (groupCol, step 1.., id) in pick order.
    */
  def rerankGrouped(cands: DataFrame, groupCol: String, idCol: String,
      vecCol: String, relCol: String, k: Int, m: Int,
      lamNum: Int = 7, lamDen: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(m >= k, s"pool bound m=$m must be >= k=$k")
    require(lamNum >= 0 && lamDen > 0 && lamNum <= lamDen,
      s"lambda $lamNum/$lamDen not in [0,1]")
    val typed = cands.select(cands(groupCol).as("__g"),
      cands(idCol).cast("long").as("__id"),
      cands(vecCol).cast("array<double>").as("__v"),
      cands(relCol).cast("double").as("__rel"))
    val capped = Sample.capPerKey(typed, col("__g"),
      Seq(col("__rel").desc, col("__id")), cap = m)
    val grouped = capped.groupBy(col("__g"))
      .agg(collect_list(struct(col("__id").as("id"), col("__v").as("v"),
        col("__rel").as("rel"))).as("__pool"))
    // one greedy step: argmax over unselected pool indices of
    // lamNum·rel − (lamDen−lamNum)·max_{j∈sel} cos(v_i, v_j), ties to
    // the smaller id; appends the winning index (or nothing, once the
    // pool is exhausted). `sel` must be a BOUND variable — the caller
    // wraps this through a single-element transform.
    def step(sel: Column, p: Column): Column = {
      val best = aggregate(
        sequence(lit(0), size(p) - 1),
        struct(lit(-1).as("idx"), lit(0.0).as("score"),
          lit(Long.MaxValue).as("id")),
        (st, i) => {
          val cand = element_at(p, i + 1)
          val mx = aggregate(sel, lit(Double.NegativeInfinity),
            (acc, j) => greatest(acc,
              cosC(cand.getField("v"),
                element_at(p, j + 1).getField("v"))))
          val score = when(size(sel) === 0,
              lit(lamNum) * cand.getField("rel"))
            .otherwise(lit(lamNum) * cand.getField("rel")
              - lit(lamDen - lamNum) * mx)
          val better = !array_contains(sel, i) &&
            (st.getField("idx") === lit(-1) ||
              score > st.getField("score") ||
              (score === st.getField("score") &&
                cand.getField("id") < st.getField("id")))
          when(better, struct(i.as("idx"), score.as("score"),
            cand.getField("id").as("id"))).otherwise(st)
        })
      when(best.getField("idx") >= 0,
        concat(sel, array(best.getField("idx")))).otherwise(sel)
    }
    var sel: Column = array().cast("array<int>")
    for (_ <- 1 to k)
      sel = element_at(transform(array(sel),
        s => step(s, col("__pool"))), 1)
    grouped
      .select(col("__g"), posexplode(transform(sel,
        i => element_at(col("__pool"), i + 1).getField("id")))
        .as(Seq("__s0", "id")))
      .select(col("__g").as(groupCol),
        (col("__s0") + 1).cast("long").as("step"), col("id"))
  }
}
