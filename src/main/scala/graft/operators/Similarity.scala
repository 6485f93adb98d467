package graft.operators

import graft.functions.VectorFunctions._
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (north-star operator; absent from the reference, which has no
  * vector surface at all — SURVEY.md §2.2).
  *
  * Three tiers:
  *  - brute-force cosine top-k: exact baseline. One pass over the table,
  *    TakeOrderedAndProject keeps a k-heap per partition — O(n·dim) work,
  *    O(k) memory, no shuffle beyond the final k-merge. Right answer for
  *    one-off queries even at scale.
  *  - LSH-bucketed: random-hyperplane signatures partition vectors into
  *    2^planes buckets; a query probes the `probes` buckets nearest to
  *    its own signature by hamming distance, then reranks exactly.
  *  - IVF (inverted file): a coarse k-means quantizer assigns every
  *    vector to one of `nLists` lists. BUILD and PROBE are separate:
  *    [[buildIvfIndex]] persists list-partitioned parquet once;
  *    [[ivfProbe]] reads only the probed lists (partition pruning does
  *    the seek — at 100 TB a probe touches nProbes/nLists of the data).
  *    Training runs a deterministic Lloyd's loop on a bounded ordered
  *    sample on the driver (the standard IVF recipe — quantizer quality
  *    needs a sample, not the corpus), and assignment is a codegen'd
  *    argmin-of-distances expression, so the build is one pass + one
  *    partitioned write, no MLlib iteration jobs.
  */
object Similarity {

  /** Exact top-k by cosine for one stored query vector (self-lookup
    * excluded). Deterministic tie-break on id. */
  def topKForId(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn"))
    emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        (dot(col(vecCol), col("__qv"))
          / (norm(col(vecCol)) * col("__qn"))).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact knn join: for every query row, its k nearest items by cosine.
    * queries must be broadcastable (the usual case: a batch of probe
    * vectors against a big corpus); items stream through one partition-
    * local rank. */
  def knnJoin(queries: DataFrame, items: DataFrame, qVec: String,
      qId: String, iVec: String, iId: String, k: Int): DataFrame = {
    val joined = items
      .select(col(iId), col(iVec), norm(col(iVec)).as("__in"))
      .crossJoin(
        broadcast(queries.select(col(qId).as("query_id"),
          col(qVec).as("__qv"), norm(col(qVec)).as("__qn"))))
      .filter(col(iId) =!= col("query_id"))
      .select(col("query_id"), col(iId).as("item_id"),
        (dot(col(iVec), col("__qv")) / (col("__in") * col("__qn")))
          .as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("item_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training data (the DPR
    * recipe, Karpukhin et al. arXiv:2004.04906 §3.2: the negatives
    * that move the loss are the most-similar items that are NOT
    * positives): for every query row, the k most cosine-similar items
    * whose label differs from the query's. Self-pairs are excluded as
    * in [[knnJoin]]; ties break (sim DESC, item_id) so the mined set
    * is deterministic. Output: (query_id, item_id, sim, rank ≤ k).
    *
    * Scale shape: identical to [[knnJoin]] — the query batch (the
    * usual case: one training shard's anchors) broadcasts into the
    * item scan, the label-mismatch filter runs inside that stage
    * before anything shuffles, and the per-query top-k is one rank
    * window over (query, sim). For corpus-as-queries mining, feed LSH
    * candidates ([[lshTableCandidates]]) through the same
    * label-mismatch + rank tail instead of the cross join. */
  def hardNegatives(queries: DataFrame, items: DataFrame, qVec: String,
      qId: String, qLabel: String, iVec: String, iId: String,
      iLabel: String, k: Int): DataFrame = {
    val joined = items
      .select(col(iId), col(iVec), col(iLabel).as("__il"),
        norm(col(iVec)).as("__in"))
      .crossJoin(
        broadcast(queries.select(col(qId).as("query_id"),
          col(qVec).as("__qv"), col(qLabel).as("__ql"),
          norm(col(qVec)).as("__qn"))))
      .filter(col(iId) =!= col("query_id") &&
        col("__il") =!= col("__ql"))
      .select(col("query_id"), col(iId).as("item_id"),
        (dot(col(iVec), col("__qv")) / (col("__in") * col("__qn")))
          .as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("item_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk, ACL 2019
    * arXiv:1811.01136 §3: the CCMatrix/LASER bitext-mining criterion):
    * absolute cosine over-retrieves in dense neighborhoods, so score
    * each candidate pair by its cosine RELATIVE to both endpoints'
    * neighborhoods — margin(x,y) = cos(x,y) / ((avgNNk(x→Y) +
    * avgNNk(y→X)) / 2) with `ratio` margin and k-NN averages in both
    * directions — then keep, per source vector, the best target BY
    * MARGIN among its top-k cosine candidates (the forward strategy),
    * ranked corpus-wide. The aligned-pair miner for parallel corpora,
    * cross-modal pairs, or caption↔image alignment.
    *
    * Numerics: cosines fold bit-identically cross-engine (file-head
    * contract); each neighborhood sum runs over FIXED-POINT cosines —
    * floor(cos·1e18) as a long, summed exactly in DECIMAL(38,0) —
    * and the margin is a FIXED chain of correctly-rounded double ops:
    * cos / ((sx/1e18/cx + sy/1e18/cy) / 2). Every step (multiply,
    * floor, exact integer sum, SCALE-0 decimal→double, divisions) is
    * a single correctly-rounded conversion in both engines, so
    * values, cuts, and ranks all gate hash-exact. (A DECIMAL(·,18)
    * sum is NOT portable: converting a scaled decimal to double
    * divides by 10^18 after a first rounding in some engines — two
    * roundings, last-ulp drift. Scale 0 has no division, hence the
    * fixed-point quantization; the documented semantics is
    * "neighborhood averages quantized at 1e-18".)
    *
    * Scale shape: this form broadcasts the SOURCE side (a probe batch
    * / one shard of the smaller language) into the target scan — the
    * knnJoin contract; both rank windows and both stat aggs key on
    * vector ids, so nothing exceeds one exchange of the candidate
    * table per direction. For corpus×corpus mining, use
    * [[marginMiningLsh]] (bucketed candidates), or generate candidates
    * with [[lshTableCandidates]]/[[ivfProbe]] and feed them to
    * [[marginFromSims]] — the margin tail is candidate-bounded either
    * way, never all-pairs. `maxBuild` makes the probe-batch contract
    * BINDING (the [[Mmr.rerank]] maxPool pattern, r13 verdict item 2):
    * a corpus-sized left side fails fast instead of silently building
    * an N² cross product.
    *
    * '''Eager guard (ADVICE r14):''' enforcing `maxBuild` runs a
    * `limit(maxBuild+1).count()` Spark job AT PLAN-CONSTRUCTION TIME,
    * so calling this method triggers an action and evaluates the left
    * subtree once for the guard and again in the returned plan. Cache
    * or checkpoint an expensive left side first, and do not construct
    * this plan in latency-sensitive or deliberately-lazy contexts. */
  def marginMining(left: DataFrame, right: DataFrame, lVec: String,
      lId: String, rVec: String, rId: String, k: Int,
      n: Int, maxBuild: Int = 10000): DataFrame = {
    require(maxBuild >= 1, s"maxBuild must be >= 1, got $maxBuild")
    val nLeft = left.select(col(lId)).limit(maxBuild + 1).count()
    require(nLeft <= maxBuild,
      s"marginMining broadcasts the left side into the corpus scan and " +
        s"the left side exceeds maxBuild=$maxBuild rows — this form is " +
        "for a probe batch / one shard of the smaller language. For " +
        "corpus x corpus mining use marginMiningLsh, or feed LSH/IVF " +
        "candidates to marginFromSims")
    val sims = right
      .select(col(rId).as("dst_id"), col(rVec).as("__rv"),
        norm(col(rVec)).as("__rn"))
      .crossJoin(broadcast(left.select(col(lId).as("src_id"),
        col(lVec).as("__lv"), norm(col(lVec)).as("__ln"))))
      .select(col("src_id"), col("dst_id"),
        (dot(col("__rv"), col("__lv")) / (col("__rn") * col("__ln")))
          .as("cos"))
    marginFromSims(sims, k, n)
  }

  /** Corpus×corpus margin mining through BUCKETED candidates — the
    * scale form of [[marginMining]] (r13 verdict item 2: the cross-join
    * form is quadratic and gated against corpus-sized builds). Candidate
    * generation is sign-bit LSH ([[signBitCandidates]]): `numTables`
    * hash tables, table t bucketing on the packed sign bits of
    * coordinates [t·p, (t+1)·p) — axis-aligned random-hyperplane LSH,
    * valid whenever the embedding is isotropic in its coordinate basis
    * (pre-rotate with [[graft.functions.VectorFunctions.hadamardRotate]]
    * when it is not, the q128 operator). A pair is a candidate when it
    * shares ANY table's bucket; the margin tail ([[marginFromSims]])
    * then runs candidate-bounded.
    *
    * Scale shape: per-table bucket join on (table, bucket) — an
    * inverted-index equi-join, never all-pairs — with a BINDING
    * per-bucket cap (`maxBucket` rows per side per (table, bucket),
    * deterministic by id), so worst-case candidate volume is
    * numTables · 2^planes · maxBucket² regardless of corpus size. In
    * production `planesPerTable` grows with log(corpus) to hold
    * per-bucket occupancy flat (the cap is the backstop, not the plan);
    * the cap would key on a salt-hash rather than raw id for fairness
    * when ids encode ingest order. Everything here — sign buckets, cap
    * ranks, cosines, the fixed-point margin chain — is a deterministic
    * chain both engines replay exactly, so the gate is hash-exact. */
  def marginMiningLsh(left: DataFrame, right: DataFrame, lVec: String,
      lId: String, rVec: String, rId: String, k: Int, n: Int,
      numTables: Int = 4, planesPerTable: Int = 6, dim: Int = 64,
      maxBucket: Int = 64): DataFrame =
    marginFromSims(signBitCandidates(left, right, lVec, lId, rVec, rId,
      numTables, planesPerTable, dim, maxBucket), k, n)

  /** The candidate generator behind [[marginMiningLsh]]: sign-bit LSH
    * buckets per table, per-bucket cap, bucket equi-join, exact cosine
    * per distinct (src, dst) pair. Exposed for composition with other
    * candidate-bounded tails (hard negatives, containment).
    *
    * PRECONDITION (ADVICE r18): ids must be UNIQUE per side. The pairs
    * are deduped on (src_id, dst_id) and the vectors re-attach by id
    * join — a duplicated id would fan that join out into duplicate
    * (src_id, dst_id, cos) rows (the pre-r18 groupBy(max) shape
    * collapsed them). Every caller feeds embedding tables keyed by
    * their primary id (the [[Dedup.exactGroups]] id discipline). */
  private[graft] def signBitCandidates(left: DataFrame, right: DataFrame,
      lVec: String, lId: String, rVec: String, rId: String,
      numTables: Int, planesPerTable: Int, dim: Int,
      maxBucket: Int): DataFrame = {
    require(numTables >= 1 && planesPerTable >= 1,
      s"need >=1 tables and planes, got $numTables x $planesPerTable")
    require(numTables * planesPerTable <= dim,
      s"$numTables tables x $planesPerTable planes needs " +
        s"${numTables * planesPerTable} coordinates but dim=$dim")
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    // Buckets carry IDS ONLY (r18, guide §8 "decide with small rows,
    // move big rows once"): the previous shape exploded each side's
    // full vector numTables× and shipped two vectors per collided
    // (pair, table) row through the bucket join and the pair-dedup
    // shuffle. Pairs are now deduped on (src_id, dst_id) first and the
    // vectors attach ONCE per distinct pair — each side's vectors
    // cross an exchange at most once (no hint: AQE broadcasts the
    // sides when they fit, shuffles once when they don't) — and cos
    // per pair is computed exactly once, so the max() dedup is no
    // longer needed (it was exact dedup, not an approximation, so the
    // output is unchanged).
    def buckets(df: DataFrame, vec: String, id: String,
        outId: String): DataFrame = {
      val bs = (0 until numTables).map { t =>
        (0 until planesPerTable).map { j =>
          when(element_at(col(vec), t * planesPerTable + j + 1)
            .cast("double") >= lit(0.0), lit(1L << j)).otherwise(lit(0L))
        }.reduceLeft(_ + _)
      }
      df.select(col(id).as(outId),
          posexplode(array(bs: _*)).as(Seq("__t", "__bucket")))
        .withColumn("__r", row_number().over(Window
          .partitionBy(col("__t"), col("__bucket")).orderBy(col(outId))))
        .filter(col("__r") <= maxBucket)
        .drop("__r")
    }
    val pairs = buckets(left, lVec, lId, "src_id")
      .join(buckets(right, rVec, rId, "dst_id"), Seq("__t", "__bucket"))
      .select(col("src_id"), col("dst_id")).distinct()
    pairs
      .join(left.select(col(lId).as("src_id"), col(lVec).as("__lv")),
        Seq("src_id"))
      .join(right.select(col(rId).as("dst_id"), col(rVec).as("__rv")),
        Seq("dst_id"))
      .select(col("src_id"), col("dst_id"),
        (dot(col("__lv"), col("__rv"))
          / (norm(col("__lv")) * norm(col("__rv")))).as("cos"))
  }

  /** The margin tail over an arbitrary candidate table
    * (src_id, dst_id, cos) — see [[marginMining]]. k-NN sets and their
    * averages are computed WITHIN the candidate table (the standard
    * practical approximation when candidates come from an ANN index);
    * endpoints with fewer than k candidates average what they have. */
  def marginFromSims(sims: DataFrame, k: Int, n: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(n >= 1, s"n must be >= 1, got $n")
    val simsD = sims.withColumn("__cf",
        floor(col("cos") * lit(1e18)).cast(
          org.apache.spark.sql.types.DecimalType(38, 0)))
      .withColumn("__rs", row_number().over(Window
        .partitionBy(col("src_id"))
        .orderBy(col("cos").desc, col("dst_id"))))
      .withColumn("__rd", row_number().over(Window
        .partitionBy(col("dst_id"))
        .orderBy(col("cos").desc, col("src_id"))))
      .localCheckpoint(false) // feeds both stat aggs + the forward candidates
    val srcStats = simsD.filter(col("__rs") <= k)
      .groupBy(col("src_id"))
      .agg(sum(col("__cf")).as("__sx"), count(lit(1)).as("__cx"))
    val dstStats = simsD.filter(col("__rd") <= k)
      .groupBy(col("dst_id"))
      .agg(sum(col("__cf")).as("__sy"), count(lit(1)).as("__cy"))
    val margin = col("cos") /
      ((col("__sx").cast("double") / lit(1e18)
          / col("__cx").cast("double")
        + col("__sy").cast("double") / lit(1e18)
          / col("__cy").cast("double"))
        / lit(2.0))
    val scored = simsD.filter(col("__rs") <= k)
      .join(srcStats, Seq("src_id"))
      .join(dstStats, Seq("dst_id"))
      .withColumn("margin", margin)
      .withColumn("__best", row_number().over(Window
        .partitionBy(col("src_id"))
        .orderBy(col("margin").desc, col("dst_id"))))
      .filter(col("__best") === 1)
      .orderBy(col("margin").desc, col("src_id")).limit(n)
    scored.withColumn("rk", row_number().over(Window
        .orderBy(col("margin").desc, col("src_id"))).cast("long"))
      .select(col("src_id"), col("dst_id"), col("cos"), col("margin"),
        col("rk"))
  }

  // ----------------------------------------------------------------- LSH

  /** Query-directed multi-probe bucket order (multi-probe LSH, Lv et
    * al. VLDB'07): rank every candidate bucket by the summed
    * perpendicular distance of the query to each plane whose bit the
    * bucket flips. Flipping a bit the query barely cleared is far
    * likelier to recover a true neighbor than flipping a confident one
    * — hamming-only ordering treats those the same, and on
    * near-isotropic embeddings (no cluster structure, LSH's hardest
    * case) the margin weighting is where the probe budget's recall
    * comes from. The query's own bucket scores 0, so it is always
    * probed first; ties break by bucket id for determinism. */
  private[graft] def probeOrder(qVec: Seq[Double],
      planes: Seq[Seq[Double]], qBucket: Long, probes: Int): Seq[Long] = {
    val nb = planes.size
    val margins = planes.map { p =>
      val n = math.sqrt(p.iterator.map(x => x * x).sum)
      math.abs(p.iterator.zip(qVec.iterator)
        .map { case (a, b) => a * b }.sum) / n
    }.toArray
    (0L until (1L << nb)).sortBy { b =>
      val diff = b ^ qBucket
      var s = 0.0
      var i = 0
      while (i < nb) {
        if (((diff >> i) & 1L) != 0L) s += margins(i)
        i += 1
      }
      (s, b)
    }.take(probes)
  }

  /** LSH-bucketed ANN top-k for one stored query vector: probe the
    * `probes` buckets in query-directed multi-probe order (see
    * [[probeOrder]]), rerank exactly within the probed set. Recall
    * rises with `probes`; cost is the probed buckets' rows instead
    * of n. */
  def lshTopKForId(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numPlanes: Int = 8, dim: Int = 64,
      probes: Int = 8): DataFrame = {
    require(numPlanes <= 20, // driver enumerates 2^numPlanes signatures
      s"numPlanes=$numPlanes enumerates ${1L << numPlanes} buckets; " +
        "use <= 20 (probe selection is a driver-side sort)")
    val planes = makePlanes(numPlanes, dim)
    val sig = emb.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), planes).as("bucket"))
    val qRow = sig.filter(col(idCol) === queryId)
      .select(col(vecCol), col("bucket")).head()
    val qBucket = qRow.getLong(1)
    val qVec = qRow.getSeq[Float](0).map(_.toDouble)
    val probed = probeOrder(qVec, planes, qBucket, probes)
    val q = sig.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    sig.filter(col("bucket").isInCollection(probed))
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("__qv")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Multi-table LSH ANN top-k: `numTables` independent plane sets
    * (seeds 42, 43, …; table 0 is exactly [[lshTopKForId]]'s set), a
    * query-directed multi-probe order per table, and candidates taken
    * as the UNION of every probed bucket across tables — the classic
    * OR-construction (Indyk & Motwani, STOC'98) on top of multi-probe
    * (Lv et al., VLDB'07). The rows-scanned budget is
    * numTables·probesPerTable/2^numPlanes of the corpus; at a FIXED
    * budget, splitting it across independent tables beats spending it
    * all in one table because a miss must happen in every table at
    * once: union recall is 1-(1-r)^L for per-table recall r. On the
    * near-isotropic synthetic embeddings (LSH's hardest case) the
    * measured recall@20 at the 25% scanned budget is 0.425 for
    * 1×(64 of 256) vs 0.775 for 64×(16 of 2^12) — same fraction of
    * the corpus read (sweep: [[graft.LshTune]]).
    *
    * Scale: the union membership test is ONE native predicate per row
    * ([[graft.expressions.LshProbeHit]]: per-table signature computed
    * once, early exit on first probed hit) evaluated in the scan
    * stage — a single pass, no self-join, no shuffle before the final
    * k-heap merge. A persisted variant partitions by (table, bucket)
    * and prunes to the probed pairs, reading the same fraction off
    * disk. */
  def lshTopKForIdTables(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numTables: Int = 4, numPlanes: Int = 6,
      dim: Int = 64, probesPerTable: Int = 4): DataFrame = {
    val (cands, qVecCol) = lshTableCandidates(emb, vecCol, idCol,
      queryId, numTables, numPlanes, dim, probesPerTable)
    lshRerank(cands, qVecCol, vecCol, idCol, k)
  }

  /** Exact cosine rerank of an LSH candidate set against the 1-row
    * query-vector frame — the top-k tail of [[lshTopKForIdTables]],
    * exposed so harnesses that already built (and counted) the
    * candidates don't rebuild them to rank. */
  private[graft] def lshRerank(cands: DataFrame, qVecCol: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame =
    cands
      .crossJoin(broadcast(qVecCol))
      .select(col(idCol), cosine(col(vecCol), col("__qv")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** The candidate set behind [[lshTopKForIdTables]] (rows whose bucket
    * is probed in at least one table, query row excluded) plus the
    * 1-row query-vector frame — exposed so callers can measure the
    * true scanned fraction, the honest budget unit.
    *
    * The membership test is ONE native predicate ([[graft.expressions
    * .LshProbeHit]]) evaluated straight off the scan: each table's
    * signature is computed once with early exit on the first probed
    * hit. The composed form (a signature-array projection OR'd over
    * per-table `isInCollection`s) measured 129 s/query at sf0.1 —
    * filter pushdown re-inlines the signature subtree into every
    * disjunct — vs well under a second for the fused predicate doing
    * the identical arithmetic. */
  private[graft] def lshTableCandidates(emb: DataFrame, vecCol: String,
      idCol: String, queryId: Long, numTables: Int, numPlanes: Int,
      dim: Int, probesPerTable: Int): (DataFrame, DataFrame) = {
    require(numPlanes <= 20, // driver enumerates 2^numPlanes signatures
      s"numPlanes=$numPlanes enumerates ${1L << numPlanes} buckets; " +
        "use <= 20 (probe selection is a driver-side sort)")
    val tables = (0 until numTables)
      .map(t => makePlanes(numPlanes, dim, seed = 42L + t))
    val qRow = emb.filter(col(idCol) === queryId)
      .select(col(vecCol), hyperplaneSignatures(col(vecCol), tables))
      .head()
    val qVec = qRow.getSeq[Float](0).map(_.toDouble)
    val qSigs = qRow.getSeq[Long](1)
    val probeSets = tables.zipWithIndex.map { case (planes, t) =>
      probeOrder(qVec, planes, qSigs(t), probesPerTable)
    }
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    (emb.select(col(idCol), col(vecCol))
       .filter(lshProbeHit(col(vecCol), tables, probeSets))
       .filter(col(idCol) =!= queryId), q)
  }

  /** Build a persisted LSH index: signature-bucketed, bucket-partitioned
    * parquet. A probe against it reads only its probed buckets'
    * directories (partition pruning). */
  def buildLshIndex(emb: DataFrame, vecCol: String, idCol: String,
      indexDir: String, numPlanes: Int = 8, dim: Int = 64): Unit = {
    val planes = makePlanes(numPlanes, dim)
    emb.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), planes).as("bucket"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/buckets")
    Files.write(Paths.get(indexDir, "meta"),
      s"planes $numPlanes\ndim $dim\n".getBytes("UTF-8"))
  }

  /** Incrementally add vectors to a persisted LSH index: signatures come
    * from the same deterministic plane set the index was built with (the
    * meta records numPlanes/dim; planes derive from the fixed seed), and
    * the new rows append into their bucket partitions — probes see them
    * immediately, no rebuild. */
  def upsertLshIndex(emb: DataFrame, vecCol: String, idCol: String,
      indexDir: String): Unit = {
    requireNotTombstoned(emb, idCol, indexDir)
    val meta = Files.readAllLines(Paths.get(indexDir, "meta"))
    val numPlanes = meta.get(0).split(' ')(1).toInt
    val dim = meta.get(1).split(' ')(1).toInt
    val planes = makePlanes(numPlanes, dim)
    emb.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), planes).as("bucket"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Append)
      .parquet(s"$indexDir/buckets")
  }

  /** Probe a persisted LSH index with a literal query vector: reads
    * only the `probes` bucket partitions first in query-directed
    * multi-probe order (see [[probeOrder]]), reranks exactly. */
  def lshProbe(spark: SparkSession, indexDir: String,
      queryVec: Seq[Float], k: Int, probes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeId: Option[Long] = None): DataFrame = {
    val meta = Files.readAllLines(Paths.get(indexDir, "meta"))
    val numPlanes = meta.get(0).split(' ')(1).toInt
    val dim = meta.get(1).split(' ')(1).toInt
    require(numPlanes <= 20, // driver enumerates 2^numPlanes signatures
      s"index has numPlanes=$numPlanes; probe enumeration needs <= 20")
    val planes = makePlanes(numPlanes, dim)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.iterator.zip(queryVec.iterator.map(_.toDouble))
        .map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probed =
      probeOrder(queryVec.map(_.toDouble), planes, qBucket, probes)
    val qv = typedlit(queryVec)
    val idx = withoutTombstones(
      spark.read.parquet(s"$indexDir/buckets")
        .filter(col("bucket").isInCollection(probed)),
      idCol, indexDir)
    excludeId.foldLeft(idx)((d, id) => d.filter(col(idCol) =!= id))
      .select(col(idCol), cosine(col(vecCol), qv).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // ----------------------------------------------------------------- IVF

  /** Deterministic Lloyd's k-means on a driver-side sample: ordered
    * sample (stable across runs/executors), stride initialization, fixed
    * iteration count, empty clusters keep their previous centroid. The
    * quantizer only has to be *consistent*, not optimal — full-probe
    * equals brute force whatever the centroids are, and recall at a
    * given nProbes degrades gracefully with quantizer quality. */
  private[operators] def trainCentroids(samples: Array[Array[Float]],
      nLists: Int, iters: Int): Array[Array[Double]] = {
    require(samples.nonEmpty, "cannot train on an empty sample")
    val n = samples.length
    val dim = samples(0).length
    var centroids = Array.tabulate(math.min(nLists, n))(i =>
      samples((i.toLong * n / math.min(nLists, n)).toInt)
        .map(_.toDouble))
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length, dim)(0.0)
      val counts = Array.fill(centroids.length)(0L)
      samples.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0; var i = 0
          while (i < dim) {
            val diff = v(i) - centroids(c)(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** Codegen'd list assignment: one native argmin expression over the
    * whole centroid matrix (graft.expressions.NearestCentroid), entirely
    * inside the scan stage — no UDF, no MLlib. The composed form (array
    * of nLists l2sq columns) was codegen-bound; see the expression's
    * scaladoc. */
  private def assignExpr(vecCol: String, centroids: Array[Array[Double]])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.NearestCentroid(
      GraftColumnBridge.expression(col(vecCol)),
      centroids.toSeq.map(_.toSeq)))
  }

  /** Centroid sidecar: `dim <d>` header then one `list <i> <v,v,...>`
    * line per centroid. Driver-written metadata next to the lists —
    * reading the quantizer must not cost a Spark job at probe time. */
  private def writeCentroidMeta(indexDir: String,
      centroids: Array[Array[Double]]): Unit = {
    val sb = new StringBuilder
    sb.append("dim ").append(centroids(0).length).append('\n')
    centroids.zipWithIndex.foreach { case (c, i) =>
      sb.append("list ").append(i).append(' ')
        .append(c.mkString(",")).append('\n')
    }
    Files.write(Paths.get(indexDir, "centroids.meta"),
      sb.toString.getBytes("UTF-8"))
  }

  private def readCentroidMeta(indexDir: String): Array[(Int, Array[Double])] =
    Files.readAllLines(Paths.get(indexDir, "centroids.meta"))
      .toArray(Array.empty[String])
      .collect { case l if l.startsWith("list ") =>
        val parts = l.split(' ')
        (parts(1).toInt, parts(2).split(',').map(_.toDouble))
      }

  /** Build a persisted IVF index at `indexDir`: `lists/` is
    * list-partitioned parquet of (id, vec) and `centroids.meta` the
    * quantizer. One corpus pass + one partitioned write. */
  def buildIvfIndex(emb: DataFrame, vecCol: String, idCol: String,
      indexDir: String, nLists: Int = 16, sampleSize: Int = 4096,
      iters: Int = 10): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val samples = emb.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).as[Array[Float]].collect()
    val centroids = trainCentroids(samples, nLists, iters)
    emb.select(col(idCol), col(vecCol))
      .withColumn("__list", assignExpr(vecCol, centroids))
      .repartition(col("__list"))
      .write.partitionBy("__list").mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/lists")
    writeCentroidMeta(indexDir, centroids)
  }

  /** Incrementally add vectors to a persisted IVF index: new rows are
    * assigned with the EXISTING quantizer (centroids.meta) and appended
    * into their list partitions. The quantizer does not move — the
    * standard IVF serve-time contract (assignment consistency is what
    * probe pruning relies on); re-train by rebuilding when drift
    * warrants it. Full-probe == brute-force still holds over the grown
    * corpus since every list is read. */
  def upsertIvfIndex(emb: DataFrame, vecCol: String, idCol: String,
      indexDir: String): Unit = {
    requireNotTombstoned(emb, idCol, indexDir)
    val centroids = readCentroidMeta(indexDir)
      .sortBy(_._1).map(_._2)
    emb.select(col(idCol), col(vecCol))
      .withColumn("__list", assignExpr(vecCol, centroids))
      .repartition(col("__list"))
      .write.partitionBy("__list").mode(SaveMode.Append)
      .parquet(s"$indexDir/lists")
  }

  /** Probe a persisted IVF index: pick the `nProbes` lists whose
    * centroids are nearest the query, read ONLY those list partitions
    * (pruned scan), rerank exactly by cosine. */
  def ivfProbe(spark: SparkSession, indexDir: String,
      queryVec: Seq[Float], k: Int, nProbes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeId: Option[Long] = None): DataFrame = {
    val centroids = readCentroidMeta(indexDir)
    val qd = queryVec.map(_.toDouble)
    val probed = centroids.map { case (i, c) =>
      (i, c.iterator.zip(qd.iterator)
        .map { case (a, b) => val d = a - b; d * d }.sum)
    }.sortBy { case (i, d) => (d, i) }.take(nProbes).map(_._1).toSeq
    val qv = typedlit(queryVec)
    val idx = withoutTombstones(
      spark.read.parquet(s"$indexDir/lists")
        .filter(col("__list").isInCollection(probed)),
      idCol, indexDir)
    excludeId.foldLeft(idx)((d, id) => d.filter(col(idCol) =!= id))
      .select(col(idCol),
        (dot(col(vecCol), qv) / (norm(col(vecCol)) * norm(qv))).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------- delete / compact

  /** Physical layout of a persisted index: IVF keeps `lists/` keyed by
    * `__list`, LSH keeps `buckets/` keyed by `bucket`. */
  private def layout(indexDir: String): (String, String) =
    if (Files.isDirectory(Paths.get(indexDir, "lists"))) ("lists", "__list")
    else ("buckets", "bucket")

  private def tombstonePath(indexDir: String) = s"$indexDir/tombstones"

  /** Delete vectors from a persisted index (IVF or LSH) by id, as a
    * tombstone append — the store-side delete analogue (reference
    * db.rs:242-252) for the index family, which previously only grew
    * (upsert) and shrank by full rebuild.
    *
    * The delete itself is O(|ids|): one small parquet append of the id
    * set, no index scan, no rewrite. Probes anti-join the (broadcast)
    * tombstone set after pruning partitions, so results equal a fresh
    * rebuild without the deleted rows immediately. [[compactIndex]]
    * folds tombstones into the data partitions and bounds the
    * anti-join's broadcast size; run it on the same cadence as store
    * compaction.
    *
    * Contract: re-inserting a tombstoned id requires [[compactIndex]]
    * first — [[upsertIvfIndex]]/[[upsertLshIndex]] refuse ids that are
    * currently tombstoned (loud error instead of a silently-invisible
    * row). */
  def deleteFromIndex(ids: DataFrame, idCol: String,
      indexDir: String): Unit = {
    ids.select(col(idCol).cast("long").as("__deleted_id")).distinct()
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(tombstonePath(indexDir))
  }

  /** [[deleteFromIndex]] for an IVF index dir. */
  def deleteFromIvfIndex(ids: DataFrame, idCol: String,
      indexDir: String): Unit = deleteFromIndex(ids, idCol, indexDir)

  /** [[deleteFromIndex]] for an LSH index dir. */
  def deleteFromLshIndex(ids: DataFrame, idCol: String,
      indexDir: String): Unit = deleteFromIndex(ids, idCol, indexDir)

  /** Pending tombstone ids of an index (empty frame if none). */
  def indexTombstones(spark: SparkSession, indexDir: String): DataFrame = {
    val td = Paths.get(tombstonePath(indexDir))
    if (Files.isDirectory(td))
      spark.read.parquet(td.toString).select(col("__deleted_id")).distinct()
    else {
      import spark.implicits._
      spark.emptyDataset[Long].toDF("__deleted_id")
    }
  }

  /** Apply pending tombstones to a probe's pruned scan: broadcast
    * anti-join on id. Tombstone volume is bounded by compaction
    * cadence, so the broadcast stays small at any corpus size. */
  private def withoutTombstones(df: DataFrame, idCol: String,
      indexDir: String): DataFrame = {
    if (!Files.isDirectory(Paths.get(tombstonePath(indexDir)))) df
    else df.join(
      broadcast(indexTombstones(df.sparkSession, indexDir)
        .withColumnRenamed("__deleted_id", idCol)),
      Seq(idCol), "left_anti")
  }

  private def requireNotTombstoned(emb: DataFrame, idCol: String,
      indexDir: String): Unit = {
    if (Files.isDirectory(Paths.get(tombstonePath(indexDir)))) {
      val clash = emb.select(col(idCol))
        .join(broadcast(indexTombstones(emb.sparkSession, indexDir)
          .withColumnRenamed("__deleted_id", idCol)),
          Seq(idCol), "left_semi")
        .limit(1).count()
      require(clash == 0,
        s"upsert into $indexDir includes currently-tombstoned ids; " +
          "run Similarity.compactIndex first (re-insert after delete " +
          "is defined only across a compaction boundary)")
    }
  }

  /** Fold pending tombstones into the index's data partitions and clear
    * them. Rewrites ONLY the partitions that contain a deleted id
    * (located by a column-pruned (id, partition) scan), via dynamic
    * partition overwrite; partitions whose every row was deleted are
    * removed outright. Probe results are identical before and after —
    * compaction only moves the anti-join's work into the layout.
    *
    * Crash-safety ordering: tombstones are cleared LAST, so an
    * interrupted compaction leaves probes correct (the anti-join of an
    * already-rewritten partition is a no-op). The index is derived
    * data — a mid-commit crash is recoverable by rebuild, same as any
    * index. */
  def compactIndex(spark: SparkSession, indexDir: String,
      idCol: String = "vec_id"): Unit = {
    val td = Paths.get(tombstonePath(indexDir))
    if (!Files.isDirectory(td)) return
    val (sub, partCol) = layout(indexDir)
    val dataPath = s"$indexDir/$sub"
    val ts = broadcast(indexTombstones(spark, indexDir)
      .withColumnRenamed("__deleted_id", idCol))
    val data = spark.read.parquet(dataPath)
    val affected = data.select(col(idCol), col(partCol))
      .join(ts, Seq(idCol), "left_semi")
      .select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (affected.nonEmpty) {
      // survivors of the affected partitions, materialized (checkpoint
      // cuts the file-source lineage so the self-overwrite is legal)
      val survivors = data.filter(col(partCol).isInCollection(affected))
        .join(ts, Seq(idCol), "left_anti")
        .localCheckpoint(true)
      val kept = survivors.select(col(partCol)).distinct()
        .collect().map(_.get(0)).toSet
      survivors.repartition(col(partCol))
        .write.partitionBy(partCol)
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite).parquet(dataPath)
      // dynamic overwrite only touches partitions present in the output:
      // a partition that lost every row must be dropped by hand
      affected.filterNot(kept).foreach { v =>
        val dir = Paths.get(dataPath, s"$partCol=$v")
        if (Files.isDirectory(dir)) {
          import scala.util.Using
          Using.resource(Files.walk(dir)) { st =>
            st.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
          }
        }
      }
    }
    import scala.util.Using
    Using.resource(Files.walk(td)) { st =>
      st.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** Stats over a persisted index's partitions (IVF lists or LSH
    * buckets): row count per partition plus the imbalance ratio
    * (max/mean) — the number that predicts probe-cost variance and
    * tells you when the quantizer needs retraining. Metadata-friendly:
    * one count aggregate grouped by the partition column, no vector
    * columns read. */
  def indexStats(spark: SparkSession, indexDir: String): DataFrame = {
    val (sub, partCol) = layout(indexDir)
    val counts = spark.read.parquet(s"$indexDir/$sub")
      .groupBy(col(partCol).as("partition"))
      .agg(count(lit(1)).as("n_vectors"))
    val stats = counts.agg(
      avg(col("n_vectors")).as("mean"), max(col("n_vectors")).as("mx"))
    counts.crossJoin(broadcast(stats))
      .withColumn("imbalance", col("mx") / col("mean"))
      .select(col("partition"), col("n_vectors"), col("imbalance"))
  }

  /** Per-session registry of already-built IVF indexes so repeated
    * queries against the same corpus reuse the persisted lists (the
    * serve-time shape: build once, probe many). Keyed by the corpus
    * plan + quantizer config; validated by corpus row count. */
  private val ivfCache = new ConcurrentHashMap[String, String]()

  /** IVF ANN for one stored query vector through the build/probe split:
    * resolves (or builds) the persisted index for this corpus, then
    * probes it. With nProbes == nLists the result provably equals brute
    * force (every list is read), which is the oracle identity the q51
    * gate checks. */
  def ivfTopKForId(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nLists: Int = 16, nProbes: Int = 4)
      : DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cacheKey =
      s"${emb.queryExecution.logical.canonicalized.hashCode()}|$vecCol|" +
        s"$idCol|$nLists"
    // compute → validate → retry: a cached dir may have been reaped
    // (TempDirs.deleteAll runs between suites); rebuild on a miss.
    val indexDir = ivfCache.compute(cacheKey, (_, cached) => {
      if (cached != null && Files.exists(
          java.nio.file.Paths.get(cached, "centroids.meta"))) cached
      else {
        val dir = graft.TempDirs.scratch("graft-ivf-")
        buildIvfIndex(emb, vecCol, idCol, dir, nLists)
        dir
      }
    })
    val queryVec = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).as[Array[Float]].head().toSeq
    ivfProbe(spark, indexDir, queryVec, k, nProbes, idCol, vecCol,
      excludeId = Some(queryId))
  }

  /** Compressed-domain brute search over int8 scalar-quantized codes
    * (the FAISS SQ8 tier): rank by cosine computed DIRECTLY on the
    * 1-byte-per-dim codes — symmetric per-vector quantization scales
    * each vector by a positive s, and cosine is invariant to positive
    * per-vector scaling, so cos(codes, q) ≈ cos(x, q) with only the
    * ±0.5 rounding perturbation and NO reconstruction arithmetic.
    * The search therefore touches only the codes column: 4× less scan
    * I/O than a float32 brute pass, same zero-shuffle
    * TakeOrderedAndProject plan as [[topKForId]], and the scores are
    * exact doubles over integer code values — a SQL oracle replays
    * them bit-for-bit (the code formula is q71's, already pinned).
    * Output: (idCol, sim) top-k by (sim DESC, id). */
  def sq8TopKForId(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    val codes = int8Codes(col(vecCol), int8Scale(col(vecCol)))
      .cast("array<double>")
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("__qv"),
        norm(col(vecCol)).as("__qn"))
    emb.select(col(idCol), codes.as("__c"))
      .crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        (dot(col("__c"), col("__qv"))
          / (norm(col("__c")) * col("__qn"))).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Label-noise audit (the confident-learning screen, Northcutt et
    * al. arXiv:1911.00068 simplified to its kNN-disagreement core):
    * vote each query's top-`k` neighbour labels, compare the majority
    * to the query's OWN label, and report per-label totals — the
    * table a curation owner reads to find systematically mislabeled
    * slices before training on them.
    *
    * Candidate-source-agnostic by design: `pairs` is any
    * (query_id, item_id, sim) frame — [[knnJoin]] for a broadcastable
    * probe batch (the gate's exact path), LSH candidates
    * ([[lshTableCandidates]]) or IVF probes for corpus-as-queries at
    * 100 TB — so the audit itself never dictates an all-pairs plan.
    * Inside: one WindowGroupLimit top-k, one (query, label) vote agg,
    * one majority rank, two label joins (labels frames are dimension-
    * sized per query batch), one final per-label agg. Ties: top-k by
    * (sim DESC, item_id); majority to the smallest label (q39's
    * rule). Output: (label, n, n_disagree, noise_rate). */
  def labelNoiseAudit(pairs: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val topk = Sample.capPerKey(
      pairs.select(col("query_id"), col("item_id"), col("sim")),
      col("query_id"), Seq(col("sim").desc, col("item_id")), cap = k)
    val itemLbl = labels.select(col(idCol).as("item_id"),
      col(labelCol).as("__nl"))
    val votes = topk.join(itemLbl, "item_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__votes").desc, col("__nl"))
    val majority = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__nl").as("__knn"))
    val ownLbl = labels.select(col(idCol).as("query_id"),
      col(labelCol).as("__own"))
    majority.join(ownLbl, "query_id")
      .groupBy(col("__own"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__knn") =!= col("__own"), 1L).otherwise(0L))
          .as("n_disagree"))
      .select(col("__own").as("label"), col("n"), col("n_disagree"),
        (col("n_disagree").cast("double") / col("n")).as("noise_rate"))
  }
}
