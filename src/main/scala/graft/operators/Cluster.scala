package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic k-means over embedding columns — the coarse-clustering
  * step the curation stack keeps reaching for: SemDeDup clusters before
  * its intra-cluster cosine pass (arXiv:2303.09540 §3 runs k-means
  * first), cluster-balanced sampling draws per-cluster quotas, and an
  * IVF index is exactly an assignment against trained centroids.
  *
  * Unlike the float k-means inside [[Similarity]]'s IVF trainer (fine
  * for ANN, where centroids only need to be good, not reproducible),
  * this one is a PURE FUNCTION of its input, bit-identical across
  * engines and partitionings, so it gates oracle-exact:
  *  - vectors quantize to longs (`floor(x · scale)` — floor of a
  *    float-widened double is deterministic everywhere);
  *  - distances are exact long sums of squared diffs (no float
  *    accumulation order);
  *  - seeds are the k lowest-id vectors (k-means++ belongs offline;
  *    the SCORING/assignment pass is the corpus-scale cost);
  *  - centroid updates are truncating integer division (Spark `div`,
  *    DuckDB `//`, Java `/` — all truncate toward zero);
  *  - argmin ties break to the lowest cluster id via lexicographic
  *    (d2, cid) struct comparison;
  *  - a cluster that loses every member keeps its previous centroid
  *    (total semantics, no NaN drift).
  */
object Cluster {

  /** Assign every vector to its nearest centroid after `updates` Lloyd
    * rounds from the deterministic seeds. Output: (idCol, cluster: int,
    * d2: long — squared quantized distance to the final centroid).
    *
    * Scale shape: the quantized frame is planned once (localCheckpoint)
    * and each round is (a) one codegen'd per-row argmin over k inlined
    * centroid literals — k·d multiplies per row, NO join, no shuffle —
    * and (b) one (cluster, dim)-keyed partial-agg shuffle whose output
    * is the MODEL (k·d rows), collected to the driver like the IVF
    * trainer's bounded sample. Nothing driver-side scales with the
    * corpus. The inlined-literal argmin targets the coarse regime
    * (k up to a few hundred — SemDeDup-style); for k in the thousands
    * use the IVF trainer's NearestCentroid path instead. Caller must
    * keep scale · max|x| under ~2²⁵ so k·d squared diffs stay clear of
    * long overflow (defaults give 6×10⁹ for unit-norm 64-d vectors). */
  /** Quantize a float-array column to long components (the exact
    * representation every operator here computes in). */
  def quantize(vec: Column, scale: Long): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Argmin struct (d2, cluster) of a quantized long-array column
    * against an embedded centroid matrix — the exact (distance,
    * lowest-id) tiebreak. Pure projection: no join, no shuffle,
    * whole-stage codegen via [[graft.expressions.NearestCentroidLong]]
    * (r18: the previous least() over k struct(aggregate(zip_with))
    * subtrees was the same arithmetic but interpreted — higher-order
    * functions have no codegen — and its literal tree grew the plan by
    * ~50 KB per argmin; the native loop kernel measured the PQ encode
    * family ~2-3× faster at sf0.1 with bit-identical output). */
  def nearestExpr(qvec: Column, cents: Array[Array[Long]]): Column = {
    // k is still bounded: the centroid matrix rides the plan as one
    // reference object (k·d longs) broadcast with the task binary —
    // the coarse regime (k ≤ a few hundred) is the design point; far
    // beyond it, train/probe through the IVF index layout instead.
    require(cents.length <= 1024,
      s"nearestExpr embeds ${cents.length} centroids; beyond " +
        "1024 use the IVF NearestCentroid matrix path instead")
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.NearestCentroidLong(
      GraftColumnBridge.expression(qvec), cents.map(_.toSeq).toSeq))
  }

  /** Train centroids only (`updates` Lloyd rounds from the
    * deterministic lowest-id seeds) over an ALREADY-QUANTIZED frame
    * (__id, __v). Returns the final k×d codebook. */
  private[operators] def fitCentroids(q: DataFrame, k: Int,
      updates: Int): Array[Array[Long]] = {
    var cents: Array[Array[Long]] = q.orderBy(col("__id")).limit(k)
      .select(col("__v")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(cents.length == k,
      s"need at least $k vectors to seed, got ${cents.length}")
    var t = 0
    while (t < updates) {
      // two selects: a generator in the same projection as the struct
      // argmin degrades the struct's field names during resolution
      val sums = q.select(col("__v"),
          nearestExpr(col("__v"), cents).getField("cluster").as("__c"))
        .select(col("__c"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy(col("__c"), col("__p"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect() // k·d rows — model-sized, not corpus-sized
      val upd = Array.tabulate(k)(j => cents(j).clone())
      sums.foreach { r =>
        upd(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
      cents = upd
      t += 1
    }
    cents
  }

  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, updates: Int = 1, scale: Long = 10000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(updates >= 0, s"updates must be >= 0, got $updates")
    val q = df.select(col(idCol).as("__id"),
        quantize(col(vecCol), scale).as("__v"))
      .localCheckpoint(false) // quantized once; reused every round + final
    val cents = fitCentroids(q, k, updates)
    val best = nearestExpr(col("__v"), cents)
    q.select(col("__id").as(idCol),
      best.getField("cluster").as("cluster"),
      best.getField("d2").as("d2"))
  }
}
