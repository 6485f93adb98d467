package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (north-star operator; absent from the reference, which has no
  * vector surface at all — SURVEY.md §2.2).
  *
  * Two tiers:
  *  - brute-force cosine top-k: exact baseline. One pass over the table,
  *    TakeOrderedAndProject keeps a k-heap per partition — O(n·dim) work,
  *    O(k) memory, no shuffle beyond the final k-merge. Right answer for
  *    one-off queries even at scale.
  *  - LSH-bucketed: random-hyperplane signatures partition vectors into
  *    2^planes buckets; queries probe their own bucket plus the
  *    `probes` nearest by signature hamming distance, then rerank
  *    exactly. Right shape for high-QPS / knn-join workloads where
  *    brute force would rescan the corpus per query.
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

  /** LSH-bucketed ANN top-k for one stored query vector: probe the
    * query's bucket and the `probes` closest buckets by signature hamming
    * distance, rerank exactly within the probed set. Recall rises with
    * `probes`; cost is |probed buckets| instead of n. */
  def lshTopKForId(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numPlanes: Int = 8, dim: Int = 64,
      probes: Int = 8): DataFrame = {
    val planes = makePlanes(numPlanes, dim)
    val sig = emb.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), planes).as("bucket"))
    val q = sig.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), col("bucket").as("qbucket"))
    sig.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .filter(bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= probes / 4 + 1)
      .select(col(idCol), cosine(col(vecCol), col("__qv")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to one of `nLists` lists; a query probes only the `nProbes`
    * lists whose centroids are nearest, then reranks exactly by cosine.
    * The standard scale path when LSH's data-oblivious buckets are too
    * coarse: lists follow the data distribution, and at 100 TB each list
    * becomes a partition-pruned read. Deterministic (seeded KMeans). */
  def ivfTopKForId(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nLists: Int = 16, nProbes: Int = 4)
      : DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featurized = emb.withColumn("__feat",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(42L)
      .setFeaturesCol("__feat").setPredictionCol("__list")
      .fit(featurized)
    val assigned = model.transform(featurized)
    val qRow = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol), col("__feat")).head()
    val qVec = qRow.getAs[org.apache.spark.ml.linalg.Vector]("__feat")
    val probeLists = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        (i, org.apache.spark.ml.linalg.Vectors.sqdist(c, qVec)) }
      .sortBy(_._2).take(nProbes).map(_._1)
    val q = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn"))
    assigned.filter(col("__list").isin(probeLists: _*))
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        (dot(col(vecCol), col("__qv"))
          / (norm(col(vecCol)) * col("__qn"))).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Build a bucketed index DataFrame (id, vec, bucket) — persisted by
    * callers that serve many queries; bucketing by signature makes the
    * per-query scan a partition-pruned read at scale. */
  def buildLshIndex(emb: DataFrame, vecCol: String, idCol: String,
      numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = makePlanes(numPlanes, dim)
    emb.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), planes).as("bucket"))
  }
}
