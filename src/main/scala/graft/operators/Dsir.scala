package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169): score every raw document by how much
  * more likely its hashed n-gram features are under a TARGET
  * distribution (the curated/in-domain slice you want more of) than
  * under the RAW corpus distribution, then keep the top-weighted docs.
  * The importance weight of a document is the mean over its bigram
  * instances of ln p_target(bucket) − ln p_raw(bucket), with add-one
  * smoothing p(b) = (c(b)+1)/(N+B) over B hash buckets.
  *
  * Feature hashing is md5-based and engine-portable (the q78 rule):
  * bucket = int(first 4 hex chars of md5(gram)) mod B — Spark computes
  * it with codegen'd conv/md5 builtins, DuckDB with CAST('0x…' AS INT),
  * and both see the identical bucket for every gram, which is what lets
  * the whole selection run under an exact SQL oracle.
  *
  * Scale shape (100 TB): two bucket-count aggregations (target + raw —
  * associative counts, map-side partial agg, B-bounded results) and ONE
  * scoring join of the raw corpus's bigram instances against the
  * B-row weight table, which always broadcasts (B ≤ a few thousand).
  * No shuffle is keyed by anything wider than the bucket id; the
  * per-doc reduce shares the doc_id partitioning with every other
  * curation signal. Cross-engine numerics: the log inputs are exact
  * integer ratios, ln() differs in the last ulp between libm
  * implementations, so the gate surface is the id-tiebroken RANK (the
  * q77/q94 rule).
  */
object Dsir {

  /** Portable hashed feature bucket of a gram string: [0, buckets). */
  def bucketOf(gram: Column, buckets: Int): Column =
    (graft.functions.SketchFunctions.md5Prefix(gram, 4)
      .cast("int") % buckets).cast("int")

  /** (doc_id, bucket) for every bigram INSTANCE of every document —
    * repeated features count repeatedly, as in the paper's bag-of-
    * hashed-ngrams model. */
  private def docBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(
        TextFunctions.positionalShingles(col(textCol), 2)).as("gram"))
      .select(col("doc_id"), bucketOf(col("gram"), buckets).as("bucket"))

  /** Per-bucket instance counts of a corpus slice, as (bucket, c). */
  def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docBuckets(docs, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** Importance weight per raw document against a target slice:
    * (doc_id, n_feats, weight) where weight is the mean
    * ln((c_t(b)+1)/(N_t+B)) − ln((c_r(b)+1)/(N_r+B)) over the doc's
    * bigram instances. `target` is typically a filter of the same
    * corpus (e.g. the curated language slice) but can be any frame
    * with the same text column. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, buckets: Int = 256): DataFrame = {
    val tc = bucketCounts(target, idCol, textCol, buckets)
      .select(col("bucket"), col("c").as("ct"))
    val rc = bucketCounts(raw, idCol, textCol, buckets)
      .select(col("bucket"), col("c").as("cr"))
    // B-bounded weight table: smoothed log-ratio per bucket, totals
    // denormalized in via 1-row cross joins — always broadcastable
    val totals = tc.agg(sum(col("ct")).as("nt"))
      .crossJoin(rc.agg(sum(col("cr")).as("nr")))
    val weights = rc.join(tc, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
            (col("nt").cast("double") + lit(buckets.toDouble))) -
          log((col("cr").cast("double") + lit(1.0)) /
            (col("nr").cast("double") + lit(buckets.toDouble))))
          .as("__w"))
    docBuckets(raw, idCol, textCol, buckets)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        (sum(col("__w")) / count(lit(1))).as("weight"))
  }

  /** The `k` raw documents DSIR would keep first — highest importance
    * weight, id tiebreak; returns (doc_id, rk).
    *
    * Ranks on the weight ROUNDED to 1e-9, not the raw double: the
    * weight is sum(__w)/count over a shuffle, so its last few ulps
    * depend on float accumulation order — two docs within accumulated
    * rounding error of each other could swap rank between runs (the
    * doc_id tiebreak only fires on exact equality). Rounding collapses
    * sub-1e-9 gaps into the deterministic id tiebreak in every engine;
    * real fixture gaps are ≥1e-5 (the q77/q94 rank-surface rule). */
  def topK(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, buckets: Int, k: Int): DataFrame =
    importanceWeights(raw, idCol, textCol, target, buckets)
      .withColumn("__rw", round(col("weight"), 9))
      .orderBy(col("__rw").desc, col("doc_id")).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("__rw").desc, col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("rk"))
}
