package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the bounded-memory frequency summary for heavy-hitter detection
  * over streams and corpora too wide to count exactly. Unlike the
  * HLL surface (q45), this sketch is fully DETERMINISTIC here: the d
  * row hashes are md5-derived (the q78/q98 portable-hash rule), so
  * the counter matrix, every point estimate, and every collision are
  * pure functions of the input that a DuckDB oracle replays exactly —
  * the gate hash-matches estimates INCLUDING their overestimation
  * error, not just "close enough".
  *
  * Scale shape: the counter matrix is one hash-agg over (row, bucket)
  * — at most d·w cells regardless of corpus size (the whole point),
  * with map-side partial counts; estimates for a candidate key set
  * are d probe rows each, joined against the d·w-cell matrix (which
  * broadcasts — d·w is KBs). est = min over rows ≥ true count, with
  * equality exactly when no heavier key shares all d buckets.
  */
object Sketch {

  /** Portable row-r bucket of a key: md5("r:key") first 4 hex chars
    * mod w — independent-enough rows, identical in both engines. */
  def cmBucket(key: Column, row: Int, w: Int): Column =
    (conv(substring(md5(concat(lit(s"$row:"), key)), 1, 4), 16, 10)
      .cast("int") % w).cast("int")

  /** The d×w counter matrix of `keys` instances: (r, bucket, c). */
  def countMinMatrix(items: DataFrame, keyCol: String, d: Int,
      w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"bad sketch dims d=$d w=$w")
    items.select((0 until d).map(r =>
        cmBucket(col(keyCol), r, w).as(s"__b$r")): _*)
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), col(s"__b$r").as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketch matrices by cell-wise sum — the property that makes
    * count-min THE distributed/streaming frequency summary: every
    * shard (or micro-batch, or day partition) sketches independently
    * and the union's sketch is the exact cell sum, with zero
    * re-reading. merge(matrix(A), matrix(B)) == matrix(A ∪ B)
    * bit-exactly, because cells are plain counts (SketchSpec pins the
    * identity; the q168 gate runs estimates through a merged pair of
    * half-corpus sketches against the full-corpus oracle). */
  def mergeMatrices(mats: Seq[DataFrame]): DataFrame = {
    require(mats.nonEmpty, "need at least one matrix")
    mats.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** Point estimates for every key of `probes` against the matrix:
    * (key, est) with est = min_r counter(r, bucket_r(key)). A bucket
    * never touched estimates 0 via the left-join coalesce. */
  def countMinEstimates(matrix: DataFrame, probes: DataFrame,
      keyCol: String, d: Int, w: Int): DataFrame = {
    val probed = probes.select(col(keyCol).as("key")).distinct()
      .select(col("key"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"),
          cmBucket(col("key"), r, w).as("bucket"))): _*)).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probed.join(broadcast(matrix), Seq("r", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
