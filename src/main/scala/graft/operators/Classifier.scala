package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** fastText-style hashed linear text classifier (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification",
  * arXiv:1607.01759) — the model-based quality/topic/toxicity filter
  * every public curation pipeline runs after the heuristic filters
  * (LLaMA's and FineWeb-Edu's quality classifiers are exactly this
  * shape): hash each unigram and bigram INSTANCE into B buckets, sum a
  * per-bucket weight vector over the document's bag, argmax the class.
  * Training happens offline; this operator is the corpus-scale SCORING
  * pass, which is where the 100 TB cost lives.
  *
  * Engineering choices:
  *  - feature hashing is the md5-based engine-portable bucket
  *    ([[Dsir.bucketOf]] — int of the first 4 md5 hex chars mod B), so
  *    a DuckDB oracle reproduces every bucket exactly;
  *  - weights are INTEGER (fixed-point, caller-scaled): scores are
  *    exact long sums — no float accumulation order, no rank surface
  *    needed, ties broken by lowest class id deterministically;
  *  - scale shape: one explode of feature instances (~2× token count),
  *    one broadcast join against the B-row wide weight table (one
  *    array row per bucket — NOT (bucket, class) rows, which would
  *    multiply the exploded stream by C), one groupBy(doc_id) whose
  *    map-side partial agg collapses to a single C-long row per doc
  *    per task before the only shuffle.
  */
object Classifier {

  /** (doc_id, bucket) for every unigram + bigram instance. */
  private def docFeatureBuckets(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(concat(
        TextFunctions.positionalShingles(col(textCol), 1),
        TextFunctions.positionalShingles(col(textCol), 2))).as("gram"))
      .select(col("doc_id"), Dsir.bucketOf(col("gram"), buckets).as("bucket"))

  /** Score + label a corpus against a hashed-linear model.
    *
    * `weights` must be (bucket: int, w: array<long> of length
    * `numClasses`) with every bucket in [0, buckets) present — the
    * trained model, B-bounded, always broadcastable. Returns one row
    * per doc: (doc_id, n_feats, s0..s{C-1}, label) where s_c is the
    * exact integer score and label the argmax class (lowest id wins
    * ties). Docs with no features (empty text) score 0 everywhere and
    * label 0 — total, like the other curation signals. */
  /** Threshold CALIBRATION sweep — the step between training a quality
    * classifier and deploying it as a filter: for every candidate
    * threshold, exact confusion counts (keep iff score >= threshold)
    * against a gold label, plus precision/recall. This is how a
    * pipeline owner picks the FineWeb-Edu-style "keep score >= 3"
    * cutoff: read the sweep, choose the knee.
    *
    * Scale shape: the threshold table is decision-sized (tens of
    * candidate cutoffs) and BROADCASTS into one corpus pass; the
    * per-task partial agg collapses to |thresholds| rows before the
    * only shuffle, so the reduce side is T-bounded regardless of
    * corpus size. (For thousands of thresholds, sweep a score
    * HISTOGRAM with one cumulative window instead — T here is a
    * human-readable calibration table, not a curve plotter.)
    * Counts are exact longs; precision/recall are ratios of those
    * longs with NULL on empty denominators — both engines compute
    * them from identical integers. */
  def thresholdSweep(scored: DataFrame, scoreCol: String,
      goldCol: String, thresholds: DataFrame,
      thrCol: String = "thr"): DataFrame = {
    val s = scored.select(col(scoreCol).as("__s"),
      col(goldCol).cast("boolean").as("__g"))
    s.crossJoin(broadcast(
        thresholds.select(col(thrCol).as("thr")).distinct()))
      .groupBy(col("thr"))
      .agg(
        sum(when(col("__s") >= col("thr") && col("__g"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__s") >= col("thr") && !col("__g"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__s") < col("thr") && col("__g"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("__s") < col("thr") && !col("__g"), 1L)
          .otherwise(0L)).as("tn"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp"))))
      .withColumn("recall", when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn"))))
  }

  /** Per-group ROC AUC, exactly, via the Mann–Whitney U equivalence
    * (Hanley & McNeil, Radiology 1982: AUC = U⁺/(n⁺·n⁻)) with MIDRANK
    * tie handling — tied (pos, neg) score pairs count ½, i.e. the
    * trapezoid the ROC curve draws across a tie block. The companion
    * of [[thresholdSweep]]: the sweep reads one cutoff, AUC summarizes
    * the whole ranking.
    *
    * Exactness (the q183 discipline): ranks never materialize
    * per-row — for a tie block of c_tot rows starting after C
    * cumulative rows, every row's DOUBLED midrank is 2C + c_tot + 1
    * (an integer: this is why the statistic is carried ×2), so
    * 2·Σ_pos midrank = Σ blocks c_pos·(2C + c_tot + 1) in exact
    * 128-bit arithmetic (decimal(38,0) / HUGEINT), u2_num =
    * that − n⁺(n⁺+1), and auc = u2_num / (2·n⁺·n⁻) is ONE IEEE
    * division of two exactly-rounded integer casts. u2_num is checked
    * into a long at output (n⁺·n⁻ < 2^62 — every real eval fits).
    * A group with an empty class reports NULL auc (undefined, not
    * 0.5 — the chiSquare2x2 degenerate-margin convention).
    *
    * Contract: `scoreCol` is integer-valued (the engine's score
    * surfaces are exact longs — [[scoreHashedLinear]], Curation
    * signals, fixed-point decimals upstream); `goldCol` casts to
    * boolean; null group/score/gold rows drop (the filter is the
    * contract).
    *
    * Scale shape: ONE hash-agg to (grp, score) cells (map-side
    * combined — the corpus never sorts), then the cumulative walk and
    * the U sum run on the score-distinct frame, bounded by distinct
    * scores per group, not rows. Output: (grp, n_pos, n_neg, u2_num,
    * auc). */
  def aucRoc(scored: DataFrame, groupCol: String, scoreCol: String,
      goldCol: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cells = scored
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull &&
        col(goldCol).isNotNull)
      .select(col(groupCol).as("grp"), col(scoreCol).cast("long").as("s"),
        col(goldCol).cast("boolean").as("g"))
      .groupBy(col("grp"), col("s"))
      .agg(sum(when(col("g"), 1L).otherwise(0L)).as("c_pos"),
        count(lit(1)).as("c_tot"))
    val w = Window.partitionBy(col("grp")).orderBy(col("s"))
    cells
      .withColumn("cum", sum(col("c_tot")).over(w) - col("c_tot"))
      .groupBy(col("grp"))
      .agg(sum(col("c_pos")).as("n_pos"),
        sum(col("c_tot") - col("c_pos")).as("n_neg"),
        sum(d38(col("c_pos")) *
          d38(lit(2L) * col("cum") + col("c_tot") + 1)).as("__r2"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        (col("__r2") - d38(col("n_pos")) * d38(col("n_pos") + 1))
          .cast("long").as("u2_num"))
      .withColumn("auc", when(col("n_pos") > 0 && col("n_neg") > 0,
        col("u2_num").cast("double") /
          (d38(lit(2L)) * d38(col("n_pos")) * d38(col("n_neg")))
            .cast("double")))
  }

  def scoreHashedLinear(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, numClasses: Int, buckets: Int): DataFrame = {
    require(numClasses >= 2, s"need >= 2 classes, got $numClasses")
    val scoreCols = (0 until numClasses).map(c =>
      coalesce(sum(col("w").getItem(c)), lit(0L)).as(s"s$c"))
    val scored = docFeatureBuckets(docs, idCol, textCol, buckets)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), scoreCols: _*)
    // left join keeps featureless docs (empty text) with zero scores
    val zeroed = docs.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id") +:
        coalesce(col("n_feats"), lit(0L)).as("n_feats") +:
        (0 until numClasses).map(c =>
          coalesce(col(s"s$c"), lit(0L)).as(s"s$c")): _*)
    val best = (0 until numClasses).map(c => col(s"s$c"))
      .reduce((a, b) => greatest(a, b))
    val label = (0 until numClasses).foldLeft(when(lit(false), lit(0L))) {
      (acc, c) => acc.when(col(s"s$c") === best, lit(c.toLong))
    } // first matching class wins → lowest id on ties
    zeroed.withColumn("label", label)
  }
}
