package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WEIGHTED sparse-vector similarity join over n-gram COUNT vectors —
  * the frequency-aware sibling of the set-overlap family in [[Dedup]]
  * and [[PrefixJoin]]: two documents that share the same shingle SET
  * but repeat different parts score identically under Jaccard and
  * differently here, which is what separates "same template, different
  * emphasis" near-dups from true copies.
  *
  * Cosine over integer count vectors stays in exact arithmetic all the
  * way to the final threshold: dot and squared norms are integer sums,
  * and cos >= tNum/tDen is evaluated as
  * tDen²·dot² >= tNum²·na²·nb² — no doubles until the reported score
  * (whose expression order both engines share). Magnitudes are bounded
  * by per-document token counts (a chunked corpus keeps those ≤ a few
  * thousand), not by corpus size, so longs never overflow.
  *
  * Scale design: candidate generation goes through a df-capped
  * inverted index — grams with document frequency above `maxDf` are
  * dropped from CANDIDATE GENERATION ONLY (they fund the Σ df² join
  * blowup and carry no discrimination), and every surviving candidate
  * pair is reranked with its FULL posting rows, so dot products are
  * exact regardless of the cap. A qualifying pair is missed only if
  * every gram it shares is above the cap — pick maxDf above the
  * corpus's boilerplate df and the output equals the uncapped join
  * (the q146 gate proves this on its fixture: the cap drops 13% of
  * candidates and changes nothing). Same contract as
  * [[Dedup.ngramJaccardPairsCapped]], weighted.
  */
object SparseSim {

  /** All pairs with n-gram count-vector cosine >= tNum/tDen.
    * Output: (id_a, id_b, dot, na2, nb2, cos).
    *
    * '''The default `maxDf = 1000` makes candidate generation
    * APPROXIMATE''' (ADVICE r14): a qualifying pair whose every shared
    * gram has document frequency > maxDf is silently dropped. Pass
    * `maxDf = Int.MaxValue` for the exact all-pairs join (quadratic in
    * the hottest gram's df — only safe on small/pre-chunked corpora),
    * or size maxDf above the corpus's boilerplate df; scores of
    * SURVIVING pairs are always exact regardless of the cap.
    *
    * Plan: gram-count postings (one (id, gram) hash agg) → df
    * pre-filter (count agg + semi-join, constant space per gram) →
    * bucketed pair expansion (gram-keyed hash agg, arrays bounded by
    * maxDf, a<b pairs streamed through chained generators) →
    * ids-distinct candidates → exact rerank joining both posting
    * sides → integer threshold. */
  def countCosinePairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, tNum: Int = 9, tDen: Int = 10,
      maxDf: Int = 1000): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold $tNum/$tDen must be in (0, 1]")
    // localCheckpoint: the posting frame feeds FIVE consumers (norms,
    // df agg, both candidate sides, both rerank sides) and self-join
    // aliasing defeats ReusedExchange — without the barrier the
    // shingle explode re-executes per consumer (r09 lesson).
    // positionalShingles, not the HOF shingles(): same multiset of
    // grams (so identical counts), but the HOF build re-splits the
    // text per gram — O(tokens²) chars per document, measured 3.9-5.0s
    // of q146's 7.0s at sf0.1 — while the native expression tokenizes
    // once (r18; the TextFunctions.shingles scaladoc caution applied)
    val p = docs.select(col(idCol).as("id"),
        explode(positionalShingles(col(textCol), n)).as("gram"))
      .groupBy(col("id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    // one SORTED gram-count posting array per doc: the rerank joins two
    // arrays per candidate pair instead of cand × |doc| posting rows —
    // the dot is one allocation-free merge walk inside the row
    // (sortedEntriesDot; previously a map_from_entries map per doc and
    // an interpreted aggregate(map_zip_with) fold per pair), so the
    // rerank shuffle stays bounded by the candidate count and the
    // per-pair cost is two pointers
    val pmap = p.groupBy(col("id"))
      .agg(sort_array(collect_list(
        struct(col("gram"), col("cnt")))).as("m"),
        sum(col("cnt") * col("cnt")).as("n2"))
      .localCheckpoint(false)
    // candidate generation as BUCKETED pair expansion. The df filter
    // runs BEFORE any collection (constant-space count agg + semi-join,
    // ADVICE r13): collecting first and filtering after would build an
    // O(df) aggregation buffer for every hot gram — corpus-sized for
    // boilerplate trigrams at 100 TB — just to throw it away. After the
    // semi-join each gram's posting array is bounded by maxDf, and the
    // a<b pairs unroll through two CHAINED generators so no single row
    // ever materializes the O(df²) pair array (the previous
    // flatten-transform built all pairs of a gram in one row before
    // exploding): per-row state is one O(maxDf) array, and codegen
    // streams the second explode off the first.
    val eligible = p.groupBy(col("gram"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2L, maxDf.toLong))
      .select(col("gram"))
    val cand = p.join(eligible, Seq("gram"), "left_semi")
      .groupBy(col("gram"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(col("ids"), posexplode(col("ids")).as(Seq("__i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("__i") + lit(2), size(col("ids"))))
          .as("id_b"))
      .distinct()
    cand
      .join(pmap.select(col("id").as("id_a"), col("m").as("ma"),
        col("n2").as("na2")), Seq("id_a"))
      .join(pmap.select(col("id").as("id_b"), col("m").as("mb"),
        col("n2").as("nb2")), Seq("id_b"))
      .withColumn("dot", sortedEntriesDot(col("ma"), col("mb")))
      .filter(lit(tDen.toLong * tDen) * col("dot") * col("dot") >=
        lit(tNum.toLong * tNum) * col("na2") * col("nb2"))
      .withColumn("cos", col("dot").cast("double")
        / (sqrt(col("na2").cast("double"))
          * sqrt(col("nb2").cast("double"))))
      .select(col("id_a"), col("id_b"), col("dot"), col("na2"),
        col("nb2"), col("cos"))
  }
}
