package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via PREFIX FILTERING — the deterministic
  * counterpart to the MinHash/SimHash family in [[Dedup]]: identical
  * output to the exact all-pairs Jaccard join, but candidate generation
  * reads only each set's df-rarest prefix (AllPairs, Bayardo et al.
  * WWW'07; PPJoin, Xiao et al. WWW'08 Lemma 1).
  *
  * Why a second candidate generator when LSH already exists: LSH is
  * probabilistic — its gates hold because the band parameters make the
  * miss probability negligible AT the threshold, and every new
  * (threshold, corpus) pairing needs that argument re-made. Prefix
  * filtering is an inequality, not a coin flip: for a global token
  * order and overlap bound alpha, any pair with |A∩B| >= alpha shares a
  * token inside the (|A|-alpha+1)-prefixes of BOTH sets, so the
  * candidate set provably contains every qualifying pair at every
  * threshold. jac(A,B) >= t implies |A∩B| >= ceil(t·max(|A|,|B|)) >=
  * ceil(t·|A|), so the per-set prefix |A| - ceil(t·|A|) + 1 is always
  * long enough.
  *
  * Scale design: the global order is ASCENDING document frequency, so
  * prefixes hold each set's RAREST shingles — the inverted index that
  * candidates join through is built over exactly the tokens with the
  * smallest postings lists. That is the skew story: bucket cost is
  * Σ df² over PREFIX tokens only, and a token's presence in prefixes
  * shrinks as its df grows (a boilerplate shingle shared by a million
  * docs sits at the very END of the df order and never enters a prefix
  * unless a set is nearly all boilerplate). No probabilistic cap, no
  * dropped pairs. Threshold is a rational tNum/tDen so the filter is
  * exact integer arithmetic in both engines (the house double rule).
  */
object PrefixJoin {

  /** All pairs with n-gram-shingle Jaccard >= tNum/tDen, exactly.
    * Output: (id_a, id_b, common, na, nb, jac) — the [[
    * Dedup.ngramJaccardPairs]] surface, so oracles and survivors
    * compose unchanged.
    *
    * Plan: shingle scan (repartition barrier shared by rerank) →
    * explode → df agg (one shuffle on shingle) → per-doc rank window
    * (df ASC, shingle ASC — a TOTAL order, so prefixes are
    * deterministic) → prefix-only self-join on shingle → ids-distinct
    * candidates → exact rerank from the full shingle arrays. */
  def ppjoinPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, tNum: Int = 1, tDen: Int = 2): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold $tNum/$tDen must be in (0, 1]")
    // localCheckpoint, not a repartition barrier: the shingle frame is
    // read FOUR times (df agg, both candidate sides, both rerank
    // sides) and self-join aliasing defeats ReusedExchange
    // canonicalization — without it the whole subtree re-executes per
    // consumer (the r09 hammingHalvesPairs lesson).
    // Arrays SORTED once per doc (r18): the rerank intersects one pair
    // of arrays PER CANDIDATE, and the sorted merge-walk kernel
    // (sortedIntersectCount) replaced array_intersect's per-pair hash
    // set + result array — q145's rerank dropped 4.9s → sub-second at
    // 190k candidates. Sorting is safe everywhere this frame flows:
    // explode feeds order-insensitive aggregates/windows with total
    // orderings, and set size/intersection are order-free.
    // hsh = the shingle set as sorted xxhash64 TOKENS: when the hash is
    // injective on this corpus (verified below — one count-distinct
    // parity aggregate), |A∩B| on hashes equals |A∩B| on strings and
    // the per-pair walk compares primitive longs instead of UTF8
    // strings (~10× per element). Injectivity is CHECKED, not assumed:
    // 64-bit collisions are ~1e-9 at gate scale but real at 10¹⁰
    // distinct shingles — on collision the rerank falls back to the
    // exact string walk, so the output is identical in both regimes.
    val sh = docs.select(
      col(idCol).as("id"),
      array_sort(distinctShingles(col(textCol), n)).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("hsh",
        array_sort(transform(col("shingles"), x => xxhash64(x))))
      .localCheckpoint(false)
    val ex = sh.select(col("id"), size(col("shingles")).as("nsh"),
      explode(col("shingles")).as("s"))
    // df agg checkpointed (lazily): it already holds one row per
    // DISTINCT shingle, so the injectivity check below is a tiny agg
    // over it instead of a SECOND full explode + two corpus-wide
    // distincts (r19 — the check used to cost a whole df-agg-sized
    // pass), and the ranked join then reads the materialization.
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val injective = {
      val r = dfreq.agg(count(lit(1)).as("ns"),
        countDistinct(xxhash64(col("s"))).as("nh")).head()
      r.getLong(0) == r.getLong(1)
    }
    // prefix length p = nsh - ceil(t*nsh) + 1, ceil via integer div.
    // (A hash-agg + per-row array_sort variant was MEASURED SLOWER
    // than this window — 8.0s vs 6.9s on the q145 gate at sf0.1:
    // collecting/sorting per-doc struct arrays allocates more than
    // Spark's codegen'd sort-based window over flat rows.)
    val ranked = ex.join(dfreq, Seq("s"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .withColumn("__plen",
        col("nsh") - floor((lit(tNum) * col("nsh") + lit(tDen - 1))
          / lit(tDen)).cast("long") + lit(1))
    // checkpointed for the same reason: both sides of the candidate
    // self-join read it, and the window+join above it is the plan's
    // most expensive stage — run it once.
    val pre = ranked.filter(col("__rn") <= col("__plen"))
      .select(col("id"), col("nsh"), col("__rn"), col("s"))
      .localCheckpoint(false)
    // two filters ride the candidate join, before the pair shuffle:
    //  - LENGTH (AllPairs): jac >= t forces t·max(|A|,|B|) <=
    //    min(|A|,|B|) — kills the size-mismatched bulk of each
    //    posting bucket for free;
    //  - POSITIONAL (PPJoin Lemma 2): a qualifying pair needs overlap
    //    alpha = ceil(t·(|A|+|B|)/(1+t)), and its FIRST shared prefix
    //    element at positions (pa, pb) admits at most
    //    1 + min(|A|−pa, |B|−pb) total overlap (the global order puts
    //    shared elements in the same relative order on both sides, so
    //    nothing shared precedes the first shared element). Keeping a
    //    pair iff ANY of its shared prefix elements passes the bound
    //    is equivalent to testing the first one (the bound is maximal
    //    there) — completeness is preserved, and the distinct shuffle
    //    plus the rerank read fewer pairs. Exact integers throughout:
    //    (tNum+tDen)·ub >= tNum·(na+nb) ⟺ ub >= alpha. Measured
    //    NEUTRAL on the q145 fixture at sf0.1 (6.83s vs 6.87s —
    //    candidate GENERATION dominates there); kept because the
    //    filter bites exactly where a real corpus hurts: near-dup
    //    families with long shared prefixes inflate the post-join
    //    pair set, and this prunes it before the distinct shuffle.
    val ub = lit(1) +
      least(col("__na") - col("__pa"), col("__nb") - col("__pb"))
    val cand = pre.select(col("id").as("id_a"), col("nsh").as("__na"),
        col("__rn").as("__pa"), col("s"))
      .join(pre.select(col("id").as("id_b"), col("nsh").as("__nb"),
        col("__rn").as("__pb"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        lit(tNum) * greatest(col("__na"), col("__nb")) <=
          lit(tDen) * least(col("__na"), col("__nb")) &&
        lit(tNum + tDen) * ub >=
          lit(tNum) * (col("__na") + col("__nb")))
      .select(col("id_a"), col("id_b")).distinct()
    // injective hashes ⇒ same length arrays (per-doc shingles are
    // distinct strings ⇒ distinct hashes), so na/nb are unchanged too
    val setCol = if (injective) "hsh" else "shingles"
    def common(a: Column, b: Column): Column =
      if (injective) sortedLongIntersectCount(a, b)
      else sortedIntersectCount(a, b)
    cand
      .join(sh.select(col("id").as("id_a"), col(setCol).as("sh_a")),
        Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col(setCol).as("sh_b")),
        Seq("id_b"))
      .withColumn("common", common(col("sh_a"), col("sh_b")))
      .withColumn("na", size(col("sh_a")).cast("long"))
      .withColumn("nb", size(col("sh_b")).cast("long"))
      // jac >= tNum/tDen as exact integers: tDen*common >= tNum*union
      .filter(lit(tDen) * col("common") >=
        lit(tNum) * (col("na") + col("nb") - col("common")))
      .withColumn("jac", col("common").cast("double")
        / (col("na") + col("nb") - col("common")))
      .select(col("id_a"), col("id_b"), col("common"), col("na"),
        col("nb"), col("jac"))
  }
}
