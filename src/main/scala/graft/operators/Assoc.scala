package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association / co-occurrence mining over the corpus — the
  * market-basket view of text: which terms appear together in the same
  * document (feeding stop-pair lists, topic seeds, query expansion),
  * and how much one SOURCE duplicates another (the partner-overlap
  * report a corpus buyer reads before paying for a "new" crawl).
  *
  * Both operators follow the house inverted-structure rule: nothing
  * compares all pairs globally. Pair support counts come from per-
  * document self-joins (cost Σ|doc vocab|², bounded by document size,
  * not corpus size); source overlap joins through the shingle inverted
  * index (cost Σ df² over source-distinct shingles — df here is
  * bounded by the SOURCE count, which is catalog-sized).
  */
object Assoc {

  /** Top-k co-occurring token pairs by DOCUMENT support (both tokens
    * in the same document; duplicates within a doc count once — the
    * standard itemset-support semantics). Output: (x, y, n) with the
    * (n DESC, x, y) deterministic cut. minSupport prunes the agg
    * output before the heap.
    *
    * Scale: explode per-doc distinct tokens → doc-keyed self-join
    * (per-row cost |vocab∩doc|², a document property) → (x, y) hash
    * agg with map-side combine → TakeOrdered heap. For web-scale
    * vocabularies, df-prune the token stream first (the q95/q146 cap
    * pattern) — support counting only loses pairs below any
    * reasonable support floor. */
  def tokenPairSupport(docs: DataFrame, idCol: String, textCol: String,
      minSupport: Long = 2L, k: Int = 50): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("t"))
      .repartition(col("id"))
    toks.select(col("id"), col("t").as("x"))
      .join(toks.select(col("id"), col("t").as("y")), Seq("id"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .orderBy(col("n").desc, col("x"), col("y"))
      .limit(k)
  }

  /** Pairwise SOURCE overlap matrix over distinct n-gram shingles:
    * for every source pair, shared distinct shingles, per-source set
    * sizes, and the set Jaccard — "how much of feed B have I already
    * bought in feed A". Output: (src_a, src_b, common, na, nb, jac),
    * one row per source pair that shares at least one shingle.
    *
    * Scale: one (source, shingle)-distinct agg (the corpus collapses
    * to source-level sets — the only pass over the data), then an
    * inverted-index join whose per-shingle cost is bounded by the
    * SOURCE count squared, catalog-sized, not corpus-sized. */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sg = docs.select(col(srcCol).as("src"),
        explode(distinctShingles(col(textCol), n)).as("s"))
      .distinct()
      .localCheckpoint() // feeds sizes + both join sides
    val sizes = sg.groupBy(col("src")).agg(count(lit(1)).as("nsh"))
    sg.select(col("src").as("src_a"), col("s"))
      .join(sg.select(col("src").as("src_b"), col("s")), Seq("s"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("src").as("src_a"), col("nsh").as("na")),
        Seq("src_a"))
      .join(sizes.select(col("src").as("src_b"), col("nsh").as("nb")),
        Seq("src_b"))
      .withColumn("jac", col("common").cast("double")
        / (col("na") + col("nb") - col("common")))
      .select(col("src_a"), col("src_b"), col("common"), col("na"),
        col("nb"), col("jac"))
  }
}
