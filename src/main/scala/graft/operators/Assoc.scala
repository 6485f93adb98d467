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

  /** Top-k collocations by pointwise mutual information over document
    * co-occurrence — [[tokenPairSupport]]'s counts turned into an
    * ASSOCIATION STRENGTH: lift(x,y) = (n_xy·N) / (n_x·n_y) with N
    * the document count, n_x/n_y per-token document frequencies,
    * n_xy the pair support (PMI = ln lift; ln is monotonic, so the
    * lift ordering IS the PMI ordering and the ln never needs to be
    * computed). Support ranks common-word pairs first; lift ranks the
    * pairs that co-occur far above chance — the collocation /
    * phrase-mining / topic-seed surface. minSupport is load-bearing:
    * an unsupported floor lets two singleton tokens reach the maximal
    * lift N.
    *
    * Numerics: lift is ONE double division of double products of
    * exact longs — every step correctly rounded, so the value, the
    * ordering, and the top-k cut are bit-identical cross-engine and
    * the ranked output gates hash-exact (the q190 ln-input rule,
    * minus the ln).
    *
    * Scale shape: the [[tokenPairSupport]] per-document self-join
    * (cost bounded by document vocabulary, never corpus size), one
    * df agg, two token-keyed joins of the pair table against the
    * vocab-sized df table (shuffle joins — df is NOT broadcast, a
    * web-scale vocabulary outgrows the driver), one broadcast of the
    * single-row N, TakeOrdered heap for the cut. */
  def pmiTopK(docs: DataFrame, idCol: String, textCol: String,
      minSupport: Long = 2L, k: Int = 50): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("t"))
      .repartition(col("id"))
      .localCheckpoint(false) // feeds the self-join twice + the df agg
    val pairs = toks.select(col("id"), col("t").as("x"))
      .join(toks.select(col("id"), col("t").as("y")), Seq("id"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minSupport)
    val df = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val ndocs = docs.agg(count(lit(1)).as("n_docs"))
    val ranked = pairs
      .join(df.select(col("t").as("x"), col("df").as("n_x")), Seq("x"))
      .join(df.select(col("t").as("y"), col("df").as("n_y")), Seq("y"))
      .crossJoin(broadcast(ndocs))
      .withColumn("lift",
        (col("n_xy").cast("double") * col("n_docs").cast("double"))
          / (col("n_x").cast("double") * col("n_y").cast("double")))
      .orderBy(col("lift").desc, col("x"), col("y")).limit(k)
    ranked.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("lift").desc, col("x"), col("y"))).cast("long"))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("lift"), col("rk"))
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
      .localCheckpoint(false) // feeds sizes + both join sides
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
