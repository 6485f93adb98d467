package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator: replicate an SF directory `factor`×
  * with key remapping, preserving the per-key data distribution so
  * per-row query cost stays comparable while total volume grows —
  * the harness for catching shuffle/skew behavior the small fixtures
  * can't (NEXT.md item 5 / VERDICT round-1 task 9).
  *
  * Remapping rules (STEP = 10,000,000 clears every fixture key range):
  *  - every table's own key and its foreign keys shift by r·STEP, so
  *    joins keep exactly their original fan-in/fan-out per key;
  *  - region/nation stay as-is (broadcast dims; scaling them would
  *    change the join shape, not the data volume);
  *  - `documents.text` gets a per-replica suffix on every token, so
  *    cross-replica near-dup similarity is 0 and dedup candidate
  *    buckets grow linearly (×factor), not quadratically. With
  *    `dupEvery` = N > 0, every Nth doc instead keeps its text
  *    VERBATIM in all replicas — a duplicate-heavy corpus whose
  *    repeated-gram document frequency grows ×factor, the skewed
  *    gram-key regime substring dedup meets at 100 TB (boilerplate
  *    present in millions of documents) that the uniform fixtures
  *    cannot exercise;
  *  - `embeddings.embedding` flips alternating dimensions by ±10% per
  *    odd replica (cosine vs the original ≈ 0.995), so near-dup pairs
  *    don't multiply across replicas;
  *  - `events.ts` passes through as the raw nanos long.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> [factor]
  *          [dupEvery] [onlyTablesCsv]
  * `onlyTablesCsv` restricts which tables are written (e.g.
  * "documents" for a skew corpus that only substring dedup reads) —
  * generating 10× of every table just to bench two queries is waste.
  */
object ScaleUp {
  val Step = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val dupEvery = if (args.length > 3) args(3).toInt else 0
    val only = if (args.length > 4)
      Some(args(4).split(',').map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleUp(spark, src, out, factor, dupEvery, only)
    spark.stop()
  }

  def scaleUp(spark: SparkSession, src: String, out: String, factor: Int,
      dupEvery: Int = 0, only: Option[Set[String]] = None): Unit = {
    def want(t: String) = only.forall(_.contains(t))
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      if (want(t))
        df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")

    def replicate(t: String)(remap: (DataFrame, Int) => DataFrame)
        : Unit = if (want(t)) {
      val base = read(t)
      write((0 until factor).map(r => remap(base, r)).reduce(_ union _), t)
    }
    def shift(c: String, r: Int) = col(c) + lit(r * Step)

    // broadcast dims: copy untouched
    write(read("region"), "region")
    write(read("nation"), "nation")

    replicate("customer")((df, r) => df.select(
      shift("c_custkey", r).as("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
    replicate("supplier")((df, r) => df.select(
      shift("s_suppkey", r).as("s_suppkey"), col("s_name"),
      col("s_nationkey"), col("s_acctbal")))
    replicate("part")((df, r) => df.select(
      shift("p_partkey", r).as("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))
    replicate("orders")((df, r) => df.select(
      shift("o_orderkey", r).as("o_orderkey"),
      shift("o_custkey", r).as("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")))
    replicate("lineitem")((df, r) => df.select(
      shift("l_orderkey", r).as("l_orderkey"),
      shift("l_partkey", r).as("l_partkey"),
      shift("l_suppkey", r).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")))
    replicate("events")((df, r) => df.select(
      shift("event_id", r).as("event_id"), col("ts"),
      shift("user_id", r).as("user_id"), col("event_type"), col("value"),
      col("props")))
    replicate("documents") { (df, r) =>
      // Replica-fresh vocabulary at BOTH granularities: interleaving
      // the replica digit after every non-space char makes every
      // TOKEN unique to its replica (the original suffix property —
      // cross-replica shingle joins stay empty) AND every CHARACTER
      // q-gram unique to its replica (every 2-gram now contains the
      // digit). The old "$token r$r" suffix refreshed only the token
      // vocabulary, so char-gram document frequencies grew ×factor by
      // construction and the char-level edit join (q159) measured
      // quadratic against a corpus shape no real corpus has — real
      // growth adds vocabulary at every granularity (Heaps' law), the
      // synthetic replication must too, or the scale gate compares
      // operators against different laws depending on which
      // granularity they key on.
      // SINGLE-DIGIT replica ids only (ADVICE r10): interleaving a
      // bare multi-digit index is ambiguous — interleave("a1", r=11)
      // and interleave("a11", r=1) both yield "a11111", so digit-
      // bearing tokens could collide across replicas and silently
      // break the replica-fresh-vocabulary invariant the scale gate
      // measures. A delimiter would disambiguate but reintroduce the
      // very bug this interleave fixed: every (char, delimiter)
      // 2-gram would be replica-INdependent, so char-gram df would
      // grow xfactor again and the edit join would measure quadratic
      // against a corpus shape no real corpus has. factor <= 10 keeps
      // the id a single digit; the scale gate never exceeds 10.
      require(factor <= 10,
        s"documents interleave supports factor <= 10 (single-digit " +
          s"replica ids), got $factor")
      val suffixed = regexp_replace(col("text"), "(\\S)", s"$$1$r")
      val text =
        if (r == 0) col("text")
        else if (dupEvery > 0)
          // duplicate-heavy skew corpus: every Nth doc repeats
          // VERBATIM across replicas, so its grams' distinct-doc
          // frequency grows ×factor (the boilerplate regime)
          when(pmod(col("doc_id"), lit(dupEvery)) === 0, col("text"))
            .otherwise(suffixed)
        else suffixed
      df.select(shift("doc_id", r).as("doc_id"), text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicate("embeddings")((df, r) => df.select(
      shift("vec_id", r).as("vec_id"),
      (if (r % 2 == 0) col("embedding")
       else transform(col("embedding"), (x, i) =>
         (x * (lit(1.0f) + lit(0.1f) * ((i % 2) * 2 - 1))).cast("float")))
        .as("embedding"),
      col("label")))
  }
}
