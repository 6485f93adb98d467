package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deterministic, self-contained fixture generator for CI.
  *
  * The ScalaTest suite reads the driver-generated parquet fixtures
  * (TESTDATA.md) from `/root/testdata/sf0.001` — a path that exists on
  * the build machine but not on a CI runner. This main synthesizes
  * schema-compatible tables (same names, same column names and types,
  * same key ranges and referential integrity, similar cardinalities and
  * value distributions) so `.github/workflows/ci.yml` can run
  * `sbt test` hermetically:
  *
  * {{{
  * sbt "runMain graft.FixtureGen target/ci-testdata"
  * GRAFT_SF_DIR=target/ci-testdata sbt test
  * }}}
  *
  * NOT the oracle data: correctness gates (Verify + DuckDB) always run
  * against the driver fixtures; these synthetic tables only back the
  * property-shaped ScalaTest assertions. Generation is pure hash
  * arithmetic on row indexes (no RNG state), so output is bit-stable
  * across runs and machines.
  *
  * One deliberate type difference: the driver writes `events.ts` as
  * parquet TIMESTAMP(NANOS), which Spark cannot write. We store raw
  * nanos-since-epoch as plain INT64 — `Tables.events` reads BOTH
  * encodings identically (its nanosAsLong conf turns the driver's
  * nanos timestamps into the same raw longs).
  */
object FixtureGen {

  /** SplitMix64 finalizer — stateless per-index hash. */
  private def h(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** Uniform [0,1) from (table seed, row index). */
  private def u(seed: Long, i: Long): Double =
    (h(seed * 1000003L + i) >>> 11).toDouble / (1L << 53).toDouble
  private def pick[A](seed: Long, i: Long, xs: Seq[A]): A =
    xs((u(seed, i) * xs.size).toInt.min(xs.size - 1))
  private def r2(v: Double): Double = math.rint(v * 100) / 100

  case class Region(r_regionkey: Int, r_name: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)
  case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double, props: String)
  case class Doc(doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  private val segments =
    Seq("MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE")
  private val priorities = Seq("1-URGENT", "2-HIGH", "5-LOW")
  private val ptypes = Seq("ECONOMY", "PROMO", "LARGE", "STANDARD", "SMALL")
  private val etypes = Seq("click", "view", "purchase", "signup", "error")
  private val langs =
    Seq("en", "en", "en", "en", "zh", "fr", "es", "de") // en-skewed
  private val vocab = Seq("the", "a", "fast", "slow", "small", "big", "key",
    "order", "sort", "table", "scan", "merge", "part", "window", "hash",
    "join", "batch", "stream", "spark", "dup", "group", "query", "row",
    "data", "filter", "customer", "line", "value", "agg", "column", "vector")

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/ci-testdata")
    // rows scale with the optional multiplier (1 = sf0.001-sized)
    val m = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nCust = 150 * m; val nOrd = 1500 * m; val nLine = 6000 * m
    val nPart = 200 * m; val nSupp = 10; val nEvt = 1000 * m
    val nDoc = 500 * m; val day = 86400000L
    def ts(millis: Long) = new java.sql.Timestamp(millis)
    val epoch95 = java.time.Instant.parse("1995-01-01T00:00:00Z")
      .toEpochMilli
    val epoch24 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .toEpochMilli

    def write[A <: Product : org.apache.spark.sql.Encoder](
        name: String, rows: Seq[A]): Unit = {
      rows.toDS().coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/$name.parquet")
      println(s"[fixturegen] $name: ${rows.size} rows")
    }

    write("region", Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
      .zipWithIndex.map { case (n, i) => Region(i, n) })
    write("nation", (0 until 25).map(i => Nation(i, s"NATION_$i", i % 5)))
    write("customer", (0L until nCust).map(i => Customer(i, s"Customer#$i",
      (u(1, i) * 25).toInt, r2(u(2, i) * 10800 - 900), pick(3, i, segments))))
    write("supplier", (0L until nSupp).map(i => Supplier(i, s"Supplier#$i",
      (u(4, i) * 25).toInt, r2(u(5, i) * 10800 - 900))))
    write("part", (0L until nPart).map(i => Part(i, s"part $i",
      s"Brand#${(u(6, i) * 25).toInt + 1}", pick(7, i, ptypes),
      (u(8, i) * 50).toInt + 1, r2(u(9, i) * 1900 + 100))))
    write("orders", (0L until nOrd).map(i => Order(i, (u(10, i) * nCust).toLong,
      pick(11, i, Seq("O", "P", "F")), r2(u(12, i) * 498000 + 1500),
      ts(epoch95 + (u(13, i) * 2500).toLong * day), pick(14, i, priorities))))
    write("lineitem", (0L until nLine).map { i =>
      val ok = (u(15, i) * nOrd).toLong
      val qty = (u(16, i) * 50).toInt + 1
      Lineitem(ok, (u(17, i) * nPart).toLong, (u(18, i) * nSupp).toLong,
        (i % 7).toInt + 1, qty.toDouble, r2(qty * (u(19, i) * 1900 + 100)),
        r2(u(20, i) * 0.1), r2(u(21, i) * 0.08),
        pick(22, i, Seq("A", "N", "R")), pick(23, i, Seq("O", "F")),
        ts(epoch95 + (u(24, i) * 2500).toLong * day))
    })
    write("events", (0L until nEvt).map { i =>
      val millis = epoch24 + (u(25, i) * 30 * day).toLong
      Event(i, millis * 1000000L, (u(26, i) * 15).toLong,
        pick(27, i, etypes), r2(u(28, i) * 330 + 0.01),
        s"""{"k": ${(u(29, i) * 100).toInt}}""")
    })
    write("documents", {
      val fresh = (0L until nDoc).map { i =>
        val n = 20 + (u(30, i) * 100).toInt
        (0 until n).map(j => pick(31, i * 1000 + j, vocab)).mkString(" ")
      }
      (0L until nDoc).map { i =>
        // Plant NEAR-dup structure like the driver corpus (DedupSpec
        // asserts the fixture has near-dups but NO exact text dups):
        // every 20th+7 row appends one word to an earlier doc — 3-gram
        // jaccard m/(m+1) >= 0.94, above every spec threshold, while
        // unrelated word-salad pairs sit near 0.
        val k = i.toInt
        val text =
          if (i % 20 == 7 && i >= 7) fresh(k - 7) + " extra"
          else fresh(k)
        Doc(i, text, pick(32, i, langs), s"src${(u(33, i) * 20).toInt}",
          text.length.toLong)
      }
    })
    write("embeddings", (0L until nDoc).map { i =>
      val label = (u(35, i) * 10).toInt
      // Label-anchored clusters with per-dim decaying variance: the
      // covariance gets a spread eigen-spectrum (LinalgSpec orders PCA
      // components by variance — isotropic noise would tie them) and
      // |values| stay ~0.5 so distributed covariance matches the exact
      // decimal path within its 1e-9 absolute band.
      val v = Array.tabulate(64) { j =>
        val center = (u(36, label * 64L + j) - 0.5) * 0.8
        val noise = (u(34, i * 64 + j) - 0.5) * 0.8
        ((center + noise) / (1.0 + 0.15 * j)).toFloat
      }
      Embedding(i, v, label)
    })
    spark.stop()
  }
}
