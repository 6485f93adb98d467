package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md /
  * FIXTURES.md §B). Every query takes the scale-factor directory explicitly
  * so the same code runs unchanged at any SF; on a real cluster these would
  * be catalog tables (partitioned / bucketed on their join keys) and the
  * reads below would become `spark.table(name)` with partition pruning.
  *
  * Reads are plain `spark.read.parquet` so Catalyst handles column pruning
  * and predicate pushdown into the scan — queries must NOT cache or collect
  * these; keep plans lazy end-to-end.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in three parquet encodings across fixture
    * generations: TIMESTAMP(NANOS) (driver rounds ≤7 — Spark rejects it
    * as [PARQUET_TYPE_ILLEGAL] unless the legacy nanosAsLong conf reads
    * it back as a raw long), plain INT64 nanos (graft.FixtureGen), and
    * TIMESTAMP(MICROS) with no UTC flag (driver round 8+ — Spark reads
    * it as TIMESTAMP_NTZ). Normalize all three to the same
    * micros-precision `TimestampType` column, which is exactly the value
    * DuckDB sees when it loads the same file, so oracle comparisons stay
    * exact across generations.
    *
    * The nanos encodings REQUIRE the session conf
    * `spark.sql.legacy.parquet.nanosAsLong=true`; it is set here
    * (idempotent, never unset) if missing. That session-level side effect
    * is explicit because there is no per-read equivalent — the conf only
    * widens what parquet types a scan accepts, so it cannot change the
    * result of any other read. The NTZ→timestamp cast is wall-clock
    * preserving only under a UTC session timezone, so that invariant is
    * ENFORCED here (idempotent, same pattern as the nanos conf) rather
    * than assumed from the host JVM's default — a non-UTC host would
    * otherwise silently shift every ts value (ADVICE r08). */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.getOption(NanosConf).forall(_ != "true"))
      s.conf.set(NanosConf, "true")
    if (s.conf.get("spark.sql.session.timeZone", "") != "UTC")
      s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already TimestampType
    }
  }
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all fixture tables as temp views (for SQL-expressed queries,
    * e.g. GROUPING SETS which has no DataFrame API). View names match the
    * oracle's table names. `events` routes through [[events]] so the view
    * carries the same micros-truncated `ts` as every DataFrame query
    * (registering the raw file would either fail on the nanos type or
    * expose ts as a bare long). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
