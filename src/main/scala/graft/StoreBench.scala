package graft

import graft.eventstore.{EventStore, StoreLoad}
import org.apache.spark.sql.SparkSession

/** Per-round store-latency artifact (BENCH_STORE.json) — the recorded
  * counterpart of the reference's criterion benches
  * (benches/write_benchmark.rs:7-21 appends; read_benchmark.rs:14-35
  * point-reads a long stream) plus the k6 sustained-load thresholds
  * (load/post-event.js:7-11). Prints the JSON as the last bare line of
  * stdout, same contract as graft.Bench. */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val seconds = sys.env.getOrElse("SPARK_GRAFT_STORE_SECONDS", "20")
      .toDouble
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .appName("graft-store-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.TempDirs.scratch("graft-store-bench-")
    val store = new EventStore(spark, dir)
    // warm once: first append pays Hadoop FS + parquet writer classload
    StoreLoad.run(store, seconds = 1.0)
    val result = StoreLoad.run(new EventStore(spark,
      graft.TempDirs.scratch("graft-store-bench-")), seconds)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_STORE.json"),
      (result.json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    println(result.json)
    System.out.flush()
  }
}
