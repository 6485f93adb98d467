package graft
import org.apache.spark.sql.SparkSession
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[perf] $n rows=$c in ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    time("q31_minhash_run1") { queries.TextQueries.q31_minhash_lsh_pairs(spark, d).count() }
    time("q31_minhash_run2") { queries.TextQueries.q31_minhash_lsh_pairs(spark, d).count() }
    time("q30_jaccard_run1") { queries.TextQueries.q30_jaccard_pairs(spark, d).count() }
    time("q30_jaccard_run2") { queries.TextQueries.q30_jaccard_pairs(spark, d).count() }
    time("q32_survivors") { queries.TextQueries.q32_dedup_survivors(spark, d).count() }
    time("q33_simhash") { queries.TextQueries.q33_simhash_pairs(spark, d).count() }
    spark.stop()
  }
}
