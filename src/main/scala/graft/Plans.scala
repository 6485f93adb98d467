package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump every gate query's formatted physical plan to one file — the
  * per-round explain artifact (VERDICT round-1 task 9). Diffing two
  * rounds' dumps shows plan regressions (new exchanges, lost pushdown,
  * codegen breaks) that wall-clock noise can hide.
  *
  * Usage: runMain graft.Plans <sfDir> <outFile>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PLANS_ONLY=q124,q141 → subset (prefix match), the
    // BENCH_ONLY pattern — per-query before/after dumps for the r18
    // optimization evidence without re-planning the whole registry
    val only = sys.env.get("SPARK_GRAFT_PLANS_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    val sb = new StringBuilder
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"==== $name ====\n")
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Exception => s"PLAN FAILED: ${e.getMessage}\n" }
      // strip run-to-run noise (ids, temp paths, codegen stage numbers)
      val cleaned = plan.linesIterator.map { l =>
        l.replaceAll("#\\d+", "#N")
          .replaceAll("/tmp/[^\\s,\\]]+", "/tmp/...")
          .replaceAll("WholeStageCodegen \\(\\d+\\)", "WholeStageCodegen (N)")
          .replaceAll("\\[plan_id=\\d+\\]", "[plan_id=N]")
      }.mkString("\n")
      sb.append(cleaned).append("\n\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"[plans] wrote ${selected.size} plans to $out")
    spark.stop()
  }
}
