package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** True when the recorded suite walls disagree by more than 2x —
    * the signature of a hypervisor co-tenant burst landing inside one
    * pass (r07: identical suites measured 47.6s and 5.6s back to
    * back). A burst artifact must say so, and must not reseed the
    * longest-job-first ranking. */
  private[graft] def burstSuspect(walls: Seq[Double]): Boolean =
    walls.nonEmpty && walls.max > 2.0 * math.max(walls.min, 1e-9)

  /** Representative wall: MEDIAN once three or more passes exist (r14
    * verdict item 1: the min-of-2 headline swung 39.2s → 94.9s on
    * harness variance alone and could not prove "no regression" — the
    * canonical run now takes 3 passes and publishes their median, with
    * every wall recorded in the artifact); min of two clean passes
    * when only two ran (subset/synthetic-dir runs). */
  private[graft] def representativeWall(walls: Seq[Double]): Double =
    if (walls.isEmpty) 0.0
    else if (walls.size < 3) walls.min
    else walls.sorted.apply(walls.size / 2)

  /** Host-contention verdict from the per-pass calibration sentinels
    * (r16 verdict item 1: a window-wide co-tenant steal inflated every
    * number ~8x while noise_ratio read 1.245 "clean", because all
    * three passes sat inside the SAME sustained steal window — a
    * relative health check cannot see a burst that covers the whole
    * run). The sentinel is an ABSOLUTE-cost probe with pinned
    * per-core work, timed immediately before each pass; the run is
    * contended when NO pass had a quiet window (min sentinel above
    * the band). One hot pass out of three stays un-flagged: per-query
    * values are min-of-passes, so a single quiet window suffices. */
  private[graft] def sentinelContended(sentinels: Seq[Double],
      band: Double): Boolean =
    sentinels.nonEmpty && sentinels.min > band

  /** Wall-run disagreement max/min — 1.0 for clean agreement. Emitted
    * on the metric line so the driver artifact carries its own health
    * indicator (r10 verdict What's-wrong #3: a queue-inflated driver
    * run read as false 4-7x regressions to anyone trusting BENCH_rN
    * alone). round_report labels per-query deltas from a >1.5x noisy
    * run "inconclusive" instead of regressions. */
  private[graft] def noiseRatio(walls: Seq[Double]): Double =
    if (walls.isEmpty) 1.0
    else walls.max / math.max(walls.min, 1e-9)

  /** JSON string escaping — backslash FIRST, then quotes and control
    * chars. The old replaceAll("[\r\n\"]") left backslashes raw, so an
    * exception message containing a regex fragment or escaped path
    * produced a malformed metric line (ADVICE r06). */
  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  // Locale.ROOT: a comma-decimal default locale would make the JSON
  // line unparsable — the exact failure the short line exists to fix.
  private[graft] def s3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** The stdout metric line the driver tail-captures. Its size is
    * INDEPENDENT of suite count by construction (r10 verdict item 1:
    * the full 172-entry per-query map grew past the driver's
    * 2000-byte tail capture and BENCH_r10.json parsed null — the r04
    * failure mode recurring at a larger suite; short keys and
    * last-bare-line printing only bought headroom that growth spent).
    * Bounded content: suite total, query count, the `nSlow` slowest
    * per-query entries (short keys), noise_ratio, up to three wall
    * runs, up to `maxErrs` error entries (messages already truncated)
    * plus the total error count, and the sf dir. The full per-query
    * map lives in BENCH_LOCAL.json only. BenchLogicSpec replays the
    * driver's 2000-byte tail capture against a synthetic 500-query
    * registry so the overflow cannot regress by growth again. */
  private[graft] def metricLine(wall: Double, results: Map[String, Double],
      errs: Map[String, String], wallRuns: Seq[Double], burst: Boolean,
      sfDir: String, nSlow: Int = 5, maxErrs: Int = 3,
      sentinels: Seq[Double] = Nil, contended: Boolean = false,
      serial: Boolean = false): String = {
    val slowest = results.toSeq.sortBy { case (n, v) => (-v, n) }
      .take(nSlow)
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val errPart =
      if (errs.isEmpty) ""
      else {
        val shown = errs.toSeq.sortBy(_._1).take(maxErrs)
          .map { case (k, v) =>
            s"${jstr(k.takeWhile(_ != '_'))}:${jstr(v.take(160))}" }
          .mkString("{", ",", "}")
        s""","n_errors":${errs.size},"errors":$shown"""
      }
    s"""{"metric":"total","value":${s3(wall)},"unit":"sec","n_queries":${
      results.size},"slowest":$slowest,"noise_ratio":${
      s3(noiseRatio(wallRuns))},"wall_runs":[${
      wallRuns.take(3).map(s3).mkString(",")}]$errPart${
      if (burst) ""","burst":true""" else ""}${
      // bounded: at most 5 sentinel samples (3 passes + tie-break +
      // pre-tail) — the line's size stays suite-independent
      if (sentinels.nonEmpty) s""","sentinel_s":[${
        sentinels.take(5).map(s3).mkString(",")}]""" else ""}${
      if (contended) ""","contended":true""" else ""}${
      if (serial) ""","serial":true""" else ""},"sf":${jstr(sfDir)}}"""
  }

  /** The full-fidelity canonical artifact line (BENCH_LOCAL.json):
    * every per-query time under its full registry name, the isolated
    * re-measure list, walls, noise. This one may grow with the suite —
    * it is a file, not a tail capture. */
  private[graft] def localLine(wall: Double, results: Map[String, Double],
      errs: Map[String, String], wallRuns: Seq[Double], burst: Boolean,
      isolated: Set[String], sfDir: String,
      medians: Map[String, Double] = Map.empty,
      sentinels: Seq[Double] = Nil, contended: Boolean = false,
      serial: Boolean = false): String = {
    def qdict(m: Map[String, Double]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val errDict = errs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val isoList = isolated.toSeq.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    s"""{"metric":"total","value":${s3(wall)},"unit":"sec","n_queries":${
      results.size},"queries":${qdict(results)}${
      if (medians.nonEmpty)
        s""","queries_median":${qdict(medians)}""" else ""}${
      if (errs.nonEmpty) s""","errors":$errDict""" else ""},"noise_ratio":${
      s3(noiseRatio(wallRuns))},"wall_runs":[${
      wallRuns.map(s3).mkString(",")}]${
      if (isolated.nonEmpty) s""","isolated":$isoList""" else ""}${
      if (burst) ""","burst":true""" else ""}${
      if (sentinels.nonEmpty) s""","sentinel_s":[${
        sentinels.map(s3).mkString(",")}]""" else ""}${
      if (contended) ""","contended":true""" else ""}${
      if (serial) ""","serial":true""" else ""},"sf":${jstr(sfDir)}}"""
  }

  /** Per-query times from a bench artifact — STRUCTURAL, not a text
    * scrape: the artifact is parsed as JSON and only the values inside
    * objects NAMED "queries" or "slowest" count (ADVICE r11: the old
    * whole-text regex over the unescaped artifact could misread a
    * jstr-escaped free-text ERROR value that happened to contain a
    * "qN":number fragment as a baseline time). Driver BENCH_rN.json
    * artifacts carry those maps under "parsed", and additionally embed
    * the full metric line as the LAST bare JSON line of the "tail"
    * string — that line is parsed as JSON too (so a driver artifact
    * whose "parsed" is null still yields the slowest-5). A truncated
    * tail that is not valid JSON yields nothing, BY DESIGN: a
    * fragment's numbers can't be attributed safely. */
  private[graft] def parseBenchText(txt: String): Map[String, Double] = {
    import com.fasterxml.jackson.databind.JsonNode
    val name = """q[0-9]+[A-Za-z0-9_]*""".r
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // EXPLICIT precedence (ADVICE r12: the old single-map walk let
    // Jackson field-iteration order decide which of a tail-embedded
    // metric line and the driver's "parsed" object won on a
    // disagreement): tail-derived values go to their own map and the
    // structured "parsed"/"queries" values overwrite them at the end.
    def walk(node: JsonNode,
        out: scala.collection.mutable.Map[String, Double],
        tailOut: scala.collection.mutable.Map[String, Double]): Unit =
      if (node != null && node.isObject) {
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          e.getKey match {
            case "queries" | "slowest" if e.getValue.isObject =>
              val qs = e.getValue.fields()
              while (qs.hasNext) {
                val q = qs.next()
                if (q.getValue.isNumber &&
                    name.pattern.matcher(q.getKey).matches())
                  out(q.getKey) = q.getValue.asDouble()
              }
            case "tail" if e.getValue.isTextual =>
              // the metric line is the last bare JSON line of stdout;
              // its values land in tailOut (the weaker channel)
              e.getValue.asText().linesIterator.toSeq.reverseIterator
                .map(_.trim)
                .find(l => l.startsWith("{") && l.endsWith("}"))
                .foreach { l =>
                  try walk(mapper.readTree(l), tailOut, tailOut)
                  catch { case _: Throwable => () }
                }
            case _ if e.getValue.isObject =>
              walk(e.getValue, out, tailOut)
            case _ => ()
          }
        }
      }
    try {
      val out = scala.collection.mutable.Map.empty[String, Double]
      val tailOut = scala.collection.mutable.Map.empty[String, Double]
      walk(mapper.readTree(txt), out, tailOut)
      (tailOut ++ out).toMap // structured values win over the tail line
    } catch { case _: Throwable => Map.empty }
  }

  /** The canonical artifact (BENCH_LOCAL.json) seeds the next run's
    * scheduling and the round trend — refuse to overwrite it only when
    * NO two passes agree within 2x (r07: a burst-inflated artifact
    * published 47.6s for a 5.6s suite); then the previous seed stays.
    * When two of three walls agree, the median IS trustworthy, so the
    * run persists — carrying "burst":true so every consumer
    * (round_report's warning, trend readers) sees the outlier pass. A
    * blanket !burstSuspect refusal here made staleness the common
    * case: one bursty pass out of three kept a 92-query artifact alive
    * against a 93-query registry and silenced the very warning the
    * burst flag feeds. */
  private[graft] def shouldPersist(walls: Seq[Double]): Boolean =
    walls.size >= 2 &&
      walls.sorted.sliding(2).exists(p => p(1) <= 2.0 * p.head)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Each query runs in its own fair-scheduler pool: iterative
      // multi-job queries (connected components, prefix sum, index
      // lifecycle) submit many small jobs, and under FIFO each of those
      // waits behind whole-suite scans — r04 measured q66 at 22.6s
      // concurrent vs 5.9s isolated from exactly that. Fair pools
      // round-robin cores across in-flight queries instead.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: every fair-scheduler pool is created on first use
    // and logs a WARN per query (86 lines in r05) — enough to push the
    // metric line out of the driver's 2000-byte tail capture.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM once (Hadoop FS init, codegen/janino, parquet reader
    // classloading, the expensive first expression-keyed agg compile) so
    // per-query numbers measure the queries, not cold-start. Each step
    // warms independently: partial fixture dirs (scale_bench's skew
    // corpora are documents-only) must still get the documents/codegen
    // warm even though the lineitem read throws.
    def warm(step: => Unit): Unit =
      try step catch { case _: Throwable => () }
    {
      import org.apache.spark.sql.functions._
      warm(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count())
      warm(spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
        .groupBy(md5(lower(col("text")))).count().count())
      warm(spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
        .select(graft.functions.VectorFunctions
          .dot(col("embedding"), col("embedding")).as("d"))
        .agg(sum(col("d"))).count())
      // A 50-row index lifecycle warms the partitioned parquet writer,
      // the NearestCentroid codegen, and the broadcast anti-join
      // machinery — measured ~2.3s of one-time classload/compile that
      // otherwise lands on the first index query (q74).
      warm {
        val warmIdx = graft.TempDirs.scratch("graft-bench-warm-")
        val warmE = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
        graft.operators.Similarity.buildIvfIndex(
          warmE, "embedding", "vec_id", warmIdx, nLists = 2)
        graft.operators.Similarity.deleteFromIvfIndex(
          warmE.select(col("vec_id")).limit(5), "vec_id", warmIdx)
        // probe with a real row's vector so dimensions match the fixture
        // and the similarities are finite — an all-zero or wrong-width
        // query would only warm the path by accident
        val warmQ = warmE.select(col("embedding"))
          .head().getSeq[Float](0).toSeq
        graft.operators.Similarity.ivfProbe(
          spark, warmIdx, warmQ, k = 1, nProbes = 2).count()
      }
    }
    // Absolute-cost contention sentinel (r16 verdict item 1): a pinned
    // pure-compute probe — per-core-constant codegen'd work, so its
    // quiet cost is one number regardless of fixture dir (scale_bench's
    // synthetic sf1/skew dirs) or core count — timed in isolation
    // immediately before each pass and before the isolated tail. CPU
    // steal is exactly what it measures: a hypervisor co-tenant window
    // stretches this fixed workload by the steal share, where the
    // RELATIVE checks (noise_ratio, burst) read "clean" whenever the
    // whole run sits inside one sustained window (BENCH_r16: every
    // number ~8x inflated at noise_ratio 1.245).
    val sentinelBand = sys.env.get("SPARK_GRAFT_SENTINEL_BAND")
      .flatMap(_.toDoubleOption).getOrElse(2.0)
    def sentinelProbe(): Double = {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "sentinel")
      val t0 = System.nanoTime()
      // 160M rows/core of range+mod+sum: quiet cost measured
      // 0.55-0.72s warm on this host class (r17), independent of
      // fixture dir and ~flat in core count (per-core work is
      // constant). The 2.0s default band is ~3x headroom above quiet;
      // an r16-grade (~8x) steal window lands ~4.8s and trips it.
      // SPARK_GRAFT_SENTINEL_BAND re-pins for a different host.
      spark.range(160000000L * cpus.toInt)
        .selectExpr("sum(id % 7) as s").collect()
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      (System.nanoTime() - t0) / 1e9
    }
    // one unrecorded warm run so the first recorded sentinel measures
    // steady-state compute, not this expression's codegen compile
    sentinelProbe()
    // Throughput run (TPC-style): queries are independent, so run them
    // concurrently — driver-side planning overlaps executor work instead
    // of serializing ~0.5s of fixed latency per query. Per-query numbers
    // are wall times under that concurrency; "value" is the wall-clock
    // total for the whole suite.
    // SPARK_GRAFT_BENCH_ONLY=q14,q37 → isolated (still concurrent) subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    // Serial canonical mode (r17 verdict item 1): SPARK_GRAFT_BENCH_SERIAL=1
    // times each query ALONE (concurrency 1) on the warm JVM. The 8-way
    // concurrent wall stays the THROUGHPUT headline (BENCH_LOCAL.json),
    // but a per-query time taken under 8-way concurrency attributes queue
    // share to the query — 77 of 269 r17 cross-round flags were exactly
    // such artifacts while per-query best-case totals were flat. Three
    // sentinel-gated passes; per-query value = min across QUIET passes
    // (pre- AND post-pass sentinel inside the band — a 5-minute serial
    // pass needs BOTH ends probed, a single pre-probe can't see steal
    // arriving mid-pass); contended = no quiet pass existed, in which
    // case the min over all passes ships flagged. round_report reads
    // ONLY this basis (BENCH_SERIAL.json) for the cross-round per-query
    // table once both rounds carry it.
    if (sys.env.get("SPARK_GRAFT_BENCH_SERIAL").contains("1")) {
      val errs = scala.collection.concurrent.TrieMap.empty[String, String]
      val nPasses = math.max(2,
        sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(3))
      val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
      val names = selected.toSeq.sortBy(_._1)
      case class SerialPass(times: Map[String, Double], wall: Double,
          quiet: Boolean)
      val passes = (1 to nPasses).map { _ =>
        val pre = sentinelProbe(); sentinels += pre
        val t0 = System.nanoTime()
        val ts = names.map { case (name, fn) =>
          spark.sparkContext
            .setLocalProperty("spark.scheduler.pool", name)
          val q0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch {
            case e: Throwable => errs(name) = e.toString.take(160)
          }
          name -> (System.nanoTime() - q0) / 1e9
        }.toMap
        val wall = (System.nanoTime() - t0) / 1e9
        val post = sentinelProbe(); sentinels += post
        SerialPass(ts, wall,
          pre <= sentinelBand && post <= sentinelBand)
      }
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      val quietPasses = passes.filter(_.quiet)
      val contended = quietPasses.isEmpty
      if (contended)
        System.err.println("[bench] WARNING: serial run had NO quiet " +
          s"pass (sentinels ${sentinels.map(s3).mkString("/")}s, band " +
          s"${s3(sentinelBand)}s) — artifact flagged contended, " +
          "min-of-ALL-passes shipped")
      val basis = if (contended) passes else quietPasses
      val results = basis.flatMap(_.times.keySet).distinct.map { k =>
        k -> basis.flatMap(_.times.get(k)).min
      }.toMap
      // medians across ALL passes ride along for spread inspection;
      // the canonical serial basis is min-of-quiet-passes ("queries")
      val medians = passes.flatMap(_.times.keySet).distinct.map { k =>
        val vs = passes.flatMap(_.times.get(k)).sorted
        k -> (if (vs.size % 2 == 1) vs(vs.size / 2)
              else (vs(vs.size / 2 - 1) + vs(vs.size / 2)) / 2.0)
      }.toMap
      val wallRuns = passes.map(_.wall)
      val wall = representativeWall(wallRuns)
      val burst = burstSuspect(wallRuns)
      // Always persist on a full-suite sf0.1 run: unlike BENCH_LOCAL
      // this artifact seeds no scheduling, and round_report's baseline
      // is the COMMITTED copy (git HEAD), so a flagged-noisy worktree
      // write can be rejected at commit review instead of silently
      // replacing the seed.
      val line = localLine(wall, results, errs.toMap, wallRuns, burst,
        Set.empty, sfDir, medians, sentinels.toSeq, contended,
        serial = true)
      if (only.isEmpty && new java.io.File(sfDir).getName == "sf0.1")
        try java.nio.file.Files.write(
          java.nio.file.Paths.get("BENCH_SERIAL.json"),
          (line + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => () }
      sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
        try java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (line + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => () }
      }
      spark.stop()
      println(metricLine(wall, results, errs.toMap, wallRuns, burst,
        sfDir, sentinels = sentinels.toSeq, contended = contended,
        serial = true))
      System.out.flush()
      sys.exit(if (errs.nonEmpty) 1 else 0)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // Longest-job-first: submit the known-heavy queries before the
    // sub-second ones so the 8-slot pool isn't draining 50 cheap queries
    // while a 6s index build starts last and stretches the makespan.
    // Ranking comes from the PREVIOUS canonical run's per-query times
    // (BENCH_LOCAL.json) when present — a hardcoded list silently goes
    // stale as plans change (r06 verdict) — with the last measured
    // static ranking as the cold-start fallback.
    val staticHeavy = Seq("q81", "q74", "q66", "q53", "q30", "q31",
      "q70", "q32", "q58", "q72", "q15", "q04", "q05", "q08", "q59",
      "q33", "q63", "q87")
    // Best-known per-query time across BOTH the canonical artifact and
    // the newest driver-round artifact (BENCH_r*.json): the movers
    // rule below re-measures against the best known cost, so queue
    // inflation that crept into one artifact (e.g. the suite grew and
    // every mid-pack query picked up 8-way queue share) cannot hide a
    // mover from the other baseline.
    val prevTimes: Map[String, Double] = {
      def parse(path: java.nio.file.Path): Map[String, Double] =
        try {
          val ts = parseBenchText(java.nio.file.Files.readString(path))
          // a zero-entry artifact is a parse regression (the escaped-
          // tail silent no-op, ADVICE r10) — say so instead of quietly
          // merging nothing
          if (ts.isEmpty)
            System.err.println(s"[bench] warning: $path yielded zero " +
              "per-query entries — baseline merge skipped it")
          ts
        } catch { case _: Throwable => Map.empty }
      val local = parse(java.nio.file.Paths.get("BENCH_LOCAL.json"))
      val lastRound =
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.list(java.nio.file.Paths.get("."))
            .iterator().asScala
            .filter(_.getFileName.toString.matches("BENCH_r[0-9]+\\.json"))
            .toSeq.sortBy(_.getFileName.toString).lastOption
            .map(parse).getOrElse(Map.empty)
        } catch { case _: Throwable => Map.empty[String, Double] }
      // driver artifacts use short keys (q81) — match on the prefix.
      // Keys stay the canonical artifact's FULL names: the registry-
      // change check below compares this keySet against the live
      // registry, and short-only keys would falsely trip it.
      val lastByShort = lastRound.map { case (k, v) =>
        k.takeWhile(_ != '_') -> v }
      local.map { case (k, v) =>
        k -> math.min(v, lastByShort.getOrElse(k.takeWhile(_ != '_'), v))
      }
    }
    def rank(n: String): Double =
      if (prevTimes.nonEmpty)
        // negative time = longest first; a query with no prior
        // measurement (just added) is unknown — assume heavy-ish (2s)
        // so a new expensive query doesn't start last
        -prevTimes.getOrElse(n, 2.0)
      else {
        val i = staticHeavy.indexWhere(n.startsWith)
        (if (i < 0) staticHeavy.size else i).toDouble
      }
    // A crashing query must fail the bench, not record as a fast query:
    // collect errors and exit nonzero after emitting the artifact.
    val errs = scala.collection.concurrent.TrieMap.empty[String, String]
    def runSuite(): (Map[String, Double], Double) = {
      val tTotal = System.nanoTime()
      val futures = selected.toSeq.sortBy { case (n, _) => (rank(n), n) }
        .map { case (name, fn) =>
          scala.concurrent.Future {
            spark.sparkContext
              .setLocalProperty("spark.scheduler.pool", name)
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count() } catch {
              case e: Throwable => errs(name) = e.toString.take(160)
            }
            name -> (System.nanoTime() - t0) / 1e9
          }
        }
      val rs = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(30, "min")).toMap
      (rs, (System.nanoTime() - tTotal) / 1e9)
    }
    // Two passes, best-of kept per query: the host's hypervisor
    // co-tenant bursts inflate a whole pass 2-10x between IDENTICAL
    // runs (r07 measured walls of 165s and 11s for the same suite),
    // and one pass can't tell a burst from a regression. Best-of-2
    // was defeated in r07 when BOTH driver passes landed inside one
    // burst window (102s/47.6s for a 5.6s suite) — so when the two
    // walls disagree >2x, run a tie-break third pass and report the
    // median wall. Re-running is safe by construction — lifecycle
    // queries scratch fresh TempDirs — and later passes ride warm
    // codegen. Every wall is recorded in the artifact so the variance
    // is evidence, not something discarded.
    // Pass count: the CANONICAL artifact run (full suite at sf0.1)
    // takes 3 passes so the headline is a median, not a min-of-2
    // sample (r14 verdict item 1); subset and synthetic-dir runs
    // (scale_bench's sf1/sfmid/skew) keep 2 — their per-query numbers
    // are min-of-passes either way and a third full pass at sf1 costs
    // minutes. SPARK_GRAFT_BENCH_PASSES overrides.
    val defaultPasses =
      if (only.isEmpty && new java.io.File(sfDir).getName == "sf0.1") 3
      else 2
    val nPasses = math.max(2,
      sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt)
        .getOrElse(defaultPasses))
    val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    def timedPass(): (Map[String, Double], Double) = {
      sentinels += sentinelProbe()
      runSuite()
    }
    var passes: Seq[(Map[String, Double], Double)] =
      (1 to nPasses).map(_ => timedPass())
    if (burstSuspect(passes.map(_._2))) passes :+= timedPass()
    // contended = NO pass had a quiet window (min sentinel above band):
    // the r16 signature, where every relative check read clean
    val contended = sentinelContended(sentinels.toSeq, sentinelBand)
    if (contended)
      System.err.println(s"[bench] WARNING: host contended for the " +
        s"whole run (sentinels ${sentinels.map(s3).mkString("/")}s, " +
        s"band ${s3(sentinelBand)}s) — artifact flagged, timings " +
        "inflated by co-tenant steal")
    val allR = passes.map(_._1)
    val concurrent = allR.flatMap(_.keySet).distinct.map { k =>
      k -> allR.flatMap(_.get(k)).min
    }.toMap
    // Per-query MEDIAN across the passes (r15 verdict item 8): the
    // "queries" map keeps min-of-passes (the scheduling seed and the
    // optimistic cost), but cross-ROUND deltas compare medians — one
    // co-tenant burst window inflating a single pass stops reading as
    // a 2x mover (the r15 phantom q197 2.27x).
    // true median: average the two middle elements on an even pass
    // count (ADVICE r16: vs(size/2) is the UPPER element — with two
    // passes the "median" was the max, biasing cross-round median
    // deltas pessimistic relative to odd-pass runs)
    val concurrentMed = allR.flatMap(_.keySet).distinct.map { k =>
      val vs = allR.flatMap(_.get(k)).sorted
      k -> (if (vs.size % 2 == 1) vs(vs.size / 2)
            else (vs(vs.size / 2 - 1) + vs(vs.size / 2)) / 2.0)
    }.toMap
    val wallRuns = passes.map(_._2)
    val wall = representativeWall(wallRuns)
    val burst = burstSuspect(wallRuns)
    pool.shutdown()
    // Isolated re-measure of the heavy tail (r08 verdict item 4): a
    // per-query wall under 8-way concurrency attributes QUEUE time to
    // the query — r08's artifact said q81 18.9s where the isolated cost
    // was 3-7s, and every round-over-round "regression" read on the
    // tail was scheduling noise. The suite wall ("value") stays the
    // honest concurrent number; the slowest per-query entries are
    // re-measured one-at-a-time on the warm JVM and the artifact keeps
    // min(concurrent, isolated) — with the re-measured names recorded
    // under "isolated" so trend readers know which numbers changed
    // basis. Skipped for subset runs (those are near-isolated already).
    val isolateTail =
      only.isEmpty && sys.env.getOrElse("SPARK_GRAFT_ISOLATE_TAIL", "1") != "0"
    // Tail = the 10 slowest, PLUS any query whose concurrent wall moved
    // >2x vs the previous canonical artifact (r09 verdict: mid-pack
    // entries still embed 8-way queue time, so a queue-inflated 2.5s
    // next to last round's 1.0s reads as a regression when it isn't —
    // re-measuring exactly the movers kills the false read at the cost
    // of a few extra isolated runs).
    val tail: Seq[String] =
      if (!isolateTail) Seq.empty
      else {
        val slow = concurrent.toSeq.filter(_._2 >= 1.0).sortBy(-_._2)
          .take(10).map(_._1)
        val moved = concurrent.toSeq.filter { case (n, v) =>
          v >= 0.5 && prevTimes.get(n).exists(p => v > 2.0 * p) }
          .map(_._1)
        (slow ++ moved).distinct
      }
    // Refuse the isolated re-measure on a contended host (r16 verdict
    // item 1): an isolated number taken inside a steal window is NOT an
    // isolated cost — keep the concurrent numbers, warn, and let the
    // contended flag tell every consumer the basis never changed. A
    // fresh pre-tail sentinel guards the opposite case too: quiet
    // passes followed by a burst landing exactly on the tail re-run.
    val tailSentinel = if (tail.nonEmpty) Some(sentinelProbe()) else None
    val tailQuiet = !contended && tailSentinel.forall(_ <= sentinelBand)
    if (tail.nonEmpty && !tailQuiet)
      System.err.println(s"[bench] isolated-tail re-measure SKIPPED " +
        s"(contended=$contended, pre-tail sentinel " +
        s"${tailSentinel.map(s3).getOrElse("-")}s vs band " +
        s"${s3(sentinelBand)}s) — concurrent numbers kept")
    val allSentinels = sentinels.toSeq ++ tailSentinel
    val isolated = (if (tailQuiet) tail else Seq.empty[String])
      .flatMap { name =>
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
      val t0 = System.nanoTime()
      try {
        selected(name)(spark, sfDir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        // An isolated-rerun failure must not fail a bench whose
        // concurrent passes succeeded, and the failed run's partial
        // time must not join the min() below — keep the concurrent
        // number and warn. (A query that failed concurrently is
        // already in errs and fails the run regardless.)
        case e: Throwable =>
          System.err.println(s"[bench] isolated rerun of $name failed; " +
            s"keeping concurrent time: ${e.toString.take(160)}")
          None
      }
    }.toMap
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    val results = concurrent ++ isolated.map { case (k, v) =>
      k -> math.min(v, concurrent(k))
    }
    // medians get the same isolated-basis correction: queue time is
    // not noise to average in, it is a different measurement basis
    val resultsMed = concurrentMed ++ isolated.map { case (k, v) =>
      k -> math.min(v, concurrentMed(k))
    }
    // Only the canonical full-suite sf0.1 run owns the artifact —
    // subset runs (BENCH_ONLY) and scale_bench's synthetic-sf1 pass
    // must not clobber it. Match the directory NAME, not a hardcoded
    // absolute path, so a relocated testdata root still writes it.
    // A run whose walls never corroborate (no two passes within 2x)
    // keeps the previous seed instead of overwriting it — UNLESS the
    // query registry changed since that seed was written: a stale
    // artifact with yesterday's query set fails round_report's
    // coverage gate and hides new queries from the trend, which is
    // worse than one noisy-but-flagged measurement.
    if (only.isEmpty && new java.io.File(sfDir).getName == "sf0.1" &&
        (shouldPersist(wallRuns) || prevTimes.keySet != selected.keySet))
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (localLine(wall, results, errs.toMap, wallRuns, burst,
          isolated.keySet.toSet, sfDir, resultsMed,
          allSentinels, contended) + "\n")
          .getBytes("UTF-8"))
      catch { case _: Throwable => () }
    // Full-fidelity out-of-band channel for tooling (scale_bench reads
    // per-query times for the synthetic sf1/sfmid dirs, which never own
    // BENCH_LOCAL.json): the complete per-query line goes to a FILE the
    // caller names, because the stdout line is bounded by design.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (localLine(wall, results, errs.toMap, wallRuns, burst,
          isolated.keySet.toSet, sfDir, resultsMed,
          allSentinels, contended) + "\n")
          .getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    // Stop Spark BEFORE printing the metric: the driver parses the last
    // bare line of the tail, so nothing (executor shutdown logs, pool
    // teardown) may print after it. Paired with build.sbt's
    // StdoutOutput + showSuccess=false, this line ends the output.
    spark.stop()
    println(metricLine(wall, results, errs.toMap, wallRuns, burst, sfDir,
      sentinels = allSentinels, contended = contended))
    System.out.flush()
    if (errs.nonEmpty) sys.exit(1)
  }
}
