package graft

import org.scalatest.funsuite.AnyFunSuite

/** Burst arbitration for the bench artifact (no Spark needed): r07's
  * driver run published a 47.6s wall for a suite that runs in 5.6s
  * because BOTH best-of-2 passes landed inside one co-tenant burst
  * window. The rules under test: disagreeing passes trigger a
  * tie-break third run, the reported wall is the burst-resistant
  * median, and a still-disagreeing run never reseeds BENCH_LOCAL. */
class BenchLogicSpec extends AnyFunSuite {

  test("burstSuspect fires iff walls disagree by more than 2x") {
    assert(!Bench.burstSuspect(Seq(5.6, 7.5)))     // r07 judge reruns
    assert(!Bench.burstSuspect(Seq(5.6, 11.2)))    // exactly 2x: agree
    assert(Bench.burstSuspect(Seq(5.6, 47.6)))     // r07 driver run
    assert(Bench.burstSuspect(Seq(102.5, 47.6)))   // both inflated
    assert(!Bench.burstSuspect(Seq(5.6)))
    assert(!Bench.burstSuspect(Nil))
    assert(Bench.burstSuspect(Seq(0.0, 1.0)))      // degenerate floor
  }

  test("representativeWall: min of two passes, MEDIAN of three or " +
      "more (r14 verdict item 1: the min-of-2 headline was harness-" +
      "variance-bound and could not prove no-regression)") {
    assert(Bench.representativeWall(Seq(5.6, 7.5)) == 5.6)
    // one burst outlier among three: the median ignores it
    assert(Bench.representativeWall(Seq(5.6, 47.6, 5.9)) == 5.9)
    // two inflated, tie-break clean: median still 2x-honest vs clean
    assert(Bench.representativeWall(Seq(102.5, 47.6, 5.6)) == 47.6)
    // three AGREEING passes also report the median — the canonical
    // 3-pass run's headline is a median by convention, not a min
    assert(Bench.representativeWall(Seq(5.6, 6.1, 5.8)) == 5.8)
    assert(Bench.representativeWall(Nil) == 0.0)
  }

  test("stdout metric line survives the driver's 2000-byte tail capture " +
      "at ANY suite size (replay against a synthetic 500-query registry)") {
    // r04 and again r10: the per-query map on the stdout line grew past
    // the driver's last-2000-bytes capture and BENCH_rN.json parsed
    // null. The line is now bounded by construction; this replay pins
    // that growth can never regress it again.
    val results = (1 to 500)
      .map(i => f"q$i%03d_synthetic_query_with_a_long_name" -> i * 0.123)
      .toMap
    val errs = (1 to 40).map(i =>
      s"q$i${"_fail"}" -> ("boom: " + "x" * 300)).toMap
    val line = Bench.metricLine(123.456, results, errs,
      Seq(123.456, 130.0, 250.0), burst = false,
      "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1200, s"metric line is ${line.length} bytes")
    // the driver keeps only the LAST 2000 bytes of stdout and parses
    // the last bare line: simulate 10 KB of preceding log noise
    val stdout = ("[info] noise\n" * 700) + line + "\n"
    val tail = stdout.takeRight(2000)
    val lastLine = tail.split('\n').filter(_.contains("\"metric\"")).last
    assert(lastLine == line)
    // parse with javax-free brute force: the driver uses json.loads;
    // jackson-databind rides in on Spark's classpath
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(lastLine)
    assert(node.get("metric").asText == "total")
    assert(math.abs(node.get("value").asDouble - 123.456) < 1e-9)
    assert(node.get("n_queries").asInt == 500)
    assert(node.get("slowest").size == 5)
    // slowest-5 = q500..q496 at short keys
    assert(node.get("slowest").has("q500"))
    assert(node.get("noise_ratio").asDouble > 2.0) // 250/123.456
    assert(node.get("n_errors").asInt == 40)
    assert(node.get("errors").size == 3)
  }

  test("metric line stays bounded and valid with zero queries and " +
      "zero errors") {
    val line = Bench.metricLine(0.0, Map.empty, Map.empty, Seq(0.1, 0.1),
      burst = false, "/tmp/x")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line)
    assert(node.get("n_queries").asInt == 0)
    assert(!node.has("errors"))
  }

  test("localLine keeps the full per-query map under full names for " +
      "BENCH_LOCAL.json") {
    val line = Bench.localLine(10.0, Map("q01_full_name" -> 1.0,
      "q02_other" -> 2.0), Map.empty, Seq(10.0, 11.0), burst = false,
      Set("q02_other"), "/root/testdata/sf0.1")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line)
    assert(node.get("queries").has("q01_full_name"))
    assert(node.get("isolated").get(0).asText == "q02_other")
    assert(node.get("noise_ratio").asDouble < 1.2)
  }

  test("parseBenchText walks ONLY queries/slowest objects (clean " +
      "artifact, driver 'parsed' wrapper, and the tail's last bare " +
      "metric line) and never scrapes free text — an escaped error " +
      "message containing a \"qN\":number fragment is NOT a baseline " +
      "(ADVICE r11)") {
    val clean = """{"metric":"total","queries":{"q01_agg":1.5,"q102_x":2.25}}"""
    assert(Bench.parseBenchText(clean) ==
      Map("q01_agg" -> 1.5, "q102_x" -> 2.25))
    // the r11+ driver artifact shape: stack-trace noise in the tail,
    // the metric line as its last bare JSON line, and parsed.slowest
    val wrapper = """{"n":11,"rc":0,"tail":"at janino.Foo(bar:1)\n{\"metric\":\"total\",\"value\":28.8,\"slowest\":{\"q146\":6.248,\"q145\":5.814}}\n","parsed":{"metric":"total","slowest":{"q146":6.248,"q131":4.339}}}"""
    assert(Bench.parseBenchText(wrapper) ==
      Map("q146" -> 6.248, "q145" -> 5.814, "q131" -> 4.339))
    // adversarial: a jstr-escaped ERROR value carrying what LOOKS like
    // a per-query entry must yield nothing (the old regex misread it)
    val adversarial = """{"queries":{"q01_agg":1.5},"errors":{"q81_index":"timeout after \"q32\":5.558 while..."}}"""
    assert(Bench.parseBenchText(adversarial) == Map("q01_agg" -> 1.5))
    // a TRUNCATED tail (the r10 overflow shape) is not valid JSON —
    // zero entries by design, never a guess
    val truncated = """{"n":10,"rc":0,"tail":"0.686,\"q120\":0.182,\"q121\":0.399"}"""
    assert(Bench.parseBenchText(truncated).isEmpty)
    // non-JSON garbage parses to empty, not an exception
    assert(Bench.parseBenchText("not json at all").isEmpty)
  }

  test("parseBenchText precedence is EXPLICIT: when the tail's embedded " +
      "metric line and the structured 'parsed' object disagree on a " +
      "query's time (a rerun artifact), the structured value wins — " +
      "never Jackson field-iteration order (ADVICE r12)") {
    // q146 disagrees (tail says 9.999, parsed says 6.248); q145 only
    // in the tail; q131 only in parsed — both orderings of the two
    // top-level fields must yield the same map
    val tailFirst = """{"tail":"{\"slowest\":{\"q146\":9.999,\"q145\":5.814}}\n","parsed":{"slowest":{"q146":6.248,"q131":4.339}}}"""
    val parsedFirst = """{"parsed":{"slowest":{"q146":6.248,"q131":4.339}},"tail":"{\"slowest\":{\"q146\":9.999,\"q145\":5.814}}\n"}"""
    val want = Map("q146" -> 6.248, "q145" -> 5.814, "q131" -> 4.339)
    assert(Bench.parseBenchText(tailFirst) == want)
    assert(Bench.parseBenchText(parsedFirst) == want)
  }

  test("sentinelContended replays the r16 steal window: contended iff " +
      "NO pass had a quiet window (min sentinel above the band)") {
    // quiet host: every sentinel near the ~0.6s measured quiet cost
    assert(!Bench.sentinelContended(Seq(0.55, 0.72, 0.61), 2.0))
    // the BENCH_r16 shape: a sustained co-tenant window covering ALL
    // passes — every sentinel ~8x quiet, while noise_ratio (1.245)
    // and burst both read clean because the inflation was uniform
    assert(Bench.sentinelContended(Seq(2.9, 2.7, 3.1), 2.0))
    // one hot pass out of three: a quiet window existed, min-of-passes
    // per-query values are trustworthy — NOT contended (burst/noise
    // flags cover the disagreement)
    assert(!Bench.sentinelContended(Seq(2.9, 0.4, 3.1), 2.0))
    assert(!Bench.sentinelContended(Nil, 2.0))
    // exactly at the band: quiet (strict >)
    assert(!Bench.sentinelContended(Seq(2.0, 2.0), 2.0))
  }

  test("metric and local lines carry sentinel_s and the contended flag; " +
      "a quiet run carries sentinels but no flag") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val hot = Bench.metricLine(10.0, Map("q01_x" -> 1.0), Map.empty,
      Seq(10.0, 11.0), burst = false, "/root/testdata/sf0.1",
      sentinels = Seq(2.9, 2.7, 3.1), contended = true)
    val hn = om.readTree(hot)
    assert(hn.get("contended").asBoolean)
    assert(hn.get("sentinel_s").size == 3)
    assert(math.abs(hn.get("sentinel_s").get(0).asDouble - 2.9) < 1e-9)
    val quiet = Bench.metricLine(10.0, Map("q01_x" -> 1.0), Map.empty,
      Seq(10.0, 11.0), burst = false, "/root/testdata/sf0.1",
      sentinels = Seq(0.35, 0.41, 0.38), contended = false)
    val qn = om.readTree(quiet)
    assert(!qn.has("contended"))
    assert(qn.get("sentinel_s").size == 3)
    val local = Bench.localLine(10.0, Map("q01_x" -> 1.0), Map.empty,
      Seq(10.0, 11.0), burst = false, Set.empty, "/root/testdata/sf0.1",
      sentinels = Seq(2.9, 2.7, 3.1, 2.8), contended = true)
    val ln = om.readTree(local)
    assert(ln.get("contended").asBoolean)
    assert(ln.get("sentinel_s").size == 4) // 3 passes + pre-tail probe
    // metric line stays bounded: at most 5 sentinel samples survive
    val many = Bench.metricLine(1.0, Map.empty, Map.empty, Seq(1.0, 1.0),
      burst = false, "/tmp/x", sentinels = (1 to 9).map(_.toDouble),
      contended = false)
    assert(om.readTree(many).get("sentinel_s").size == 5)
  }

  test("serial-mode lines carry the serial flag so round_report can " +
      "tell the concurrency-1 basis from the 8-way concurrent one " +
      "(r17 verdict item 1)") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = Bench.metricLine(300.0, Map("q01_x" -> 1.0), Map.empty,
      Seq(300.0, 310.0, 305.0), burst = false, "/root/testdata/sf0.1",
      sentinels = Seq(0.6, 0.7), contended = false, serial = true)
    assert(om.readTree(m).get("serial").asBoolean)
    val l = Bench.localLine(300.0, Map("q01_x" -> 1.0), Map.empty,
      Seq(300.0, 310.0), burst = false, Set.empty,
      "/root/testdata/sf0.1", serial = true)
    assert(om.readTree(l).get("serial").asBoolean)
    // default stays flag-free: concurrent artifacts are unchanged
    val c = Bench.metricLine(10.0, Map("q01_x" -> 1.0), Map.empty,
      Seq(10.0), burst = false, "/tmp/x")
    assert(!om.readTree(c).has("serial"))
  }

  test("noiseRatio is max/min of the wall runs") {
    assert(Bench.noiseRatio(Seq(57.3, 70.5)) > 1.2)
    assert(Bench.noiseRatio(Seq(10.0, 10.0)) == 1.0)
    assert(Bench.noiseRatio(Nil) == 1.0)
  }

  test("shouldPersist refuses to reseed BENCH_LOCAL only when NO two " +
      "walls corroborate each other (within 2x)") {
    assert(Bench.shouldPersist(Seq(5.6, 7.5)))
    // two clean passes that disagree: can't tell which is real
    assert(!Bench.shouldPersist(Seq(5.6, 47.6)))
    // 2-of-3 agree: the median is trustworthy — persist (with the
    // burst flag set), else the artifact goes stale against the
    // registry and round_report's burst warning can never fire
    assert(Bench.shouldPersist(Seq(5.6, 5.9, 47.6)))
    assert(Bench.burstSuspect(Seq(5.6, 5.9, 47.6))) // …and flags it
    // three mutually incompatible walls: genuinely unusable
    assert(!Bench.shouldPersist(Seq(5.6, 13.0, 47.6)))
    assert(Bench.shouldPersist(Seq(5.6, 6.1, 5.8)))
    assert(!Bench.shouldPersist(Seq(5.6)))
    assert(!Bench.shouldPersist(Nil))
  }
}
