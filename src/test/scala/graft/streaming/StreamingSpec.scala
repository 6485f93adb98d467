package graft.streaming

import graft.SparkSuite
import graft.eventstore.EventStore
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streaming NDJSON ingest commits through the EventStore append " +
      "path with dense revisions") {
    val in = tempDir("ingest-in-")
    val ckpt = tempDir("ingest-ckpt-")
    val store = new EventStore(spark, tempDir("ingest-store-"))

    def line(u: String, s: String, id: String): String =
      s"""{"specversion":"1.0","id":"$id","source":"stream-test",""" +
        s""""type":"dev.graft.test","user_id":"$u","stream_id":"$s"}"""

    Files.write(Paths.get(in, "batch1.ndjson"),
      ((0 until 5).map(i => line("u1", "sA", s"a-$i")) ++
        (0 until 3).map(i => line("u1", "sB", s"b-$i")))
        .mkString("\n").getBytes)

    val q = Streams.startIngest(spark, store, in, ckpt)
    try {
      q.processAllAvailable()
      assert(store.revision("u1", "sA") == 5)
      assert(store.revision("u1", "sB") == 3)
      // second file continues revisions densely
      Files.write(Paths.get(in, "batch2.ndjson"),
        Seq(line("u1", "sA", "a-5")).mkString("\n").getBytes)
      q.processAllAvailable()
      assert(store.revision("u1", "sA") == 6)
      assert(store.query("u1", "sA", 5, 1).head.id == "a-5")
    } finally q.stop()
  }

  test("watermarked tumbling window over a file stream matches the " +
      "batch aggregate") {
    val dir = tempDir("win-in-")
    val rows = (0 until 120).map { i =>
      val ts = java.sql.Timestamp.valueOf(
        s"2024-01-01 0${i / 60}:${f"${i % 60}%02d"}:00")
      (ts, if (i % 2 == 0) "click" else "view", i.toDouble)
    }
    spark.createDataset(rows).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .parquet(dir)
    val agg = Streams.tumblingCounts(streamed, "ts", "10 minutes",
      "5 minutes", Seq("event_type"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select($"window.start".as("ws"), $"event_type", $"n_events")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val expected = spark.read.parquet(dir)
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"window.start", $"event_type", $"n")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("ingest preserves open extension attributes (openapi.yaml:86 " +
      "shape) and compaction collapses batch files losslessly") {
    val in = tempDir("ext-in-")
    val ckpt = tempDir("ext-ckpt-")
    val storeDir = tempDir("ext-store-")
    val store = new EventStore(spark, storeDir)
    // the reference's canonical example event, with extension attrs
    Files.write(Paths.get(in, "e.ndjson"),
      ("""{"specversion":"1.0","type":"com.github.pull_request.opened",""" +
        """"source":"https://github.com/cloudevents/spec/pull",""" +
        """"subject":"123","id":"A234-1234-1234",""" +
        """"time":"2018-04-05T17:31:00Z","comexampleextension1":"value",""" +
        """"comexampleothervalue":"5","datacontenttype":"text/xml",""" +
        """"data":"<much wow=\"xml\"/>","user_id":"u1","stream_id":"s1"}""")
        .getBytes)
    val q = Streams.startIngest(spark, store, in, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = store.get("u1", "s1", 0).get
    assert(got.extensions == Map("comexampleextension1" -> "value",
      "comexampleothervalue" -> "5"))
    assert(got.subject.contains("123"))
    assert(got.data.contains("<much wow=\"xml\"/>"))
    // pile up batches, then compact
    (1 until 6).foreach(i => store.append("u1", "s1",
      Seq(graft.eventstore.CloudEvent(id = s"c-$i", source = "t",
        `type` = "t"))))
    val before = store.query("u1", "s1", 0, 100)
    assert(store.compactStream("u1", "s1") == 6) // 6 files → 1
    assert(store.compactStream("u1", "s1") == 0) // idempotent
    assert(store.query("u1", "s1", 0, 100) == before)
    assert(store.revision("u1", "s1") == 6)
    // appends continue after compaction
    assert(store.append("u1", "s1", Seq(graft.eventstore.CloudEvent(
      id = "after", source = "t", `type` = "t"))) == 7)
  }

  test("flatMapGroupsWithState assigns dense revisions across " +
      "micro-batches per stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.WireEvent]
    val revisioned = Streams.streamingRevisions(input.toDS())
    val q = revisioned.writeStream.outputMode("append")
      .format("memory").queryName("rev_out").start()
    def ev(u: String, s: String, id: String, minute: Int) =
      Streams.WireEvent(u, s, id, "mem", "t",
        java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"))
    try {
      input.addData(ev("u1", "a", "e0", 0), ev("u1", "a", "e1", 1),
        ev("u1", "b", "x0", 0))
      q.processAllAvailable()
      input.addData(ev("u1", "a", "e2", 2), ev("u1", "b", "x1", 3))
      q.processAllAvailable()
      val got = spark.table("rev_out")
        .select($"stream_id", $"revision", $"id")
        .as[(String, Long, String)].collect().toSet
      assert(got == Set(
        ("a", 0L, "e0"), ("a", 1L, "e1"), ("a", 2L, "e2"),
        ("b", 0L, "x0"), ("b", 1L, "x1")))
    } finally q.stop()
  }

  test("streaming exact dedup drops re-delivered fingerprints across " +
      "micro-batches, keeps distinct content, and bounds state by the " +
      "watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = Streams.dedupExact(
      input.toDF().toDF("fp", "ts"), "ts", "10 minutes", Seq("fp"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(("doc-a", ts(0)), ("doc-b", ts(1)), ("doc-a", ts(2)))
      q.processAllAvailable()
      // re-delivery in a later batch, still within the watermark
      input.addData(("doc-a", ts(3)), ("doc-c", ts(4)))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select($"fp").as[String]
        .collect().sorted.toSeq
      assert(got == Seq("doc-a", "doc-b", "doc-c"))
      // state is keyed+bounded: the dedup operator reports rows in state
      val prog = q.lastProgress
      val stateRows = prog.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3, s"state must hold only live fingerprints")
    } finally q.stop()
  }

  test("streaming near-dup flags match the batch LSH operator across " +
      "micro-batches: later near-dups flag against the first-seen doc, " +
      "fresh docs flag clean") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again until the corpus repeats itself entirely"
    val nearDup = base.replace("lazy", "sleepy") // high shingle overlap
    val fresh = "completely different content with no shared shingles " +
      "anywhere in this sentence of unrelated words altogether"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val flags = Streams.nearDupFlags(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", watermark = "10 minutes")
    val q = flags.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      input.addData((1L, base, ts(0)), (2L, fresh, ts(1)))
      q.processAllAvailable()
      input.addData((3L, nearDup, ts(2))) // cross-batch near-dup of 1
      q.processAllAvailable()
      val f = spark.table("neardup_out")
        .as[Streams.NearDupFlag].collect().toSeq
      def dupOf(id: Long) =
        f.filter(x => x.id == id && x.firstId != id).map(_.firstId).toSet
      assert(dupOf(1) == Set())            // first in = clean
      assert(dupOf(2) == Set())            // fresh content = clean
      assert(dupOf(3) == Set(1L), s"$f")   // flags against doc 1's state
      // survivors helper: per-batch fold keeps exactly the non-dups
      val surv = Streams.nearDupSurvivors(spark.table("neardup_out"))
        .as[Long].collect().toSet
      assert(surv == Set(1L, 2L))
      // agreement with the batch operator at the same parameters: the
      // (1,3) pair is exactly what minhashLshPairs emits on this corpus
      val batchPairs = graft.operators.Dedup.minhashLshPairs(
        Seq((1L, base), (2L, fresh), (3L, nearDup)).toDF("doc_id", "text"),
        "text", "doc_id", minJaccard = 0.3)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(batchPairs == Set((1L, 3L)))
    } finally q.stop()
  }

  test("binary payloads (data_base64) survive the NDJSON wire byte-exact " +
      "(openapi.yaml:81-86 CloudEvents schema)") {
    val in = tempDir("b64-in-")
    val ckpt = tempDir("b64-ckpt-")
    val store = new EventStore(spark, tempDir("b64-store-"))
    val payload = Array.tabulate[Byte](256)(i => i.toByte)
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    Files.write(Paths.get(in, "bin.ndjson"),
      (s"""{"specversion":"1.0","id":"bin-1","source":"wire",""" +
        s""""type":"t","datacontenttype":"application/octet-stream",""" +
        s""""data_base64":"$b64","user_id":"u1","stream_id":"s1"}""")
        .getBytes)
    val q = Streams.startIngest(spark, store, in, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = store.get("u1", "s1", 0).get
    assert(got.data_base64.exists(_.sameElements(payload)))
    assert(got.data.isEmpty)
    assert(got.datacontenttype.contains("application/octet-stream"))
  }

  test("malformed lines and events without routing identity go to the " +
      "dead-letter directory; the query and good events survive") {
    val in = tempDir("dlq-in-")
    val ckpt = tempDir("dlq-ckpt-")
    val dlq = tempDir("dlq-out-") + "/dead"
    val store = new EventStore(spark, tempDir("dlq-store-"))
    Files.write(Paths.get(in, "mixed.ndjson"), Seq(
      """{"specversion":"1.0","id":"ok-1","source":"s","type":"t","user_id":"u1","stream_id":"s1"}""",
      """this is not json at all {{{""",
      """{"specversion":"1.0","id":"no-stream","source":"s","type":"t","user_id":"u1"}""",
      """{"specversion":"1.0","id":"ok-2","source":"s","type":"t","user_id":"u1","stream_id":"s1"}"""
    ).mkString("\n").getBytes)
    val q = Streams.startIngest(spark, store, in, ckpt, Some(dlq))
    try q.processAllAvailable() finally q.stop()
    assert(store.revision("u1", "s1") == 2)
    assert(store.query("u1", "s1", 0, 10).map(_.id).toSet ==
      Set("ok-1", "ok-2"))
    val dead = spark.read.text(dlq).collect().map(_.getString(0)).toSet
    assert(dead.exists(_.contains("not json at all")))
    assert(dead.exists(_.contains("no-stream")))
    assert(dead.size == 2)
  }

  test("ingest keeps event bytes on executors: driver task results stay " +
      "metadata-sized while megabytes of payload are committed") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val store = new EventStore(spark, tempDir("dist-store-"))
    val big = "x" * (1 << 20) // 1 MiB per event
    val wire = (0 until 16).map { i =>
      (s"u1", s"stream-${i % 4}", s"big-$i", "bulk", "t", big)
    }
    val batch = spark.createDataset(wire)
      .toDF("user_id", "stream_id", "id", "source", "type", "data")
      .withColumn("specversion", lit("1.0"))
      .withColumn("subject", lit(null: String))
      .withColumn("time", lit(null).cast("timestamp"))
      .withColumn("datacontenttype", lit(null: String))
      .withColumn("dataschema", lit(null: String))
      .withColumn("data_base64", lit(null).cast("binary"))
      .withColumn("extensions",
        map().cast("map<string,string>"))
    val resultBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          resultBytes.addAndGet(t.taskMetrics.resultSize)
    }
    spark.sparkContext.addSparkListener(listener)
    val committed =
      try store.ingestBatch(batch)
      finally {
        // drain the async listener bus before reading the counter
        var last = -1L; var stable = 0
        val deadline = System.currentTimeMillis() + 10000
        while (stable < 3 && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          val now = resultBytes.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(committed == 16)
    // 16 MiB of payload committed; driver saw well under 1/4 of it
    assert(resultBytes.get() < (4L << 20),
      s"driver-bound task results too large: ${resultBytes.get()} bytes")
    (0 until 4).foreach { s =>
      assert(store.revision("u1", s"stream-$s") == 4)
      assert(store.query("u1", s"stream-$s", 0, 10)
        .forall(_.data.contains(big)))
    }
  }

  test("auto-compaction bounds per-stream file count under sustained " +
      "ingest (small-file pressure)") {
    val root = tempDir("autocompact-store-")
    val store = new EventStore(spark, root)
    def batchDF(id: String) =
      spark.createDataset(Seq(("u1", "s1", id, "ac", "t")))
        .toDF("user_id", "stream_id", "id", "source", "type")
        .withColumn("specversion", lit("1.0"))
        .withColumn("subject", lit(null: String))
        .withColumn("time", lit(null).cast("timestamp"))
        .withColumn("datacontenttype", lit(null: String))
        .withColumn("dataschema", lit(null: String))
        .withColumn("data", lit(null: String))
        .withColumn("data_base64", lit(null).cast("binary"))
        .withColumn("extensions", map().cast("map<string,string>"))
    (0 until 12).foreach(i =>
      store.ingestBatch(batchDF(s"e-$i"), autoCompactAfter = 4))
    assert(store.revision("u1", "s1") == 12)
    assert(store.query("u1", "s1", 0, 100).map(_.id) ==
      (0 until 12).map(i => s"e-$i"))
    // the stream reads back from a bounded number of live files
    assert(store.streams("u1").head.revision == 12)
    val live = store.readStream("u1", "s1").inputFiles.length
    assert(live <= 4, s"expected <=4 live files, got $live")
  }

  test("re-delivered micro-batches converge to exactly-once through " +
      "ingestBatch (foreachBatch at-least-once retry semantics)") {
    val store = new EventStore(spark, tempDir("redeliver-store-"))
    def batchDF(ids: Seq[String]) =
      spark.createDataset(ids.map(id => ("u1", "s1", id, "retry", "t")))
        .toDF("user_id", "stream_id", "id", "source", "type")
        .withColumn("specversion", lit("1.0"))
        .withColumn("subject", lit(null: String))
        .withColumn("time", lit(null).cast("timestamp"))
        .withColumn("datacontenttype", lit(null: String))
        .withColumn("dataschema", lit(null: String))
        .withColumn("data", lit(null: String))
        .withColumn("data_base64", lit(null).cast("binary"))
        .withColumn("extensions", map().cast("map<string,string>"))
    assert(store.ingestBatch(batchDF(Seq("a", "b", "c"))) == 3)
    // full re-delivery: nothing new lands
    assert(store.ingestBatch(batchDF(Seq("a", "b", "c"))) == 0)
    // straddling retry: only the genuinely new event commits
    assert(store.ingestBatch(batchDF(Seq("c", "d"))) == 1)
    assert(store.revision("u1", "s1") == 4)
    assert(store.query("u1", "s1", 0, 10).map(_.id) ==
      Seq("a", "b", "c", "d"))
  }

  test("stream-stream interval join correlates events within the window " +
      "and drops those outside it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = Streams.intervalJoin(
      clicks.toDS().toDF("user_id", "click_ts"),
      buys.toDS().toDF("user_id", "buy_ts"),
      key = "user_id", leftTs = "click_ts", rightTs = "buy_ts",
      within = "10 MINUTES", watermark = "1 minute")
      .select(col("l.user_id"), col("click_ts"), col("buy_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(5)))
      buys.addData((1L, ts(4)), (1L, ts(20)), (2L, ts(6)), (3L, ts(1)))
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select($"user_id", $"buy_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSet
      // user 1: buy@4 within 10min of click@0; buy@20 outside. user 2:
      // buy@6 within of click@5. user 3: no click.
      assert(got == Set((1L, ts(4)), (2L, ts(6))))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched left rows null-padded " +
      "once the watermark proves no match can arrive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = Streams.intervalJoinLeftOuter(
      clicks.toDS().toDF("user_id", "click_ts"),
      buys.toDS().toDF("user_id", "buy_ts"),
      key = "user_id", leftTs = "click_ts", rightTs = "buy_ts",
      within = "10 MINUTES", watermark = "1 minute")
      .select(col("l.user_id"), col("click_ts"), col("buy_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(5)))
      buys.addData((1L, ts(4)))
      q.processAllAvailable()
      // push both watermarks far past click@5 + 10min so user 2's
      // no-match outcome becomes final and the outer row emits
      clicks.addData((9L, ts(40)))
      buys.addData((9L, ts(41)))
      q.processAllAvailable()
      clicks.addData((9L, ts(55)))
      buys.addData((9L, ts(56)))
      q.processAllAvailable()
      val got = spark.table("ssj_outer")
        .select($"user_id", $"buy_ts")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1))))
        .toSet
      assert(got.contains((1L, Some(ts(4))))) // matched pair
      assert(got.contains((2L, None)), // unmatched left, null-padded
        s"outer row missing: $got")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups re-delivered events with " +
      "bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val in = MemoryStream[(String, String, java.sql.Timestamp)]
    val deduped = Streams.dedupWithinWatermark(
      in.toDS().toDF("source", "id", "ts"),
      tsCol = "ts", watermark = "10 minutes", keys = Seq("source", "id"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData(("s", "a", ts(0)), ("s", "a", ts(1)), ("s", "b", ts(2)))
      q.processAllAvailable()
      in.addData(("s", "a", ts(3))) // still within watermark → dropped
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select($"id").as[String].collect().toSeq.sorted
      assert(got == Seq("a", "b"))
    } finally q.stop()
  }

  test("end-to-end fixture ingest: the whole events table commits " +
      "through ingestBatch with per-stream dense revisions") {
    val store = new EventStore(spark, tempDir("fixture-ingest-"))
    val events = graft.Tables.events(spark, sfDir)
    val batch = events.select(
      concat(lit("user-"), $"user_id").as("user_id"),
      $"event_type".as("stream_id"),
      concat(lit("evt-"), $"event_id").as("id"),
      lit("fixture").as("source"),
      $"event_type".as("type"),
      lit("1.0").as("specversion"),
      lit(null).cast("string").as("subject"),
      $"ts".as("time"),
      lit(null).cast("string").as("datacontenttype"),
      lit(null).cast("string").as("dataschema"),
      $"props".as("data"),
      lit(null).cast("binary").as("data_base64"),
      map().cast("map<string,string>").as("extensions"))
    val n = batch.count()
    val t0 = System.nanoTime()
    val committed = store.ingestBatch(batch)
    val dt = (System.nanoTime() - t0) / 1e9
    assert(committed == n)
    val streams = events
      .select(concat(lit("user-"), $"user_id").as("u"), $"event_type")
      .distinct().count()
    info(f"ingested $n events across $streams streams in $dt%.1fs " +
      f"(${n / dt}%.0f events/s)")
    // spot-check one stream: revision == its event count, events ordered
    val (u0, t0e, c0) = events.groupBy($"user_id", $"event_type")
      .count().orderBy($"count".desc)
      .as[(Long, String, Long)].head()
    assert(store.revision(s"user-$u0", t0e) == c0)
    val got = store.readStream(s"user-$u0", t0e)
    assert(got.count() == c0)
    // revisions dense and time-ordered within the stream
    import org.apache.spark.sql.expressions.Window
    val misordered = got.withColumn("prev_time",
        lag($"time", 1).over(Window.orderBy($"revision")))
      .filter($"prev_time" > $"time").count()
    assert(misordered == 0)
  }

  test("session window groups events by inactivity gap") {
    val dir = tempDir("sess-in-")
    // two sessions for one user: 3 events 1 min apart, 40-min gap, 2 more
    val ts = Seq(0, 1, 2, 42, 43).map(m =>
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"))
    spark.createDataset(ts.map(t => (t, "u1", 1.0)))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .parquet(dir)
    val agg = Streams.sessionCounts(streamed, "ts", "30 minutes",
      "5 minutes", Seq("event_type"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val counts = spark.table("sess_out")
        .select($"n_events").as[Long].collect().sorted.toSeq
      assert(counts == Seq(2L, 3L))
    } finally q.stop()
  }

  test("streaming webClean (stripHtml + cleanLines + outlink canon) " +
      "matches the batch plan row-for-row across micro-batches — " +
      "stateless append mode, no watermark needed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pages = Seq(
      (1L, "<html><body><p>real prose with many words here</p>" +
        "<p>short</p><div>please enable JavaScript to view</div>" +
        "<a href=\"HTTPS://EX.ORG:443/a?utm_source=x\">l</a></body></html>"),
      (2L, "<p>We use cookies on this site okay</p><p>actual content " +
        "paragraph long enough to survive</p>" +
        "<a href='https://ex.org/b#frag'>m</a>"),
      (3L, "<script>var x = 1;</script><p>&amp; escaped entity text " +
        "kept here</p>"))
    val input = MemoryStream[(Long, String)]
    val q = Streams.webClean(input.toDF().toDF("doc_id", "html"),
        "doc_id", "html")
      .writeStream.outputMode("append")
      .format("memory").queryName("webclean_out").start()
    try {
      input.addData(pages.take(1): _*)
      q.processAllAvailable()
      input.addData(pages.drop(1): _*) // later micro-batch, same plan
      q.processAllAvailable()
      val got = spark.table("webclean_out")
        .as[(Long, String, Seq[String])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = Streams.webClean(pages.toDF("doc_id", "html"),
          "doc_id", "html")
        .as[(Long, String, Seq[String])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == batch) // stream == batch, bit-for-bit
      // the cleaning semantics themselves
      assert(got(1L) == (("real prose with many words here",
        Seq("https://ex.org/a"))))
      assert(got(2L) ==
        (("actual content paragraph long enough to survive",
          Seq("https://ex.org/b"))))
      assert(got(3L) == (("& escaped entity text kept here", Seq())))
    } finally q.stop()
  }

  test("streaming BPE apply (tokenize-on-ingest) matches the batch " +
      "operator row-for-row — stateless append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val merges = Seq("e" -> "r", "o" -> "r", "s" -> "t",
      "or" -> "t", "er" -> "g", "t" -> "h")
    val docs = Seq((1L, "order sort stream"), (2L, "merge the fast"),
      (3L, "a"))
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Bpe.applyMerges(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", merges)
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_out").start()
    try {
      input.addData(docs.take(1): _*)
      q.processAllAvailable()
      input.addData(docs.drop(1): _*)
      q.processAllAvailable()
      val got = spark.table("bpe_out")
        .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
      val batch = graft.operators.Bpe.applyMerges(
          docs.toDF("doc_id", "text"), "doc_id", "text", merges)
        .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
      assert(got == batch)
      assert(got(1L)._2 == "or d er | s ort | st r e a m")
    } finally q.stop()
  }

  test("streaming count-min matrix (complete mode) converges to the " +
      "batch sketch — the one-pass bounded-state frequency summary") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val toks = Seq("a", "b", "a", "c", "a", "b", "d", "a")
    val input = MemoryStream[String]
    val q = graft.operators.Sketch.countMinMatrix(
        input.toDF().toDF("token"), "token", d = 3, w = 16)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_out").start()
    try {
      input.addData(toks.take(3): _*)
      q.processAllAvailable()
      input.addData(toks.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("cms_out")
        .as[(Int, Int, Long)].collect().toSet
      val batch = graft.operators.Sketch.countMinMatrix(
          toks.toDF("token"), "token", d = 3, w = 16)
        .as[(Int, Int, Long)].collect().toSet
      assert(got == batch)
      // fold, not Set.map(...).sum — mapping a Set dedups equal counts
      assert(batch.foldLeft(0L)(_ + _._3) == 3L * toks.size)
    } finally q.stop()
  }

  test("streaming dictionary tagging (tag-on-ingest) matches the " +
      "batch tagger — the Aho-Corasick expression is a stateless " +
      "projection, so the automaton rides micro-batches unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dict = Seq("agg", "agg row", "hash join", "spark")
    val docs = Seq((1L, "the agg row scan"), (2L, "a hash join under spark"),
      (3L, "nothing here"))
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Tagger.tagDocs(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", dict)
      .writeStream.outputMode("append")
      .format("memory").queryName("tag_out").start()
    try {
      input.addData(docs.take(1): _*)
      q.processAllAvailable()
      input.addData(docs.drop(1): _*)
      q.processAllAvailable()
      val got = spark.table("tag_out")
        .as[(Long, Long, String)].collect().toSet
      val batch = graft.operators.Tagger.tagDocs(
          docs.toDF("doc_id", "text"), "doc_id", "text", dict)
        .as[(Long, Long, String)].collect().toSet
      assert(got == batch)
      assert(got == Set((1L, 0L, "agg"), (1L, 1L, "agg row"),
        (2L, 2L, "hash join"), (2L, 3L, "spark")))
    } finally q.stop()
  }

  test("streaming record linkage (link-on-ingest): foreachBatch over " +
      "Linkage.scorePairsIncremental, union of micro-batch outputs == " +
      "one batch run over the whole delta — pair scores are per-row " +
      "and blocking is registry-side, so the kernel is micro-batch " +
      "decomposable") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Linkage
    val fields = Seq(Linkage.FieldRule("name", 10L, -5L),
      Linkage.FieldRule("seg", 4L, -2L))
    val registry = Seq(
      (1L, "ann lee", "paris", "auto"),
      (2L, "bo chen", "paris", "bike"),
      (3L, "cy dole", "tokyo", "auto")
    ).toDF("rid", "name", "city", "seg")
    def link(delta: org.apache.spark.sql.DataFrame) =
      Linkage.scorePairsIncremental(registry, delta, "rid", "did",
        blockCols = Seq("city"), fields, minScore = 5L, tMatch = 14L)
    val delta = Seq(
      (10L, "ann lee", "paris", "auto"),   // exact: 14 -> match
      (11L, "ann lee", "paris", "moto"),   // name only: 8 -> possible
      (12L, "bo chen", "osaka", "bike"),   // wrong block: no candidate
      (13L, "cy dole", "tokyo", "auto"))   // exact: 14 -> match
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, String)]
    val input = MemoryStream[(Long, String, String, String)]
    val q = input.toDF().toDF("did", "name", "city", "seg")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = link(batch)
          .as[(Long, Long, Long, Long, String)].collect()
        out.synchronized { out ++= rows }; ()
      }.start()
    try {
      input.addData(delta.take(2): _*)
      q.processAllAvailable()
      input.addData(delta.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val batchRun = link(delta.toDF("did", "name", "city", "seg"))
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(out.toSet == batchRun)
    assert(out.toSet == Set(
      (1L, 10L, 2L, 14L, "match"),
      (1L, 11L, 1L, 8L, "possible"),
      (3L, 13L, 2L, 14L, "match")))
  }

  test("streaming CUSUM drift detection matches the fixed-allowance " +
      "batch operator row-for-row across a 3-micro-batch replay: the " +
      "sequential recurrence, gap draining, and the batch prefix-scan " +
      "identity are the same function") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = graft.Tables.events(spark, sfDir)
      .select($"event_type", $"ts")
      .as[(String, java.sql.Timestamp)].collect()
    // plant a sustained shift (the q217 gate's discipline — the
    // fixture's Poisson traffic never sustains): events in one 2-day
    // window replicated x3 more, in BOTH the stream and the batch side
    val lo = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-17 00:00:00")
    val rows = (base ++ base.filter(r =>
        !r._2.before(lo) && r._2.before(hi))
      .flatMap(r => Seq(r, r, r))).sortBy(_._2.getTime)
    val third = rows.length / 3
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val flags = Streams.cusumFlags(
      input.toDF().toDF("event_type", "ts"), "event_type", "ts",
      watermark = "1 minute", allowance = 3, threshold = 3)
    val q = flags.writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    try {
      input.addData(rows.take(third).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(rows.slice(third, 2 * third).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(rows.drop(2 * third).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(("__flush",
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("cusum_out")
        .filter($"key" =!= "__flush")
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
      val expected = graft.operators.Anomaly.cusumFlagsFixed(
          rows.toSeq.toDF("event_type", "ts"), "event_type", "ts",
          allowance = 3, threshold = 3)
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
      assert(got == expected,
        s"stream-batch diff: ${(got diff expected).take(3)} / " +
          s"${(expected diff got).take(3)}")
      assert(got.exists(_._6) && got.exists(!_._6),
        "planted shift should alarm and quiet hours should not")
    } finally q.stop()
  }

  test("streaming theta/KMV distinct estimation matches the batch " +
      "sketch at EVERY micro-batch prefix (the thetaMerge mergeability " +
      "property applied to (state, batch)): same hashes, same theta, " +
      "same integral-division estimate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.Tables.documents(spark, sfDir)
      .select($"lang", explode(
        graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .as[(String, String)].collect().toSeq
    val third = rows.length / 3
    val batches = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third))
    val k = 16 // small k so saturation happens inside the replay
    val input = MemoryStream[(String, String)]
    val est = Streams.thetaDistinct(
      input.toDF().toDF("lang", "tok"), "lang", "tok", k)
    val q = est.writeStream.outputMode("update")
      .format("memory").queryName("theta_out").start()
    try {
      var seen = 0L
      var prefix = Seq.empty[(String, String)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        prefix ++= b
        // emissions of THIS batch = rows appended to the update sink
        val all = spark.table("theta_out")
          .as[(String, Long, Long, Long)].collect()
        val emitted = all.drop(seen.toInt).map(r => r._1 -> r).toMap
        seen = all.length.toLong
        val expected = graft.operators.Sketch.thetaEstimate(
            graft.operators.Sketch.thetaSketch(
              prefix.toDF("lang", "tok"), "lang", "tok", k), k)
          .select($"grp", $"n_retained", $"theta_h", $"est")
          .as[(String, Long, Long, Long)].collect()
          .map(r => r._1 -> r).toMap
        // every group touched by the batch re-emitted, and every
        // emission equals the batch sketch over the stream's prefix
        val touched = b.map(_._1).toSet
        assert(touched.subsetOf(emitted.keySet),
          s"groups $touched expected emissions, got ${emitted.keySet}")
        emitted.foreach { case (g, got) =>
          assert(got == expected(g),
            s"prefix mismatch for $g: stream $got vs batch ${expected(g)}")
        }
      }
      // saturation actually exercised: the vocabulary exceeds k
      val fin = spark.table("theta_out")
        .as[(String, Long, Long, Long)].collect().last
      assert(fin._2 == k.toLong, s"fixture never saturated k=$k: $fin")
    } finally q.stop()
  }

  test("streaming theta SET OPS over two keyed streams match the " +
      "batch thetaSetOpPairs at EVERY prefix: same theta, same " +
      "below-theta counts, same inclusion-exclusion estimates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 16
    // two groups, known overlap, shuffled deterministically so batches
    // interleave the key space; every batch touches both streams
    def keys(g: String, lo: Int, hi: Int) =
      (lo until hi).map(i => (g, s"k-${(i * 37) % 1000}-$i"))
    val aRows = keys("g1", 0, 90) ++ keys("g2", 0, 45)
    val bRows = keys("g1", 60, 150) ++ keys("g2", 30, 75)
    // round-robin split so EVERY batch touches both groups on both
    // streams (grouped() would make batch 0 all-g1)
    def split3(rows: Seq[(String, String)]) = (0 until 3).map(i =>
      rows.zipWithIndex.filter(_._2 % 3 == i).map(_._1))
    val aBatches = split3(aRows)
    val bBatches = split3(bRows)
    val inA = MemoryStream[(String, String)]
    val inB = MemoryStream[(String, String)]
    val est = Streams.thetaSetOps(inA.toDF().toDF("g", "key"),
      inB.toDF().toDF("g", "key"), "g", "key", k)
    val q = est.writeStream.outputMode("update")
      .format("memory").queryName("theta_setops_out").start()
    try {
      var seen = 0L
      var prefA = Seq.empty[(String, String)]
      var prefB = Seq.empty[(String, String)]
      for (i <- 0 until 3) {
        inA.addData(aBatches(i): _*)
        inB.addData(bBatches(i): _*)
        q.processAllAvailable()
        prefA ++= aBatches(i)
        prefB ++= bBatches(i)
        val all = spark.table("theta_setops_out")
          .as[(String, Long, Long, Long, Long, Long, Long, Long, Long,
            Long)].collect()
        val emitted = all.drop(seen.toInt).map(r => r._1 -> r).toMap
        seen = all.length.toLong
        // batch twin: one sketch with side-tagged groups, pairs
        // restricted to (g#a, g#b) of the same logical group
        val tagged = prefA.map { case (g, kk) => (s"$g#a", kk) } ++
          prefB.map { case (g, kk) => (s"$g#b", kk) }
        val expected = graft.operators.Sketch.thetaSetOpPairs(
            graft.operators.Sketch.thetaSketch(
              tagged.toDF("g", "key"), "g", "key", k), k)
          .filter(expr("substring(grp_a, 1, length(grp_a) - 2) = " +
            "substring(grp_b, 1, length(grp_b) - 2)") &&
            col("grp_a").endsWith("#a") && col("grp_b").endsWith("#b"))
          .select(expr("substring(grp_a, 1, length(grp_a) - 2)")
              .as("g"), col("theta_h"), col("n_common"),
            col("est_inter"), col("n_union"), col("est_union"),
            col("n_only_a"), col("est_only_a"), col("n_only_b"),
            col("est_only_b"))
          .as[(String, Long, Long, Long, Long, Long, Long, Long, Long,
            Long)].collect().map(r => r._1 -> r).toMap
        assert(emitted.keySet == Set("g1", "g2"),
          s"both groups touched every batch, got ${emitted.keySet}")
        emitted.foreach { case (g, got) =>
          assert(got == expected(g),
            s"prefix $i mismatch for $g: stream $got vs batch " +
              s"${expected(g)}")
        }
      }
      // saturation actually exercised on g1 (150 + 90 keys >> k = 16)
      val fin = spark.table("theta_setops_out")
        .as[(String, Long, Long, Long, Long, Long, Long, Long, Long,
          Long)].collect().filter(_._1 == "g1").last
      assert(fin._2 < graft.operators.Sketch.ThetaM,
        s"g1 never saturated k=$k: $fin")
    } finally q.stop()
  }

  test("streaming HDR quantile brackets match the batch sketch at " +
      "EVERY micro-batch prefix (hdrMerge's cell-wise sum applied to " +
      "(state, batch)): same n, same bracket, for every permille") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.Tables.documents(spark, sfDir)
      .select($"lang", $"n_chars")
      .as[(String, Long)].collect().toSeq
    val third = rows.length / 3
    val batches = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third))
    val b = 5
    val pms = Seq(500, 900, 990)
    val input = MemoryStream[(String, Long)]
    val est = Streams.hdrQuantiles(
      input.toDF().toDF("lang", "n_chars"), "lang", "n_chars", b, pms)
    val q = est.writeStream.outputMode("update")
      .format("memory").queryName("hdr_out").start()
    try {
      var seen = 0L
      var prefix = Seq.empty[(String, Long)]
      for (bt <- batches) {
        input.addData(bt: _*)
        q.processAllAvailable()
        prefix ++= bt
        val all = spark.table("hdr_out")
          .as[(String, Int, Long, Long, Long)].collect()
        val emitted = all.drop(seen.toInt)
          .map(r => (r._1, r._2) -> r).toMap
        seen = all.length.toLong
        val expected = graft.operators.Sketch.hdrQuantiles(
            graft.operators.Sketch.hdrSketch(
              prefix.toDF("lang", "n_chars"), "lang", "n_chars", b),
            pms, b)
          .select($"grp", $"permille", $"n", $"est_lb", $"est_ub")
          .as[(String, Int, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r).toMap
        val touched = bt.map(_._1).toSet
        assert(touched.forall(g => pms.forall(p =>
            emitted.contains((g, p)))),
          s"groups $touched expected emissions for every permille, " +
            s"got ${emitted.keySet}")
        emitted.foreach { case (k, got) =>
          assert(got == expected(k),
            s"prefix mismatch for $k: stream $got vs batch ${expected(k)}")
        }
      }
    } finally q.stop()
  }

  test("streaming SEASONAL burst detection matches the batch operator " +
      "row-for-row across a 3-micro-batch replay of the real event " +
      "fixture (r13 verdict item 8): same-hour-of-day baselines, empty " +
      "days contribute zero, under-covered early history withheld") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.Tables.events(spark, sfDir)
      .select($"event_type", $"ts")
      .as[(String, java.sql.Timestamp)].collect().sortBy(_._2.getTime)
    assert(rows.length > 100, "fixture too small for a 3-batch replay")
    val third = rows.length / 3
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val flags = Streams.seasonalBurstFlags(
      input.toDF().toDF("event_type", "ts"), "event_type", "ts",
      watermark = "1 minute", trailingDays = 2, factorNum = 3,
      factorDen = 1)
    val q = flags.writeStream.outputMode("append")
      .format("memory").queryName("seasonal_burst_out").start()
    try {
      // three event-time-ordered micro-batches, then a far-future flush
      // row that finalizes every real hour (its own key is excluded —
      // too early for its own window)
      input.addData(rows.take(third).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(rows.slice(third, 2 * third).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(rows.drop(2 * third).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(("__flush",
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("seasonal_burst_out")
        .filter($"key" =!= "__flush")
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
      val expected = graft.operators.Anomaly.seasonalBurstBuckets(
          rows.toSeq.toDF("event_type", "ts"), "event_type", "ts",
          trailingDays = 2, factorNum = 3, factorDen = 1)
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
      assert(got == expected,
        s"stream-batch diff: ${(got diff expected).take(3)} / " +
          s"${(expected diff got).take(3)}")
      assert(got.exists(_._6) && got.exists(!_._6),
        "fixture should produce both burst and quiet slots")
    } finally q.stop()
  }

  test("streaming burst detection matches the batch operator on the " +
      "real event fixture: hours score exactly once as the watermark " +
      "finalizes them, baselines skip empty hours, early history is " +
      "withheld — Anomaly.burstBuckets' contract, stateful") {
    val batch = graft.Tables.events(spark, sfDir)
      .select($"event_type", $"ts")
    val dir = tempDir("burst-in-")
    // one far-future flush row finalizes every real hour; its key is
    // excluded from the comparison (too early for its own window)
    batch.unionByName(Seq(("__flush",
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
        .toDF("event_type", "ts"))
      .coalesce(4).write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema("event_type string, ts timestamp").parquet(dir)
    val flags = Streams.burstFlags(streamed, "event_type", "ts",
      watermark = "1 minute", trailing = 24, factorNum = 3,
      factorDen = 1)
    val q = flags.writeStream.outputMode("append")
      .format("memory").queryName("burst_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("burst_out")
        .filter($"key" =!= "__flush")
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      val expected = graft.operators.Anomaly.burstBuckets(
          batch, "event_type", "ts",
          trailing = 24, factorNum = 3, factorDen = 1)
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      assert(got == expected)
      assert(got.exists(_._5) && got.exists(!_._5),
        "fixture should produce both burst and quiet hours")
    } finally q.stop()
  }

  test("streaming paned sliding theta: panes beyond the latest window " +
      "retire from state, and every emission equals the batch pane " +
      "path (hence the direct window sketch) at that prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val S = 100L; val m = 4; val k = 8
    def rowsFor(p: Int): Seq[(String, Long, String)] =
      for (g <- Seq("ga", "gb"); i <- 0 until 12)
        yield (g, p * S, s"k-$g-${(p * 7 + i * 3) % 29}")
    // 10 panes chronologically -> retirement (horizon m = 4) is
    // genuinely exercised across the replay
    val batches = Seq(0 to 3, 4 to 6, 7 to 9)
      .map(_.flatMap(rowsFor).toSeq)
    val input = MemoryStream[(String, Long, String)]
    val est = Streams.thetaPaneDistinct(
      input.toDF().toDF("g", "pane", "key"), "g", "key", "pane",
      S, m, k)
    val q = est.writeStream.outputMode("update")
      .format("memory").queryName("pane_theta_out").start()
    try {
      var seen = 0
      var prefix = Seq.empty[(String, Long, String)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        prefix ++= b
        val all = spark.table("pane_theta_out")
          .as[(String, Long, Long, Long, Long)].collect()
        val emitted = all.drop(seen).map(r => r._1 -> r).toMap
        seen = all.length
        val winStart = prefix.map(_._2).max - (m - 1) * S
        val paneSk = graft.operators.Sketch.thetaPaneSketch(
          prefix.toDF("g", "pane", "key"), "g", "key", "pane", k)
        val expected = graft.operators.Sketch.thetaEstimate(
            graft.operators.Sketch.thetaPaneWindows(paneSk, S, m, k)
              .filter($"win_start" === winStart)
              .select(concat_ws("/", $"grp", $"win_start").as("grp"),
                $"h"), k)
          .select(substring_index($"grp", "/", 1),
            substring_index($"grp", "/", -1).cast("long"),
            $"n_retained", $"theta_h", $"est")
          .as[(String, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> r).toMap
        assert(emitted.keySet == Set("ga", "gb"))
        emitted.foreach { case (g, got) =>
          assert(got == expected(g),
            s"prefix mismatch $g: $got vs ${expected(g)}")
        }
      }
      // saturation exercised: the final windows retain exactly k
      val fin = spark.table("pane_theta_out")
        .as[(String, Long, Long, Long, Long)].collect()
      assert(fin.last._3 == k.toLong, s"never saturated: ${fin.last}")
    } finally q.stop()
  }

  test("streaming decayed trending counts match the aligned batch " +
      "fold at EVERY micro-batch prefix, including a LATE batch whose " +
      "events land beyond the retained horizon (zero weight, still " +
      "counted); bucket retirement keeps state bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val B = 1000000L // 1s buckets
    val mb = 5
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // hot: a ramp then silence; cold: old burst. batch 3 is LATE data
    // (sec 0 events arriving after the horizon moved to sec 9).
    val batches = Seq(
      Seq(("hot", ts(0)), ("hot", ts(1)), ("cold", ts(0)),
        ("cold", ts(0)), ("cold", ts(0))),
      Seq(("hot", ts(8)), ("hot", ts(9)), ("hot", ts(9)),
        ("cold", ts(2))),
      Seq(("hot", ts(0)), ("cold", ts(1))))
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val est = Streams.decayedTrend(
      input.toDF().toDF("k", "ts"), "k", "ts",
      bucketMicros = B, maxBuckets = mb)
    val q = est.writeStream.outputMode("update")
      .format("memory").queryName("decay_out").start()
    try {
      var seen = 0
      var prefix = Seq.empty[(String, java.sql.Timestamp)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        prefix ++= b
        val all = spark.table("decay_out")
          .as[(String, Long, Long, Double)].collect()
        val emitted = all.drop(seen).map(r => r._1 -> r).toMap
        seen = all.length
        val expected = graft.operators.Anomaly.decayedCountsAligned(
            prefix.toDF("k", "ts"), "k", "ts", B, mb)
          .as[(String, Long, Long, Double)].collect()
          .map(r => r._1 -> r).toMap
        assert(emitted.keySet == b.map(_._1).toSet)
        emitted.foreach { case (g, got) =>
          assert(got == expected(g),
            s"prefix mismatch $g: stream $got vs batch ${expected(g)}")
        }
      }
      // hand-pinned final state: hot horizon = sec 9; buckets 8 (age
      // 1) and 9 (age 0, x2) weigh 2^4 + 2*2^5 = 80; sec-0/1 events
      // (ages 9/8 > 5) weigh 0 but count. cold horizon = sec 2:
      // 3 at age 2 (2^3 each) + late 1 at age 1 (2^4) + 1 at age 0
      // (2^5) = 24 + 16 + 32 = 72.
      val fin = spark.table("decay_out")
        .as[(String, Long, Long, Double)].collect()
        .groupBy(_._1).map { case (g, rs) => g -> rs.last }
      assert(fin("hot") == (("hot", 6L, 80L, 80.0 / 32.0)))
      assert(fin("cold") == (("cold", 5L, 72L, 72.0 / 32.0)))
    } finally q.stop()
  }

  test("streaming mSPRT decisions equal the batch operator on every " +
      "chronological prefix: looks emit the moment both arms cross " +
      "the boundary, exactly once, with identical deltas, decisions, " +
      "and always-valid p") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val looks = Seq(4L, 8L, 16L)
    val sigma2 = 25.0; val tau2 = 25.0; val alphaPm = 50
    // the StatsSpec fixture: "eff" has a real effect from unit 10 on
    val rows = (0 until 40).flatMap { i =>
      val arm = i % 2
      val yEff = 50L + (if (arm == 1 && i >= 10) 12L else 0L) +
        (i % 5).toLong
      val yNil = 50L + (i % 5).toLong
      Seq(("eff", arm, yEff, i.toLong, (i % 7).toLong),
        ("nil", arm, yNil, i.toLong, (i % 7).toLong))
    } // (g, arm, y, id, x) — chronological by id
    val third = rows.length / 3
    val batches = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third))
    val input = MemoryStream[(String, Int, Long, Long, Long)]
    val dec = Streams.msprtDecisions(
      input.toDF().toDF("g", "arm", "y", "id", "x"),
      "g", "arm", "y", "x", "id", "id", looks,
      thetaNum = 1, thetaDen = 2, sigma2 = sigma2, tau2 = tau2,
      alphaPermille = alphaPm)
    val q = dec.writeStream.outputMode("append")
      .format("memory").queryName("msprt_out").start()
    try {
      var prefix = Seq.empty[(String, Int, Long, Long, Long)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        prefix ++= b
        val streamed = spark.table("msprt_out")
          .as[(String, Long, Long, Boolean, Boolean, Long)]
          .collect().toSet
        val batchRun = graft.operators.Stats.msprtCuped(
            prefix.toDF("g", "arm", "y", "id", "x"),
            "g", col("arm"), "y", "x", "id", "id", looks,
            thetaNum = 1, thetaDen = 2, sigma2 = sigma2, tau2 = tau2,
            alphaPermille = alphaPm)
          .as[(String, Long, Long, Boolean, Boolean, Long)]
          .collect().toSet
        assert(streamed == batchRun,
          s"prefix mismatch:\n stream ${streamed -- batchRun}\n " +
            s"batch ${batchRun -- streamed}")
      }
      // each look emitted exactly once per group
      val all = spark.table("msprt_out")
        .as[(String, Long, Long, Boolean, Boolean, Long)].collect()
      assert(all.groupBy(r => (r._1, r._2)).forall(_._2.size == 1),
        "every (group, look) must emit exactly once")
      assert(all.exists(r => r._1 == "eff" && r._4),
        "the planted effect must reject in-stream")
    } finally q.stop()
  }

  test("streaming ratio-mSPRT decisions equal the batch operator on " +
      "every chronological prefix: cross-multiplied boundary, looks " +
      "emitted exactly once, zero-denominator looks skipped in both") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val looks = Seq(4L, 8L, 16L)
    val sigma2 = 25.0; val tau2 = 25.0; val alphaPm = 50
    // the StatsSpec ratio fixture: "eff" lifts the treatment ratio
    // from unit 6 on; "zer" zeroes early control denominators so its
    // first look must be SKIPPED by both engines
    val rows = (0 until 40).flatMap { i =>
      val arm = i % 2
      val den = (i % 3).toLong + 1
      val nuEff = den * 50L +
        (if (arm == 1 && i >= 6) den * 9L else 0L) + (i % 5).toLong
      val zDen = if (arm == 0 && i < 8) 0L else den
      Seq(("eff", arm, nuEff, den, i.toLong),
        ("zer", arm, den * 50L, zDen, i.toLong))
    } // (g, arm, nu, de, id) — chronological by id
    val third = rows.length / 3
    val batches = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third))
    val input = MemoryStream[(String, Int, Long, Long, Long)]
    val dec = Streams.msprtRatioDecisions(
      input.toDF().toDF("g", "arm", "nu", "de", "id"),
      "g", "arm", "nu", "de", "id", "id", looks,
      sigma2 = sigma2, tau2 = tau2, alphaPermille = alphaPm)
    val q = dec.writeStream.outputMode("append")
      .format("memory").queryName("msprt_ratio_out").start()
    try {
      var prefix = Seq.empty[(String, Int, Long, Long, Long)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        prefix ++= b
        val streamed = spark.table("msprt_ratio_out")
          .as[(String, Long, Long, Boolean, Boolean, Long)]
          .collect().toSet
        val batchRun = graft.operators.Stats.msprtRatio(
            prefix.toDF("g", "arm", "nu", "de", "id"),
            "g", col("arm"), "nu", "de", "id", "id", looks,
            sigma2 = sigma2, tau2 = tau2, alphaPermille = alphaPm)
          .as[(String, Long, Long, Boolean, Boolean, Long)]
          .collect().toSet
        assert(streamed == batchRun,
          s"prefix mismatch:\n stream ${streamed -- batchRun}\n " +
            s"batch ${batchRun -- streamed}")
      }
      val all = spark.table("msprt_ratio_out")
        .as[(String, Long, Long, Boolean, Boolean, Long)].collect()
      assert(all.groupBy(r => (r._1, r._2)).forall(_._2.size == 1),
        "every (group, look) must emit exactly once")
      assert(all.exists(r => r._1 == "eff" && r._4),
        "the planted ratio effect must reject in-stream")
      assert(!all.exists(r => r._1 == "zer" && r._2 == 4L),
        "the zero-denominator look must be skipped in-stream")
    } finally q.stop()
  }

  test("streaming group-sequential decisions equal the batch operator " +
      "on every chronological prefix: planned looks only, emitted " +
      "exactly once when both arms arrive, OBF latch carried across " +
      "micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val looks = Seq(4L, 8L, 12L) // equally spaced (the OBF contract)
    val sigma2 = 25.0
    // "eff" carries a +40/unit lift on arm 1 (crosses the flat OBF
    // bound mid-sequence); "nil" is null
    val rows = (0 until 30).flatMap { i =>
      val arm = i % 2
      Seq(("eff", arm, 50L + (if (arm == 1) 40L else 0L) +
          (i % 5).toLong, i.toLong),
        ("nil", arm, 50L + (i % 5).toLong, i.toLong))
    }
    val third = rows.length / 3
    val batches = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third))
    val input = MemoryStream[(String, Int, Long, Long)]
    val dec = Streams.gsDecisions(
      input.toDF().toDF("g", "arm", "y", "id"),
      "g", "arm", "y", "id", "id", looks, sigma2 = sigma2)
    val q = dec.writeStream.outputMode("append")
      .format("memory").queryName("gs_out").start()
    try {
      var prefix = Seq.empty[(String, Int, Long, Long)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        prefix ++= b
        val streamed = spark.table("gs_out")
          .as[(String, Long, Long, Boolean, Boolean)]
          .collect().toSet
        val batchRun = graft.operators.Stats.groupSequential(
            prefix.toDF("g", "arm", "y", "id"),
            "g", col("arm"), "y", "id", "id", looks, sigma2 = sigma2)
          .as[(String, Long, Long, Boolean, Boolean)]
          .collect().toSet
        assert(streamed == batchRun,
          s"prefix mismatch:\n stream ${streamed -- batchRun}\n " +
            s"batch ${batchRun -- streamed}")
      }
      val all = spark.table("gs_out")
        .as[(String, Long, Long, Boolean, Boolean)].collect()
      assert(all.groupBy(r => (r._1, r._2)).forall(_._2.size == 1),
        "every (group, look) must emit exactly once")
      assert(all.count(_._1 == "eff") == looks.size &&
        all.count(_._1 == "nil") == looks.size,
        "every planned look must emit for both groups")
      assert(all.exists(r => r._1 == "eff" && r._4),
        "the planted effect must cross the OBF boundary in-stream")
      val eff = all.filter(_._1 == "eff").sortBy(_._2)
      assert(eff.dropWhile(!_._4).forall(_._5),
        "rejected_any must stay latched across micro-batches")
      assert(all.filter(_._1 == "nil").forall(r => !r._4 && !r._5),
        "the null group must never reject")
    } finally q.stop()
  }

  test("streaming media decode (mapPartitions codecs inside " +
      "foreachBatch) == the batch kind-dispatch at EVERY chronological " +
      "prefix, including a LATE batch; a replayed batch id never " +
      "duplicates (foreachBatch at-least-once)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.Multimodal
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.range(30)
      .select($"id".as("doc_id"), concat(lit("payload text for doc "),
        $"id", lit(" with some body to histogram")).as("text"))
    // real codec payloads: PNGs and WAVs from the synthetic generators,
    // plus undecodable "video" rows that take the byte-level path —
    // all three dispatch branches ride every micro-batch
    val imgs = Multimodal.syntheticImageTable(
      docs.filter($"doc_id" % 3 === 0)).collect()
    val auds = Multimodal.syntheticAudioTable(
      docs.filter($"doc_id" % 3 === 1)).collect()
    val vids = Multimodal.syntheticMediaTable(
        docs.filter($"doc_id" % 3 === 2))
      .as[Multimodal.MediaRow].collect()
    val rows = (imgs ++ auds ++ vids).sortBy(_.media_id)
    // batch 3 is LATE: ids 10..19 arrive after 20..29 were processed
    val batches = Seq(rows.filter(_.media_id < 10),
      rows.filter(_.media_id >= 20),
      rows.filter(r => r.media_id >= 10 && r.media_id < 20))
    val outDir = tempDir("media-decode-out-")
    val input = MemoryStream[Multimodal.MediaRow]
    val q = Streams.startMediaDecode(input.toDF(), outDir,
      tempDir("media-decode-ckpt-"))
    def sinkSet() = spark.read.parquet(outDir)
      .select($"media_id", $"kind", $"n_bytes", $"features")
      .as[(Long, String, Long, Array[Float])]
      .collect().map(r => (r._1, r._2, r._3, r._4.toSeq)).toSet
    def batchSet(prefix: Seq[Multimodal.MediaRow]) =
      Multimodal.decodeFeatures(spark.createDataset(prefix))
        .collect()
        .map(f => (f.media_id, f.kind, f.n_bytes, f.features.toSeq))
        .toSet
    try {
      var prefix = Seq.empty[Multimodal.MediaRow]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        prefix ++= b
        val (got, want) = (sinkSet(), batchSet(prefix))
        assert(got == want, s"prefix mismatch after ${prefix.size} " +
          s"rows:\n sink-only ${got -- want}\n batch-only ${want -- got}")
      }
      // all three dispatch branches actually ran
      val kinds = sinkSet().map(_._2)
      assert(kinds == Set("image", "audio", "video"), kinds.toString)
      // foreachBatch is at-least-once: replaying a batch id rewrites
      // its own partition — same sink set, same row count, no dupes
      val before = spark.read.parquet(outDir).count()
      Streams.mediaDecodeBatch(spark.createDataset(batches.head.toSeq),
        batchId = 0L, outDir)
      assert(sinkSet() == batchSet(prefix), "replay changed the sink")
      assert(spark.read.parquet(outDir).count() == before,
        "replay duplicated rows")
    } finally q.stop()
  }
}
