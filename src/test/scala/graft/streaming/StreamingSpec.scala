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
}
