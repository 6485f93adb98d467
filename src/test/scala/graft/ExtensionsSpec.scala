package graft

import graft.functions.{Base32, TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** Every SQL-registered function (GraftExtensions) agrees with its
  * Column-API counterpart when invoked through spark.sql. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("all registered SQL functions match the Column API") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      .createOrReplaceTempView("docs_ext")
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      .createOrReplaceTempView("emb_ext")

    val viaSql = spark.sql(
      """SELECT doc_id, base32(text) AS b32,
         unbase32(base32(text)) AS rt,
         simhash64(text) AS sh,
         size(word_shingles(text, 3)) AS nsh,
         size(lsh_band_hashes(word_shingles(text, 3), 64, 32)) AS nbands
         FROM docs_ext""").collect()
    val viaApi = spark.table("docs_ext")
      .select($"doc_id", $"text",
        TextFunctions.simhash64($"text").as("sh"),
        size(TextFunctions.distinctShingles($"text", 3)).as("nsh"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("text"), r.getAs[Long]("sh"),
          r.getAs[Int]("nsh")))).toMap
    viaSql.foreach { r =>
      val (text, sh, nsh) = viaApi(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("rt") == text) // base32 roundtrip via SQL
      assert(Base32.decodeString(r.getAs[String]("b32")) == text)
      assert(r.getAs[Long]("sh") == sh)
      assert(r.getAs[Int]("nsh") == nsh) // word_shingles = distinct set
      assert(r.getAs[Int]("nbands") == 32)
    }

    val dotSql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb_ext")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("d"))
      .toMap
    val dotApi = spark.table("emb_ext")
      .select($"vec_id",
        VectorFunctions.dot($"embedding", $"embedding").as("d"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("d"))
      .toMap
    assert(dotSql == dotApi)
  }

  test("event-store table functions: positional_scan and stream_listing " +
      "work as SQL relations with composable predicates") {
    import graft.eventstore.{CloudEvent, EventStore}
    GraftExtensions.register(spark)
    val root = tempDir("tvf-store-")
    val store = new EventStore(spark, root)
    (0 until 20).foreach(i => store.append("u1", "s1",
      Seq(CloudEvent(id = s"e-$i", source = "tvf", `type` = "t",
        data = Some(i.toString)))))
    store.append("u1", "other", Seq(
      CloudEvent(id = "x", source = "tvf", `type` = "t")))
    spark.conf.set("spark.graft.store.root", root)
    // positional range scan as a relation (reference GET events route)
    val page = spark.sql(
      "SELECT id, revision FROM positional_scan('u1', 's1', 5, 3)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(page == Seq(("e-5", 5L), ("e-6", 6L), ("e-7", 7L)))
    // outer predicates compose (pushdown into the store scan)
    val filtered = spark.sql(
      """SELECT count(*) AS n FROM positional_scan('u1', 's1', 0, 1000)
         WHERE data = '13'""").head().getLong(0)
    assert(filtered == 1)
    // defaults: start 0, limit 50
    assert(spark.sql("SELECT * FROM positional_scan('u1', 's1')")
      .count() == 20)
    // stream metadata listing (reference GET /streams route)
    val streams = spark.sql(
      """SELECT id, revision FROM stream_listing('u1') ORDER BY id""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streams == Seq(("other", 1L), ("s1", 20L)))
    // all of a user's events as one relation, aggregable in SQL
    val perStream = spark.sql(
      """SELECT stream_id, count(*) AS n, max(revision) AS maxrev
         FROM stream_events('u1') GROUP BY stream_id ORDER BY stream_id""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perStream.toSeq ==
      Seq(("other", 1L, 0L), ("s1", 20L, 19L)))
  }

  test("store_stats() and compact_stream() SQL surface: metadata-only " +
      "admin overview plus the maintenance verb as a one-row relation") {
    import graft.eventstore.{CloudEvent, EventStore}
    GraftExtensions.register(spark)
    val root = tempDir("tvf-admin-")
    val store = new EventStore(spark, root)
    (0 until 3).foreach(i => store.append("u1", "s1",
      Seq(CloudEvent(id = s"a-$i", source = "tvf", `type` = "t"))))
    store.append("u1", "s2", Seq(
      CloudEvent(id = "b", source = "tvf", `type` = "t")))
    store.append("u2", "s9", Seq(
      CloudEvent(id = "c", source = "tvf", `type` = "t")))
    spark.conf.set("spark.graft.store.root", root)
    val stats = spark.sql(
      """SELECT user_id, n_streams, n_events FROM store_stats()
         ORDER BY user_id""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.toSeq == Seq(("u1", 2L, 4L), ("u2", 1L, 1L)))
    assert(spark.sql("SELECT usage_bytes FROM store_stats()")
      .collect().forall(_.getLong(0) > 0))
    // the verb: three batch files fold into one, re-run is a no-op
    val compacted = spark.sql(
      "SELECT files_replaced FROM compact_stream('u1', 's1')")
      .head().getInt(0)
    assert(compacted == 3)
    assert(spark.sql(
      "SELECT files_replaced FROM compact_stream('u1', 's1')")
      .head().getInt(0) == 0)
    // data survives the verb
    assert(store.query("u1", "s1", 0, 10).map(_.id) ==
      Seq("a-0", "a-1", "a-2"))
  }
}
