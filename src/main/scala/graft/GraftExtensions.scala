package graft

import graft.expressions.{LshBandHashes, SimHash64, VecDot, WordShingles}
import graft.functions.{Base32Decode, Base32Encode}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL-surface registration for graft's native expressions and table
  * functions, so users can write `SELECT vec_dot(a, b)`, `base32(id)`,
  * `simhash64(text)`, `word_shingles(text, 3)` — and query the event
  * store in plain SQL:
  *
  * {{{
  *   SET spark.graft.store.root=/path/to/store;
  *   SELECT id, revision FROM positional_scan('user', 'stream', 0, 50);
  *   SELECT * FROM stream_listing('user') ORDER BY usage DESC;
  * }}}
  *
  * The TVFs expand to the store's pruned DataFrame plans (revision-range
  * filter over manifest-listed files), so outer predicates compose with
  * pushdown like any other relation — the SQL analogue of the reference's
  * GET routes (src/api.rs:140-148).
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (SparkSessionExtensions.injectFunction/injectTableFunction), or
  *  - `GraftExtensions.register(spark)` on an existing session (the
  *    driver hands us a prebuilt session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    GraftExtensions.tableBuilders.foreach { case (name, builder) =>
      e.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
  }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def evalString(e: Expression, what: String): String =
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }

  private def evalLong(e: Expression, what: String): Long =
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

  private def storeFor(spark: SparkSession): graft.eventstore.EventStore = {
    val root = spark.conf.getOption("spark.graft.store.root").getOrElse(
      throw new IllegalArgumentException(
        "set spark.graft.store.root to use event-store table functions"))
    new graft.eventstore.EventStore(spark, root)
  }

  /** SQL table functions over the event store (reference read routes as
    * relations). Arguments must be literals — they select the stream,
    * they don't join. */
  val tableBuilders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    // positional range scan [start, start+limit) — src/db.rs:133-177
    "positional_scan" -> { es =>
      import org.apache.spark.sql.functions.col
      val spark = SparkSession.active
      val (u, s) = (evalString(es(0), "user"), evalString(es(1), "stream"))
      val start = if (es.size > 2) evalLong(es(2), "start") else 0L
      val limit =
        if (es.size > 3) evalLong(es(3), "limit").toInt else 50
      storeFor(spark).readStream(u, s)
        .filter(col("revision") >= start &&
          col("revision") < start + limit)
        .orderBy(col("revision"))
        .queryExecution.logical
    },
    // stream metadata listing — src/server.rs:199-248 (metadata-only)
    "stream_listing" -> { es =>
      val spark = SparkSession.active
      val u = evalString(es(0), "user")
      val metas = storeFor(spark).streams(u)
      import spark.implicits._
      metas.toDF().queryExecution.logical
    },
    // every event of a user's streams as one relation (the analytics
    // entry over the store — manifest-listed files only)
    "stream_events" -> { es =>
      val spark = SparkSession.active
      val u = evalString(es(0), "user")
      storeFor(spark).userEvents(u).queryExecution.logical
    },
    // store-wide stats, one metadata-only row per user (manifests + file
    // sizes, zero parquet footers) — the admin-overview relation a
    // multi-tenant store needs; shape mirrors stream_listing aggregated
    // one level up
    "store_stats" -> { _ =>
      val spark = SparkSession.active
      val store = storeFor(spark)
      import spark.implicits._
      val rows = store.recoverCatalog().map(_._1).distinct.sorted
        .map { u =>
          val metas = store.streams(u)
          (u, metas.size.toLong, metas.map(_.revision).sum,
            metas.map(_.usage).sum)
        }
      rows.toDF("user_id", "n_streams", "n_events", "usage_bytes")
        .queryExecution.logical
    },
    // maintenance verb in SQL (Spark has no CALL statement; a
    // one-row-result table function is the idiomatic stand-in):
    // SELECT * FROM compact_stream('user', 'stream') folds the stream's
    // batch files into one and reports how many were replaced
    "compact_stream" -> { es =>
      val spark = SparkSession.active
      val (u, s) = (evalString(es(0), "user"), evalString(es(1), "stream"))
      val n = storeFor(spark).compactStream(u, s)
      import spark.implicits._
      Seq((u, s, n)).toDF("user_id", "stream_id", "files_replaced")
        .queryExecution.logical
    })

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "base32" -> (es => Base32Encode(es.head)),
    "unbase32" -> (es => Base32Decode(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "key_hash" -> (es => graft.expressions.KeyHash64(es(0), es(1))),
    "word_shingles" -> (es =>
      WordShingles(es.head, intLit(es(1), "n"))),
    "lsh_band_hashes" -> (es => LshBandHashes(es.head,
      intLit(es(1), "k"), intLit(es(2), "bands"))))

  /** Register all functions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    tableBuilders.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
  }
}
