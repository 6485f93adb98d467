package graft.api

import graft.eventstore.EventStore
import org.apache.spark.sql.SparkSession

/** The deployable entry point — the analogue of the reference's
  * main.rs: read the environment, open the stream database directory,
  * wire live OIDC discovery, bind, serve until terminated
  * (main.rs:20-40: HEMATITE_STREAMS_DIR + HEMATITE_OIDC_URL required,
  * HEMATITE_JWT_AUD read by token validation openid.rs:94-96, bind
  * 0.0.0.0:8080, secure headers on every response — those ride
  * ApiServer.respond here).
  *
  * Environment contract (the reference's, renamed):
  *   - GRAFT_STREAMS_DIR  (required) stream database root; created if
  *     absent, exactly as main.rs:21-22 does
  *   - GRAFT_OIDC_URL     (required) issuer base URL; discovery +
  *     JWKS are fetched live over HTTP and rotation-retried
  *   - GRAFT_JWT_AUD      (required) accepted `aud` claim
  *   - GRAFT_BIND_HOST    (default 0.0.0.0 — main.rs:36's bind; set
  *     127.0.0.1 behind a reverse proxy)
  *   - GRAFT_PORT         (default 8080)
  *   - GRAFT_LOG          (default info) — request-log level, the
  *     analogue of the reference's env-filtered tracing subscriber
  *     (main.rs:11-17): `info` emits one structured line per request
  *     (method, path, status, ms, tenant); `warn` keeps only
  *     handler-error lines
  *   - GRAFT_SPARK_MASTER (default local[*]) — the store's scan/agg
  *     engine; point at a cluster master to serve reads from one
  *
  * The serving loop itself is [[ApiServer.startOidc]]; this object
  * only does environment decoding and lifecycle (a shutdown hook
  * stops the server then Spark, so in-flight responses flush before
  * the executor pool dies). `boot` is the testable seam — main() is
  * boot(sys.env) plus a block-forever latch. */
object ServerMain {

  /** Decode `env`, open the store, bind, serve. Returns the handle
    * (tests bind port 0 against a stub issuer; main uses the real
    * environment). Throws IllegalArgumentException with the missing
    * variable's name — fail fast at boot like the reference's
    * .expect/.context chain, not on first request. */
  def boot(env: Map[String, String], spark: SparkSession,
      fetcher: Oidc.Fetcher = new Oidc.HttpFetcher(),
      logSink: String => Unit = System.err.println)
      : ApiServer.Handle = {
    def required(k: String): String = env.getOrElse(k,
      throw new IllegalArgumentException(s"Env var $k is required"))
    val streamsDir = required("GRAFT_STREAMS_DIR")
    val oidcUrl = required("GRAFT_OIDC_URL")
    val audience = required("GRAFT_JWT_AUD")
    val host = env.getOrElse("GRAFT_BIND_HOST", "0.0.0.0")
    val port = env.getOrElse("GRAFT_PORT", "8080").toInt
    val logLevel = env.getOrElse("GRAFT_LOG", "info")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(streamsDir))
    val store = new EventStore(spark, streamsDir)
    ApiServer.startOidc(store, oidcUrl, audience, fetcher = fetcher,
      port = port, host = host, logLevel = logLevel, logSink = logSink)
  }

  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("GRAFT_SPARK_MASTER", "local[*]")
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-server")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val handle = boot(sys.env, spark)
    System.err.println(
      s"[graft-server] serving ${handle.baseUrl} " +
        s"(streams: ${sys.env("GRAFT_STREAMS_DIR")}, " +
        s"issuer: ${sys.env("GRAFT_OIDC_URL")})")
    val done = new java.util.concurrent.CountDownLatch(1)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      handle.stop()
      spark.stop()
      done.countDown()
    }))
    done.await()
  }
}
