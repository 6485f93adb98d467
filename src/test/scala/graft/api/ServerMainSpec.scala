package graft.api

import graft.SparkSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.KeyPairGenerator
import java.security.interfaces.ECPublicKey
import java.security.spec.ECGenParameterSpec
import java.util.Base64

/** The deployable boot path (ServerMain = the reference's main.rs):
  * env decoding, store directory creation, live OIDC wiring, and the
  * secure-header middleware, all through a real socket. */
class ServerMainSpec extends SparkSuite {

  private lazy val keyPair = {
    val kpg = KeyPairGenerator.getInstance("EC")
    kpg.initialize(new ECGenParameterSpec("secp384r1"))
    kpg.generateKeyPair()
  }
  private lazy val jwk = {
    val pub = keyPair.getPublic.asInstanceOf[ECPublicKey]
    def coord(i: java.math.BigInteger) = {
      val raw = i.toByteArray.dropWhile(_ == 0)
      val padded = new Array[Byte](48)
      System.arraycopy(raw, 0, padded, 48 - raw.length, raw.length)
      Base64.getUrlEncoder.withoutPadding().encodeToString(padded)
    }
    Jwt.Jwk("boot-key", coord(pub.getW.getAffineX),
      coord(pub.getW.getAffineY))
  }

  test("boot: env contract decoded (missing vars fail fast by name), " +
      "streams dir created, OIDC discovery wired, authenticated " +
      "round-trip, secure headers on every response (main.rs:44-53)") {
    // fixture-backed issuer: boot accepts any Fetcher, so the env
    // contract is testable without a live socket issuer here (the
    // HTTP fetch path is ApiServerSpec's subject)
    val issuerBase = "https://idp.boot"
    val fetcher = new Oidc.MapFetcher(Map(
      s"$issuerBase/.well-known/openid-configuration" ->
        s"""{"issuer":"$issuerBase","jwks_uri":"$issuerBase/jwks"}""",
      s"$issuerBase/jwks" ->
        s"""{"keys":[{"kid":"boot-key","kty":"EC","crv":"P-384",
            "x":"${jwk.x}","y":"${jwk.y}"}]}"""))
    val dir = tempDir("server-main-") + "/nested/streams"
    val env = Map(
      "GRAFT_STREAMS_DIR" -> dir,
      "GRAFT_OIDC_URL" -> issuerBase,
      "GRAFT_JWT_AUD" -> "graft-api",
      "GRAFT_BIND_HOST" -> "127.0.0.1", // tests never bind 0.0.0.0
      "GRAFT_PORT" -> "0")
    // missing required vars name the variable, fail at boot
    for (k <- Seq("GRAFT_STREAMS_DIR", "GRAFT_OIDC_URL",
        "GRAFT_JWT_AUD")) {
      val err = intercept[IllegalArgumentException] {
        ServerMain.boot(env - k, spark, fetcher)
      }
      assert(err.getMessage.contains(k), err.getMessage)
    }
    val handle = ServerMain.boot(env, spark, fetcher)
    try {
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir)), "streams dir was not created")
      val token = Jwt.sign(keyPair.getPrivate, "boot-key",
        Map("sub" -> "deployer", "iss" -> issuerBase,
          "aud" -> "graft-api",
          "exp" -> (System.currentTimeMillis() / 1000 + 3600)))
      val client = HttpClient.newHttpClient()
      val res = client.send(
        HttpRequest.newBuilder(URI.create(handle.baseUrl + "/health"))
          .header("Authorization", s"Bearer $token").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(res.statusCode() == 200, res.body())
      // the reference's secure headers ride EVERY response — including
      // auth failures (middleware wraps the whole router)
      val unauth = client.send(
        HttpRequest.newBuilder(URI.create(handle.baseUrl + "/health"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      for (r <- Seq(res, unauth)) {
        def h(k: String) = r.headers().firstValue(k)
        assert(h("X-Content-Type-Options").orElse("") == "nosniff")
        assert(h("X-Frame-Options").orElse("") == "DENY")
        assert(h("X-XSS-Protection").orElse("") == "1; mode=block")
        assert(h("Content-Security-Policy").orElse("")
          == "frame-ancestors 'none'")
      }
      assert(unauth.statusCode() == 401)
    } finally handle.stop()
  }

  test("request log (main.rs:11-17 tracing analogue): one structured " +
      "line per request at GRAFT_LOG=info with method/path/status/ms/" +
      "tenant — including tenant=- on auth failure — and NO request " +
      "lines at GRAFT_LOG=warn") {
    val issuerBase = "https://idp.boot"
    val fetcher = new Oidc.MapFetcher(Map(
      s"$issuerBase/.well-known/openid-configuration" ->
        s"""{"issuer":"$issuerBase","jwks_uri":"$issuerBase/jwks"}""",
      s"$issuerBase/jwks" ->
        s"""{"keys":[{"kid":"boot-key","kty":"EC","crv":"P-384",
            "x":"${jwk.x}","y":"${jwk.y}"}]}"""))
    val env = Map(
      "GRAFT_STREAMS_DIR" -> (tempDir("server-log-") + "/streams"),
      "GRAFT_OIDC_URL" -> issuerBase,
      "GRAFT_JWT_AUD" -> "graft-api",
      "GRAFT_BIND_HOST" -> "127.0.0.1",
      "GRAFT_PORT" -> "0")
    val token = Jwt.sign(keyPair.getPrivate, "boot-key",
      Map("sub" -> "deployer", "iss" -> issuerBase,
        "aud" -> "graft-api",
        "exp" -> (System.currentTimeMillis() / 1000 + 3600)))
    val client = HttpClient.newHttpClient()
    def drive(level: String): Seq[String] = {
      val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val handle = ServerMain.boot(env + ("GRAFT_LOG" -> level), spark,
        fetcher, logSink = lines.add(_))
      try {
        client.send(
          HttpRequest.newBuilder(URI.create(handle.baseUrl + "/health"))
            .header("Authorization", s"Bearer $token").GET().build(),
          HttpResponse.BodyHandlers.ofString())
        client.send( // unauthenticated: logs with tenant=-
          HttpRequest.newBuilder(URI.create(handle.baseUrl + "/nope"))
            .GET().build(), HttpResponse.BodyHandlers.ofString())
      } finally handle.stop()
      import scala.jdk.CollectionConverters._
      lines.asScala.toSeq
    }
    val info = drive("info")
    assert(info.size == 2, info.mkString("\n"))
    assert(info.head.matches("\\[graft-server\\] INFO request " +
      "method=GET path=/health status=200 ms=\\d+ tenant=deployer"),
      info.head)
    assert(info(1).matches("\\[graft-server\\] INFO request " +
      "method=GET path=/nope status=401 ms=\\d+ tenant=-"), info(1))
    assert(drive("warn").isEmpty,
      "warn level must emit no request lines")
  }

  test("deploy.toml (the reference's fly.toml analogue): the [env] " +
      "block is the exact boot contract — every required var present, " +
      "every key one ServerMain documents, defaults equal to code " +
      "defaults — and a boot with the manifest env (issuer/dir/port " +
      "swapped to fixture values) comes up inside the 1-vCPU envelope") {
    val toml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("deploy.toml")), "UTF-8")
    // parse the [env] block's KEY = "VALUE" lines (the manifest's env
    // table is flat strings — no toml library needed or wanted)
    val envBlock = toml.split("\n\\[").find(_.startsWith("env]"))
      .getOrElse(fail("deploy.toml has no [env] block"))
    val kv = "(?m)^\\s*([A-Z_]+)\\s*=\\s*\"([^\"]*)\"".r
      .findAllMatchIn(envBlock)
      .map(m => m.group(1) -> m.group(2)).toMap
    val documented = Set("GRAFT_STREAMS_DIR", "GRAFT_OIDC_URL",
      "GRAFT_JWT_AUD", "GRAFT_BIND_HOST", "GRAFT_PORT", "GRAFT_LOG",
      "GRAFT_SPARK_MASTER")
    assert(kv.keySet == documented,
      s"manifest env keys ${kv.keySet} != documented contract")
    // defaults in the manifest equal the code's defaults (a manifest
    // that silently changes a default is a deploy-time surprise)
    assert(kv("GRAFT_BIND_HOST") == "0.0.0.0")
    assert(kv("GRAFT_PORT") == "8080")
    assert(kv("GRAFT_LOG") == "info")
    // the issuer carries the reference's trailing-slash warning in
    // value form (fly.toml:12 — "The trailing slash is important!")
    assert(kv("GRAFT_OIDC_URL").endsWith("/"))
    // the vm envelope is the reference's production sizing
    assert(toml.contains("cpus = 1") && toml.contains("memory_mb = 1024"))
    assert(kv("GRAFT_SPARK_MASTER") == "local[1]",
      "the 1-vCPU envelope pins the embedded master to one core")
    // and the manifest env BOOTS: swap only the deploy-specific values
    // (fixture issuer, scratch dir, ephemeral port, test-local bind)
    val issuerBase = "https://idp.deploy"
    val fetcher = new Oidc.MapFetcher(Map(
      s"$issuerBase/.well-known/openid-configuration" ->
        s"""{"issuer":"$issuerBase","jwks_uri":"$issuerBase/jwks"}""",
      s"$issuerBase/jwks" ->
        s"""{"keys":[{"kid":"boot-key","kty":"EC","crv":"P-384",
            "x":"${jwk.x}","y":"${jwk.y}"}]}"""))
    val env = kv +
      ("GRAFT_STREAMS_DIR" -> (tempDir("deploy-toml-") + "/streams")) +
      ("GRAFT_OIDC_URL" -> issuerBase) +
      ("GRAFT_BIND_HOST" -> "127.0.0.1") + ("GRAFT_PORT" -> "0")
    val handle = ServerMain.boot(env, spark, fetcher)
    try {
      val res = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(handle.baseUrl + "/health"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      // 401 without a token IS a healthy boot (auth wraps everything)
      assert(res.statusCode() == 401, res.body())
    } finally handle.stop()
  }
}
