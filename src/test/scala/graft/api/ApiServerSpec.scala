package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSuite
import graft.eventstore.EventStore
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.KeyPairGenerator
import java.security.interfaces.ECPublicKey
import java.security.spec.ECGenParameterSpec
import java.util.Base64

/** End-to-end requests over a REAL loopback socket — the last
  * lifecycle gap between "library analogue" and "service": main.rs:36-38
  * binds and serves; ApiServer does the same over the pure Api.handle
  * that ApiSpec exercises in-process.
  */
class ApiServerSpec extends SparkSuite {
  private val mapper = new ObjectMapper()

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
    Jwt.Jwk("key-1", coord(pub.getW.getAffineX),
      coord(pub.getW.getAffineY))
  }
  private lazy val auth =
    Api.AuthConfig(Seq(jwk), "https://idp.example", "graft-api")
  private def mint(sub: String): String =
    Jwt.sign(keyPair.getPrivate, "key-1",
      Map("sub" -> sub, "iss" -> "https://idp.example",
        "aud" -> "graft-api",
        "exp" -> (System.currentTimeMillis() / 1000 + 3600)))

  private lazy val client = HttpClient.newHttpClient()

  private def send(base: String, method: String, path: String,
      token: Option[String], body: Option[String] = None)
      : HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .method(method, body.fold(HttpRequest.BodyPublishers.noBody())(
        HttpRequest.BodyPublishers.ofString))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("serve over a loopback socket: auth wrap, append, paged read, " +
      "point read, 404 — the reference's bind+serve lifecycle") {
    val store = new EventStore(spark, tempDir("api-server-"))
    val server = ApiServer.start(store, auth)
    try {
      val base = server.baseUrl
      val token = Some(mint("alice"))
      // no token → 401 before any route logic (api.rs:147 wrap)
      assert(send(base, "GET", "/health", None).statusCode() == 401)
      val health = send(base, "GET", "/health", token)
      assert(health.statusCode() == 200)
      assert(mapper.readTree(health.body()).path("status")
        .asText() == "Pass")
      // append a small batch through the real socket
      val events = (0 until 3).map(i =>
        s"""{"id":"e-$i","source":"test://srv","type":"t",
            "specversion":"1.0","data":{"i":$i}}""").mkString(",")
      val post = send(base, "POST", "/streams/socket-stream/events",
        token, Some(s"[$events]"))
      assert(post.statusCode() == 201, post.body())
      // paged read — page[offset]/page[limit] arrive URL-ENCODED over
      // a real socket (%5B/%5D), exercising the decode path ApiSpec
      // can't see
      val page = send(base, "GET",
        "/streams/socket-stream/events" +
          "?page%5Boffset%5D=1&page%5Blimit%5D=2", token)
      assert(page.statusCode() == 200)
      val arr = mapper.readTree(page.body())
      val got = (0 until arr.size()).map(arr.get(_).path("id").asText())
      assert(got == Seq("e-1", "e-2"))
      // point read + miss
      assert(send(base, "GET", "/streams/socket-stream/events/0",
        token).statusCode() == 200)
      assert(send(base, "GET", "/streams/nope/events/0",
        token).statusCode() == 404)
      // stream listing sees the stream
      val ls = send(base, "GET", "/streams", token)
      assert(ls.statusCode() == 200)
      assert(ls.body().contains("socket-stream"))
    } finally server.stop()
  }

  test("handler exceptions surface through onError AND return an " +
      "opaque 500 to the client (no invisible failures)") {
    // corrupt the stream's head manifest to list a data file that does
    // not exist: the next read throws — a genuine storage-level
    // handler exception no route-level 4xx mapping catches
    // (parseManifest itself is deliberately lenient, so garbage content
    // would degrade to 404, not an exception)
    val root = tempDir("api-err-")
    val store = new EventStore(spark, root)
    val seen = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val server = ApiServer.start(store, auth, onError = seen.set)
    try {
      val token = Some(mint("alice"))
      val post = send(server.baseUrl, "POST", "/streams/err-stream/events",
        token, Some("""[{"id":"e","source":"s://x","type":"t",
          "specversion":"1.0"}]"""))
      assert(post.statusCode() == 201, post.body())
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      val manifests =
        try walk.filter(p =>
            p.getFileName.toString.startsWith("manifest-"))
          .collect(java.util.stream.Collectors.toList[java.nio.file.Path])
        finally walk.close()
      assert(!manifests.isEmpty, "no manifest written?")
      manifests.forEach(p => java.nio.file.Files.writeString(p,
        "v 1\nr 1\nf ghost.parquet\n"))
      val res = send(server.baseUrl, "GET", "/streams/err-stream/events",
        token)
      // client sees only the opaque envelope...
      assert(res.statusCode() == 500, s"${res.statusCode()}: ${res.body()}")
      assert(res.body().contains("\"title\":\"Internal\""))
      assert(!res.body().contains(root)) // no detail leak
      // ...but the operator sees the real exception
      assert(seen.get != null, "onError was never invoked")
    } finally server.stop()
  }

  test("request bodies beyond the cap get 413 before buffering; at the " +
      "cap they pass (axum DefaultBodyLimit analogue)") {
    val store = new EventStore(spark, tempDir("api-cap-"))
    val server = ApiServer.start(store, auth, maxBodyBytes = 1024)
    try {
      val token = Some(mint("alice"))
      val big = "x" * 2048
      val res = send(server.baseUrl, "POST", "/streams/s/events",
        token, Some(big))
      assert(res.statusCode() == 413, res.body())
      // a body exactly at the cap reaches the route (fails as 4xx JSON,
      // not 413) — the cap is strict-greater-than
      val atCap = "[" + " " * 1022 + "]"
      assert(atCap.length == 1024)
      val ok = send(server.baseUrl, "POST", "/streams/s/events",
        token, Some(atCap))
      assert(ok.statusCode() != 413, ok.body())
    } finally server.stop()
  }

  test("parseQuery decodes keys and values; empty/missing handled") {
    assert(ApiServer.parseQuery(null) == Map.empty)
    assert(ApiServer.parseQuery("") == Map.empty)
    assert(ApiServer.parseQuery("a=1&b=x%20y&flag")
      == Map("a" -> "1", "b" -> "x y", "flag" -> ""))
  }
}
