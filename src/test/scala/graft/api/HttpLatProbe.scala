package graft.api

import graft.SparkSuite
import graft.eventstore.EventStore
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Pins the TCP_NODELAY fix on the serving path: the JDK HttpServer
  * defaults to Nagle ON, and a keep-alive client then pays the
  * Nagle × delayed-ACK interaction (+40 ms) on every response written
  * as headers-then-body. ApiServer sets sun.net.httpserver.nodelay at
  * class load; without it, /health p50 over loopback measured 48 ms —
  * with it, ~5 ms. The 25 ms assertion sits far above the fixed cost
  * (JWT verify + routing) and far below the 40 ms failure mode, so it
  * trips on the regression, not on host noise. */
class HttpLatProbe extends SparkSuite {
  test("no delayed-ACK stall on the serving path: /health p50 over a " +
      "real socket stays well under the 40 ms Nagle signature") {
    val store = new EventStore(spark, tempDir("lat-probe-"))
    val kpg = java.security.KeyPairGenerator.getInstance("EC")
    kpg.initialize(new java.security.spec.ECGenParameterSpec("secp384r1"))
    val kp = kpg.generateKeyPair()
    val pub = kp.getPublic.asInstanceOf[java.security.interfaces.ECPublicKey]
    def coord(i: java.math.BigInteger) = {
      val raw = i.toByteArray.dropWhile(_ == 0)
      val padded = new Array[Byte](48)
      System.arraycopy(raw, 0, padded, 48 - raw.length, raw.length)
      java.util.Base64.getUrlEncoder.withoutPadding().encodeToString(padded)
    }
    val jwk = Jwt.Jwk("k", coord(pub.getW.getAffineX),
      coord(pub.getW.getAffineY))
    val auth = Api.AuthConfig(Seq(jwk), "i", "a")
    val token = Jwt.sign(kp.getPrivate, "k",
      Map("sub" -> "u", "iss" -> "i", "aud" -> "a",
        "exp" -> (System.currentTimeMillis() / 1000 + 3600)))
    val server = ApiServer.start(store, auth)
    val http = HttpClient.newHttpClient()
    try {
      val lat = (0 until 200).map { _ =>
        val t0 = System.nanoTime()
        val r = http.send(HttpRequest.newBuilder(
            URI.create(server.baseUrl + "/health"))
          .header("Authorization", s"Bearer $token").GET().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(r.statusCode() == 200)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val p50 = lat(100)
      info(f"/health p50 over socket: $p50%.2f ms")
      assert(p50 < 25.0,
        f"/health p50 $p50%.2f ms — the 40 ms delayed-ACK stall is " +
          "back (is sun.net.httpserver.nodelay still set before the " +
          "first HttpServer.create?)")
    } finally server.stop()
  }
}
