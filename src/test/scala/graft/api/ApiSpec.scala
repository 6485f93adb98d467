package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSuite
import graft.eventstore.{EventStore, StoreOptions}
import java.security.KeyPairGenerator
import java.security.interfaces.ECPublicKey
import java.security.spec.ECGenParameterSpec
import java.util.Base64

/** End-to-end request/response tests mirroring the reference's Bruno
  * collection (the .bru files under api/ — SURVEY.md §5 level 2) plus
  * the auth matrix, driven through the pure Api.handle entry point.
  */
class ApiSpec extends SparkSuite {
  private val mapper = new ObjectMapper()

  // one ES384 keypair acts as the IdP (openid.rs's JWKS source)
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
    Jwt.Jwk("key-1", coord(pub.getW.getAffineX), coord(pub.getW.getAffineY))
  }
  private val issuer = "https://idp.example"
  private val audience = "graft-api"
  private lazy val auth = Api.AuthConfig(Seq(jwk), issuer, audience)

  private def mint(sub: String, iss: String = issuer,
      aud: String = audience,
      exp: Long = System.currentTimeMillis() / 1000 + 3600): String =
    Jwt.sign(keyPair.getPrivate, "key-1",
      Map("sub" -> sub, "iss" -> iss, "aud" -> aud, "exp" -> exp))

  private def get(store: EventStore, token: String, path: String,
      query: Map[String, String] = Map.empty): Api.Response =
    Api.handle(store, auth, Api.Request("GET", path, query,
      Map("Authorization" -> s"Bearer $token")))

  private def freshStore() = new EventStore(spark, tempDir("api-"))

  test("JWT: valid token authorizes; wrong issuer/audience/expiry/" +
      "signature/kid all rejected") {
    val good = mint("alice")
    assert(Jwt.authorize(good, Seq(jwk), issuer, audience)
      .map(_.sub) == Right("alice"))
    assert(Jwt.authorize(mint("a", iss = "https://evil"), Seq(jwk),
      issuer, audience).isLeft)
    assert(Jwt.authorize(mint("a", aud = "other"), Seq(jwk), issuer,
      audience).isLeft)
    assert(Jwt.authorize(mint("a", exp = 100L), Seq(jwk), issuer,
      audience).isLeft)
    // tampered payload → signature invalid
    val parts = good.split('.')
    val enc = Base64.getUrlEncoder.withoutPadding()
    val forged = enc.encodeToString(
      """{"sub":"mallory","iss":"https://idp.example","aud":"graft-api"}"""
        .getBytes("UTF-8"))
    assert(Jwt.authorize(s"${parts(0)}.$forged.${parts(2)}", Seq(jwk),
      issuer, audience) == Left("signature invalid"))
    // unknown kid
    assert(Jwt.authorize(good, Seq(jwk.copy(kid = "other")), issuer,
      audience).isLeft)
  }

  test("health check (Health check.bru): 200 + status Pass — but only " +
      "authenticated (api.rs:147 wraps every route)") {
    val store = freshStore()
    val ok = get(store, mint("u"), "/health")
    assert(ok.status == 200)
    assert(mapper.readTree(ok.body.get).path("status").asText() == "Pass")
    val anon = Api.handle(store, auth, Api.Request("GET", "/health"))
    assert(anon.status == 401)
    val err = mapper.readTree(anon.body.get).path("errors").get(0)
    assert(err.path("title").asText() == "Not authenticated")
    assert(err.path("source").path("header").asText() == "Authorization")
    assert(err.path("id").asText().length == 36) // uuid v7
  }

  test("create event / get event / page roundtrip (Create event.bru, " +
      "Get event.bru, Get events.bru)") {
    val store = freshStore()
    val token = mint("alice")
    val post = Api.handle(store, auth, Api.Request("POST",
      "/streams/test/events",
      headers = Map("Authorization" -> s"Bearer $token"),
      body = Some("""{"specversion":"1.0","id":"e-0","source":"bru",
        "type":"t","data":{"n":1},"comexampleextension1":"value"}""")))
    assert(post.status == 201)
    assert(post.headers("Content-Location").endsWith("/streams/test/events/1"))
    // batch append
    val batch = Api.handle(store, auth, Api.Request("POST",
      "/streams/test/events",
      headers = Map("Authorization" -> s"Bearer $token"),
      body = Some("""[{"specversion":"1.0","id":"e-1","source":"bru","type":"t"},
        {"specversion":"1.0","id":"e-2","source":"bru","type":"t"}]""")))
    assert(batch.status == 201)
    // point read: immutable cache (api.rs:239)
    val evt = get(store, token, "/streams/test/events/0")
    assert(evt.status == 200)
    assert(evt.headers("Cache-Control").contains("immutable"))
    val n = mapper.readTree(evt.body.get)
    assert(n.path("id").asText() == "e-0")
    assert(n.path("data").path("n").asInt() == 1)
    assert(n.path("comexampleextension1").asText() == "value")
    // page offset=1 limit=1 (Get events.bru): full page → immutable
    val page = get(store, token, "/streams/test/events",
      Map("page[offset]" -> "1", "page[limit]" -> "1"))
    assert(page.status == 200)
    assert(page.headers("Cache-Control").contains("immutable"))
    val arr = mapper.readTree(page.body.get)
    assert(arr.size() == 1 && arr.get(0).path("id").asText() == "e-1")
    // short page → no-cache (api.rs:278-283)
    val shortPage = get(store, token, "/streams/test/events",
      Map("page[limit]" -> "50"))
    assert(shortPage.headers("Cache-Control") == "no-cache")
    assert(mapper.readTree(shortPage.body.get).size() == 3)
    // out-of-range rownum → 404 (api.rs:240)
    assert(get(store, token, "/streams/test/events/99").status == 404)
    assert(get(store, token, "/streams/nope/events/0").status == 404)
  }

  test("expected_revision matrix over the wire (Create event expecting " +
      "correct revision.bru + 409/401 mapping)") {
    val store = freshStore()
    val token = mint("bob")
    def post(expected: String, id: String): Api.Response =
      Api.handle(store, auth, Api.Request("POST", "/streams/s/events",
        query = Map("expected_revision" -> expected),
        headers = Map("Authorization" -> s"Bearer $token"),
        body = Some(s"""{"specversion":"1.0","id":"$id","source":"t","type":"t"}""")))
    assert(post("no-stream", "e0").status == 201)
    assert(post("1", "e1").status == 201) // exact, matches
    val conflict = post("1", "e2") // stream is now at 2
    assert(conflict.status == 409)
    assert(mapper.readTree(conflict.body.get).path("errors").get(0)
      .path("title").asText() == "Revision mismatch")
    // duplicate (source,id) → the reference's *declared* 409
    val dup = post("any", "e0")
    assert(dup.status == 409)
    assert(mapper.readTree(dup.body.get).path("errors").get(0)
      .path("title").asText() == "Source/ID conflict")
    // invalid expected_revision → 401 (the reference's quirk, api.rs:470-485)
    assert(post("bogus", "e3").status == 401)
    // malformed body → 422
    val bad = Api.handle(store, auth, Api.Request("POST",
      "/streams/s/events",
      headers = Map("Authorization" -> s"Bearer $token"),
      body = Some("""{"id":"no-source"}""")))
    assert(bad.status == 422)
  }

  test("stream metadata, listing with sorts, delete (Get stream.bru, " +
      "Get streams.bru, Delete stream.bru)") {
    val store = freshStore()
    val token = mint("carol")
    def post(stream: String, id: String): Unit =
      assert(Api.handle(store, auth, Api.Request("POST",
        s"/streams/$stream/events",
        headers = Map("Authorization" -> s"Bearer $token"),
        body = Some(s"""{"specversion":"1.0","id":"$id","source":"t","type":"t"}""")))
        .status == 201)
    post("aaa", "e0"); post("aaa", "e1"); post("bbb", "e0")
    // metadata (data.attributes.revision — Get stream.bru)
    val meta = get(store, token, "/streams/aaa")
    assert(meta.status == 200)
    assert(meta.headers("Cache-Control") == "no-cache")
    assert(meta.headers("Last-Modified").matches(
      """\w{3}, \d{2} \w{3} \d{4} .*"""))
    val attrs = mapper.readTree(meta.body.get).path("data").path("attributes")
    assert(attrs.path("revision").asLong() == 2)
    assert(attrs.path("usage").asLong() > 0)
    // listing + sort orders; unknown sort → 400 (api.rs:331-333)
    val listed = get(store, token, "/streams")
    val ids = mapper.readTree(listed.body.get).path("data")
    assert((0 until ids.size()).map(i => ids.get(i).path("id").asText())
      == Seq("aaa", "bbb"))
    val byRev = get(store, token, "/streams", Map("sort" -> "-revision"))
    val revIds = mapper.readTree(byRev.body.get).path("data")
    assert(revIds.get(0).path("id").asText() == "aaa")
    assert(get(store, token, "/streams", Map("sort" -> "bogus"))
      .status == 400)
    // tenancy: another user sees nothing
    val other = get(store, mint("dave"), "/streams")
    assert(mapper.readTree(other.body.get).path("data").size() == 0)
    // delete → 204 then 404 (Delete stream.bru, api.rs:421-423)
    def del(): Int = Api.handle(store, auth, Api.Request("DELETE",
      "/streams/aaa",
      headers = Map("Authorization" -> s"Bearer $token"))).status
    assert(del() == 204)
    assert(del() == 404)
    assert(get(store, token, "/streams/aaa").status == 404)
  }

  test("OIDC discovery: AuthConfig resolves through the fetcher seam, " +
      "caches, survives a failed refresh, and retries unknown kids") {
    val base = "https://idp.example"
    val jwksUrl = s"$base/keys"
    def jwkJson(k: Jwt.Jwk) =
      s"""{"kid":"${k.kid}","x":"${k.x}","y":"${k.y}"}"""
    val discovery =
      s"""{"issuer":"$issuer","jwks_uri":"$jwksUrl"}"""
    var fetches = 0
    var keysDoc = s"""{"keys":[${jwkJson(jwk)}]}"""
    val fetcher = new Oidc.Fetcher {
      def fetch(url: String): String = {
        fetches += 1
        url match {
          case u if u == s"$base/.well-known/openid-configuration" =>
            discovery
          case u if u == jwksUrl => keysDoc
          case other => throw new RuntimeException(s"unexpected $other")
        }
      }
    }
    var nowMs = 0L // manual clock: rotation refreshes are throttled
    val client = new Oidc.OpenIdClient(base, fetcher, audience,
      minRefreshIntervalMs = 60000L, clock = () => nowMs)
    // lazy resolve on first use, cache after (2 fetches, then none)
    assert(client.authorize(mint("u1")).map(_.sub) == Right("u1"))
    assert(fetches == 2)
    assert(client.authorize(mint("u2")).map(_.sub) == Right("u2"))
    assert(fetches == 2)
    // the discovery-resolved config is Api.handle's AuthConfig shape
    val cfg = client.authConfig.toOption.get
    val store = freshStore()
    val viaApi = Api.handle(store, cfg, Api.Request("GET", "/streams",
      Map.empty, Map("Authorization" -> s"Bearer ${mint("u3")}")))
    assert(viaApi.status == 200)
    // key rotation: a token under an unknown kid triggers ONE refresh
    val kpg = KeyPairGenerator.getInstance("EC")
    kpg.initialize(new ECGenParameterSpec("secp384r1"))
    val kp2 = kpg.generateKeyPair()
    val pub2 = kp2.getPublic.asInstanceOf[ECPublicKey]
    def coord(i: java.math.BigInteger) = {
      val raw = i.toByteArray.dropWhile(_ == 0)
      val padded = new Array[Byte](48)
      System.arraycopy(raw, 0, padded, 48 - raw.length, raw.length)
      Base64.getUrlEncoder.withoutPadding().encodeToString(padded)
    }
    val jwk2 = Jwt.Jwk("key-2", coord(pub2.getW.getAffineX),
      coord(pub2.getW.getAffineY))
    val rotated = Jwt.sign(kp2.getPrivate, "key-2",
      Map("sub" -> "u4", "iss" -> issuer, "aud" -> audience,
        "exp" -> (System.currentTimeMillis() / 1000 + 3600)))
    nowMs += 3600000L
    assert(client.authorize(rotated).isLeft) // not yet published
    keysDoc = s"""{"keys":[${jwkJson(jwk)},${jwkJson(jwk2)}]}"""
    // still inside the refresh throttle window → the unknown kid must
    // NOT trigger another IdP fetch (amplification guard) ...
    val fetchesBefore = fetches
    assert(client.authorize(rotated).isLeft)
    assert(fetches == fetchesBefore)
    // ... but once the interval passes, rotation resolves via ONE refresh
    nowMs += 3600000L
    assert(client.authorize(rotated).map(_.sub) == Right("u4"))
    // a refresh that blows up serves the old cache (two-phase swap)
    val flaky = new Oidc.OpenIdClient(base, new Oidc.Fetcher {
      var calls = 0
      def fetch(url: String): String = {
        calls += 1
        if (calls > 2) throw new RuntimeException("idp down")
        fetcher.fetch(url)
      }
    }, audience)
    assert(flaky.authorize(mint("u5")).map(_.sub) == Right("u5"))
    assert(flaky.refresh().isLeft)
    assert(flaky.authorize(mint("u6")).map(_.sub) == Right("u6"))
  }

  test("GET /openapi.yaml serves the spec (api.rs:137,141): 200, yaml " +
      "content-type, CloudEvents schema ref — and is auth-wrapped") {
    val store = freshStore()
    val res = get(store, mint("u"), "/openapi.yaml")
    assert(res.status == 200)
    assert(res.headers("Content-Type") == "application/yaml")
    assert(res.body.get.contains("openapi: 3.1.0"))
    assert(res.body.get.contains("CloudEvents")) // envelope schema ref
    assert(Api.handle(store, auth,
      Api.Request("GET", "/openapi.yaml")).status == 401)
  }

  test("GET /config reads back the store's retention options") {
    val store = new EventStore(spark, tempDir("api-cfg-"),
      StoreOptions(gcGraceMs = 123L, keptGenerations = 5,
        autoCompactAfter = 7))
    val res = get(store, mint("u"), "/config")
    assert(res.status == 200)
    val attrs = mapper.readTree(res.body.get)
      .path("data").path("attributes")
    assert(attrs.path("gc_grace_ms").asLong() == 123L)
    assert(attrs.path("kept_generations").asInt() == 5)
    assert(attrs.path("auto_compact_after").asInt() == 7)
    // build identification rides along (lib.rs shadow_rs analogue)
    val build = attrs.path("build")
    assert(build.path("name").asText() == "graft")
    assert(build.path("version").asText().nonEmpty)
    assert(build.path("spark").asText().startsWith("4."))
    assert(build.path("scala").asText().startsWith("2.13"))
  }

  test("OIDC refresh is single-flight: concurrent unknown-kid storms " +
      "and empty-cache-while-IdP-down storms cost one attempt per " +
      "interval, not one per request") {
    val base = "https://idp.example"
    val fetchCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val down = new Oidc.OpenIdClient(base, new Oidc.Fetcher {
      def fetch(url: String): String = {
        fetchCount.incrementAndGet()
        throw new RuntimeException("idp down")
      }
    }, audience, minRefreshIntervalMs = 60000L, clock = () => 0L)
    // empty cache + dead IdP: 16 parallel requests, ONE fetch attempt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence((1 to 16).map(_ =>
        scala.concurrent.Future(down.authorize(mint("u"))))),
      scala.concurrent.duration.Duration(30, "seconds"))
    pool.shutdown()
    assert(results.forall(_.isLeft))
    assert(fetchCount.get() == 1,
      s"expected single-flight, saw ${fetchCount.get()} fetch attempts")
    // the remembered failure reason is served between attempts
    assert(down.authorize(mint("u")).left
      .exists(_.contains("discovery failed")))
  }

  test("OIDC discovery failures are Left reasons, not exceptions") {
    val boom = new Oidc.OpenIdClient("https://idp.example",
      new Oidc.MapFetcher(Map.empty), audience)
    assert(boom.authorize(mint("u")).left.exists(_.contains("discovery")))
    val noKeys = new Oidc.OpenIdClient("https://idp.example",
      new Oidc.MapFetcher(Map(
        "https://idp.example/.well-known/openid-configuration" ->
          s"""{"issuer":"$issuer","jwks_uri":"https://idp.example/keys"}""",
        "https://idp.example/keys" -> """{"keys":[]}""")), audience)
    assert(noKeys.authorize(mint("u")).left.exists(_.contains("empty JWKS")))
  }
}
