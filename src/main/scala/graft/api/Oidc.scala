package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._
import graft.api.Api.AuthConfig

/** OIDC discovery for the auth layer — the config/caching structure of
  * the reference's OpenIdClient (openid.rs:26-74): resolve
  * `.well-known/openid-configuration` under a base URL, follow its
  * `jwks_uri`, cache both, re-resolve on demand. The transport is a
  * `Fetcher` seam: production wires an HTTP client; a zero-egress
  * deployment (or a test) wires fixtures — the auth layer itself is
  * config-complete either way, which is the point of the seam.
  */
object Oidc {
  /** The two discovery-document fields the auth path needs
    * (openid.rs:26-30). */
  case class OpenIdConfiguration(issuer: String, jwksUri: String)

  /** URL → body. Implementations may throw; the client maps failures
    * to Left reasons. */
  trait Fetcher { def fetch(url: String): String }

  /** A fixture-backed Fetcher (tests / air-gapped config). */
  final class MapFetcher(docs: Map[String, String]) extends Fetcher {
    def fetch(url: String): String = docs.getOrElse(url,
      throw new java.util.NoSuchElementException(s"no document at $url"))
  }

  private val mapper = new ObjectMapper()

  /** Caching discovery client. `refresh()` re-fetches both documents
    * atomically (openid.rs:48-74); `authConfig` resolves lazily on
    * first use and serves the cache afterwards, so steady-state
    * authorization does no fetching at all. */
  final class OpenIdClient(baseUrl: String, fetcher: Fetcher,
      audience: String, minRefreshIntervalMs: Long = 60000L,
      clock: () => Long = () => System.currentTimeMillis()) {
    @volatile private var cache: Option[AuthConfig] = None
    @volatile private var lastFailure: String = "discovery never attempted"
    private val unset = Long.MinValue
    private val lastRefreshMs =
      new java.util.concurrent.atomic.AtomicLong(unset)

    private def discoveryUrl: String =
      baseUrl.stripSuffix("/") + "/.well-known/openid-configuration"

    /** Refresh at most once per `minRefreshIntervalMs` ACROSS THREADS:
      * the CAS on the attempt stamp elects exactly one fetching winner
      * — N concurrent unknown-kid requests (or N requests hitting an
      * empty cache while the IdP is down) cost one IdP round-trip, not
      * N (r05 ADVICE: the old check-then-act let every one of them
      * through, and the empty-cache path had no throttle at all).
      * Losers and callers inside the window get the cache if present,
      * else the last recorded failure reason. */
    private def throttledRefresh(): Either[String, AuthConfig] = {
      val last = lastRefreshMs.get()
      val now = clock()
      // guard the subtraction: now - unset overflows
      if ((last == unset || now - last >= minRefreshIntervalMs) &&
          lastRefreshMs.compareAndSet(last, now)) refresh()
      else cache.toRight(lastFailure)
    }

    /** Fetch + parse discovery and JWKS; swap the cache only on full
      * success (a half-failed refresh keeps serving the old keys, as
      * the reference's two-phase swap does). Direct calls FORCE a
      * fetch (operator "reload now" semantics); the serving paths go
      * through [[throttledRefresh]]. Synchronized so two forced
      * refreshes can't interleave their two-document fetches. */
    def refresh(): Either[String, AuthConfig] = synchronized {
      lastRefreshMs.set(clock()) // attempts count: a failing IdP must
      val out = doRefresh()      // not be hammered per token
      out.left.foreach(reason => lastFailure = reason)
      out
    }

    private def doRefresh(): Either[String, AuthConfig] = {
      try {
        val cfgDoc = mapper.readTree(fetcher.fetch(discoveryUrl))
        val issuer = cfgDoc.path("issuer").asText("")
        val jwksUri = cfgDoc.path("jwks_uri").asText("")
        if (issuer.isEmpty || jwksUri.isEmpty)
          Left(s"discovery document missing issuer/jwks_uri")
        else {
          val keysDoc = mapper.readTree(fetcher.fetch(jwksUri))
          val keys = keysDoc.path("keys").elements().asScala.map { k =>
            Jwt.Jwk(k.path("kid").asText(""), k.path("x").asText(""),
              k.path("y").asText(""))
          }.toSeq
          if (keys.isEmpty) Left(s"empty JWKS at $jwksUri")
          else {
            val cfg = AuthConfig(keys, issuer, audience)
            cache = Some(cfg)
            Right(cfg)
          }
        }
      } catch {
        case e: Exception => Left(s"discovery failed: ${e.getMessage}")
      }
    }

    /** The cached AuthConfig, resolving (throttled) if never fetched —
      * an IdP outage at startup degrades to one attempt per interval
      * plus a remembered failure reason, not one fetch per request. */
    def authConfig: Either[String, AuthConfig] =
      cache.toRight(()).left.flatMap(_ => throttledRefresh())

    /** End-to-end: discovery-resolved issuer/keys + Jwt.authorize. A
      * kid that is not in the cached key set triggers ONE refresh and
      * retry — the reference's key-rotation path (openid.rs:130-152) —
      * but at most once per `minRefreshIntervalMs` across all threads:
      * without the throttle, a client spamming random kids would force
      * two IdP fetches per request (amplification against both sides;
      * real rotations are rare). The unknown-kid case is detected
      * through Jwt's own predicate, not a locally duplicated string. */
    def authorize(token: String,
        nowEpochSeconds: Long = System.currentTimeMillis() / 1000)
        : Either[String, Jwt.Claims] =
      authConfig.flatMap { cfg =>
        Jwt.authorize(token, cfg.keys, cfg.issuer, cfg.audience,
          nowEpochSeconds) match {
          case Left(reason) if Jwt.isUnknownKid(reason) =>
            throttledRefresh() match {
              // retry only when a refresh (ours or a concurrent
              // winner's) actually produced a different key set;
              // otherwise keep the sharper unknown-kid reason
              case Right(fresh) if fresh != cfg =>
                Jwt.authorize(token, fresh.keys, fresh.issuer,
                  fresh.audience, nowEpochSeconds)
              case _ => Left(reason)
            }
          case other => other
        }
      }
  }

}
