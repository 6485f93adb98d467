package graft.api

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8
import java.security.AlgorithmParameters
import java.security.KeyFactory
import java.security.Signature
import java.security.spec.{ECGenParameterSpec, ECParameterSpec, ECPoint, ECPublicKeySpec}
import java.util.Base64
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Bearer-token auth analogue of the reference's OIDC layer
  * (reference src/openid.rs:78-152, src/api.rs:154-231): ES384 JWT
  * validation against a JWKS key set with issuer + audience checks,
  * the `sub` claim becoming the tenant id that prefixes every data
  * access. JDK-only crypto (SHA384withECDSA over secp384r1) — the
  * JWKS/OIDC *fetch* is the caller's concern (the reference fetches
  * over HTTP at startup, openid.rs:49-74; here the key set is injected,
  * which is also what a zero-egress deployment needs).
  */
object Jwt {
  /** One JWKS entry: EC public key coordinates, base64url (openid.rs's
    * JsonWebKey — kid, x, y on P-384). */
  case class Jwk(kid: String, x: String, y: String)
  case class Claims(sub: String, iss: String, aud: String, exp: Long)

  private val mapper = new ObjectMapper()
  private def b64url(s: String): Array[Byte] =
    Base64.getUrlDecoder.decode(s)

  /** secp384r1 domain parameters from the JDK's own provider. */
  private lazy val p384: ECParameterSpec = {
    val params = AlgorithmParameters.getInstance("EC")
    params.init(new ECGenParameterSpec("secp384r1"))
    params.getParameterSpec(classOf[ECParameterSpec])
  }

  def publicKey(jwk: Jwk): java.security.PublicKey = {
    val point = new ECPoint(
      new BigInteger(1, b64url(jwk.x)), new BigInteger(1, b64url(jwk.y)))
    KeyFactory.getInstance("EC")
      .generatePublic(new ECPublicKeySpec(point, p384))
  }

  /** JWS ES384 signatures are raw r||s (2×48 bytes); the JDK verifier
    * wants ASN.1 DER — re-encode. */
  private[graft] def rawToDer(raw: Array[Byte]): Array[Byte] = {
    require(raw.length == 96, s"ES384 signature must be 96 bytes")
    def int(bytes: Array[Byte]): Array[Byte] = {
      val stripped = bytes.dropWhile(_ == 0) match {
        case Array() => Array(0.toByte)
        case b => b
      }
      val padded =
        if ((stripped(0) & 0x80) != 0) 0.toByte +: stripped else stripped
      Array(2.toByte, padded.length.toByte) ++ padded
    }
    val body = int(raw.take(48)) ++ int(raw.drop(48))
    val header =
      if (body.length < 128) Array(0x30.toByte, body.length.toByte)
      else Array(0x30.toByte, 0x81.toByte, body.length.toByte)
    header ++ body
  }

  /** Validate a compact JWS: ES384 signature against the matching JWKS
    * key (by header `kid`), then issuer / audience / expiry — the same
    * checks as openid.rs:94-104. Returns the claims or a reason. */
  def authorize(token: String, keys: Seq[Jwk], issuer: String,
      audience: String, nowEpochSeconds: Long = System.currentTimeMillis() / 1000)
      : Either[String, Claims] = {
    val parts = token.split('.')
    if (parts.length != 3) return Left("malformed token")
    val (h64, p64, s64) = (parts(0), parts(1), parts(2))
    val header: JsonNode =
      try mapper.readTree(b64url(h64))
      catch { case _: Exception => return Left("undecodable header") }
    if (header.path("alg").asText() != "ES384")
      return Left(s"unsupported alg ${header.path("alg").asText()}")
    val kid = header.path("kid").asText(null)
    if (kid == null) return Left("no kid in header") // openid.rs:86-87
    val jwk = keys.find(_.kid == kid)
      .getOrElse(return Left(unknownKid(kid))) // openid.rs:147-151
    val sigOk =
      try {
        val verifier = Signature.getInstance("SHA384withECDSA")
        verifier.initVerify(publicKey(jwk))
        verifier.update(s"$h64.$p64".getBytes(UTF_8))
        verifier.verify(rawToDer(b64url(s64)))
      } catch { case _: Exception => false }
    if (!sigOk) return Left("signature invalid")
    val claims =
      try mapper.readTree(b64url(p64))
      catch { case _: Exception => return Left("undecodable claims") }
    val iss = claims.path("iss").asText("")
    val aud = claims.path("aud").asText("")
    val exp = claims.path("exp").asLong(0L)
    val sub = claims.path("sub").asText("")
    if (iss != issuer) Left(s"issuer mismatch: $iss")
    else if (aud != audience) Left(s"audience mismatch: $aud")
    else if (exp != 0L && exp <= nowEpochSeconds) Left("token expired")
    else if (sub.isEmpty) Left("no sub claim")
    else Right(Claims(sub, iss, aud, exp))
  }

  /** The unknown-kid rejection, exposed as a constructor/predicate pair
    * so Oidc's rotation-refresh trigger can't drift from the message
    * wording. */
  private def unknownKid(kid: String): String = s"kid $kid not in jwks"
  private[api] def isUnknownKid(reason: String): Boolean =
    reason.endsWith("not in jwks")

  /** Test/tooling helper: mint a signed ES384 token (the analogue of
    * what the IdP does; used by ApiSpec to exercise the full path). */
  def sign(privateKey: java.security.PrivateKey, kid: String,
      claims: Map[String, Any]): String = {
    val enc = Base64.getUrlEncoder.withoutPadding()
    def b64(s: String) = enc.encodeToString(s.getBytes(UTF_8))
    val header = s"""{"alg":"ES384","typ":"JWT","kid":"$kid"}"""
    val payload = mapper.writeValueAsString(
      claims.foldLeft(mapper.createObjectNode()) {
        case (n, (k, v: String)) => n.put(k, v); n
        case (n, (k, v: Long)) => n.put(k, v); n
        case (n, (k, v: Int)) => n.put(k, v.toLong); n
        case (n, _) => n
      })
    val signingInput = s"${b64(header)}.${b64(payload)}"
    val signer = Signature.getInstance("SHA384withECDSA")
    signer.initSign(privateKey)
    signer.update(signingInput.getBytes(UTF_8))
    val raw = derToRaw(signer.sign())
    s"$signingInput.${enc.encodeToString(raw)}"
  }

  private[graft] def derToRaw(der: Array[Byte]): Array[Byte] = {
    // parse SEQUENCE { INTEGER r, INTEGER s } and left-pad to 48 bytes
    var i = 2
    if ((der(1) & 0x80) != 0) i += (der(1) & 0x7f)
    def readInt(): Array[Byte] = {
      require(der(i) == 2, "expected DER INTEGER")
      val len = der(i + 1) & 0xff
      val v = der.slice(i + 2, i + 2 + len)
      i += 2 + len
      v.dropWhile(_ == 0)
    }
    val r = readInt(); val s = readInt()
    val out = new Array[Byte](96)
    System.arraycopy(r, 0, out, 48 - r.length, r.length)
    System.arraycopy(s, 0, out, 96 - s.length, s.length)
    out
  }
}
