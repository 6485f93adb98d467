package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for web-corpus dedup (the r09 verdict's last
  * "missing" operator family). A crawled corpus stores the same page
  * under many byte-distinct URLs — case-mangled hosts, default ports,
  * tracking params, re-ordered query strings, percent-encoding
  * variants, dot segments — and exact URL dedup finds none of them
  * until the keys are canonicalized. The rules below are the common
  * core of public crawl canonicalizers (RFC 3986 §6 syntax-based
  * normalization plus the tracking-param strip every web pipeline
  * adds):
  *
  *  1. trim surrounding whitespace;
  *  2. anything without a `scheme://` prefix is returned as-is
  *     (trimmed) — not this operator's job to guess;
  *  3. scheme and host lowercase; one trailing dot stripped from the
  *     host (DNS root); userinfo preserved byte-for-byte;
  *  4. default ports dropped (http:80, https:443), others kept;
  *  5. fragment dropped;
  *  6. percent-normalization of path and query: %XX decoding for
  *     UNRESERVED bytes only (ALPHA / DIGIT / - . _ ~), all other
  *     escapes kept with uppercase hex (%2f → %2F); malformed escapes
  *     pass through untouched;
  *  7. path: duplicate slashes collapsed, then "." / ".." segments
  *     resolved (a trailing "." or ".." does not leave a trailing
  *     slash); empty path becomes "/";
  *  8. query: params split on "&", empties dropped, tracking keys
  *     dropped (utm_* prefix and a pinned id set, case-insensitive),
  *     survivors re-sorted byte-wise on the normalized "k=v" string
  *     (deterministic total order, so param re-orderings merge);
  *     an emptied query drops its "?".
  *
  * All choices are deterministic and documented so an oracle can
  * recompute the canonical form in closed form (q108 does exactly
  * that). One pass per row, whole-stage codegen via SelfCallCodegen.
  */
object UrlCanonicalize {
  /** Tracking params every major crawl pipeline strips: Google Ads
    * (gclid), Facebook (fbclid), Microsoft (msclkid), Mailchimp
    * (mc_eid), Instagram (igshid), generic referrer tags. */
  private val trackingIds =
    Set("gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref")

  private def isTracking(key: String): Boolean = {
    val k = key.toLowerCase(java.util.Locale.ROOT)
    k.startsWith("utm_") || trackingIds.contains(k)
  }

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved %XX, uppercase the hex of every other escape. */
  private[expressions] def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val b = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(b)) sb.append(b.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Collapse runs of '/' then resolve "." and ".." segments. Input
    * starts with '/' (callers guarantee it); ".." at the root is a
    * no-op, matching RFC 3986 remove_dot_segments. */
  private def normalizePath(p: String): String = {
    val sb = new java.lang.StringBuilder(p.length)
    var i = 0
    while (i < p.length) { // collapse //
      val c = p.charAt(i)
      if (c != '/' || sb.length == 0 || sb.charAt(sb.length - 1) != '/')
        sb.append(c)
      i += 1
    }
    val segs = sb.toString.split("/", -1) // segs(0) is always ""
    val out = new scala.collection.mutable.ArrayBuffer[String](segs.length)
    var j = 1
    while (j < segs.length) {
      segs(j) match {
        case "."  => // skip
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case s    => out += s
      }
      j += 1
    }
    "/" + out.mkString("/")
  }

  /** Normalize one "k=v" (or bare "k") param: percent-normalize key and
    * value independently; the first '=' splits them. */
  private def normalizeParam(p: String): String = {
    val eq = p.indexOf('=')
    if (eq < 0) pctNormalize(p)
    else pctNormalize(p.substring(0, eq)) + "=" +
      pctNormalize(p.substring(eq + 1))
  }

  private def paramKey(p: String): String = {
    val eq = p.indexOf('=')
    if (eq < 0) p else p.substring(0, eq)
  }

  def canonicalize(raw: String): String = {
    val url = raw.trim
    val sep = url.indexOf("://")
    if (sep <= 0) return url
    val scheme0 = url.substring(0, sep)
    var si = 0
    var schemeOk = scheme0.charAt(0).isLetter
    while (schemeOk && si < scheme0.length) {
      val c = scheme0.charAt(si)
      schemeOk = c.isLetterOrDigit || c == '+' || c == '-' || c == '.'
      si += 1
    }
    if (!schemeOk) return url
    val scheme = scheme0.toLowerCase(java.util.Locale.ROOT)

    var rest = url.substring(sep + 3)
    val hashAt = rest.indexOf('#') // 5. drop fragment
    if (hashAt >= 0) rest = rest.substring(0, hashAt)

    var i = 0 // authority runs to the first '/' or '?'
    while (i < rest.length && rest.charAt(i) != '/' && rest.charAt(i) != '?')
      i += 1
    val auth = rest.substring(0, i)
    val tail = rest.substring(i)

    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostport = if (at >= 0) auth.substring(at + 1) else auth
    val ci = hostport.lastIndexOf(':')
    val portDigits = ci >= 0 && ci < hostport.length - 1 &&
      hostport.substring(ci + 1).forall(c => c >= '0' && c <= '9')
    val host0 = if (portDigits) hostport.substring(0, ci) else hostport
    val port0 = if (portDigits) hostport.substring(ci + 1) else ""
    var host = host0.toLowerCase(java.util.Locale.ROOT)
    if (host.length > 1 && host.endsWith(".")) host = host.dropRight(1)
    val port =
      if (port0.isEmpty || (scheme == "http" && port0 == "80") ||
          (scheme == "https" && port0 == "443")) ""
      else ":" + port0

    val qi = tail.indexOf('?')
    val path0 = if (qi >= 0) tail.substring(0, qi) else tail
    val query0 = if (qi >= 0) tail.substring(qi + 1) else null
    val path = normalizePath(
      if (path0.isEmpty) "/" else pctNormalize(path0))
    val query =
      if (query0 == null) ""
      else {
        val kept = query0.split("&", -1).iterator
          .filter(_.nonEmpty)
          .map(normalizeParam)
          .filterNot(p => isTracking(paramKey(p)))
          .toArray
        if (kept.isEmpty) ""
        else {
          java.util.Arrays.sort(kept, java.util.Comparator.naturalOrder[String]())
          "?" + kept.mkString("&")
        }
      }
    scheme + "://" + userinfo + host + port + path + query
  }
}

/** Column form of [[UrlCanonicalize.canonicalize]]. */
case class CanonicalizeUrl(child: Expression)
    extends UnaryExpression with SelfCallCodegen {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      UrlCanonicalize.canonicalize(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
