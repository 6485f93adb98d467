package graft.expressions

import graft.SparkSuite
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class UrlExprsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(s: String): String = UrlCanonicalize.canonicalize(s)

  test("canonicalize undoes every documented mangle class") {
    // host/scheme case + default port + dot segment + duplicate slash +
    // unreserved percent-decode + tracking strip + param sort + fragment
    assert(canon("HTTPS://EXAMPLE.COM:443/./a//b/%7Euser?Utm_Source=x&z=1&a=%41#f")
      == "https://example.com/a/b/~user?a=A&z=1")
    assert(canon("http://Example.org.:80") == "http://example.org/")
    assert(canon("  https://h/p  ") == "https://h/p") // trimmed
  }

  test("ports: defaults dropped per scheme, everything else kept") {
    assert(canon("http://h:80/x") == "http://h/x")
    assert(canon("https://h:443/x") == "https://h/x")
    assert(canon("http://h:443/x") == "http://h:443/x") // not http's default
    assert(canon("http://h:8080/x") == "http://h:8080/x")
    assert(canon("ftp://Host:21/x") == "ftp://host:21/x")
  }

  test("percent-encoding: unreserved decoded, reserved kept uppercase, " +
      "malformed escapes pass through") {
    assert(canon("https://h/p%61th%2fq?v=x%2fy")
      == "https://h/path%2Fq?v=x%2Fy") // %61='a' decodes; %2f='/' must NOT
    assert(canon("https://h/a%zz%4") == "https://h/a%zz%4")
    assert(canon("https://h/%7e%5F%2d%2E") == "https://h/~_-.")
  }

  test("path: dot segments resolve, .. at root is a no-op, empty path " +
      "becomes /") {
    assert(canon("https://h/a/b/../c/./d") == "https://h/a/c/d")
    assert(canon("https://h/../../a") == "https://h/a")
    assert(canon("https://h") == "https://h/")
    assert(canon("https://h?a=1") == "https://h/?a=1")
    assert(canon("https://h/a/") == "https://h/a/") // trailing slash kept
  }

  test("query: byte-wise param sort, empties dropped, tracking keys " +
      "stripped case-insensitively, emptied query drops its ?") {
    assert(canon("https://h/?b=2&a=1&a=0&&") == "https://h/?a=0&a=1&b=2")
    assert(canon("https://h/p?utm_source=x&GCLID=1&FbClId=z&ref=t")
      == "https://h/p")
    assert(canon("https://h/?flag&a=1") == "https://h/?a=1&flag")
  }

  test("non-URLs and userinfo pass through; host keeps one trailing-dot " +
      "strip") {
    assert(canon("hello world") == "hello world")
    assert(canon("https://USER:Pw@HOST.ORG./p") == "https://USER:Pw@host.org/p")
  }

  test("idempotent: canonical output is its own canonical form") {
    val samples = Seq(
      "HTTPS://EXAMPLE.COM:443/./a//b/%7Euser?Utm_Source=x&z=1&a=%41#f",
      "http://Example.org.:80", "https://h/?flag&a=1", "not a url",
      "https://h/a%zz%4", "ftp://Host:21/x")
    for (s <- samples) assert(canon(canon(s)) == canon(s))
  }

  test("column path merges byte-distinct aliases under one key (codegen)") {
    val urls = Seq(
      "https://site1.example.org/docs/page9?a=2&b=0&c=x%2Fy",
      "HTTPS://SITE1.EXAMPLE.ORG:443/docs/./page9?b=0&utm_source=feed&c=x%2Fy&a=2#sec9",
      "https://site1.example.org./docs//extra/../p%61ge9?a=2&c=x%2fy&b=0&gclid=g9")
      .toDF("url")
    val keys = urls.select(TextFunctions.canonicalizeUrl($"url").as("k"))
      .as[String].collect().toSet
    assert(keys ==
      Set("https://site1.example.org/docs/page9?a=2&b=0&c=x%2Fy"))
    assert(urls.select(TextFunctions.canonicalizeUrl(lit(null)
      .cast("string")).as("k")).as[Option[String]].head().isEmpty)
  }
}
