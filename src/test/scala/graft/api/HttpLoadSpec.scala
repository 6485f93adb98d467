package graft.api

import graft.SparkSuite
import graft.eventstore.EventStore

/** The k6 mixed-profile runner at toy scale: every request must
  * succeed (the k6 threshold http_req_failed < 1% — here exactly 0),
  * counts must match the 100-POST/1000-GET shape scaled down, and the
  * latency surfaces must be populated and ordered sanely. */
class HttpLoadSpec extends SparkSuite {

  test("mixed load through a live ApiServer: zero errors, k6 shape, " +
      "populated percentiles") {
    val store = new EventStore(spark, tempDir("http-load-"))
    val r = HttpLoad.run(store, clients = 2, posts = 5, gets = 20)
    assert(r.post.errors == 0, s"POST errors: ${r.post.errors}")
    assert(r.get.errors == 0, s"GET errors: ${r.get.errors}")
    assert(r.post.n == 10) // 2 clients x 5 posts
    assert(r.get.n == 40)  // 2 clients x 20 gets
    assert(r.post.p50Ms > 0 && r.post.p95Ms >= r.post.p50Ms)
    assert(r.get.p50Ms > 0 && r.get.p95Ms >= r.get.p50Ms)
    assert(r.allP95Ms > 0 && r.wallS > 0)
    // the JSON fragment embeds without trailing garbage
    assert(r.json.startsWith("""{"post":{"n":10,"""))
    assert(r.json.endsWith("}"))
  }
}
