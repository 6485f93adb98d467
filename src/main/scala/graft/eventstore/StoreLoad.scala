package graft.eventstore

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable.ArrayBuffer

/** Sustained mixed-load driver for the event store — the analogue of
  * the reference's k6 scripts (load/post-event.js:7-11 asserts p95 <
  * 50 ms and < 1% errors on appends; load/post-and-read.js:21-44 runs
  * a mixed 100-writer / 1000-reader profile). A one-shot latency
  * assertion can't see GC pressure or small-file decay under minutes
  * of appends; this runs real concurrent writers and readers against
  * one store for a duration and reports per-op percentiles.
  *
  * Used twice: SloSpec runs a short profile inside the suite budget
  * and asserts the reference thresholds; [[graft.StoreBench]] runs a
  * longer one per round and records BENCH_STORE.json, the
  * criterion-bench analogue (benches/write_benchmark.rs:7-21,
  * read_benchmark.rs:14-35) the reference never persists numbers for.
  */
object StoreLoad {
  case class Stats(n: Long, errors: Long, p50Ms: Double, p95Ms: Double,
      maxMs: Double) {
    def errorRate: Double = if (n == 0) 0.0 else errors.toDouble / n
  }
  case class Result(append: Stats, read: Stats, wallS: Double) {
    def json: String = {
      def s(st: Stats) =
        f"""{"n":${st.n},"errors":${st.errors},"p50_ms":${st.p50Ms}%.2f,""" +
          f""""p95_ms":${st.p95Ms}%.2f,"max_ms":${st.maxMs}%.2f}"""
      s"""{"metric":"store_load","append":${s(append)},""" +
        f""""read":${s(read)},"wall_s":$wallS%.2f}"""
    }
  }

  private def stats(lat: Seq[Double], errors: Long): Stats = {
    if (lat.isEmpty) return Stats(errors, errors, 0, 0, 0)
    val sorted = lat.sorted
    def pct(q: Double) =
      sorted(math.min(sorted.size - 1, math.ceil(q * sorted.size).toInt - 1)
        .max(0))
    Stats(lat.size + errors, errors, pct(0.50), pct(0.95), sorted.last)
  }

  /** Run `writers` appending threads and `readers` point-reading
    * threads against `store` for ~`seconds`. Each writer owns its own
    * streams (contended-stream CAS behavior is SoakSpec's subject, not
    * a latency test's); readers sample random committed offsets across
    * all streams, mixing in a stream listing every 50th op like the k6
    * read profile's occasional index hit. */
  def run(store: EventStore, seconds: Double, writers: Int = 2,
      readers: Int = 4, seed: Long = 7L): Result = {
    val user = "load-user"
    val streams = (0 until writers).map(w => s"load-$w")
    // preload one event per stream so readers always have a target
    streams.foreach(s => store.append(user, s,
      Seq(CloudEvent(id = s"seed-$s", source = "load://seed",
        `type` = "dev.graft.load"))))
    val committed = streams.map(s => s -> new AtomicLong(1L)).toMap
    val deadline = System.nanoTime() + (seconds * 1e9).toLong
    val t0 = System.nanoTime()

    final class Worker(val isWriter: Boolean, idx: Int) extends Thread {
      val lat = new ArrayBuffer[Double]()
      var errors = 0L
      private val rnd = new scala.util.Random(seed + idx)
      override def run(): Unit = {
        var i = 0L
        while (System.nanoTime() < deadline) {
          val s = streams(if (isWriter) idx % streams.size
            else rnd.nextInt(streams.size))
          val start = System.nanoTime()
          try {
            if (isWriter) {
              store.append(user, s, Seq(CloudEvent(
                id = s"w$idx-$i", source = s"load://w$idx",
                `type` = "dev.graft.load")))
              committed(s).incrementAndGet()
            } else if (i % 50 == 49) {
              store.streams(user) // the k6 profile's occasional listing
            } else {
              val head = committed(s).get()
              val off = rnd.nextLong(head)
              if (store.get(user, s, off).isEmpty)
                throw new IllegalStateException(
                  s"committed offset $off of $s unreadable")
            }
            lat += (System.nanoTime() - start) / 1e6
          } catch { case _: Exception => errors += 1 }
          i += 1
        }
      }
    }
    val workers = (0 until writers).map(new Worker(true, _)) ++
      (0 until readers).map(new Worker(false, _))
    workers.foreach(_.start())
    workers.foreach(_.join())
    val (w, r) = workers.partition(_.isWriter)
    Result(
      stats(w.flatMap(_.lat).toSeq, w.map(_.errors).sum),
      stats(r.flatMap(_.lat).toSeq, r.map(_.errors).sum),
      (System.nanoTime() - t0) / 1e9)
  }
}
