package graft.streaming

import graft.eventstore.{CloudEvent, EventStore, ExpectedRevision}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §7 step 4).
  *
  * Ingest: `readStream` over a drop directory of CloudEvents NDJSON
  * (the reference's wire format, one JSON object per line — reference
  * src/db.rs:205-210) → `foreachBatch` committing through the
  * EventStore append path, so streaming ingest gets the same CAS /
  * dedup / atomic-batch guarantees as batch append. Revision density is
  * preserved because foreachBatch serializes micro-batches and the
  * store serializes per-stream commits (single-writer rule).
  *
  * Analytics: watermarked tumbling/sliding/session windows — the
  * streaming shape of EventQueries' batch aggregates.
  */
object Streams {

  /** CloudEvents NDJSON wire schema + routing columns (user_id /
    * stream_id may ride as extension attributes or explicit fields). */
  val wireSchema: StructType = StructType(Seq(
    StructField("specversion", StringType),
    StructField("id", StringType),
    StructField("source", StringType),
    StructField("type", StringType),
    StructField("subject", StringType),
    StructField("time", TimestampType),
    StructField("datacontenttype", StringType),
    StructField("dataschema", StringType),
    StructField("data", StringType),
    StructField("data_base64", StringType),
    StructField("user_id", StringType),
    StructField("stream_id", StringType)))

  /** Known top-level CloudEvents keys; anything else on the wire is an
    * open extension attribute (reference openapi.yaml:86 — e.g.
    * `comexampleextension1`) and must roundtrip. */
  private val knownKeys: Set[String] = Set("specversion", "id", "source",
    "type", "subject", "time", "datacontenttype", "dataschema", "data",
    "data_base64", "user_id", "stream_id")

  /** Parse raw NDJSON lines into typed wire rows + an `extensions` map
    * of the unknown top-level attributes (schema-on-read twice: once
    * with the fixed envelope schema, once as map<string,string> to
    * harvest extras — both stay in the scan stage, no shuffle).
    * `data_base64` arrives base64-encoded per the CloudEvents JSON
    * format (reference openapi.yaml:81-86) and is decoded to bytes
    * here. With `keepRaw` the original line rides along as `_raw` (for
    * dead-letter capture of malformed input). */
  def parseWire(raw: DataFrame, lineCol: String = "value",
      keepRaw: Boolean = false): DataFrame = {
    val known = from_json(col(lineCol), wireSchema).as("e")
    val allKv = from_json(col(lineCol), MapType(StringType, StringType))
      .as("kv")
    val rawCols = if (keepRaw) Seq(col(lineCol).as("_raw")) else Nil
    raw.select(known +: allKv +: rawCols: _*)
      .select(col("e.*") +:
        map_filter(col("kv"), (k, _) => !k.isInCollection(knownKeys))
          .as("extensions") +:
        rawCols.map(_ => col("_raw")): _*)
      .withColumn("data_base64", unbase64(col("data_base64")))
  }

  /** Start streaming ingest: NDJSON files appearing under `inputDir` are
    * appended to their (user_id, stream_id) streams, open extension
    * attributes included.
    *
    * Event bytes never pass through the driver: each micro-batch is
    * committed by [[EventStore.ingestBatch]] — executors write the
    * per-stream revision-assigned parquet files, the driver handles
    * metadata only (per-stream counts, key hashes, manifest commits).
    * Re-delivered batches (foreachBatch is at-least-once on retry)
    * converge to exactly-once via the store's (source,id) digest.
    * Rows with no routing identity (null user_id / stream_id / id /
    * source, including fully malformed JSON lines) go to the
    * dead-letter directory instead of failing the query. */
  def startIngest(spark: SparkSession, store: EventStore, inputDir: String,
      checkpointDir: String, deadLetterDir: Option[String] = None,
      autoCompactAfter: Int = 16): StreamingQuery =
    parseWire(spark.readStream.text(inputDir), keepRaw = true)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.ingestBatch(batch, deadLetterDir, autoCompactAfter): Unit
      }
      .start()

  /** Streaming per-stream revision assignment with
    * flatMapGroupsWithState: each (user_id, stream_id) group keeps its
    * committed count as GroupState[Long], so revisions stay dense across
    * micro-batches without rescanning the store — the streaming analogue
    * of the reference's in-memory revision counter (src/db.rs:103-113
    * read under the stream mutex). State is per-key and partitioned by
    * the stream key: 1000 executors each own their key range. */
  def streamingRevisions(events: org.apache.spark.sql.Dataset[WireEvent])
      : org.apache.spark.sql.Dataset[RevisionedEvent] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(e => (e.user_id, e.stream_id))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (key: (String, String), batch: Iterator[WireEvent],
            state: GroupState[Long]) => {
          val start = state.getOption.getOrElse(0L)
          // stable intra-batch order: event time then id (arrival order
          // is per-partition in streaming; pin it like q20 does)
          val ordered = batch.toSeq.sortBy(e =>
            (Option(e.time).map(_.getTime).getOrElse(0L), e.id))
          val out = ordered.zipWithIndex.map { case (e, i) =>
            RevisionedEvent(key._1, key._2, start + i, e.id, e.source,
              e.`type`, Option(e.time))
          }
          state.update(start + out.size)
          out.iterator
        })
  }

  case class WireEvent(user_id: String, stream_id: String, id: String,
      source: String, `type`: String, time: java.sql.Timestamp)
  case class RevisionedEvent(user_id: String, stream_id: String,
      revision: Long, id: String, source: String, `type`: String,
      time: Option[java.sql.Timestamp])

  /** Tumbling event-time window aggregate with watermark. */
  def tumblingCounts(events: DataFrame, tsCol: String, width: String,
      watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Sliding window aggregate. */
  def slidingCounts(events: DataFrame, tsCol: String, width: String,
      slide: String, watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"))

  /** Session window (gap-based) aggregate — the streaming counterpart of
    * EventQueries.q24_sessionize's batch gaps-and-islands. */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"))

  /** Streaming exact dedup: drop re-deliveries of the same content
    * fingerprint, keeping only fingerprints whose event time is inside
    * the watermark horizon in state — the streaming twin of
    * Dedup.exactSurvivors for at-least-once upstream feeds (a kafka-ish
    * source re-delivering a document must not double-count it
    * downstream). `dropDuplicatesWithinWatermark` bounds state by the
    * watermark (plain dropDuplicates would grow state forever on an
    * unbounded corpus); dedup state partitions by fingerprint, so 1000
    * executors each own a hash range. */
  def dedupExact(events: DataFrame, tsCol: String, watermark: String,
      fingerprintCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(fingerprintCols)

  /** Streaming NEAR-duplicate detection: MinHash-LSH band flags as a
    * stateful stream — the streaming twin of Dedup.minhashLshPairs for
    * continuously-fed corpora. Each document's shingles run through the
    * SAME native LshBandHashes expression as the batch operator (band
    * hashes are bit-identical, so stream and batch agree on candidates),
    * each (band, bhash) bucket keeps the first document id it ever saw
    * as keyed state, and every arrival is emitted flagged with that
    * first id — a document is a near-dup candidate iff some band flags
    * it against an earlier document. Fold flags per micro-batch with
    * [[nearDupSurvivors]] in foreachBatch.
    *
    * Scale shape: state partitions by (band, bhash) — 1000 executors
    * each own a hash range of buckets; state per bucket is ONE long,
    * and buckets expire via event-time timeout once the watermark
    * passes their last activity + `stateTtl` (a template-text bucket
    * can't pin memory forever). The shingle→signature→band chain is
    * one native expression evaluation per row — the child is evaluated
    * once, not once per band (the HOF-composition recompute trap). */
  def nearDupFlags(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String, n: Int = 3, k: Int = 64,
      bands: Int = 32, stateTtlMs: Long = 30 * 60 * 1000L)
      : Dataset[NearDupFlag] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.GraftColumnBridge
    val ttlMs = stateTtlMs
    val bandArr = GraftColumnBridge.column(graft.expressions.LshBandHashes(
      GraftColumnBridge.expression(
        graft.functions.TextFunctions.distinctShingles(col(textCol), n)),
      k, bands))
    docs.withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        posexplode(bandArr).as(Seq("band", "bhash")))
      .as[BandObs]
      .groupByKey(o => (o.band, o.bhash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), batch: Iterator[BandObs],
            state: GroupState[Long]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // stable intra-batch order (arrival order is per-partition)
            val ordered = batch.toSeq.sortBy(o => (o.id, o.ts.getTime))
            val first = state.getOption.getOrElse(ordered.head.id)
            state.update(first)
            val maxTs = ordered.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(maxTs + ttlMs)
            ordered.iterator
              .map(o => NearDupFlag(o.id, key._1, first)).toSeq.iterator
          }
        })
  }

  /** foreachBatch companion of [[nearDupFlags]]: documents of one
    * micro-batch's flag set that are NOT near-dup candidates (no band
    * matched an earlier document). One small per-batch aggregate. */
  def nearDupSurvivors(flags: DataFrame): DataFrame =
    flags.groupBy(col("id"))
      .agg(max(when(col("firstId") =!= col("id"), 1L).otherwise(0L))
        .as("__dup"))
      .filter(col("__dup") === 0).select(col("id"))

  case class BandObs(id: Long, ts: java.sql.Timestamp, band: Int,
      bhash: Long)
  case class NearDupFlag(id: Long, band: Int, firstId: Long)

  /** Stream-stream inner join on a key within an event-time interval:
    * right rows join left rows whose timestamp is within [leftTs,
    * leftTs + within]. Both sides are watermarked so Spark can bound
    * the join state and emit/expire buffered rows — the streaming
    * correlation shape (e.g. click ↔ purchase attribution). State per
    * key is bounded by watermark + interval; partitioning is by the
    * join key, so 1000 executors each own their key range. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).as("l")
    val r = right.withWatermark(rightTs, watermark).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
  }

  /** Left-outer stream-stream interval join: like [[intervalJoin]] but
    * left rows with no right match within the interval are still
    * emitted (null-padded) once the watermark proves no match can
    * arrive — the attribution shape that keeps unconverted events.
    * Both watermarks bound the state exactly as in the inner case; the
    * outer row is emitted only when the right watermark passes
    * leftTs + within, so results are final, never retracted. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String, within: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).as("l")
    val r = right.withWatermark(rightTs, watermark).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"),
      "left_outer")
  }

  /** Streaming (source,id)-style dedup with bounded state:
    * dropDuplicatesWithinWatermark keeps each key only until the
    * watermark passes it, so state doesn't grow with the stream — the
    * streaming-analytics counterpart of the store's digest-based ingest
    * dedup (which is exact over all history because the digest is
    * persistent, not in-memory state). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming web-ingest cleanup: the r10 crawl operators composed as
    * ONE stateless projection — block-aware HTML→text (StripHtml per
    * block, since StripHtml alone collapses a page to a single line),
    * C4 line filter (cleanLines), outlink extraction +
    * canonicalization. Block-level closers (</p>, </div>, </li>, …)
    * and <br> become line boundaries BEFORE the per-block strip, so
    * the line filter sees the page's block structure. (Caveat: a
    * block closer inside a <script> string splits that script across
    * blocks; the blocklist words catch the common leak.) Every kernel
    * is per-row, so the same plan runs identically under batch and
    * readStream with no watermark, no state store, and append-mode
    * output (micro-batch cost is exactly the per-row codegen'd work —
    * this is the "clean as you crawl" deployment of the q109/q111/q113
    * batch gates). Emits (idCol passthrough, text, outlinks). */
  def webClean(pages: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 2,
      blocklist: Seq[String] = Seq("javascript", "cookie")): DataFrame = {
    import graft.functions.TextFunctions._
    val blocks = split(
      regexp_replace(col(htmlCol),
        "(?i)</(?:p|div|li|h[1-6]|tr|blockquote)>|<br\\s*/?>", "\u0000"),
      "\u0000")
    val text = array_join(
      filter(transform(blocks, b => stripHtml(b)), t => t =!= ""), "\n")
    pages.select(col(idCol),
      cleanLines(text, minWords, blocklist).as("text"),
      transform(extractLinks(col(htmlCol)),
        u => graft.functions.TextFunctions.canonicalizeUrl(u))
        .as("outlinks"))
  }

  case class HourCount(key: String, h: Long, n: Long)
  case class BurstFlag(key: String, bucket_hour: Long, n: Long,
      baseline: Long, is_burst: Boolean)
  case class BurstState(firstHour: Long, recent: Map[Long, Long])

  /** Streaming burst detection — the stateful streaming twin of
    * [[graft.operators.Anomaly.burstBuckets]]: per-key hourly arrival
    * counts flagged against the trailing-`trailing`-hour baseline, AS
    * THE STREAM RUNS. Two stages: a watermarked tumbling 1-hour count
    * (append mode — an hour is scored exactly once, when the
    * watermark finalizes it), then per-key trailing state in
    * `flatMapGroupsWithState`.
    *
    * Batch parity (spec-pinned): hours finalize in watermark order —
    * the watermark is monotone, so a key's hours arrive
    * non-decreasing across micro-batches, and several hours
    * finalizing in ONE batch are sorted before scoring (the
    * nearDupFlags intra-batch rule). Baselines therefore read exactly
    * the observed hours inside (h−trailing, h−1], empty hours
    * contribute zero, and hours earlier than firstHour + trailing are
    * withheld — the batch operator's contract, verbatim.
    *
    * Scale shape: state partitions by key (1000 executors each own a
    * key range) and holds at most `trailing` (hour, count) longs plus
    * a first-hour marker per key — bounded regardless of stream
    * length, because scored hours are evicted once they leave every
    * future baseline window. */
  case class CusumState(lastHour: Long, s: Long)
  case class CusumFlag(key: String, bucket_hour: Long, n: Long,
      allowance: Long, cusum: Long, is_alarm: Boolean)

  /** Streaming CUSUM drift detection — the stateful streaming twin of
    * [[graft.operators.Anomaly.cusumFlagsFixed]]: per key, Page's
    * recurrence S_t = max(0, S_{t−1} + n_t − k) maintained AS THE
    * STREAM RUNS over watermark-finalized tumbling hours. The batch
    * operator's prefix-scan identity exists to avoid a sequential
    * pass; a stream IS a sequential pass, so the state is simply
    * (lastScoredHour, S) — two longs per key, bounded forever — and a
    * gap of g empty hours drains max(0, S − k·g) before the next
    * observed hour scores (exactly the −k-per-empty-hour semantics
    * the batch identity encodes). Fixed allowance by construction: a
    * stream cannot know its future total, so the batch operator's
    * self-scaling k is meaningless here — take the deployed monitor's
    * configured k. Batch parity is spec-pinned row-for-row across a
    * 3-micro-batch replay (the [[seasonalBurstFlags]] discipline). */
  def cusumFlags(events: DataFrame, keyCol: String, tsCol: String,
      watermark: String, allowance: Long, threshold: Long)
      : org.apache.spark.sql.Dataset[CusumFlag] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(allowance > 0, s"allowance must be > 0, got $allowance")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val hourly = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("key"),
        expr("unix_timestamp(window.start) div 3600").as("h"), col("n"))
      .as[HourCount]
    hourly.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[HourCount],
            state: GroupState[CusumState]) => {
          // several hours can finalize in one micro-batch: score in
          // event-time order (the burstFlags intra-batch rule)
          val ordered = batch.toSeq.sortBy(_.h)
          var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L))
          val out = ordered.map { hc =>
            val drained =
              if (st.lastHour == Long.MinValue) 0L
              else {
                val gap = hc.h - st.lastHour - 1
                math.max(0L, st.s - allowance * gap)
              }
            val s = math.max(0L, drained + hc.n - allowance)
            st = CusumState(hc.h, s)
            CusumFlag(key, hc.h, hc.n, allowance, s, s > threshold)
          }
          state.update(st)
          out.iterator
        })
  }

  case class SlotCount(key: String, d: Long, hod: Long, n: Long)
  case class SeasonalBurstFlag(key: String, bucket_day: Long,
      hour_of_day: Long, n: Long, baseline: Long, is_burst: Boolean)
  case class SeasonalState(firstDay: Long, recent: Map[Long, Long])

  /** Streaming SEASONAL burst detection — the stateful streaming twin
    * of [[graft.operators.Anomaly.seasonalBurstBuckets]], exactly as
    * [[burstFlags]] twins `burstBuckets`: per (key, hour-of-day) slot,
    * each day's count is flagged against the same-hour-of-day trailing
    * `trailingDays` baseline AS THE STREAM RUNS. The state key gains
    * the hour-of-day dimension and the trailing index moves from hours
    * to days; everything else — watermark-finalized tumbling hours,
    * event-time-ordered intra-batch scoring, zero-contribution for
    * empty same-hour days, withheld under-covered early history — is
    * the batch operator's contract verbatim (spec-pinned row-for-row
    * across a 3-micro-batch replay).
    *
    * Scale shape: state partitions by (key, hour-of-day) — 24× more,
    * 24× smaller groups than [[burstFlags]] — and holds at most
    * `trailingDays` (day, count) longs plus a first-day marker per
    * slot: bounded regardless of stream length. */
  def seasonalBurstFlags(events: DataFrame, keyCol: String, tsCol: String,
      watermark: String, trailingDays: Int, factorNum: Long,
      factorDen: Long): org.apache.spark.sql.Dataset[SeasonalBurstFlag] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(trailingDays >= 1,
      s"trailingDays must be >= 1, got $trailingDays")
    require(factorNum > 0 && factorDen > 0,
      s"factor $factorNum/$factorDen must be positive")
    val hourly = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      // day index + hour-of-day via the batch operator's exact
      // expressions, applied to the (single-hour) window start
      .select(col("key"),
        expr("unix_timestamp(date_trunc('day', window.start)) div 86400")
          .as("d"),
        hour(col("window.start")).cast("long").as("hod"), col("n"))
      .as[SlotCount]
    hourly.groupByKey(hc => (hc.key, hc.hod))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (slot: (String, Long), batch: Iterator[SlotCount],
            state: GroupState[SeasonalState]) => {
          val (key, hod) = slot
          // several days can finalize in one micro-batch: score in
          // event-time order (the burstFlags intra-batch rule)
          val ordered = batch.toSeq.sortBy(_.d)
          var st = state.getOption
            .getOrElse(SeasonalState(Long.MaxValue, Map.empty))
          val out = ordered.flatMap { hc =>
            val first = math.min(st.firstDay, hc.d)
            val baseline = st.recent.iterator
              .filter { case (dd, _) =>
                dd >= hc.d - trailingDays && dd <= hc.d - 1 }
              .map(_._2).sum
            val emit =
              if (hc.d >= first + trailingDays)
                Some(SeasonalBurstFlag(key, hc.d, hod, hc.n, baseline,
                  hc.n * trailingDays * factorDen > factorNum * baseline))
              else None
            st = SeasonalState(first,
              (st.recent + (hc.d -> hc.n))
                .filter { case (dd, _) => dd >= hc.d - trailingDays + 1 })
            emit
          }
          state.update(st)
          out.iterator
        })
  }

  def burstFlags(events: DataFrame, keyCol: String, tsCol: String,
      watermark: String, trailing: Int, factorNum: Long,
      factorDen: Long): org.apache.spark.sql.Dataset[BurstFlag] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(trailing >= 1, s"trailing must be >= 1, got $trailing")
    require(factorNum > 0 && factorDen > 0,
      s"factor $factorNum/$factorDen must be positive")
    val hourly = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("key"),
        expr("unix_timestamp(window.start) div 3600").as("h"), col("n"))
      .as[HourCount]
    hourly.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[HourCount],
            state: GroupState[BurstState]) => {
          // several hours can finalize in one micro-batch: score in
          // event-time order (the nearDupFlags intra-batch rule)
          val ordered = batch.toSeq.sortBy(_.h)
          var st = state.getOption
            .getOrElse(BurstState(Long.MaxValue, Map.empty))
          val out = ordered.flatMap { hc =>
            val first = math.min(st.firstHour, hc.h)
            val baseline = st.recent.iterator
              .filter { case (hh, _) =>
                hh >= hc.h - trailing && hh <= hc.h - 1 }
              .map(_._2).sum
            val emit =
              if (hc.h >= first + trailing)
                Some(BurstFlag(key, hc.h, hc.n, baseline,
                  hc.n * trailing * factorDen > factorNum * baseline))
              else None
            st = BurstState(first,
              (st.recent + (hc.h -> hc.n))
                .filter { case (hh, _) => hh >= hc.h - trailing + 1 })
            emit
          }
          state.update(st)
          out.iterator
        })
  }

  case class ThetaRow(grp: String, h: Long)
  case class ThetaEstimateRow(grp: String, n_retained: Long,
      theta_h: Long, est: Long)
  case class ThetaState(hashes: Array[Long])

  /** Streaming theta/KMV distinct estimation — the stateful streaming
    * twin of [[graft.operators.Sketch.thetaSketch]] +
    * [[graft.operators.Sketch.thetaEstimate]]: per group, the k
    * smallest distinct hashes maintained AS THE STREAM RUNS, emitting
    * the group's updated (n_retained, theta_h, est) after every
    * micro-batch that touches it (Update mode — a distinct count has
    * no watermark-finalization moment; the estimate is always "as of
    * the data seen"). The merge step per micro-batch IS
    * [[graft.operators.Sketch.thetaMerge]]'s union-then-rank, applied
    * to (state, batch), so stream == batch holds bit-exactly at every
    * prefix of the stream — spec-pinned across a 3-micro-batch replay
    * (the [[cusumFlags]] discipline).
    *
    * Scale shape: state is at most k longs per group, FOREVER — the
    * reason theta sketches are the streaming distinct-count structure:
    * a billion new keys change at most which k hashes are retained.
    * Hashing rides the same md5 chain as the batch operator, so a
    * batch replay of the stream's input reproduces every emission. */
  def thetaDistinct(rows: DataFrame, grpCol: String, keyCol: String,
      k: Int): org.apache.spark.sql.Dataset[ThetaEstimateRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 2, s"theta sketch needs k >= 2, got $k")
    val hashed = rows
      .filter(col(grpCol).isNotNull && col(keyCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        graft.operators.Sketch.thetaHash(col(keyCol)).as("h"))
      .as[ThetaRow]
    hashed.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[ThetaRow],
            state: GroupState[ThetaState]) => {
          val cur = state.getOption.map(_.hashes)
            .getOrElse(Array.empty[Long])
          val merged = (cur ++ batch.map(_.h)).distinct.sorted.take(k)
          state.update(ThetaState(merged))
          val n = merged.length
          val (thetaH, est) =
            if (n < k) (graft.operators.Sketch.ThetaM, n.toLong)
            else (merged.last,
              (k - 1).toLong * graft.operators.Sketch.ThetaM / merged.last)
          Iterator.single(ThetaEstimateRow(grp, n.toLong, thetaH, est))
        })
  }

  case class PaneThetaInRow(grp: String, pane: Long, h: Long)
  case class PaneWindowRow(grp: String, win_start: Long,
      n_retained: Long, theta_h: Long, est: Long)
  case class PaneThetaState(panes: Array[Long],
      sketches: Array[Array[Long]])

  /** Streaming PANED sliding-window theta distinct with per-window
    * pane RETIREMENT — the stateful streaming twin of
    * [[graft.operators.Sketch.thetaPaneSketch]] +
    * [[graft.operators.Sketch.thetaPaneWindows]] (Li et al.'s "No
    * pane, no gain" panes as streaming state): per group, one
    * k-smallest sketch per slide-width pane, retired the moment the
    * pane falls out of the latest window — so state is AT MOST
    * panesPerWindow·k longs per group FOREVER, the bounded-state
    * sliding distinct that q236's replicate-data shape cannot give a
    * stream. After every micro-batch each touched group emits the
    * LATEST complete window (win_start = maxPane −
    * (panesPerWindow−1)·slide): its pane-merged (n_retained, theta_h,
    * est), which equals the batch pane path — and therefore the
    * direct window sketch — bit-exactly at every stream prefix
    * (spec-pinned across a 3-micro-batch chronological replay, the
    * [[thetaDistinct]] discipline).
    *
    * Late data beyond the retained horizon (pane < the latest
    * window's start) is DROPPED — the watermark analogue, documented
    * rather than silent: a pane that has retired cannot un-retire
    * without unbounded state. `paneCol` is the pane start (epoch
    * micros floored to the slide upstream, multiples of
    * slideMicros). */
  def thetaPaneDistinct(rows: DataFrame, grpCol: String,
      keyCol: String, paneCol: String, slideMicros: Long,
      panesPerWindow: Int, k: Int)
      : org.apache.spark.sql.Dataset[PaneWindowRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 2, s"theta sketch needs k >= 2, got $k")
    require(slideMicros > 0, s"slide must be > 0, got $slideMicros")
    require(panesPerWindow >= 1,
      s"panesPerWindow must be >= 1, got $panesPerWindow")
    val M = graft.operators.Sketch.ThetaM
    val hashed = rows
      .filter(col(grpCol).isNotNull && col(keyCol).isNotNull &&
        col(paneCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        col(paneCol).cast("long").as("pane"),
        graft.operators.Sketch.thetaHash(col(keyCol)).as("h"))
      .as[PaneThetaInRow]
    hashed.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[PaneThetaInRow],
            state: GroupState[PaneThetaState]) => {
          val st = state.getOption
            .getOrElse(PaneThetaState(Array.empty, Array.empty))
          val cur = st.panes.zip(st.sketches).toMap
          val add = batch.toArray.groupBy(_.pane)
          val maxPane = (cur.keySet ++ add.keySet).max
          val minKeep =
            maxPane - (panesPerWindow - 1).toLong * slideMicros
          val merged = (cur.keySet ++ add.keySet)
            .filter(_ >= minKeep).toArray.sorted.map { p =>
              p -> (cur.getOrElse(p, Array.empty[Long]) ++
                add.getOrElse(p, Array.empty[PaneThetaInRow]).map(_.h))
                .distinct.sorted.take(k)
            }
          state.update(PaneThetaState(merged.map(_._1),
            merged.map(_._2)))
          val win = merged.flatMap(_._2).distinct.sorted.take(k)
          val n = win.length
          val (thetaH, est) =
            if (n < k) (M, n.toLong)
            else (win.last, (k - 1).toLong * M / win.last)
          Iterator.single(PaneWindowRow(grp, minKeep, n.toLong,
            thetaH, est))
        })
  }

  case class ThetaSideRow(grp: String, side: String, h: Long)
  case class ThetaSetOpsRow(grp: String, theta_h: Long, n_common: Long,
      est_inter: Long, n_union: Long, est_union: Long,
      n_only_a: Long, est_only_a: Long, n_only_b: Long,
      est_only_b: Long)
  case class ThetaPairState(a: Array[Long], b: Array[Long])

  /** Streaming theta SET OPS over TWO keyed streams — the stateful
    * streaming twin of [[graft.operators.Sketch.thetaSetOpPairs]] for
    * the A-vs-B shape (today's crawl vs the lake, experiment vs
    * control, two regions' key spaces): per group, each stream's k
    * smallest distinct hashes maintained independently as the streams
    * run, emitting the group's updated
    * union/intersection/both-differences estimates after every
    * micro-batch that touches it (Update mode). The per-batch step per
    * side IS [[graft.operators.Sketch.thetaMerge]]'s union-then-rank on
    * (state, batch), and the set algebra evaluates EXACTLY as the batch
    * operator — below-min(theta) counts, inclusion-exclusion on exact
    * retained counts (never estimate subtraction), identical
    * multiply-then-floor scaling — so stream == batch holds bit-exactly
    * at every prefix of the two streams (spec-pinned across a
    * 3-micro-batch replay, the [[thetaDistinct]] discipline).
    *
    * Scale shape: state is at most 2k longs per group FOREVER; a
    * billion new keys on either stream change only which hashes are
    * retained. */
  def thetaSetOps(rowsA: DataFrame, rowsB: DataFrame, grpCol: String,
      keyCol: String, k: Int)
      : org.apache.spark.sql.Dataset[ThetaSetOpsRow] = {
    import rowsA.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 2, s"theta sketch needs k >= 2, got $k")
    val M = graft.operators.Sketch.ThetaM
    def tagged(rows: DataFrame, side: String) = rows
      .filter(col(grpCol).isNotNull && col(keyCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        lit(side).as("side"),
        graft.operators.Sketch.thetaHash(col(keyCol)).as("h"))
    val hashed = tagged(rowsA, "a").unionByName(tagged(rowsB, "b"))
      .as[ThetaSideRow]
    hashed.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[ThetaSideRow],
            state: GroupState[ThetaPairState]) => {
          val st = state.getOption
            .getOrElse(ThetaPairState(Array.empty, Array.empty))
          val (ba, bb) = batch.toArray.partition(_.side == "a")
          def merge(cur: Array[Long], add: Array[ThetaSideRow]) =
            (cur ++ add.map(_.h)).distinct.sorted.take(k)
          val a = merge(st.a, ba)
          val b = merge(st.b, bb)
          state.update(ThetaPairState(a, b))
          val thetaA = if (a.length < k) M else a.last
          val thetaB = if (b.length < k) M else b.last
          val theta = math.min(thetaA, thetaB)
          val nab = a.count(_ <= theta).toLong
          val nbb = b.count(_ <= theta).toLong
          val bSet = b.toSet
          val nCommon = a.count(h => h <= theta && bSet(h)).toLong
          def scaled(cnt: Long): Long =
            if (a.length < k && b.length < k) cnt
            else cnt * M / theta
          val nUnion = nab + nbb - nCommon
          Iterator.single(ThetaSetOpsRow(grp, theta,
            nCommon, scaled(nCommon), nUnion, scaled(nUnion),
            nab - nCommon, scaled(nab - nCommon),
            nbb - nCommon, scaled(nbb - nCommon)))
        })
  }

  case class HdrRow(grp: String, lb: Long, w: Long)
  case class HdrQuantileRow(grp: String, permille: Int, n: Long,
      est_lb: Long, est_ub: Long)
  case class HdrState(lbs: Array[Long], cnts: Array[Long])

  /** JVM twin of [[graft.operators.Sketch.hdrWidth]] — identical by
    * construction (floor(log2 v) via numberOfLeadingZeros == bin-length
    * arithmetic); the stream==batch spec pins the equality. */
  private def hdrWidthJvm(v: Long, b: Int): Long = {
    val e = if (v <= 0L) 0 else 63 - java.lang.Long.numberOfLeadingZeros(v)
    if (e <= b) 1L else 1L << (e - b)
  }

  /** Streaming HDR quantile brackets — the stateful streaming twin of
    * [[graft.operators.Sketch.hdrSketch]] +
    * [[graft.operators.Sketch.hdrQuantiles]]: per group, the bucket
    * histogram maintained AS THE STREAM RUNS, emitting every
    * permille's updated (n, est_lb, est_ub) after each micro-batch
    * that touches the group (Update mode — a running quantile has no
    * watermark-finalization moment; the bracket is always "as of the
    * data seen"). The per-batch step is [[graft.operators.Sketch.hdrMerge]]'s
    * cell-wise sum applied to (state, batch), so stream == batch holds
    * bit-exactly at every prefix — spec-pinned across a 3-micro-batch
    * replay (the [[thetaDistinct]] discipline).
    *
    * Scale shape: state is at most (64−b)·2^b (cnt, lb) pairs per
    * group FOREVER (b=5 → ≤ ~1.9k longs) — the latency-dashboard
    * structure: a billion new observations change bucket counts, never
    * the state's size. Buckets ride the same integer arithmetic as the
    * batch operator, so a batch replay of the stream's input
    * reproduces every emission. */
  def hdrQuantiles(rows: DataFrame, grpCol: String, valCol: String,
      b: Int, permilles: Seq[Int], weightCol: Option[String] = None)
      : org.apache.spark.sql.Dataset[HdrQuantileRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(b >= 1 && b <= 20, s"hdr sketch needs 1 <= b <= 20, got $b")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000], got $permilles")
    val v = col(valCol).cast("long")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val bucketed = rows
      .filter(col(grpCol).isNotNull && v.isNotNull && v >= 0 &&
        w.isNotNull && w >= 0)
      .select(col(grpCol).cast("string").as("grp"),
        graft.operators.Sketch.hdrBucketLb(v, b).as("lb"), w.as("w"))
      .as[HdrRow]
    bucketed.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[HdrRow],
            state: GroupState[HdrState]) => {
          val cur = state.getOption
            .map(s => s.lbs.zip(s.cnts).toMap)
            .getOrElse(Map.empty[Long, Long])
          val upd = batch.foldLeft(cur) { (m, r) =>
            m.updated(r.lb, m.getOrElse(r.lb, 0L) + r.w) }
          val sorted = upd.toArray.sortBy(_._1)
          state.update(HdrState(sorted.map(_._1), sorted.map(_._2)))
          val n = sorted.iterator.map(_._2).sum
          if (n == 0L) Iterator.empty
          else permilles.iterator.map { p =>
            val rk = math.max(1L, (p.toLong * n + 999L) / 1000L)
            var cum = 0L
            var i = 0
            while (cum < rk) { cum += sorted(i)._2; i += 1 }
            val lbv = sorted(i - 1)._1
            HdrQuantileRow(grp, p, n, lbv, lbv + hdrWidthJvm(lbv, b) - 1)
          }
        })
  }

  case class DecayInRow(key: String, idx: Long)
  case class DecayTrendRow(key: String, n_events: Long,
      decayed_fp: Long, decayed: Double)
  case class DecayState(total: Long, idxs: Array[Long],
      counts: Array[Long])

  /** Streaming exponentially-decayed trending counts — the stateful
    * streaming twin of
    * [[graft.operators.Anomaly.decayedCountsAligned]]: per key, the
    * dyadic "what is hot RIGHT NOW" score maintained as the stream
    * runs, emitting the key's updated (n_events, decayed_fp, decayed)
    * after every micro-batch that touches it (Update mode — the
    * score's horizon is the key's own latest bucket, so it only
    * changes when the key does).
    *
    * State per key: the total event count plus one count per absolute
    * bucket index within maxBuckets of the key's max bucket — at most
    * maxBuckets + 2 longs per key FOREVER. Buckets that fall out of
    * the horizon retire (their weight is 0 from then on — the horizon
    * only advances); late events landing beyond it still count in
    * n_events but carry zero weight, exactly as the batch fold
    * weighs them. Because the batch form's ages are absolute-bucket
    * differences, every emission equals
    * decayedCountsAligned(prefix-of-stream) bit-exactly — the
    * [[thetaDistinct]] stream==batch discipline, spec-pinned across a
    * chronological 3-micro-batch replay WITH a late-data batch.
    *
    * Same envelope as the batch operator: a decayed_fp past 2^63−1
    * throws (loudly) rather than wrapping. */
  def decayedTrend(rows: DataFrame, keyCol: String, tsCol: String,
      bucketMicros: Long, maxBuckets: Int = 40)
      : org.apache.spark.sql.Dataset[DecayTrendRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(bucketMicros > 0, s"bucket must be > 0, got $bucketMicros")
    require(maxBuckets >= 1 && maxBuckets <= 40,
      s"maxBuckets $maxBuckets out of [1, 40]")
    val base = rows
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        expr(s"unix_micros(`$tsCol`) DIV ${bucketMicros}L").as("idx"))
      .as[DecayInRow]
    base.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[DecayInRow],
            state: GroupState[DecayState]) => {
          val st = state.getOption
            .getOrElse(DecayState(0L, Array.empty, Array.empty))
          var total = st.total
          val m = scala.collection.mutable.LongMap[Long]()
          st.idxs.indices.foreach(i => m(st.idxs(i)) = st.counts(i))
          var maxIdx =
            if (st.idxs.isEmpty) Long.MinValue else st.idxs.max
          batch.foreach { r =>
            total += 1L
            if (r.idx > maxIdx) maxIdx = r.idx
            m(r.idx) = m.getOrElse(r.idx, 0L) + 1L
          }
          val kept = m.toArray
            .filter { case (i, _) => i >= maxIdx - maxBuckets }
            .sortBy(_._1)
          state.update(DecayState(total, kept.map(_._1),
            kept.map(_._2)))
          var fp = BigInt(0)
          kept.foreach { case (i, c) =>
            fp += BigInt(c) << (maxBuckets - (maxIdx - i)).toInt }
          if (!fp.isValidLong) throw new ArithmeticException(
            s"decayedTrend: decayed_fp overflows long for key $key")
          Iterator.single(DecayTrendRow(key, total, fp.toLong,
            fp.toLong.toDouble / math.pow(2.0, maxBuckets)))
        })
  }

  case class MsprtInRow(grp: String, arm: Int, v: Long, ord: Long,
      id: Long)
  case class MsprtDecisionRow(grp: String, look: Long, delta: Long,
      rejected: Boolean, rejected_any: Boolean, av_p_permille: Long)
  case class MsprtState(nSeen: Array[Long], cumSum: Array[Long],
      lookSums: Array[Array[Long]], emitted: Int, rejectedAny: Boolean,
      avP: Long)

  /** Streaming mSPRT — the stateful streaming twin of
    * [[graft.operators.Stats.msprtCuped]], and the reason the test
    * exists at all: always-valid p-values are THE live-dashboard
    * experiment readout (peek after every micro-batch, stop the
    * moment the boundary is crossed, no alpha spent on peeking). Per
    * group, per-arm unit counts and running sums of the CUPED
    * composite v = θDen·y − θNum·x are maintained as units arrive;
    * when BOTH arms cross a look boundary n, the look emits its
    * (delta, rejected, rejected_any, av_p_permille) — computed from
    * the same [[graft.operators.Stats.msprtThreshold]] boundaries, as
    * exact BigInt comparisons, so the emitted rows equal the batch
    * operator on the stream's prefix EXACTLY (spec-pinned across a
    * chronological 3-micro-batch replay).
    *
    * Ordering contract: the batch twin takes each arm's first n units
    * in (orderCol, idCol) order; this stream consumes units in
    * arrival order, sorting within each micro-batch by (ord, id).
    * Under in-order delivery (the [[cusumFlags]] chronological
    * contract) stream == batch; under disorder the stream is still a
    * valid mSPRT — a look is "what you had when you looked", and
    * always-valid p-values stay valid under ANY stopping/peeking
    * pattern (that is their point) — it just stops matching the
    * batch replay's ordering.
    *
    * State per group: 2 counts + 2 running sums + one recorded sum
    * per (arm, reached look) — ≤ 4 + 2·|looks| longs FOREVER
    * (|looks| ≤ 32). */
  def msprtDecisions(rows: DataFrame, grpCol: String,
      variant01: String, yCol: String, xCol: String, orderCol: String,
      idCol: String, looks: Seq[Long], thetaNum: Long, thetaDen: Long,
      sigma2: Double, tau2: Double, alphaPermille: Int = 50)
      : org.apache.spark.sql.Dataset[MsprtDecisionRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(looks.nonEmpty && looks.size <= 32 &&
      looks == looks.sorted && looks.distinct == looks &&
      looks.head >= 1,
      s"looks must be <= 32 strictly increasing positives, got $looks")
    require(thetaDen > 0, s"thetaDen must be > 0, got $thetaDen")
    require(sigma2 > 0 && tau2 > 0, "sigma2/tau2 must be > 0")
    require(alphaPermille >= 1 && alphaPermille <= 500,
      s"alpha permille $alphaPermille out of [1, 500]")
    val caller = graft.operators.Stats
      .msprtThreshold(_: Long, sigma2, tau2, _: Int)
    val critMain = looks.map(n => caller(n, alphaPermille))
    val critLadder = graft.operators.Stats.MsprtLadder.map(a =>
      a -> looks.map(n => caller(n, a))).toMap
    val base = rows
      .filter(col(grpCol).isNotNull &&
        // cast BEFORE isin, matching msprtCuped's arm coercion — a
        // raw-column isin would retain different rows for non-integer
        // variant columns (DOUBLE 0.5 truncates to 0), breaking the
        // documented stream==batch prefix equality (ADVICE r17)
        col(variant01).cast("int").isin(0, 1) &&
        col(yCol).isNotNull && col(xCol).isNotNull &&
        col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        col(variant01).cast("int").as("arm"),
        (col(yCol).cast("long") * thetaDen -
          col(xCol).cast("long") * thetaNum).as("v"),
        col(orderCol).cast("long").as("ord"),
        col(idCol).cast("long").as("id"))
      .as[MsprtInRow]
    base.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[MsprtInRow],
            state: GroupState[MsprtState]) => {
          val st = state.getOption.getOrElse(MsprtState(
            Array(0L, 0L), Array(0L, 0L),
            Array(Array.fill(looks.size)(0L),
              Array.fill(looks.size)(0L)),
            0, rejectedAny = false, avP = 1000L))
          val nSeen = st.nSeen.clone()
          val cumSum = st.cumSum.clone()
          val lookSums = st.lookSums.map(_.clone())
          var emitted = st.emitted
          var rejAny = st.rejectedAny
          var avP = st.avP
          val out = scala.collection.mutable.ArrayBuffer
            .empty[MsprtDecisionRow]
          batch.toArray.sortBy(r => (r.ord, r.id)).foreach { r =>
            val a = r.arm
            nSeen(a) += 1L
            cumSum(a) = Math.addExact(cumSum(a), r.v) // loud overflow
            // record the arm's sum the instant it reaches a boundary
            val li = looks.indexOf(nSeen(a))
            if (li >= 0) lookSums(a)(li) = cumSum(a)
            // emit every look both arms have now completed, in order
            while (emitted < looks.size &&
                nSeen(0) >= looks(emitted) &&
                nSeen(1) >= looks(emitted)) {
              val i = emitted
              val delta =
                Math.subtractExact(lookSums(1)(i), lookSums(0)(i))
              val d2 = BigInt(delta) * BigInt(delta)
              val rej = d2 >= critMain(i)
              rejAny ||= rej
              val pNow = graft.operators.Stats.MsprtLadder
                .find(a0 => d2 >= critLadder(a0)(i))
                .map(_.toLong).getOrElse(1000L)
              avP = math.min(avP, pNow)
              out += MsprtDecisionRow(grp, looks(i), delta, rej,
                rejAny, avP)
              emitted += 1
            }
          }
          state.update(MsprtState(nSeen, cumSum, lookSums, emitted,
            rejAny, avP))
          out.iterator
        })
  }

  case class MsprtRatioInRow(grp: String, arm: Int, nu: Long, de: Long,
      ord: Long, id: Long)
  case class MsprtRatioRow(grp: String, look: Long, delta_num: Long,
      rejected: Boolean, rejected_any: Boolean, av_p_permille: Long)
  case class MsprtRatioState(nSeen: Array[Long], cumNum: Array[Long],
      cumDen: Array[Long], lookNums: Array[Array[Long]],
      lookDens: Array[Array[Long]], emitted: Int, rejectedAny: Boolean,
      avP: Long)

  /** Streaming ratio-metric mSPRT — the stateful streaming twin of
    * [[graft.operators.Stats.msprtRatio]]: always-valid sequential
    * testing for the ratio metrics (clicks-per-view, tokens-per-char)
    * a live experiment dashboard actually charts. Same state machine
    * as [[msprtDecisions]] with TWO running sums per arm (numerator
    * and denominator); when both arms complete a look, the
    * cross-multiplied boundary test
    * ((StXc−ScXt)(Xt+Xc))² ≥ C(n,α)·(2XtXc)² evaluates in exact
    * BigInt arithmetic against the same
    * [[graft.operators.Stats.msprtThreshold]] literals, so emitted
    * rows equal the batch operator on the stream's prefix EXACTLY
    * under in-order delivery (spec-pinned). A completed look whose
    * denominator sum is zero on either arm is SKIPPED without
    * emitting, matching the batch row set; negative denominators
    * throw loudly (an exposure count cannot be negative).
    *
    * State per group: 2 counts + 4 running sums + two recorded sums
    * per (arm, reached look) — ≤ 6 + 4·|looks| longs FOREVER. */
  def msprtRatioDecisions(rows: DataFrame, grpCol: String,
      variant01: String, numCol: String, denCol: String,
      orderCol: String, idCol: String, looks: Seq[Long],
      sigma2: Double, tau2: Double, alphaPermille: Int = 50)
      : org.apache.spark.sql.Dataset[MsprtRatioRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(looks.nonEmpty && looks.size <= 32 &&
      looks == looks.sorted && looks.distinct == looks &&
      looks.head >= 1,
      s"looks must be <= 32 strictly increasing positives, got $looks")
    require(sigma2 > 0 && tau2 > 0, "sigma2/tau2 must be > 0")
    require(alphaPermille >= 1 && alphaPermille <= 500,
      s"alpha permille $alphaPermille out of [1, 500]")
    val caller = graft.operators.Stats
      .msprtThreshold(_: Long, sigma2, tau2, _: Int)
    val critMain = looks.map(n => caller(n, alphaPermille))
    val critLadder = graft.operators.Stats.MsprtLadder.map(a =>
      a -> looks.map(n => caller(n, a))).toMap
    val base = rows
      .filter(col(grpCol).isNotNull &&
        // cast BEFORE isin — the batch twin's arm coercion (ADVICE r17)
        col(variant01).cast("int").isin(0, 1) &&
        col(numCol).isNotNull && col(denCol).isNotNull &&
        col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        col(variant01).cast("int").as("arm"),
        col(numCol).cast("long").as("nu"),
        col(denCol).cast("long").as("de"),
        col(orderCol).cast("long").as("ord"),
        col(idCol).cast("long").as("id"))
      .as[MsprtRatioInRow]
    base.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[MsprtRatioInRow],
            state: GroupState[MsprtRatioState]) => {
          val st = state.getOption.getOrElse(MsprtRatioState(
            Array(0L, 0L), Array(0L, 0L), Array(0L, 0L),
            Array(Array.fill(looks.size)(0L),
              Array.fill(looks.size)(0L)),
            Array(Array.fill(looks.size)(0L),
              Array.fill(looks.size)(0L)),
            0, rejectedAny = false, avP = 1000L))
          val nSeen = st.nSeen.clone()
          val cumNum = st.cumNum.clone()
          val cumDen = st.cumDen.clone()
          val lookNums = st.lookNums.map(_.clone())
          val lookDens = st.lookDens.map(_.clone())
          var emitted = st.emitted
          var rejAny = st.rejectedAny
          var avP = st.avP
          val out = scala.collection.mutable.ArrayBuffer
            .empty[MsprtRatioRow]
          batch.toArray.sortBy(r => (r.ord, r.id)).foreach { r =>
            require(r.de >= 0, "msprtRatioDecisions: denominator " +
              "must be >= 0 (an exposure count)")
            val a = r.arm
            nSeen(a) += 1L
            cumNum(a) = Math.addExact(cumNum(a), r.nu) // loud overflow
            cumDen(a) = Math.addExact(cumDen(a), r.de)
            val li = looks.indexOf(nSeen(a))
            if (li >= 0) {
              lookNums(a)(li) = cumNum(a)
              lookDens(a)(li) = cumDen(a)
            }
            while (emitted < looks.size &&
                nSeen(0) >= looks(emitted) &&
                nSeen(1) >= looks(emitted)) {
              val i = emitted
              val (sT, xT) = (lookNums(1)(i), lookDens(1)(i))
              val (sC, xC) = (lookNums(0)(i), lookDens(0)(i))
              if (xT > 0 && xC > 0) {
                val av = BigInt(sT) * BigInt(xC) - BigInt(sC) * BigInt(xT)
                require(av.isValidLong, "msprtRatioDecisions: " +
                  "ratio-delta numerator overflows long — rescale")
                val p = av * (BigInt(xT) + BigInt(xC))
                val q = BigInt(2) * BigInt(xT) * BigInt(xC)
                val p2 = p * p; val q2 = q * q
                val rej = p2 >= critMain(i) * q2
                rejAny ||= rej
                val pNow = graft.operators.Stats.MsprtLadder
                  .find(a0 => p2 >= critLadder(a0)(i) * q2)
                  .map(_.toLong).getOrElse(1000L)
                avP = math.min(avP, pNow)
                out += MsprtRatioRow(grp, looks(i), av.toLong, rej,
                  rejAny, avP)
              } // zero-denominator look: no ratio — skip, matching batch
              emitted += 1
            }
          }
          state.update(MsprtRatioState(nSeen, cumNum, cumDen,
            lookNums, lookDens, emitted, rejAny, avP))
          out.iterator
        })
  }

  case class GsInRow(grp: String, arm: Int, v: Long, ord: Long,
      id: Long)
  case class GsDecisionRow(grp: String, look: Long, delta: Long,
      rejected: Boolean, rejected_any: Boolean)
  case class GsState(nSeen: Array[Long], cumSum: Array[Long],
      lookSums: Array[Array[Long]], emitted: Int, rejectedAny: Boolean)

  /** Streaming group-sequential testing — the stateful streaming twin
    * of [[graft.operators.Stats.groupSequential]], completing the
    * live-experimentation pair next to [[msprtDecisions]]: the
    * PLANNED-interim-analysis design (O'Brien-Fleming or Pocock
    * boundaries) evaluated the moment each balanced look completes
    * in-stream. Same state machine as the mSPRT twin — per-arm counts
    * and running sums, each arm's sum recorded the instant it crosses
    * a look boundary, looks emitted once both arms arrive — with the
    * boundary comparison against [[graft.operators.Stats.gsThreshold]]
    * literals as exact BigInt arithmetic, so emitted rows equal the
    * batch operator on the stream's prefix EXACTLY under in-order
    * delivery (spec-pinned across a chronological replay incl. late
    * units). Unlike mSPRT, a group-sequential design is only valid at
    * its K pre-planned looks — peeking between looks is exactly what
    * the boundary constants price in, and the stream takes no extra
    * looks: it emits precisely the planned ones.
    *
    * State per group: 2 counts + 2 running sums + one recorded sum
    * per (arm, reached look) — ≤ 4 + 2·K longs FOREVER (K ≤ 5). */
  def gsDecisions(rows: DataFrame, grpCol: String, variant01: String,
      yCol: String, orderCol: String, idCol: String, looks: Seq[Long],
      sigma2: Double, alphaPermille: Int = 50,
      pocock: Boolean = false)
      : org.apache.spark.sql.Dataset[GsDecisionRow] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(looks.nonEmpty && looks.size <= 5 &&
      looks == looks.sorted && looks.distinct == looks &&
      looks.head >= 1,
      s"looks must be <= 5 strictly increasing positives, got $looks")
    require(looks.zipWithIndex.forall { case (n, i) =>
        n == looks.head * (i + 1) },
      s"looks must be equally spaced, got $looks")
    val crit = looks.map(n => graft.operators.Stats.gsThreshold(
      looks.size, n, looks.max, sigma2, alphaPermille, pocock))
    val base = rows
      .filter(col(grpCol).isNotNull &&
        col(variant01).cast("int").isin(0, 1) &&
        col(yCol).isNotNull && col(orderCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        col(variant01).cast("int").as("arm"),
        col(yCol).cast("long").as("v"),
        col(orderCol).cast("long").as("ord"),
        col(idCol).cast("long").as("id"))
      .as[GsInRow]
    base.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[GsInRow],
            state: GroupState[GsState]) => {
          val st = state.getOption.getOrElse(GsState(
            Array(0L, 0L), Array(0L, 0L),
            Array(Array.fill(looks.size)(0L),
              Array.fill(looks.size)(0L)),
            0, rejectedAny = false))
          val nSeen = st.nSeen.clone()
          val cumSum = st.cumSum.clone()
          val lookSums = st.lookSums.map(_.clone())
          var emitted = st.emitted
          var rejAny = st.rejectedAny
          val out = scala.collection.mutable.ArrayBuffer
            .empty[GsDecisionRow]
          batch.toArray.sortBy(r => (r.ord, r.id)).foreach { r =>
            val a = r.arm
            nSeen(a) += 1L
            cumSum(a) = Math.addExact(cumSum(a), r.v) // loud overflow
            val li = looks.indexOf(nSeen(a))
            if (li >= 0) lookSums(a)(li) = cumSum(a)
            while (emitted < looks.size &&
                nSeen(0) >= looks(emitted) &&
                nSeen(1) >= looks(emitted)) {
              val i = emitted
              val delta =
                Math.subtractExact(lookSums(1)(i), lookSums(0)(i))
              val rej = BigInt(delta) * BigInt(delta) >= crit(i)
              rejAny ||= rej
              out += GsDecisionRow(grp, looks(i), delta, rej, rejAny)
              emitted += 1
            }
          }
          state.update(GsState(nSeen, cumSum, lookSums, emitted,
            rejAny))
          out.iterator
        })
  }

  /** One micro-batch of the streaming media decode: the SHARED
    * kind-dispatch ([[graft.multimodal.Multimodal.decodeFeatures]] —
    * mapPartitions codecs, real PNG/WAV decoders) runs on the batch
    * and lands in a parquet feature store partitioned by batch id
    * with DYNAMIC partition overwrite — a retried batch (foreachBatch
    * is at-least-once) rewrites exactly its own partition and can
    * never duplicate features. Factored out of the foreachBatch
    * closure so the spec can invoke the same id twice and pin the
    * idempotence. */
  def mediaDecodeBatch(batch: org.apache.spark.sql.Dataset[
        graft.multimodal.Multimodal.MediaRow],
      batchId: Long, outDir: String): Unit =
    graft.multimodal.Multimodal.decodeFeatures(batch)
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** Streaming multimodal decode — the streaming twin of the q41/q53
    * decode-and-fingerprint stage (the thetaPaneDistinct /
    * msprtDecisions twin discipline applied to the codec path): a
    * stream of (media_id, payload, meta) rows is decoded INSIDE
    * foreachBatch by the same partition-batched codecs the batch
    * gates run, and appended to a batch-id-partitioned parquet
    * feature store. Decode is stateless per row, so stream == batch
    * holds as SET equality on every chronological prefix — including
    * late data, which simply decodes when it arrives (spec-pinned
    * across a 3-micro-batch replay with a late batch) — and the sink
    * stays exactly-once under foreachBatch retries by construction
    * (each batch id owns its partition).
    *
    * Scale shape: identical to the batch stage — the codec work is
    * partition-local CPU inside each micro-batch, the only write is
    * the feature append; 1000 executors decode 1000 partitions of the
    * micro-batch with no shuffle. */
  def startMediaDecode(media: DataFrame, outDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import media.sparkSession.implicits._
    media
      .select(col("media_id").cast("long").as("media_id"),
        col("payload"), col("meta"))
      .as[graft.multimodal.Multimodal.MediaRow]
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[
            graft.multimodal.Multimodal.MediaRow], id: Long) =>
          mediaDecodeBatch(batch, id, outDir): Unit
      }
      .start()
  }
}
