package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.eventstore._
import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** The reference's HTTP surface as a PURE request→response function —
  * routes, JSON:API envelopes, status mapping, cache headers — minus
  * the socket (no HTTP framework exists in this environment, and the
  * engine doesn't need one to pin the semantics). Every behavior cites
  * its reference line; ApiSpec drives the full Bruno-collection
  * equivalents (SURVEY.md §5 level 2) against an EventStore.
  *
  * Routes (reference src/api.rs:140-148), all eight:
  *   GET    /health
  *   GET    /openapi.yaml
  *   GET    /streams?sort=
  *   GET    /streams/:stream
  *   DELETE /streams/:stream
  *   POST   /streams/:stream/events?expected_revision=
  *   GET    /streams/:stream/events?page[offset]=&page[limit]=
  *   GET    /streams/:stream/events/:rownum
  * plus one graft extension:
  *   GET    /config — retention/compaction options read-back
  *   ([[graft.eventstore.StoreOptions]]; the reference boots its config
  *   from env, main.rs:13-34, with no runtime surface)
  *
  * Auth: every route requires a Bearer token validated by [[Jwt]]
  * (api.rs:147 applies the middleware to the whole router, health
  * included); the token's `sub` claim is the tenant id.
  */
object Api {
  case class Request(method: String, path: String,
      query: Map[String, String] = Map.empty,
      headers: Map[String, String] = Map.empty,
      body: Option[String] = None)
  case class Response(status: Int, headers: Map[String, String] = Map.empty,
      body: Option[String] = None)

  case class AuthConfig(keys: Seq[Jwt.Jwk], issuer: String, audience: String)

  private val mapper = new ObjectMapper()
  private val NoCache = "Cache-Control" -> "no-cache"
  private val Immutable = "Cache-Control" -> "max-age=31536000, immutable"

  /** UUIDv7 error ids, like the reference's Uuid::now_v7 (api.rs:164). */
  private[api] def uuidV7(): String = {
    val ms = System.currentTimeMillis()
    val r = new java.security.SecureRandom()
    val bytes = new Array[Byte](16)
    r.nextBytes(bytes)
    bytes(0) = (ms >> 40).toByte; bytes(1) = (ms >> 32).toByte
    bytes(2) = (ms >> 24).toByte; bytes(3) = (ms >> 16).toByte
    bytes(4) = (ms >> 8).toByte; bytes(5) = ms.toByte
    bytes(6) = ((bytes(6) & 0x0f) | 0x70).toByte
    bytes(8) = ((bytes(8) & 0x3f) | 0x80).toByte
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  /** JSON:API-ish error document (api.rs:64-99). `source` is either
    * {"header": name} or {"query": name} (ApiErrorSource). */
  private def errorDoc(title: String, detail: Option[String],
      source: Option[(String, String)]): String = {
    val err = mapper.createObjectNode()
    err.put("id", uuidV7())
    err.put("title", title)
    detail.fold(err.putNull("detail"): Unit)(d => { err.put("detail", d); () })
    source match {
      case Some((kind, name)) => err.putObject("source").put(kind, name); ()
      case None => err.putNull("source"); ()
    }
    val doc = mapper.createObjectNode()
    doc.putArray("errors").add(err)
    doc.toString
  }

  private def errorResponse(status: Int, title: String,
      detail: Option[String] = None,
      source: Option[(String, String)] = None): Response =
    Response(status, Map(NoCache), Some(errorDoc(title, detail, source)))

  // ---------------------------------------------------------- serializers

  /** CloudEvents JSON wire form: envelope fields + open extension
    * attributes inlined at the top level (openapi.yaml:81-86). */
  private[api] def eventJson(e: CloudEvent): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("specversion", e.specversion)
    n.put("id", e.id)
    n.put("source", e.source)
    n.put("type", e.`type`)
    e.subject.foreach(n.put("subject", _))
    e.time.foreach(t => n.put("time",
      DateTimeFormatter.ISO_INSTANT.format(t.toInstant)))
    e.datacontenttype.foreach(n.put("datacontenttype", _))
    e.dataschema.foreach(n.put("dataschema", _))
    e.data.foreach { d =>
      try n.set[ObjectNode]("data", mapper.readTree(d))
      catch { case _: Exception => n.put("data", d) }
    }
    e.data_base64.foreach(b =>
      n.put("data_base64", java.util.Base64.getEncoder.encodeToString(b)))
    e.extensions.foreach { case (k, v) => n.put(k, v) }
    n
  }

  /** Parse one event object; required fields per CloudEvents v1.0
    * (specversion/id/source/type — openapi.yaml's schema ref), open
    * extension attributes preserved. Left = 422 detail. */
  private[api] def parseEvent(n: JsonNode): Either[String, CloudEvent] = {
    if (!n.isObject) return Left("event must be a JSON object")
    val known = Set("specversion", "id", "source", "type", "subject",
      "time", "datacontenttype", "dataschema", "data", "data_base64")
    def req(f: String): Either[String, String] = {
      val v = n.path(f)
      if (v.isTextual && v.asText().nonEmpty) Right(v.asText())
      else Left(s"missing required field '$f'")
    }
    for {
      spec <- req("specversion")
      id <- req("id")
      source <- req("source")
      typ <- req("type")
      time <- n.path("time") match {
        case t if t.isMissingNode || t.isNull => Right(None)
        case t if t.isTextual =>
          try Right(Some(Timestamp.from(Instant.parse(t.asText()))))
          catch { case _: Exception => Left("time is not RFC3339") }
        case _ => Left("time is not a string")
      }
    } yield {
      def opt(f: String): Option[String] = {
        val v = n.path(f)
        if (v.isTextual) Some(v.asText()) else None
      }
      val data = n.path("data") match {
        case d if d.isMissingNode || d.isNull => None
        case d if d.isTextual => Some(d.asText())
        case d => Some(d.toString) // arbitrary JSON kept raw
      }
      val dataB64 = n.path("data_base64") match {
        case d if d.isTextual =>
          try Some(java.util.Base64.getDecoder.decode(d.asText()))
          catch { case _: Exception => None }
        case _ => None
      }
      val extensions = {
        val it = n.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          if (!known(e.getKey)) b += (e.getKey ->
            (if (e.getValue.isTextual) e.getValue.asText()
             else e.getValue.toString))
        }
        b.result()
      }
      CloudEvent(spec, id, source, typ, opt("subject"), time,
        opt("datacontenttype"), opt("dataschema"), data, dataB64,
        extensions)
    }
  }

  /** `?expected_revision=` parser (api.rs:558-571): any | no-stream |
    * stream-exists | <number>. */
  private[api] def parseExpectedRevision(s: String)
      : Option[ExpectedRevision] = s match {
    case "any" => Some(ExpectedRevision.Any)
    case "no-stream" => Some(ExpectedRevision.NoStream)
    case "stream-exists" => Some(ExpectedRevision.StreamExists)
    case n => n.toLongOption.map(ExpectedRevision.Exact)
  }

  private val Rfc2822 =
    DateTimeFormatter.ofPattern("EEE, dd MMM yyyy HH:mm:ss Z",
      java.util.Locale.US).withZone(ZoneOffset.UTC)

  // ------------------------------------------------------------- routing

  /** Handle one request against a store with a FIXED key set. `baseUrl`
    * feeds Content-Location (api.rs:501 hardcodes its own). */
  def handle(store: EventStore, auth: AuthConfig, req: Request,
      baseUrl: String = "http://localhost:8080"): Response =
    handleWith(store,
      t => Jwt.authorize(t, auth.keys, auth.issuer, auth.audience),
      req, baseUrl)

  /** Handle one request with a PLUGGABLE token authorizer — the seam
    * that lets the serving layer wire OIDC-discovered, rotating keys
    * ([[Oidc.OpenIdClient.authorize]], the reference's live path
    * openid.rs:130-152) without the pure handler knowing about
    * discovery. [[handle]] is this with a static-JWKS authorizer. */
  def handleWith(store: EventStore,
      authorize: String => Either[String, Jwt.Claims], req: Request,
      baseUrl: String = "http://localhost:8080"): Response =
    handleTraced(store, authorize, req, baseUrl)._1

  /** [[handleWith]] plus the authenticated tenant (None on auth
    * failure) — the seam the serving layer's per-request log line
    * reads its `tenant=` field from (the reference logs requests via
    * its tracing subscriber, main.rs:11-17). */
  def handleTraced(store: EventStore,
      authorize: String => Either[String, Jwt.Claims], req: Request,
      baseUrl: String = "http://localhost:8080")
      : (Response, Option[String]) = {
    // auth middleware first (api.rs:154-231)
    val token = req.headers.get("Authorization")
      .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
    val user = token match {
      case None =>
        return (errorResponse(401, "Not authenticated",
          Some("A Bearer token is required to access this API."),
          Some("header" -> "Authorization")), None) // api.rs:158-176
      case Some(t) =>
        authorize(t) match {
          case Left(_) =>
            return (errorResponse(401, "Not authenticated",
              Some("Bearer token is invalid."),
              Some("header" -> "Authorization")), None) // api.rs:192-211
          case Right(claims) => claims.sub // api.rs:187: User { id: sub }
        }
    }
    (dispatch(store, user, req, baseUrl), Some(user))
  }

  private def dispatch(store: EventStore, user: String, req: Request,
      baseUrl: String): Response = {
    val segments = req.path.stripPrefix("/").stripSuffix("/").split('/')
      .toList.filter(_.nonEmpty)
    (req.method.toUpperCase, segments) match {
      case ("GET", List("health")) => // api.rs:121-128
        Response(200, Map.empty, Some("""{"status":"Pass"}"""))
      case ("GET", List("openapi.yaml")) => // api.rs:137,141 ServeFile
        Response(200, Map("Content-Type" -> "application/yaml"),
          Some(OpenApiYaml))
      case ("GET", List("config")) => getConfig(store)
      case ("GET", List("streams")) => getStreams(store, user, req)
      case ("GET", List("streams", s)) => getStream(store, user, s)
      case ("DELETE", List("streams", s)) => // api.rs:418-442
        if (store.deleteStream(user, s)) Response(204)
        else Response(404)
      case ("POST", List("streams", s, "events")) =>
        postEvents(store, user, s, req, baseUrl)
      case ("GET", List("streams", s, "events")) =>
        getEventPage(store, user, s, req)
      case ("GET", List("streams", s, "events", rownum)) =>
        rownum.toLongOption match {
          case Some(n) if n >= 0 => getEvent(store, user, s, n)
          case _ => Response(404)
        }
      case _ => Response(404)
    }
  }

  /** The served API description (reference api.rs:137 serves its
    * openapi.yaml; the CloudEvents envelope schema is referenced from
    * the upstream spec exactly as openapi.yaml:81-86 does). Written for
    * graft's surface — same route table, same status semantics. */
  private[api] val OpenApiYaml: String =
    """openapi: 3.1.0
      |info:
      |  description: "graft is a CloudEvents-compatible event store with a Spark-native analytical engine"
      |  version: 0.4.0
      |  title: graft event store
      |paths:
      |  /streams/{streamid}/events:
      |    post:
      |      summary: Append one event or a batch to a stream
      |      parameters:
      |        - name: streamid
      |          in: path
      |          required: true
      |          schema: {type: string}
      |        - name: expected_revision
      |          in: query
      |          required: false
      |          schema: {type: string}
      |          description: any | no-stream | stream-exists | <revision>
      |      responses:
      |        "201": {description: appended; Content-Location names the new head event}
      |        "409": {description: expected revision did not match, or (source,id) already exists in the stream}
      |        "422": {description: body is not CloudEvents format}
      |    get:
      |      summary: Read a page of events
      |      parameters:
      |        - name: streamid
      |          in: path
      |          required: true
      |          schema: {type: string}
      |        - name: page[offset]
      |          in: query
      |          schema: {type: integer, minimum: 0, default: 0}
      |        - name: page[limit]
      |          in: query
      |          schema: {type: integer, maximum: 1000, default: 50}
      |      responses:
      |        "200": {description: array of events; full pages are served immutable}
      |        "404": {description: no such stream}
      |  /streams/{streamid}/events/{revision}:
      |    get:
      |      summary: Read one event by position
      |      parameters:
      |        - name: streamid
      |          in: path
      |          required: true
      |          schema: {type: string}
      |        - name: revision
      |          in: query
      |          description: index number of the desired event, starting at zero
      |          required: true
      |          schema: {type: integer, minimum: 0}
      |      responses:
      |        "200": {description: the event (immutable cache semantics)}
      |        "404": {description: no such stream or position}
      |  /streams/{streamid}:
      |    get:
      |      summary: Stream metadata (revision, last_modified, usage)
      |      responses:
      |        "200": {description: stream resource}
      |        "404": {description: no such stream}
      |    delete:
      |      summary: Delete a stream
      |      responses:
      |        "204": {description: deleted}
      |        "404": {description: no such stream}
      |  /streams:
      |    get:
      |      summary: List the caller's streams
      |      parameters:
      |        - name: sort
      |          in: query
      |          schema: {type: string}
      |          description: id | usage | -usage | revision | -revision | last_modified | -last_modified
      |      responses:
      |        "200": {description: stream resources}
      |        "400": {description: unknown sort key}
      |  /config:
      |    get:
      |      summary: Store retention/compaction options (graft extension)
      |      responses:
      |        "200": {description: gc_grace_ms, kept_generations, auto_compact_after}
      |  /health:
      |    get:
      |      summary: Health check
      |      responses:
      |        "200": {description: '{"status":"Pass"}'}
      |components:
      |  schemas:
      |    Event:
      |      $ref: "https://raw.githubusercontent.com/cloudevents/spec/v1.0.2/cloudevents/formats/cloudevents.json"
      |""".stripMargin

  /** Config read-back (graft extension): the store's retention and
    * compaction options as a resource document. */
  private def getConfig(store: EventStore): Response = {
    val doc = mapper.createObjectNode()
    val res = doc.putObject("data")
    res.put("id", "config")
    res.put("type", "config")
    val attrs = res.putObject("attributes")
    attrs.put("gc_grace_ms", store.options.gcGraceMs)
    attrs.put("kept_generations", store.options.keptGenerations)
    attrs.put("auto_compact_after", store.options.autoCompactAfter)
    // build identification (reference lib.rs:1-9 shadow_rs analogue)
    val build = attrs.putObject("build")
    build.put("name", graft.BuildInfo.name)
    build.put("version", graft.BuildInfo.version)
    build.put("spark", graft.BuildInfo.sparkVersion)
    build.put("scala", graft.BuildInfo.scalaVersion)
    build.put("java", graft.BuildInfo.javaVersion)
    Response(200, Map(NoCache), Some(doc.toString))
  }

  private def getStreams(store: EventStore, user: String, req: Request)
      : Response = {
    val sortParam = req.query.getOrElse("sort", "id")
    StreamSort.parse(sortParam) match {
      case None => Response(400) // api.rs:331-333
      case Some(sort) =>
        val streams = store.streams(user, sort)
        val doc = mapper.createObjectNode()
        val arr: ArrayNode = doc.putArray("data")
        streams.foreach { m =>
          val res = arr.addObject()
          res.put("id", m.id)
          res.put("type", "streams") // api.rs:338-343 ApiResource
          val attrs = res.putObject("attributes")
          attrs.put("id", m.id)
          attrs.put("revision", m.revision)
          attrs.put("last_modified", m.last_modified.getTime / 1000)
          attrs.put("usage", m.usage)
        }
        Response(200, Map.empty, Some(doc.toString))
    }
  }

  private def getStream(store: EventStore, user: String, s: String)
      : Response =
    store.getStream(user, s) match {
      case None => Response(404) // server.rs StreamNotFound → 404
      case Some(m) =>
        val doc = mapper.createObjectNode()
        val res = doc.putObject("data")
        res.put("id", m.id)
        res.put("type", "streams")
        val attrs = res.putObject("attributes")
        attrs.put("id", m.id)
        attrs.put("revision", m.revision)
        attrs.put("last_modified", m.last_modified.getTime / 1000)
        attrs.put("usage", m.usage)
        Response(200, Map(NoCache, // api.rs:384-390
          "Last-Modified" -> Rfc2822.format(
            Instant.ofEpochMilli(m.last_modified.getTime))),
          Some(doc.toString))
    }

  private def postEvents(store: EventStore, user: String, s: String,
      req: Request, baseUrl: String): Response = {
    val expected = parseExpectedRevision(
      req.query.getOrElse("expected_revision", "any")) match {
      case Some(e) => e
      case None =>
        // preserved quirk: the reference answers 401 (not 400) for a bad
        // expected_revision (api.rs:470-485)
        return errorResponse(401, "Invalid parameter",
          Some("expected_revision is invalid."),
          Some("query" -> "expected_revision"))
    }
    val body = req.body.getOrElse("")
    val parsed: Either[String, Seq[CloudEvent]] =
      try {
        mapper.readTree(body) match {
          case a: ArrayNode => // api.rs:449-454 untagged single-or-batch
            val nodes = (0 until a.size()).map(a.get)
            nodes.foldLeft[Either[String, Vector[CloudEvent]]](
              Right(Vector.empty)) {
              case (Right(acc), n) => parseEvent(n).map(acc :+ _)
              case (l, _) => l
            }
          case o if o != null && o.isObject => parseEvent(o).map(Seq(_))
          case _ => Left("body must be a CloudEvent or array of CloudEvents")
        }
      } catch { case _: Exception => Left("body is not valid JSON") }
    parsed match {
      case Left(detail) => // serde 422 (openapi.yaml:38-39)
        errorResponse(422, "Unprocessable content", Some(detail))
      case Right(events) =>
        try {
          val rownum = store.append(user, s, events, expected)
          Response(201, Map(NoCache, // api.rs:496-504
            "Content-Location" -> s"$baseUrl/streams/$s/events/$rownum"))
        } catch {
          case _: RevisionMismatch => // api.rs:509-523
            errorResponse(409, "Revision mismatch",
              Some("expected revision did not match actual revision"),
              Some("query" -> "expected_revision"))
          case _: SourceIdConflict => // api.rs:524-537
            errorResponse(409, "Source/ID conflict",
              Some("this stream already contains an event with that " +
                "source and id field. According to the CloudEvents spec, " +
                "those fields in combination must be unique"))
          case _: Exception => // api.rs:539-553 incl. EmptyAppend
            errorResponse(500, "Internal server error")
        }
    }
  }

  private def getEventPage(store: EventStore, user: String, s: String,
      req: Request): Response = {
    // clamps: offset ≥ 0 default 0; limit ≤ 1000 default 50 (api.rs:271-272)
    val offset = math.max(0L,
      req.query.get("page[offset]").flatMap(_.toLongOption).getOrElse(0L))
    val limit = math.min(1000,
      req.query.get("page[limit]").flatMap(_.toIntOption).getOrElse(50))
    if (!store.streamExists(user, s)) return Response(404)
    val events = store.page(user, s, offset, limit)
    // full page ⇒ immutable, short page ⇒ no-cache (api.rs:278-283)
    val cache = if (events.size == limit) Immutable else NoCache
    val arr = mapper.createArrayNode()
    events.foreach(e => arr.add(eventJson(e)))
    Response(200, Map(cache), Some(arr.toString))
  }

  private def getEvent(store: EventStore, user: String, s: String,
      rownum: Long): Response = {
    if (!store.streamExists(user, s)) return Response(404)
    store.get(user, s, rownum) match {
      case None => Response(404) // api.rs:240
      case Some(e) =>
        Response(200, Map(Immutable), Some(eventJson(e).toString))
    }
  }
}
