package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg REST catalog over [[IcebergExport]]ed tables — the catalog
  * protocol the reference's second engine actually speaks (reference
  * init-setup.py:73-86 configures Trino with `iceberg.catalog.type =
  * rest` against the object store's `/_iceberg` endpoint;
  * README.md:239-253 is the resulting foreign query). graft's export
  * writes HadoopTables-style path metadata (version-hint discovery);
  * this serves the SAME metadata over the public Iceberg REST catalog
  * OpenAPI, so an engine that only discovers tables via REST can find
  * and load them:
  *
  *   GET /v1/config                                → catalog config
  *   GET/POST /v1/namespaces                       → list / create
  *   GET/DELETE /v1/namespaces/{ns}                → props / drop
  *   POST /v1/namespaces/{ns}/properties           → update ns props
  *   GET/POST /v1/namespaces/{ns}/tables           → list / createTable
  *   POST /v1/namespaces/{ns}/register             → registerTable
  *   GET/HEAD /v1/namespaces/{ns}/tables/{t}       → LoadTableResult
  *   POST /v1/namespaces/{ns}/tables/{t}           → commitTable
  *   DELETE /v1/namespaces/{ns}/tables/{t}         → dropTable
  *   POST /v1/tables/rename                        → renameTable
  *   GET/POST /v1/namespaces/{ns}/views            → list / createView
  *   GET/HEAD /v1/namespaces/{ns}/views/{v}        → LoadViewResult
  *   POST /v1/namespaces/{ns}/views/{v}            → replaceView
  *   DELETE /v1/namespaces/{ns}/views/{v}          → dropView
  *   POST /v1/views/rename                         → renameView
  *
  * VIEWS (the Iceberg VIEW spec over the OpenAPI /views routes): the
  * service authors format-version-1 view metadata (view-uuid, schemas,
  * versions carrying SQL representations, version-log) and persists it
  * with the same vN.metadata.json + version-hint recipe as tables, so
  * any spec reader can follow the metadata-location. Tables and views
  * share ONE identifier space (cross-kind name conflicts 409, renames
  * check both). Replace commits run under the same per-name lock with
  * `assert-view-uuid` (stale → 409) and the add-schema /
  * add-view-version / set-current-view-version update model including
  * the spec's -1 "added by this commit" sentinels.
  *
  * The LoadTableResult re-reads dest's CURRENT vN.metadata.json per
  * request (version-hint walk), so a continuous-mirror re-export is
  * visible on the foreign engine's next load with no server restart.
  * Data/manifest access stays direct file I/O, exactly as in a real
  * REST catalog deployment — the catalog serves pointers, never data.
  *
  * WRITE path (the foreign-writer seam): `createTable` (including the
  * spec's `stage-create` two-phase CTAS shape) and `commitTable` with
  * the OpenAPI's requirement/update model — `assert-create` /
  * `assert-table-uuid` / `assert-ref-snapshot-id` requirements;
  * `add-snapshot` / `set-snapshot-ref` / `add-schema` /
  * `set-current-schema` / `add-spec` / `set-default-spec` /
  * `set-properties` / `remove-properties` / `remove-snapshot-ref` /
  * `assign-uuid` / `set-location` updates. A REST writer authors data
  * and manifest files directly in storage (as the protocol intends)
  * and commits POINTERS here; the server validates requirements and
  * CAS-advances the table's vN.metadata.json under a per-table lock,
  * exactly-once per requirement epoch. Only tables CREATED over REST
  * are writable through it: a [[register]]ed graft export stays
  * read-only (its metadata lineage is owned by graft's exporter —
  * a REST commit would race it), answering the spec's ErrorModel with
  * 501 as before. Unknown routes stay 404; malformed requests 400;
  * failed requirements 409 `CommitFailedException`. List routes honor
  * the OpenAPI's `pageToken`/`pageSize` pagination with SEEK-style
  * tokens (the token names the last-returned item, so a concurrent
  * register/drop between pages cannot skip or duplicate entries the
  * way an offset token would). LoadTableResult honors
  * `snapshots=refs`. Binds loopback-only: a verification/interop
  * endpoint, not a hardened network service.
  */
final class IcebergRestCatalog private (
    server: HttpServer,
    state: IcebergRestCatalog.State) {

  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  /** Expose the Iceberg export at `dest` as `namespace`.`table`
    * (read-only: graft's exporter owns the metadata lineage). */
  def register(namespace: String, table: String, dest: String): Unit = {
    require(Files.exists(Paths.get(dest).resolve("metadata")
        .resolve("version-hint.text")),
      s"'$dest' holds no Iceberg export (missing metadata/version-hint.text)")
    state.registry.put((namespace, table), dest)
    ()
  }

  /** Serve a LIVE graft table as `namespace`.`name` — no manual
    * re-export, ever: each LoadTableResult first compares the graft
    * table's current version against the last-projected one and, if
    * the table advanced, re-runs the (metadata-sized) export into
    * `dest` before serving, so a REST reader lags a committed graft
    * write by AT MOST the one load-triggered projection — never by
    * "whenever someone remembered to re-export". The export
    * references data files in place as always (the catalog serves
    * pointers, never data); the continuous-mirror streaming helper
    * degrades to a cache warmer for latency-sensitive readers.
    * Refresh runs under a per-mirror lock (concurrent loads
    * double-check the version and project once); a refresh FAILURE
    * surfaces as the route's 500 ErrorModel rather than silently
    * serving a stale projection. Registered live tables stay
    * read-only over REST, like [[register]]ed exports. */
  def registerLive(namespace: String, name: String,
      table: LogTable, dest: String, formatVersion: Int = 2): Unit = {
    val m = new IcebergRestCatalog.LiveMirror(table, dest, formatVersion)
    m.refresh() // initial projection — the entry is servable at once
    state.live.put((namespace, name), m)
    state.registry.put((namespace, name), dest)
    ()
  }

  def close(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case e: java.util.concurrent.ExecutorService => e.shutdownNow(); ()
      case _ => ()
    }
  }

  /** Test seam: the live token map (token → issue millis), for
    * backdating in the expiry spec. */
  private[sources] def tokensForTest
      : java.util.concurrent.ConcurrentHashMap[String, java.lang.Long] =
    state.tokens
}

object IcebergRestCatalog {
  private val mapper = new ObjectMapper()

  /** One LIVE-served graft table ([[IcebergRestCatalog.registerLive]]):
    * the last-projected graft version and the double-checked refresh
    * that keeps LoadTableResult current. */
  private[sources] final class LiveMirror(val table: LogTable,
      val dest: String, val formatVersion: Int) {
    private val exported = new java.util.concurrent.atomic.AtomicLong(-1L)
    def refresh(): Unit =
      if (exported.get() != table.currentVersion) synchronized {
        val cur = table.currentVersion
        if (exported.get() != cur) {
          IcebergExport.export(table, dest, formatVersion = formatVersion)
          exported.set(cur)
        }
      }
  }

  /** Bearer-token lifetime — the `expires_in` the grant advertises is
    * the lifetime the auth gate actually enforces. */
  private val TokenTtlMs = 3600L * 1000L

  private[sources] final class State {
    /** (ns, table) → table location. Both registered graft exports and
      * REST-created tables live here once visible. */
    val registry =
      new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
    /** Tables CREATED over REST — the only ones commitTable may
      * advance. A registered graft export is never owned. */
    val owned = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, String)]()
    /** `stage-create` metadata awaiting its first commit (invisible to
      * loads/lists until then — the spec's two-phase CTAS). */
    val staged =
      new java.util.concurrent.ConcurrentHashMap[(String, String), ObjectNode]()
    /** LIVE-served graft tables ([[IcebergRestCatalog.registerLive]]):
      * load routes refresh the projection on demand. */
    val live =
      new java.util.concurrent.ConcurrentHashMap[(String, String), LiveMirror]()
    /** (ns, view) → view location (Iceberg VIEW spec metadata served
      * over the OpenAPI /views routes). Views share the (ns, name)
      * lock space with tables, so a same-name table/view create pair
      * serializes and the name-conflict checks cannot race. */
    val views =
      new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
    /** Explicitly-created namespaces and their properties (namespaces
      * of registered tables are implicit members of the listing). */
    val namespaces = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentHashMap[String, String]]()
    /** Per-table commit locks: a commit is read-check-advance under
      * the table's lock (single-server CAS). */
    private val locks =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Object]()
    def lockFor(key: (String, String)): Object =
      locks.computeIfAbsent(key, _ => new Object)

    /** Bearer tokens issued by `/v1/oauth/tokens` → issue-time millis.
      * When `requireAuth` is on, every other route demands a live one —
      * the OpenAPI's own client-credentials handshake, so a
      * spec-conformant foreign client's auth negotiation doesn't 404.
      * Tokens honor the advertised `expires_in` (checked AND evicted at
      * the auth gate — an hourly-refreshing client never grows the set
      * unboundedly, and a leaked stale token stops authenticating).
      * Off by default (loopback verification endpoint, see class doc). */
    val tokens =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile var requireAuth: Boolean = false

    def nsNames: Seq[String] =
      (registry.keySet().asScala.map(_._1) ++
        views.keySet().asScala.map(_._1) ++ namespaces.keySet().asScala)
        .toSeq.distinct.sorted
    def nsExists(ns: String): Boolean =
      namespaces.containsKey(ns) ||
        registry.keySet().asScala.exists(_._1 == ns) ||
        views.keySet().asScala.exists(_._1 == ns)
  }

  /** Start on an ephemeral loopback port. With `requireAuth = true`,
    * every route except `POST /v1/oauth/tokens` demands a bearer token
    * from that route's client-credentials grant (401 otherwise) — the
    * protocol-level slice of the reference's authenticated-catalog
    * shape (reference README.md:243-245 connects Trino with vended
    * credentials; SigV4/credential-vending proper is deployment
    * harness, waived in SURVEY §6). */
  def start(requireAuth: Boolean = false): IcebergRestCatalog = {
    val state = new State
    state.requireAuth = requireAuth
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1",
      (x: HttpExchange) => handle(x, state))
    // POOLED serving: a foreign engine's planner issues metadata loads
    // in parallel (one per table/partition being resolved) — a
    // dispatch-thread server would serialize them all. Handlers are
    // thread-safe by construction: concurrent maps for reads, the
    // per-table lock discipline (commit/create/drop/rename/transaction
    // all participate) for mutations.
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
      r => { val t = new Thread(r, "graft-rest"); t.setDaemon(true); t }))
    server.start()
    new IcebergRestCatalog(server, state)
  }

  /** Query params of the exchange (the spec's `pageToken`/`pageSize`/
    * `snapshots` live here). */
  private def params(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case Array(k) => Some(k -> "")
          case _ => None
        }
      }.toMap

  /** OpenAPI pagination: when the client sends `pageSize`, return up
    * to that many items plus an opaque `next-page-token` while more
    * remain. The token is SEEK-style — it names the last item the
    * client saw, and the next page is everything sorted-after it —
    * so a register/drop between pages shifts nothing (an offset token
    * over a re-sorted list would skip or duplicate entries under
    * concurrent registry changes). Without `pageSize` the full list
    * returns in one page (token-less). */
  private def page(items: Seq[String], p: Map[String, String])
      : (Seq[String], Option[String]) = {
    val after = p.get("pageToken")
    val rest = after match {
      case Some(last) => items.dropWhile(_ <= last)
      case None => items
    }
    p.get("pageSize").flatMap(_.toIntOption) match {
      case Some(n) if n > 0 =>
        val slice = rest.take(n)
        val next = if (rest.size > n) slice.lastOption else None
        (slice, next)
      // pageSize=0 answers an empty page with NO token — a token equal
      // to the current position would loop a spec-following client
      // forever
      case Some(n) if n == 0 => (Nil, None)
      case _ => (rest, None)
    }
  }

  private def body(x: HttpExchange): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(x.getRequestBody.readAllBytes())

  private def handle(x: HttpExchange, state: State): Unit =
    try {
      val segs = x.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      val registry = state.registry
      // AUTH GATE: under requireAuth every route except the token
      // grant itself needs `Authorization: Bearer <issued token>` —
      // a missing or unknown token answers the spec's ErrorModel 401,
      // never a silent pass-through
      val isTokenRoute =
        x.getRequestMethod == "POST" && segs == List("v1", "oauth", "tokens")
      if (state.requireAuth && !isTokenRoute) {
        val ok = Option(x.getRequestHeaders.getFirst("Authorization"))
          .filter(_.startsWith("Bearer "))
          .map(_.stripPrefix("Bearer ").trim)
          .exists { tok =>
            Option(state.tokens.get(tok)) match {
              case Some(issued)
                  if System.currentTimeMillis() - issued < TokenTtlMs => true
              case Some(_) => // expired: honor expires_in AND evict
                state.tokens.remove(tok); false
              case None => false
            }
          }
        if (!ok) {
          error(x, 401, "NotAuthorizedException",
            "missing or invalid bearer token — obtain one via " +
              "POST /v1/oauth/tokens (client_credentials grant)")
          return
        }
      }
      (x.getRequestMethod, segs) match {
        case ("POST", List("v1", "oauth", "tokens")) =>
          // the OpenAPI's client-credentials grant: form-encoded body,
          // answers OAuthTokenResponse. Any client id/secret pair is
          // accepted (loopback verification endpoint — the HANDSHAKE
          // is the seam under test, not a credential store)
          val form = new String(x.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8).split("&").flatMap(_.split("=", 2) match {
              case Array(k, v) =>
                Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
              case _ => None
            }).toMap
          if (!form.get("grant_type").contains("client_credentials"))
            json(x, 400,
              """{"error":"unsupported_grant_type","error_description":"only client_credentials is supported"}""")
          else {
            // sweep expired entries at GRANT time too: a proactively-
            // refreshing client (the standard OAuth pattern) never
            // re-presents its old token, so gate-time eviction alone
            // would leak one entry per refresh forever
            val cutoff = System.currentTimeMillis() - TokenTtlMs
            state.tokens.entrySet().removeIf(e => e.getValue < cutoff)
            val tok = java.util.UUID.randomUUID().toString
            state.tokens.put(tok,
              java.lang.Long.valueOf(System.currentTimeMillis()))
            val root = mapper.createObjectNode()
            root.put("access_token", tok)
            root.put("token_type", "bearer")
            root.put("expires_in", (TokenTtlMs / 1000L).toInt)
            form.get("scope").foreach(s => root.put("scope", s))
            json(x, 200, root.toString)
          }

        case ("GET", List("v1", "config")) =>
          json(x, 200, """{"defaults":{},"overrides":{}}""")

        case ("GET", List("v1", "namespaces")) =>
          val root = mapper.createObjectNode()
          val arr = root.putArray("namespaces")
          val (slice, next) = page(state.nsNames, params(x))
          slice.foreach { ns => arr.addArray().add(ns); () }
          next.foreach(t => root.put("next-page-token", t))
          json(x, 200, root.toString)

        case ("POST", List("v1", "namespaces")) =>
          val b = body(x)
          val parts = Option(b.get("namespace")).toSeq
            .flatMap(_.elements().asScala.map(_.asText()))
          if (parts.size != 1)
            error(x, 400, "BadRequestException",
              "exactly one namespace level is supported")
          else if (state.nsExists(parts.head))
            error(x, 409, "AlreadyExistsException",
              s"namespace '${parts.head}' already exists")
          else {
            val props = new java.util.concurrent
              .ConcurrentHashMap[String, String]()
            Option(b.get("properties")).foreach(_.properties().asScala
              .foreach(e => props.put(e.getKey, e.getValue.asText())))
            state.namespaces.put(parts.head, props)
            val root = mapper.createObjectNode()
            root.putArray("namespace").add(parts.head)
            val pn = root.putObject("properties")
            props.asScala.foreach { case (k, v) => pn.put(k, v); () }
            json(x, 200, root.toString)
          }

        case ("GET", List("v1", "namespaces", ns)) =>
          if (!state.nsExists(ns))
            error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
          else {
            val root = mapper.createObjectNode()
            root.putArray("namespace").add(ns)
            val pn = root.putObject("properties")
            Option(state.namespaces.get(ns)).foreach(_.asScala
              .foreach { case (k, v) => pn.put(k, v); () })
            json(x, 200, root.toString)
          }

        case ("DELETE", List("v1", "namespaces", ns)) =>
          if (!state.nsExists(ns))
            error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
          else if (registry.keySet().asScala.exists(_._1 == ns) ||
              state.staged.keySet().asScala.exists(_._1 == ns) ||
              state.views.keySet().asScala.exists(_._1 == ns))
            error(x, 409, "NamespaceNotEmptyException",
              s"namespace '$ns' still holds tables or views")
          else {
            state.namespaces.remove(ns)
            x.sendResponseHeaders(204, -1); x.close()
          }

        case ("POST", List("v1", "namespaces", ns, "properties")) =>
          if (!state.nsExists(ns))
            error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
          else {
            val b = body(x)
            val props = state.namespaces.computeIfAbsent(ns,
              _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
            val removed = mapper.createArrayNode()
            val missing = mapper.createArrayNode()
            Option(b.get("removals")).toSeq
              .flatMap(_.elements().asScala.map(_.asText())).foreach { k =>
                if (props.remove(k) != null) removed.add(k) else missing.add(k)
                ()
              }
            val updated = mapper.createArrayNode()
            Option(b.get("updates")).foreach(_.properties().asScala.foreach { e =>
              props.put(e.getKey, e.getValue.asText()); updated.add(e.getKey); ()
            })
            val root = mapper.createObjectNode()
            root.set[ObjectNode]("updated", updated)
            root.set[ObjectNode]("removed", removed)
            root.set[ObjectNode]("missing", missing)
            json(x, 200, root.toString)
          }

        case ("GET", List("v1", "namespaces", ns, "tables")) =>
          if (!state.nsExists(ns))
            error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
          else {
            val root = mapper.createObjectNode()
            val arr = root.putArray("identifiers")
            val (slice, next) = page(
              registry.keySet().asScala.filter(_._1 == ns).map(_._2).toSeq.sorted,
              params(x))
            slice.foreach { t =>
              val id = arr.addObject()
              id.putArray("namespace").add(ns)
              id.put("name", t)
              ()
            }
            next.foreach(t => root.put("next-page-token", t))
            json(x, 200, root.toString)
          }

        case ("POST", List("v1", "namespaces", ns, "tables")) =>
          createTable(x, state, ns)

        case ("POST", List("v1", "namespaces", ns, "register")) =>
          registerTable(x, state, ns)

        case ("POST", List("v1", "namespaces", ns, "tables", t)) =>
          commitTable(x, state, ns, t)

        case ("DELETE", List("v1", "namespaces", ns, t0, t))
            if t0 == "tables" =>
          val key = (ns, t)
          // the drop participates in the per-table lock discipline:
          // a lock-free drop racing a staged-CTAS commit would answer
          // 204 and then have persistStaged resurrect the table
          state.lockFor(key).synchronized {
            if (registry.remove(key) == null &&
                state.staged.remove(key) == null)
              error(x, 404, "NoSuchTableException", s"table '$ns.$t' not found")
            else {
              // catalog-level drop: the table leaves the catalog; its
              // files stay (`purgeRequested` is not honored — this
              // endpoint never deletes data it did not write)
              state.owned.remove(key)
              state.live.remove(key)
              x.sendResponseHeaders(204, -1); x.close()
            }
          }

        case ("POST", List("v1", "transactions", "commit")) =>
          commitTransaction(x, state)

        case ("POST", List("v1", "tables", "rename")) =>
          val b = body(x)
          def ident(n: com.fasterxml.jackson.databind.JsonNode)
              : Option[(String, String)] =
            for {
              node <- Option(n)
              // single-level only — truncating a multi-segment
              // namespace would rename a DIFFERENT table than addressed
              nsArr <- Option(node.get("namespace")) if nsArr.size() == 1
              nm <- Option(node.get("name"))
            } yield (nsArr.get(0).asText(), nm.asText())
          (ident(b.get("source")), ident(b.get("destination"))) match {
            case (Some(src), Some(dst)) => renameTable(x, state, src, dst)
            case _ =>
              error(x, 400, "BadRequestException",
                "rename needs 'source' and 'destination' identifiers, " +
                  "each with a SINGLE-LEVEL namespace (this catalog is " +
                  "single-level; truncating a multi-segment namespace " +
                  "would address a different table)")
          }
        case (m @ ("GET" | "HEAD"), List("v1", "namespaces", ns, "tables", t)) =>
          registry.get((ns, t)) match {
            case null =>
              error(x, 404, "NoSuchTableException", s"table '$ns.$t' not found")
            case _ if m == "HEAD" =>
              x.sendResponseHeaders(200, -1); x.close()
            case dest =>
              // LIVE tables project the CURRENT graft snapshot before
              // serving — a committed write is visible on the very
              // next load, no manual re-export in the loop
              Option(state.live.get((ns, t))).foreach(_.refresh())
              val (mp, meta) = currentMetadata(dest)
              // the spec's `snapshots=refs` mode: trim the snapshots
              // array to those reachable from refs (a busy-history
              // table's LoadTableResult stays pointer-sized; the
              // default `all` inlines the full history)
              if (params(x).get("snapshots").contains("refs")) {
                val wanted = Option(meta.get("refs")).toSeq
                  .flatMap(_.properties().asScala.map(_.getValue
                    .get("snapshot-id").asLong())).toSet ++
                  Option(meta.get("current-snapshot-id")).map(_.asLong())
                val kept = mapper.createArrayNode()
                Option(meta.get("snapshots")).foreach(_.elements().asScala
                  .filter(s => wanted.contains(s.get("snapshot-id").asLong()))
                  .foreach(kept.add))
                meta.set[ObjectNode]("snapshots", kept)
                ()
              }
              val root = mapper.createObjectNode()
              root.put("metadata-location", mp)
              root.set[ObjectNode]("metadata", meta)
              root.putObject("config")
              json(x, 200, root.toString)
          }

        case ("POST", List("v1", "namespaces", ns, "tables", t, "metrics")) =>
          // the OpenAPI reportMetrics sink: spec clients POST scan/commit
          // reports after reads — acknowledge (204) so a conformant
          // client never degrades to warn-and-retry; this catalog keeps
          // no metrics store (loopback verification endpoint)
          if (registry.get((ns, t)) == null)
            error(x, 404, "NoSuchTableException", s"table '$ns.$t' not found")
          else { x.sendResponseHeaders(204, -1); x.close() }

        case ("GET", List("v1", "namespaces", ns, "views")) =>
          if (!state.nsExists(ns))
            error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
          else {
            val root = mapper.createObjectNode()
            val arr = root.putArray("identifiers")
            val (slice, next) = page(
              state.views.keySet().asScala.filter(_._1 == ns)
                .map(_._2).toSeq.sorted, params(x))
            slice.foreach { v =>
              val id = arr.addObject()
              id.putArray("namespace").add(ns)
              id.put("name", v)
              ()
            }
            next.foreach(t => root.put("next-page-token", t))
            json(x, 200, root.toString)
          }

        case ("POST", List("v1", "namespaces", ns, "views")) =>
          createView(x, state, ns)

        case ("POST", List("v1", "namespaces", ns, "views", v)) =>
          commitView(x, state, ns, v)

        case (m @ ("GET" | "HEAD"), List("v1", "namespaces", ns, "views", v)) =>
          state.views.get((ns, v)) match {
            case null =>
              error(x, 404, "NoSuchViewException", s"view '$ns.$v' not found")
            case _ if m == "HEAD" =>
              x.sendResponseHeaders(200, -1); x.close()
            case dest =>
              val (mp, meta) = currentMetadata(dest)
              val root = mapper.createObjectNode()
              root.put("metadata-location", mp)
              root.set[ObjectNode]("metadata", meta)
              json(x, 200, root.toString)
          }

        case ("DELETE", List("v1", "namespaces", ns, t0, v))
            if t0 == "views" =>
          val key = (ns, v)
          state.lockFor(key).synchronized {
            if (state.views.remove(key) == null)
              error(x, 404, "NoSuchViewException", s"view '$ns.$v' not found")
            else {
              x.sendResponseHeaders(204, -1); x.close()
            }
          }

        case ("POST", List("v1", "views", "rename")) =>
          val b = body(x)
          def ident(n: com.fasterxml.jackson.databind.JsonNode)
              : Option[(String, String)] =
            for {
              node <- Option(n)
              nsArr <- Option(node.get("namespace")) if nsArr.size() == 1
              nm <- Option(node.get("name"))
            } yield (nsArr.get(0).asText(), nm.asText())
          (ident(b.get("source")), ident(b.get("destination"))) match {
            case (Some(src), Some(dst)) => renameView(x, state, src, dst)
            case _ =>
              error(x, 400, "BadRequestException",
                "rename needs 'source' and 'destination' identifiers, " +
                  "each with a SINGLE-LEVEL namespace")
          }

        case (m, _) =>
          error(x, 404, "NoSuchRouteException",
            s"no route $m ${x.getRequestURI.getPath}")
      }
    } catch {
      case e: Exception =>
        error(x, 500, e.getClass.getSimpleName, Option(e.getMessage).getOrElse(""))
    }

  /** POST /v1/tables/rename — move the catalog entry (the table's
    * files never move; rename is a registry-level operation).
    *
    * Atomicity: the move runs under BOTH tables' commit locks, taken
    * in a global (ns, name) order so two opposite-direction renames
    * cannot deadlock, and the dst existence check cannot be raced by
    * a concurrent create/commit/drop (all take the table lock too).
    * Load routes read the registry LOCK-FREE, so the mutation order
    * is put-then-remove: the only transient a concurrent load can see
    * is "briefly under both names" (benign for a read) — the reverse
    * order would 404 an existing table mid-rename. Staged
    * (stage-create) tables rename like registered ones — the spec
    * treats them as existing-but-invisible, and their eventual first
    * commit must land under the new name. */
  private def renameTable(x: HttpExchange, state: State,
      src: (String, String), dst: (String, String)): Unit = {
    val ord = implicitly[Ordering[(String, String)]]
    val (first, second) =
      if (ord.lteq(src, dst)) (src, dst) else (dst, src)
    state.lockFor(first).synchronized {
      state.lockFor(second).synchronized {
        val registered = Option(state.registry.get(src))
        val stagedMeta = Option(state.staged.get(src))
        if (registered.isEmpty && stagedMeta.isEmpty)
          error(x, 404, "NoSuchTableException",
            s"table '${src._1}.${src._2}' not found")
        else if (state.registry.containsKey(dst) ||
            state.staged.containsKey(dst))
          error(x, 409, "AlreadyExistsException",
            s"table '${dst._1}.${dst._2}' already exists")
        else if (state.views.containsKey(dst))
          error(x, 409, "AlreadyExistsException",
            s"a view named '${dst._1}.${dst._2}' already exists")
        else {
          // PUT-then-REMOVE: load routes read the registry lock-free,
          // so the transient state must be "briefly visible under both
          // names" (benign for a read) — remove-first would give a
          // concurrent load a spurious 404 on an existing table
          registered.foreach { dest =>
            state.registry.put(dst, dest)
            state.registry.remove(src)
          }
          Option(state.live.get(src)).foreach { m =>
            state.live.put(dst, m)
            state.live.remove(src)
          }
          stagedMeta.foreach { m =>
            state.staged.put(dst, m)
            state.staged.remove(src)
          }
          if (state.owned.remove(src)) { state.owned.add(dst); () }
          x.sendResponseHeaders(204, -1); x.close()
        }
      }
    }
  }

  /** POST /v1/namespaces/{ns}/views — the OpenAPI CreateViewRequest:
    * the SERVICE authors the Iceberg VIEW-spec metadata (format-version
    * 1: view-uuid, schemas, versions with SQL representations,
    * version-log) and persists it at the request's explicit location
    * with the same vN.metadata.json + version-hint recipe tables use.
    * Representations must be `type: "sql"` with both `sql` and
    * `dialect` (exact-or-refuse — a representation this server can't
    * model must not round-trip silently emptied). A name held by a
    * table answers 409: the spec shares one identifier space. */
  private def createView(x: HttpExchange, state: State, ns: String): Unit = {
    if (!state.nsExists(ns)) {
      error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
      return
    }
    val b = body(x)
    val name = Option(b.get("name")).map(_.asText()).getOrElse("")
    val schema = Option(b.get("schema")).orNull
    val vv = Option(b.get("view-version")).orNull
    if (name.isEmpty || schema == null || vv == null) {
      error(x, 400, "BadRequestException",
        "createView needs 'name', 'schema' and 'view-version'")
      return
    }
    val reps = Option(vv.get("representations")).toSeq
      .flatMap(_.elements().asScala).toSeq
    if (reps.isEmpty || reps.exists(r =>
        !Option(r.get("type")).map(_.asText()).contains("sql") ||
          Option(r.get("sql")).forall(_.asText().isEmpty) ||
          Option(r.get("dialect")).forall(_.asText().isEmpty))) {
      error(x, 400, "BadRequestException",
        "view-version needs at least one representation, each " +
          "{type: \"sql\", sql, dialect}")
      return
    }
    val key = (ns, name)
    state.lockFor(key).synchronized {
      if (state.views.containsKey(key)) {
        error(x, 409, "AlreadyExistsException",
          s"view '$ns.$name' already exists")
        return
      }
      if (state.registry.containsKey(key) || state.staged.containsKey(key)) {
        error(x, 409, "AlreadyExistsException",
          s"a table named '$ns.$name' already exists — tables and views " +
            "share one identifier space")
        return
      }
      val location = Option(b.get("location")).map(_.asText()).getOrElse {
        error(x, 400, "BadRequestException",
          "createView needs an explicit 'location' (this catalog has " +
            "no warehouse root)")
        return
      }
      val now = System.currentTimeMillis()
      val meta = mapper.createObjectNode()
      meta.put("view-uuid", java.util.UUID.randomUUID().toString)
      meta.put("format-version", 1)
      meta.put("location", location)
      val s0 = schema.deepCopy[ObjectNode]()
      s0.put("schema-id", 0)
      meta.set[ObjectNode]("schemas", mapper.createArrayNode().add(s0))
      val v1 = mapper.createObjectNode()
      v1.put("version-id", 1)
      v1.put("schema-id", 0)
      v1.put("timestamp-ms",
        Option(vv.get("timestamp-ms")).map(_.asLong()).getOrElse(now))
      v1.set[ObjectNode]("summary",
        Option(vv.get("summary")).map(_.deepCopy[ObjectNode]()).getOrElse {
          val su = mapper.createObjectNode()
          su.put("operation", "create"); su
        })
      val ra = v1.putArray("representations")
      reps.foreach { r => ra.add(r.deepCopy[ObjectNode]()); () }
      Option(vv.get("default-catalog"))
        .foreach(c => v1.put("default-catalog", c.asText()))
      v1.set[ObjectNode]("default-namespace",
        Option(vv.get("default-namespace"))
          .map(_.deepCopy[com.fasterxml.jackson.databind.JsonNode]())
          .getOrElse(mapper.createArrayNode().add(ns)))
      meta.put("current-version-id", 1)
      meta.set[ObjectNode]("versions", mapper.createArrayNode().add(v1))
      val log1 = mapper.createObjectNode()
      log1.put("timestamp-ms", v1.get("timestamp-ms").asLong())
      log1.put("version-id", 1)
      meta.set[ObjectNode]("version-log", mapper.createArrayNode().add(log1))
      val props = meta.putObject("properties")
      Option(b.get("properties")).foreach(_.properties().asScala
        .foreach(e => props.put(e.getKey, e.getValue.asText())))
      val mp = persist(location, meta, version = 1)
      state.views.put(key, location)
      val root = mapper.createObjectNode()
      root.put("metadata-location", mp)
      root.set[ObjectNode]("metadata", meta)
      json(x, 200, root.toString)
    }
  }

  /** POST /v1/namespaces/{ns}/views/{v} — replace a view (the spec's
    * commit shape: requirements assert against CURRENT state, updates
    * build the next metadata, vN+1 persists under the view's lock).
    * Supported: `assert-view-uuid`; `assign-uuid` (must match),
    * `set-properties`/`remove-properties`, `set-location`,
    * `add-schema`, `add-view-version`, `set-current-view-version`
    * (with the spec's -1 = "the one this commit added" sentinels).
    * Unknown requirement/update types answer 400 — a silently-dropped
    * update would commit a DIFFERENT view than the client asked for. */
  private def commitView(x: HttpExchange, state: State,
      ns: String, v: String): Unit = {
    val key = (ns, v)
    state.lockFor(key).synchronized {
      val dest = state.views.get(key)
      if (dest == null) {
        error(x, 404, "NoSuchViewException", s"view '$ns.$v' not found")
        return
      }
      val b = body(x)
      // views keep no metadata-log: the version-log IS the view's
      // lineage record per the view spec
      val (_, meta) = currentMetadata(dest)
      for (r <- Option(b.get("requirements")).toSeq
          .flatMap(_.elements().asScala)) {
        r.get("type").asText() match {
          case "assert-view-uuid" =>
            val want = r.get("uuid").asText()
            val have = meta.get("view-uuid").asText()
            if (want != have) {
              error(x, 409, "CommitFailedException",
                s"requirement failed: view uuid is $have, not $want")
              return
            }
          case other =>
            error(x, 400, "BadRequestException",
              s"unsupported view requirement '$other'")
            return
        }
      }
      var lastAddedSchema: Option[Int] = None
      var lastAddedVersion: Option[Int] = None
      def versionIds: Set[Int] = meta.get("versions").elements().asScala
        .map(_.get("version-id").asInt()).toSet
      for (u <- Option(b.get("updates")).toSeq
          .flatMap(_.elements().asScala)) {
        u.get("action").asText() match {
          case "assign-uuid" =>
            if (u.get("uuid").asText() != meta.get("view-uuid").asText()) {
              error(x, 400, "BadRequestException",
                "assign-uuid must match the view's existing uuid")
              return
            }
          case "set-properties" =>
            val props = meta.withObject("/properties")
            Option(u.get("updates")).foreach(_.properties().asScala
              .foreach(e => props.put(e.getKey, e.getValue.asText())))
          case "remove-properties" =>
            val props = meta.withObject("/properties")
            Option(u.get("removals")).toSeq
              .flatMap(_.elements().asScala)
              .foreach(k => props.remove(k.asText()))
          case "set-location" =>
            meta.put("location", u.get("location").asText()); ()
          case "add-schema" =>
            val ids = meta.get("schemas").elements().asScala
              .map(_.get("schema-id").asInt()).toSeq
            val next = if (ids.isEmpty) 0 else ids.max + 1
            val sn = u.get("schema").deepCopy[ObjectNode]()
            sn.put("schema-id", next)
            meta.withArray[ArrayNode]("schemas").add(sn)
            lastAddedSchema = Some(next)
          case "add-view-version" =>
            val vv = u.get("view-version")
            val reps = Option(vv.get("representations")).toSeq
              .flatMap(_.elements().asScala).toSeq
            // same validation as create: a representation this server
            // can't model must not land half-formed for later readers
            if (reps.isEmpty || reps.exists(r =>
                !Option(r.get("type")).map(_.asText()).contains("sql") ||
                  Option(r.get("sql")).forall(_.asText().isEmpty) ||
                  Option(r.get("dialect")).forall(_.asText().isEmpty))) {
              error(x, 400, "BadRequestException",
                "view-version needs at least one representation, each " +
                  "{type: \"sql\", sql, dialect}")
              return
            }
            val nid = versionIds.max + 1
            val nv = vv.deepCopy[ObjectNode]()
            nv.put("version-id", nid)
            val sid = Option(vv.get("schema-id")).map(_.asInt()).getOrElse(-1)
            val resolved =
              if (sid == -1) lastAddedSchema.getOrElse {
                error(x, 400, "BadRequestException",
                  "schema-id -1 needs an add-schema earlier in this commit")
                return
              } else sid
            if (!meta.get("schemas").elements().asScala
                .exists(_.get("schema-id").asInt() == resolved)) {
              error(x, 400, "BadRequestException",
                s"view-version references unknown schema-id $resolved")
              return
            }
            nv.put("schema-id", resolved)
            if (!nv.has("timestamp-ms"))
              nv.put("timestamp-ms", System.currentTimeMillis())
            if (!nv.has("default-namespace"))
              nv.set[ObjectNode]("default-namespace",
                mapper.createArrayNode().add(ns))
            meta.withArray[ArrayNode]("versions").add(nv)
            lastAddedVersion = Some(nid)
          case "set-current-view-version" =>
            val want = u.get("view-version-id").asInt()
            val resolved =
              if (want == -1) lastAddedVersion.getOrElse {
                error(x, 400, "BadRequestException",
                  "view-version-id -1 needs an add-view-version earlier " +
                    "in this commit")
                return
              } else want
            if (!versionIds.contains(resolved)) {
              error(x, 400, "BadRequestException",
                s"unknown view-version-id $resolved")
              return
            }
            meta.put("current-version-id", resolved)
            val le = meta.withArray[ArrayNode]("version-log").addObject()
            le.put("timestamp-ms", System.currentTimeMillis())
            le.put("version-id", resolved)
            ()
          case other =>
            error(x, 400, "BadRequestException",
              s"unsupported view update '$other'")
            return
        }
      }
      val hint = new String(Files.readAllBytes(Paths.get(dest)
          .resolve("metadata").resolve("version-hint.text")),
        StandardCharsets.UTF_8).trim.toInt
      val mp = persist(dest, meta, version = hint + 1)
      val root = mapper.createObjectNode()
      root.put("metadata-location", mp)
      root.set[ObjectNode]("metadata", meta)
      json(x, 200, root.toString)
    }
  }

  /** POST /v1/views/rename — registry-level move, same lock ordering
    * and put-then-remove visibility rules as table rename; the
    * destination must be free in BOTH identifier spaces. */
  private def renameView(x: HttpExchange, state: State,
      src: (String, String), dst: (String, String)): Unit = {
    val ord = implicitly[Ordering[(String, String)]]
    val (first, second) =
      if (ord.lteq(src, dst)) (src, dst) else (dst, src)
    state.lockFor(first).synchronized {
      state.lockFor(second).synchronized {
        val dest = Option(state.views.get(src))
        if (dest.isEmpty)
          error(x, 404, "NoSuchViewException",
            s"view '${src._1}.${src._2}' not found")
        else if (state.views.containsKey(dst))
          error(x, 409, "AlreadyExistsException",
            s"view '${dst._1}.${dst._2}' already exists")
        else if (state.registry.containsKey(dst) ||
            state.staged.containsKey(dst))
          error(x, 409, "AlreadyExistsException",
            s"a table named '${dst._1}.${dst._2}' already exists")
        else {
          dest.foreach { d =>
            state.views.put(dst, d)
            state.views.remove(src)
          }
          x.sendResponseHeaders(204, -1); x.close()
        }
      }
    }
  }

  /** Read `dest`'s current metadata (version-hint walk) →
    * (metadata-location, parsed node). */
  private def currentMetadata(dest: String): (String, ObjectNode) = {
    val metaDir = Paths.get(dest).resolve("metadata")
    val hint = new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text")), StandardCharsets.UTF_8).trim
    val mp = metaDir.resolve(s"v$hint.metadata.json")
    (mp.toString, mapper.readTree(Files.readAllBytes(mp))
      .asInstanceOf[ObjectNode])
  }

  /** Max field id in an Iceberg schema JSON node, walking nested
    * structs/lists/maps (→ `last-column-id`). */
  private def maxFieldId(n: com.fasterxml.jackson.databind.JsonNode): Int = {
    def walk(t: com.fasterxml.jackson.databind.JsonNode): Int = t match {
      case o if o.isObject =>
        val self = Seq("id", "element-id", "key-id", "value-id")
          .flatMap(k => Option(o.get(k)).map(_.asInt()))
        val kids = Seq("fields", "element", "key", "value", "type")
          .flatMap(k => Option(o.get(k))).map {
            case a if a.isArray => a.elements().asScala.map(walk)
              .foldLeft(0)(math.max)
            case other => walk(other)
          }
        (self ++ kids).foldLeft(0)(math.max)
      case _ => 0
    }
    walk(n)
  }

  /** POST /v1/namespaces/{ns}/register — the OpenAPI
    * RegisterTableRequest: bring an EXISTING Iceberg metadata location
    * (e.g. a graft export, or a table another catalog produced) under
    * this catalog — no data or metadata rewritten, the registry just
    * points at it. The location must be the table's CURRENT metadata
    * file (version-hint-resolved): registering a stale vN would
    * silently serve a different state than the location's own readers
    * see. Registered tables keep the read-only commit rule (501) —
    * their metadata lineage is owned by the writer that produced
    * them, exactly like [[IcebergRestCatalog.register]]'s in-process
    * variant. Duplicate identifiers answer 409. */
  private def registerTable(x: HttpExchange, state: State, ns: String): Unit = {
    if (!state.nsExists(ns)) {
      error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
      return
    }
    val b = body(x)
    val name = Option(b.get("name")).map(_.asText()).getOrElse("")
    val loc = Option(b.get("metadata-location")).map(_.asText()).getOrElse("")
    if (name.isEmpty || loc.isEmpty) {
      error(x, 400, "BadRequestException",
        "registerTable needs 'name' and 'metadata-location'")
      return
    }
    val mp = Paths.get(loc.replaceFirst("^file:/+", "/"))
    val metaDir = mp.getParent
    if (metaDir == null || metaDir.getFileName == null ||
        metaDir.getFileName.toString != "metadata" ||
        !Files.isRegularFile(mp)) {
      error(x, 400, "BadRequestException",
        s"'$loc' is not an existing <table>/metadata/vN.metadata.json file")
      return
    }
    if (!Files.exists(metaDir.resolve("version-hint.text"))) {
      error(x, 400, "BadRequestException",
        s"'$loc' has no sibling version-hint.text — this catalog serves " +
          "hint-discoverable path tables")
      return
    }
    val dest = metaDir.getParent.toString
    val (curPath, meta) = currentMetadata(dest)
    if (Paths.get(curPath).toAbsolutePath != mp.toAbsolutePath) {
      error(x, 400, "BadRequestException",
        s"'$loc' is not the table's current metadata ($curPath) — " +
          "registering a stale version would serve a different state " +
          "than the location's own readers see")
      return
    }
    val key = (ns, name)
    state.lockFor(key).synchronized {
      if (state.registry.containsKey(key) || state.staged.containsKey(key)) {
        error(x, 409, "AlreadyExistsException",
          s"table '$ns.$name' already exists")
        return
      }
      if (state.views.containsKey(key)) {
        error(x, 409, "AlreadyExistsException",
          s"a view named '$ns.$name' already exists — tables and views " +
            "share one identifier space")
        return
      }
      state.registry.put(key, dest)
      val root = mapper.createObjectNode()
      root.put("metadata-location", curPath)
      root.set[ObjectNode]("metadata", meta)
      root.putObject("config")
      json(x, 200, root.toString)
    }
  }

  /** POST /v1/namespaces/{ns}/tables — the OpenAPI CreateTableRequest.
    * `stage-create: true` builds the metadata but keeps the table
    * invisible until a commit carrying `assert-create` lands (the
    * spec's transactional CTAS handshake); otherwise v1.metadata.json
    * commits immediately. The request's schema rides verbatim as
    * schema 0 (Iceberg schema JSON, client-assigned field ids — the
    * same contract the export side writes); a partition-spec with
    * fields is accepted verbatim with server-assigned field-ids when
    * absent. */
  private def createTable(x: HttpExchange, state: State, ns: String): Unit = {
    if (!state.nsExists(ns)) {
      error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
      return
    }
    val b = body(x)
    val name = Option(b.get("name")).map(_.asText()).getOrElse("")
    val schema = Option(b.get("schema")).orNull
    if (name.isEmpty || schema == null) {
      error(x, 400, "BadRequestException",
        "createTable needs 'name' and 'schema'")
      return
    }
    val key = (ns, name)
    state.lockFor(key).synchronized {
      if (state.registry.containsKey(key) || state.staged.containsKey(key)) {
        error(x, 409, "AlreadyExistsException", s"table '$ns.$name' already exists")
        return
      }
      if (state.views.containsKey(key)) {
        error(x, 409, "AlreadyExistsException",
          s"a view named '$ns.$name' already exists — tables and views " +
            "share one identifier space")
        return
      }
      val location = Option(b.get("location")).map(_.asText()).getOrElse {
        error(x, 400, "BadRequestException",
          "createTable needs an explicit 'location' (this catalog has " +
            "no warehouse root — it serves tables where they live)")
        return
      }
      val meta = mapper.createObjectNode()
      meta.put("format-version", 2)
      meta.put("table-uuid", java.util.UUID.randomUUID().toString)
      meta.put("location", location)
      meta.put("last-sequence-number", 0L)
      meta.put("last-updated-ms", System.currentTimeMillis())
      meta.put("last-column-id", maxFieldId(schema))
      meta.put("current-schema-id", 0)
      val s0 = schema.deepCopy[ObjectNode]()
      s0.put("schema-id", 0)
      meta.set[ObjectNode]("schemas", mapper.createArrayNode().add(s0))
      val spec0 = mapper.createObjectNode()
      spec0.put("spec-id", 0)
      var lastPid = 999
      val sf = spec0.putArray("fields")
      Option(b.get("partition-spec"))
        .flatMap(s => Option(s.get("fields"))).toSeq
        .flatMap(_.elements().asScala).foreach { f =>
          val g = f.deepCopy[ObjectNode]()
          val pid = Option(f.get("field-id")).map(_.asInt())
            .getOrElse { lastPid += 1; lastPid }
          lastPid = math.max(lastPid, pid)
          g.put("field-id", pid)
          sf.add(g)
          ()
        }
      meta.put("default-spec-id", 0)
      meta.set[ObjectNode]("partition-specs",
        mapper.createArrayNode().add(spec0))
      meta.put("last-partition-id", lastPid)
      val unsorted = mapper.createObjectNode()
      unsorted.put("order-id", 0)
      unsorted.set[ObjectNode]("fields", mapper.createArrayNode())
      meta.set[ObjectNode]("sort-orders", mapper.createArrayNode().add(unsorted))
      meta.put("default-sort-order-id", 0)
      val props = meta.putObject("properties")
      Option(b.get("properties")).foreach(_.properties().asScala
        .foreach(e => props.put(e.getKey, e.getValue.asText())))
      meta.put("current-snapshot-id", -1L)
      meta.putObject("refs")
      meta.set[ObjectNode]("snapshots", mapper.createArrayNode())
      meta.set[ObjectNode]("snapshot-log", mapper.createArrayNode())
      meta.set[ObjectNode]("metadata-log", mapper.createArrayNode())

      val root = mapper.createObjectNode()
      if (Option(b.get("stage-create")).exists(_.asBoolean())) {
        state.staged.put(key, meta)
        // staged: metadata only, NO metadata-location — the table does
        // not exist until the assert-create commit
      } else {
        val mp = persist(location, meta, version = 1)
        state.registry.put(key, location)
        state.owned.add(key)
        root.put("metadata-location", mp)
        ()
      }
      root.set[ObjectNode]("metadata", meta)
      root.putObject("config")
      json(x, 200, root.toString)
    }
  }

  /** One table's CommitTableRequest, VALIDATED AND APPLIED IN MEMORY
    * only: requirements check against current state, updates build the
    * next metadata node, and the result comes back as a [[StagedCommit]]
    * that [[persistStaged]] later lands. Nothing is persisted or made
    * visible here — which is exactly what lets the multi-table
    * transaction route stage N tables and land all-or-nothing. Caller
    * must hold the table's lock. */
  private final case class StagedCommit(key: (String, String),
      isCreate: Boolean, meta: ObjectNode, location: String,
      nextVersion: Int)

  private def stageCommit(state: State, ns: String, t: String,
      b: com.fasterxml.jackson.databind.JsonNode)
      : Either[(Int, String, String), StagedCommit] = {
    val key = (ns, t)
    val stagedMeta = Option(state.staged.get(key))
    val registered = Option(state.registry.get(key))
    if (stagedMeta.isEmpty && registered.isEmpty)
      return Left((404, "NoSuchTableException", s"table '$ns.$t' not found"))
    if (stagedMeta.isEmpty && !state.owned.contains(key))
      return Left((501, "UnsupportedOperationException",
        s"commit to '$ns.$t' is not implemented for a " +
          "registered graft export: its metadata lineage is owned by " +
          "graft's exporter (write through graft's own surfaces, then " +
          "re-export). Only tables created over this REST API commit here"))
    val isCreate = stagedMeta.isDefined
    val (priorLoc, meta) = stagedMeta match {
      // work on a COPY: a later requirement/update failure (or a
      // sibling table's failure inside a transaction) must leave the
      // staged CTAS metadata byte-identical, not half-mutated
      case Some(m) => (None, m.deepCopy[ObjectNode]())
      case None =>
        val (mp, m) = currentMetadata(registered.get)
        (Some(mp), m)
    }
    // ---- requirements (all must hold against CURRENT state) ------
    val reqs = Option(b.get("requirements")).toSeq
      .flatMap(_.elements().asScala)
    for (r <- reqs) {
      r.get("type").asText() match {
        case "assert-create" =>
          if (!isCreate) {
            return Left((409, "CommitFailedException",
              s"requirement failed: table '$ns.$t' already exists"))
          }
        case "assert-table-uuid" =>
          val want = r.get("uuid").asText()
          val have = meta.get("table-uuid").asText()
          if (want != have) {
            return Left((409, "CommitFailedException",
              s"requirement failed: table uuid is $have, not $want"))
          }
        case "assert-ref-snapshot-id" =>
          val ref = r.get("ref").asText()
          val refNode = Option(meta.get("refs")).flatMap(rs =>
            Option(rs.get(ref)))
          val want = Option(r.get("snapshot-id")).filterNot(_.isNull)
            .map(_.asLong())
          (want, refNode) match {
            case (None, None) => // ref must not exist — holds
            case (None, Some(_)) =>
              return Left((409, "CommitFailedException",
                s"requirement failed: ref '$ref' already exists"))
            case (Some(_), None) =>
              return Left((409, "CommitFailedException",
                s"requirement failed: ref '$ref' does not exist"))
            case (Some(w), Some(n))
                if n.get("snapshot-id").asLong() != w =>
              return Left((409, "CommitFailedException",
                s"requirement failed: ref '$ref' is at snapshot " +
                  s"${n.get("snapshot-id").asLong()}, not $w"))
            case _ => // matches — holds
          }
        case other =>
          return Left((400, "BadRequestException",
            s"unsupported requirement type '$other'"))
      }
    }

    // ---- updates (applied in request order) -----------------------
    val updates = Option(b.get("updates")).toSeq
      .flatMap(_.elements().asScala)
    for (u <- updates) {
      u.get("action").asText() match {
        case "assign-uuid" =>
          meta.put("table-uuid", u.get("uuid").asText()); ()
        case "upgrade-format-version" =>
          val fv = u.get("format-version").asInt()
          if (fv != 2 && fv != 3) {
            return Left((400, "BadRequestException",
              s"only format-versions 2 and 3 are supported, not $fv"))
          }
          if (fv < meta.get("format-version").asInt()) {
            return Left((400, "BadRequestException",
              s"cannot downgrade format-version to $fv"))
          }
          meta.put("format-version", fv)
          // v3 requires the row-lineage high-water mark; a fresh
          // upgrade starts assigning from 0
          if (fv >= 3 && meta.get("next-row-id") == null)
            meta.put("next-row-id", 0L)
          ()
        case "set-location" =>
          // the metadata files stay where the table was created;
          // only the data location pointer moves
          meta.put("location", u.get("location").asText()); ()
        case "add-schema" =>
          val s = u.get("schema").deepCopy[ObjectNode]()
          val arr = meta.withArray[ArrayNode]("schemas")
          if (Option(s.get("schema-id")).forall(_.asInt() < 0))
            s.put("schema-id", arr.size())
          arr.add(s)
          val lc = Option(u.get("last-column-id")).map(_.asInt())
            .getOrElse(maxFieldId(s))
          meta.put("last-column-id",
            math.max(meta.get("last-column-id").asInt(), lc))
          ()
        case "set-current-schema" =>
          val sid0 = u.get("schema-id").asInt()
          val arr = meta.withArray[ArrayNode]("schemas")
          val sid = if (sid0 == -1) // -1 = the last added schema
            arr.get(arr.size() - 1).get("schema-id").asInt() else sid0
          if (!arr.elements().asScala.exists(_.get("schema-id").asInt() == sid)) {
            return Left((400, "BadRequestException", s"no schema with id $sid"))
          }
          meta.put("current-schema-id", sid)
          ()
        case "add-spec" =>
          val s = u.get("spec").deepCopy[ObjectNode]()
          val arr = meta.withArray[ArrayNode]("partition-specs")
          if (Option(s.get("spec-id")).forall(_.asInt() < 0))
            s.put("spec-id", arr.size())
          arr.add(s)
          val maxPid = Option(s.get("fields")).toSeq
            .flatMap(_.elements().asScala)
            .flatMap(f => Option(f.get("field-id")).map(_.asInt()))
            .foldLeft(meta.get("last-partition-id").asInt())(math.max)
          meta.put("last-partition-id", maxPid)
          ()
        case "set-default-spec" =>
          val sid0 = u.get("spec-id").asInt()
          val arr = meta.withArray[ArrayNode]("partition-specs")
          val sid = if (sid0 == -1)
            arr.get(arr.size() - 1).get("spec-id").asInt() else sid0
          meta.put("default-spec-id", sid)
          ()
        case "add-sort-order" =>
          val s = u.get("sort-order").deepCopy[ObjectNode]()
          val arr = meta.withArray[ArrayNode]("sort-orders")
          if (Option(s.get("order-id")).forall(_.asInt() < 0))
            s.put("order-id", arr.size())
          arr.add(s)
          ()
        case "set-default-sort-order" =>
          val oid0 = u.get("sort-order-id").asInt()
          val arr = meta.withArray[ArrayNode]("sort-orders")
          val oid = if (oid0 == -1)
            arr.get(arr.size() - 1).get("order-id").asInt() else oid0
          meta.put("default-sort-order-id", oid)
          ()
        case "set-properties" =>
          val props = meta.withObject("/properties")
          Option(u.get("updates")).foreach(_.properties().asScala
            .foreach(e => props.put(e.getKey, e.getValue.asText())))
          ()
        case "remove-properties" =>
          val props = meta.withObject("/properties")
          Option(u.get("removals")).toSeq
            .flatMap(_.elements().asScala.map(_.asText()))
            .foreach(props.remove)
          ()
        case "add-snapshot" =>
          val sn = u.get("snapshot").deepCopy[ObjectNode]()
          if (sn.get("snapshot-id") == null ||
              sn.get("manifest-list") == null) {
            return Left((400, "BadRequestException",
              "add-snapshot needs 'snapshot-id' and 'manifest-list'"))
          }
          // v3 ROW-LINEAGE VALIDATION: graft's reader serves `_row_id`
          // straight from these fields, so a nonconforming foreign
          // commit would corrupt ids the reader then presents as
          // authoritative. A v3 snapshot must carry its first-row-id
          // watermark, and it must not regress below the table's
          // next-row-id (a regression re-assigns row ids that earlier
          // snapshots already handed out). The table's next-row-id
          // then advances past the rows this snapshot can assign
          // (summary added-records; absent means no new data rows).
          if (meta.get("format-version").asInt() >= 3) {
            val first = Option(sn.get("first-row-id")).map(_.asLong())
            if (first.isEmpty) {
              return Left((409, "CommitFailedException",
                "v3 add-snapshot without 'first-row-id' — row lineage " +
                  "requires every v3 snapshot to carry its id watermark"))
            }
            val next = Option(meta.get("next-row-id")).map(_.asLong())
              .getOrElse(0L)
            if (first.get < next) {
              return Left((409, "CommitFailedException",
                s"v3 add-snapshot regresses row lineage: first-row-id " +
                  s"${first.get} < table next-row-id $next (those ids " +
                  "are already assigned)"))
            }
            val added = Option(sn.get("summary"))
              .flatMap(s0 => Option(s0.get("added-records")))
              .map(_.asLong()).getOrElse(0L)
            meta.put("next-row-id", first.get + added)
            ()
          }
          meta.withArray[ArrayNode]("snapshots").add(sn)
          val seq = Option(sn.get("sequence-number")).map(_.asLong())
            .getOrElse(0L)
          meta.put("last-sequence-number",
            math.max(meta.get("last-sequence-number").asLong(), seq))
          ()
        case "remove-snapshots" =>
          val drop = Option(u.get("snapshot-ids")).toSeq
            .flatMap(_.elements().asScala.map(_.asLong())).toSet
          val kept = mapper.createArrayNode()
          meta.withArray[ArrayNode]("snapshots").elements().asScala
            .filterNot(s => drop.contains(s.get("snapshot-id").asLong()))
            .foreach(kept.add)
          meta.set[ObjectNode]("snapshots", kept)
          ()
        case "set-snapshot-ref" =>
          val refName = u.get("ref-name").asText()
          val snapId = u.get("snapshot-id").asLong()
          if (!meta.withArray[ArrayNode]("snapshots").elements().asScala
              .exists(_.get("snapshot-id").asLong() == snapId)) {
            return Left((400, "BadRequestException",
              s"set-snapshot-ref '$refName' names unknown snapshot $snapId"))
          }
          val ref = meta.withObject("/refs").putObject(refName)
          ref.put("snapshot-id", snapId)
          ref.put("type",
            Option(u.get("type")).map(_.asText()).getOrElse("branch"))
          if (refName == "main") {
            meta.put("current-snapshot-id", snapId)
            val le = meta.withArray[ArrayNode]("snapshot-log").addObject()
            le.put("timestamp-ms", System.currentTimeMillis())
            le.put("snapshot-id", snapId)
            ()
          }
        case "remove-snapshot-ref" =>
          meta.withObject("/refs").remove(u.get("ref-name").asText())
          if (u.get("ref-name").asText() == "main")
            meta.put("current-snapshot-id", -1L)
          ()
        case other =>
          return Left((400, "BadRequestException",
            s"unsupported update action '$other'"))
      }
    }    // ---- advance the metadata lineage (IN MEMORY — persistStaged
    // writes it) ---------------------------------------------------
    meta.put("last-updated-ms", System.currentTimeMillis())
    // the PERSIST location is the table's pre-update identity — the
    // registry entry (or the staged CTAS's create location) — never
    // the post-update metadata's `location` field: a `set-location`
    // update moves only the DATA pointer, and deriving the write
    // target from it would flip ANOTHER table's version-hint when the
    // new location aliases an existing table's root
    val location = registered.getOrElse(
      stagedMeta.get.get("location").asText()) // the ORIGINAL staged node —
      // the working copy's field may have been moved by this commit
    val nextVersion =
      if (isCreate) 1
      else {
        val metaDir = Paths.get(location).resolve("metadata")
        val hint = new String(Files.readAllBytes(
          metaDir.resolve("version-hint.text")),
          StandardCharsets.UTF_8).trim.toInt
        val le = meta.withArray[ArrayNode]("metadata-log").addObject()
        le.put("timestamp-ms", System.currentTimeMillis())
        le.put("metadata-file", priorLoc.get)
        hint + 1
      }
    Right(StagedCommit(key, isCreate, meta, location, nextVersion))
  }

  /** Persistence phase A — write the next vN.metadata.json. INVISIBLE
    * until phase B: loads walk version-hint, which still names vN-1,
    * so a failure here (disk full, unwritable location) aborts with
    * zero observable change. */
  private def writeMetaFile(s: StagedCommit): Unit = {
    val metaDir = Paths.get(s.location).resolve("metadata")
    Files.createDirectories(metaDir)
    Files.write(metaDir.resolve(s"v${s.nextVersion}.metadata.json"),
      s.meta.toString.getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Persistence phase B — flip the version hint (the visibility
    * switch) and, for a staged CTAS, register the table. */
  private def publishStaged(state: State, s: StagedCommit): String = {
    val metaDir = Paths.get(s.location).resolve("metadata")
    Files.write(metaDir.resolve("version-hint.text"),
      s.nextVersion.toString.getBytes(StandardCharsets.UTF_8))
    if (s.isCreate) {
      state.staged.remove(s.key)
      state.registry.put(s.key, s.location)
      state.owned.add(s.key)
      ()
    }
    metaDir.resolve(s"v${s.nextVersion}.metadata.json").toString
  }

  /** Land a [[stageCommit]] result (single-table route). Caller must
    * hold the table's lock. */
  private def persistStaged(state: State, s: StagedCommit): String = {
    writeMetaFile(s)
    publishStaged(state, s)
  }

  /** POST /v1/namespaces/{ns}/tables/{t} — the OpenAPI
    * CommitTableRequest: check every requirement against the CURRENT
    * metadata, apply the updates in order, then CAS-advance
    * vN.metadata.json under the table's lock. Only REST-created
    * tables commit here; a registered graft export answers 501 (its
    * lineage is owned by graft's exporter — see class doc). */
  private def commitTable(x: HttpExchange, state: State,
      ns: String, t: String): Unit =
    state.lockFor((ns, t)).synchronized {
      stageCommit(state, ns, t, body(x)) match {
        case Left((code, tpe, msg)) => error(x, code, tpe, msg)
        case Right(s) =>
          val mp = persistStaged(state, s)
          val root = mapper.createObjectNode()
          root.put("metadata-location", mp)
          root.set[ObjectNode]("metadata", s.meta)
          json(x, 200, root.toString)
      }
    }

  /** POST /v1/transactions/commit — the OpenAPI multi-table
    * transaction: N per-table requirement/update blocks validated and
    * applied ATOMICALLY. All tables' locks are taken in global
    * (ns, name) order (deadlock-free against commitTable/rename),
    * every block is STAGED first (pure in-memory validation +
    * metadata building — zero writes), and only when every block
    * stages cleanly does anything persist. One stale requirement →
    * 409 and every table is byte-identical to its pre-commit state. */
  private def commitTransaction(x: HttpExchange, state: State): Unit = {
    val b = body(x)
    val changes = Option(b.get("table-changes")).toSeq
      .flatMap(_.elements().asScala).toSeq
    if (changes.isEmpty) {
      error(x, 400, "BadRequestException",
        "transaction needs a non-empty 'table-changes' array")
      return
    }
    val parsed: Seq[((String, String),
        com.fasterxml.jackson.databind.JsonNode)] = changes.map { c =>
      val id = c.get("identifier")
      // exact-or-refuse on the namespace ARITY too: this catalog is
      // single-level, and truncating ["a","sub"] to "a" would land the
      // commit on a DIFFERENT table than the client addressed
      if (id == null || id.get("namespace") == null ||
          id.get("namespace").size() != 1 || id.get("name") == null) {
        error(x, 400, "BadRequestException",
          "every table-change needs an 'identifier' with a " +
            "single-level namespace and a name")
        return
      }
      ((id.get("namespace").get(0).asText(), id.get("name").asText()), c)
    }
    val keys = parsed.map(_._1)
    if (keys.distinct.size != keys.size) {
      error(x, 400, "BadRequestException",
        "a transaction may reference each table at most once")
      return
    }
    def locked(ks: List[(String, String)])(f: => Unit): Unit = ks match {
      case Nil => f
      case k :: rest => state.lockFor(k).synchronized(locked(rest)(f))
    }
    locked(keys.sorted.toList) {
      val staged = parsed.foldLeft[Either[(Int, String, String),
          Vector[StagedCommit]]](Right(Vector.empty)) {
        case (Left(e), _) => Left(e)
        case (Right(acc), ((tns, tt), c)) =>
          stageCommit(state, tns, tt, c).map(acc :+ _)
      }
      staged match {
        case Left((code, tpe, msg)) => error(x, code, tpe, msg)
        case Right(list) =>
          // TWO-PHASE persist: all metadata files first (the heavy,
          // failure-prone writes — any error aborts with every table
          // still invisible-unchanged behind its version hint), THEN
          // the hint flips. The residual non-atomic window is N tiny
          // same-disk hint writes, not N metadata serializations.
          list.foreach(writeMetaFile)
          list.foreach(publishStaged(state, _))
          x.sendResponseHeaders(204, -1); x.close()
      }
    }
  }


  /** Write vN.metadata.json + version-hint at `location` →
    * metadata-location. */
  private def persist(location: String, meta: ObjectNode,
      version: Int): String = {
    // ONE persistence recipe: the same phase-A/phase-B primitives the
    // commit routes use, so the metadata-file + hint write shape can
    // never drift between createTable's v1 and every later commit
    val s = StagedCommit(("", ""), isCreate = false, meta, location, version)
    writeMetaFile(s)
    Files.write(Paths.get(location).resolve("metadata")
      .resolve("version-hint.text"),
      version.toString.getBytes(StandardCharsets.UTF_8))
    Paths.get(location).resolve("metadata")
      .resolve(s"v$version.metadata.json").toString
  }

  private def json(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length.toLong)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** The REST spec's ErrorModel envelope. */
  private def error(x: HttpExchange, code: Int, typ: String, msg: String): Unit = {
    val root = mapper.createObjectNode()
    val e = root.putObject("error")
    e.put("message", msg)
    e.put("type", typ)
    e.put("code", code)
    if (x.getRequestMethod == "HEAD") { x.sendResponseHeaders(code, -1); x.close() }
    else json(x, code, root.toString)
  }
}
