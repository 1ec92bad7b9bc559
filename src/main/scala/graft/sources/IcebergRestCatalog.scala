package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Minimal READ-ONLY Iceberg REST catalog over [[IcebergExport]]ed
  * tables — the catalog protocol the reference's second engine
  * actually speaks (reference init-setup.py:73-86 configures Trino
  * with `iceberg.catalog.type = rest` against the object store's
  * `/_iceberg` endpoint; README.md:239-253 is the resulting foreign
  * query). graft's export writes HadoopTables-style path metadata
  * (version-hint discovery); this serves the SAME metadata over the
  * public Iceberg REST catalog OpenAPI's read routes, so an engine
  * that only discovers tables via REST can find and load them:
  *
  *   GET /v1/config                                → catalog config
  *   GET /v1/namespaces                            → namespace list
  *   GET /v1/namespaces/{ns}                       → namespace props
  *   GET /v1/namespaces/{ns}/tables                → table identifiers
  *   GET/HEAD /v1/namespaces/{ns}/tables/{t}       → LoadTableResult
  *                                                   (metadata inline +
  *                                                   metadata-location)
  *
  * The LoadTableResult re-reads dest's CURRENT vN.metadata.json per
  * request (version-hint walk), so a continuous-mirror re-export is
  * visible on the foreign engine's next load with no server restart.
  * Data/manifest access stays direct file I/O, exactly as in a real
  * REST catalog deployment — the catalog serves pointers, never data.
  *
  * Scope (exact-or-refuse, like the rest of the seam): read routes
  * only — this is an interop endpoint for foreign READERS of graft
  * tables, not a writable catalog. Recognized write/commit routes
  * (stageCreate/commit/rename/drop/properties) answer 501 with the
  * spec's ErrorModel (a clean "not supported", never a fake commit);
  * unknown paths stay 404. List routes honor the OpenAPI's
  * `pageToken`/`pageSize` pagination, LoadTableResult honors
  * `snapshots=refs`. Binds loopback-only: a verification/interop
  * endpoint, not a hardened network service.
  */
final class IcebergRestCatalog private (
    server: HttpServer,
    registry: java.util.concurrent.ConcurrentHashMap[(String, String), String]) {

  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  /** Expose the Iceberg export at `dest` as `namespace`.`table`. */
  def register(namespace: String, table: String, dest: String): Unit = {
    require(Files.exists(Paths.get(dest).resolve("metadata")
        .resolve("version-hint.text")),
      s"'$dest' holds no Iceberg export (missing metadata/version-hint.text)")
    registry.put((namespace, table), dest)
    ()
  }

  def close(): Unit = server.stop(0)
}

object IcebergRestCatalog {
  private val mapper = new ObjectMapper()

  /** Start on an ephemeral loopback port. */
  def start(): IcebergRestCatalog = {
    val registry =
      new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1",
      (x: HttpExchange) => handle(x, registry))
    server.setExecutor(null) // dispatch-thread serving: metadata-sized responses
    server.start()
    new IcebergRestCatalog(server, registry)
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
    * remain (the token is the next start offset over the SORTED list —
    * stable because the listing is re-sorted per request). Without
    * `pageSize` the full list returns in one page (token-less), which
    * is what a non-paginating client gets today. */
  private def page[T](items: Seq[T], p: Map[String, String])
      : (Seq[T], Option[String]) = {
    val start = p.get("pageToken").flatMap(_.toIntOption).getOrElse(0)
    p.get("pageSize").flatMap(_.toIntOption) match {
      case Some(n) if n > 0 =>
        val slice = items.slice(start, start + n)
        val next = if (start + n < items.size) Some((start + n).toString) else None
        (slice, next)
      // pageSize=0 answers an empty page with NO token — a token equal
      // to the current offset would loop a spec-following client
      // forever
      case Some(n) if n == 0 => (Nil, None)
      case _ => (items.drop(start), None)
    }
  }

  private def handle(x: HttpExchange,
      registry: java.util.concurrent.ConcurrentHashMap[(String, String), String]): Unit =
    try {
      val segs = x.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      (x.getRequestMethod, segs) match {
        case ("GET", List("v1", "config")) =>
          json(x, 200, """{"defaults":{},"overrides":{}}""")

        case ("GET", List("v1", "namespaces")) =>
          val root = mapper.createObjectNode()
          val arr = root.putArray("namespaces")
          val (slice, next) = page(
            registry.keySet().asScala.map(_._1).toSeq.distinct.sorted, params(x))
          slice.foreach { ns => arr.addArray().add(ns); () }
          next.foreach(t => root.put("next-page-token", t))
          json(x, 200, root.toString)

        case ("GET", List("v1", "namespaces", ns)) =>
          if (!registry.keySet().asScala.exists(_._1 == ns))
            error(x, 404, "NoSuchNamespaceException", s"namespace '$ns' not found")
          else {
            val root = mapper.createObjectNode()
            root.putArray("namespace").add(ns)
            root.putObject("properties")
            json(x, 200, root.toString)
          }

        case ("GET", List("v1", "namespaces", ns, "tables")) =>
          if (!registry.keySet().asScala.exists(_._1 == ns))
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

        case (m @ ("GET" | "HEAD"), List("v1", "namespaces", ns, "tables", t)) =>
          registry.get((ns, t)) match {
            case null =>
              error(x, 404, "NoSuchTableException", s"table '$ns.$t' not found")
            case _ if m == "HEAD" =>
              x.sendResponseHeaders(200, -1); x.close()
            case dest =>
              val metaDir = Paths.get(dest).resolve("metadata")
              val hint = new String(Files.readAllBytes(
                metaDir.resolve("version-hint.text")),
                StandardCharsets.UTF_8).trim
              val mp = metaDir.resolve(s"v$hint.metadata.json")
              val root = mapper.createObjectNode()
              root.put("metadata-location", mp.toString)
              val meta = mapper.readTree(Files.readAllBytes(mp))
                .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
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
                meta.set[com.fasterxml.jackson.databind.node.ObjectNode](
                  "snapshots", kept)
                ()
              }
              root.set[com.fasterxml.jackson.databind.node.ObjectNode](
                "metadata", meta)
              root.putObject("config")
              json(x, 200, root.toString)
          }

        // recognized WRITE/COMMIT routes answer the spec's ErrorModel
        // with 501 (this catalog is a read interop endpoint, not a
        // writable one) — a foreign writer (Trino CTAS) gets a clean
        // "not supported here" instead of a NoSuchRoute 404 it might
        // retry as a transport error
        case ("POST", List("v1", "namespaces")) |
             ("POST", List("v1", "namespaces", _, "tables")) |
             ("POST", List("v1", "namespaces", _, "tables", _)) |
             ("POST", List("v1", "namespaces", _, "register")) |
             ("POST", List("v1", "tables", "rename")) |
             ("DELETE", List("v1", "namespaces", _)) |
             ("DELETE", List("v1", "namespaces", _, "tables", _)) |
             ("POST", List("v1", "namespaces", _, "properties")) =>
          error(x, 501, "UnsupportedOperationException",
            s"${x.getRequestMethod} ${x.getRequestURI.getPath} is not " +
              "implemented: this catalog serves graft Iceberg exports " +
              "READ-ONLY (write through graft's own surfaces, then " +
              "re-export)")

        case (m, _) =>
          error(x, 404, "NoSuchRouteException",
            s"no route $m ${x.getRequestURI.getPath} (read-only catalog)")
      }
    } catch {
      case e: Exception =>
        error(x, 500, e.getClass.getSimpleName, Option(e.getMessage).getOrElse(""))
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
