package graft.sources

import graft.SparkSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** [[IcebergRestCatalog]]: a foreign reader must be able to discover
  * and load the exported table purely through the public REST catalog
  * routes — config → namespaces → table list → LoadTableResult — and
  * then read rows from the metadata the wire carried (never touching
  * graft's manifest or the version-hint file itself). */
class IcebergRestCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("registerLive: LoadTableResult projects the CURRENT graft snapshot — no manual re-export in the loop") {
    val t = LogTable(spark, tmp("ice_live_src_"))
    t.append((0L until 10L).map(i => (i, s"s$i")).toDF("id", "s"))
    val dest = tmp("ice_live_out_")
    val cat = IcebergRestCatalog.start()
    try {
      cat.registerLive("logs", "live_t", t, dest)
      val g1 = IcebergRead.readRest(spark, cat.uri, "logs", "live_t")
      assert(g1.count() === 10L)
      // a graft-only append: the NEXT load must serve it — the route
      // re-projects on demand, nobody calls export here
      t.append((10L until 25L).map(i => (i, s"s$i")).toDF("id", "s"))
      val g2 = IcebergRead.readRest(spark, cat.uri, "logs", "live_t")
      assert(g2.count() === 25L)
      assert(g2.select("id").as[Long].collect().sorted.toSeq
        === (0L until 25L))
      // an UNCHANGED table must not re-project: version-hint stays
      val hint = java.nio.file.Paths.get(dest)
        .resolve("metadata").resolve("version-hint.text")
      val v = new String(java.nio.file.Files.readAllBytes(hint))
      assert(IcebergRead.readRest(spark, cat.uri, "logs", "live_t")
        .count() === 25L)
      assert(new String(java.nio.file.Files.readAllBytes(hint)) === v,
        "a load of an unchanged table must serve the cached projection")
      // rename keeps liveness; drop removes the entry
      val rn = http.send(HttpRequest.newBuilder(
          URI.create(s"${cat.uri}/v1/tables/rename"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"source":{"namespace":["logs"],"name":"live_t"},
            |"destination":{"namespace":["logs"],"name":"live_r"}}"""
            .stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(rn.statusCode() === 204)
      t.append(Seq((25L, "s25")).toDF("id", "s"))
      assert(IcebergRead.readRest(spark, cat.uri, "logs", "live_r")
        .count() === 26L, "a renamed live table must stay live")
    } finally cat.close()
  }

  test("full REST walk: discover, load, and read the exported table over HTTP only") {
    val t = LogTable(spark, tmp("ice_rest_src_"))
    t.append((0L until 40L).map(i => (i, s"s$i")).toDF("id", "s"))
    val dest = tmp("ice_rest_out_")
    IcebergExport.export(t, dest)

    val cat = IcebergRestCatalog.start()
    try {
      cat.register("logs", "api_requests", dest)

      // 1. config
      val (cc, cb) = get(s"${cat.uri}/v1/config")
      assert(cc === 200)
      assert(mapper.readTree(cb).has("defaults"))

      // 2. namespace discovery
      val (nc, nb) = get(s"${cat.uri}/v1/namespaces")
      assert(nc === 200)
      val nss = mapper.readTree(nb).get("namespaces")
      assert(nss.size() === 1 && nss.get(0).get(0).asText() === "logs")

      // 3. table discovery under the namespace
      val (tc, tb) = get(s"${cat.uri}/v1/namespaces/logs/tables")
      assert(tc === 200)
      val ids = mapper.readTree(tb).get("identifiers")
      assert(ids.size() === 1 && ids.get(0).get("name").asText() === "api_requests")

      // 4. LoadTableResult: metadata arrives INLINE on the wire
      val (lc, lb) = get(s"${cat.uri}/v1/namespaces/logs/tables/api_requests")
      assert(lc === 200)
      val load = mapper.readTree(lb)
      assert(load.get("metadata-location").asText().endsWith("v1.metadata.json"))
      val meta = load.get("metadata")
      assert(meta.get("format-version").asInt() === 2)

      // 5. read rows from the HTTP-served metadata — no version-hint
      // walk, no graft manifest
      val back = IcebergRead.readMeta(spark, IcebergRead.loadMeta(meta))
      assert(back.collect().map(_.toString).sorted.toSeq ===
        t.read().collect().map(_.toString).sorted.toSeq)
    } finally cat.close()
  }

  test("registerTable over HTTP: register an existing metadata location, load + read parity; duplicate 409; stale/bogus locations 400; commits stay 501") {
    val t = LogTable(spark, tmp("ice_rest_reg_"))
    t.append((0L until 30L).map(i => (i, s"r$i")).toDF("id", "s"))
    val dest = tmp("ice_rest_reg_out_")
    IcebergExport.export(t, dest)
    val metaLoc = java.nio.file.Paths.get(dest)
      .resolve("metadata").resolve("v1.metadata.json").toString

    val cat = IcebergRestCatalog.start()
    try {
      // the namespace must exist first (spec: register into a namespace)
      val (nc, _) = post(s"${cat.uri}/v1/namespaces",
        """{"namespace":["ext"]}""")
      assert(nc === 200)
      // register: the whole table arrives in the catalog via ONE HTTP
      // call naming its metadata location — nothing rewritten
      val (rc, rb) = post(s"${cat.uri}/v1/namespaces/ext/register",
        s"""{"name":"mirrored","metadata-location":"$metaLoc"}""")
      assert(rc === 200, rb)
      val reg = mapper.readTree(rb)
      assert(reg.get("metadata-location").asText() === metaLoc)
      assert(reg.get("metadata").get("format-version").asInt() === 2)
      // discovery + load + wire read parity vs the path scan
      val (tc, tb) = get(s"${cat.uri}/v1/namespaces/ext/tables")
      assert(tc === 200)
      assert(mapper.readTree(tb).get("identifiers").get(0)
        .get("name").asText() === "mirrored")
      assert(IcebergRead.readRest(spark, cat.uri, "ext", "mirrored")
        .collect().map(_.toString).sorted.toSeq
        === IcebergRead.read(spark, dest)
          .collect().map(_.toString).sorted.toSeq)
      // duplicate register: 409, first registration untouched
      val (dc, db) = post(s"${cat.uri}/v1/namespaces/ext/register",
        s"""{"name":"mirrored","metadata-location":"$metaLoc"}""")
      assert(dc === 409)
      assert(mapper.readTree(db).get("error").get("type").asText()
        === "AlreadyExistsException")
      // a registered table is NOT owned: REST commits answer 501
      val (cc, cb) = post(s"${cat.uri}/v1/namespaces/ext/tables/mirrored",
        """{"requirements":[],"updates":[]}""")
      assert(cc === 501, cb)
      // bogus location: 400
      val (bc, _) = post(s"${cat.uri}/v1/namespaces/ext/register",
        s"""{"name":"nope","metadata-location":"$dest/metadata/v9.metadata.json"}""")
      assert(bc === 400)
      // a STALE (non-current) location: 400, never silently re-pinned.
      // advance the export first so v1 is no longer current
      t.append(Seq((100L, "x")).toDF("id", "s"))
      IcebergExport.export(t, dest)
      val (sc2, sb2) = post(s"${cat.uri}/v1/namespaces/ext/register",
        s"""{"name":"stale","metadata-location":"$metaLoc"}""")
      assert(sc2 === 400, sb2)
      assert(sb2.contains("current"))
      // unknown namespace: 404
      val (uc, _) = post(s"${cat.uri}/v1/namespaces/ghost/register",
        s"""{"name":"t","metadata-location":"$metaLoc"}""")
      assert(uc === 404)
    } finally cat.close()
  }

  test("mirror refresh is visible on the next REST load without a server restart") {
    val t = LogTable(spark, tmp("ice_rest_mir_"))
    t.append(Seq((1L, "a")).toDF("id", "s"))
    val dest = tmp("ice_rest_mir_out_")
    IcebergExport.export(t, dest)
    val cat = IcebergRestCatalog.start()
    try {
      cat.register("ns", "t", dest)
      def loadedRows(): Long = {
        val (_, b) = get(s"${cat.uri}/v1/namespaces/ns/tables/t")
        val meta = mapper.readTree(b).get("metadata")
        IcebergRead.readMeta(spark, IcebergRead.loadMeta(meta)).count()
      }
      assert(loadedRows() === 1L)
      t.append(Seq((2L, "b")).toDF("id", "s"))
      IcebergExport.export(t, dest) // v2.metadata.json, hint bumped
      assert(loadedRows() === 2L, "re-export visible on next load")
    } finally cat.close()
  }

  test("iceberg_rest_scan('<uri>','<ns>','<t>' [, v]) reads a REST-served table in plain SQL") {
    val t = LogTable(spark, tmp("ice_rest_sql_"))
    t.append((0L until 15L).map(i => (i, s"s$i")).toDF("id", "s"))  // v1
    t.append((15L until 25L).map(i => (i, s"s$i")).toDF("id", "s")) // v2
    val dest = tmp("ice_rest_sql_out_")
    IcebergExport.export(t, dest, history = true)
    val cat = IcebergRestCatalog.start()
    try {
      cat.register("ns", "t", dest)
      val n = GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'ns', 't')")
        .head().getLong(0)
      assert(n === 25L)
      // snapshot-id arg time-travels the REST-served history export
      val n1 = GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'ns', 't', 1)")
        .head().getLong(0)
      assert(n1 === 15L)
      // composes with ordinary SQL, and plain iceberg_scan still binds
      val j = GraftSql.exec(spark,
        s"""SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'ns', 't') a
           |JOIN iceberg_scan('$dest') b ON a.id = b.id""".stripMargin)
        .head().getLong(0)
      assert(j === 25L)
      // a named ref resolves from the wire metadata (no path access)
      t.createRef("first", 1L)
      // refresh with history so the v1-pinned tag's target is exported
      // (a current-only refresh would rightly drop the dangling tag)
      IcebergExport.export(t, dest, history = true)
      val nr = GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'ns', 't', 'first')")
        .head().getLong(0)
      assert(nr === 15L)
    } finally cat.close()
  }

  test("error model: unknown table/namespace answer 404 with the spec's envelope; writes are refused") {
    val t = LogTable(spark, tmp("ice_rest_err_"))
    t.append(Seq((1L, "a")).toDF("id", "s"))
    val dest = tmp("ice_rest_err_out_")
    IcebergExport.export(t, dest)
    val cat = IcebergRestCatalog.start()
    try {
      cat.register("ns", "t", dest)
      val (c1, b1) = get(s"${cat.uri}/v1/namespaces/ns/tables/missing")
      assert(c1 === 404)
      assert(mapper.readTree(b1).get("error").get("type").asText() ===
        "NoSuchTableException")
      val (c2, _) = get(s"${cat.uri}/v1/namespaces/nope/tables")
      assert(c2 === 404)
      // HEAD existence probe
      val head = http.send(HttpRequest.newBuilder(
          URI.create(s"${cat.uri}/v1/namespaces/ns/tables/t"))
        .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.discarding())
      assert(head.statusCode() === 200)
      // a COMMIT against a REGISTERED graft export answers the spec's
      // ErrorModel with 501 ("not supported here"), never NoSuchRoute —
      // its metadata lineage is owned by graft's exporter, and a REST
      // commit would race it (REST-created tables commit fine: see the
      // write-path tests)
      locally {
        val post = http.send(HttpRequest.newBuilder(
            URI.create(s"${cat.uri}/v1/namespaces/ns/tables/t"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(post.statusCode() === 501)
        val err = mapper.readTree(post.body()).get("error")
        assert(err.get("code").asInt() === 501)
        assert(err.get("type").asText() === "UnsupportedOperationException")
      }
      // malformed write bodies answer 400 BadRequestException, not 500
      for (path <- Seq("/v1/namespaces/ns/tables", "/v1/namespaces",
          "/v1/tables/rename")) {
        val post = http.send(HttpRequest.newBuilder(
            URI.create(s"${cat.uri}$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(post.statusCode() === 400, s"POST $path")
        assert(mapper.readTree(post.body()).get("error").get("type").asText()
          === "BadRequestException", s"POST $path")
      }
      // drop is catalog-level: the registered table leaves the catalog,
      // its files stay untouched on disk
      val del = http.send(HttpRequest.newBuilder(
          URI.create(s"${cat.uri}/v1/namespaces/ns/tables/t"))
        .DELETE().build(), HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode() === 204)
      val (cGone, _) = get(s"${cat.uri}/v1/namespaces/ns/tables/t")
      assert(cGone === 404)
      assert(Files.exists(java.nio.file.Paths.get(dest)
        .resolve("metadata").resolve("version-hint.text")),
        "drop must not purge the export's files")
      cat.register("ns", "t", dest) // restore for the closing checks
      // an unrecognized path stays a plain 404 NoSuchRoute
      val (c3, b3) = get(s"${cat.uri}/v1/not-a-route")
      assert(c3 === 404)
      assert(mapper.readTree(b3).get("error").get("type").asText() ===
        "NoSuchRouteException")
      // registering a non-export refuses client-side
      intercept[IllegalArgumentException](cat.register("ns", "bad", tmp("not_an_export_")))
    } finally cat.close()
  }

  private def post(url: String, body: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("REST WRITE path: stage-create + assert-create commit build a table purely over HTTP; spec reader AND graft read it back; assert-ref-snapshot-id guards the next commit") {
    // The "foreign writer"'s FILES: a REST client authors data +
    // manifest + manifest-list files directly in storage (that is the
    // protocol's design — the catalog serves pointers, never data) and
    // commits pointers over HTTP. Graft's own exporter plays the file
    // author here; every CATALOG step below is pure HTTP.
    val scratch = LogTable(spark, tmp("rest_w_src_"))
    scratch.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    val filesLoc = tmp("rest_w_files_")
    IcebergExport.export(scratch, filesLoc)
    def exportedMeta(v: Int) = mapper.readTree(Files.readAllBytes(
      java.nio.file.Paths.get(filesLoc).resolve("metadata")
        .resolve(s"v$v.metadata.json")))
    val exp1 = exportedMeta(1)
    val snap1 = exp1.get("snapshots").get(0)
    val schemaJson = exp1.get("schemas").get(0)

    val cat = IcebergRestCatalog.start()
    val loc = tmp("rest_w_tbl_")
    try {
      // namespace must exist before createTable (404 otherwise)
      val (cNoNs, _) = post(s"${cat.uri}/v1/namespaces/w/tables",
        s"""{"name":"t","location":"$loc","schema":$schemaJson}""")
      assert(cNoNs === 404)
      val (cNs, bNs) = post(s"${cat.uri}/v1/namespaces",
        """{"namespace":["w"],"properties":{"owner":"writer"}}""")
      assert(cNs === 200)
      assert(mapper.readTree(bNs).get("namespace").get(0).asText() === "w")
      // creating it again conflicts
      assert(post(s"${cat.uri}/v1/namespaces",
        """{"namespace":["w"]}""")._1 === 409)

      // STAGE-create: metadata comes back with NO metadata-location and
      // the table stays invisible until the commit (two-phase CTAS)
      val (cStage, bStage) = post(s"${cat.uri}/v1/namespaces/w/tables",
        s"""{"name":"t","location":"$loc","schema":$schemaJson,"stage-create":true}""")
      assert(cStage === 200)
      val staged = mapper.readTree(bStage)
      assert(staged.get("metadata-location") == null,
        "a staged table has no committed metadata location yet")
      assert(staged.get("metadata").get("format-version").asInt() === 2)
      val (cInvisible, _) = get(s"${cat.uri}/v1/namespaces/w/tables/t")
      assert(cInvisible === 404, "staged table must be invisible until commit")

      // the CREATE commit: assert-create + add-snapshot + set main
      val snapId1 = snap1.get("snapshot-id").asLong()
      val (cCommit, bCommit) = post(s"${cat.uri}/v1/namespaces/w/tables/t",
        s"""{"requirements":[{"type":"assert-create"}],
           |"updates":[
           |  {"action":"add-snapshot","snapshot":$snap1},
           |  {"action":"set-snapshot-ref","ref-name":"main",
           |   "type":"branch","snapshot-id":$snapId1}]}""".stripMargin)
      assert(cCommit === 200, bCommit)
      assert(mapper.readTree(bCommit).get("metadata-location").asText()
        .endsWith("v1.metadata.json"))

      // now visible; the wire metadata reads back EQUAL to the source —
      // by the independent spec reader...
      val (cLoad, bLoad) = get(s"${cat.uri}/v1/namespaces/w/tables/t")
      assert(cLoad === 200)
      val wire = mapper.readTree(bLoad).get("metadata")
      assert(wire.get("current-snapshot-id").asLong() === snapId1)
      val back = IcebergRead.readMeta(spark, IcebergRead.loadMeta(wire))
      assert(back.collect().map(_.toString).sorted.toSeq ===
        scratch.read().collect().map(_.toString).sorted.toSeq)
      // ...by plain SQL over REST...
      val n = GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'w', 't')")
        .head().getLong(0)
      assert(n === 3L)
      // ...and by a GRAFT-native import of the REST-committed table
      val imp = IcebergImport.importTable(spark, loc, tmp("rest_w_imp_"))
      assert(imp.read().collect().map(r => (r.getLong(0), r.getString(1)))
        .sorted.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))

      // SECOND commit, CAS-guarded by assert-ref-snapshot-id: the stale
      // expectation refuses 409 and changes nothing; the correct one
      // advances to v2
      scratch.append(Seq((4L, "d")).toDF("id", "s"))
      IcebergExport.export(scratch, filesLoc)
      val snap2 = exportedMeta(2).get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() != snapId1).get
      val snapId2 = snap2.get("snapshot-id").asLong()
      def commit2(expect: Long) = post(s"${cat.uri}/v1/namespaces/w/tables/t",
        s"""{"requirements":[
           |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$expect}],
           |"updates":[
           |  {"action":"add-snapshot","snapshot":$snap2},
           |  {"action":"set-snapshot-ref","ref-name":"main",
           |   "type":"branch","snapshot-id":$snapId2}]}""".stripMargin)
      val (cStale, bStale) = commit2(expect = 999L)
      assert(cStale === 409)
      assert(mapper.readTree(bStale).get("error").get("type").asText() ===
        "CommitFailedException")
      val (_, bStill) = get(s"${cat.uri}/v1/namespaces/w/tables/t")
      assert(mapper.readTree(bStill).get("metadata")
        .get("current-snapshot-id").asLong() === snapId1,
        "a failed requirement must not advance the table")
      val (cOk, bOk) = commit2(expect = snapId1)
      assert(cOk === 200, bOk)
      assert(mapper.readTree(bOk).get("metadata-location").asText()
        .endsWith("v2.metadata.json"))
      val n2 = GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'w', 't')")
        .head().getLong(0)
      assert(n2 === 4L)

      // an assert-create against the now-existing table refuses
      val (cReCreate, bReCreate) = post(s"${cat.uri}/v1/namespaces/w/tables/t",
        """{"requirements":[{"type":"assert-create"}],"updates":[]}""")
      assert(cReCreate === 409)
      assert(mapper.readTree(bReCreate).get("error").get("type").asText() ===
        "CommitFailedException")

      // rename moves the catalog entry; drop of a non-empty namespace
      // refuses until its tables are gone
      assert(post(s"${cat.uri}/v1/tables/rename",
        """{"source":{"namespace":["w"],"name":"t"},
          |"destination":{"namespace":["w"],"name":"t2"}}""".stripMargin)._1 === 204)
      assert(get(s"${cat.uri}/v1/namespaces/w/tables/t")._1 === 404)
      assert(get(s"${cat.uri}/v1/namespaces/w/tables/t2")._1 === 200)
      val delNs = http.send(HttpRequest.newBuilder(
          URI.create(s"${cat.uri}/v1/namespaces/w")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(delNs.statusCode() === 409)
      assert(mapper.readTree(delNs.body()).get("error").get("type").asText()
        === "NamespaceNotEmptyException")
    } finally cat.close()
  }

  test("multi-table transaction: two-table commit lands both or neither; one stale requirement 409s and BOTH tables stay byte-identical") {
    // two scratch exports play the foreign writer's file author
    def exported(tag: String, rows: Seq[(Long, String)])
        : (com.fasterxml.jackson.databind.JsonNode,
           com.fasterxml.jackson.databind.JsonNode) = {
      val t = LogTable(spark, tmp(s"rest_txn_${tag}_"))
      t.append(rows.toDF("id", "s"))
      val loc = tmp(s"rest_txn_${tag}_files_")
      IcebergExport.export(t, loc)
      val exp = mapper.readTree(Files.readAllBytes(
        java.nio.file.Paths.get(loc).resolve("metadata")
          .resolve("v1.metadata.json")))
      (exp.get("snapshots").get(0), exp.get("schemas").get(0))
    }
    val (snapA, schemaA) = exported("a", Seq((1L, "a"), (2L, "b")))
    val (snapB, schemaB) = exported("b", Seq((10L, "x")))
    val cat = IcebergRestCatalog.start()
    try {
      assert(post(s"${cat.uri}/v1/namespaces",
        """{"namespace":["w"]}""")._1 === 200)
      // create both tables over REST (plain create → committed v1)
      def create(name: String, schema: com.fasterxml.jackson.databind.JsonNode)
          : Unit =
        assert(post(s"${cat.uri}/v1/namespaces/w/tables",
          s"""{"name":"$name","location":"${tmp(s"rest_txn_tbl_${name}_")}",
             |"schema":$schema}""".stripMargin)._1 === 200)
      create("ta", schemaA); create("tb", schemaB)
      def metaOf(name: String): String =
        get(s"${cat.uri}/v1/namespaces/w/tables/$name")._2
      def change(name: String, snap: com.fasterxml.jackson.databind.JsonNode,
          reqs: String): String =
        s"""{"identifier":{"namespace":["w"],"name":"$name"},
           |"requirements":[$reqs],
           |"updates":[
           |  {"action":"add-snapshot","snapshot":$snap},
           |  {"action":"set-snapshot-ref","ref-name":"main",
           |   "type":"branch","snapshot-id":${snap.get("snapshot-id").asLong()}}]}"""
          .stripMargin

      // FAILING transaction: ta's requirement asserts a ref that does
      // not exist yet at a WRONG id — nothing may land on EITHER table
      val (preA, preB) = (metaOf("ta"), metaOf("tb"))
      val stale = change("ta", snapA,
        """{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":12345}""") +
        "," + change("tb", snapB, "")
      val (cFail, bFail) = post(s"${cat.uri}/v1/transactions/commit",
        s"""{"table-changes":[$stale]}""")
      assert(cFail === 409, bFail)
      assert(metaOf("ta") === preA, "ta must be untouched after the 409")
      assert(metaOf("tb") === preB,
        "tb must be untouched too — all-or-nothing, not first-N-win")

      // PASSING transaction: both tables advance atomically
      val good = change("ta", snapA, "") + "," + change("tb", snapB, "")
      val (cOk, bOk) = post(s"${cat.uri}/v1/transactions/commit",
        s"""{"table-changes":[$good]}""")
      assert(cOk === 204, bOk)
      assert(GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'w', 'ta')")
        .head().getLong(0) === 2L)
      assert(GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'w', 'tb')")
        .head().getLong(0) === 1L)

      // guard rails: duplicate table refs and empty transactions 400
      assert(post(s"${cat.uri}/v1/transactions/commit",
        s"""{"table-changes":[${change("ta", snapA, "")},${change("ta", snapA, "")}]}""")
        ._1 === 400)
      assert(post(s"${cat.uri}/v1/transactions/commit",
        """{"table-changes":[]}""")._1 === 400)
      // a MULTI-SEGMENT namespace refuses instead of truncating to its
      // first segment (which would commit to a DIFFERENT table)
      assert(post(s"${cat.uri}/v1/transactions/commit",
        s"""{"table-changes":[{"identifier":{"namespace":["w","sub"],"name":"ta"},
           |"requirements":[],"updates":[]}]}""".stripMargin)._1 === 400)
    } finally cat.close()
  }

  test("oauth handshake: requireAuth demands a bearer token on every route; /v1/oauth/tokens issues one; bad grant 400s") {
    val cat = IcebergRestCatalog.start(requireAuth = true)
    try {
      // unauthenticated: 401 with the spec's error envelope
      val (cNo, bNo) = get(s"${cat.uri}/v1/config")
      assert(cNo === 401)
      assert(mapper.readTree(bNo).get("error").get("type").asText()
        === "NotAuthorizedException")
      // a made-up token is refused too
      val badReq = HttpRequest.newBuilder(
          URI.create(s"${cat.uri}/v1/namespaces"))
        .header("Authorization", "Bearer not-a-token").GET().build()
      assert(http.send(badReq,
        HttpResponse.BodyHandlers.ofString()).statusCode() === 401)
      // the client_credentials grant issues a token
      val (cTok, bTok) = post(s"${cat.uri}/v1/oauth/tokens",
        "grant_type=client_credentials&client_id=i&client_secret=s&scope=catalog")
      assert(cTok === 200, bTok)
      val tok = mapper.readTree(bTok)
      assert(tok.get("token_type").asText() === "bearer")
      val bearer = tok.get("access_token").asText()
      // and the bearer unlocks the catalog
      val okReq = HttpRequest.newBuilder(
          URI.create(s"${cat.uri}/v1/config"))
        .header("Authorization", s"Bearer $bearer").GET().build()
      assert(http.send(okReq,
        HttpResponse.BodyHandlers.ofString()).statusCode() === 200)
      // non-client-credentials grants refuse with the OAuth error form
      val (cBadG, bBadG) = post(s"${cat.uri}/v1/oauth/tokens",
        "grant_type=password&username=u&password=p")
      assert(cBadG === 400)
      assert(mapper.readTree(bBadG).get("error").asText()
        === "unsupported_grant_type")
      // the advertised expires_in is ENFORCED: a backdated token stops
      // authenticating and is evicted from the set (no unbounded growth
      // from hourly-refreshing clients)
      cat.tokensForTest.put(bearer,
        java.lang.Long.valueOf(System.currentTimeMillis() - 3601L * 1000L))
      val staleReq = HttpRequest.newBuilder(
          URI.create(s"${cat.uri}/v1/config"))
        .header("Authorization", s"Bearer $bearer").GET().build()
      assert(http.send(staleReq,
        HttpResponse.BodyHandlers.ofString()).statusCode() === 401)
      assert(!cat.tokensForTest.containsKey(bearer),
        "an expired token must be evicted at the gate")
    } finally cat.close()
  }

  test("rename of a STAGED table moves the pending CTAS (commit lands under the new name); rename onto a staged name 409s; missing source 404s") {
    val scratch = LogTable(spark, tmp("rest_rn_src_"))
    scratch.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val filesLoc = tmp("rest_rn_files_")
    IcebergExport.export(scratch, filesLoc)
    val exp1 = mapper.readTree(Files.readAllBytes(
      java.nio.file.Paths.get(filesLoc).resolve("metadata")
        .resolve("v1.metadata.json")))
    val snap1 = exp1.get("snapshots").get(0)
    val schemaJson = exp1.get("schemas").get(0)
    val cat = IcebergRestCatalog.start()
    try {
      assert(post(s"${cat.uri}/v1/namespaces",
        """{"namespace":["w"]}""")._1 === 200)
      def stage(name: String): Int = post(s"${cat.uri}/v1/namespaces/w/tables",
        s"""{"name":"$name","location":"${tmp(s"rest_rn_${name}_")}",
           |"schema":$schemaJson,"stage-create":true}""".stripMargin)._1
      def rename(src: String, dst: String): Int =
        post(s"${cat.uri}/v1/tables/rename",
          s"""{"source":{"namespace":["w"],"name":"$src"},
             |"destination":{"namespace":["w"],"name":"$dst"}}""".stripMargin)._1
      assert(stage("s1") === 200)
      // staged tables rename like registered ones — the spec treats
      // them as existing-but-invisible (round-15's fall-through 404)
      assert(rename("s1", "s2") === 204)
      // the staged NEW name occupies the slot for creates and renames
      assert(stage("s3") === 200)
      assert(rename("s3", "s2") === 409)
      assert(stage("s2") === 409,
        "a staged name must block a second stage-create")
      // a rename with no source anywhere stays 404
      assert(rename("nope", "other") === 404)
      // the pending CTAS commits under the NEW name
      val snapId = snap1.get("snapshot-id").asLong()
      val (cCommit, bCommit) = post(s"${cat.uri}/v1/namespaces/w/tables/s2",
        s"""{"requirements":[{"type":"assert-create"}],
           |"updates":[
           |  {"action":"add-snapshot","snapshot":$snap1},
           |  {"action":"set-snapshot-ref","ref-name":"main",
           |   "type":"branch","snapshot-id":$snapId}]}""".stripMargin)
      assert(cCommit === 200, bCommit)
      assert(get(s"${cat.uri}/v1/namespaces/w/tables/s2")._1 === 200)
      assert(get(s"${cat.uri}/v1/namespaces/w/tables/s1")._1 === 404,
        "the old staged name must be gone after rename")
    } finally cat.close()
  }

  test("pooled serving: concurrent loads during a rename ping-pong never 5xx and never lose the table; final state is exactly one name") {
    val scratch = LogTable(spark, tmp("rest_cc_src_"))
    scratch.append(Seq((1L, "a")).toDF("id", "s"))
    val filesLoc = tmp("rest_cc_files_")
    IcebergExport.export(scratch, filesLoc)
    val cat = IcebergRestCatalog.start()
    try {
      cat.register("w", "t0", filesLoc)
      val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      def renameBody(src: String, dst: String) =
        s"""{"source":{"namespace":["w"],"name":"$src"},
           |"destination":{"namespace":["w"],"name":"$dst"}}""".stripMargin
      val renamer = new Thread(() => {
        (0 until 40).foreach { i =>
          val (s0, d0) = if (i % 2 == 0) ("t0", "t0x") else ("t0x", "t0")
          val c = post(s"${cat.uri}/v1/tables/rename", renameBody(s0, d0))._1
          if (c >= 500) bad.add(s"rename $s0->$d0: $c"); ()
        }
        done.set(true)
      })
      val loaders = (0 until 4).map(_ => new Thread(() => {
        while (!done.get()) Seq("t0", "t0x").foreach { n =>
          val c = get(s"${cat.uri}/v1/namespaces/w/tables/$n")._1
          if (c != 200 && c != 404) bad.add(s"load $n: $c"); ()
        }
      }))
      (renamer +: loaders).foreach(_.start())
      (renamer +: loaders).foreach(_.join(60000))
      assert(bad.isEmpty, s"unexpected statuses under concurrency: $bad")
      // the table survives under EXACTLY one name (40 renames = even →
      // back at t0), readable with its metadata intact
      assert(get(s"${cat.uri}/v1/namespaces/w/tables/t0")._1 === 200)
      assert(get(s"${cat.uri}/v1/namespaces/w/tables/t0x")._1 === 404)
    } finally cat.close()
  }

  test("views under concurrency: loads during a rename ping-pong never 5xx; racing replaces admit exactly one per uuid epoch") {
    val cat = IcebergRestCatalog.start()
    try {
      post(s"${cat.uri}/v1/namespaces", """{"namespace":["cv"]}""")
      val loc = tmp("rest_cv_loc_")
      val (cc, cb) = post(s"${cat.uri}/v1/namespaces/cv/views",
        s"""{"name":"v0","location":"$loc",
           |"schema":{"type":"struct","fields":[
           |  {"id":1,"name":"x","required":false,"type":"long"}]},
           |"view-version":{"version-id":1,"schema-id":0,
           |  "summary":{"operation":"create"},
           |  "representations":[{"type":"sql","dialect":"spark",
           |    "sql":"SELECT 1 AS x"}],
           |  "default-namespace":["cv"]}}""".stripMargin)
      assert(cc === 200, cb)
      val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      def renameBody(src: String, dst: String) =
        s"""{"source":{"namespace":["cv"],"name":"$src"},
           |"destination":{"namespace":["cv"],"name":"$dst"}}""".stripMargin
      val renamer = new Thread(() => {
        (0 until 40).foreach { i =>
          val (s0, d0) = if (i % 2 == 0) ("v0", "v0x") else ("v0x", "v0")
          val c = post(s"${cat.uri}/v1/views/rename", renameBody(s0, d0))._1
          if (c >= 500) bad.add(s"rename $s0->$d0: $c"); ()
        }
        done.set(true)
      })
      val loaders = (0 until 4).map(_ => new Thread(() => {
        while (!done.get()) Seq("v0", "v0x").foreach { n =>
          val c = get(s"${cat.uri}/v1/namespaces/cv/views/$n")._1
          if (c != 200 && c != 404) bad.add(s"load $n: $c"); ()
        }
      }))
      (renamer +: loaders).foreach(_.start())
      (renamer +: loaders).foreach(_.join(60000))
      assert(bad.isEmpty, s"unexpected statuses under concurrency: $bad")
      assert(get(s"${cat.uri}/v1/namespaces/cv/views/v0")._1 === 200)
      assert(get(s"${cat.uri}/v1/namespaces/cv/views/v0x")._1 === 404)

      // racing replaces: N threads commit against the SAME uuid with
      // an optimistic read-modify-write loop capped at one retry each;
      // the per-name lock serializes them, so every accepted commit
      // advances the version log by exactly one and none is lost
      val (_, lb) = get(s"${cat.uri}/v1/namespaces/cv/views/v0")
      val uuid = mapper.readTree(lb).get("metadata")
        .get("view-uuid").asText()
      val accepted = new java.util.concurrent.atomic.AtomicInteger(0)
      def replaceOnce(tag: Int): Int =
        post(s"${cat.uri}/v1/namespaces/cv/views/v0",
          s"""{"requirements":[{"type":"assert-view-uuid","uuid":"$uuid"}],
             |"updates":[
             |  {"action":"add-view-version","view-version":{
             |    "version-id":0,"schema-id":0,
             |    "summary":{"operation":"replace","writer":"t$tag"},
             |    "representations":[{"type":"sql","dialect":"spark",
             |      "sql":"SELECT $tag AS x"}],
             |    "default-namespace":["cv"]}},
             |  {"action":"set-current-view-version","view-version-id":-1}]}"""
            .stripMargin)._1
      val writers = (0 until 6).map(i => new Thread(() => {
        if (replaceOnce(i) == 200) { accepted.incrementAndGet(); () }
        else bad.add(s"replace $i refused")
      }))
      writers.foreach(_.start()); writers.foreach(_.join(60000))
      assert(bad.isEmpty, s"racing replaces misbehaved: $bad")
      assert(accepted.get() === 6)
      val (_, fb) = get(s"${cat.uri}/v1/namespaces/cv/views/v0")
      val fm = mapper.readTree(fb).get("metadata")
      // every commit landed exactly once: create + 6 replaces
      assert(fm.get("versions").size() === 7)
      assert(fm.get("version-log").size() === 7)
      assert(fm.get("current-version-id").asInt() === 7)
    } finally cat.close()
  }

  test("RACING REST commits: two CAS commits with the same assert-ref-snapshot-id admit exactly one (200) and refuse the loser (409), state = winner's") {
    // files for two competing snapshots, authored by graft's exporter
    // against two scratch tables (the catalog only ever sees pointers)
    // pads give each scratch table a DIFFERENT current version, so the
    // three snapshots carry distinct snapshot-ids (the race is decided
    // by id comparison — identical ids would let both racers pass)
    def exportedSnap(tag: String, rows: Seq[(Long, String)], pads: Int)
        : (com.fasterxml.jackson.databind.JsonNode, com.fasterxml.jackson.databind.JsonNode) = {
      val t = LogTable(spark, tmp(s"rest_race_${tag}_"))
      (0 until pads).foreach(i => t.append(Seq((100L + i, "pad")).toDF("id", "s")))
      t.append(rows.toDF("id", "s"))
      val loc = tmp(s"rest_race_${tag}_files_")
      IcebergExport.export(t, loc)
      val m = mapper.readTree(Files.readAllBytes(java.nio.file.Paths.get(loc)
        .resolve("metadata").resolve("v1.metadata.json")))
      (m.get("schemas").get(0), m.get("snapshots").get(0))
    }
    val (schemaJson, snapBase) = exportedSnap("base", Seq((1L, "a")), pads = 0)
    val (_, snapA) = exportedSnap("a", Seq((2L, "b")), pads = 1)
    val (_, snapB) = exportedSnap("b", Seq((3L, "c")), pads = 2)
    assert(Seq(snapBase, snapA, snapB).map(_.get("snapshot-id").asLong())
      .distinct.size === 3)

    val cat = IcebergRestCatalog.start()
    try {
      assert(post(s"${cat.uri}/v1/namespaces", """{"namespace":["r"]}""")._1 === 200)
      val loc = tmp("rest_race_tbl_")
      assert(post(s"${cat.uri}/v1/namespaces/r/tables",
        s"""{"name":"t","location":"$loc","schema":$schemaJson}""")._1 === 200)
      val baseId = snapBase.get("snapshot-id").asLong()
      assert(post(s"${cat.uri}/v1/namespaces/r/tables/t",
        s"""{"requirements":[],"updates":[
           |  {"action":"add-snapshot","snapshot":$snapBase},
           |  {"action":"set-snapshot-ref","ref-name":"main",
           |   "type":"branch","snapshot-id":$baseId}]}""".stripMargin)._1 === 200)

      // both racers expect main at baseId and try to advance it
      def commitBody(snap: com.fasterxml.jackson.databind.JsonNode): String = {
        val id = snap.get("snapshot-id").asLong()
        s"""{"requirements":[
           |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$baseId}],
           |"updates":[
           |  {"action":"add-snapshot","snapshot":$snap},
           |  {"action":"set-snapshot-ref","ref-name":"main",
           |   "type":"branch","snapshot-id":$id}]}""".stripMargin
      }
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(2)
      val gate = new CountDownLatch(1)
      val fs = Seq(snapA, snapB).map { sn =>
        pool.submit(new java.util.concurrent.Callable[(Int, Long)] {
          def call(): (Int, Long) = {
            gate.await()
            val (c, _) = post(s"${cat.uri}/v1/namespaces/r/tables/t", commitBody(sn))
            (c, sn.get("snapshot-id").asLong())
          }
        })
      }
      gate.countDown()
      val results = fs.map(_.get())
      pool.shutdown()
      assert(results.map(_._1).sorted === Seq(200, 409),
        s"exactly one racer must win, got $results")
      val winner = results.find(_._1 == 200).get._2
      val (_, body) = get(s"${cat.uri}/v1/namespaces/r/tables/t")
      val meta = mapper.readTree(body).get("metadata")
      assert(meta.get("current-snapshot-id").asLong() === winner,
        "final state must be the winner's snapshot")
      // exactly the base + winner snapshots landed (the loser's
      // add-snapshot must not leak into a refused commit)
      assert(meta.get("snapshots").size() === 2)
    } finally cat.close()
  }

  test("a FOREIGN format-v1 table serves over REST: discovery, inline v1 metadata, wire read") {
    // minimal hand-authored v1 table (the IcebergExportSpec fixture's
    // shape): single legacy `schema`, flat spec, one v1 manifest list
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val root = java.nio.file.Paths.get(tmp("rest_v1_"))
    val metaDir = root.resolve("metadata"); Files.createDirectories(metaDir)
    val dataDir = root.resolve("data"); Files.createDirectories(dataDir)
    Seq(7L, 8L).toDF("id").coalesce(1).write.parquet(dataDir.resolve("a").toString)
    val f = new java.io.File(dataDir.resolve("a").toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val mSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"}
        |]}}]}""".stripMargin)
    val mp = metaDir.resolve("m1.avro")
    locally {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](mSchema))
      w.create(mSchema, mp.toFile)
      try {
        val dfr = new GenericData.Record(mSchema.getField("data_file").schema())
        dfr.put("file_path", f.getAbsolutePath); dfr.put("file_format", "PARQUET")
        dfr.put("partition", new GenericData.Record(mSchema
          .getField("data_file").schema().getField("partition").schema()))
        dfr.put("record_count", 2L); dfr.put("file_size_in_bytes", f.length())
        val e = new GenericData.Record(mSchema)
        e.put("status", 1); e.put("data_file", dfr)
        w.append(e)
      } finally w.close()
    }
    val metaJson =
      s"""{"format-version":1,"table-uuid":"f00dcafe-0000-0000-0000-0000000000f1",
         |"location":"$root","last-updated-ms":1000,"last-column-id":1,
         |"schema":{"type":"struct","fields":[
         |  {"id":1,"name":"id","required":false,"type":"long"}]},
         |"partition-spec":[],"properties":{},"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"timestamp-ms":1000,
         |  "summary":{"operation":"append"},"manifests":["$mp"]}],
         |"snapshot-log":[{"timestamp-ms":1000,"snapshot-id":1}]}""".stripMargin
    Files.write(metaDir.resolve("v1.metadata.json"), metaJson.getBytes("UTF-8"))
    Files.write(metaDir.resolve("version-hint.text"), "1".getBytes("UTF-8"))

    val cat = IcebergRestCatalog.start()
    try {
      cat.register("legacy", "t1", root.toString)
      val (lc, lb) = get(s"${cat.uri}/v1/namespaces/legacy/tables/t1")
      assert(lc === 200)
      val wire = mapper.readTree(lb).get("metadata")
      assert(wire.get("format-version").asInt() === 1)
      // the wire-carried v1 metadata reads through loadMeta directly
      val back = IcebergRead.readMeta(spark, IcebergRead.loadMeta(wire))
      assert(back.select("id").as[Long].collect().sorted.toSeq === Seq(7L, 8L))
      // and through the SQL-over-REST path
      val n = GraftSql.exec(spark,
        s"SELECT count(*) AS n FROM iceberg_rest_scan('${cat.uri}', 'legacy', 't1')")
        .head().getLong(0)
      assert(n === 2L)
    } finally cat.close()
  }

  test("pagination: pageSize/pageToken walk the table and namespace lists; snapshots=refs trims LoadTableResult") {
    val dest1 = tmp("ice_rest_p1_"); val dest2 = tmp("ice_rest_p2_")
    val dest3 = tmp("ice_rest_p3_")
    val t1 = LogTable(spark, tmp("ice_rest_pt1_"))
    t1.append(Seq((1L, "a")).toDF("id", "s"))
    t1.append(Seq((2L, "b")).toDF("id", "s"))
    t1.createRef("v1tag", 1L)
    IcebergExport.export(t1, dest1, history = true)
    val t2 = LogTable(spark, tmp("ice_rest_pt2_"))
    t2.append(Seq((2L, "b")).toDF("id", "s"))
    IcebergExport.export(t2, dest2)
    val t3 = LogTable(spark, tmp("ice_rest_pt3_"))
    t3.append(Seq((3L, "c")).toDF("id", "s"))
    IcebergExport.export(t3, dest3)
    val cat = IcebergRestCatalog.start()
    try {
      cat.register("ns", "ta", dest1)
      cat.register("ns", "tb", dest2)
      cat.register("ns", "tc", dest3)
      cat.register("other", "tx", dest3)
      // page-size-1 walk visits all three tables in order, one per page
      var token = ""
      val seen = scala.collection.mutable.ListBuffer[String]()
      var more = true
      while (more) {
        val q = if (token.isEmpty) "?pageSize=1" else s"?pageSize=1&pageToken=$token"
        val (c, b) = get(s"${cat.uri}/v1/namespaces/ns/tables$q")
        assert(c === 200)
        val node = mapper.readTree(b)
        node.get("identifiers").elements().asScala
          .foreach(id => seen += id.get("name").asText())
        val next = Option(node.get("next-page-token")).map(_.asText())
        more = next.isDefined
        token = next.getOrElse("")
      }
      assert(seen.toList === List("ta", "tb", "tc"))
      // namespaces list paginates the same way
      val (cn, bn) = get(s"${cat.uri}/v1/namespaces?pageSize=1")
      assert(cn === 200)
      val nsNode = mapper.readTree(bn)
      assert(nsNode.get("namespaces").size() === 1)
      assert(nsNode.get("next-page-token") != null)
      // a token-less full list has no next-page-token (non-paginating
      // clients see the old behavior)
      val (_, bAll) = get(s"${cat.uri}/v1/namespaces/ns/tables")
      assert(mapper.readTree(bAll).get("next-page-token") == null)
      assert(mapper.readTree(bAll).get("identifiers").size() === 3)
      // pageSize=0 answers an empty page with NO token — a token at
      // the current offset would loop a spec-following client forever
      val (_, bZero) = get(s"${cat.uri}/v1/namespaces/ns/tables?pageSize=0")
      assert(mapper.readTree(bZero).get("identifiers").size() === 0)
      assert(mapper.readTree(bZero).get("next-page-token") == null)

      // snapshots=refs: the history export's LoadTableResult trims to
      // ref-reachable snapshots (tag + main head), full by default
      val (_, bFull) = get(s"${cat.uri}/v1/namespaces/ns/tables/ta")
      assert(mapper.readTree(bFull).get("metadata").get("snapshots").size() === 2)
      val (_, bRefs) = get(s"${cat.uri}/v1/namespaces/ns/tables/ta?snapshots=refs")
      val trimmed = mapper.readTree(bRefs).get("metadata").get("snapshots")
      assert(trimmed.size() === 2) // tag pins v1, main pins v2 — both kept
      // drop the tag context: a table with no refs beyond main keeps
      // only the current snapshot under refs mode
      val (_, bRefs2) = get(s"${cat.uri}/v1/namespaces/ns/tables/tb?snapshots=refs")
      assert(mapper.readTree(bRefs2).get("metadata").get("snapshots").size() === 1)
    } finally cat.close()
  }

  test("VIEWS over REST: create/list/load/replace/rename/drop; spec metadata on disk; dialect-gated execution; one identifier space with tables") {
    def delete(url: String): Int =
      http.send(HttpRequest.newBuilder(URI.create(url)).DELETE().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode()
    def head(url: String): Int =
      http.send(HttpRequest.newBuilder(URI.create(url))
        .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody())
        .build(), HttpResponse.BodyHandlers.ofString()).statusCode()

    // the relation the view's SQL resolves against (the view spec
    // stores TEXT + resolution defaults; the serving engine provides
    // the relations — here a session temp view)
    Seq(("a", 1L), ("a", 2L), ("b", 3L), ("drop", 4L))
      .toDF("s", "x").createOrReplaceTempView("rest_view_base")

    val cat = IcebergRestCatalog.start()
    try {
      val (nsc, _) = post(s"${cat.uri}/v1/namespaces", """{"namespace":["vw"]}""")
      assert(nsc === 200)
      // a real table shares the namespace → identifier-space conflicts
      val t = LogTable(spark, tmp("rest_vw_tbl_"))
      t.append(Seq((1L, "z")).toDF("id", "s"))
      val texp = tmp("rest_vw_exp_")
      IcebergExport.export(t, texp)
      cat.register("vw", "t", texp)

      val loc = tmp("rest_vw_loc_")
      val createBody =
        s"""{"name":"v_census","location":"$loc",
           |"schema":{"type":"struct","fields":[
           |  {"id":1,"name":"s","required":false,"type":"string"},
           |  {"id":2,"name":"n","required":false,"type":"long"}]},
           |"view-version":{"version-id":1,"schema-id":0,"timestamp-ms":12345,
           |  "summary":{"operation":"create"},
           |  "representations":[
           |    {"type":"sql","dialect":"spark",
           |     "sql":"SELECT s, count(*) AS n FROM rest_view_base GROUP BY s ORDER BY s"},
           |    {"type":"sql","dialect":"ansi",
           |     "sql":"SELECT s, count(*) AS n FROM rest_view_base GROUP BY 1 ORDER BY 1"}],
           |  "default-namespace":["vw"]},
           |"properties":{"comment":"census"}}""".stripMargin
      val (cc, cb) = post(s"${cat.uri}/v1/namespaces/vw/views", createBody)
      assert(cc === 200, cb)
      val created = mapper.readTree(cb)
      val uuid = created.get("metadata").get("view-uuid").asText()
      assert(uuid.nonEmpty)
      assert(created.get("metadata-location").asText()
        .endsWith("v1.metadata.json"))
      assert(created.get("metadata").get("current-version-id").asInt() === 1)
      // spec metadata is ON DISK at the location (any reader can
      // follow the pointer without this server)
      assert(Files.exists(java.nio.file.Paths.get(loc)
        .resolve("metadata").resolve("v1.metadata.json")))

      // duplicate create 409; name held by a TABLE 409 (one id space)
      assert(post(s"${cat.uri}/v1/namespaces/vw/views", createBody)._1 === 409)
      assert(post(s"${cat.uri}/v1/namespaces/vw/views",
        createBody.replace("v_census", "t"))._1 === 409)
      // and a table create under the VIEW's name 409s too
      val (tcc, tcb) = post(s"${cat.uri}/v1/namespaces/vw/tables",
        s"""{"name":"v_census","location":"${tmp("rest_vw_tloc_")}",
           |"schema":{"type":"struct","fields":[
           |  {"id":1,"name":"id","required":false,"type":"long"}]}}"""
          .stripMargin)
      assert(tcc === 409, tcb)

      // list + HEAD
      val (_, lb) = get(s"${cat.uri}/v1/namespaces/vw/views")
      val ids = mapper.readTree(lb).get("identifiers")
      assert(ids.size() === 1 && ids.get(0).get("name").asText() === "v_census")
      assert(head(s"${cat.uri}/v1/namespaces/vw/views/v_census") === 200)
      assert(head(s"${cat.uri}/v1/namespaces/vw/views/nope") === 404)

      // execution through the dialect gate: spark representation runs,
      // an unknown dialect refuses (never executes foreign SQL)
      val got = IcebergRead.readRestView(spark, cat.uri, "vw", "v_census")
        .as[(String, Long)].collect().toSeq
      assert(got === Seq(("a", 2L), ("b", 1L), ("drop", 1L)))
      val eDia = intercept[IllegalArgumentException](
        IcebergRead.readRestView(spark, cat.uri, "vw", "v_census",
          dialects = Seq("duckdb")))
      assert(eDia.getMessage.contains("dialect"))

      // REPLACE: assert-view-uuid + add-schema/add-view-version with
      // the -1 sentinels; version-log grows; execution follows
      val replaceBody =
        s"""{"requirements":[{"type":"assert-view-uuid","uuid":"$uuid"}],
           |"updates":[
           |  {"action":"set-properties","updates":{"comment":"v2"}},
           |  {"action":"add-schema","schema":{"type":"struct","fields":[
           |    {"id":1,"name":"s","required":false,"type":"string"},
           |    {"id":2,"name":"n","required":false,"type":"long"}]}},
           |  {"action":"add-view-version","view-version":{
           |    "version-id":0,"schema-id":-1,"timestamp-ms":23456,
           |    "summary":{"operation":"replace"},
           |    "representations":[{"type":"sql","dialect":"spark",
           |      "sql":"SELECT s, count(*) AS n FROM rest_view_base WHERE s <> 'drop' GROUP BY s ORDER BY s"}],
           |    "default-namespace":["vw"]}},
           |  {"action":"set-current-view-version","view-version-id":-1}]}"""
          .stripMargin
      val (rc, rb) = post(s"${cat.uri}/v1/namespaces/vw/views/v_census",
        replaceBody)
      assert(rc === 200, rb)
      val rmeta = mapper.readTree(rb)
      assert(rmeta.get("metadata-location").asText()
        .endsWith("v2.metadata.json"))
      assert(rmeta.get("metadata").get("current-version-id").asInt() === 2)
      assert(rmeta.get("metadata").get("version-log").size() === 2)
      assert(rmeta.get("metadata").get("properties")
        .get("comment").asText() === "v2")
      val got2 = IcebergRead.readRestView(spark, cat.uri, "vw", "v_census")
        .as[(String, Long)].collect().toSeq
      assert(got2 === Seq(("a", 2L), ("b", 1L)))

      // stale uuid → 409, view unchanged
      val (sc2, sb2) = post(s"${cat.uri}/v1/namespaces/vw/views/v_census",
        replaceBody.replace(uuid, "00000000-0000-0000-0000-000000000000"))
      assert(sc2 === 409, sb2)
      val (_, after) = get(s"${cat.uri}/v1/namespaces/vw/views/v_census")
      assert(mapper.readTree(after).get("metadata-location").asText()
        .endsWith("v2.metadata.json"))

      // rename: onto a free name 204; onto the TABLE's name 409
      assert(post(s"${cat.uri}/v1/views/rename",
        """{"source":{"namespace":["vw"],"name":"v_census"},
          |"destination":{"namespace":["vw"],"name":"t"}}""".stripMargin)
        ._1 === 409)
      assert(post(s"${cat.uri}/v1/views/rename",
        """{"source":{"namespace":["vw"],"name":"v_census"},
          |"destination":{"namespace":["vw"],"name":"v2"}}""".stripMargin)
        ._1 === 204)
      assert(head(s"${cat.uri}/v1/namespaces/vw/views/v_census") === 404)
      assert(IcebergRead.readRestView(spark, cat.uri, "vw", "v2")
        .as[(String, Long)].collect().toSeq === Seq(("a", 2L), ("b", 1L)))

      // SQL surface: the view as a table function, same dialect gate
      val sqlGot = GraftSql.exec(spark,
        s"SELECT * FROM rest_view('${cat.uri}', 'vw', 'v2') WHERE n >= 1")
        .as[(String, Long)].collect().toSeq
      assert(sqlGot === Seq(("a", 2L), ("b", 1L)))

      // reportMetrics sink: a spec client's post-scan report is
      // acknowledged, never 404-degraded; unknown tables still 404
      assert(post(s"${cat.uri}/v1/namespaces/vw/tables/t/metrics",
        """{"report-type":"scan-report"}""")._1 === 204)
      assert(post(s"${cat.uri}/v1/namespaces/vw/tables/nope/metrics",
        "{}")._1 === 404)

      // namespace with views refuses to drop; drop view; then 404s
      assert(delete(s"${cat.uri}/v1/namespaces/vw") === 409)
      assert(delete(s"${cat.uri}/v1/namespaces/vw/views/v2") === 204)
      assert(delete(s"${cat.uri}/v1/namespaces/vw/views/v2") === 404)
      val (_, lb2) = get(s"${cat.uri}/v1/namespaces/vw/views")
      assert(mapper.readTree(lb2).get("identifiers").size() === 0)
    } finally cat.close()
  }

  test("v3 row lineage is VALIDATED on REST commits: missing/regressing first-row-id 409s, conforming commits advance next-row-id") {
    val cat = IcebergRestCatalog.start()
    try {
      assert(post(s"${cat.uri}/v1/namespaces",
        """{"namespace":["l3"]}""")._1 === 200)
      val schema = """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":true,"type":"long"}]}""".stripMargin
      val (cc, _) = post(s"${cat.uri}/v1/namespaces/l3/tables",
        s"""{"name":"t","location":"${tmp("rest_v3_tbl_")}","schema":$schema}""")
      assert(cc === 200)
      // upgrade to v3 — metadata gains the row-lineage high-water mark
      val (cUp, _) = post(s"${cat.uri}/v1/namespaces/l3/tables/t",
        """{"requirements":[],"updates":[
          |{"action":"upgrade-format-version","format-version":3}]}""".stripMargin)
      assert(cUp === 200)
      def wireMeta() = {
        val (c, b) = get(s"${cat.uri}/v1/namespaces/l3/tables/t")
        assert(c === 200); mapper.readTree(b).get("metadata")
      }
      val m0 = wireMeta()
      assert(m0.get("format-version").asInt() === 3)
      assert(m0.get("next-row-id").asLong() === 0L)
      // downgrade refused
      assert(post(s"${cat.uri}/v1/namespaces/l3/tables/t",
        """{"requirements":[],"updates":[
          |{"action":"upgrade-format-version","format-version":2}]}""".stripMargin)
        ._1 === 400)

      def addSnap(id: Long, firstRowId: Option[Long], added: Long) = {
        val fr = firstRowId.map(v => s""""first-row-id":$v,""").getOrElse("")
        post(s"${cat.uri}/v1/namespaces/l3/tables/t",
          s"""{"requirements":[],"updates":[
             |{"action":"add-snapshot","snapshot":{
             |  "snapshot-id":$id,$fr
             |  "sequence-number":$id,"timestamp-ms":1700000000000,
             |  "summary":{"operation":"append","added-records":"$added"},
             |  "manifest-list":"/nonexistent/ml-$id.avro","schema-id":0}},
             |{"action":"set-snapshot-ref","ref-name":"main",
             | "type":"branch","snapshot-id":$id}]}""".stripMargin)
      }
      // 1. a v3 snapshot WITHOUT first-row-id: 409, nothing committed
      val (cNoFr, bNoFr) = addSnap(101L, None, 3L)
      assert(cNoFr === 409)
      assert(mapper.readTree(bNoFr).get("error").get("type").asText() ===
        "CommitFailedException")
      assert(wireMeta().get("snapshots").size() === 0,
        "a refused lineage commit must not land")
      // 2. conforming commit: first-row-id = next-row-id (0), 3 rows
      assert(addSnap(101L, Some(0L), 3L)._1 === 200)
      val m1 = wireMeta()
      assert(m1.get("next-row-id").asLong() === 3L,
        "next-row-id must advance past the assigned rows")
      assert(m1.get("current-snapshot-id").asLong() === 101L)
      // 3. REGRESSING commit: first-row-id 1 < next-row-id 3 → 409,
      //    state unchanged
      val (cReg, bReg) = addSnap(102L, Some(1L), 2L)
      assert(cReg === 409)
      assert(mapper.readTree(bReg).get("error").get("message").asText()
        .contains("regresses"))
      assert(wireMeta().get("next-row-id").asLong() === 3L)
      assert(wireMeta().get("snapshots").size() === 1)
      // 4. a writer may skip ids forward (spec allows gaps): 5 ≥ 3 is
      //    conforming; next-row-id = 5 + 2
      assert(addSnap(103L, Some(5L), 2L)._1 === 200)
      assert(wireMeta().get("next-row-id").asLong() === 7L)
    } finally cat.close()
  }
}
