package graft

import java.net.{HttpURLConnection, URL}
import scala.io.Source

import graft.server.QueryServer

/** HTTP endpoint behavior (reference `src/server.rs`): 200+JSON on
  * success, 400 on missing param / parse error, CORS on every response.
  */
class ServerSpec extends SparkTestBase {

  private lazy val dir = {
    val d = "/root/repo/data/wikidata"
    graft.ingest.WikidataIngest.statements(spark, d)
    d
  }

  private def get(path: String): (Int, String, Map[String, String]) = {
    val conn = new URL(s"http://localhost:$port$path").openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    // bodyless error responses (e.g. 404 on static paths) have no stream
    val body =
      if (stream == null) "" else Source.fromInputStream(stream, "UTF-8").mkString
    import scala.jdk.CollectionConverters._
    val headers = conn.getHeaderFields.asScala.collect {
      case (k, v) if k != null => k -> v.asScala.mkString(",")
    }.toMap
    (code, body, headers)
  }

  private lazy val (server, port) = {
    dir // force ingest
    val srv = QueryServer.start(spark, dir, 0) // 0 = ephemeral port
    (srv, srv.getAddress.getPort)
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  test("server jobs run under FAIR scheduling in a per-request pool") {
    // the serving claim ConcurrencyBench measures: the session is FAIR
    // (GraftSession default) and every HTTP request's Spark jobs carry
    // a graft-req-* pool, so short queries share the executor with a
    // long one instead of FIFO-queueing behind its stages
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode", "FIFO") === "FAIR")
    val pools = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = js.properties.getProperty("spark.scheduler.pool")
        if (p != null) pools.add(p)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val sparql = "SELECT ?p WHERE { wdt:Q31 ?p ?b . } LIMIT 2"
      assert(get("/query?query=" + java.net.URLEncoder.encode(sparql, "UTF-8"))._1 === 200)
      // listener delivery is async; jobs for the request above may post
      // after the HTTP response returns — poll briefly
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime() + 10e9.toLong
      while (!pools.asScala.exists(_.startsWith("graft-req-")) &&
             System.nanoTime() < deadline) Thread.sleep(50)
      val seen = pools.asScala.toSeq
      assert(seen.nonEmpty && seen.exists(_.startsWith("graft-req-")),
        s"no graft-req-* pool on any job: $seen")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("repeated queries hit the translated-plan cache; toggled flags and rebuilds miss") {
    QueryServer.planCacheReset()
    val sparql = "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 4"
    val q = "/query?query=" + java.net.URLEncoder.encode(sparql, "UTF-8")
    val first = get(q)
    assert(first._1 === 200)
    assert(QueryServer.planCacheMisses.get() === 1L)
    // repeats reuse the analyzed plan: no re-parse/translate, and the
    // served bytes are identical
    val repeats = (1 to 3).map(_ => get(q))
    repeats.foreach { r => assert(r._1 === 200); assert(r._2 === first._2) }
    assert(QueryServer.planCacheHits.get() === 3L)
    assert(QueryServer.planCacheMisses.get() === 1L)
    // EVERY registered translate-time flag is part of the key —
    // toggling any one of them must NOT serve the other mode's plan.
    // Iterating the registry (not a hand-kept list) means a future
    // sixth flag is covered the day it is registered.
    graft.sparql.TranslateFlags.all.zipWithIndex.foreach {
      case ((flag, default), i) =>
        val flipped = if (default == "false") "true" else "1234567"
        spark.conf.set(flag, flipped)
        try { assert(get(q)._1 === 200, s"flag $flag flipped") }
        finally spark.conf.unset(flag)
        assert(QueryServer.planCacheMisses.get() === 2L + i,
          s"flipping $flag must miss the plan cache")
    }
    val missesAfterFlips = 1L + graft.sparql.TranslateFlags.all.size
    assert(QueryServer.planCacheMisses.get() === missesAfterFlips)
    // the guard that keeps the registry complete: a translate-time read
    // of an unregistered flag fails loudly instead of silently
    // bypassing the cache key
    assertThrows[IllegalArgumentException] {
      graft.sparql.TranslateFlags.get(spark, "spark.graft.not.registered")
    }
    // cache off via size 0: every request translates fresh
    spark.conf.set("spark.graft.server.planCacheSize", "0")
    try {
      assert(get(q)._1 === 200)
      assert(QueryServer.planCacheHits.get() === 3L) // unchanged
    } finally spark.conf.unset("spark.graft.server.planCacheSize")
  }

  test("warmup flag runs a translation+action before the port binds; failure never blocks serving") {
    spark.conf.set("spark.graft.server.warmup", "true")
    try {
      QueryServer.planCacheReset()
      val srv = QueryServer.start(spark, dir, 0)
      try {
        // the warmup went through the plan cache before start() returned
        assert(QueryServer.planCacheMisses.get() === 1L)
        val conn = new java.net.URL(
          s"http://localhost:${srv.getAddress.getPort}/query?query=" +
            java.net.URLEncoder.encode("ASK { ?s ?p ?o }", "UTF-8"))
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setReadTimeout(120000)
        assert(conn.getResponseCode === 200)
      } finally srv.stop(0)
      // a warmup failure (corrupt store) must not prevent startup
      val bad = java.nio.file.Files.createTempDirectory("graft-badstore")
      java.nio.file.Files.createFile(bad.resolve("statements.parquet"))
      val srv2 = QueryServer.start(spark, bad.toString, 0)
      try assert(srv2.getAddress.getPort > 0) finally srv2.stop(0)
    } finally spark.conf.unset("spark.graft.server.warmup")
  }

  test("a store rebuild bumps the epoch and invalidates cached plans") {
    // rebuild into a TEMP dir served by a second server: the epoch is
    // per store dir, so the shared fixture store stays untouched
    val tmp = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    graft.ingest.WikidataIngest.build(spark, dir = tmp)
    val srv2 = QueryServer.start(spark, tmp, 0)
    val port2 = srv2.getAddress.getPort
    try {
      QueryServer.planCacheReset()
      def get2(sparql: String) = {
        val conn = new java.net.URL(s"http://localhost:$port2/query?query=" +
          java.net.URLEncoder.encode(sparql, "UTF-8")).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setReadTimeout(120000)
        (conn.getResponseCode,
          scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString)
      }
      val sparql = "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 2"
      assert(get2(sparql)._1 === 200)
      assert(get2(sparql)._1 === 200)
      assert(QueryServer.planCacheHits.get() === 1L)
      // an in-process rebuild of the served store must invalidate: the
      // cached plan's file listing points at overwritten parquet parts
      graft.ingest.WikidataIngest.build(spark, dir = tmp)
      val after = get2(sparql)
      assert(after._1 === 200 && after._2.contains("\"bindings\""))
      assert(QueryServer.planCacheMisses.get() === 2L)
    } finally srv2.stop(0)
  }

  test("concurrent requests all succeed (shared session, parallel jobs)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val q = "/query?query=" + java.net.URLEncoder.encode(
      "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 3", "UTF-8")
    val results = Await.result(
      Future.sequence(Seq.fill(4)(Future(get(q)))), 120.seconds)
    results.foreach { case (code, body, _) =>
      assert(code === 200)
      assert(body.contains(""""bindings""""))
    }
  }

  test("two parallel runaway queries are both bounded by the per-query timeout") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // a triple cartesian over the store (3385^3 rows) cannot finish;
    // the timeout must cancel its job group and answer 503
    val runaway = "/query?query=" + java.net.URLEncoder.encode(
      "SELECT ?a ?b ?c WHERE { ?a ?p1 ?o1 . ?b ?p2 ?o2 . ?c ?p3 ?o3 }", "UTF-8")
    spark.conf.set("spark.graft.server.timeoutMs", "2000")
    try {
      val t0 = System.nanoTime()
      val results = Await.result(
        Future.sequence(Seq.fill(2)(Future(get(runaway)))), 90.seconds)
      val elapsedS = (System.nanoTime() - t0) / 1e9
      results.foreach { case (code, body, _) =>
        assert(code === 503, s"expected 503, got $code: $body")
        assert(body.contains("spark.graft.server.timeoutMs"))
      }
      assert(elapsedS < 60, f"timeout responses took $elapsedS%.1f s")
      // the shared session must stay healthy for the next query
      val ok = "/query?query=" + java.net.URLEncoder.encode(
        "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 3", "UTF-8")
      val (okCode, okBody, _) = get(ok)
      assert(okCode === 200 && okBody.contains(""""bindings""""))
    } finally spark.conf.unset("spark.graft.server.timeoutMs")
  }

  test("saturation: 16 concurrent mixed requests; fast queries finish while a runaway burns its own timeout") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // one deliberately slow query (triple cartesian, can only die by
    // timeout) + 15 fast ones, half GET half POST. FAIR pools must let
    // the fast ones through while the runaway occupies the cluster,
    // and the timeout must fire for the runaway REQUEST only.
    val fastQ = "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 3"
    val fastGet = "/query?query=" + java.net.URLEncoder.encode(fastQ, "UTF-8")
    val runaway = "/query?query=" + java.net.URLEncoder.encode(
      "SELECT ?a ?b ?c WHERE { ?a ?p1 ?o1 . ?b ?p2 ?o2 . ?c ?p3 ?o3 }", "UTF-8")
    get(fastGet) // warm the translation path outside the measured window
    spark.conf.set("spark.graft.server.timeoutMs", "20000")
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val slowF = Future(timed(get(runaway)))
      val fastFs = (0 until 15).map { i =>
        Future(timed(
          if (i % 2 == 0) get(fastGet)
          else post("/query", fastQ, "application/sparql-query")))
      }
      val fasts = Await.result(Future.sequence(fastFs), 120.seconds)
      val ((slowCode, slowBody, _), slowSecs) = Await.result(slowF, 120.seconds)
      fasts.foreach { case ((code, body, _), _) =>
        assert(code === 200, s"fast query failed: $code $body")
        assert(body.contains("\"bindings\""))
      }
      assert(slowCode === 503, s"runaway must time out: $slowCode $slowBody")
      assert(slowBody.contains("spark.graft.server.timeoutMs"))
      // the LOGICAL property (not a wall-clock bound, which flakes on
      // loaded runners): the timeout fired for the runaway request
      // alone, and every fast request completed before it — strictly
      // interleaved execution, nobody starved behind the runaway
      assert(fasts.map(_._2).max < slowSecs,
        f"fast max ${fasts.map(_._2).max}%.1f s vs runaway $slowSecs%.1f s — starved behind the runaway")
      // and the session serves cleanly afterwards
      val (okCode, okBody, _) = get(fastGet)
      assert(okCode === 200 && okBody.contains("\"bindings\""))
    } finally spark.conf.unset("spark.graft.server.timeoutMs")
  }

  test("GET /query returns SPARQL-Results-JSON with CORS") {
    val (code, body, headers) =
      get("/query?query=" + java.net.URLEncoder.encode(
        "SELECT ?t WHERE { wd:Q31 wdt:P31 ?t } LIMIT 2", "UTF-8"))
    assert(code === 200)
    assert(body.startsWith("""{"head":{"vars":["t"]},"results":{"bindings":["""))
    assert(body.contains(""""type":"uri""""))
    val cors = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Access-Control-Allow-Origin") => v
    }
    assert(cors === Some("*"))
  }

  private def post(path: String, body: String, contentType: String)
      : (Int, String, Map[String, String]) = {
    val conn = new URL(s"http://localhost:$port$path").openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(120000)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", contentType)
    conn.setDoOutput(true)
    val os = conn.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val b = if (stream == null) "" else Source.fromInputStream(stream, "UTF-8").mkString
    import scala.jdk.CollectionConverters._
    val headers = conn.getHeaderFields.asScala.collect {
      case (k, v) if k != null => k -> v.asScala.mkString(",")
    }.toMap
    (code, b, headers)
  }

  test("POST /update mutates its store; queries on the same server observe it") {
    // a server over a PRIVATE store copy — updates must not touch the
    // shared fixture store other suites assert counts on
    val upDir = java.nio.file.Files.createTempDirectory("graft-srv-up")
      .toFile.getAbsolutePath
    graft.ingest.WikidataIngest.writeStore(spark,
      graft.ingest.WikidataIngest.ingest(spark, graft.ingest.WikidataIngest.fixturePath),
      upDir)
    val srv = QueryServer.start(spark, upDir, 0)
    val uport = srv.getAddress.getPort
    def upost(path: String, body: String, ct: String): (Int, String) = {
      val conn = new URL(s"http://localhost:$uport$path").openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(5000); conn.setReadTimeout(120000)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", ct)
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(body.getBytes("UTF-8")) finally os.close()
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      (code, if (stream == null) "" else Source.fromInputStream(stream, "UTF-8").mkString)
    }
    def uget(q: String): String = {
      val enc = java.net.URLEncoder.encode(q, "UTF-8")
      val conn = new URL(s"http://localhost:$uport/query?query=$enc").openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(5000); conn.setReadTimeout(120000)
      Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    }
    try {
      // §2.2.2: raw application/sparql-update body
      val (c1, b1) = upost("/update",
        "INSERT DATA { wd:Q900 wdt:P900 wd:Q901 }", "application/sparql-update")
      assert(c1 === 200 && b1.contains("\"inserted\": 1"))
      assert(uget("SELECT ?o WHERE { wd:Q900 wdt:P900 ?o }").contains("Q901"))
      // §2.2.1: urlencoded form field
      val enc = java.net.URLEncoder.encode(
        "DELETE DATA { wd:Q900 wdt:P900 wd:Q901 }", "UTF-8")
      val (c2, b2) = upost("/update", s"update=$enc",
        "application/x-www-form-urlencoded")
      assert(c2 === 200 && b2.contains("\"deleted\": 1"))
      assert(!uget("SELECT ?o WHERE { wd:Q900 wdt:P900 ?o }").contains("Q901"))
      // GET is not an update method; parse errors are 400s
      val conn = new URL(s"http://localhost:$uport/update").openConnection()
        .asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode === 405)
      val (c4, b4) = upost("/update", "INSERT broken", "application/sparql-update")
      assert(c4 === 400 && b4.contains("update parse error"))
    } finally srv.stop(0)
  }

  test("POST /query accepts urlencoded form and raw sparql-query bodies") {
    val q = "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 2"
    val enc = java.net.URLEncoder.encode(q, "UTF-8")
    // SPARQL 1.1 Protocol §2.1.2: query in a form-urlencoded body
    val (c1, b1, _) = post("/query", s"query=$enc",
      "application/x-www-form-urlencoded")
    assert(c1 === 200 && b1.contains("\"bindings\""))
    // §2.1.3: the body IS the query (no URL-length bound)
    val (c2, b2, h2) = post("/query", q, "application/sparql-query; charset=UTF-8")
    assert(c2 === 200 && b2 === b1)
    assert(h2.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Access-Control-Allow-Origin") => v
    } === Some("*"))
    // parse errors surface the same way as GET
    val (c3, b3, _) = post("/query", "SELECT ?p WHERE { broken",
      "application/sparql-query")
    assert(c3 === 400 && b3.startsWith("parse error"))
  }

  test("POST body above the byte cap → 413, never buffered whole") {
    spark.conf.set("spark.graft.server.maxBodyBytes", 1024)
    try {
      val big = "SELECT ?p WHERE { " + ("# pad \n" * 400) + "}"
      val (code, body, _) = post("/query", big, "application/sparql-query")
      assert(code === 413 && body.contains("maxBodyBytes"))
      // at the cap boundary the query still runs
      val (ok, _, _) = post("/query",
        "ASK { wd:Q999999999 ?p ?o }", "application/sparql-query")
      assert(ok === 200)
    } finally spark.conf.unset("spark.graft.server.maxBodyBytes")
  }

  test("OPTIONS preflight advertises POST with CORS headers") {
    val conn = new URL(s"http://localhost:$port/query").openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("OPTIONS")
    assert(conn.getResponseCode === 204)
    assert(conn.getHeaderField("Access-Control-Allow-Methods").contains("POST"))
    assert(conn.getHeaderField("Access-Control-Allow-Origin") === "*")
  }

  test("explain=true returns the plan as text without executing; bad mode → 400") {
    val enc = java.net.URLEncoder.encode(
      "SELECT ?t WHERE { wd:Q31 wdt:P31 ?t } LIMIT 2", "UTF-8")
    val (code, body, headers) = get(s"/query?query=$enc&explain=true")
    assert(code === 200)
    assert(body.contains("== Physical Plan =="), body.take(200))
    assert(headers.exists { case (k, v) =>
      k.equalsIgnoreCase("Content-Type") && v.startsWith("text/plain") })
    // a named mode works too
    val (c2, b2, _) = get(s"/query?query=$enc&explain=extended")
    assert(c2 === 200 && b2.contains("== Analyzed Logical Plan =="))
    // junk mode is the caller's error, not a server fault
    val (c3, b3, _) = get(s"/query?query=$enc&explain=bogus")
    assert(c3 === 400 && b3.contains("bad explain mode"), s"$c3: $b3")
  }

  test("GET / serves the query UI; unknown static paths 404") {
    val (code, body, headers) = get("/")
    assert(code === 200)
    val ctype = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Type") => v
    }
    assert(ctype.exists(_.startsWith("text/html")))
    assert(body.contains("<textarea"), "UI has no query textarea")
    // the page submits to the /query endpoint with a relative URL
    assert(body.contains("query?query="), "UI does not target /query")
    val (code2, _, _) = get("/no-such-file.js")
    assert(code2 === 404)
  }

  test("ASK renders the boolean form") {
    val (code, body, _) =
      get("/query?query=" + java.net.URLEncoder.encode(
        "ASK { wd:Q999999999 ?p ?o }", "UTF-8"))
    assert(code === 200)
    assert(body === """{"head":{"vars":[]},"boolean":false}""")
  }

  test("parse error → 400 with message (reference src/server.rs:119-128)") {
    val (code, body, _) =
      get("/query?query=" + java.net.URLEncoder.encode("SELECT ?x WHERE { broken", "UTF-8"))
    assert(code === 400)
    assert(body.startsWith("parse error:"))
  }

  test("missing query parameter → 400") {
    val (code, body, _) = get("/query")
    assert(code === 400)
    assert(body.contains("missing 'query' parameter"))
  }

  test("oversize result → 500 with the row-cap message, never silent truncation") {
    spark.conf.set("spark.graft.json.maxRows", "10")
    try {
      val big = "/query?query=" + java.net.URLEncoder.encode(
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o }", "UTF-8") // 3385 rows > 10
      val (code, body, _) = get(big)
      assert(code === 500)
      assert(body.contains("spark.graft.json.maxRows"))
      // a result within the cap still serializes completely
      val small = "/query?query=" + java.net.URLEncoder.encode(
        "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 9", "UTF-8")
      val (okCode, okBody, _) = get(small)
      assert(okCode === 200)
      assert(okBody.count(_ == '{') > 9) // all 9 bindings present
    } finally spark.conf.unset("spark.graft.json.maxRows")
  }

  test("streaming mode serves results past the row cap; byte budget aborts the stream") {
    val big = "/query?query=" + java.net.URLEncoder.encode(
      "SELECT ?s ?p ?o WHERE { ?s ?p ?o }", "UTF-8") // 3385 rows
    spark.conf.set("spark.graft.json.maxRows", "10")
    spark.conf.set("spark.graft.server.streamResults", "true")
    try {
      // above the row cap → still 200, chunked, COMPLETE (the buffered
      // path 500s on this exact query — pinned by the oversize test)
      val (code, body, headers) = get(big)
      assert(code === 200)
      assert(headers.get("Transfer-encoding").exists(_.contains("chunked")) ||
        !headers.contains("Content-length"), s"expected a chunked response: $headers")
      assert(body.endsWith("]}}"), "stream ran to completion")
      assert("\"s\":\\{".r.findAllIn(body).length === 3385, "every binding present")
      // a hard byte budget aborts the chunked body instead of lying
      // with a complete-looking prefix: either the connection dies
      // mid-transfer (hard close) or the body carries the explicit
      // abort marker and unbalanced JSON
      spark.conf.set("spark.graft.server.maxResultBytes", "512")
      val aborted =
        try {
          val (c2, b2, _) = get(big)
          (c2 != 200) ||
            (!b2.endsWith("]}}") && b2.contains(QueryServer.StreamAbortMarker.trim))
        } catch { case _: java.io.IOException => true }
      assert(aborted, "an over-budget stream must not read as complete")
    } finally {
      spark.conf.unset("spark.graft.json.maxRows")
      spark.conf.unset("spark.graft.server.streamResults")
      spark.conf.unset("spark.graft.server.maxResultBytes")
    }
  }

  test("streaming mode: a runaway query 503s before claiming the stream") {
    // the stream claims the response only AFTER the first rows are
    // materialized — a query whose first partition cannot finish inside
    // the timeout must get the clean 503, never headers + a hung body
    val runaway = "/query?query=" + java.net.URLEncoder.encode(
      "SELECT ?a ?b ?c WHERE { ?a ?p1 ?o1 . ?b ?p2 ?o2 . ?c ?p3 ?o3 }", "UTF-8")
    // hermeticity: earlier tests (parallel runaways, saturation) cancel
    // job groups whose cartesian tasks keep draining for a while; on a
    // cold loaded JVM they can occupy every task slot long enough that
    // THIS test's requests blow the client read timeout for reasons
    // that are residual load, not server health. Start on a quiet
    // scheduler so the assertions measure this test only.
    val quiesceDeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty &&
      System.nanoTime() < quiesceDeadline) Thread.sleep(250)
    spark.conf.set("spark.graft.server.streamResults", "true")
    spark.conf.set("spark.graft.server.timeoutMs", "2000")
    try {
      // one retry on a client-side read timeout: a full-suite run can
      // wedge the whole JVM for >2 min (GC/RPC stall from the earlier
      // saturation tests' draining cartesians — seen as a 120 s
      // NettyRpcEnv timeout in the same run), which starves even the
      // watchdog's 503 write. The property under test (clean 503,
      // never headers + a hung body) is asserted on the retried
      // request all the same; only the environmental stall is absorbed.
      def timedGet(): (Double, (Int, String, Map[String, String])) = {
        val t0 = System.nanoTime()
        val r = get(runaway)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (elapsedS, (code, body, _)) =
        try timedGet()
        catch {
          case _: java.net.SocketTimeoutException =>
            while (spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty)
              Thread.sleep(250)
            timedGet()
        }
      assert(code === 503, s"streamed runaway must time out cleanly: $code $body")
      assert(body.contains("spark.graft.server.timeoutMs"))
      assert(elapsedS < 60, f"503 took $elapsedS%.1f s")
      // the shared session serves (and streams) cleanly afterwards —
      // without the tight timeout, which on a loaded JVM (cancelled
      // cartesian tasks still draining) is not a health property
      spark.conf.unset("spark.graft.server.timeoutMs")
      val ok = "/query?query=" + java.net.URLEncoder.encode(
        "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 3", "UTF-8")
      // the cancelled cartesian's killed tasks can pin every local core
      // for minutes (kill flags are only polled at loop checkpoints),
      // so the health probe can blow the client read timeout for
      // residual-load reasons; quiesce and retry once before failing
      val (okCode, okBody, _) =
        try get(ok)
        catch {
          case _: java.net.SocketTimeoutException =>
            while (spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty)
              Thread.sleep(250)
            get(ok)
        }
      assert(okCode === 200 && okBody.endsWith("]}}"))
    } finally {
      spark.conf.unset("spark.graft.server.streamResults")
      spark.conf.unset("spark.graft.server.timeoutMs")
    }
  }

  test("forceCloseConnection drops the raw TCP connection on this JVM") {
    // the stuck-writer mitigation (watchdog killing a chunked write to
    // a dead client) only exists if the reflective close WORKS — a
    // sealed-module or renamed-internal JVM silently degrades it, so
    // pin that this build's JVM + --add-opens actually reach the
    // connection. The handler starts a chunked response and force-
    // closes mid-body; a working close surfaces client-side as a
    // truncated/failed read, never a clean terminal chunk.
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ctx = server.createContext("/force-close-probe",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(200, 0L) // chunked
        val os = ex.getResponseBody
        os.write("partial".getBytes("UTF-8"))
        os.flush()
        val ok = QueryServer.forceCloseConnection(ex)
        closed.set(ok)
        // failure path: finish the exchange normally so the client
        // fails the assertion immediately instead of hanging to its
        // read timeout
        if (!ok) { try os.close() catch { case _: Throwable => }; ex.close() }
      })
    try {
      val failed =
        try {
          val (_, body, _) = get("/force-close-probe")
          body != "partial" // a retained terminal chunk would complete the body
        } catch { case _: java.io.IOException => true }
      assert(closed.get(), "forceCloseConnection must succeed under the build's --add-opens")
      assert(failed, "a force-closed chunked response must not read as complete")
    } finally server.removeContext(ctx)
  }

  test("maxRows edge values: Int.MaxValue serves; junk fails with a clear message") {
    val small = "/query?query=" + java.net.URLEncoder.encode(
      "SELECT ?p ?b WHERE { wdt:Q31 ?p ?b . } LIMIT 3", "UTF-8")
    try {
      // Int.MaxValue must not overflow the +1 overflow probe
      spark.conf.set("spark.graft.json.maxRows", Int.MaxValue.toString)
      val (code, _, _) = get(small)
      assert(code === 200)
      // non-numeric conf → a named error, not a NumberFormatException
      spark.conf.set("spark.graft.json.maxRows", "lots")
      val (badCode, badBody, _) = get(small)
      assert(badCode === 500)
      assert(badBody.contains("spark.graft.json.maxRows must be a positive int"))
    } finally spark.conf.unset("spark.graft.json.maxRows")
  }
}
