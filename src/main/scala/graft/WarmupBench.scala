package graft

/** Cold-start measurement for the server warmup flag
  * (`spark.graft.server.warmup`): starts a server in THIS fresh JVM,
  * then times the first real HTTP query — a label-service shape,
  * deliberately different from the warmup's scan/filter/sort query, so
  * the number measures how much of the JIT/codegen/footer cost the
  * warmup genuinely moves out of the first client's latency rather
  * than a same-plan cache hit. Run twice in fresh JVMs
  * (`runMain graft.WarmupBench` / `runMain graft.WarmupBench warmup`)
  * and compare the `first_query_sec` fields (PERF_r12.md).
  */
object WarmupBench {
  def main(args: Array[String]): Unit = {
    val warm = args.headOption.contains("warmup")
    val dir = args.lift(1).getOrElse(graft.ingest.WikidataIngest.defaultDir)
    val spark = GraftSession.get()
    if (warm) spark.conf.set("spark.graft.server.warmup", "true")
    val t0 = System.nanoTime()
    val srv = server.QueryServer.start(spark, dir, 0)
    val startSec = (System.nanoTime() - t0) / 1e9
    val q = java.net.URLEncoder.encode(
      """SELECT ?s ?sLabel WHERE { ?s wdt:P31 wd:Q3624078 .
        |SERVICE wikibase:label { bd:serviceParam wikibase:language "en". } }""".stripMargin,
      "UTF-8")
    val t1 = System.nanoTime()
    val conn = new java.net.URL(
      s"http://localhost:${srv.getAddress.getPort}/query?query=$q")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setReadTimeout(300000)
    val code = conn.getResponseCode
    val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    val firstSec = (System.nanoTime() - t1) / 1e9
    require(code == 200 && body.contains("\"bindings\""), s"query failed: $code")
    srv.stop(0)
    println(String.format(java.util.Locale.ROOT,
      """{"metric":"warmup_bench","warmup":%b,"server_start_sec":%.3f,"first_query_sec":%.3f}""",
      Boolean.box(warm), Double.box(startSec), Double.box(firstSec)))
  }
}
