package graft.server

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.result.JsonResults
import graft.sparql.{Parser, Sparql}

/** HTTP query endpoint (reference `src/server.rs:24-141`): `GET
  * /query?query=<sparql>` → 200 + W3C SPARQL-Results-JSON; missing
  * `query` param or parse error → 400 with the message; CORS
  * `Access-Control-Allow-Origin: *` on every response (the reference
  * uses warp's `allow_any_origin`).
  *
  * One shared SparkSession serves all requests; queries execute
  * synchronously in the handler thread like the reference. This is a
  * protocol front-end, not an operator — result sets are bounded by the
  * serializer's limit.
  */
object QueryServer {

  def start(spark: SparkSession, dir: String, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/query", (ex: HttpExchange) => handle(spark, dir, ex))
    server.start()
    server
  }

  private def handle(spark: SparkSession, dir: String, ex: HttpExchange): Unit = {
    def respond(code: Int, body: String, contentType: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Access-Control-Allow-Origin", "*")
      ex.getResponseHeaders.add("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    try {
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
        .iterator.map(_.split("=", 2))
        .collect { case Array(k, v) =>
          URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
        }.toMap
      params.get("query") match {
        case None => respond(400, "missing 'query' parameter", "text/plain")
        case Some(q) =>
          try {
            val df = Sparql.query(spark, q, dir)
            respond(200, JsonResults.toJson(df), "application/json")
          } catch {
            case e: Parser.ParseException =>
              respond(400, s"parse error: ${e.msg}", "text/plain")
            case e: Throwable =>
              respond(500, s"error: ${e.getMessage}", "text/plain")
          }
      }
    } catch {
      case _: Throwable => try ex.close() catch { case _: Throwable => }
    }
  }

  /** `runMain graft.server.QueryServer [port] [storeDir]` — serves until
    * killed (reference default port 8005, `src/cli.rs:66-67`).
    */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8005)
    val dir = args.lift(1).getOrElse(graft.ingest.WikidataIngest.defaultDir)
    val spark = graft.GraftSession.get()
    start(spark, dir, port)
    println(s"listening on http://localhost:$port/query")
    Thread.currentThread().join()
  }
}
