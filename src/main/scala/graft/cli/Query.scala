package graft.cli

import graft.result.JsonResults
import graft.sparql.Sparql

/** CLI query runner (reference `src/cli.rs:70-128`): run SPARQL
  * against the fixture store and print W3C SPARQL-Results-JSON.
  *
  * Usage: runMain graft.cli.Query "<sparql>" [storeDir] — one query.
  * With no args: a REPL reading multi-line queries terminated by a
  * blank line, looping until EOF (the reference REPL's convention).
  */
object Query {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = args.lift(1).getOrElse(graft.ingest.WikidataIngest.defaultDir)

    def run(text: String, oneShot: Boolean): Unit =
      try println(JsonResults.toJson(Sparql.query(spark, text, dir)))
      catch {
        case e: graft.sparql.Parser.ParseException =>
          System.err.println(s"parse error: ${e.msg}")
          if (oneShot) { spark.stop(); sys.exit(2) }
      }

    try {
      if (args.nonEmpty) run(args(0), oneShot = true)
      else { // REPL: multi-line query until blank line; loop until EOF
        var eof = false
        while (!eof) {
          val sb = new StringBuilder
          var line = scala.io.StdIn.readLine()
          while (line != null && line.nonEmpty) {
            sb.append(line).append('\n'); line = scala.io.StdIn.readLine()
          }
          if (line == null) eof = true
          if (sb.nonEmpty) run(sb.toString, oneShot = false)
        }
      }
    } finally spark.stop()
  }
}
