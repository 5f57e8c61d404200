package graft.cli

import graft.result.JsonResults
import graft.sparql.Sparql

/** CLI query runner (reference `src/cli.rs:70-128`): run one SPARQL
  * query against the fixture store and print W3C SPARQL-Results-JSON.
  *
  * Usage: runMain graft.cli.Query "<sparql>" [storeDir]
  * With no args, reads the query from stdin until a blank line (the
  * reference REPL's convention).
  */
object Query {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val (queryText, dir) =
      if (args.nonEmpty) (args(0), args.lift(1).getOrElse(graft.ingest.WikidataIngest.defaultDir))
      else {
        val sb = new StringBuilder
        var line = scala.io.StdIn.readLine()
        while (line != null && line.nonEmpty) {
          sb.append(line).append('\n'); line = scala.io.StdIn.readLine()
        }
        (sb.toString, graft.ingest.WikidataIngest.defaultDir)
      }
    try {
      val df = Sparql.query(spark, queryText, dir)
      println(JsonResults.toJson(df))
    } catch {
      case e: graft.sparql.Parser.ParseException =>
        System.err.println(s"parse error: ${e.msg}"); sys.exit(2)
    } finally spark.stop()
  }
}
