package graft.cli

import org.apache.spark.sql.SparkSession

import graft.result.JsonResults
import graft.sparql.Sparql

/** CLI query runner (reference `src/cli.rs:70-128`): run SPARQL
  * against the fixture store and print W3C SPARQL-Results-JSON.
  *
  * Usage: runMain graft.cli.Query "<sparql>" [storeDir] — one query.
  * With no args: the interactive REPL — multi-line queries terminated
  * by a blank line, looping until EOF or `exit` (the reference REPL's
  * convention). Prompts go to stderr so stdout stays pipeable JSON.
  */
object Query {

  /** The REPL loop, parameterized over its streams so tests can drive
    * consecutive queries through it. Returns the number of queries
    * that executed successfully.
    */
  def repl(spark: SparkSession, dir: String, in: java.io.BufferedReader,
           out: java.io.PrintStream, err: java.io.PrintStream): Int = {
    var executed = 0
    var done = false
    while (!done) {
      err.println("Enter a SPARQL query (blank line to execute, 'exit' to quit):")
      val sb = new StringBuilder
      var line = in.readLine()
      while (line != null && line.nonEmpty) {
        sb.append(line).append('\n'); line = in.readLine()
      }
      if (line == null) done = true // EOF ends the session
      val text = sb.toString.trim
      if (text == "exit") done = true
      else if (text.nonEmpty) {
        try {
          out.println(JsonResults.toJson(Sparql.query(spark, text, dir)))
          executed += 1
        } catch {
          case e: graft.sparql.Parser.ParseException =>
            err.println(s"parse error: ${e.msg}")
        }
      }
    }
    executed
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = args.lift(1).getOrElse(graft.ingest.WikidataIngest.defaultDir)
    try {
      if (args.nonEmpty) {
        try println(JsonResults.toJson(Sparql.query(spark, args(0), dir)))
        catch {
          case e: graft.sparql.Parser.ParseException =>
            System.err.println(s"parse error: ${e.msg}")
            spark.stop(); sys.exit(2)
        }
      } else {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
        repl(spark, dir, in, System.out, System.err)
      }
    } finally spark.stop()
  }
}
