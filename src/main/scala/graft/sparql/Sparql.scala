package graft.sparql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.WikidataIngest
import graft.model.Render

/** Engine facade: text → parse → algebra → rewrite → DataFrame.
  *
  * Mirrors the reference query lifecycle
  * (`src/interpreter.rs:97-131` + `src/server.rs:87-141`): prefixes are
  * pre-declared ([[Iris.defaultPrefixes]]), the label service is
  * rewritten before translation, and execution is fully declarative —
  * Catalyst owns physical planning.
  */
object Sparql {

  /** Run a SPARQL query against the statement store under `dir`;
    * returns one term-struct column per projected variable
    * (ASK → single boolean column).
    */
  def query(spark: SparkSession, text: String, dir: String = WikidataIngest.defaultDir): DataFrame =
    translator(spark, dir).translate(Parser.parse(text))

  /** A translator over the store at `dir` (fresh per call — the
    * underlying DataFrames and statistics are cached by
    * [[WikidataIngest]] and invalidated on store mutation).
    */
  private[sparql] def translator(spark: SparkSession, dir: String): Translator = {
    val statements = WikidataIngest.statements(spark, dir)
    val labels = WikidataIngest.labels(spark, dir)
    new Translator(spark, statements, labels,
      WikidataIngest.statementsObj(spark, dir), WikidataIngest.statementsSub(spark, dir),
      WikidataIngest.storeBuckets(dir).getOrElse(WikidataIngest.NumPredBuckets),
      WikidataIngest.statementsGr(spark, dir),
      WikidataIngest.predCounts(dir),
      WikidataIngest.predFanout(dir),
      WikidataIngest.predCountsFloor(dir))
  }

  /** Like [[query]], but with every variable rendered to its lexical
    * form (string columns) — the shape the DuckDB oracle compares.
    */
  def rendered(spark: SparkSession, text: String, dir: String = WikidataIngest.defaultDir): DataFrame = {
    val df = query(spark, text, dir)
    if (df.columns.contains("boolean") && df.columns.length == 1) df
    else df.select(df.columns.map(c => Render.lex(col(c)).as(c)).toSeq: _*)
  }
}
