package graft

import org.apache.spark.sql.DataFrame

import graft.model.TermValue
import graft.sparql.Ast._
import graft.sparql.Translator

/** Port of the reference's 14-test `triplepattern_match` matrix
  * (`/root/reference/src/calc_engine.rs:3428-3771`) over the same
  * one-quad fixture `wd:Q1, wdt:P2, wd:Q3, wds:4`: every bound/var
  * combination times the wdt:/p:/wds: statement-addressing duality,
  * including the misaligned combinations that must come back empty.
  */
class ScanMatrixSpec extends SparkTestBase {

  import org.apache.spark.sql.functions.lit

  // the reference fixture "wd:Q1, wdt:P2, wd:Q3, wds:4" as a statements DF
  private lazy val statements: DataFrame =
    spark.range(1).select(
      TermValue.entityQ(1).toColumn.as("s"),
      TermValue.propDirect(2).toColumn.as("p"),
      TermValue.entityQ(3).toColumn.as("o"),
      TermValue.namedEdge("4").toColumn.as("id"))

  private lazy val t = new Translator(spark, statements, statements.limit(0))

  private val q1 = Const(TermValue.entityQ(1))
  private val q3 = Const(TermValue.entityQ(3))
  private val q18 = Const(TermValue.entityQ(18))
  private val wdtP2 = Const(TermValue.propDirect(2))
  private val pP2 = Const(TermValue.propStmt(2))
  private val pP3 = Const(TermValue.propStmt(3))
  private val wds4 = Const(TermValue.namedEdge("4"))

  private def keys(df: DataFrame, col: String): Seq[String] =
    df.select(df(col).getField("key")).collect().map(_.getString(0)).toSeq

  // calc_engine.rs:3479-3492
  test("object by direct predicate, bound subject+pred → the object") {
    val df = t.scan(Triple(q1, wdtP2, Var("o")))
    assert(keys(df, "o") === Seq("Q:3"))
  }

  // calc_engine.rs:3493-3506 — p:P2 binds the STATEMENT id, not the object
  test("object by statement predicate, bound subject+pred → the statement id") {
    val df = t.scan(Triple(q1, pP2, Var("o")))
    assert(keys(df, "o") === Seq("NE:4"))
  }

  // calc_engine.rs:3508-3522
  test("subject by direct predicate, bound pred+object → the subject") {
    val df = t.scan(Triple(Var("s"), wdtP2, q3))
    assert(keys(df, "s") === Seq("Q:1"))
  }

  // calc_engine.rs:3524-3537 — p:P2 with an entity object is misaligned
  test("subject by statement predicate with entity object → empty") {
    assert(t.scan(Triple(Var("s"), pP2, q3)).count() === 0L)
  }

  // calc_engine.rs:3540-3555
  test("subject by statement predicate with statement object → the subject") {
    val df = t.scan(Triple(Var("s"), pP2, wds4))
    assert(keys(df, "s") === Seq("Q:1"))
  }

  // calc_engine.rs:3558-3572 — wdt:P2 with a wds: object is misaligned
  test("subject by direct predicate with statement object → empty") {
    assert(t.scan(Triple(Var("s"), wdtP2, wds4)).count() === 0L)
  }

  // calc_engine.rs:3575-3587
  test("subject+statement by statement predicate") {
    val df = t.scan(Triple(Var("s"), pP2, Var("stmt")))
    assert(keys(df, "s") === Seq("Q:1") && keys(df, "stmt") === Seq("NE:4"))
  }

  // calc_engine.rs:3589-3602
  test("subject+object by direct predicate") {
    val df = t.scan(Triple(Var("s"), wdtP2, Var("o")))
    assert(keys(df, "s") === Seq("Q:1") && keys(df, "o") === Seq("Q:3"))
  }

  // calc_engine.rs:3605-3618
  test("subject+predicate by bound entity object") {
    val df = t.scan(Triple(Var("s"), Var("p"), q3))
    assert(keys(df, "s") === Seq("Q:1") && keys(df, "p") === Seq("P:2"))
  }

  // calc_engine.rs:3621-3636 — bound wds: object flips the predicate to
  // its p: statement view
  test("subject+predicate by bound statement object → statement-view predicate") {
    val df = t.scan(Triple(Var("s"), Var("p"), wds4))
    assert(keys(df, "s") === Seq("Q:1") && keys(df, "p") === Seq("PS:2"))
  }

  // calc_engine.rs:3638-3652
  test("predicate by bound subject+object") {
    val df = t.scan(Triple(q1, Var("p"), q3))
    assert(keys(df, "p") === Seq("P:2"))
  }

  // calc_engine.rs:3654-3671
  test("predicate by bound subject+statement → statement view") {
    val df = t.scan(Triple(q1, Var("p"), wds4))
    assert(keys(df, "p") === Seq("PS:2"))
  }

  // calc_engine.rs:3673-3731 — all-bound existence checks, four combos
  test("all bound: aligned combos match, misaligned are empty") {
    assert(t.scan(Triple(q1, wdtP2, q3)).count() === 1L) // direct, correct
    assert(t.scan(Triple(q1, pP2, wds4)).count() === 1L) // statement, correct
    assert(t.scan(Triple(q1, wdtP2, q18)).count() === 0L) // wrong object
    assert(t.scan(Triple(q1, pP3, wds4)).count() === 0L) // wrong statement pred
  }

  // calc_engine.rs:3734-3751 — the reference emits BOTH the direct and
  // the statement view for a bound-subject scan (2 rows per edge). Our
  // engine emits the direct view only: the reference's own end-to-end
  // corpus count (`wdt:Q31 ?p ?b` = 1354, test_requests.txt:16-21) is
  // the parity anchor, and SparqlFixtureSpec pins it. Documented
  // deviation (see Translator.scan).
  test("bound subject full scan → direct view rows (documented deviation)") {
    val df = t.scan(Triple(q1, Var("p"), Var("o")))
    assert(keys(df, "p") === Seq("P:2") && keys(df, "o") === Seq("Q:3"))
  }

  // repeated-variable pattern: engine extension (the reference's rename
  // map silently collides); ?x ?p ?x must only match s == o rows
  test("repeated variable adds an equality constraint") {
    assert(t.scan(Triple(Var("x"), Var("p"), Var("x"))).count() === 0L)
    val selfLoop = spark.range(1).select(
      TermValue.entityQ(7).toColumn.as("s"),
      TermValue.propDirect(9).toColumn.as("p"),
      TermValue.entityQ(7).toColumn.as("o"),
      TermValue.namedEdge("s7").toColumn.as("id"))
    val t2 = new Translator(spark, selfLoop, selfLoop.limit(0))
    assert(t2.scan(Triple(Var("x"), Var("p"), Var("x"))).count() === 1L)
  }

  test("GRAPH against a store WITHOUT the graph column: empty, never an analysis error") {
    // this fixture has no `graph` column — constant-graph existence
    // probes and graph enumeration must return empty/false without
    // ever building a filter on the missing column
    val ask = t.translate(graft.sparql.Parser.parse("ASK { GRAPH wd:Q1 {} }"))
    assert(ask.head().getBoolean(0) === false)
    val en = t.translate(graft.sparql.Parser.parse("SELECT ?g WHERE { GRAPH ?g {} }"))
    assert(en.count() === 0L)
    val pat = t.translate(graft.sparql.Parser.parse(
      "SELECT ?o WHERE { GRAPH wd:Q1 { wd:Q1 wdt:P2 ?o } }"))
    assert(pat.count() === 0L)
  }
}
