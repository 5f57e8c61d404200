package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.ingest.WikidataIngest
import graft.sparql.Sparql

/** Scale evidence for the core SPARQL engine — the [[GraphBench]]
  * counterpart for the quad store. Every sp* CORRECTNESS entry runs on
  * the 3,385-quad reference fixture, which proves semantics but says
  * nothing about cost growth; the reference's own design center is a
  * dump larger than RAM (`/root/reference/src/cli.rs:52-55`, the mmap
  * mode exists for exactly that). This harness generates a
  * DETERMINISTIC Wikidata-shaped store at parameterized quad counts,
  * builds it through the REAL store pipeline (create-db flat write +
  * create-index partitioned permutations), runs the headline query
  * shapes, and prints one JSON line of per-operation seconds so
  * consecutive sizes give measured scaling ratios.
  *
  * Store shape (planted, so results are assertable at any size; nE
  * entities, nE % 32 == 0):
  *   - entities Q0..Q(nE-1); Q0..Q31 double as "classes"
  *   - every entity: one English label `"entity <e>"`, one P1
  *     (instance-of analog) claim to class Q(e mod 32), and one P10
  *     integer qualifier (e mod 50) on that claim — so
  *     count(P1) == nE, each class has EXACTLY nE/32 instances, and
  *     qualifier joins return exactly nE rows
  *   - classes chain by P2 (subclass analog): Qc → Q(c+1) for
  *     c < 31 — so `wd:Q0 wdt:P2* ?x` returns exactly 32 nodes and
  *     the BGP join P1⋈P2 returns exactly nE·31/32 rows
  *   - 6·nE bulk claims with zipf-skewed predicates P20..P63 (u³
  *     concentration — the predicate-frequency shape a real knowledge
  *     graph has, and the hazard for predicate-bucket pruning),
  *     subjects uniform over NON-class entities (so per-class GRAPH
  *     counts stay planted: GRAPH Qc holds exactly 4 quads for c<31),
  *     objects alternating entity / integer
  *
  * Determinism: every id/choice derives from xxhash64 of the row
  * index — no RNG state, no partitioning dependence. The harness
  * FAILS (nonzero exit) on any wrong answer; timings you cannot trust
  * are worse than no timings.
  *
  * Usage: `runMain graft.QuadScale [quadTargets] [baseDir]`
  * (defaults `1000000,8000000` and a temp dir).
  */
object QuadScale {

  val Classes = 32

  private def nulStr = lit(null).cast(StringType)
  private def nulNum = lit(null).cast(DoubleType)

  private def qEnt(e: Column): Column = model.Term.struct_(
    lit(model.Term.Kind.Q), e.cast(DoubleType), nulStr, nulStr,
    concat(lit("Q:"), e.cast(StringType)))
  private def pDir(n: Int): Column = model.Term.struct_(
    lit(model.Term.Kind.P), lit(n.toDouble), nulStr, nulStr, lit(s"P:$n"))
  private def pDirCol(n: Column): Column = model.Term.struct_(
    lit(model.Term.Kind.P), n.cast(DoubleType), nulStr, nulStr,
    concat(lit("P:"), n.cast(StringType)))
  private def labelPred: Column = model.Term.struct_(
    lit(model.Term.Kind.Label), nulNum, lit("en"), nulStr, lit("lab:en"))
  private def strT(s: Column): Column = model.Term.struct_(
    lit(model.Term.Kind.Str), nulNum, s, nulStr, concat(lit("s:"), s))
  private def intT(v: Column): Column = model.Term.struct_(
    lit(model.Term.Kind.Int), v.cast(DoubleType), nulStr, nulStr,
    concat(lit("i:"), v.cast(StringType)))
  private def namedEdge(id: Column): Column = model.Term.struct_(
    lit(model.Term.Kind.NamedEdge), nulNum, id, nulStr, concat(lit("NE:"), id))
  private def anonEdge(id: Column): Column = model.Term.struct_(
    lit(model.Term.Kind.Edge), nulNum, id, nulStr, concat(lit("E:"), id))

  /** The synthetic statements table (schema identical to the dump
    * parser's output: term structs `s, p, o, id, graph` + long `ord`).
    */
  def syntheticStatements(spark: SparkSession, nE: Long): DataFrame = {
    require(nE % Classes == 0 && nE >= 320,
      s"nE=$nE must be a positive multiple of $Classes (planted per-class counts)")
    val e = col("id")
    def qid(suffix: String) = concat(lit("Q"), e.cast(StringType), lit(suffix))
    val labels = spark.range(nE).select(
      qEnt(e).as("s"), labelPred.as("p"),
      strT(concat(lit("entity "), e.cast(StringType))).as("o"),
      anonEdge(qid("-a1")).as("id"), qEnt(e).as("graph"))
    val p1 = spark.range(nE).select(
      qEnt(e).as("s"), pDir(1).as("p"), qEnt(pmod(e, lit(Classes.toLong))).as("o"),
      namedEdge(qid("-P1")).as("id"), qEnt(e).as("graph"))
    // qualifier: subject IS the P1 claim edge (edges-on-edges), graph
    // stays the parent document's — the dump parser's convention
    val quals = spark.range(nE).select(
      namedEdge(qid("-P1")).as("s"), pDir(10).as("p"),
      intT(pmod(e, lit(50L))).as("o"),
      anonEdge(qid("-a2")).as("id"), qEnt(e).as("graph"))
    val chain = spark.range(Classes - 1L).select(
      qEnt(e).as("s"), pDir(2).as("p"), qEnt(e + 1L).as("o"),
      namedEdge(qid("-P2")).as("id"), qEnt(e).as("graph"))
    def u(salt: String) =
      pmod(xxhash64(e, lit(salt)), lit(1000000L)).cast(DoubleType) / 1e6
    val subj = lit(Classes.toLong) + pmod(xxhash64(e, lit("bs")), lit(nE - Classes))
    val predNum = (lit(20) + floor(u("bp") * u("bp") * u("bp") * lit(44.0))).cast("int")
    val bulk = spark.range(6L * nE).select(
      qEnt(subj).as("s"), pDirCol(predNum).as("p"),
      when(pmod(e, lit(2L)) === 0L, qEnt(pmod(xxhash64(e, lit("bo")), lit(nE))))
        .otherwise(intT(pmod(xxhash64(e, lit("bi")), lit(1000L)))).as("o"),
      namedEdge(concat(lit("B"), e.cast(StringType))).as("id"),
      qEnt(subj).as("graph"))
    labels.unionByName(p1).unionByName(quals).unionByName(chain).unionByName(bulk)
      .withColumn("ord", monotonically_increasing_id())
  }

  /** Total quads [[syntheticStatements]] emits for `nE` entities. */
  def totalQuads(nE: Long): Long = 9L * nE + (Classes - 1)

  def main(args: Array[String]): Unit = {
    val targets = args.lift(0).getOrElse("1000000,8000000")
      .split(",").map(_.trim.toLong).toSeq
    val baseDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-quadscale").toString)
    val spark = GraftSession.get()
    var failed = false

    def fail(msg: String): Unit = { System.err.println(s"[quadscale] FAIL: $msg"); failed = true }

    val perSize = targets.map { target =>
      val nE = math.max(320L, math.round(target / 9.0 / Classes) * Classes)
      val total = totalQuads(nE)
      val flat = s"$baseDir/flat_$nE"
      val idx = s"$baseDir/idx_$nE"

      def time[A](name: String)(f: => A): (Double, A) = {
        val t0 = System.nanoTime()
        val out = f
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[quadscale $total] $name: $secs%.2f s")
        (secs, out)
      }

      val (tDb, _) = time("create_db") {
        WikidataIngest.writeStore(spark, syntheticStatements(spark, nE), flat)
      }
      val (tIdx, _) = time("create_index") {
        WikidataIngest.createIndex(spark, flat, idx)
      }

      // (name, query, expected rows, optional deep check on the result)
      val queries: Seq[(String, String, Long, DataFrame => Unit)] = Seq(
        ("full_scan", "SELECT ?s ?p ?o WHERE { ?s ?p ?o }", total, _ => ()),
        ("pred_scan", "SELECT ?x ?c WHERE { ?x wdt:P1 ?c }", nE, _ => ()),
        ("po_bound", "SELECT ?x WHERE { ?x wdt:P1 wd:Q5 }", nE / Classes, _ => ()),
        ("bgp_join", "SELECT ?x ?d WHERE { ?x wdt:P1 ?c . ?c wdt:P2 ?d }",
          nE / Classes * (Classes - 1), _ => ()),
        ("qualifier_join",
          "SELECT ?x ?v WHERE { ?x p:P1 ?stmt . ?stmt wdt:P10 ?v }", nE, _ => ()),
        ("label_service",
          """SELECT ?x ?xLabel WHERE { ?x wdt:P1 wd:Q3 .
            |SERVICE wikibase:label { bd:serviceParam wikibase:language "en". } }""".stripMargin,
          nE / Classes,
          df => {
            val bound = df.filter(col("xLabel").getField("str").isNotNull).count()
            if (bound != nE / Classes)
              fail(s"label_service bound $bound labels, planted ${nE / Classes}")
          }),
        ("path_star", "SELECT ?c WHERE { wd:Q0 wdt:P2* ?c }", Classes.toLong, _ => ()),
        ("graph_const", "SELECT ?s ?p ?o WHERE { GRAPH wd:Q7 { ?s ?p ?o } }", 4L, _ => ()),
        ("agg_group",
          "SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x wdt:P1 ?c } GROUP BY ?c",
          Classes.toLong,
          df => {
            val counts = df.select(col("n").getField("num")).collect()
              .map(_.getDouble(0).toLong).toSet
            if (counts != Set(nE / Classes))
              fail(s"agg_group counts $counts, planted ${nE / Classes}")
          }),
        ("order_limit",
          """SELECT ?x ?v WHERE { ?x p:P1 ?st . ?st wdt:P10 ?v }
            |ORDER BY DESC(?v) LIMIT 5""".stripMargin,
          5L,
          df => {
            val vs = df.select(col("v").getField("num")).collect().map(_.getDouble(0))
            if (!vs.forall(_ == 49.0)) // max of (e mod 50), multiplicity nE/50 >= 5
              fail(s"order_limit values ${vs.mkString(",")}, planted all 49")
          }),
        // among Q5's nE/32 instances only Q5 itself (a class, c<31) has
        // an outgoing P2 — exactly one bound OPTIONAL row, the rest
        // survive unbound
        ("optional",
          "SELECT ?x ?y WHERE { ?x wdt:P1 wd:Q5 . OPTIONAL { ?x wdt:P2 ?y } }",
          nE / Classes,
          df => {
            val bound = df.filter(col("y").getField("key").isNotNull).count()
            if (bound != 1L) fail(s"optional bound $bound rows, planted 1")
          }),
        ("minus",
          "SELECT ?x WHERE { ?x wdt:P1 wd:Q5 . MINUS { ?x wdt:P2 ?y } }",
          nE / Classes - 1, _ => ()),
        ("distinct",
          "SELECT DISTINCT ?c WHERE { ?x wdt:P1 ?c }", Classes.toLong, _ => ()))

      val opResults = queries.map { case (name, text, expected, deepCheck) =>
        // two reps, min: the first pays parquet-footer/codegen warmup,
        // the second is the steady-state cost a server pays per query
        val reps = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val df = Sparql.query(spark, text, idx)
          val rows = df.count()
          val secs = (System.nanoTime() - t0) / 1e9
          (secs, rows, df)
        }
        val (secs, rows, df) = reps.minBy(_._1)
        if (rows != expected) fail(s"$name returned $rows rows, planted $expected")
        deepCheck(df)
        System.err.println(f"[quadscale $total] $name: $secs%.3f s, $rows rows")
        (name, secs, rows)
      }

      val ops = (Seq(("create_db", tDb, total), ("create_index", tIdx, total)) ++ opResults)
        .map { case (n, s, r) =>
          s""""$n":{"sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))},"rows":$r}"""
        }.mkString(",")
      s"""{"quads":$total,"entities":$nE,"ops":{$ops}}"""
    }
    println(s"""{"metric":"quadscale","sizes":[${perSize.mkString(",")}]}""")
    if (failed) sys.exit(1)
  }
}
