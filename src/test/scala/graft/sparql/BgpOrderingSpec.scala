package graft.sparql

import graft.model.TermValue
import Ast._

/** The greedy BGP join ordering (reference `src/calc_engine.rs:109-151`
  * at translation time): most-bound first, then always a pattern
  * connected by a shared variable, so naive left-to-right folding never
  * manufactures an avoidable cartesian product.
  */
class BgpOrderingSpec extends graft.SparkTestBase {

  // two chained edges: Q1 -P2-> Q3 -P5-> Q6
  private lazy val statements = {
    val q1 = spark.range(1).select(
      TermValue.entityQ(1).toColumn.as("s"), TermValue.propDirect(2).toColumn.as("p"),
      TermValue.entityQ(3).toColumn.as("o"), TermValue.namedEdge("e1").toColumn.as("id"))
    val q2 = spark.range(1).select(
      TermValue.entityQ(3).toColumn.as("s"), TermValue.propDirect(5).toColumn.as("p"),
      TermValue.entityQ(6).toColumn.as("o"), TermValue.namedEdge("e2").toColumn.as("id"))
    q1.unionByName(q2)
  }

  private lazy val tr = new Translator(spark, statements, statements.limit(0))

  private val a = Triple(Var("a"), Const(TermValue.propDirect(2)), Var("b"))
  private val b = Triple(Var("x"), Const(TermValue.propDirect(2)), Var("y"))
  private val c = Triple(Var("b"), Const(TermValue.propDirect(5)), Var("c"))

  test("connected pattern is pulled ahead of a disconnected one") {
    // written order (a, b, c) would cross-join a×b before c links them
    assert(tr.orderPatterns(Seq(a, b, c)) === Seq(a, c, b))
  }

  test("a fully-bound pattern leads regardless of position") {
    val bound = Triple(Const(TermValue.entityQ(1)), Const(TermValue.propDirect(2)),
      Const(TermValue.entityQ(3)))
    assert(tr.orderPatterns(Seq(a, c, bound)).head === bound)
  }

  test("reordered BGP evaluates to the same solutions") {
    val df = tr.exec(Bgp(Seq(a, b, c)))
    val rows = df.collect()
    assert(rows.length === 1)
    val byName = df.columns.zipWithIndex.toMap
    assert(rows(0).getStruct(byName("a")).getAs[String]("key") === "Q:1")
    assert(rows(0).getStruct(byName("c")).getAs[String]("key") === "Q:6")
    assert(rows(0).getStruct(byName("x")).getAs[String]("key") === "Q:1")
  }

  test("boundness ties break by measured predicate cardinality (stats ordering)") {
    // P2 is 1000x hotter than P5 in the stats table: with equal
    // boundness the rare predicate must lead the join chain, so the
    // left-deep fold builds its small intermediate first
    val stats = Map("P:2" -> 100000L, "P:5" -> 100L)
    val trStats = new Translator(spark, statements, statements.limit(0),
      predCounts = Some(stats))
    val hot = Triple(Var("b"), Const(TermValue.propDirect(2)), Var("c"))
    val rare = Triple(Var("a"), Const(TermValue.propDirect(5)), Var("b"))
    // written hot-first: stats flip the order
    assert(trStats.orderPatterns(Seq(hot, rare)) === Seq(rare, hot))
    // without stats the written order survives (pure boundness tie)
    assert(tr.orderPatterns(Seq(hot, rare)) === Seq(hot, rare))
    // the flag disables stats ordering even when stats exist
    spark.conf.set(graft.sparql.TranslateFlags.BgpStatsOrder, "false")
    try assert(trStats.orderPatterns(Seq(hot, rare)) === Seq(hot, rare))
    finally spark.conf.unset(graft.sparql.TranslateFlags.BgpStatsOrder)
    // boundness still dominates: a 2-bound pattern on the hot predicate
    // beats a 1-bound pattern on the rare one
    val hotBound = Triple(Const(TermValue.entityQ(1)), Const(TermValue.propDirect(2)), Var("b"))
    assert(trStats.orderPatterns(Seq(rare, hotBound)).head === hotBound)
    // a predicate ABSENT from the stats scans zero rows — it leads
    val ghost = Triple(Var("a"), Const(TermValue.propDirect(9)), Var("b"))
    assert(trStats.orderPatterns(Seq(hot, ghost)) === Seq(ghost, hot))
  }

  test("degree-bounded chains broadcast-hint every join; hot keys do not") {
    // P5 is tiny (100 rows); P2 is hot (100k) but its max per-subject
    // degree is 3, so leading with P5 bounds the chain at 100, then
    // 100*3=300 — both inside the hint threshold: the INITIAL plan
    // must broadcast both joins, leaving ZERO shuffle exchanges (AQE
    // would convert too, but only after shuffling the hot scans)
    val stats = Map("P:2" -> 100000L, "P:5" -> 100L)
    val fan = Map("P:2" -> ((3L, 500L)), "P:5" -> ((2L, 2L)))
    val trStats = new Translator(spark, statements, statements.limit(0),
      predCounts = Some(stats), predFanout = Some(fan))
    val rare = Triple(Var("a"), Const(TermValue.propDirect(5)), Var("b"))
    val hot1 = Triple(Var("b"), Const(TermValue.propDirect(2)), Var("c"))
    val hot2 = Triple(Var("c"), Const(TermValue.propDirect(2)), Var("d"))
    // static auto-broadcast off: tiny test relations would broadcast
    // on size estimates alone, masking whether OUR hints fired
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = trStats.exec(Bgp(Seq(hot1, hot2, rare)))
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // a hot-OBJECT point lookup must NOT hint: P2's max object
      // degree (500) exceeds a threshold of 50, so the degree-aware
      // scan bound refuses the hint and the join stays distributed
      spark.conf.set(TranslateFlags.BgpBroadcastRows, "50")
      try {
        val objBound = Triple(Var("x"), Const(TermValue.propDirect(2)),
          Const(TermValue.entityQ(3)))
        val p2 = trStats.exec(Bgp(Seq(objBound, hot2))).queryExecution.sparkPlan.toString
        assert(!p2.contains("BroadcastHashJoin"), p2)
      } finally spark.conf.unset(TranslateFlags.BgpBroadcastRows)
      // correctness: the hinted chain still finds the planted solution
      val rows = trStats.exec(Bgp(Seq(
        Triple(Var("a"), Const(TermValue.propDirect(2)), Var("b")),
        Triple(Var("b"), Const(TermValue.propDirect(5)), Var("c"))))).collect()
      assert(rows.length === 1)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("a TRUNCATED stats table refuses hints for absent predicates") {
    // Simulates a >100k-predicate store: the counts table kept only
    // P:2, and the truncation floor records that any ABSENT predicate
    // may still hold up to 90k rows. P:5 (100 real rows here) must NOT
    // be hinted — on a truncated table the translator cannot tell it
    // from the 100,001-st-hottest predicate with millions of rows, and
    // a wrong hint is an executor OOM at scale, not just a slow plan.
    val stats = Map("P:2" -> 100000L)
    val fan = Map("P:2" -> ((3L, 500L)))
    val trTrunc = new Translator(spark, statements, statements.limit(0),
      predCounts = Some(stats), predFanout = Some(fan), predCountFloor = 90000L)
    val rare = Triple(Var("a"), Const(TermValue.propDirect(5)), Var("b"))
    val hot = Triple(Var("b"), Const(TermValue.propDirect(2)), Var("c"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(TranslateFlags.BgpBroadcastRows, "1000")
    try {
      val plan = trTrunc.exec(Bgp(Seq(rare, hot))).queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      // the same shape with a COMPLETE table (floor 0) hints the join —
      // the refusal above is the floor's doing, not the threshold's
      val trFull = new Translator(spark, statements, statements.limit(0),
        predCounts = Some(stats + ("P:5" -> 100L)),
        predFanout = Some(fan + ("P:5" -> ((2L, 2L)))))
      val plan2 = trFull.exec(Bgp(Seq(rare, hot))).queryExecution.sparkPlan.toString
      assert(plan2.contains("BroadcastHashJoin"), plan2)
      // ordering uses the floor too: an absent predicate ranks at the
      // floor, so with floor above the hot count it no longer leads
      val trBigFloor = new Translator(spark, statements, statements.limit(0),
        predCounts = Some(stats), predCountFloor = 200000L)
      val ghost = Triple(Var("a"), Const(TermValue.propDirect(9)), Var("b"))
      assert(trBigFloor.orderPatterns(Seq(ghost, hot)) === Seq(hot, ghost))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(TranslateFlags.BgpBroadcastRows)
    }
  }

  test("statement-view predicates bound by their DIRECT view's stats (no alias hint)") {
    // `?x p:P1 ?stmt` scans exactly the P:1 rows (EqualTo(p.key, P:1))
    // but the pattern term's own key is PS:1 — absent from a COMPLETE
    // counts table. Before the statsKey fix that bounded the scan to
    // floor = 0 and broadcast-hinted a scan holding EVERY P1 claim
    // (QuadScale 32M qualifier_join: 0.92 -> 3.1 s). The hot direct
    // count must carry over to the statement view and refuse the hint.
    val stats = Map("P:2" -> 5000000L, "P:5" -> 5000000L)
    val fan = Map("P:2" -> ((2L, 2L)), "P:5" -> ((1L, 100L)))
    val tr = new Translator(spark, statements, statements.limit(0),
      predCounts = Some(stats), predFanout = Some(fan))
    val stmtView = Triple(Var("x"), Const(TermValue.propStmt(2)), Var("stmt"))
    val qual = Triple(Var("stmt"), Const(TermValue.propDirect(5)), Var("v"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = tr.exec(Bgp(Seq(stmtView, qual))).queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      // a genuinely tiny direct count still hints the statement view
      val trTiny = new Translator(spark, statements, statements.limit(0),
        predCounts = Some(Map("P:2" -> 50L, "P:5" -> 5000000L)),
        predFanout = Some(fan))
      val plan2 = trTiny.exec(Bgp(Seq(stmtView, qual))).queryExecution.sparkPlan.toString
      assert(plan2.contains("BroadcastHashJoin"), plan2)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("the final BGP result never carries a broadcast hint (no leak)") {
    // every join INSIDE the chain may be hinted, but the accumulated
    // RESULT must not be: its bound was a decision about in-BGP joins,
    // and a hint on the output would leak into the planning of
    // whatever enclosing operator (OPTIONAL / MINUS / parent join)
    // consumes it
    val stats = Map("P:2" -> 100000L, "P:5" -> 100L)
    val fan = Map("P:2" -> ((3L, 500L)), "P:5" -> ((2L, 2L)))
    val trStats = new Translator(spark, statements, statements.limit(0),
      predCounts = Some(stats), predFanout = Some(fan))
    val rare = Triple(Var("a"), Const(TermValue.propDirect(5)), Var("b"))
    val hot = Triple(Var("b"), Const(TermValue.propDirect(2)), Var("c"))
    val out = trStats.exec(Bgp(Seq(rare, hot)))
    def isHint(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint] ||
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.ResolvedHint]
    // walk down through non-join operators (projections etc.): no hint
    // node may sit ABOVE the topmost join
    var node = out.queryExecution.logical
    while (!node.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join] &&
           node.children.size == 1) {
      assert(!isHint(node), s"hint leaked above the BGP result:\n$node")
      node = node.children.head
    }
    assert(!isHint(node))
  }
}
