package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphAnalytics

/** GraphX analytics over the entity graph: component labels, degrees,
  * and fixed-iteration PageRank on hand graphs plus the fixture store.
  */
class GraphSpec extends SparkTestBase {

  import spark.implicits._

  /** Minimal statements frame: only the struct fields the edge
    * extractor reads (s.kind/s.num/o.kind/o.num).
    */
  private def stmts(edges: (Long, Long)*): DataFrame =
    edges.toSeq.toDF("sn", "on")
      .select(
        struct(lit("Q").as("kind"), col("sn").cast("double").as("num")).as("s"),
        struct(lit("Q").as("kind"), col("on").cast("double").as("num")).as("o"))

  test("connectedComponents labels each vertex with the min reachable id") {
    // two components: {1,2,3,4} chained both directions-ish, {10,11}
    val cc = GraphAnalytics.connectedComponents(
        stmts(2L -> 1L, 2L -> 3L, 4L -> 3L, 10L -> 11L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("entityEdges keeps only item-to-item rows") {
    val mixed = Seq(("Q", 1L, "Q", 2L), ("Q", 1L, "ident", 9L),
      ("nedge", 7L, "Q", 3L)).toDF("sk", "sn", "ok", "on")
      .select(
        struct(col("sk").as("kind"), col("sn").cast("double").as("num")).as("s"),
        struct(col("ok").as("kind"), col("on").cast("double").as("num")).as("o"))
    val e = GraphAnalytics.entityEdges(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq === Seq((1L, 2L)))
  }

  test("degrees: directed in/out counts with zero-fill on either side") {
    val d = GraphAnalytics.degrees(stmts(1L -> 2L, 1L -> 3L, 2L -> 3L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d === Map(1L -> (2L, 0L), 2L -> (1L, 1L), 3L -> (0L, 2L)))
  }

  test("pageRank: deterministic, rounded, and in-link mass ranks the hub first") {
    val g = stmts(1L -> 3L, 2L -> 3L, 4L -> 3L, 3L -> 1L)
    val run1 = GraphAnalytics.pageRank(g, numIter = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val run2 = GraphAnalytics.pageRank(g, numIter = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run1 === run2, "fixed-iteration PageRank must be run-stable")
    assert(run1.keySet === Set(1L, 2L, 3L, 4L))
    // 3 collects every in-link and funnels its whole mass to 1, so the
    // 1↔3 cycle dominates the leaf vertices, which stay symmetric
    assert(run1(3L) > run1(2L) && run1(1L) > run1(2L), s"cycle beats leaves: $run1")
    assert(run1(2L) === run1(4L), s"leaves are symmetric: $run1")
    assert(run1.values.forall(v => v > 0 && v == math.rint(v * 1e6) / 1e6))
  }

  test("pageRank matches the explicitly-replayed recurrence (what the oracle unrolls)") {
    // GraphX staticPageRank: r_0 = 1.0 everywhere; r_{i+1}(v) = 0.15 +
    // 0.85 * Σ_{u→v} r_i(u)/outdeg(u), parallel edges each carrying a
    // message, vertices with no in-edges resetting to 0.15 + 0; the
    // FINAL ranks renormalize to sum N (dangling vertices — here 5 —
    // leak mass during iteration, and the scale restores it; probed
    // empirically, a no-dangling graph cannot distinguish)
    val edges = Seq(1L -> 3L, 2L -> 3L, 4L -> 3L, 3L -> 1L, 3L -> 4L,
      1L -> 3L, 3L -> 5L)
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, es) => k -> es.size }
    var r = verts.map(_ -> 1.0).toMap
    for (_ <- 0 until 7)
      r = verts.map(v => v -> (0.15 + 0.85 * edges.collect {
        case (u, w) if w == v => r(u) / outdeg(u) }.sum)).toMap
    val norm = verts.size / r.values.sum
    val expected = r.map { case (v, x) => v -> x * norm }
    val got = GraphAnalytics.pageRank(stmts(edges: _*), numIter = 7)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet === verts.toSet)
    verts.foreach(v => assert(math.abs(got(v) - expected(v)) < 2e-6,
      s"vertex $v: graphx ${got(v)} vs replay ${expected(v)}"))
  }

  test("stronglyConnectedComponents: cycles collapse, direction separates") {
    // two directed cycles bridged one-way: {1,2,3} and {4,5} are SCCs,
    // 6 hangs off 5 alone (reachable but not mutually)
    val scc = GraphAnalytics.stronglyConnectedComponents(
        stmts(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L, 5L -> 4L,
          5L -> 6L), numIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L))
    // the undirected labeling would merge everything — direction matters
    val cc = GraphAnalytics.connectedComponents(
        stmts(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L, 5L -> 4L,
          5L -> 6L))
      .collect().map(r => r.getLong(1)).toSet
    assert(cc === Set(1L))
  }

  test("triangleCounts: canonicalizes direction/duplicates/self-loops, zero-fills") {
    // triangle {1,2,3} expressed with reversed and duplicate edges plus
    // a self-loop; 4 hangs off 3 and closes nothing
    val t = GraphAnalytics.triangleCounts(stmts(
        1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 3L -> 3L, 3L -> 4L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("hopDistances: directed min-hop labels, budget truncates the frontier") {
    val g = stmts(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 3L)
    val full = GraphAnalytics.hopDistances(g, source = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // unreached vertices are absent, and direction matters
    val from4 = GraphAnalytics.hopDistances(g, source = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(from4 === Map(4L -> 0L))
    val capped = GraphAnalytics.hopDistances(g, source = 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
    // a 0-hop budget is the source itself (Pregel needs iterations > 0,
    // so this is a dedicated path), and an absent source yields nothing
    val zero = GraphAnalytics.hopDistances(g, source = 1L, maxHops = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero === Map(1L -> 0L))
    assert(GraphAnalytics.hopDistances(g, source = 99L, maxHops = 0).count() === 0)
  }

  test("fixture entity graph: one giant component anchored at the min id") {
    val cc = GraphAnalytics.connectedComponents(
      graft.ingest.WikidataIngest.statements(spark))
    val comps = cc.select("component").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(comps === Set(5L), s"fixture closure collapses to one component: $comps")
    assert(cc.count() === 390)
  }
}
