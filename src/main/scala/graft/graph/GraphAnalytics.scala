package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph analytics over the quad store's entity graph — the
  * complement to the SPARQL pack's per-query traversal. The reference
  * stores the same edges as its sorted quad permutations
  * (`/root/reference/src/storage_engine/mod.rs:136-138`) but has no
  * analytics surface at all; at 100 TB the natural Spark shape for
  * iterative whole-graph work (components, PageRank) is GraphX —
  * vertex/edge RDDs hash-partitioned once, then per-iteration joins
  * stay co-located instead of re-shuffling the edge list every step,
  * which is exactly what a DataFrame self-join loop would do.
  */
object GraphAnalytics {

  /** The directed entity→entity edge list: statement rows whose
    * subject and object are both items (`wdt:`-view edges, dropping
    * literal/ident objects and qualifier rows whose subject is a
    * statement node). Vertex ids are the numeric item ids — GraphX
    * needs Long vertex ids, and `Q:n` already carries one.
    */
  def entityEdges(statements: DataFrame): DataFrame =
    statements
      .filter(col("s.kind") === "Q" && col("o.kind") === "Q")
      .select(col("s.num").cast("long").as("src"),
        col("o.num").cast("long").as("dst"))

  private def toGraph(edges: DataFrame): Graph[Unit, Unit] =
    Graph.fromEdges(
      edges.select(col("src"), col("dst")).rdd
        .map(r => Edge(r.getLong(0), r.getLong(1), ())),
      ())

  /** Undirected connected components of the entity graph: every entity
    * labeled with the SMALLEST entity id reachable from it — GraphX's
    * canonical component id, which is also what an external engine can
    * re-derive exactly (min over the reachability closure), making the
    * result fully oracle-checkable. Runs to convergence: the label is
    * a pure graph property, independent of iteration schedule or
    * partitioning.
    *
    * Scale shape: GraphX Pregel — per-iteration cost is one local
    * aggregateMessages over the partitioned edge RDD plus a vertex
    * join; iterations are bounded by component diameter (Wikidata's
    * giant component has diameter ≈ tens), never by vertex count.
    */
  def connectedComponents(statements: DataFrame): DataFrame = {
    val spark = statements.sparkSession
    import spark.implicits._
    org.apache.spark.graphx.lib.ConnectedComponents
      .run(toGraph(entityEdges(statements)))
      .vertices
      .map { case (v, c) => (v, c) }
      .toDF("entity_id", "component")
  }

  /** Static PageRank over the directed entity graph: `numIter` fixed
    * synchronous iterations with damping `resetProb` (GraphX's
    * `staticPageRank` — r_0 = 1.0; r_{i+1}(v) = resetProb +
    * (1−resetProb)·Σ_{u→v} r_i(u)/outdeg(u); final ranks renormalized
    * to sum N, restoring the mass dangling vertices leak), scores
    * rounded to `dp` decimals so the ranking is reproducible across
    * runs and engines (float message order cannot flip a rounded
    * score). Fixed-iteration, not tolerance-converged, for the same
    * determinism reason.
    */
  def pageRank(statements: DataFrame, numIter: Int = 10,
               resetProb: Double = 0.15, dp: Int = 6): DataFrame = {
    val spark = statements.sparkSession
    import spark.implicits._
    toGraph(entityEdges(statements))
      .staticPageRank(numIter, resetProb)
      .vertices
      .map { case (v, r) => (v, r) }
      .toDF("entity_id", "raw")
      .select(col("entity_id"), round(col("raw"), dp).as("pagerank"))
  }

  /** Strongly connected components of the DIRECTED entity graph
    * (GraphX `StronglyConnectedComponents`): every entity labeled with
    * the smallest id in its SCC — the directed refinement of
    * [[connectedComponents]] (mutual reachability, not just
    * undirected contact), which is what cycle/cluster analysis over a
    * knowledge graph actually wants. `numIter` bounds the
    * color-propagation rounds; the label is exact once iterations
    * cover the largest SCC's diameter, and an external engine
    * re-derives it as min over the MUTUAL reachability closure —
    * fully oracle-checkable.
    */
  def stronglyConnectedComponents(statements: DataFrame,
                                  numIter: Int = 10): DataFrame = {
    val spark = statements.sparkSession
    import spark.implicits._
    org.apache.spark.graphx.lib.StronglyConnectedComponents
      .run(toGraph(entityEdges(statements)), numIter)
      .vertices
      .map { case (v, c) => (v, c) }
      .toDF("entity_id", "component")
  }

  /** Per-vertex triangle counts on the undirected simple entity graph
    * (GraphX `TriangleCount` — self-loops dropped, parallel/reverse
    * duplicates canonicalized internally): how many triangles pass
    * through each entity, the standard local-clustering signal for
    * community structure. Exact, so an external engine re-derives it
    * by materializing each (a&lt;b&lt;c) triangle once from the
    * deduplicated undirected edge list — fully oracle-checkable.
    *
    * Scale shape: GraphX's implementation intersects sorted neighbor
    * sets per edge after one partitioning pass — cost Σ min(deg(u),
    * deg(v)) over edges, never vertices². Degree skew (celebrity
    * entities) bounds per-task work by the hot vertex's neighbor set,
    * the known hazard of triangle counting at 100 TB; cap candidates
    * with [[degrees]] before running it on a power-law graph.
    */
  def triangleCounts(statements: DataFrame): DataFrame = {
    val spark = statements.sparkSession
    import spark.implicits._
    org.apache.spark.graphx.lib.TriangleCount
      .run(toGraph(entityEdges(statements)))
      .vertices
      .map { case (v, c) => (v, c.toLong) }
      .toDF("entity_id", "triangles")
  }

  /** Directed BFS hop distance from `source` to every reachable entity
    * (GraphX Pregel, `maxHops` supersteps — the iteration bound is the
    * budget lever, like `path.maxRows` in the SPARQL path engine).
    * Exact min-hop labels, re-derivable as a bounded reachability
    * closure — fully oracle-checkable.
    */
  def hopDistances(statements: DataFrame, source: Long,
                   maxHops: Int = 10): DataFrame = {
    require(maxHops >= 0, s"maxHops $maxHops must be non-negative")
    val spark = statements.sparkSession
    import spark.implicits._
    val g = toGraph(entityEdges(statements))
      .mapVertices((id, _) => if (id == source) 0.0 else Double.PositiveInfinity)
    // Pregel requires maxIterations > 0; a 0-hop budget is just "the
    // source itself, if it is a vertex of the graph"
    if (maxHops == 0)
      return g.vertices.filter(_._1 == source)
        .map { case (v, _) => (v, 0L) }.toDF("entity_id", "hops")
    g.pregel(Double.PositiveInfinity, maxIterations = maxHops)(
        (_, dist, msg) => math.min(dist, msg),
        t => if (t.srcAttr + 1 < t.dstAttr) Iterator((t.dstId, t.srcAttr + 1))
             else Iterator.empty,
        (a, b) => math.min(a, b))
      .vertices
      .filter(_._2 != Double.PositiveInfinity)
      .map { case (v, d) => (v, d.toLong) }
      .toDF("entity_id", "hops")
  }

  /** In/out degree per entity — the one-shuffle profile that sizes the
    * iterative jobs above (max degree bounds per-task message volume).
    */
  def degrees(statements: DataFrame): DataFrame = {
    val e = entityEdges(statements)
    val out = e.groupBy(col("src").as("entity_id"))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("entity_id"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("entity_id"), "full_outer")
      .select(col("entity_id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
