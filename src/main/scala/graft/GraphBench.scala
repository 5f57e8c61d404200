package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.GraphAnalytics

/** Scale evidence for the GraphX analytics pack: the oracle-checked
  * entries (p69/p70/p74/p76-p78) run on the fixture store's ~1k-edge
  * entity graph, which proves correctness but says nothing about cost
  * growth. This harness generates a DETERMINISTIC power-law entity
  * graph at parameterized edge counts — the degree shape a real
  * knowledge graph has, and the known hazard for triangle counting —
  * runs the pack, and prints one JSON line of per-operator seconds, so
  * consecutive sizes give the measured scaling ratio (near-linear in
  * edges is the pass bar; see PERF_r11.md for recorded runs).
  *
  * Planted structure keeps results assertable at any size: vertices
  * split into `blocks` disjoint ranges, every edge stays inside its
  * block, and a spine path connects each block internally — so
  * connected components must equal `blocks` exactly, and PageRank mass
  * must renormalize to the vertex count. The harness FAILS (nonzero
  * exit) if either invariant breaks; timings you cannot trust are
  * worse than no timings.
  *
  * Determinism: edge endpoints derive from xxhash64 of the edge index
  * (no RNG state, no partitioning dependence); src uses u³ so in-block
  * degree is power-law-concentrated, dst is uniform.
  *
  * Usage: `runMain graft.GraphBench [edgeCounts] [blocks]`
  * (defaults `1000000,4000000` and 32; vertices = edges/10).
  */
object GraphBench {

  /** Synthetic entity graph in statements shape — only the `s`/`o`
    * term-struct fields [[GraphAnalytics.entityEdges]] reads (`kind`,
    * `num`), so the whole pack runs on it unchanged.
    */
  def syntheticStatements(spark: SparkSession, nEdges: Long,
                          nVertices: Long, blocks: Int): DataFrame = {
    require(blocks > 0 && nVertices / blocks >= 2,
      s"need >= 2 vertices per block ($nVertices vertices / $blocks " +
        "blocks) — a 1-vertex block has no spine and breaks the " +
        "planted-components invariant; pass fewer blocks or more edges")
    val perBlock = nVertices / blocks
    // uniform [0,1) from the edge index — 2^64-scaled signed hash
    def u(salt: String) =
      xxhash64(col("id"), lit(salt)).cast("double") / 1.8446744073709552e19 + lit(0.5)
    val blk = pmod(xxhash64(col("id"), lit("blk")), lit(blocks.toLong))
    val powerEdges = spark.range(nEdges).select(
      (blk * perBlock + floor(pow(u("src"), 3.0) * perBlock)).cast("long").as("src"),
      (blk * perBlock + floor(u("dst") * perBlock)).cast("long").as("dst"))
    // spine: i → i+1 inside each block, so each block is ONE component
    val spine = spark.range(nVertices - 1)
      .filter(pmod(col("id") + 1, lit(perBlock)) =!= 0 && col("id") < lit(perBlock * blocks - 1))
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    powerEdges.unionByName(spine).select(
      struct(lit("Q").as("kind"), col("src").cast("double").as("num")).as("s"),
      struct(lit("Q").as("kind"), col("dst").cast("double").as("num")).as("o"))
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("1000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    val blocks = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = GraftSession.get()
    var failed = false
    val perSize = sizes.map { nEdges =>
      val nVertices = math.max(blocks.toLong, nEdges / 10)
      // materialize the input once — the harness times the OPERATORS,
      // not the generator
      val stmts = syntheticStatements(spark, nEdges, nVertices, blocks)
        .localCheckpoint(true)

      def time(name: String)(f: => Long): (String, Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[graphbench $nEdges] $name: $secs%.2f s, $rows rows")
        (name, secs, rows)
      }

      val results = Seq(
        time("degrees") {
          GraphAnalytics.degrees(stmts).count()
        },
        time("components") {
          val cc = GraphAnalytics.connectedComponents(stmts)
          val k = cc.select(countDistinct(col("component"))).head().getLong(0)
          if (k != blocks) {
            System.err.println(s"[graphbench] FAIL: $k components, planted $blocks")
            failed = true
          }
          cc.count()
        },
        time("pagerank_10iter") {
          val pr = GraphAnalytics.pageRank(stmts, numIter = 10)
          val mass = pr.agg(sum(col("pagerank"))).head().getDouble(0)
          val n = pr.count()
          if (math.abs(mass - n) > 0.01 * n) {
            System.err.println(s"[graphbench] FAIL: rank mass $mass vs $n vertices")
            failed = true
          }
          n
        },
        time("triangles") {
          GraphAnalytics.triangleCounts(stmts).count()
        },
        time("bfs_hops_8") {
          GraphAnalytics.hopDistances(stmts, source = 0L, maxHops = 8).count()
        })

      val ops = results.map { case (n, s, r) =>
        // Locale.ROOT: the f-interpolator is locale-sensitive and a
        // comma-decimal JVM locale would corrupt the JSON artifact
        s""""$n":{"sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))},"rows":$r}"""
      }.mkString(",")
      s"""{"edges":$nEdges,"vertices":$nVertices,"ops":{$ops}}"""
    }
    println(s"""{"metric":"graphbench","blocks":$blocks,"sizes":[${perSize.mkString(",")}]}""")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
