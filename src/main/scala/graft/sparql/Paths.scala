package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Term, TermOps}
import Ast._

/** Property-path evaluation (reference parses the full `PPE` surface
  * but todo!'s execution — `src/calc_data_types.rs:15-26`,
  * `src/calc_engine.rs:153-157`; SURVEY §7.5 prescribes this design).
  *
  * A path expression compiles to an edge DataFrame with two term
  * columns `__ps` / `__po`:
  *   - NamedNode   → predicate-filtered scan (direct view)
  *   - Reverse     → swap endpoints
  *   - Sequence    → join chain on a fresh midpoint
  *   - Alternative → union
  *   - ZeroOrOne   → union with the identity over graph nodes
  *   - ZeroOrMore/OneOrMore → iterative frontier join with dedup and
  *     `localCheckpoint` per round (bounded by graph diameter; at
  *     cluster scale each round is one shuffle on the frontier key and
  *     the visited set stays partitioned by destination)
  *   - NegatedPropertySet → `NOT predicate IN (…)` filter
  */
/** A path closure exceeded its configured row/iteration budget — the
  * fail-fast alternative to OOMing a cluster on a runaway `?x p* ?y`
  * (CONFORMANCE: the reference never executes paths at all).
  */
final class PathBudgetExceeded(msg: String) extends RuntimeException(msg)

object Paths {

  private val S = "__ps"
  private val O = "__po"

  /** Row budget for unbounded-path materialization (`?x p* ?y`
    * closures and the zero-length identity set). Default unlimited;
    * set `spark.graft.path.maxRows` at cluster scale so a runaway
    * closure fails fast with [[PathBudgetExceeded]] instead of eating
    * the cluster. Iteration exhaustion (diameter > maxIters) also
    * throws — a silently truncated closure would be a wrong answer.
    */
  private def maxRowsBudget(df: DataFrame): Long =
    df.sparkSession.conf.get("spark.graft.path.maxRows", Long.MaxValue.toString).toLong

  def exec(tr: Translator, statements: DataFrame, p: PathOp): DataFrame = {
    // A closure with a bound endpoint is a directed BFS from that node
    // — NOT the all-pairs transitive closure filtered afterwards. At
    // scale the difference is the whole game: `wd:X wdt:P279* ?y`
    // touches one node's reachable set, while the all-pairs closure
    // materializes every chain in the graph. The reverse direction
    // reuses the same BFS over flipped edges.
    val fast: Option[DataFrame] = (p.path, p.s, p.o) match {
      case (PZeroOrMore(inner), Const(v), _) =>
        Some(reachableFrom(tr, statements, inner, v, includeStart = true))
      case (POneOrMore(inner), Const(v), _) =>
        Some(reachableFrom(tr, statements, inner, v, includeStart = false))
      case (PZeroOrMore(inner), _, Const(v)) =>
        Some(reachableFrom(tr, statements, PReverse(inner), v, includeStart = true)
          .select(col(O).as(S), col(S).as(O)))
      case (POneOrMore(inner), _, Const(v)) =>
        Some(reachableFrom(tr, statements, PReverse(inner), v, includeStart = false)
          .select(col(O).as(S), col(S).as(O)))
      case _ => None
    }
    val edges = fast.getOrElse(compile(tr, statements, p.path))
    // bind endpoints like an ordinary triple pattern
    var df = edges
    var binds = List.empty[(String, Column)]
    p.s match {
      case Var(n) => binds ::= (n, df(S))
      case Const(v) => df = df.filter(TermOps.keyOrNull(df(S)) === v.key)
    }
    p.o match {
      case Var(n) => binds ::= (n, df(O))
      case Const(v) => df = df.filter(TermOps.keyOrNull(df(O)) === v.key)
    }
    (p.s, p.o) match {
      case (Var(a), Var(b)) if a == b => df = df.filter(df(S).getField("key") === df(O).getField("key"))
      case _ =>
    }
    val byVar = binds.reverse.distinctBy(_._1)
    df.select(byVar.map { case (n, c) => c.as(n) }: _*)
  }

  private[sparql] def compile(tr: Translator, st: DataFrame, p: Ppe): DataFrame = p match {
    case PLink(iri) =>
      tr.predScan(iri).select(col("s").as(S), col("o").as(O))
    case PNegated(preds) =>
      st.filter(!col("p.key").isin(preds.map(_.key): _*)).select(col("s").as(S), col("o").as(O))
    case PReverse(inner) =>
      compile(tr, st, inner).select(col(O).as(S), col(S).as(O))
    case PSeq(front, back) =>
      val f = compile(tr, st, front).withColumnRenamed(O, "__pm")
      val b = compile(tr, st, back).withColumnRenamed(S, "__pm2")
      f.join(b, f("__pm").getField("key") === b("__pm2").getField("key"))
        .select(f(S).as(S), b(O).as(O))
    case PAlt(front, back) =>
      compile(tr, st, front).unionByName(compile(tr, st, back)).distinct()
    case PZeroOrOne(inner) =>
      compile(tr, st, inner).unionByName(identityPairs(st)).distinct()
    case PZeroOrMore(inner) =>
      closure(compile(tr, st, inner)).unionByName(identityPairs(st)).distinct()
    case POneOrMore(inner) =>
      closure(compile(tr, st, inner))
  }

  /** Zero-length path: every graph node relates to itself (subjects and
    * objects of the store). At 100 TB this is only materialized when a
    * genuine `p*`/`p?` with both endpoints free is asked — with a bound
    * endpoint the translator's endpoint filter prunes it to one node.
    */
  private def identityPairs(st: DataFrame): DataFrame = {
    val ids = st.select(col("s").as(S)).unionByName(st.select(col("o").as(S)))
      .distinct()
    val budget = maxRowsBudget(st)
    if (budget < Long.MaxValue) {
      val n = ids.count()
      if (n > budget) throw new PathBudgetExceeded(
        s"zero-length path identity set has $n nodes > spark.graft.path.maxRows=$budget")
    }
    ids.select(col(S), col(S).as(O))
  }

  /** Directed BFS from a bound start node over the compiled inner-path
    * edges: per round one shuffle join of the frontier against the
    * (checkpointed) edge set. Tracks the expanded set (for termination)
    * separately from the reached set (the answer), so a cycle back to
    * the start still counts as "reachable in ≥ 1 step" for OneOrMore.
    * Returns `(S = start, O = reached)` pairs.
    */
  private def reachableFrom(tr: Translator, st: DataFrame, inner: Ppe,
                            start: graft.model.TermValue, includeStart: Boolean,
                            maxIters: Int = 64): DataFrame = {
    val spark = st.sparkSession
    val edges = compile(tr, st, inner).select(
        col(S), col(O),
        col(S).getField("key").as("__ks"), col(O).getField("key").as("__ko"))
      .dropDuplicates("__ks", "__ko")
      .localCheckpoint(true)
    val seed = spark.range(1)
      .select(start.toColumn.as(O), lit(start.key).as("__ko"))
      .localCheckpoint(true)
    val budget = maxRowsBudget(st)
    var rows = 0L
    var reached = seed.limit(0).localCheckpoint(true) // nodes hit in >= 1 step
    var frontier = seed
    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      iter += 1
      val step = frontier.alias("f")
        .join(edges.alias("e"), col("f.__ko") === col("e.__ks"))
        .select(col("e." + O).as(O), col("e.__ko").as("__ko"))
        .dropDuplicates("__ko")
      // the expanded set differs from the reached set only by the seed
      // (previous frontiers ⊆ reached), so the next frontier is just
      // the fresh nodes minus the seed — one anti join per round, not
      // two
      val newReached = step.join(reached.select("__ko"), Seq("__ko"), "left_anti")
        .localCheckpoint(true)
      val n = newReached.count()
      rows += n
      if (rows > budget) throw new PathBudgetExceeded(
        s"path BFS from ${start.key} reached $rows nodes > spark.graft.path.maxRows=$budget")
      val newFrontier = newReached.filter(col("__ko") =!= start.key)
      if (n > 0)
        reached = reached.unionByName(newReached).localCheckpoint(true)
      if (newFrontier.isEmpty) done = true
      else frontier = newFrontier
    }
    if (!done) throw new PathBudgetExceeded(
      s"path BFS from ${start.key} did not converge in $maxIters rounds")
    val result =
      if (includeStart)
        reached.unionByName(seed).dropDuplicates("__ko")
      else reached
    result.select(start.toColumn.as(S), col(O))
  }

  /** Transitive closure: iterative join-dedup fixpoint with
    * localCheckpoint per round to cut lineage (SURVEY §7.5) — the
    * both-endpoints-free case; bound endpoints take [[reachableFrom]].
    */
  private def closure(edges0: DataFrame, maxIters: Int = 64): DataFrame = {
    val budget = maxRowsBudget(edges0)
    var total = edges0.select(
      col(S), col(O),
      col(S).getField("key").as("__ks"), col(O).getField("key").as("__ko"))
      .dropDuplicates("__ks", "__ko")
      .localCheckpoint(true)
    var rows = total.count()
    if (rows > budget) throw new PathBudgetExceeded(
      s"path closure edge set has $rows rows > spark.graft.path.maxRows=$budget")
    var frontier = total
    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      iter += 1
      val step = frontier.alias("f")
        .join(total.alias("t"), col("f.__ko") === col("t.__ks"))
        .select(col("f." + S).as(S), col("t." + O).as(O),
          col("f.__ks").as("__ks"), col("t.__ko").as("__ko"))
        .dropDuplicates("__ks", "__ko")
      val fresh = step.join(total.select("__ks", "__ko"), Seq("__ks", "__ko"), "left_anti")
        .localCheckpoint(true)
      val n = fresh.count()
      rows += n
      if (rows > budget) throw new PathBudgetExceeded(
        s"path closure reached $rows pairs > spark.graft.path.maxRows=$budget")
      if (n == 0) done = true
      else {
        total = total.unionByName(fresh).localCheckpoint(true)
        frontier = fresh
      }
    }
    if (!done) throw new PathBudgetExceeded(
      s"path closure did not converge in $maxIters rounds")
    total.select(col(S), col(O))
  }
}
