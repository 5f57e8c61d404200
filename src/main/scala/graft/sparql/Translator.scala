package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Render, Term, TermOps, TermValue}
import Ast._

/** Algebra → DataFrame translator.
  *
  * Each SPARQL variable becomes one term-struct column named after the
  * variable. Joins are natural joins on shared variable names with
  * equality on the canonical `key` field (the reference joins on shared
  * column names over 64-bit node ids,
  * `src/relation/materialized_relation.rs:593-636`; statement-`ID`
  * columns never join because scans only expose variables).
  *
  * Scale notes: scans are plain filters over the statements Parquet
  * (predicate/subject `key` equality pushes down to row-group pruning);
  * joins shuffle on the string keys only, not whole structs; Catalyst +
  * AQE pick broadcast vs shuffle join and re-plan skew at runtime —
  * replacing the reference's greedy size-ordered BGP join
  * (`src/calc_engine.rs:109-151`).
  */
final class Translator(spark: SparkSession, statements: DataFrame, labels: DataFrame,
                       statementsObj: Option[DataFrame] = None,
                       statementsSub: Option[DataFrame] = None,
                       buckets: Int = graft.ingest.WikidataIngest.NumPredBuckets,
                       statementsGr: Option[DataFrame] = None,
                       predCounts: Option[Map[String, Long]] = None,
                       predFanout: Option[Map[String, (Long, Long)]] = None,
                       predCountFloor: Long = 0L) {

  import TermOps._

  // ------------------------------------------------------------------ api

  def translate(q: Query): DataFrame = q match {
    case SelectQuery(root) => exec(LabelService.rewrite(root))
    case AskQuery(root) =>
      val any = !exec(LabelService.rewrite(root)).isEmpty
      spark.range(1).select(lit(any).as("boolean"))
    case ConstructQuery(template, root) =>
      // template instantiation: one (s,p,o) projection per template
      // triple over the solution set, unioned and deduplicated (RDF
      // graphs are sets); solutions leaving any position unbound
      // produce no triple, per spec
      val base = exec(LabelService.rewrite(root))
      // template blank nodes mint a fresh bnode per solution (SPARQL 1.1
      // §16.2.1) — same label, same solution → same node; the row id
      // makes nodes distinct across solutions
      val rowIdCol = InternalPrefix + "rowid"
      val hasTmplBnodes = template.exists(t =>
        Seq(t.s, t.p, t.o).exists { case Var(n) => n.startsWith(BnodePrefix); case _ => false })
      val df = if (hasTmplBnodes) base.withColumn(rowIdCol, monotonically_increasing_id()) else base
      def termCol(p: TermPat): Column = p match {
        case Var(n) if n.startsWith(BnodePrefix) =>
          val label = concat_ws("_", lit(n.stripPrefix(BnodePrefix)), col(rowIdCol).cast(StringType))
          Term.struct_(lit(Term.Kind.Edge), lit(null).cast(DoubleType), label,
            lit(null).cast(StringType), concat(lit("bn:"), label))
        case Var(n) if df.columns.contains(n) => df(n)
        case Var(_) => Term.nullTerm
        case Const(v) => v.toColumn
      }
      def bound(c: Column): Column = c.isNotNull && c.getField("kind") =!= Term.Kind.Null
      template.map { t =>
        df.select(termCol(t.s).as("s"), termCol(t.p).as("p"), termCol(t.o).as("o"))
          .filter(bound(col("s")) && bound(col("p")) && bound(col("o")))
      }.reduce(_.unionByName(_)).distinct()
    case DescribeQuery(targets, vars, pattern) =>
      // implementation-defined per spec; ours is the subject scan the
      // SURVEY maps it to (§2.9). Constant-only DESCRIBE keeps the
      // isin filter — a literal predicate the scan can push down /
      // partition-prune on. Variable targets (DESCRIBE ?x WHERE {…})
      // evaluate the pattern once, collect the DISTINCT bound keys of
      // the described vars (constants folded into the same key set),
      // and semi-join the subject scan on them: the key set is
      // typically tiny, so AQE turns the semi-join into a broadcast at
      // runtime, and a semi-join cannot duplicate description triples
      // even when a subject is named both ways.
      val presentVars = pattern.toSeq.flatMap { op =>
        val sols = exec(LabelService.rewrite(op))
        vars.filter(v => sols.columns.contains(v.name))
          .map(v => sols.select(col(v.name).getField("key")
            .as(InternalPrefix + "dk")).filter(col(InternalPrefix + "dk").isNotNull))
      }
      if (presentVars.isEmpty)
        statements
          .filter(col("s.key").isin(targets.map(_.key): _*))
          .select(col("s"), col("p"), col("o"))
      else {
        import spark.implicits._
        val constKeys = targets.map(_.key).distinct
          .toDF(InternalPrefix + "dk")
        val keys = (presentVars :+ constKeys).reduce(_.unionByName(_)).distinct()
        statements.alias("st")
          .join(keys, col("st.s").getField("key") === col(InternalPrefix + "dk"), "left_semi")
          .select(col("s"), col("p"), col("o"))
      }
  }

  // ----------------------------------------------------------- operators

  private[sparql] def exec(op: Op): DataFrame = op match {
    case Bgp(Nil) => unitDf
    case Bgp(triples) =>
      joinBgp(orderPatterns(triples), t => scan(t))
    case p: PathOp => Paths.exec(this, defaultGraphOnly(statements), p)
    case Join(l, r) => naturalJoin(exec(l), exec(r), "inner")
    case Lateral(l, r) =>
      // Default (parity): the reference executes LATERAL as a plain
      // join (calc_engine.rs:194-201) — no correlation semantics.
      // spark.graft.lateral.spec=true enables the SPARQL 1.2 correlated
      // interpretation for the one shape where the two genuinely
      // diverge: a sub-SELECT with LIMIT/OFFSET, which must slice PER
      // LEFT SOLUTION, not once globally. For plain graph patterns
      // substitution ≡ natural join on the shared variables, so the
      // parity plan is already spec-correct there.
      if (TranslateFlags.get(spark, TranslateFlags.LateralSpec).toBoolean)
        execLateralSpec(l, r)
      else naturalJoin(exec(l), exec(r), "inner")
    case LeftJoin(l, r, cond) =>
      // Default (parity): the reference applies the OPTIONAL's filter to
      // the LEFT side before joining (calc_engine.rs:170-192) —
      // nonstandard vs the SPARQL spec; replicated (CONFORMANCE #6).
      // spark.graft.optional.specFilter=true switches to the
      // spec-correct LeftJoin: the filter is evaluated over each joined
      // solution as part of the join condition, so a left row whose
      // matches all fail the filter survives unbound.
      val left = exec(l)
      val specMode = TranslateFlags.get(spark, TranslateFlags.OptionalSpecFilter).toBoolean
      cond match {
        case Some(c) if specMode => naturalJoin(left, exec(r), "left_outer", joinFilter = Some(c))
        case Some(c) => naturalJoin(left.filter(ebv(eval(c, colResolver(left))) <=> true),
          exec(r), "left_outer")
        case None => naturalJoin(left, exec(r), "left_outer")
      }
    case FilterOp(cond, inner) => execFilter(cond, exec(inner))
    case UnionOp(l, r) => unionPad(exec(l), exec(r))
    case Extend(inner, v, expr) =>
      val df = exec(inner)
      extendWith(df, v.name, expr)
    case Minus(l, r) =>
      val (ld, rd) = (exec(l), exec(r))
      val shared = ld.columns.intersect(rd.columns).toSeq
      if (shared.isEmpty) ld
      else {
        val rKeys = rd.select(shared.map(c => keyOrNull(rd(c)).as(c)): _*).distinct()
        val cond = shared.map(c => keyOrNull(ld(c)) === rKeys(c)).reduce(_ && _)
        ld.join(rKeys, cond, "left_anti")
      }
    case v: ValuesOp => valuesDf(v)
    case OrderBy(inner, keys) =>
      // hoist computed sort-key operands so `sortKey`'s CASE tree (which
      // references its operand ~12×) compiles over a column ref, not a
      // duplicated subtree (same rationale as hoistComplex for filters)
      var df = exec(inner)
      var tmps = List.empty[String]
      val sorts = keys.map { case (e, asc) =>
        val (d2, e2, ts) = hoistComplex(df, e)
        df = d2; tmps ++= ts
        val k = sortKey(eval(e2, colResolver(df)))
        if (asc) k.asc else k.desc
      }
      df.orderBy(sorts: _*).drop(tmps: _*)
    case Project(inner, vars) =>
      val df = exec(inner)
      df.select(vars.map(v =>
        if (df.columns.contains(v.name)) df(v.name) else Term.nullTerm.as(v.name)): _*)
    case ProjectExtend(inner, exprs) =>
      val df = exec(inner)
      exprs.foldLeft(df) { case (d, (v, e)) => extendWith(d, v.name, e) }
        .select(exprs.map(_._1.name).map(col): _*)
    case DistinctOp(inner) => exec(inner).distinct()
    case ReducedOp(inner) => exec(inner).distinct() // REDUCED permits dedup
    case Slice(inner, start, len) =>
      val df = exec(inner)
      val off = if (start > 0) df.offset(start.toInt) else df
      len.map(l => off.limit(l.toInt)).getOrElse(off)
    case Group(inner, keys, aggs) => execGroup(exec(inner), keys, aggs)
    case Service(_, _, _) =>
      throw new UnsupportedOperationException(
        "SERVICE: only wikibase:label is supported (rewritten before translation; " +
          "reference src/interpreter.rs:659 panics likewise)")

    // -- GRAPH (SURVEY §2.5; reference IR calc_data_types.rs:149-151,
    // exec todo! calc_engine.rs:255-259). Named graphs are document
    // provenance (each quad's `graph` = the dump entity it was parsed
    // from); the default graph is their union, so GRAPH only ever ADDS
    // a constraint/binding — pushed into every scan inside the group.
    case GraphOp(g, inner) => exec(pushGraph(inner, g))
    case DatasetOp(from, named, inner) =>
      val prev = (datasetFrom, datasetNamed)
      datasetFrom = Some(from.map(_.key).toSet)
      datasetNamed = Some(named.map(_.key).toSet)
      try exec(inner)
      finally { datasetFrom = prev._1; datasetNamed = prev._2 }
    case GraphBgp(Nil, g) => g match {
      // `GRAPH ?g {}` enumerates the named graphs; `GRAPH <g> {}` is
      // the unit solution iff the graph exists (SPARQL 1.1 §13.3)
      case v: Var =>
        if (hasGraphCol) {
          val all = statements.select(col("graph").as(v.name)).distinct()
          datasetNamed match {
            case Some(keys) if keys.isEmpty => all.limit(0)
            case Some(keys) =>
              all.filter(col(v.name).getField("key").isin(keys.toSeq: _*))
            case None => all
          }
        } else statements.limit(0).select(graft.model.Term.nullTerm.as(v.name))
      case Const(gv) =>
        // existence probe routes to the graph copy when present — a
        // one-bucket read instead of a store-wide key filter. Built
        // only under the hasGraphCol guard: a store without the graph
        // column has no named graphs, and the fallback filter would
        // not even analyze against it.
        def probe = graphKeyScan(gv)
          .getOrElse(statements.filter(col("graph.key") === gv.key))
        if (hasGraphCol && namedGraphVisible(gv.key) && !probe.isEmpty) unitDf
        else unitDf.limit(0)
    }
    case GraphBgp(triples, g) =>
      joinBgp(orderPatterns(triples), t => scan(t, Some(g)))
    case GraphPath(p, g) => g match {
      case Const(gv) =>
        val edges =
          if (hasGraphCol && namedGraphVisible(gv.key))
            statements.filter(col("graph.key") === gv.key)
          else statements.limit(0)
        val prev = graphFilterKey
        graphFilterKey = Some(gv.key) // constrain predScan-routed steps too
        try Paths.exec(this, edges, p) finally graphFilterKey = prev
      case v: Var =>
        // per-named-graph path evaluation: the path runs independently
        // inside each named graph and binds ?g — one distributed
        // fixpoint over (graph, node) composite keys (Paths.GraphMode),
        // not a per-graph driver loop. A store without the graph
        // column has no named graphs: empty result, schema preserved.
        val edges =
          if (!hasGraphCol)
            statements.limit(0).withColumn("graph", graft.model.Term.nullTerm)
          else datasetNamed match {
            case Some(keys) if keys.isEmpty => statements.limit(0)
            case Some(keys) => statements.filter(col("graph.key").isin(keys.toSeq: _*))
            case None => statements
          }
        val prev = graphVarMode
        graphVarMode = true // predScan-routed steps keep all named graphs
        try Paths.exec(this, edges, p, graphVar = Some(v.name))
        finally graphVarMode = prev
    }
  }

  /** True when the store carries the named-graph provenance column
    * (stores built before it existed fall back to "no named graphs":
    * GRAPH matches nothing, plain patterns are unchanged).
    */
  private val hasGraphCol = statements.columns.contains("graph")

  /** Active constant-graph constraint for [[predScan]] (set only while
    * executing a path under GRAPH — plan construction is synchronous,
    * so stack discipline holds; the translator is per-query).
    */
  private var graphFilterKey: Option[String] = None

  /** Set while executing a path under `GRAPH ?var` (same stack
    * discipline): predicate scans then range over ALL visible named
    * graphs instead of the default graph, keeping the `graph` column
    * for [[Paths.GraphMode]]'s composite keys.
    */
  private var graphVarMode: Boolean = false

  /** FROM / FROM NAMED dataset restriction (SPARQL 1.1 §13.2), set
    * while executing under a [[DatasetOp]] with the same stack
    * discipline as [[graphFilterKey]]. `Some(keys)` means the clause
    * was present: the default graph is exactly the union of `keys`
    * (possibly empty), resp. GRAPH ranges over exactly `keys`.
    */
  private var datasetFrom: Option[Set[String]] = None
  private var datasetNamed: Option[Set[String]] = None

  /** Restrict a quad frame to the dataset's DEFAULT graph (no-op
    * without a FROM clause; empty-from ⇒ empty default graph; legacy
    * stores without the graph column have no named graphs to select).
    */
  private def defaultGraphOnly(df: DataFrame): DataFrame = datasetFrom match {
    case None => df
    case Some(keys) if keys.isEmpty || !hasGraphCol => df.limit(0)
    case Some(keys) => df.filter(col("graph.key").isin(keys.toSeq: _*))
  }

  /** Is graph `key` one of the dataset's named graphs? (No FROM NAMED
    * clause ⇒ every graph is named, matching plain-GRAPH behavior.)
    */
  private def namedGraphVisible(key: String): Boolean =
    datasetNamed.forall(_.contains(key))

  /** Distribute a GRAPH constraint over `op`: BGPs and paths become
    * their graph-carrying forms; structural operators recurse; a nested
    * GRAPH re-scopes (SPARQL 1.1 §5.1.1) so it is left for [[exec]].
    */
  private def pushGraph(op: Op, g: TermPat): Op = op match {
    case Bgp(ts) => GraphBgp(ts, g)
    case p: PathOp => GraphPath(p, g)
    case nested: GraphOp => nested
    case gb: GraphBgp => gb
    case gp: GraphPath => gp
    case Join(l, r) => Join(pushGraph(l, g), pushGraph(r, g))
    case Lateral(l, r) => Lateral(pushGraph(l, g), pushGraph(r, g))
    case LeftJoin(l, r, c) => LeftJoin(pushGraph(l, g), pushGraph(r, g), c)
    case FilterOp(c, i) => FilterOp(c, pushGraph(i, g))
    case UnionOp(l, r) => UnionOp(pushGraph(l, g), pushGraph(r, g))
    case Extend(i, v, e) => Extend(pushGraph(i, g), v, e)
    case Minus(l, r) => Minus(pushGraph(l, g), pushGraph(r, g))
    // the parser's unit pattern (`GRAPH ?g {}`) must still enumerate /
    // existence-check graphs, so it maps to the empty GraphBgp; real
    // VALUES blocks are graph-independent and pass through
    case ValuesOp(Nil, _) => GraphBgp(Nil, g)
    case v: ValuesOp => v
    case OrderBy(i, ks) => OrderBy(pushGraph(i, g), ks)
    case Project(i, vs) => Project(pushGraph(i, g), vs)
    case ProjectExtend(i, es) => ProjectExtend(pushGraph(i, g), es)
    case DistinctOp(i) => DistinctOp(pushGraph(i, g))
    case ReducedOp(i) => ReducedOp(pushGraph(i, g))
    case Slice(i, s, l) => Slice(pushGraph(i, g), s, l)
    case Group(i, ks, as) => Group(pushGraph(i, g), ks, as)
    case s: Service => s
    // a sub-SELECT's own dataset clause re-scopes (exec resets state)
    case d: DatasetOp => d
  }

  /** Spec-correct correlated LATERAL (`spark.graft.lateral.spec`): a
    * right-side Slice applies per left solution — a window rank over a
    * per-left-row id, one shuffle, no per-row re-execution (the naive
    * reading of the spec's "evaluate once per solution"). Right sides
    * without a Slice join exactly like parity mode (substitution ≡
    * natural join for graph patterns).
    */
  private def execLateralSpec(l: Op, r: Op): DataFrame = r match {
    case Slice(inner0, start, len) =>
      // DISTINCT/REDUCED wrap the projection and apply BEFORE the
      // slice; with DISTINCT the sort keys must be projected
      // (SPARQL 1.1 §15.1), so deduping the projected sub-select
      // before the per-left ranking preserves both orders
      val (inner, dedup) = inner0 match {
        case DistinctOp(i) => (i, true)
        case ReducedOp(i) => (i, true)
        case other => (other, false)
      }
      val (body, sortKeys, proj) = inner match {
        case Project(OrderBy(i, ks), vs) => (i, ks, Some(vs))
        case OrderBy(i, ks) => (i, ks, None)
        case Project(i, vs) => (i, Seq.empty[(Expr, Boolean)], Some(vs))
        case other => (other, Seq.empty[(Expr, Boolean)], None)
      }
      val rowId = InternalPrefix + "lateral_row"
      val left = exec(l).withColumn(rowId, monotonically_increasing_id())
      val rightRaw = exec(body)
      val right =
        if (!dedup) rightRaw
        else proj match {
          case Some(vs) => rightRaw.select(vs.map(v => col(v.name)): _*).distinct()
          case None => rightRaw.distinct()
        }
      val joined = naturalJoin(left, right, "inner")
      val rightOnly = joined.columns.filterNot(left.columns.contains).toSeq
      // explicit keys first, then every right-bound column as a
      // deterministic tiebreak (SPARQL leaves unordered slices
      // implementation-defined; ours is stable run to run)
      val sorts = sortKeys.map { case (e, asc) =>
        val k = sortKey(eval(e, colResolver(joined)))
        if (asc) k.asc else k.desc
      } ++ rightOnly.sorted.map(c => sortKey(joined(c)).asc)
      val rn = InternalPrefix + "lateral_rn"
      val ranked = joined.withColumn(rn, row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(rowId)).orderBy(sorts: _*)))
      val upper = len.map(lim => col(rn) <= lit(start + lim)).getOrElse(lit(true))
      val sliced = ranked.filter(col(rn) > lit(start) && upper)
      val rightOut = proj
        .map(_.map(_.name).filter(n => rightOnly.contains(n)))
        .getOrElse(rightOnly)
      val outCols = left.columns.filterNot(_ == rowId).toSeq ++ rightOut
      sliced.select(outCols.map(col): _*)
    case other => naturalJoin(exec(l), exec(other), "inner")
  }

  /** One empty solution (unit of Join). */
  private def unitDf: DataFrame = spark.range(1).select()

  /** Greedy BGP join ordering (the reference's strategy, translated to
    * plan time: start small, always join a connected relation next —
    * `src/calc_engine.rs:109-151`). Without table statistics Catalyst
    * keeps inner joins in written order, so the translator picks it:
    * most-bound pattern first (boundness proxies scan selectivity),
    * then repeatedly the most-bound pattern sharing a variable with
    * what's already joined — avoiding accidental cartesian products
    * from naive left-to-right folding. Inner natural joins commute, so
    * results are unchanged.
    */
  /** Greedy BGP ordering: most-bound pattern first, then connected
    * patterns by boundness — and boundness TIES break by MEASURED
    * per-predicate cardinality (`pred_counts.json`, written by
    * create-index and maintained by appends), the reference's
    * size-ordered join discipline (`calc_engine.rs:116-151`). A
    * 31-row predicate now leads a join chain against a 10⁸-row one of
    * equal boundness, so the left-deep reduce builds its small
    * intermediates first. Stores without statistics (or
    * `spark.graft.bgp.statsOrder=false`) keep the pure boundness
    * order.
    */
  /** True when the store ships measured predicate statistics and the
    * stats flag is on — the shared gate for [[orderPatterns]]'s
    * tie-break and [[joinBgp]]'s broadcast hints.
    */
  private def statsEnabled: Boolean = predCounts.isDefined &&
    TranslateFlags.get(spark, TranslateFlags.BgpStatsOrder) == "true"

  /** Left-deep join of ordered BGP patterns with statistics-driven
    * broadcast hints. Any side whose WORST-CASE cardinality bound is
    * at or below `spark.graft.bgp.broadcastRows` gets an explicit
    * `broadcast()` hint at translate time: AQE converts such joins
    * too, but only AFTER the initial plan's exchanges have run —
    * measured on the QuadScale stats_chain shape, the hint-less stats
    * order still shuffled both 10⁷-row hot scans before AQE re-planned
    * the joins as broadcasts. With the hint in the INITIAL plan the
    * hot probe side never shuffles at all.
    *
    * Bounds, all from build-time statistics (`pred_counts.json`
    * totals + `pred_fanout.json` per-predicate MAX subject/object
    * degrees):
    *   - a scan's bound is its predicate's total, tightened to the
    *     max subject (object) degree when the subject (object) is
    *     constant — degree-aware, so `?x wdt:P31 wd:Q5` with a 10M-hot
    *     object is NOT hinted even though other P31 objects are cold;
    *   - a join's OUTPUT bound is the accumulated bound times the max
    *     per-shared-variable degree of the incoming pattern (the
    *     degree-constrained worst-case join size) — max, not average,
    *     so a hot key cannot slip a huge build side past the hint.
    * A predicate absent from the stats bounds to the table's
    * TRUNCATION FLOOR (`predCountFloor`): 0 when the table is complete
    * (absent ⇒ truly absent), else the smallest retained count — on a
    * >100k-predicate store the 100,001-st-hottest predicate can still
    * be huge, and reading it as 0 would broadcast-hint an arbitrarily
    * large scan (executor OOM / broadcast timeout at exactly the scale
    * the hints target). Patterns with variable predicates, and stores
    * without statistics, bound to Long.MaxValue (never hinted). Hints
    * bound BUILD sides only; an un-hinted side always stays
    * distributed, and the FINAL accumulated join is never hinted — its
    * bound was a decision about joins INSIDE this BGP, not about
    * whatever enclosing operator (OPTIONAL/MINUS/parent join) consumes
    * the result.
    */
  private def joinBgp(ordered: Seq[Triple], scanOf: Triple => DataFrame): DataFrame = {
    val hintRows =
      TranslateFlags.get(spark, TranslateFlags.BgpBroadcastRows).toLong
    val useHints = ordered.size > 1 && hintRows > 0 && statsEnabled
    // absent-from-stats ⇒ the truncation floor (0 for a complete
    // table; the smallest retained count for a truncated one);
    // no stats at all ⇒ unknown (MaxValue, never hinted).
    // The lookup key must be the key the SCAN filters the store on,
    // not the pattern term's own key: a statement-view predicate
    // (`p:P1`, key PS:1) reads exactly the direct view's rows
    // (EqualTo(p.key, P:1) — see stmtPred handling in scanTriple), so
    // its bound is P:1's count. Looking up PS:1 verbatim found
    // nothing in a COMPLETE table, bounded the scan to floor = 0, and
    // broadcast-hinted a scan holding every claim of that predicate —
    // measured 3.4x on QuadScale's 32M qualifier_join before the fix.
    def statsKey(pv: graft.model.TermValue): String =
      if (pv.kind == graft.model.Term.Kind.Pstmt && pv.num.isDefined)
        s"P:${pv.num.get.toLong}"
      else pv.key
    def count(pv: graft.model.TermValue): Long =
      predCounts.map(_.getOrElse(statsKey(pv), predCountFloor)).getOrElse(Long.MaxValue)
    def fanout(pv: graft.model.TermValue): (Long, Long) =
      predFanout.flatMap(_.get(statsKey(pv))).getOrElse((Long.MaxValue, Long.MaxValue))
    def mulSat(a: Long, b: Long): Long =
      if (a == 0L || b == 0L) 0L
      else if (a > Long.MaxValue / b) Long.MaxValue
      else a * b
    def scanBound(t: Triple): Long = t.p match {
      case Const(pv) =>
        val (ms, mo) = fanout(pv)
        val sB = t.s match { case _: Const => ms; case _ => Long.MaxValue }
        val oB = t.o match { case _: Const => mo; case _ => Long.MaxValue }
        math.min(count(pv), math.min(sB, oB))
      case _ => Long.MaxValue
    }
    // per accumulated row, how many rows of `t` can match through the
    // already-bound variables (min over the shared positions; capped
    // by the predicate's total for var-free overlap / cartesians)
    def perRowBound(t: Triple, seen: Set[String]): Long = t.p match {
      case Const(pv) =>
        val (ms, mo) = fanout(pv)
        val shared = Seq(
          t.s match { case Var(n) if seen(n) => Some(ms); case _ => None },
          t.o match { case Var(n) if seen(n) => Some(mo); case _ => None }).flatten
        if (shared.isEmpty) count(pv) else math.min(shared.min, count(pv))
      case _ => Long.MaxValue
    }
    def vars(t: Triple) = Seq(t.s, t.p, t.o).collect { case Var(n) => n }.toSet
    def hint(df: DataFrame, bound: Long): DataFrame =
      if (useHints && bound <= hintRows)
        org.apache.spark.sql.functions.broadcast(df) else df
    val first = ordered.head
    var acc = hint(scanOf(first), scanBound(first))
    var bound = scanBound(first)
    var seen = vars(first)
    val rest = ordered.tail
    for ((t, i) <- rest.zipWithIndex) {
      val next = hint(scanOf(t), scanBound(t))
      bound = mulSat(bound, perRowBound(t, seen))
      seen ++= vars(t)
      val joined = naturalJoin(acc, next, "inner")
      // hint the accumulator only while another pattern remains: the
      // hint marks it as the BUILD side of the NEXT in-BGP join, and
      // a hint on the final result would leak into the enclosing
      // operator's planning
      acc = if (i < rest.size - 1) hint(joined, bound) else joined
    }
    acc
  }

  private[sparql] def orderPatterns(ts: Seq[Triple]): Seq[Triple] = {
    if (ts.size <= 1) return ts
    val useStats = statsEnabled
    def boundCount(t: Triple) = Seq(t.s, t.p, t.o).count(_.isInstanceOf[Const])
    // estimated scan cardinality: a bound predicate's measured count
    // (absent from the stats table ⇒ the truncation floor — 0 rows for
    // a complete table); an unbound predicate scans everything. Bound
    // s/o halve the estimate's WEIGHT only via boundCount — the
    // tie-break compares same-boundness shapes.
    def estCard(t: Triple): Long =
      if (!useStats) 0L
      else t.p match {
        case Const(pv) => predCounts.get.getOrElse(pv.key, predCountFloor)
        case _ => Long.MaxValue
      }
    def vars(t: Triple) = Seq(t.s, t.p, t.o).collect { case Var(n) => n }.toSet
    // maxBy over (boundness, -cardinality): boundness dominates,
    // smaller measured scans win ties
    def rank(t: Triple): (Int, Long) = (boundCount(t), -estCard(t))
    val remaining = scala.collection.mutable.ArrayBuffer(ts: _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[Triple]
    val first = remaining.maxBy(rank)
    out += first
    remaining -= first
    var seen = vars(first)
    while (remaining.nonEmpty) {
      val connected = remaining.filter(t => vars(t).intersect(seen).nonEmpty)
      val next = (if (connected.nonEmpty) connected else remaining.toSeq).maxBy(rank)
      out += next
      remaining -= next
      seen ++= vars(next)
    }
    out.toSeq
  }

  // --------------------------------------------------------------- scans

  private val wdsSt = statements

  /** Convert a direct-property term to its statement view: P → ps
    * (reference `direct_pred_to_stmt_pred`, `calc_engine.rs:3362-3397`;
    * non-P terms pass through unchanged).
    */
  private def pstmtify(c: Column): Column =
    when(c.getField("kind") === Term.Kind.P,
      Term.struct_(
        lit(Term.Kind.Pstmt), c.getField("num"), c.getField("str"), c.getField("lang"),
        concat(lit("PS:"), c.getField("num").cast(LongType).cast(StringType))))
      .otherwise(c)

  /** True when the statements store uses the predicate-bucket
    * partitioned layout ([[graft.ingest.WikidataIngest.buildPartitioned]]).
    */
  private val hasPredBuckets = statements.columns.contains("p_bucket")

  /** Bound-predicate filter; on a partitioned store it adds the
    * partition-column equality so whole predicate buckets prune.
    */
  private def predKeyFilter(key: String, pPat: TermPat): Column = {
    val base = col("p.key") === key
    pPat match {
      case Const(v) if hasPredBuckets && v.num.isDefined =>
        base && col("p_bucket") ===
          graft.ingest.WikidataIngest.predBucket(v.num.get.toLong, buckets).toInt
      case _ => base
    }
  }

  /** Bound-object (reverse) scan: routes to the object-partitioned
    * store copy when one exists (the `relation_obj` analog — SURVEY
    * §1.6), pruning to the object's bucket; otherwise the main store
    * with an `o.key` filter (row-group pruning only).
    */
  private def objKeyScan(v: graft.model.TermValue): DataFrame =
    permScan(statementsObj, "o_bucket", "o", v)

  /** Bound-subject scan: the `relation_sub` analog. A subject's bucket
    * is far more selective than any predicate partition (one entity's
    * edges vs a whole predicate), so every bound-subject arm routes
    * here when the copy exists.
    */
  private def subKeyScan(v: graft.model.TermValue): DataFrame =
    permScan(statementsSub, "s_bucket", "s", v)

  /** Constant-GRAPH scan: the graph-partitioned copy (the fourth
    * permutation — the reference's `gspo`-style access path). A named
    * graph is ONE document's quads, so pruning to its g_bucket beats
    * any predicate partitioning; without the copy a `GRAPH wd:Qc`
    * pattern scans the whole store with only a pushed key filter —
    * linear in store size, i.e. a full scan at 100 TB. Some = the
    * pruned copy; None = no copy in this store (caller falls back).
    */
  private def graphKeyScan(v: graft.model.TermValue): Option[DataFrame] =
    statementsGr.map { c =>
      val bucket = v.num.map(n =>
        graft.ingest.WikidataIngest.predBucket(n.toLong, buckets).toInt)
        .getOrElse(buckets)
      c.filter(col("g_bucket") === bucket && col("graph.key") === v.key)
    }

  /** Bound-predicate scan with partition pruning, for path compilation
    * (the path compiler's steps are ordinary predicate scans and must
    * keep the p_bucket pruning on partitioned stores).
    */
  private[sparql] def predScan(v: graft.model.TermValue): DataFrame = {
    val base = wdsSt.filter(predKeyFilter(v.key, Const(v)))
    graphFilterKey match {
      case Some(k) if hasGraphCol => base.filter(col("graph.key") === k)
      case Some(_) => base.limit(0) // graph-constrained on a store without graphs
      case None if graphVarMode =>
        // GRAPH ?var path step: range over the visible named graphs
        if (!hasGraphCol) base.limit(0).withColumn("graph", graft.model.Term.nullTerm)
        else datasetNamed match {
          case Some(keys) if keys.isEmpty => base.limit(0)
          case Some(keys) => base.filter(col("graph.key").isin(keys.toSeq: _*))
          case None => base
        }
      case None => defaultGraphOnly(base) // FROM restricts default-graph steps
    }
  }

  private def permScan(copy: Option[DataFrame], bucketCol: String,
                       term: String, v: graft.model.TermValue): DataFrame = copy match {
    case Some(c) =>
      val bucket = v.num.map(n =>
        graft.ingest.WikidataIngest.predBucket(n.toLong, buckets).toInt)
        .getOrElse(buckets)
      c.filter(col(bucketCol) === bucket && col(s"$term.key") === v.key)
    case None => wdsSt.filter(col(s"$term.key") === v.key)
  }

  /** Triple-pattern scan: the 9-way bound/var dispatch with the
    * wdt:/p:/wds: statement-addressing duality
    * (`triplepattern_match`, reference `src/calc_engine.rs:3074-3284`).
    *
    * Output: one term-struct column per distinct variable; repeated
    * variables add equality filters (engine extension — the reference's
    * rename map silently collides).
    */
  def scan(t: Triple, graph: Option[TermPat] = None): DataFrame = {
    // constant-GRAPH patterns route the MAIN-store arms to the
    // graph-partitioned copy (one document's bucket instead of the
    // whole store); bound-subject/object arms keep their own copies,
    // which are at least as selective, and `finish` applies the graph
    // key filter either way. The copy lacks p_bucket, so predicate
    // filters on it are plain key equalities — inside one graph's
    // bucket there is nothing left to prune.
    val grRouted: Option[DataFrame] = graph match {
      case Some(Const(gv)) if hasGraphCol && namedGraphVisible(gv.key) =>
        graphKeyScan(gv)
      case _ => None
    }
    val st = grRouted.getOrElse(wdsSt)
    def pFilter(key: String, pPat: TermPat): Column =
      if (grRouted.isDefined) col("p.key") === key else predKeyFilter(key, pPat)
    val stmtPred = t.p match { case Const(v) => v.kind == Term.Kind.Pstmt; case _ => false }
    val stmtObj = t.o match { case Const(v) => v.kind == Term.Kind.NamedEdge; case _ => false }

    // the direct-view predicate for a p: constant (calc_engine.rs:3090-3098)
    val pLocalKey: Option[String] = t.p match {
      case Const(v) if v.kind == Term.Kind.Pstmt => Some(s"P:${v.num.get.toLong}")
      case Const(v) => Some(v.key)
      case _ => None
    }
    val sKey = t.s match { case Const(v) => Some(v.key); case _ => None }
    val oKey = t.o match { case Const(v) => Some(v.key); case _ => None }

    def empty: DataFrame = {
      val d = st.limit(0)
      finish(d, Seq())
    }

    /** project variable bindings; repeated vars → equality filter.
      * A GRAPH constraint filters (constant) or binds (variable) the
      * quad's provenance column before projection — a repeated
      * variable like `GRAPH ?g { ?g ?p ?o }` falls out of the same
      * equality machinery as any other repeat.
      */
    def finish(df0: DataFrame, binds0: Seq[(TermPat, Column)]): DataFrame = {
      val (df, binds) = graph match {
        case None => (defaultGraphOnly(df0), binds0)
        case Some(Const(gv)) =>
          (if (hasGraphCol && namedGraphVisible(gv.key))
             df0.filter(col("graph.key") === gv.key)
           else df0.limit(0), binds0)
        case Some(v: Var) =>
          // a store without the graph column has NO named graphs: a
          // variable-graph scan matches nothing (same as GraphBgp(Nil))
          if (!hasGraphCol)
            (df0.limit(0), binds0 :+ ((v: TermPat) -> graft.model.Term.nullTerm))
          else {
            val restricted = datasetNamed match {
              case Some(keys) if keys.isEmpty => df0.limit(0)
              case Some(keys) => df0.filter(col("graph.key").isin(keys.toSeq: _*))
              case None => df0
            }
            (restricted, binds0 :+ ((v: TermPat) -> col("graph")))
          }
      }
      val byVar = scala.collection.mutable.LinkedHashMap.empty[String, Column]
      var out = df
      var conds = List.empty[Column]
      binds.foreach {
        case (Var(name), c) =>
          byVar.get(name) match {
            case Some(first) => conds ::= (keyOrNull(first) === keyOrNull(c))
            case None => byVar(name) = c
          }
        case _ => // bound positions produce no output column
      }
      conds.foreach(c => out = out.filter(c))
      out.select(byVar.map { case (n, c) => c.as(n) }.toSeq: _*)
    }

    (t.s, t.p, t.o) match {
      // (V,V,V): full scan, direct rows (calc_engine.rs:3108-3114)
      case (s: Var, p: Var, o: Var) =>
        finish(st, Seq(s -> col("s"), p -> col("p"), o -> col("o")))

      // (V,V,B)
      case (s: Var, p: Var, _) =>
        if (stmtObj) // rows of the named statement; predicate in stmt view
          finish(st.filter(col("id.key") === oKey.get),
            Seq(s -> col("s"), p -> pstmtify(col("p"))))
        else {
          val Const(ov) = t.o: @unchecked
          finish(objKeyScan(ov), Seq(s -> col("s"), p -> col("p")))
        }

      // (V,B,V)
      case (s: Var, _, o: Var) =>
        val filtered = st.filter(pFilter(pLocalKey.get, t.p))
        if (stmtPred) finish(filtered, Seq(s -> col("s"), o -> col("id")))
        else finish(filtered, Seq(s -> col("s"), o -> col("o")))

      // (V,B,B)
      case (s: Var, _, _) =>
        if (stmtObj && stmtPred)
          finish(st.filter(col("id.key") === oKey.get && pFilter(pLocalKey.get, t.p)),
            Seq(s -> col("s")))
        else if (!stmtObj && !stmtPred)
          finish(st.filter(pFilter(pLocalKey.get, t.p) && col("o.key") === oKey.get),
            Seq(s -> col("s")))
        else empty // misaligned statement addressing (calc_engine.rs:3169-3178)

      // (B,V,V): direct view only. The reference's current code also
      // chains a statement view (calc_engine.rs:3183-3203), which would
      // double every row — but its published test corpus expects the
      // direct count (`wdt:Q31 ?p ?b` = 1354 = the subject's edge count,
      // test_requests.txt:16-21), so the corpus is the parity anchor
      // (CONFORMANCE). Statement addressing stays reachable via p:/wds:
      // constants in the other dispatch arms.
      case (_, p: Var, o: Var) =>
        val Const(sv) = t.s: @unchecked
        finish(subKeyScan(sv), Seq(p -> col("p"), o -> col("o")))

      // (B,V,B)
      case (_, p: Var, _) =>
        val Const(sv) = t.s: @unchecked
        if (stmtObj)
          finish(st.filter(col("id.key") === oKey.get && col("s.key") === sKey.get),
            Seq(p -> pstmtify(col("p"))))
        else
          finish(subKeyScan(sv).filter(col("o.key") === oKey.get), Seq(p -> col("p")))

      // (B,B,V) — the subject copy wins over predicate partitioning
      // (one entity's edges vs a whole predicate), so the p filter is
      // the plain key equality there
      case (_, _, o: Var) =>
        val Const(sv) = t.s: @unchecked
        val base = subKeyScan(sv).filter(col("p.key") === pLocalKey.get)
        if (stmtPred) finish(base, Seq(o -> col("id")))
        else finish(base, Seq(o -> col("o")))

      // (B,B,B): zero-variable existence pattern
      case (_, _, _) =>
        if (stmtObj && stmtPred)
          finish(st.filter(col("id.key") === oKey.get && pFilter(pLocalKey.get, t.p) &&
            col("s.key") === sKey.get), Seq())
        else if (!stmtObj && !stmtPred) {
          val Const(sv) = t.s: @unchecked
          finish(subKeyScan(sv).filter(col("p.key") === pLocalKey.get &&
            col("o.key") === oKey.get), Seq())
        } else empty
    }
  }

  // --------------------------------------------------------------- joins

  /** Natural join on shared variable columns, comparing canonical keys
    * (null-normalized so unbound == unbound, like the reference's Null
    * node id 0).
    */
  def naturalJoin(l: DataFrame, r: DataFrame, how: String,
                  joinFilter: Option[Expr] = None): DataFrame = {
    val shared = l.columns.intersect(r.columns).toSeq
    if (l.columns.isEmpty && how == "inner") return r
    val renamed = shared.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    // no shared variable → every pair of solutions is compatible
    // (cartesian product; the reference todo!'s this case — implemented)
    val keyCond =
      if (shared.isEmpty) lit(true)
      else shared.map(c => keyOrNull(l(c)) === keyOrNull(renamed(s"__r_$c"))).reduce(_ && _)
    // spec-correct OPTIONAL: the filter sees the joined solution —
    // shared vars equal on key, so the left copy stands in for both
    val cond = joinFilter match {
      case Some(f) =>
        val resolve: String => Option[Column] = { n =>
          if (l.columns.contains(n)) Some(l(n))
          else if (r.columns.contains(n)) Some(renamed(n))
          else None
        }
        keyCond && (ebv(Expressions.eval(f, resolve)) <=> true)
      case None => keyCond
    }
    val joined = l.join(renamed, cond, how)
    val outCols =
      l.columns.map(c =>
        if (shared.contains(c)) coalesce(joined(c), joined(s"__r_$c")).as(c)
        else joined(c).as(c)) ++
        renamed.columns.filterNot(_.startsWith("__r_")).filterNot(l.columns.contains)
          .map(c => joined(c).as(c))
    joined.select(outCols.toSeq: _*)
  }

  /** SPARQL UNION pads unshared variables with unbound (SQL null). */
  private def unionPad(l: DataFrame, r: DataFrame): DataFrame = {
    val all = (l.columns ++ r.columns).distinct.toSeq
    def pad(d: DataFrame) =
      d.select(all.map(c => if (d.columns.contains(c)) d(c) else Term.nullTerm.as(c)): _*)
    pad(l).unionByName(pad(r))
  }

  private def valuesDf(v: ValuesOp): DataFrame = {
    if (v.vars.isEmpty) return unitDf // unit pattern: one empty solution
    val rows = v.rows.map { row =>
      spark.range(1).select(v.vars.zip(row).map { case (va, tv) =>
        tv.map(_.toColumn).getOrElse(Term.nullTerm).as(va.name)
      }: _*)
    }
    rows.reduce(_.unionByName(_))
  }

  // ------------------------------------------------------------- filters

  /** FILTER: conjuncts that are (NOT) EXISTS become semi/anti joins
    * (strictly more correct than the reference's uncorrelated
    * row-count check, `calc_engine.rs:1118-1121`; SURVEY §2.3 maps them
    * to left_semi/left_anti); the rest is EBV with
    * eval-error → drop row (`calc_engine.rs:215`).
    */
  private def execFilter(cond: Expr, df: DataFrame): DataFrame = {
    def conjuncts(e: Expr): Seq[Expr] = e match {
      case EAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).foldLeft(df) { (d, c) =>
      c match {
        case EExists(op, neg) =>
          val sub = exec(LabelService.rewrite(op))
          val shared = d.columns.intersect(sub.columns).toSeq
          val how = if (neg) "left_anti" else "left_semi"
          if (shared.isEmpty) {
            val nonEmpty = !sub.isEmpty
            if (nonEmpty ^ neg) d else d.limit(0)
          } else {
            val renamed = shared.foldLeft(sub)((x, cc) => x.withColumnRenamed(cc, s"__e_$cc"))
            val on = shared.map(cc => keyOrNull(d(cc)) === keyOrNull(renamed(s"__e_$cc"))).reduce(_ && _)
            d.join(renamed, on, how)
          }
        case ENot(EExists(op, _)) =>
          execFilter(EExists(op, negated = true), d)
        case other =>
          // HAVING: a Filter directly over an Aggregate routes through
          // the analyzer's ResolveAggregateFunctions (it may reference
          // grouping/aggregate exprs), which re-runs sub-analyses and
          // costs ~1.7s of driver time per query. Our compiler already
          // resolved aggregates to output columns, so an identity
          // Project in between keeps the filter on the cheap path.
          val dp = d.queryExecution.logical match {
            case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
              d.select(d.columns.map(d(_)).toIndexedSeq: _*)
            case _ => d
          }
          val (d2, e2, tmps) = hoistComplex(dp, other, barrier = true)
          d2.filter(ebv(eval(e2, colResolver(d2))) <=> true).drop(tmps: _*)
      }
    }
  }

  /** Hoist function-call and arithmetic subtrees into temp columns
    * before compiling the surrounding comparison/EBV logic.
    *
    * Why: `cmp`/`termEq`/EBV reference each operand ~10× inside their
    * CASE trees; with computed operands (YEAR(?x), STR(?x)…) the
    * compiled Column tree grows multiplicatively, overflowing the JVM
    * 64KB method limit → Spark falls back to interpreted expression
    * eval. Binding each subtree to a column first means it is
    * evaluated once and the hot filter stays inside whole-stage
    * codegen (Catalyst's CollapseProject keeps multi-use aliases
    * materialized rather than re-inlining them).
    *
    * `barrier` additionally wraps each temp in
    * [[graft.functions.OptimizerFence]] (a zero-cost pass-through that
    * reports nondeterminism) so PushDownPredicates cannot substitute
    * the alias back into a FILTER/HAVING condition — without it, a
    * FILTER over a computed temp is re-inlined ~10× into the
    * condition, overflowing codegen's 64KB method limit and paying a
    * generate-then-fallback on every run. (A `when(rand > -1, …)`
    * wrapper used to serve; Spark 4.1 folds it away.) The scan-level
    * `key` equality filters are produced separately by `scan()` and
    * still push down.
    */
  private def hoistComplex(df0: DataFrame, e0: Expr,
                           barrier: Boolean = false): (DataFrame, Expr, Seq[String]) = {
    var df = df0
    var tmps = List.empty[String]
    var n = 0
    def bind(e: Expr): Expr = {
      n += 1
      val name = s"__x$n"
      val c = Expressions.eval(e, colResolver(df))
      val guarded = if (barrier) call_function(graft.functions.OptimizerFence.name, c) else c
      df = df.withColumn(name, guarded)
      tmps ::= name
      EVar(name)
    }
    def walk(e: Expr): Expr = e match {
      // label-service calls are lowered to joins elsewhere; EXISTS is a
      // semi/anti-join conjunct — both stay as-is
      case c @ ECall(Func.GetLabel | Func.GetDescription | Func.GetAlias, _) => c
      case c @ EExists(_, _) => c
      case ECall(f, args) => bind(ECall(f, args.map(walk)))
      case EAdd(l, r) => bind(EAdd(walk(l), walk(r)))
      case ESubtract(l, r) => bind(ESubtract(walk(l), walk(r)))
      case EMultiply(l, r) => bind(EMultiply(walk(l), walk(r)))
      case EDivide(l, r) => bind(EDivide(walk(l), walk(r)))
      case EUnaryPlus(x) => bind(EUnaryPlus(walk(x)))
      case EUnaryMinus(x) => bind(EUnaryMinus(walk(x)))
      case EOr(l, r) => EOr(walk(l), walk(r))
      case EAnd(l, r) => EAnd(walk(l), walk(r))
      case EEqual(l, r) => EEqual(walk(l), walk(r))
      case ENotEqual(l, r) => ENotEqual(walk(l), walk(r))
      case ESameTerm(l, r) => ESameTerm(walk(l), walk(r))
      case EGreater(l, r) => EGreater(walk(l), walk(r))
      case EGreaterEq(l, r) => EGreaterEq(walk(l), walk(r))
      case ELess(l, r) => ELess(walk(l), walk(r))
      case ELessEq(l, r) => ELessEq(walk(l), walk(r))
      case EIn(x, list, neg) => EIn(walk(x), list.map(walk), neg)
      case ENot(x) => ENot(walk(x))
      case EIf(c, t, f) => EIf(walk(c), walk(t), walk(f))
      case ECoalesce(args) => ECoalesce(args.map(walk))
      case other => other // EConst, EVar, EBound
    }
    val out = walk(e0)
    (df, out, tmps.reverse)
  }

  // ------------------------------------------------------------ grouping

  private def execGroup(df0: DataFrame, keys: Seq[Var], aggs0: Seq[(Var, Agg)]): DataFrame = {
    // hoist computed aggregate operands into temp columns first — each
    // agg references its operand several times (f32 coercion, null
    // guards, sort keys), so a computed operand would otherwise be
    // duplicated into every reference. Temps vanish with the groupBy.
    var df = df0
    def prep(e: Expr): Expr = { val (d2, e2, _) = hoistComplex(df, e); df = d2; e2 }
    val aggs: Seq[(Var, Agg)] = aggs0.map {
      case (v, ACount(eo, d)) => (v, ACount(eo.map(prep), d))
      case (v, ASum(e, d)) => (v, ASum(prep(e), d))
      case (v, AAvg(e, d)) => (v, AAvg(prep(e), d))
      case (v, AMin(e, d)) => (v, AMin(prep(e), d))
      case (v, AMax(e, d)) => (v, AMax(prep(e), d))
      case (v, AGroupConcat(e, d, s)) => (v, AGroupConcat(prep(e), d, s))
      case (v, ASample(e, d)) => (v, ASample(prep(e), d))
    }
    val resolver = colResolver(df)
    def notNullT(c: Column): Column = c.isNotNull && c.getField("kind") =!= Term.Kind.Null
    def f32of(c: Column): Column = when(isNumeric(c), asF32(c))

    val aggCols: Seq[Column] = aggs.map { case (v, agg) =>
      val out = agg match {
        case ACount(None, false) => intTerm(count(lit(1)))
        case ACount(None, true) =>
          intTerm(countDistinct(struct(df.columns.map(c => keyOrNull(df(c))).toSeq: _*)))
        case ACount(Some(e), false) =>
          // COUNT(expr) counts rows in the reference too (:466-470 treats
          // plain COUNT as row count); we count non-Null evals per SPARQL
          val c = eval(e, resolver)
          intTerm(count(when(notNullT(c), 1)))
        case ACount(Some(e), true) =>
          val c = eval(e, resolver)
          intTerm(countDistinct(when(notNullT(c), keyOrNull(c))))
        case ASum(e, false) =>
          val c = eval(e, resolver)
          floatTerm(coalesce(sum(f32of(c)), lit(0d)).cast(FloatType))
        case ASum(e, true) =>
          val c = eval(e, resolver)
          floatTerm(coalesce(sum_distinct(f32of(c)), lit(0d)).cast(FloatType))
        case AAvg(e, false) =>
          val c = eval(e, resolver)
          floatTerm(avg(f32of(c)).cast(FloatType))
        case AAvg(e, true) =>
          // avg(DISTINCT) = sum_distinct / count(distinct) in f32
          val c = eval(e, resolver)
          val s = sum_distinct(f32of(c))
          val n = countDistinct(f32of(c))
          floatTerm(when(n > 0, (s / n).cast(FloatType)))
        case AMin(e, _) =>
          val c = eval(e, resolver)
          min(when(notNullT(c), struct(sortKey(c).as("k"), c.as("t")))).getField("t")
        case AMax(e, _) =>
          val c = eval(e, resolver)
          max(when(notNullT(c), struct(sortKey(c).as("k"), c.as("t")))).getField("t")
        case AGroupConcat(e, distinct, sep) =>
          val c = eval(e, resolver)
          val form = Render.groupConcatForm(c)
          // deterministic order (sorted); the reference keeps insertion
          // order of its stable sort — deviation noted in CONFORMANCE.
          // spark.graft.groupConcat.maxElements (default 0 = unbounded,
          // matching the reference's in-memory grouping) caps the
          // concatenated element count so one skewed group cannot OOM
          // an executor at 100 TB: the BoundedSortedConcat aggregate
          // trims its buffer on every insert, so per-group state is
          // O(maxElements) even map-side (CONFORMANCE #10).
          val maxElems = TranslateFlags
            .get(df.sparkSession, TranslateFlags.GroupConcatMaxElements).toInt
          val out =
            if (maxElems > 0)
              call_function(graft.functions.BoundedSortedConcat.name,
                form, lit(sep.getOrElse("")), lit(maxElems), lit(distinct))
            else {
              val list = if (distinct) collect_set(form) else collect_list(form)
              concat_ws(sep.getOrElse(""), sort_array(list))
            }
          strTerm(out)
        case ASample(e, _) =>
          val c = eval(e, resolver)
          min(when(notNullT(c), struct(Render.lex(c).as("k"), c.as("t")))).getField("t")
      }
      out.as(v.name)
    }

    if (keys.isEmpty) {
      if (aggCols.isEmpty) df.limit(1).select() // degenerate: one empty solution
      else df.agg(aggCols.head, aggCols.tail: _*)
    } else {
      val keyCols = keys.map(k =>
        if (df.columns.contains(k.name)) df(k.name) else Term.nullTerm.as(k.name))
      // no aggregates: grouping yields one row per distinct key tuple
      if (aggCols.isEmpty) df.select(keyCols: _*).distinct()
      else df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
    }
  }

  // ---------------------------------------------------------- extensions

  private def extendWith(df: DataFrame, name: String, expr: Expr): DataFrame = expr match {
    case ECall(f @ (Func.GetLabel | Func.GetDescription | Func.GetAlias), args) =>
      LabelService.attach(this, labels, df, name, f, args)
    case ECoalesce(args) if args.exists {
      case ECall(Func.GetLabel | Func.GetDescription | Func.GetAlias, _) => true
      case _ => false
    } =>
      // coalesce over label-service calls: attach each, then coalesce
      var d = df
      val parts = args.zipWithIndex.map {
        case (ECall(f @ (Func.GetLabel | Func.GetDescription | Func.GetAlias), a), i) =>
          val tmp = s"__ls${i}_$name"
          d = LabelService.attach(this, labels, d, tmp, f, a)
          col(tmp)
        case (e, _) => eval(e, colResolver(d))
      }
      d.withColumn(name, coalesce(parts: _*)).drop(d.columns.filter(_.startsWith("__ls")).toIndexedSeq: _*)
    case _ =>
      val (d2, e2, tmps) = hoistComplex(df, expr)
      d2.withColumn(name, eval(e2, colResolver(d2))).drop(tmps: _*)
  }

  // -------------------------------------------------------- expressions

  private def colResolver(df: DataFrame): String => Option[Column] = {
    val cols = df.columns.toSet
    name => if (cols.contains(name)) Some(df(name)) else None
  }

  /** Compile an expression to a term-struct Column
    * (reference `calculate_expression`, `calc_engine.rs:993-1183`).
    */
  def eval(e: Expr, resolve: String => Option[Column]): Column = Expressions.eval(e, resolve)
}
