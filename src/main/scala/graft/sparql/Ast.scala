package graft.sparql

import graft.model.TermValue

/** SPARQL algebra IR, mirroring the reference's `Operator` /
  * `Expression` / `Pattern` / `PPE` / `AE` enums
  * (`/root/reference/src/calc_data_types.rs:5-205`). Produced by
  * [[Parser]], consumed by [[Translator]].
  */
object Ast {

  // ---- term patterns --------------------------------------------------
  sealed trait TermPat
  final case class Var(name: String) extends TermPat // without leading '?'
  final case class Const(value: TermValue) extends TermPat

  final case class Triple(s: TermPat, p: TermPat, o: TermPat)

  // ---- property path expressions (calc_data_types.rs:15-26) -----------
  sealed trait Ppe
  final case class PLink(iri: TermValue) extends Ppe
  final case class PReverse(inner: Ppe) extends Ppe
  final case class PSeq(front: Ppe, back: Ppe) extends Ppe
  final case class PAlt(front: Ppe, back: Ppe) extends Ppe
  final case class PZeroOrMore(inner: Ppe) extends Ppe
  final case class POneOrMore(inner: Ppe) extends Ppe
  final case class PZeroOrOne(inner: Ppe) extends Ppe
  final case class PNegated(preds: Seq[TermValue]) extends Ppe

  // ---- expressions (calc_data_types.rs:29-58) -------------------------
  sealed trait Expr
  final case class EConst(value: TermValue) extends Expr
  final case class EVar(name: String) extends Expr
  final case class EOr(l: Expr, r: Expr) extends Expr
  final case class EAnd(l: Expr, r: Expr) extends Expr
  final case class EEqual(l: Expr, r: Expr) extends Expr
  final case class ENotEqual(l: Expr, r: Expr) extends Expr
  final case class ESameTerm(l: Expr, r: Expr) extends Expr
  final case class EGreater(l: Expr, r: Expr) extends Expr
  final case class EGreaterEq(l: Expr, r: Expr) extends Expr
  final case class ELess(l: Expr, r: Expr) extends Expr
  final case class ELessEq(l: Expr, r: Expr) extends Expr
  final case class EIn(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
  final case class EAdd(l: Expr, r: Expr) extends Expr
  final case class ESubtract(l: Expr, r: Expr) extends Expr
  final case class EMultiply(l: Expr, r: Expr) extends Expr
  final case class EDivide(l: Expr, r: Expr) extends Expr
  final case class EUnaryPlus(e: Expr) extends Expr
  final case class EUnaryMinus(e: Expr) extends Expr
  final case class ENot(e: Expr) extends Expr
  final case class EExists(op: Op, negated: Boolean) extends Expr
  final case class EBound(v: Var) extends Expr
  final case class EIf(cond: Expr, t: Expr, f: Expr) extends Expr
  final case class ECoalesce(args: Seq[Expr]) extends Expr
  final case class ECall(fn: Func.Value, args: Seq[Expr]) extends Expr

  /** Scalar function inventory (calc_data_types.rs:222-286). */
  object Func extends Enumeration {
    val IsIri, IsBlank, IsLiteral, IsNumeric, Str, Lang, Datatype, Iri,
        BNode, StrDt, StrLang, Uuid, StrUuid,
        StrLen, SubStr, UCase, LCase, StrStarts, StrEnds, Contains,
        StrBefore, StrAfter, EncodeForUri, Concat, LangMatches, Regex, Replace,
        Abs, Round, Ceil, Floor, Rand,
        Now, Year, Month, Day, Hours, Minutes, Seconds, Timezone, Tz,
        Md5, Sha1, Sha256, Sha384, Sha512,
        GetLabel, GetDescription, GetAlias = Value
  }

  // ---- aggregates (calc_data_types.rs:77-112) -------------------------
  sealed trait Agg { def distinct: Boolean }
  final case class ACount(expr: Option[Expr], distinct: Boolean) extends Agg
  final case class ASum(expr: Expr, distinct: Boolean) extends Agg
  final case class AAvg(expr: Expr, distinct: Boolean) extends Agg
  final case class AMin(expr: Expr, distinct: Boolean) extends Agg
  final case class AMax(expr: Expr, distinct: Boolean) extends Agg
  final case class AGroupConcat(expr: Expr, distinct: Boolean, separator: Option[String]) extends Agg
  final case class ASample(expr: Expr, distinct: Boolean) extends Agg

  // ---- operators (calc_data_types.rs:117-205) -------------------------
  sealed trait Op
  final case class Bgp(triples: Seq[Triple]) extends Op
  final case class PathOp(s: TermPat, path: Ppe, o: TermPat) extends Op
  final case class Join(left: Op, right: Op) extends Op
  final case class LeftJoin(left: Op, right: Op, cond: Option[Expr]) extends Op
  final case class Lateral(left: Op, right: Op) extends Op
  final case class FilterOp(cond: Expr, inner: Op) extends Op
  final case class UnionOp(left: Op, right: Op) extends Op
  final case class Extend(inner: Op, v: Var, expr: Expr) extends Op
  final case class Minus(left: Op, right: Op) extends Op
  final case class ValuesOp(vars: Seq[Var], rows: Seq[Seq[Option[TermValue]]]) extends Op
  final case class OrderBy(inner: Op, keys: Seq[(Expr, Boolean)]) extends Op // (expr, ascending)
  final case class Project(inner: Op, vars: Seq[Var]) extends Op
  final case class ProjectExtend(inner: Op, exprs: Seq[(Var, Expr)]) extends Op
  final case class DistinctOp(inner: Op) extends Op
  final case class ReducedOp(inner: Op) extends Op
  final case class Slice(inner: Op, start: Long, length: Option[Long]) extends Op
  final case class Group(inner: Op, keys: Seq[Var], aggs: Seq[(Var, Agg)]) extends Op
  final case class Service(name: TermValue, inner: Op, silent: Boolean) extends Op

  /** `GRAPH <g>/?g { ... }` (reference IR
    * `src/calc_data_types.rs:149-151`; its exec is `todo!`,
    * `src/calc_engine.rs:255-259` — we execute it). The store's named
    * graphs are document-provenance: every quad carries the entity
    * document it was parsed from, and the default graph is the union of
    * all named graphs (the Blazegraph/WDQS dataset model). A constant
    * graph filters every scan inside; a variable binds it per scan and
    * joins/projects like any other variable.
    */
  final case class GraphOp(g: TermPat, inner: Op) extends Op

  /** Internal ([[Translator]] only): the push-down forms GRAPH leaves
    * behind — a BGP / path whose scans carry the graph constraint.
    * Never produced by the parser.
    */
  final case class GraphBgp(triples: Seq[Triple], g: TermPat) extends Op
  final case class GraphPath(p: PathOp, g: TermPat) extends Op

  /** `FROM` / `FROM NAMED` dataset description (SPARQL 1.1 §13.2):
    * when ANY clause is present, the query's dataset is exactly what
    * the clauses list — the default graph is the union (merge) of the
    * `from` graphs (empty list ⇒ empty default graph), and GRAPH
    * ranges over exactly the `fromNamed` graphs. Wraps the query root.
    */
  final case class DatasetOp(from: Seq[TermValue], fromNamed: Seq[TermValue],
                             inner: Op) extends Op

  /** Query forms (reference implements SELECT only and `todo!`s the
    * rest, `src/interpreter.rs:107-131`; we execute all four — SURVEY
    * §2.9: ASK = non-emptiness, CONSTRUCT = template instantiation into
    * (s,p,o) rows, DESCRIBE = subject scan).
    */
  sealed trait Query { def root: Op }
  final case class SelectQuery(root: Op) extends Query
  final case class AskQuery(root: Op) extends Query
  final case class ConstructQuery(template: Seq[Triple], root: Op) extends Query
  /** DESCRIBE: constant-IRI targets plus (SPARQL 1.1 §16.4) variable
    * targets — each solution of `pattern` contributes its bindings of
    * `vars` to the described-resource set. Variables require a WHERE
    * clause (enforced at parse).
    */
  final case class DescribeQuery(targets: Seq[TermValue], vars: Seq[Var] = Nil,
                                 pattern: Option[Op] = None) extends Query {
    def root: Op = pattern.getOrElse(Bgp(Nil))
  }

  // ---- updates (Spark-first extension — the reference engine is
  // read-only: its only write path is the full `create-db` rebuild,
  // `src/main.rs:50-66`; SPARQL 1.1 Update §3.1 forms mapped onto the
  // incrementally-maintained store instead) ------------------------------

  /** One quad in an update template or data block. `g = None` targets
    * the default graph (stored as a null graph term).
    */
  final case class Quad(s: TermPat, p: TermPat, o: TermPat, g: Option[TermPat])

  /** One update operation; a request is a `;`-separated sequence. */
  sealed trait UpdateOp
  /** `INSERT DATA { quads }` — concrete quads only (enforced at parse). */
  final case class InsertData(quads: Seq[Quad]) extends UpdateOp
  /** `DELETE DATA { quads }` — concrete quads only. */
  final case class DeleteData(quads: Seq[Quad]) extends UpdateOp
  /** `DELETE {tpl} INSERT {tpl} WHERE {pattern}` and its sugar forms
    * (`DELETE WHERE {pats}` sets `deleteTpl = pats, where = pats`).
    * Templates may contain variables bound by `where`; a template quad
    * with any unbound / ill-formed position is skipped per SPARQL 1.1
    * Update §3.1.3.
    */
  final case class Modify(deleteTpl: Seq[Quad], insertTpl: Seq[Quad],
                          where: Op) extends UpdateOp

  /** Prefix for internal pseudo-variables (blank-node columns, unnamed
    * group keys, synthesized aggregate slots). `#` cannot appear in a
    * lexed variable name (the lexer admits letters, digits, `_`, `-`),
    * so no user variable — including legal names like `?__x` — can ever
    * collide with an internal one.
    */
  val InternalPrefix = "#"

  /** Column-name prefix for blank nodes in query patterns. The
    * reference renames scan columns to the blank node's label exactly
    * like a variable (`pattern_to_str`, calc_engine.rs:2996-3001), so a
    * repeated label joins within the BGP; but blank nodes are not
    * variables — they cannot be projected and are excluded from
    * `SELECT *` (hence the reserved prefix).
    */
  val BnodePrefix = InternalPrefix + "bnode_"

  /** In-scope variables of an operator tree (used for SELECT *,
    * projection checks and the label-service rewrite). Names with the
    * reserved [[InternalPrefix]] (blank-node pseudo-variables, unnamed
    * group keys, synthesized aggregate slots) are internal and never in
    * scope.
    */
  def scopeVars(op: Op): Seq[Var] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[Var]
    def tp(p: TermPat): Unit = p match { case v: Var => out += v; case _ => }
    def walk(o: Op): Unit = o match {
      case Bgp(ts) => ts.foreach { t => tp(t.s); tp(t.p); tp(t.o) }
      case PathOp(s, _, o2) => tp(s); tp(o2)
      case Join(l, r) => walk(l); walk(r)
      case LeftJoin(l, r, _) => walk(l); walk(r)
      case Lateral(l, r) => walk(l); walk(r)
      case FilterOp(_, i) => walk(i)
      case UnionOp(l, r) => walk(l); walk(r)
      case Extend(i, v, _) => walk(i); out += v
      case Minus(l, _) => walk(l)
      case ValuesOp(vs, _) => out ++= vs
      case OrderBy(i, _) => walk(i)
      case Project(_, vs) => out ++= vs
      case ProjectExtend(_, es) => out ++= es.map(_._1)
      case DistinctOp(i) => walk(i)
      case ReducedOp(i) => walk(i)
      case Slice(i, _, _) => walk(i)
      case Group(_, ks, as) => out ++= ks; out ++= as.map(_._1)
      case Service(_, i, _) => walk(i)
      case GraphOp(g, i) => tp(g); walk(i)
      case GraphBgp(ts, g) => ts.foreach { t => tp(t.s); tp(t.p); tp(t.o) }; tp(g)
      case GraphPath(p, g) => tp(p.s); tp(p.o); tp(g)
      case DatasetOp(_, _, i) => walk(i)
    }
    walk(op)
    out.toSeq.filterNot(_.name.startsWith(InternalPrefix))
  }
}
