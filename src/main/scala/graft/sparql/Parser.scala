package graft.sparql

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

import graft.model.TermValue
import Ast._

/** Hand-rolled SPARQL parser → [[Ast]] algebra.
  *
  * The reference delegates parsing to the `spargebra` crate and maps its
  * `GraphPattern` 1:1 onto `Operator` (`src/interpreter.rs:135-248`);
  * this parser produces the same normalized algebra directly:
  * `Slice(Distinct(Project(OrderBy(Extend*(Group(Filter(body)))))))`.
  *
  * Grammar coverage (the reference's executed surface + its todo!'d
  * operators, which we implement): SELECT/ASK, BGP with `;` `,` `a`,
  * property paths, FILTER, OPTIONAL (with the filter-fusion rule),
  * UNION, MINUS, BIND, VALUES, SERVICE, sub-SELECT, GROUP BY +
  * aggregates, HAVING, ORDER BY, LIMIT/OFFSET, DISTINCT/REDUCED, and
  * the full expression / built-in function grammar of
  * `calc_data_types.rs:222-286`.
  */
object Parser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  /** Any parser-phase failure surfaces as a [[ParseException]] so
    * callers (the HTTP 400 path, the CLI exit-2 path) can distinguish
    * bad queries from engine errors — a malformed query must never
    * escape as a MatchError/NumberFormatException 500.
    */
  def parse(query: String): Query =
    try new Parser(tokenize(query)).parseQuery()
    catch {
      case e: ParseException => throw e
      case scala.util.control.NonFatal(e) =>
        throw ParseException(s"malformed query (${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  /** Parse a SPARQL 1.1 Update request (a `;`-separated sequence of
    * INSERT DATA / DELETE DATA / DELETE WHERE / DELETE-INSERT-WHERE
    * operations). The reference engine has no update surface at all —
    * this is a Spark-first extension executed by [[Update]].
    */
  def parseUpdate(update: String): Seq[UpdateOp] =
    try new Parser(tokenize(update)).parseUpdateRequest()
    catch {
      case e: ParseException => throw e
      case scala.util.control.NonFatal(e) =>
        throw ParseException(s"malformed update (${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  // ---------------------------------------------------------------- lexer

  sealed trait Tok
  final case class TIri(iri: String) extends Tok
  final case class TPName(prefix: String, local: String) extends Tok
  final case class TVar(name: String) extends Tok
  final case class TStr(value: String) extends Tok
  final case class TNum(lex: String, isInt: Boolean) extends Tok
  final case class TWord(w: String) extends Tok // keyword or function name
  final case class TPunct(p: String) extends Tok

  private val puncts = Seq(
    "^^", "||", "&&", "!=", "<=", ">=", "{", "}", "(", ")", ".", ";", ",",
    "=", "<", ">", "!", "+", "-", "*", "/", "|", "^", "?", "[", "]")

  def tokenize(input: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = input.length
    def isNameChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c > 127
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && input(i) != '\n') i += 1 }
      else if (c == '<') {
        // IRIREF vs '<'/'<=' operator: an IRI has no whitespace before '>'
        val close = input.indexOf('>', i + 1)
        val sub = if (close > 0) input.substring(i + 1, close) else ""
        if (close > 0 && !sub.exists(ch => ch.isWhitespace || ch == '<')) {
          out += TIri(sub); i = close + 1
        } else if (i + 1 < n && input(i + 1) == '=') { out += TPunct("<="); i += 2 }
        else { out += TPunct("<"); i += 1 }
      } else if (c == '?' || c == '$') {
        if (i + 1 < n && isNameChar(input(i + 1))) {
          var j = i + 1
          while (j < n && isNameChar(input(j))) j += 1
          out += TVar(input.substring(i + 1, j)); i = j
        } else { out += TPunct("?"); i += 1 }
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val ch = input(j)
          if (ch == '\\' && j + 1 < n) {
            input(j + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
              case '\\' => sb += '\\'; case '"' => sb += '"'; case '\'' => sb += '\''
              case other => sb += other
            }
            j += 2
          } else if (ch == quote) { closed = true; j += 1 }
          else { sb += ch; j += 1 }
        }
        if (!closed) throw ParseException("unterminated string literal")
        out += TStr(sb.toString); i = j
      } else if (c.isDigit || (c == '.' && i + 1 < n && input(i + 1).isDigit &&
                 out.lastOption.forall(t => !t.isInstanceOf[TNum]))) {
        var j = i
        var seenDot = false
        var seenExp = false
        while (j < n && (input(j).isDigit ||
               (input(j) == '.' && !seenDot && !seenExp && j + 1 < n && input(j + 1).isDigit) ||
               ((input(j) == 'e' || input(j) == 'E') && !seenExp && j > i) ||
               ((input(j) == '+' || input(j) == '-') && j > i &&
                 (input(j - 1) == 'e' || input(j - 1) == 'E')))) {
          if (input(j) == '.') seenDot = true
          if (input(j) == 'e' || input(j) == 'E') seenExp = true
          j += 1
        }
        val lex = input.substring(i, j)
        out += TNum(lex, !seenDot && !seenExp); i = j
      } else if (c == '@') {
        var j = i + 1
        while (j < n && (input(j).isLetterOrDigit || input(j) == '-')) j += 1
        out += TWord(input.substring(i, j)); i = j
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && isNameChar(input(j))) j += 1
        // prefixed name? word ':' local
        if (j < n && input(j) == ':') {
          var k = j + 1
          while (k < n && (isNameChar(input(k)) || input(k) == '.' && k + 1 < n && isNameChar(input(k + 1)))) k += 1
          out += TPName(input.substring(i, j), input.substring(j + 1, k)); i = k
        } else { out += TWord(input.substring(i, j)); i = j }
      } else if (c == ':') { // default-prefix name
        var k = i + 1
        while (k < n && isNameChar(input(k))) k += 1
        out += TPName("", input.substring(i + 1, k)); i = k
      } else {
        puncts.find(p => input.startsWith(p, i)) match {
          case Some(p) => out += TPunct(p); i += p.length
          case None => throw ParseException(s"unexpected character '$c' at $i")
        }
      }
    }
    out.toVector
  }

  // --------------------------------------------------------------- parser

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private var prefixes: Map[String, String] = Iris.defaultPrefixes
    private var aggCounter = 0
    private var bnodeCounter = 0
    private val aggs = ArrayBuffer.empty[(Var, Agg)]

    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length) throw ParseException("unexpected end of query")
      pos += 1; toks(pos - 1)
    }
    private def isWord(w: String): Boolean = peek match {
      case Some(TWord(x)) => x.equalsIgnoreCase(w)
      case _ => false
    }
    private def eatWord(w: String): Boolean = { if (isWord(w)) { pos += 1; true } else false }
    private def expectWord(w: String): Unit =
      if (!eatWord(w)) throw ParseException(s"expected $w, got $peek")
    private def isPunct(p: String): Boolean = peek.contains(TPunct(p))
    private def eatPunct(p: String): Boolean = { if (isPunct(p)) { pos += 1; true } else false }
    private def expectPunct(p: String): Unit =
      if (!eatPunct(p)) throw ParseException(s"expected '$p', got $peek")

    private def resolvePName(prefix: String, local: String): String =
      prefixes.get(prefix) match {
        case Some(ns) => ns + local
        case None => throw ParseException(s"unknown prefix '$prefix:'")
      }

    // -- entry ---------------------------------------------------------
    private def parsePrologue(): Unit = {
      while (isWord("PREFIX") || isWord("BASE")) {
        if (eatWord("PREFIX")) {
          val (p, _) = next() match {
            case TPName(pre, loc) => (pre, loc)
            case t => throw ParseException(s"expected prefix name, got $t")
          }
          val iri = next() match {
            case TIri(x) => x
            case t => throw ParseException(s"expected IRI, got $t")
          }
          prefixes = prefixes + (p -> iri)
        } else { next(); next() } // BASE <iri> — accepted, unused
      }
    }

    def parseQuery(): Query = {
      parsePrologue()
      if (eatWord("ASK")) {
        val ds = parseDatasetClauses()
        eatWord("WHERE") // ASK DatasetClause* WhereClause; WHERE optional
        val body = parseGroupGraphPattern()
        AskQuery(withDataset(body, ds))
      } else if (eatWord("CONSTRUCT")) {
        // CONSTRUCT WHERE { triples } shorthand: the pattern IS the
        // template (SPARQL 1.1 §10.2.3)
        val shorthand = isWord("WHERE")
        var body: Op = null
        val tpl =
          if (shorthand) {
            next()
            body = parseGroupGraphPattern()
            body match {
              case Bgp(ts) => ts
              case _ => throw ParseException(
                "CONSTRUCT WHERE shorthand allows only triple patterns")
            }
          } else {
            expectPunct("{")
            val t = parseTriplesBlock() match {
              case Bgp(ts) => ts
              case _ => throw ParseException("property paths are not allowed in a CONSTRUCT template")
            }
            expectPunct("}")
            val ds = parseDatasetClauses()
            eatWord("WHERE")
            body = withDataset(parseGroupGraphPattern(), ds)
            t
          }
        var limit: Option[Long] = None
        var off = 0L
        while (peek.isDefined) {
          if (eatWord("LIMIT"))
            limit = Some(next() match { case TNum(l, true) => l.toLong; case t => throw ParseException(s"$t") })
          else if (eatWord("OFFSET"))
            off = next() match { case TNum(l, true) => l.toLong; case t => throw ParseException(s"$t") }
          else throw ParseException(s"unexpected token $peek")
        }
        if (limit.isDefined || off > 0) body = Slice(body, off, limit)
        ConstructQuery(tpl, body)
      } else if (eatWord("DESCRIBE")) {
        val targets = ArrayBuffer.empty[TermValue]
        val vars = ArrayBuffer.empty[Var]
        var more = true
        while (more) peek match {
          case Some(TIri(_)) | Some(TPName(_, _)) => targets += parseIriTerm()
          case Some(TVar(v)) => next(); vars += Var(v)
          case _ => more = false
        }
        if (targets.isEmpty && vars.isEmpty)
          throw ParseException("DESCRIBE requires at least one IRI or variable")
        val ds = parseDatasetClauses()
        var pattern: Option[Op] =
          if (eatWord("WHERE")) Some(withDataset(parseGroupGraphPattern(), ds))
          else None
        // solution modifiers bound the SOLUTION sequence feeding the
        // described-resource set, not the description's triples
        var limit: Option[Long] = None
        var off = 0L
        while (peek.isDefined) {
          if (eatWord("LIMIT"))
            limit = Some(next() match { case TNum(l, true) => l.toLong; case t => throw ParseException(s"$t") })
          else if (eatWord("OFFSET"))
            off = next() match { case TNum(l, true) => l.toLong; case t => throw ParseException(s"$t") }
          else throw ParseException(s"unexpected token $peek")
        }
        if (pattern.isDefined && (limit.isDefined || off > 0))
          pattern = pattern.map(Slice(_, off, limit))
        if (vars.nonEmpty && pattern.isEmpty) throw ParseException(
          "DESCRIBE with variables requires a WHERE clause to bind them")
        DescribeQuery(targets.toSeq, vars.toSeq, pattern)
      } else {
        expectWord("SELECT")
        parseSelectRest()
      }
    }

    // -- update entry ----------------------------------------------------

    /** UpdateRequest ::= Prologue UpdateOp (';' Prologue UpdateOp?)*
      * (SPARQL 1.1 Update §3; prefixes accumulate across operations).
      */
    def parseUpdateRequest(): Seq[UpdateOp] = {
      val ops = ArrayBuffer.empty[UpdateOp]
      var more = true
      while (more) {
        parsePrologue()
        if (peek.isEmpty) more = false
        else {
          ops += parseUpdateOp()
          if (eatPunct(";")) more = peek.nonEmpty
          else if (peek.nonEmpty)
            throw ParseException(s"unexpected token $peek after update operation")
          else more = false
        }
      }
      if (ops.isEmpty) throw ParseException("empty update request")
      ops.toSeq
    }

    private def parseUpdateOp(): UpdateOp =
      if (eatWord("INSERT")) {
        if (eatWord("DATA")) InsertData(parseQuadBlock(requireConst = true))
        else {
          val ins = parseQuadBlock(requireConst = false)
          expectWord("WHERE")
          Modify(Nil, ins, parseGroupGraphPattern())
        }
      } else if (eatWord("DELETE")) {
        if (eatWord("DATA")) DeleteData(parseQuadBlock(requireConst = true))
        else if (isWord("WHERE")) {
          // DELETE WHERE { pats }: the pattern is also the template
          next()
          val pats = parseQuadBlock(requireConst = false)
          Modify(pats, Nil, quadsAsPattern(pats))
        } else {
          val del = parseQuadBlock(requireConst = false)
          val ins = if (eatWord("INSERT")) parseQuadBlock(requireConst = false) else Nil
          expectWord("WHERE")
          Modify(del, ins, parseGroupGraphPattern())
        }
      } else throw ParseException(s"expected INSERT or DELETE, got $peek")

    /** QuadData / QuadPattern ::= '{' (TriplesBlock | GRAPH iri|var
      * '{' TriplesBlock? '}')* '}'. Property paths are not triples and
      * blank nodes are forbidden in every update template (we reject
      * the INSERT-mints-fresh-bnodes case rather than half-support it);
      * `requireConst` additionally rejects variables (DATA forms).
      */
    private def parseQuadBlock(requireConst: Boolean): Seq[Quad] = {
      expectPunct("{")
      val out = ArrayBuffer.empty[Quad]
      def checked(p: TermPat, pos: String): TermPat = p match {
        case Var(n) if n.startsWith(BnodePrefix) =>
          throw ParseException("blank nodes are not allowed in update quads")
        case Var(n) if requireConst =>
          throw ParseException(s"variable ?$n in $pos of a DATA block (concrete terms only)")
        case other => other
      }
      def add(ts: Seq[Triple], g: Option[TermPat]): Unit =
        out ++= ts.map(t => Quad(checked(t.s, "subject"), checked(t.p, "predicate"),
          checked(t.o, "object"), g.map(checked(_, "graph"))))
      var done = false
      while (!done) {
        if (isPunct("}")) { next(); done = true }
        else if (eatWord("GRAPH")) {
          val g: TermPat = peek match {
            case Some(TVar(v)) if !requireConst => next(); Var(v)
            case _ => Const(parseIriTerm())
          }
          expectPunct("{")
          if (!isPunct("}")) parseTriplesBlock() match {
            case Bgp(ts) => add(ts, Some(g))
            case _ => throw ParseException("property paths are not allowed in update quads")
          }
          expectPunct("}")
        } else parseTriplesBlock() match {
          case Bgp(ts) => add(ts, None)
          case _ => throw ParseException("property paths are not allowed in update quads")
        }
        eatPunct(".")
      }
      out.toSeq
    }

    /** The WHERE op implied by `DELETE WHERE { pats }`: default-graph
      * quads form one BGP, each named-graph group scans under its
      * GRAPH.
      */
    private def quadsAsPattern(pats: Seq[Quad]): Op = {
      val groups = pats.groupBy(_.g).toSeq.sortBy(_._1.toString)
      val ops = groups.map {
        case (None, qs) => Bgp(qs.map(q => Triple(q.s, q.p, q.o)))
        case (Some(g), qs) => GraphOp(g, Bgp(qs.map(q => Triple(q.s, q.p, q.o))))
      }
      ops.reduce(Join(_, _))
    }

    /** SELECT tail (after the SELECT keyword). `stopAtBrace` bounds the
      * solution-modifier loop at the enclosing group's `}` for
      * sub-SELECTs. Aggregates are scoped per SELECT: a subquery's
      * aggregate list must not leak into (or clobber) the outer query's.
      */
    private def parseSelectRest(stopAtBrace: Boolean = false): Query = {
      val outerAggs = aggs.toList
      aggs.clear()
      var distinct = false
      var reduced = false
      if (eatWord("DISTINCT")) distinct = true
      else if (eatWord("REDUCED")) reduced = true

      // select items; aggregates inside are replaced by agg-var refs
      var star = false
      val items = ArrayBuffer.empty[(Var, Option[Expr])] // (out var, expr if computed)
      var done = false
      while (!done) {
        peek match {
          case Some(TPunct("*")) => next(); star = true
          case Some(TVar(v)) => next(); items += ((Var(v), None))
          case Some(TPunct("(")) =>
            next()
            val e = parseExpression()
            expectWord("AS")
            val v = next() match {
              case TVar(x) => Var(x)
              case t => throw ParseException(s"expected variable after AS, got $t")
            }
            expectPunct(")")
            items += ((v, Some(e)))
          case _ => done = true
        }
      }
      val dataset = parseDatasetClauses()
      eatWord("WHERE")
      var body = parseGroupGraphPattern()

      // solution modifiers
      val groupKeys = ArrayBuffer.empty[Var]
      val groupKeyExprs = ArrayBuffer.empty[(Var, Expr)]
      var having: Option[Expr] = None
      val orderKeys = ArrayBuffer.empty[(Expr, Boolean)]
      var limit: Option[Long] = None
      var offset: Long = 0L
      var grouped = false

      while (peek.isDefined && !(stopAtBrace && isPunct("}"))) {
        if (eatWord("GROUP")) {
          expectWord("BY")
          grouped = true
          var more = true
          while (more) {
            peek match {
              case Some(TVar(v)) => next(); groupKeys += Var(v)
              case Some(TPunct("(")) =>
                // GroupCondition '(' Expression ('AS' Var)? ')' — an
                // unnamed key gets a hidden variable (it groups but is
                // not referenceable, so projection drops it)
                next()
                val e = parseExpression()
                val v =
                  if (eatWord("AS"))
                    next() match { case TVar(x) => Var(x); case t => throw ParseException(s"$t") }
                  else freshGroupVar()
                expectPunct(")")
                groupKeys += v; groupKeyExprs += ((v, e))
              case Some(TWord(w)) if builtinNames.contains(w.toUpperCase) =>
                // GroupCondition ::= BuiltInCall (bare, unnamed)
                val e = parsePrimaryExpression()
                val v = freshGroupVar()
                groupKeys += v; groupKeyExprs += ((v, e))
              case _ => more = false
            }
          }
        } else if (eatWord("HAVING")) {
          val e = parseExpression()
          having = Some(having.map(EAnd(_, e)).getOrElse(e))
        } else if (eatWord("ORDER")) {
          expectWord("BY")
          var more = true
          while (more) {
            if (eatWord("ASC")) { expectPunct("("); orderKeys += ((parseExpression(), true)); expectPunct(")") }
            else if (eatWord("DESC")) { expectPunct("("); orderKeys += ((parseExpression(), false)); expectPunct(")") }
            else peek match {
              case Some(TVar(v)) => next(); orderKeys += ((EVar(v), true))
              case Some(TPunct("(")) => next(); orderKeys += ((parseExpression(), true)); expectPunct(")")
              case Some(TWord(w)) if builtinNames.contains(w.toUpperCase) =>
                orderKeys += ((parsePrimaryExpression(), true))
              case _ => more = false
            }
          }
        } else if (eatWord("LIMIT")) {
          limit = Some(next() match { case TNum(l, true) => l.toLong; case t => throw ParseException(s"$t") })
        } else if (eatWord("OFFSET")) {
          offset = next() match { case TNum(l, true) => l.toLong; case t => throw ParseException(s"$t") }
        } else if (eatWord("VALUES")) {
          body = Join(body, parseInlineValues())
        } else throw ParseException(s"unexpected token $peek")
      }

      // assemble: group → having → extends → order → project → distinct → slice
      val useGroup = grouped || aggs.nonEmpty
      var op = body
      if (useGroup) {
        for ((v, e) <- groupKeyExprs) op = Extend(op, v, e)
        op = Group(op, groupKeys.toSeq, aggs.toSeq)
        for (h <- having) op = FilterOp(h, op)
      }
      val outVars = ArrayBuffer.empty[Var]
      if (star) {
        // hidden names (unnamed group keys, blank nodes) never project
        if (useGroup) outVars ++= groupKeys.filterNot(_.name.startsWith(InternalPrefix))
        else outVars ++= scopeVars(op)
      }
      for ((v, eOpt) <- items) {
        eOpt match {
          case Some(e) => op = Extend(op, v, e)
          case None =>
        }
        outVars += v
      }
      if (orderKeys.nonEmpty) op = OrderBy(op, orderKeys.toSeq)
      op = Project(op, outVars.toSeq.distinct)
      if (distinct) op = DistinctOp(op)
      if (reduced) op = ReducedOp(op)
      if (limit.isDefined || offset > 0) op = Slice(op, offset, limit)
      aggs.clear(); aggs ++= outerAggs
      SelectQuery(withDataset(op, dataset))
    }

    /** `FROM <g>` / `FROM NAMED <g>` clauses (zero or more, before
      * WHERE). Returns (from, fromNamed).
      */
    private def parseDatasetClauses(): (Seq[TermValue], Seq[TermValue]) = {
      val from = ArrayBuffer.empty[TermValue]
      val named = ArrayBuffer.empty[TermValue]
      while (isWord("FROM")) {
        next()
        if (eatWord("NAMED")) named += parseIriTerm() else from += parseIriTerm()
      }
      (from.toSeq, named.toSeq)
    }

    private def withDataset(op: Op, ds: (Seq[TermValue], Seq[TermValue])): Op =
      if (ds._1.isEmpty && ds._2.isEmpty) op else DatasetOp(ds._1, ds._2, op)

    // -- group graph pattern -------------------------------------------
    private def parseGroupGraphPattern(): Op = {
      expectPunct("{")
      // GroupGraphPattern ::= '{' (SubSelect | GroupGraphPatternSub) '}'
      // — spargebra parses a sub-SELECT into a nested Project that the
      // reference interpreter maps like any other operator
      // (interpreter.rs:210-213), so it joins with the enclosing group
      // on its projected variables.
      if (isWord("SELECT")) {
        next()
        val sub = parseSelectRest(stopAtBrace = true) match {
          case SelectQuery(op) => op
          case q => throw ParseException(s"unexpected subquery form $q")
        }
        expectPunct("}")
        return sub
      }
      var current: Option[Op] = None
      val filters = ArrayBuffer.empty[Expr]

      def join(op: Op): Unit = current = Some(current.map(Join(_, op)).getOrElse(op))

      var done = false
      while (!done) {
        if (isPunct("}")) { next(); done = true }
        else if (eatWord("OPTIONAL")) {
          val inner = parseGroupGraphPattern()
          val (rhs, cond) = inner match {
            // spargebra fuses a group-final FILTER into the LeftJoin
            case FilterOp(c, i) => (i, Some(c))
            case other => (other, None)
          }
          current = Some(LeftJoin(current.getOrElse(unitOp), rhs, cond))
        } else if (eatWord("MINUS")) {
          val inner = parseGroupGraphPattern()
          current = Some(Minus(current.getOrElse(unitOp), inner))
        } else if (eatWord("LATERAL")) {
          // reference executes LATERAL as a plain join (calc_engine.rs:194-201)
          val inner = parseGroupGraphPattern()
          current = Some(Lateral(current.getOrElse(unitOp), inner))
        } else if (eatWord("FILTER")) {
          filters += parseConstraint()
        } else if (eatWord("BIND")) {
          expectPunct("(")
          val e = parseExpression()
          expectWord("AS")
          val v = next() match { case TVar(x) => Var(x); case t => throw ParseException(s"$t") }
          expectPunct(")")
          current = Some(Extend(current.getOrElse(unitOp), v, e))
        } else if (eatWord("VALUES")) {
          join(parseInlineValues())
        } else if (eatWord("SERVICE")) {
          val silent = eatWord("SILENT")
          val name = parseIriTerm()
          val inner = parseGroupGraphPattern()
          join(Service(name, inner, silent))
        } else if (eatWord("GRAPH")) {
          val g: TermPat = peek match {
            case Some(TVar(v)) => next(); Var(v)
            case _ => Const(parseIriTerm())
          }
          val inner = parseGroupGraphPattern()
          join(GraphOp(g, inner))
        } else if (isPunct("{")) {
          // nested group, possibly a UNION chain
          var u = parseGroupGraphPattern()
          while (eatWord("UNION")) u = UnionOp(u, parseGroupGraphPattern())
          join(u)
        } else {
          join(parseTriplesBlock())
        }
        eatPunct(".") // optional separators between elements
      }
      var op = current.getOrElse(unitOp)
      for (f <- filters) op = FilterOp(f, op)
      op
    }

    /** Unit pattern (empty group): one empty solution. */
    private def unitOp: Op = ValuesOp(Nil, Seq(Seq()))

    // -- triples block --------------------------------------------------
    private def parseTriplesBlock(): Op = {
      val triples = ArrayBuffer.empty[Triple]
      val paths = ArrayBuffer.empty[PathOp]
      var more = true
      while (more) {
        val s = parseTermPat()
        var subjMore = true
        while (subjMore) {
          val path = parsePath()
          var objMore = true
          while (objMore) {
            val o = parseTermPat()
            path match {
              case Left(v) => triples += Triple(s, v, o)
              case Right(PLink(iri)) => triples += Triple(s, Const(iri), o)
              case Right(p) => paths += PathOp(s, p, o)
            }
            if (!eatPunct(",")) objMore = false
          }
          if (!eatPunct(";")) subjMore = false
          else if (isPunct(".") || isPunct("}")) subjMore = false // trailing ';'
        }
        if (eatPunct(".")) {
          // another triple unless the block ends
          peek match {
            case Some(TVar(_)) | Some(TIri(_)) | Some(TPName(_, _)) | Some(TStr(_)) |
                Some(TNum(_, _)) => more = true
            case Some(TWord(w)) if w.equalsIgnoreCase("true") || w.equalsIgnoreCase("false") => more = true
            case _ => more = false
          }
        } else more = false
      }
      val ops: Seq[Op] =
        (if (triples.nonEmpty || paths.isEmpty) Seq(Bgp(triples.toSeq)) else Nil) ++ paths
      ops.reduce(Join(_, _))
    }

    private def parseTermPat(): TermPat = next() match {
      case TVar(v) => Var(v)
      case TIri(iri) => Const(Iris.resolve(iri))
      // blank nodes scan like variables (reference renames the column to
      // the label, calc_engine.rs:2996-3001) but are excluded from
      // SELECT * via the reserved prefix; `[]` mints a fresh one
      case TPName("_", l) => Var(BnodePrefix + l)
      case TPunct("[") =>
        expectPunct("]")
        bnodeCounter += 1
        Var(s"${BnodePrefix}g$bnodeCounter")
      case TPName(p, l) => Const(Iris.resolve(resolvePName(p, l)))
      case TStr(s) => Const(parseLiteralTail(s))
      case TNum(lex, isInt) => Const(numericLiteral(lex, isInt))
      case TPunct("-") => Const(signedNumber("-"))
      case TPunct("+") => Const(signedNumber("+"))
      case TWord(w) if w.equalsIgnoreCase("true") => Const(TermValue.bool(true))
      case TWord(w) if w.equalsIgnoreCase("false") => Const(TermValue.bool(false))
      case t => throw ParseException(s"expected term, got $t")
    }

    private def signedNumber(sign: String): TermValue = next() match {
      case TNum(lex, isInt) =>
        numericLiteral(if (sign == "-") "-" + lex else lex, isInt)
      case t => throw ParseException(s"expected number after '$sign', got $t")
    }

    private def numericLiteral(lex: String, isInt: Boolean): TermValue =
      if (isInt) TermValue.int(lex.toInt) else TermValue.float(lex.toFloat)

    private def parseLiteralTail(s: String): TermValue = {
      if (eatPunct("^^")) {
        val dt = next() match {
          case TIri(iri) => iri
          case TPName(p, l) => resolvePName(p, l)
          case t => throw ParseException(s"expected datatype IRI, got $t")
        }
        Iris.literal(s, Some(dt), None)
      } else peek match {
        case Some(TPunct("@")) => TermValue.str(s) // not tokenized; fallthrough
        case Some(TWord(w)) if w.startsWith("@") => next(); TermValue.mono(s, w.drop(1))
        case _ =>
          // language tag: '@' is not in puncts, check raw
          TermValue.str(s)
      }
    }

    private def parseIriTerm(): TermValue = next() match {
      case TIri(iri) => Iris.resolve(iri)
      case TPName(p, l) => Iris.resolve(resolvePName(p, l))
      case t => throw ParseException(s"expected IRI, got $t")
    }

    // -- property paths (SPARQL 1.1 §9) --------------------------------
    /** Left = a variable in predicate position; Right = a path. */
    private def parsePath(): Either[Var, Ppe] = peek match {
      case Some(TVar(v)) => next(); Left(Var(v))
      case _ => Right(parsePathAlternative())
    }

    private def parsePathAlternative(): Ppe = {
      var p = parsePathSequence()
      while (eatPunct("|")) p = PAlt(p, parsePathSequence())
      p
    }

    private def parsePathSequence(): Ppe = {
      var p = parsePathEltOrInverse()
      while (eatPunct("/")) p = PSeq(p, parsePathEltOrInverse())
      p
    }

    private def parsePathEltOrInverse(): Ppe =
      if (eatPunct("^")) PReverse(parsePathElt()) else parsePathElt()

    private def parsePathElt(): Ppe = {
      val prim = parsePathPrimary()
      if (eatPunct("*")) PZeroOrMore(prim)
      else if (eatPunct("+")) POneOrMore(prim)
      else if (eatPunct("?")) PZeroOrOne(prim)
      else prim
    }

    private def parsePathPrimary(): Ppe = peek match {
      case Some(TWord(w)) if w.equalsIgnoreCase("a") =>
        next(); PLink(Iris.resolve("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"))
      case Some(TPunct("!")) =>
        next()
        if (eatPunct("(")) {
          val ps = ArrayBuffer.empty[TermValue]
          ps += parseNegatedElt()
          while (eatPunct("|")) ps += parseNegatedElt()
          expectPunct(")")
          PNegated(ps.toSeq)
        } else PNegated(Seq(parseNegatedElt()))
      case Some(TPunct("(")) =>
        next(); val p = parsePathAlternative(); expectPunct(")"); p
      case _ => PLink(parseIriTerm())
    }

    private def parseNegatedElt(): TermValue = parseIriTerm()

    // -- VALUES ---------------------------------------------------------
    private def parseInlineValues(): Op = {
      val vars = ArrayBuffer.empty[Var]
      val rows = ArrayBuffer.empty[Seq[Option[TermValue]]]
      if (eatPunct("(")) {
        while (!eatPunct(")")) vars += (next() match {
          case TVar(v) => Var(v); case t => throw ParseException(s"$t")
        })
        expectPunct("{")
        while (!eatPunct("}")) {
          expectPunct("(")
          val row = ArrayBuffer.empty[Option[TermValue]]
          while (!eatPunct(")")) row += parseDataValue()
          rows += row.toSeq
        }
      } else {
        vars += (next() match { case TVar(v) => Var(v); case t => throw ParseException(s"$t") })
        expectPunct("{")
        while (!eatPunct("}")) rows += Seq(parseDataValue())
      }
      ValuesOp(vars.toSeq, rows.toSeq)
    }

    private def parseDataValue(): Option[TermValue] = {
      if (eatWord("UNDEF")) None
      else Some(next() match {
        case TIri(iri) => Iris.resolve(iri)
        case TPName(p, l) => Iris.resolve(resolvePName(p, l))
        case TStr(s) => parseLiteralTail(s)
        case TNum(lex, isInt) => numericLiteral(lex, isInt)
        case TPunct("-") => signedNumber("-")
        case TPunct("+") => signedNumber("+")
        case TWord(w) if w.equalsIgnoreCase("true") => TermValue.bool(true)
        case TWord(w) if w.equalsIgnoreCase("false") => TermValue.bool(false)
        case t => throw ParseException(s"expected data value, got $t")
      })
    }

    // -- expressions ----------------------------------------------------
    private def parseConstraint(): Expr = peek match {
      case Some(TPunct("(")) => parsePrimaryExpression()
      case _ => parsePrimaryExpression()
    }

    def parseExpression(): Expr = parseOr()

    private def parseOr(): Expr = {
      var e = parseAnd()
      while (eatPunct("||")) e = EOr(e, parseAnd())
      e
    }

    private def parseAnd(): Expr = {
      var e = parseRelational()
      while (eatPunct("&&")) e = EAnd(e, parseRelational())
      e
    }

    private def parseRelational(): Expr = {
      val e = parseAdditive()
      if (eatPunct("=")) EEqual(e, parseAdditive())
      else if (eatPunct("!=")) ENotEqual(e, parseAdditive())
      else if (eatPunct("<")) ELess(e, parseAdditive())
      else if (eatPunct(">")) EGreater(e, parseAdditive())
      else if (eatPunct("<=")) ELessEq(e, parseAdditive())
      else if (eatPunct(">=")) EGreaterEq(e, parseAdditive())
      else if (isWord("IN")) { next(); EIn(e, parseExpressionList(), negated = false) }
      else if (isWord("NOT")) { next(); expectWord("IN"); EIn(e, parseExpressionList(), negated = true) }
      else e
    }

    private def parseExpressionList(): Seq[Expr] = {
      expectPunct("(")
      val out = ArrayBuffer.empty[Expr]
      if (!eatPunct(")")) {
        out += parseExpression()
        while (eatPunct(",")) out += parseExpression()
        expectPunct(")")
      }
      out.toSeq
    }

    private def parseAdditive(): Expr = {
      var e = parseMultiplicative()
      var more = true
      while (more) {
        if (eatPunct("+")) e = EAdd(e, parseMultiplicative())
        else if (eatPunct("-")) e = ESubtract(e, parseMultiplicative())
        else more = false
      }
      e
    }

    private def parseMultiplicative(): Expr = {
      var e = parseUnary()
      var more = true
      while (more) {
        if (eatPunct("*")) e = EMultiply(e, parseUnary())
        else if (eatPunct("/")) e = EDivide(e, parseUnary())
        else more = false
      }
      e
    }

    private def parseUnary(): Expr =
      if (eatPunct("!")) ENot(parseUnary())
      else if (eatPunct("+")) EUnaryPlus(parseUnary())
      else if (eatPunct("-")) EUnaryMinus(parseUnary())
      else parsePrimaryExpression()

    private val builtinNames: Set[String] = Set(
      "STRLEN", "SUBSTR", "UCASE", "LCASE", "STRSTARTS", "STRENDS", "CONTAINS",
      "STRBEFORE", "STRAFTER", "ENCODE_FOR_URI", "CONCAT", "LANGMATCHES",
      "REGEX", "REPLACE", "ABS", "ROUND", "CEIL", "FLOOR", "RAND", "NOW",
      "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TIMEZONE", "TZ",
      "MD5", "SHA1", "SHA256", "SHA384", "SHA512", "ISIRI", "ISURI", "ISBLANK",
      "ISLITERAL", "ISNUMERIC", "STR", "LANG", "DATATYPE", "IRI", "URI",
      "BNODE", "STRDT", "STRLANG", "UUID", "STRUUID", "BOUND", "IF",
      "COALESCE", "SAMETERM", "EXISTS", "NOT",
      "COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT")

    private val funcMap: Map[String, Func.Value] = Map(
      "STRLEN" -> Func.StrLen, "SUBSTR" -> Func.SubStr, "UCASE" -> Func.UCase,
      "LCASE" -> Func.LCase, "STRSTARTS" -> Func.StrStarts, "STRENDS" -> Func.StrEnds,
      "CONTAINS" -> Func.Contains, "STRBEFORE" -> Func.StrBefore,
      "STRAFTER" -> Func.StrAfter, "ENCODE_FOR_URI" -> Func.EncodeForUri,
      "CONCAT" -> Func.Concat, "LANGMATCHES" -> Func.LangMatches,
      "REGEX" -> Func.Regex, "REPLACE" -> Func.Replace, "ABS" -> Func.Abs,
      "ROUND" -> Func.Round, "CEIL" -> Func.Ceil, "FLOOR" -> Func.Floor,
      "RAND" -> Func.Rand, "NOW" -> Func.Now, "YEAR" -> Func.Year,
      "MONTH" -> Func.Month, "DAY" -> Func.Day, "HOURS" -> Func.Hours,
      "MINUTES" -> Func.Minutes, "SECONDS" -> Func.Seconds,
      "TIMEZONE" -> Func.Timezone, "TZ" -> Func.Tz, "MD5" -> Func.Md5,
      "SHA1" -> Func.Sha1, "SHA256" -> Func.Sha256, "SHA384" -> Func.Sha384,
      "SHA512" -> Func.Sha512, "ISIRI" -> Func.IsIri, "ISURI" -> Func.IsIri,
      "ISBLANK" -> Func.IsBlank, "ISLITERAL" -> Func.IsLiteral,
      "ISNUMERIC" -> Func.IsNumeric, "STR" -> Func.Str, "LANG" -> Func.Lang,
      "DATATYPE" -> Func.Datatype, "IRI" -> Func.Iri, "URI" -> Func.Iri,
      "BNODE" -> Func.BNode, "STRDT" -> Func.StrDt, "STRLANG" -> Func.StrLang,
      "UUID" -> Func.Uuid, "STRUUID" -> Func.StrUuid)

    private def freshAggVar(): Var = { aggCounter += 1; Var(s"${InternalPrefix}agg$aggCounter") }

    private var groupKeyCounter = 0
    private def freshGroupVar(): Var = { groupKeyCounter += 1; Var(s"${InternalPrefix}gk$groupKeyCounter") }

    private def parsePrimaryExpression(): Expr = peek match {
      case Some(TPunct("(")) =>
        next(); val e = parseExpression(); expectPunct(")"); e
      case Some(TVar(v)) => next(); EVar(v)
      case Some(TStr(s)) => next(); EConst(parseLiteralTail(s))
      case Some(TNum(lex, isInt)) => next(); EConst(numericLiteral(lex, isInt))
      case Some(TIri(iri)) => next(); EConst(Iris.resolve(iri))
      case Some(TPName(p, l)) => next(); EConst(Iris.resolve(resolvePName(p, l)))
      case Some(TWord(w)) =>
        val up = w.toUpperCase
        up match {
          case "TRUE" => next(); EConst(TermValue.bool(true))
          case "FALSE" => next(); EConst(TermValue.bool(false))
          case "BOUND" =>
            next(); expectPunct("(")
            val v = next() match { case TVar(x) => Var(x); case t => throw ParseException(s"$t") }
            expectPunct(")"); EBound(v)
          case "IF" =>
            next(); expectPunct("(")
            val c = parseExpression(); expectPunct(",")
            val t = parseExpression(); expectPunct(",")
            val f = parseExpression(); expectPunct(")")
            EIf(c, t, f)
          case "COALESCE" =>
            next(); ECoalesce(parseExpressionList())
          case "SAMETERM" =>
            next(); expectPunct("(")
            val a = parseExpression(); expectPunct(",")
            val b = parseExpression(); expectPunct(")")
            ESameTerm(a, b)
          case "EXISTS" =>
            next(); EExists(parseGroupGraphPattern(), negated = false)
          case "NOT" =>
            next(); expectWord("EXISTS"); EExists(parseGroupGraphPattern(), negated = true)
          case "COUNT" | "SUM" | "AVG" | "MIN" | "MAX" | "SAMPLE" | "GROUP_CONCAT" =>
            next(); parseAggregate(up)
          case _ if funcMap.contains(up) =>
            next()
            val args = parseExpressionList()
            ECall(funcMap(up), args)
          case _ => throw ParseException(s"unexpected token $w in expression")
        }
      case t => throw ParseException(s"unexpected token $t in expression")
    }

    private def parseAggregate(name: String): Expr = {
      expectPunct("(")
      val distinct = eatWord("DISTINCT")
      val agg: Agg = name match {
        case "COUNT" =>
          if (eatPunct("*")) ACount(None, distinct)
          else ACount(Some(parseExpression()), distinct)
        case "SUM" => ASum(parseExpression(), distinct)
        case "AVG" => AAvg(parseExpression(), distinct)
        case "MIN" => AMin(parseExpression(), distinct)
        case "MAX" => AMax(parseExpression(), distinct)
        case "SAMPLE" => ASample(parseExpression(), distinct)
        case "GROUP_CONCAT" =>
          val e = parseExpression()
          var sep: Option[String] = None
          if (eatPunct(";")) {
            expectWord("SEPARATOR")
            expectPunct("=")
            sep = Some(next() match {
              case TStr(s) => s; case t => throw ParseException(s"$t")
            })
          }
          AGroupConcat(e, distinct, sep)
      }
      expectPunct(")")
      val v = freshAggVar()
      aggs += ((v, agg))
      EVar(v.name)
    }
  }
}
