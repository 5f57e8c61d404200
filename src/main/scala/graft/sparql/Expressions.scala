package graft.sparql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Render, Term, TermOps}
import Ast._

/** Expression → `Column` compiler (reference `calculate_expression` +
  * `calculate_function_call`, `src/calc_engine.rs:993-2936`).
  *
  * Every expression evaluates to a term-struct Column; type errors
  * produce the Null term (SQL null struct), which EBV treats as false at
  * filter sites. Pure Column trees — whole-stage codegen applies; no
  * row-level UDFs anywhere.
  */
object Expressions {

  import Term.Kind
  import TermOps._

  /** `spark.graft.functions.spec=true` implements BNODE/STRDT/TIMEZONE
    * per spec (documented subsets at each site) instead of the
    * reference's `todo!` Null (calc_engine.rs:1319-1331,2553-2558).
    * Read at plan-construction time, like the other spec flags
    * (`spark.graft.optional.specFilter`, `spark.graft.lateral.spec`).
    */
  private def specFns: Boolean =
    TranslateFlags.get(org.apache.spark.sql.SparkSession.active,
      TranslateFlags.FunctionsSpec).toBoolean

  private def kindOf(t: Column) = t.getField("kind")
  private def strOf(t: Column) = t.getField("str")
  private def numOf(t: Column) = t.getField("num")
  private def isStr(t: Column) = kindOf(t) === Kind.Str
  private def nul = Term.nullTerm

  def eval(e: Expr, resolve: String => Option[Column]): Column = {
    def go(e: Expr): Column = e match {
      case EConst(v) => v.toColumn
      case EVar(name) => resolve(name).getOrElse(nul)

      // Boolean-only logic, no three-valued shortcuts
      // (calc_engine.rs:1011-1032): non-Boolean operand → Null
      case EOr(l, r) => binBool(go(l), go(r))(_ || _)
      case EAnd(l, r) => binBool(go(l), go(r))(_ && _)

      case EEqual(l, r) => boolTerm(eqOf(l, r))
      case ENotEqual(l, r) => boolTerm(!eqOf(l, r))
      case ESameTerm(l, r) => boolTerm(stOf(l, r))
      case EGreater(l, r) => cmpTerm(cmpOf(l, r))(_ > 0)
      case EGreaterEq(l, r) => cmpTerm(cmpOf(l, r))(_ >= 0)
      case ELess(l, r) => cmpTerm(cmpOf(l, r))(_ < 0)
      case ELessEq(l, r) => cmpTerm(cmpOf(l, r))(_ <= 0)

      // IN uses strict node equality (reference: Vec::contains over
      // DataValue PartialEq, calc_engine.rs:1070-1082 — no promotion)
      case EIn(x, list, neg) =>
        val xc = go(x)
        val hit =
          if (list.isEmpty) lit(false)
          else list.map {
            case EConst(v) => sameTermConst(xc, v)
            case i => sameTerm(xc, go(i))
          }.reduce(_ || _)
        boolTerm(if (neg) !hit else hit)

      case EAdd(l, r) => arith(go(l), go(r))(_ + _)
      case ESubtract(l, r) => arith(go(l), go(r))(_ - _)
      case EMultiply(l, r) => arith(go(l), go(r))(_ * _)
      case EDivide(l, r) => arith(go(l), go(r))(_ / _)
      // reference quirk: unary plus is abs() (calc_engine.rs:2979-2981)
      case EUnaryPlus(x) => unArith(go(x))(abs)
      case EUnaryMinus(x) => unArith(go(x))(c => -c)

      case ENot(x) =>
        val c = go(x)
        when(kindOf(c) === Kind.Bool, boolTerm(numOf(c) === 0d)).otherwise(nul)

      case EExists(_, _) =>
        throw new UnsupportedOperationException(
          "EXISTS is only supported as a FILTER conjunct (translated to semi/anti join)")

      case EBound(v) =>
        resolve(v.name) match {
          case Some(c) => boolTerm(c.isNotNull && kindOf(c) =!= Kind.Null)
          case None => boolTerm(lit(false))
        }

      case EIf(c, t, f) =>
        val cc = go(c)
        when(kindOf(cc) === Kind.Bool,
          when(numOf(cc) =!= 0d, go(t)).otherwise(go(f))).otherwise(nul)

      case ECoalesce(args) =>
        val cols = args.map(go).map(c =>
          when(c.isNotNull && kindOf(c) =!= Kind.Null, c))
        coalesce(cols: _*)

      case ECall(fn, args) => call(fn, args.map(go), args)
    }
    // constant-specialized comparison dispatch (TermOps *Const): when
    // one side is a query literal only the branches live for its kind
    // are compiled — identical semantics, ~5× smaller trees
    def eqOf(l: Expr, r: Expr): Column = (l, r) match {
      case (_, EConst(v)) => termEqConst(go(l), v)
      case (EConst(v), _) => termEqConst(go(r), v)
      case _ => termEq(go(l), go(r))
    }
    def stOf(l: Expr, r: Expr): Column = (l, r) match {
      case (_, EConst(v)) => sameTermConst(go(l), v)
      case (EConst(v), _) => sameTermConst(go(r), v)
      case _ => sameTerm(go(l), go(r))
    }
    def cmpOf(l: Expr, r: Expr): Column = (l, r) match {
      case (_, EConst(v)) => cmpConst(go(l), v)
      case (EConst(v), _) => -cmpConst(go(r), v) // antisymmetric; null propagates
      case _ => cmp(go(l), go(r))
    }
    go(e)
  }

  private def binBool(a: Column, b: Column)(op: (Column, Column) => Column): Column =
    when(kindOf(a) === Kind.Bool && kindOf(b) === Kind.Bool,
      boolTerm(op(numOf(a) =!= 0d, numOf(b) =!= 0d))).otherwise(nul)

  private def cmpTerm(c: Column)(test: Column => Column): Column =
    when(c.isNull, nul).otherwise(boolTerm(test(c)))

  private def unArith(a: Column)(op: Column => Column): Column =
    when(isNumeric(a), floatTerm(op(asF32(a)))).otherwise(nul)

  // ------------------------------------------------------------ functions

  /** `calculate_function_call` (`calc_engine.rs:1186-2936`). `raw` gives
    * access to the original AST for functions that need literal args
    * (regex flags).
    */
  private def call(fn: Func.Value, as: Seq[Column], raw: Seq[Expr]): Column = {
    def a0 = as(0); def a1 = as(1)

    fn match {
      // ---- RDF term functions ---------------------------------------
      case Func.IsIri =>
        // spec mode can mint blank nodes as `bn:`-keyed Edge terms, and
        // SPARQL term categories are disjoint — a blank node is never an
        // IRI. Parity default: Edge terms are store edge ids, IRI-like.
        val iriKind =
          kindOf(a0).isin(Kind.Q, Kind.P, Kind.Pstmt, Kind.L, Kind.Edge, Kind.NamedEdge)
        boolTerm(
          if (!specFns) iriKind
          else iriKind && !a0.getField("key").startsWith("bn:"))
      case Func.IsBlank =>
        // parity: no bnodes stored (calc_engine.rs:1204-1208) → false.
        // spec mode can MINT bnodes (BNODE(), CONSTRUCT templates — Edge
        // terms keyed "bn:…"), so there isBlank recognizes them.
        if (!specFns) boolTerm(lit(false))
        else boolTerm(kindOf(a0) === Kind.Edge &&
          a0.getField("key").startsWith("bn:"))
      case Func.IsLiteral =>
        boolTerm(a0.isNotNull &&
          !kindOf(a0).isin(Kind.Q, Kind.P, Kind.Pstmt, Kind.L, Kind.Edge, Kind.NamedEdge, Kind.Null))
      case Func.IsNumeric => boolTerm(isNumeric(a0))
      case Func.Str =>
        // deviation (CONFORMANCE): reference Str returns the *datatype
        // IRI* (calc_engine.rs:1233-1252, a bug vs SPARQL); we return the
        // lexical form per spec.
        when(a0.isNull || kindOf(a0) === Kind.Null, nul).otherwise(strTerm(Render.lex(a0)))
      case Func.Lang =>
        strTerm(when(kindOf(a0) === Kind.Mono, a0.getField("lang")).otherwise(lit("")))
      case Func.Datatype => // reference todo!; implemented per spec subset
        val dt = Render.datatype(a0)
        when(dt.isNull, nul).otherwise(strTerm(dt))
      case Func.Iri =>
        // reference returns Null (calc_engine.rs:1277-1318); we resolve
        // known Wikidata IRI shapes from string terms
        when(kindOf(a0).isin(Kind.Q, Kind.P, Kind.Pstmt, Kind.L, Kind.NamedEdge), a0)
          .when(isStr(a0), iriFromString(strOf(a0)))
          .otherwise(nul)
      case Func.BNode => // reference todo! (calc_engine.rs:1319-1331)
        // spec mode: a fresh blank node per solution (SPARQL §17.4.1.9).
        // Each call site compiles independently, so a 1-arg label is a
        // readable prefix only — within-solution label stability has no
        // observable here. One NATIVE node ([[graft.functions.BNodeTerm]])
        // fills str and key from a single minted value: a shared uuid()
        // Column would be re-seeded per tree occurrence (nondeterministic
        // expressions are excluded from subexpression elimination), making
        // the lexical form disagree with the identity key. Parity
        // default: Null, like the reference.
        if (!specFns) nul
        else {
          val prefix =
            if (as.isEmpty) lit(null).cast(StringType)
            else when(isStr(a0), strOf(a0)).otherwise(lit(null).cast(StringType))
          call_function(graft.functions.BNodeTerm.name, prefix)
        }
      case Func.StrDt => // reference todo! (calc_engine.rs:1319-1331)
        // spec mode: construct a typed literal for the datatypes the
        // term model represents (integer family → Int term, float
        // family → Float, boolean → Bool, string → Str, dateTime →
        // Time with the store's conventions: lexical datetime fields +
        // the offset as the separate minute field, Gregorian, and
        // SECOND precision (14) in the key — the precision the dump
        // parser stores for a second-resolution time, so a minted term
        // key-equals (sameTerm/join/DISTINCT) a store-parsed time of
        // the same instant+offset); anything else stays Null, as does
        // an unparseable lexical form. Parity default: Null.
        if (!specFns) nul
        else {
          val xsd = "http://www.w3.org/2001/XMLSchema#"
          val dt = strOf(a1) // unknown IRIs resolve to string terms
          val lex = strOf(a0)
          // rlike guards, not bare casts: ANSI mode (Spark 4 default)
          // throws on a malformed cast, and SPARQL wants an eval error
          // (→ Null term) instead
          val intOk = lex.rlike("^[+-]?\\d{1,9}$") // fits Int, no ANSI overflow
          val fltOk = lex.rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$")
          // ISO dateTime, Z or ±HH:MM offset; fields taken as written
          // (the key layout WikidataParser.snakValue writes)
          val dtRe = "^(\\d{4})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):(\\d{2})(Z|[+-]\\d{2}:\\d{2})$"
          def dtG(i: Int) = regexp_extract(lex, dtRe, i)
          val tzTok = dtG(7)
          val tzMin = when(tzTok === "Z", lit(0)).otherwise(
            when(substring(tzTok, 1, 1) === "-", lit(-1)).otherwise(lit(1)) *
              (substring(tzTok, 2, 2).cast(IntegerType) * 60 +
                substring(tzTok, 5, 2).cast(IntegerType)))
          val dtNum = dtG(1).cast(DoubleType) * 1e10 + dtG(2).cast(DoubleType) * 1e8 +
            dtG(3).cast(DoubleType) * 1e6 + dtG(4).cast(DoubleType) * 1e4 +
            dtG(5).cast(DoubleType) * 1e2 + dtG(6).cast(DoubleType)
          val dtIso = concat(dtG(1), lit("-"), dtG(2), lit("-"), dtG(3), lit("T"),
            dtG(4), lit(":"), dtG(5), lit(":"), dtG(6), lit("Z"))
          when(!isStr(a0) || !isStr(a1), nul)
            .when(dt.isin(s"${xsd}integer", s"${xsd}int", s"${xsd}long"),
              when(intOk, intTerm(lex.cast(IntegerType))).otherwise(nul))
            .when(dt.isin(s"${xsd}float", s"${xsd}double", s"${xsd}decimal"),
              when(fltOk, floatTerm(lex.cast(FloatType))).otherwise(nul))
            .when(dt === s"${xsd}boolean",
              when(lex.isin("true", "false"), boolTerm(lex === "true")).otherwise(nul))
            .when(dt === s"${xsd}string", strTerm(lex))
            .when(dt === s"${xsd}dateTime",
              when(lex.rlike(dtRe), Term.struct_(lit(Kind.Time), dtNum, dtIso,
                lit(null).cast(StringType),
                concat(lit("t:"), dtIso, lit("|14|0|0|"),
                  tzMin.cast(StringType), lit("|G")))).otherwise(nul))
            .otherwise(nul)
        }
      case Func.StrLang =>
        when(isStr(a0) && isStr(a1),
          Term.struct_(lit(Kind.Mono), lit(null).cast(DoubleType), strOf(a0), strOf(a1),
            concat(lit("mo:"), strOf(a1), lit(":"), strOf(a0)))).otherwise(nul)
      case Func.Uuid | Func.StrUuid => strTerm(uuid())

      // ---- string functions -----------------------------------------
      case Func.StrLen => // BYTE length, not characters (calc_engine.rs:1384-1399)
        when(isStr(a0), intTerm(octet_length(strOf(a0)))).otherwise(nul)
      case Func.SubStr =>
        val start = asF32(a1).cast(IntegerType)
        val out =
          if (as.length >= 3) substr(strOf(a0), start, asF32(as(2)).cast(IntegerType))
          else substr(strOf(a0), start, lit(Int.MaxValue))
        when(isStr(a0) && isNumeric(a1), strTerm(out)).otherwise(nul)
      case Func.UCase => // ASCII-only case mapping (calc_engine.rs:1484-1517)
        when(isStr(a0), strTerm(translate(strOf(a0),
          "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ"))).otherwise(nul)
      case Func.LCase =>
        when(isStr(a0), strTerm(translate(strOf(a0),
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"))).otherwise(nul)
      case Func.StrStarts =>
        when(isStr(a0) && isStr(a1), boolTerm(strOf(a0).startsWith(strOf(a1)))).otherwise(nul)
      case Func.StrEnds =>
        when(isStr(a0) && isStr(a1), boolTerm(strOf(a0).endsWith(strOf(a1)))).otherwise(nul)
      case Func.Contains =>
        when(isStr(a0) && isStr(a1), boolTerm(strOf(a0).contains(strOf(a1)))).otherwise(nul)
      case Func.StrBefore => // not-found → "" (calc_engine.rs:1668-1795)
        val pos = call_function("instr", strOf(a0), strOf(a1))
        val out = when(length(strOf(a1)) === 0, lit(""))
          .when(pos > 0, substr(strOf(a0), lit(1), pos - 1)).otherwise(lit(""))
        when(isStr(a0) && isStr(a1), strTerm(out)).otherwise(nul)
      case Func.StrAfter =>
        val pos = call_function("instr", strOf(a0), strOf(a1))
        val out = when(length(strOf(a1)) === 0, strOf(a0))
          .when(pos > 0, substr(strOf(a0), pos + length(strOf(a1)), lit(Int.MaxValue)))
          .otherwise(lit(""))
        when(isStr(a0) && isStr(a1), strTerm(out)).otherwise(nul)
      case Func.EncodeForUri =>
        // hex-escape every byte except ASCII letters and digits/unreserved
        // (reference escapes all but ASCII letters, calc_engine.rs:1796-1860;
        // we keep unreserved marks per RFC 3986 — CONFORMANCE). url_encode
        // is form-encoding (space → '+'); SPARQL requires %20.
        when(isStr(a0), strTerm(regexp_replace(url_encode(strOf(a0)), "\\+", "%20")))
          .otherwise(nul)
      case Func.Concat => // strings-only else Null (calc_engine.rs:1861-1886)
        when(as.map(isStr).reduce(_ && _), strTerm(concat(as.map(strOf): _*))).otherwise(nul)
      case Func.LangMatches =>
        // reference: lowercase substring containment, not RFC 4647
        // (calc_engine.rs:1887-1933); "*" matches any non-empty tag
        val tag = lower(strOf(a0)); val range = lower(strOf(a1))
        val out = when(strOf(a1) === "*", length(strOf(a0)) > 0)
          .otherwise(tag.contains(range))
        when(isStr(a0) && isStr(a1), boolTerm(out)).otherwise(nul)
      case Func.Regex =>
        val pat = regexPattern(as, raw)
        when(isStr(a0) && pat.isNotNull, boolTerm(regexp_like(strOf(a0), pat))).otherwise(nul)
      case Func.Replace =>
        val pat = regexPatternAt(as, raw, flagsIdx = 3)
        when(isStr(a0) && isStr(a1) && isStr(as(2)) && pat.isNotNull,
          strTerm(regexp_replace(strOf(a0), pat, strOf(as(2))))).otherwise(nul)

      // ---- numeric functions ----------------------------------------
      case Func.Abs => // type-preserving (calc_engine.rs:2314-2334)
        when(kindOf(a0) === Kind.Int, intTerm(abs(numOf(a0)).cast(IntegerType)))
          .when(kindOf(a0) === Kind.Float, floatTerm(abs(asF32(a0))))
          .otherwise(nul)
      case Func.Round => // half-away-from-zero, returns float (calc_engine.rs:2335-2380)
        when(isNumeric(a0), floatTerm(round(asF32(a0).cast(DoubleType), 0).cast(FloatType)))
          .otherwise(nul)
      case Func.Ceil =>
        // deviation (CONFORMANCE): reference ceil(2.0)→3.0 bug
        // (calc_engine.rs:2381-2411); we use correct ceil
        when(isNumeric(a0), floatTerm(ceil(asF32(a0).cast(DoubleType)).cast(FloatType))).otherwise(nul)
      case Func.Floor =>
        when(isNumeric(a0), floatTerm(floor(asF32(a0).cast(DoubleType)).cast(FloatType))).otherwise(nul)
      case Func.Rand => floatTerm(rand().cast(FloatType))

      // ---- date/time functions over the time term -------------------
      // num packs (y, mo, d, h, mi, s) lexicographically; see ingest
      case Func.Now => // reference todo!; engine extension
        strTerm(date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      case Func.Year => timeField(a0, 1e10, 100000000000L)
      case Func.Month => timeField2(a0, 1e8, 100)
      case Func.Day => timeField2(a0, 1e6, 100)
      case Func.Hours => timeField2(a0, 1e4, 100)
      case Func.Minutes => timeField2(a0, 1e2, 100)
      case Func.Seconds => timeField2(a0, 1d, 100)
      case Func.Timezone => // reference todo! (calc_engine.rs:2553-2558)
        // spec mode: the stored minute offset (time-key field 5) as the
        // xsd:dayTimeDuration lexical form ("PT0S", "-PT5H", "PT1H30M");
        // rendered as a plain string term — the term model has no
        // duration kind, so the datatype is carried by documentation,
        // not the term. Parity default: Null.
        if (!specFns) nul
        else {
          val tz = split(a0.getField("key"), "\\|").getItem(4).cast(IntegerType)
          val aTz = abs(tz)
          val h = (aTz / 60).cast(IntegerType)
          val m = aTz % 60
          val dur = concat(
            when(tz < 0, lit("-")).otherwise(lit("")), lit("PT"),
            when(tz === 0, lit("0S")).otherwise(concat(
              when(h > 0, concat(h.cast(StringType), lit("H"))).otherwise(lit("")),
              when(m > 0, concat(m.cast(StringType), lit("M"))).otherwise(lit("")))))
          when(kindOf(a0) === Kind.Time && tz.isNotNull, strTerm(dur)).otherwise(nul)
        }
      case Func.Tz => // raw minute-offset string (calc_engine.rs:2559-2576)
        when(kindOf(a0) === Kind.Time,
          strTerm(split(a0.getField("key"), "\\|").getItem(4))).otherwise(nul)

      // ---- hash functions (hex over strings, calc_engine.rs:2578-2684)
      case Func.Md5 => hashFn(a0, md5)
      case Func.Sha1 => hashFn(a0, sha1)
      case Func.Sha256 => hashFn(a0, c => sha2(c, 256))
      case Func.Sha384 => hashFn(a0, c => sha2(c, 384))
      case Func.Sha512 => hashFn(a0, c => sha2(c, 512))

      case Func.GetLabel | Func.GetDescription | Func.GetAlias =>
        throw new UnsupportedOperationException(
          "label-service functions are lowered to joins by LabelService (SURVEY §4.1)")
    }
  }

  private def hashFn(a: Column, f: Column => Column): Column =
    when(isStr(a), strTerm(f(strOf(a).cast(BinaryType)))).otherwise(nul)

  /** YEAR(): integer division of the packed time key (works for negative
    * years because the remainder is always non-negative).
    */
  private def timeField(t: Column, div: Double, mod: Long): Column =
    when(kindOf(t) === Kind.Time, intTerm(floor(numOf(t) / div).cast(LongType).cast(IntegerType)))
      .otherwise(nul)

  /** Month/day/…: floor-divide then mod 100. */
  private def timeField2(t: Column, div: Double, mod: Long): Column =
    when(kindOf(t) === Kind.Time,
      intTerm(pmod(floor(numOf(t) / div).cast(LongType), lit(100)).cast(IntegerType)))
      .otherwise(nul)

  /** Runtime IRI → term for the IRI()/URI() function (subset: wd shapes). */
  private def iriFromString(s: Column): Column = {
    val q = regexp_extract(s, "^http://www\\.wikidata\\.org/entity/Q(\\d+)", 1)
    val pd = regexp_extract(s, "^http://www\\.wikidata\\.org/prop/direct/P(\\d+)", 1)
    when(q =!= "", Term.struct_(lit(Kind.Q), q.cast(DoubleType), lit(null).cast(StringType),
      lit(null).cast(StringType), concat(lit("Q:"), q)))
      .when(pd =!= "", Term.struct_(lit(Kind.P), pd.cast(DoubleType), lit(null).cast(StringType),
        lit(null).cast(StringType), concat(lit("P:"), pd)))
      .otherwise(strTerm(s))
  }

  /** Build a Java-regex pattern with SPARQL flags folded in as inline
    * `(?…)` groups (reference uses Rust's identical syntax,
    * calc_engine.rs:1934-2069). Literal `q` flag quotes the pattern.
    */
  private def regexPattern(as: Seq[Column], raw: Seq[Expr]): Column =
    regexPatternAt(as, raw, flagsIdx = 2)

  private def regexPatternAt(as: Seq[Column], raw: Seq[Expr], flagsIdx: Int): Column = {
    val patCol = as(1).getField("str")
    if (as.length <= flagsIdx) return patCol
    raw(flagsIdx) match {
      case EConst(v) if v.kind == Term.Kind.Str =>
        val flags = v.str.getOrElse("")
        val inline = flags.filter("ismx".contains(_))
        val quoted = flags.contains('q')
        val base = if (quoted) concat(lit("\\Q"), patCol, lit("\\E")) else patCol
        if (inline.nonEmpty) concat(lit(s"(?$inline)"), base) else base
      case _ =>
        // runtime flags: support i/s/m/x composition
        val f = regexp_replace(as(flagsIdx).getField("str"), "[^ismx]", "")
        when(length(f) > 0, concat(lit("(?"), f, lit(")"), patCol)).otherwise(patCol)
    }
  }
}
