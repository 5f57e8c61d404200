package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SPARQL value semantics over term-struct columns, as pure `Column`
  * expression trees (whole-stage-codegen-friendly; no row-level UDFs).
  *
  * Mirrors the reference's `DataValue` semantics:
  *   - effective boolean value    `src/data_types.rs:244-252`
  *   - node equality w/ promotion `src/calc_engine.rs:2938-2944`
  *   - type-family partial order  `src/data_types.rs:277-323`
  *   - f32 arithmetic             `src/calc_engine.rs:2946-2986`
  */
object TermOps {
  import Term.Kind

  private def k(t: Column) = t.getField("kind")
  private def num(t: Column) = t.getField("num")
  private def str(t: Column) = t.getField("str")

  def isNumeric(t: Column): Column = k(t).isin(Kind.Int, Kind.Float)

  /** Numeric payload as f32 (the reference does ALL arithmetic and
    * numeric comparison in f32, even int+int — `calc_engine.rs:2966-2986`).
    */
  def asF32(t: Column): Column = num(t).cast(FloatType)

  /** Unbound/Null-node-normalized identity key: SQL-null structs and
    * explicit Null terms share the Null node key (node id 0,
    * `storage_engine/mod.rs:242`), so Null joins/compares equal to Null.
    */
  def keyOrNull(t: Column): Column = coalesce(t.getField("key"), lit("0:"))

  /** Effective boolean value (`src/data_types.rs:244-252`). Returns a
    * nullable Boolean column; null = EBV type error, which filter sites
    * treat as false (`calc_engine.rs:215`).
    */
  def ebv(t: Column): Column =
    when(t.isNull, lit(null).cast(BooleanType))
      .when(k(t) === Kind.Bool, num(t) =!= 0d)
      .when(k(t) === Kind.Str, length(str(t)) > 0)
      .when(k(t) === Kind.Int, num(t) =!= 0d)
      .when(k(t) === Kind.Float, num(t) =!= 0d && !isnan(num(t)))
      .otherwise(lit(null).cast(BooleanType))

  /** Value equality with int/float promotion (`calc_engine.rs:2938-2944`);
    * everything else is node equality. Total (never null).
    */
  def termEq(a: Column, b: Column): Column =
    when(k(a) === Kind.Int && k(b) === Kind.Int, num(a) === num(b)) // exact i32
      .when(isNumeric(a) && isNumeric(b), asF32(a) === asF32(b))
      .otherwise(keyOrNull(a) === keyOrNull(b))

  /** Strict node equality (SameTerm; also the reference's `In` and
    * DISTINCT/join semantics — no numeric promotion).
    */
  def sameTerm(a: Column, b: Column): Column = keyOrNull(a) === keyOrNull(b)

  /** Partial-order comparison (`src/data_types.rs:277-323`): returns
    * -1/0/1, or null when the pair is incomparable (different type
    * families; same-family but non-orderable kinds like Url). Equal
    * nodes are always 0 (the reference checks `self == other` first).
    */
  def cmp(a: Column, b: Column): Column = {
    val nullInt = lit(null).cast(IntegerType)
    val sameKind = k(a) === k(b)
    val byNum = sign(num(a) - num(b)).cast(IntegerType)
    val byStr =
      when(str(a) < str(b), -1).when(str(a) > str(b), 1).otherwise(0)
    val monoCmp =
      when(a.getField("lang") === b.getField("lang"), byStr).otherwise(nullInt)
    // quantity: comparable only with equal unit (data_types.rs:344-359);
    // unit is the 2nd |-field of the key
    val unit = (c: Column) => split(c.getField("key"), "\\|").getItem(1)
    val quantCmp = when(unit(a) === unit(b), byNum).otherwise(nullInt)
    // time: comparable only with equal calendar (data_types.rs:410-439);
    // calendar is the last |-field of the key
    val cal = (c: Column) => element_at(split(c.getField("key"), "\\|"), -1)
    val timeCmp = when(cal(a) === cal(b), byNum).otherwise(nullInt)
    when(sameTerm(a, b), 0)
      .when(k(a) === Kind.Int && k(b) === Kind.Int, byNum) // exact i32 order
      .when(isNumeric(a) && isNumeric(b), sign(asF32(a) - asF32(b)).cast(IntegerType))
      .when(!sameKind, nullInt)
      .when(k(a).isin(Kind.Q, Kind.P, Kind.L, Kind.Pstmt), byNum)
      .when(k(a) === Kind.Str, byStr)
      .when(k(a).isin(Kind.Edge, Kind.NamedEdge), byStr)
      .when(k(a) === Kind.Mono, monoCmp)
      .when(k(a) === Kind.Quantity, quantCmp)
      .when(k(a) === Kind.Time, timeCmp)
      .otherwise(nullInt)
  }

  def lt(a: Column, b: Column): Column = cmp(a, b) < 0
  def le(a: Column, b: Column): Column = cmp(a, b) <= 0
  def gt(a: Column, b: Column): Column = cmp(a, b) > 0
  def ge(a: Column, b: Column): Column = cmp(a, b) >= 0

  // ---- constant-specialized comparisons -------------------------------
  //
  // When one comparison operand is a query literal, its kind is known at
  // compile time and all but one or two of the generic trees' branches
  // are statically dead. Catalyst does fold them away eventually
  // (GetStructField-of-literal-struct + constant folding), but the full
  // tree is built, analyzed, and carried on the driver first — on
  // FILTER-heavy queries that analysis is the dominant per-query cost.
  // These variants emit only the live branches. Semantics are pinned
  // identical to the generic trees by TermOpsSpec/ExpressionsSpec and
  // the sp gate.

  /** [[termEq]] against a compile-time constant. */
  def termEqConst(a: Column, b: TermValue): Column = {
    val bNum = b.num.map(lit(_)).getOrElse(lit(null).cast(DoubleType))
    b.kind match {
      case Kind.Int =>
        when(k(a) === Kind.Int, num(a) === bNum)
          .when(k(a) === Kind.Float, asF32(a) === bNum.cast(FloatType))
          .otherwise(keyOrNull(a) === lit(b.key))
      case Kind.Float =>
        when(isNumeric(a), asF32(a) === bNum.cast(FloatType))
          .otherwise(keyOrNull(a) === lit(b.key))
      case _ => // non-numeric constant: promotion impossible → node eq
        keyOrNull(a) === lit(b.key)
    }
  }

  /** [[sameTerm]] against a compile-time constant (keys are never null
    * for literals, so the coalesce collapses).
    */
  def sameTermConst(a: Column, b: TermValue): Column =
    keyOrNull(a) === lit(b.key)

  /** [[cmp]] against a compile-time constant right operand. For a
    * constant LEFT operand use `-cmpConst(b, const)` — the partial
    * order is antisymmetric and negation propagates the incomparable
    * null.
    */
  def cmpConst(a: Column, b: TermValue): Column = {
    val nullInt = lit(null).cast(IntegerType)
    val bNum = b.num.map(lit(_)).getOrElse(lit(null).cast(DoubleType))
    val bStr = b.str.map(lit(_)).getOrElse(lit(null).cast(StringType))
    val byNum = sign(num(a) - bNum).cast(IntegerType)
    val byF32 = sign((asF32(a) - bNum.cast(FloatType)).cast(DoubleType)).cast(IntegerType)
    val byStr = when(str(a) < bStr, -1).when(str(a) > bStr, 1).otherwise(0)
    val base = when(keyOrNull(a) === lit(b.key), 0)
    val withKind = b.kind match {
      case Kind.Int =>
        base.when(k(a) === Kind.Int, byNum).when(k(a) === Kind.Float, byF32)
      case Kind.Float =>
        base.when(isNumeric(a), byF32)
      case Kind.Q | Kind.P | Kind.L | Kind.Pstmt =>
        base.when(k(a) === b.kind, byNum)
      case Kind.Str =>
        base.when(k(a) === Kind.Str, byStr)
      case Kind.Edge | Kind.NamedEdge =>
        base.when(k(a) === b.kind, byStr)
      case Kind.Mono =>
        val sameLang = b.lang.map(l => a.getField("lang") === lit(l))
          .getOrElse(lit(null).cast(BooleanType))
        base.when(k(a) === Kind.Mono, when(sameLang, byStr).otherwise(nullInt))
      case Kind.Quantity =>
        val parts = b.key.split("\\|")
        val bUnit = if (parts.length > 1) lit(parts(1)) else lit(null).cast(StringType)
        val unitA = split(a.getField("key"), "\\|").getItem(1)
        base.when(k(a) === Kind.Quantity, when(unitA === bUnit, byNum).otherwise(nullInt))
      case Kind.Time =>
        val bCal = lit(b.key.split("\\|").last)
        val calA = element_at(split(a.getField("key"), "\\|"), -1)
        base.when(k(a) === Kind.Time, when(calA === bCal, byNum).otherwise(nullInt))
      case _ => base // no ordered branch for this kind (Bool, Url, …)
    }
    withKind.otherwise(nullInt)
  }

  /** Boolean term constructors (results of logical expressions). */
  def boolTerm(b: Column): Column =
    when(b.isNull, Term.nullTerm).otherwise(
      Term.struct_(
        lit(Kind.Bool),
        when(b, 1d).otherwise(0d),
        when(b, "true").otherwise("false"),
        lit(null).cast(StringType),
        when(b, "b:true").otherwise("b:false")))

  /** Float term from an f32-valued column (arithmetic results). */
  def floatTerm(f32: Column): Column = {
    val d = f32.cast(FloatType).cast(DoubleType)
    when(d.isNull, Term.nullTerm).otherwise(
      Term.struct_(lit(Kind.Float), d, formatFloatCol(f32.cast(FloatType)),
        lit(null).cast(StringType), concat(lit("f:"), d.cast(StringType))))
  }

  def intTerm(i: Column): Column = {
    val v = i.cast(IntegerType)
    when(v.isNull, Term.nullTerm).otherwise(
      Term.struct_(lit(Kind.Int), v.cast(DoubleType), v.cast(StringType),
        lit(null).cast(StringType), concat(lit("i:"), v.cast(StringType))))
  }

  def strTerm(s: Column): Column =
    when(s.isNull, Term.nullTerm).otherwise(
      Term.struct_(lit(Kind.Str), lit(null).cast(DoubleType), s,
        lit(null).cast(StringType), concat(lit("s:"), s)))

  /** Rust `{}`-style f32 formatting as a Column (matches
    * [[Render.formatFloat]]): whole floats print without ".0".
    */
  def formatFloatCol(f: Column): Column = {
    val d = f.cast(DoubleType)
    when(isnan(d), lit("NaN"))
      .when(d === Double.PositiveInfinity, lit("inf"))
      .when(d === Double.NegativeInfinity, lit("-inf"))
      .when(d === floor(d) && abs(d) < 1e16, d.cast(LongType).cast(StringType))
      .otherwise(f.cast(StringType))
  }

  /** f32 arithmetic (`calc_engine.rs:2946-2986`): non-numeric operand →
    * Null; result is always a float term (even int∘int). `op` builds the
    * f32 result from the two f32 operands.
    */
  def arith(a: Column, b: Column)(op: (Column, Column) => Column): Column =
    when(isNumeric(a) && isNumeric(b), floatTerm(op(asF32(a), asF32(b))))
      .otherwise(Term.nullTerm)

  /** Total sort key for ORDER BY / MIN / MAX. Within a type family this
    * matches the reference's partial order; across families it imposes a
    * stable bucket order (the reference's ORDER BY is a no-op —
    * `calc_engine.rs:224-230` — so cross-family order is unobservable;
    * see CONFORMANCE notes).
    */
  def sortKey(t: Column): Column = {
    val famRank =
      when(t.isNull || k(t) === Kind.Null, 99)
        .when(k(t) === Kind.Q, 1)
        .when(k(t) === Kind.P, 2)
        .when(k(t) === Kind.Pstmt, 3)
        .when(k(t) === Kind.L, 4)
        .when(k(t).isin(Kind.Edge, Kind.NamedEdge), 5)
        .when(isNumeric(t), 6)
        .when(k(t) === Kind.Str, 7)
        .when(k(t) === Kind.Mono, 8)
        .when(k(t) === Kind.Time, 9)
        .when(k(t) === Kind.Quantity, 10)
        .when(k(t) === Kind.Bool, 11)
        .otherwise(50)
    struct(
      famRank.as("fam"),
      coalesce(num(t), lit(0d)).as("num"),
      coalesce(str(t), lit("")).as("str"),
      coalesce(t.getField("key"), lit("")).as("key"))
  }
}
