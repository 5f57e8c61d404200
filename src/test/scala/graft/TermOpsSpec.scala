package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.{Term, TermOps, TermValue}
import graft.model.Term.Kind

/** Property tests for the SPARQL value semantics in [[TermOps]]
  * against a plain-Scala model of the reference's `DataValue` rules:
  * effective boolean value (`data_types.rs:244-252`), equality with
  * int/float promotion (`calc_engine.rs:2938-2944`) and the
  * type-family partial order (`data_types.rs:277-323`).
  *
  * ScalaCheck generates the term pairs (fixed seed); all pairs are
  * evaluated through the real Column expressions in ONE Spark pass and
  * compared row-by-row to the model.
  */
class TermOpsSpec extends SparkTestBase {

  // ---- generators -----------------------------------------------------

  private val genTerm: Gen[TermValue] = Gen.oneOf(
    Gen.chooseNum(-100, 100).map(TermValue.int),
    Gen.chooseNum(-100.0f, 100.0f).map(TermValue.float),
    Gen.oneOf(true, false).map(TermValue.bool),
    Gen.oneOf("", "a", "b", "abc", "Belgium", "zz").map(TermValue.str),
    Gen.chooseNum(1L, 50L).map(TermValue.entityQ),
    Gen.chooseNum(1L, 50L).map(TermValue.propDirect),
    for {
      t <- Gen.oneOf("hi", "salut", "hallo", "")
      l <- Gen.oneOf("en", "fr", "de")
    } yield TermValue.mono(t, l),
    Gen.const(TermValue.nullValue))

  private val pairs: List[(TermValue, TermValue)] =
    Gen.listOfN(400, Gen.zip(genTerm, genTerm))
      .pureApply(Gen.Parameters.default, Seed(42L))

  // ---- the model ------------------------------------------------------

  private def ebvModel(t: TermValue): Option[Boolean] = t.kind match {
    case Kind.Bool => Some(t.num.get != 0d)
    case Kind.Str => Some(t.str.get.nonEmpty)
    case Kind.Int => Some(t.num.get != 0d)
    case Kind.Float => Some(t.num.get != 0d && !t.num.get.isNaN)
    case _ => None // EBV type error → filter-false
  }

  private def numeric(t: TermValue) = t.kind == Kind.Int || t.kind == Kind.Float

  private def eqModel(a: TermValue, b: TermValue): Boolean =
    if (a.kind == Kind.Int && b.kind == Kind.Int) a.num.get == b.num.get
    else if (numeric(a) && numeric(b)) a.num.get.toFloat == b.num.get.toFloat
    else a.key == b.key

  private def cmpModel(a: TermValue, b: TermValue): Option[Int] = {
    if (a.key == b.key) Some(0)
    else if (a.kind == Kind.Int && b.kind == Kind.Int)
      Some(a.num.get.compare(b.num.get))
    else if (numeric(a) && numeric(b))
      Some(a.num.get.toFloat.compare(b.num.get.toFloat).sign)
    else if (a.kind != b.kind) None
    else a.kind match {
      case Kind.Q | Kind.P | Kind.L | Kind.Pstmt => Some(a.num.get.compare(b.num.get).sign)
      case Kind.Str => Some(a.str.get.compare(b.str.get).sign)
      case Kind.Mono =>
        if (a.lang == b.lang) Some(a.str.get.compare(b.str.get).sign) else None
      case _ => None
    }
  }

  // ---- one-pass evaluation --------------------------------------------

  private lazy val evaluated: Array[Row] = {
    import scala.jdk.CollectionConverters._
    val fields = Seq("ak" -> StringType, "an" -> DoubleType, "as" -> StringType,
      "al" -> StringType, "akey" -> StringType, "bk" -> StringType, "bn" -> DoubleType,
      "bs" -> StringType, "bl" -> StringType, "bkey" -> StringType)
    val schema = StructType(fields.map { case (n, t) => StructField(n, t) })
    val rows: java.util.List[Row] = pairs.map { case (a, b) =>
      Row(a.kind, a.num.map(Double.box).orNull, a.str.orNull, a.lang.orNull, a.key,
        b.kind, b.num.map(Double.box).orNull, b.str.orNull, b.lang.orNull, b.key)
    }.asJava
    val df = spark.createDataFrame(rows, schema)
    val a = Term.struct_(col("ak"), col("an"), col("as"), col("al"), col("akey"))
    val b = Term.struct_(col("bk"), col("bn"), col("bs"), col("bl"), col("bkey"))
    df.select(
      TermOps.ebv(a).as("ebv"),
      TermOps.termEq(a, b).as("eq"),
      TermOps.sameTerm(a, b).as("same"),
      TermOps.cmp(a, b).as("cmp_ab"),
      TermOps.cmp(b, a).as("cmp_ba"),
      (TermOps.sortKey(a) < TermOps.sortKey(b)).as("sk_lt")
    ).collect()
  }

  private def optBool(r: Row, i: Int): Option[Boolean] =
    if (r.isNullAt(i)) None else Some(r.getBoolean(i))
  private def optInt(r: Row, i: Int): Option[Int] =
    if (r.isNullAt(i)) None else Some(r.getInt(i))

  test("EBV matches the reference model on every generated term") {
    pairs.zip(evaluated).foreach { case ((a, _), r) =>
      assert(optBool(r, 0) === ebvModel(a), s"EBV mismatch for $a")
    }
  }

  test("equality matches the model (int/float promotion, key identity)") {
    pairs.zip(evaluated).foreach { case ((a, b), r) =>
      assert(r.getBoolean(1) === eqModel(a, b), s"eq mismatch for $a vs $b")
    }
  }

  test("sameTerm is strict key identity (no numeric promotion)") {
    pairs.zip(evaluated).foreach { case ((a, b), r) =>
      assert(r.getBoolean(2) === (a.key == b.key), s"sameTerm mismatch for $a vs $b")
    }
  }

  test("partial-order cmp matches the model and is antisymmetric") {
    pairs.zip(evaluated).foreach { case ((a, b), r) =>
      val ab = optInt(r, 3)
      assert(ab === cmpModel(a, b), s"cmp mismatch for $a vs $b")
      assert(optInt(r, 4) === cmpModel(b, a), s"cmp(b,a) mismatch for $a vs $b")
      (ab, optInt(r, 4)) match {
        case (Some(x), Some(y)) => assert(x == -y, s"antisymmetry broken for $a vs $b")
        case _ => // incomparable in one direction ⇒ must be in both
          assert(ab.isEmpty && optInt(r, 4).isEmpty, s"one-sided comparability for $a vs $b")
      }
    }
  }

  test("total sort key refines the partial order (strict within family)") {
    pairs.zip(evaluated).foreach { case ((a, b), r) =>
      optInt(r, 3).foreach { c =>
        if (c < 0) assert(r.getBoolean(5), s"sortKey disagrees with cmp<0 for $a vs $b")
        if (c > 0) assert(!r.getBoolean(5), s"sortKey disagrees with cmp>0 for $a vs $b")
      }
    }
  }

  test("const-specialized eq/sameTerm/cmp agree with the generic trees") {
    // representative constant per kind family, incl. the branch-y ones
    val consts = Seq(
      TermValue.int(7), TermValue.int(-3), TermValue.float(2.5f),
      TermValue.float(7.0f), TermValue.str("abc"), TermValue.str(""),
      TermValue.entityQ(31), TermValue.propDirect(5),
      TermValue.mono("hi", "en"), TermValue.mono("hi", "fr"),
      TermValue.bool(true), TermValue.url("http://x"), TermValue.nullValue,
      TermValue(Kind.Quantity, Some(5d), None, None, "q:5|u1"),
      TermValue(Kind.Time, Some(1.8e13), None, None, "t:123|greg"))
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq("ak" -> StringType, "an" -> DoubleType,
      "as" -> StringType, "al" -> StringType, "akey" -> StringType)
      .map { case (n, t) => StructField(n, t) })
    val rows: java.util.List[Row] = pairs.map(_._1).map { a =>
      Row(a.kind, a.num.map(Double.box).orNull, a.str.orNull, a.lang.orNull, a.key)
    }.asJava
    val df = spark.createDataFrame(rows, schema)
    val a = Term.struct_(col("ak"), col("an"), col("as"), col("al"), col("akey"))
    val checks = consts.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        (TermOps.termEq(a, c.toColumn) <=> TermOps.termEqConst(a, c)).as(s"eq_$i"),
        (TermOps.sameTerm(a, c.toColumn) <=> TermOps.sameTermConst(a, c)).as(s"st_$i"),
        (TermOps.cmp(a, c.toColumn) <=> TermOps.cmpConst(a, c)).as(s"cmp_$i"),
        (TermOps.cmp(c.toColumn, a) <=> -TermOps.cmpConst(a, c)).as(s"neg_$i"))
    }
    val bad = df.select(checks: _*).collect().zip(Iterator.continually(pairs.map(_._1)).flatten)
    for ((r, _) <- bad; i <- 0 until r.length if !r.getBoolean(i))
      fail(s"const-specialized mismatch at ${r.schema.fieldNames(i)} " +
        s"(const ${consts(i / 4)})")
  }

  test("promotion cases: int n equals float n; NaN has false EBV") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      TermOps.termEq(TermValue.int(7).toColumn, TermValue.float(7.0f).toColumn).as("p"),
      TermOps.ebv(TermValue.float(Float.NaN).toColumn).as("nan_ebv"),
      TermOps.cmp(TermValue.int(1).toColumn, TermValue.str("1").toColumn).as("cross"))
    val r = df.collect()(0)
    assert(r.getBoolean(0))
    assert(!r.isNullAt(1) && !r.getBoolean(1))
    assert(r.isNullAt(2), "cross-family comparison must be incomparable (null)")
  }
}
