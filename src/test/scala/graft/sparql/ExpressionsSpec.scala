package graft.sparql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.model.TermValue
import Ast._

/** The expression compiler's reference quirks (calc_engine.rs):
  * strict-Boolean logic (no three-valued shortcuts), all-f32
  * arithmetic, UnaryPlus = abs, IN by strict node identity, and
  * Null-propagation in IF/COALESCE.
  */
class ExpressionsSpec extends graft.SparkTestBase {

  private def evalOne(e: Expr): Row = {
    val df = spark.range(1).select(Expressions.eval(e, _ => None).as("r"))
    df.select(col("r.kind"), col("r.num"), col("r.str")).collect()(0)
  }
  private def kindOf(e: Expr): String = {
    val r = evalOne(e)
    if (r.isNullAt(0)) "NULL" else r.getString(0)
  }

  private def i(n: Int) = EConst(TermValue.int(n))
  private def f(v: Float) = EConst(TermValue.float(v))
  private def b(v: Boolean) = EConst(TermValue.bool(v))
  private def s(v: String) = EConst(TermValue.str(v))

  test("And/Or are strict Boolean: non-bool operand → Null (calc_engine.rs:1011-1032)") {
    assert(kindOf(EAnd(b(true), b(false))) === "bool")
    assert(evalOne(EAnd(b(true), b(false))).getDouble(1) === 0d)
    // the reference does NOT short-circuit `false && junk` to false
    assert(kindOf(EAnd(b(false), i(1))) === "NULL")
    assert(kindOf(EOr(b(true), s("x"))) === "NULL")
  }

  test("arithmetic is f32 — even int∘int yields a float term (calc_engine.rs:2966-2986)") {
    val r = evalOne(EAdd(i(2), i(3)))
    assert(r.getString(0) === "float" && r.getDouble(1) === 5d && r.getString(2) === "5")
    assert(kindOf(EMultiply(i(2), s("x"))) === "NULL") // non-numeric → Null
    val div = evalOne(EDivide(i(1), i(2)))
    assert(div.getString(0) === "float" && div.getDouble(1) === 0.5d)
  }

  test("unary plus is abs — the reference quirk (calc_engine.rs:2979-2981)") {
    val r = evalOne(EUnaryPlus(f(-2.5f)))
    assert(r.getString(0) === "float" && r.getDouble(1) === 2.5d)
    val m = evalOne(EUnaryMinus(i(4)))
    assert(m.getString(0) === "float" && m.getDouble(1) === -4d)
  }

  test("IN compares by strict node identity, no promotion (calc_engine.rs:1070-1082)") {
    def asBool(e: Expr): Option[Boolean] = {
      val r = evalOne(e)
      if (r.isNullAt(0)) None else Some(r.getDouble(1) != 0d)
    }
    assert(asBool(EIn(i(1), Seq(i(1), i(2)), negated = false)) === Some(true))
    // int 1 is NOT the same node as float 1.0 (termEq would promote; In must not)
    assert(asBool(EIn(i(1), Seq(f(1.0f)), negated = false)) === Some(false))
    assert(asBool(EIn(i(3), Seq(i(1)), negated = true)) === Some(true))
  }

  test("IF requires a Boolean condition; Null condition → Null (calc_engine.rs:1149-1164)") {
    val r = evalOne(EIf(b(true), s("yes"), s("no")))
    assert(r.getString(2) === "yes")
    assert(kindOf(EIf(i(1), s("yes"), s("no"))) === "NULL") // int cond is not EBV'd
  }

  test("COALESCE skips Null terms and unbound variables (calc_engine.rs:1166-1177)") {
    val r = evalOne(ECoalesce(Seq(EVar("unbound"), EConst(TermValue.nullValue), s("hit"))))
    assert(r.getString(2) === "hit")
    assert(kindOf(ECoalesce(Seq(EVar("nope")))) === "NULL")
  }

  test("BOUND on an absent variable is false; NOT flips only Booleans") {
    val r = evalOne(EBound(Var("missing")))
    assert(r.getString(0) === "bool" && r.getDouble(1) === 0d)
    assert(kindOf(ENot(i(1))) === "NULL")
    assert(evalOne(ENot(b(false))).getDouble(1) === 1d)
  }
}
