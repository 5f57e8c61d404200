package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable 60-bit md5 hash: the top 60 bits of the md5 digest —
  * bit-identical by construction to
  * `conv(substring(md5(c), 1, 15), 16, 10)` (the first 15 hex chars),
  * which any engine with md5 can re-derive for a differential oracle —
  * but computed straight from the digest bytes, with none of that
  * formulation's hex-string → substring → decimal-string → cast churn.
  *
  * Accepts a string (→ long) or an array of strings (→ array<long>,
  * null elements preserved): the array form hashes a whole document's
  * words/k-grams in ONE expression node, where the previous
  * `transform(arr, md5Hash60)` paid an interpreted HOF lambda dispatch
  * plus the string churn per element — the dominant driver of
  * p04_simhash's cost (PERF_r10.md "Bench-noise note").
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  private def isArrayInput: Boolean = child.dataType.isInstanceOf[ArrayType]

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => LongType
  }
  override def nullable: Boolean = child.nullable
  override def prettyName: String = Md5Hash60.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    if (!isArrayInput) Md5Hash60.hash(input.asInstanceOf[UTF8String])
    else {
      val in = input.asInstanceOf[ArrayData]
      val n = in.numElements()
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        if (!in.isNullAt(j)) out(j) = Md5Hash60.hash(in.getUTF8String(j))
        j += 1
      }
      new GenericArrayData(out)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val helper = "graft.functions.Md5Hash60$.MODULE$"
      if (!isArrayInput) s"${ev.value} = $helper.hash($in);"
      else {
        val j = ctx.freshName("j"); val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        s"""
           |int $n = $in.numElements();
           |Object[] $out = new Object[$n];
           |for (int $j = 0; $j < $n; $j++) {
           |  if (!$in.isNullAt($j))
           |    $out[$j] = (Long) $helper.hash($in.getUTF8String($j));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  val name = "graft_md5_hash60"

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(s): first 8 digest bytes big-endian, shifted
    * right 4 — exactly the integer value of the first 15 hex chars.
    */
  def hash(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    v >>> 4
  }
}
