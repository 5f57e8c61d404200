package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric-array columns, accumulated in
  * double.
  *
  * The Column-level alternative — `aggregate(zip_with(a, b, _*_), …)` —
  * is built from higher-order functions, which Catalyst evaluates
  * interpreted (they are CodegenFallback): every row pays lambda
  * dispatch and boxing per element. This expression is the actual hot
  * loop of the ANN/near-dup family (corpus × probes cosine, hyperplane
  * projections), so it gets a real `doGenCode`: a tight primitive loop
  * over the two ArrayData buffers that whole-stage codegen inlines.
  *
  * Semantics (pinned to the HOF formulation on well-formed input):
  * null array → null; any null element → null; element count = the
  * shorter of the two arrays (the HOF version null-poisons on length
  * mismatch — call sites there pre-slice to equal length, so the two
  * only differ on inputs the engine never produces).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = VecDot.name

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two numeric arrays, got ${left.dataType} and ${right.dataType}")
  }

  private def get(ad: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => ad.getFloat(i).toDouble
    case DoubleType => ad.getDouble(i)
    case IntegerType => ad.getInt(i).toDouble
    case LongType => ad.getLong(i).toDouble
    case ShortType => ad.getShort(i).toDouble
    case ByteType => ad.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    s
  }

  private def genGet(v: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case DoubleType => s"$v.getDouble($i)"
    case IntegerType => s"(double) $v.getInt($i)"
    case LongType => s"(double) $v.getLong($i)"
    case ShortType => s"(double) $v.getShort($i)"
    case ByteType => s"(double) $v.getByte($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += (${genGet(a, i, elemType(left))}) * (${genGet(b, i, elemType(right))});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  val name = "graft_vec_dot"
}
