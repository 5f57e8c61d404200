package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance computation (ADC) for product quantization:
  * given a corpus row's `codes` (one sub-quantizer code per subspace)
  * and a probe's precomputed lookup table `lut` (laid out as
  * `lut(j*ksub + c)` = the probe's partial score against centroid `c`
  * of subspace `j`), returns `Σ_j lut(j*ksub + codes(j))`.
  *
  * This is the scoring hot loop of PQ search — per candidate it does
  * `m` array lookups instead of a `dim`-length dot product, and the
  * corpus side ships only `m` bytes per row. Like [[VecDot]] it gets a
  * real `doGenCode` (tight primitive loop, whole-stage-codegen
  * inlined); the HOF formulation (`aggregate` over `zip_with`) would
  * run interpreted per element.
  *
  * Null semantics: null array → null; null element → null; a code
  * outside `[0, ksub)` or an index past the LUT → null (malformed
  * input, never produced by [[graft.pipeline.Pq]]). Byte-typed codes
  * are UNSIGNED: the encoder stores code indexes 0..255 in one byte,
  * so 128..255 round-trip through negative JVM bytes and are masked
  * back here — without the mask every ksub > 128 configuration would
  * silently null out half its candidates.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = PqAdc.name

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType | ShortType | IntegerType | LongType, _),
            ArrayType(DoubleType, _)) if ksub > 0 =>
        TypeCheckResult.TypeCheckSuccess
      // BinaryType = packed one-byte codes — the most compact at-rest
      // layout for a code table (one parquet BYTE_ARRAY per row, no
      // list repetition overhead)
      case (BinaryType, ArrayType(DoubleType, _)) if ksub > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (integral array or binary, double array) and ksub > 0, " +
          s"got ${left.dataType}, ${right.dataType}, ksub=$ksub")
    }

  private def code(ad: ArrayData, i: Int): Int = elemType(left) match {
    case ByteType => ad.getByte(i).toInt & 0xFF // unsigned: see scaladoc
    case ShortType => ad.getShort(i).toInt
    case IntegerType => ad.getInt(i)
    case LongType => ad.getLong(i).toInt
    case other => throw new IllegalStateException(s"unsupported code type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = b.asInstanceOf[ArrayData]
    var s = 0d
    if (left.dataType == BinaryType) {
      val codes = a.asInstanceOf[Array[Byte]]
      var j = 0
      while (j < codes.length) {
        val c = codes(j).toInt & 0xFF // packed codes are unsigned bytes
        val idx = j * ksub + c
        if (c < 0 || c >= ksub || idx >= lut.numElements() || lut.isNullAt(idx))
          return null
        s += lut.getDouble(idx)
        j += 1
      }
    } else {
      val codes = a.asInstanceOf[ArrayData]
      val m = codes.numElements()
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val c = code(codes, j)
        val idx = j * ksub + c
        if (c < 0 || c >= ksub || idx >= lut.numElements() || lut.isNullAt(idx))
          return null
        s += lut.getDouble(idx)
        j += 1
      }
    }
    s
  }

  private def genCode(v: String, i: String): String = elemType(left) match {
    case ByteType => s"(((int) $v.getByte($i)) & 0xFF)"
    case ShortType => s"(int) $v.getShort($i)"
    case IntegerType => s"$v.getInt($i)"
    case LongType => s"(int) $v.getLong($i)"
    case other => throw new IllegalStateException(s"unsupported code type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val isBin = left.dataType == BinaryType
      val len = if (isBin) s"$a.length" else s"$a.numElements()"
      val nullElem =
        if (isBin) "" else s"if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }"
      val getC = if (isBin) s"((int) $a[$j]) & 0xFF" else genCode(a, j)
      s"""
         |int $m = $len;
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $nullElem
         |  int $c = $getC;
         |  int $idx = $j * $ksub + $c;
         |  if ($c < 0 || $c >= $ksub || $idx >= $b.numElements() || $b.isNullAt($idx)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $s += $b.getDouble($idx);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  val name = "graft_pq_adc"
}
