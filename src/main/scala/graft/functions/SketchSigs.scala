package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch-signature expressions for the dedup family.
  *
  * Both were previously Column-level HOF pipelines
  * (`transform`/`aggregate`/`array_min`), which Catalyst evaluates
  * interpreted — for a 64-function MinHash that is 64 lambda-dispatched
  * passes over every document's shingle hashes, the dominant cost of
  * near-dup at scale. These expressions make one primitive pass per
  * document inside whole-stage codegen. Output values are pinned
  * bit-identical to the HOF formulations by PipelineSpec.
  */

/** MinHash signature over staged base hashes (`array<long>`, values in
  * [0, 2^31-1)): element i = min over hashes h of (a_i*h + b_i) mod
  * (2^31-1), the standard affine family with splitmix-derived
  * constants (same constants as Dedup.mix). Empty/all-null input →
  * array of nulls (parity with `array_min` over an empty transform).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = MinHashSig.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  @transient private lazy val aConst: Array[Long] =
    Array.tabulate(numHashes)(i => (MinHashSig.mix(i.toLong) & 0x7FFFFFFFL) | 1L)
  @transient private lazy val bConst: Array[Long] =
    Array.tabulate(numHashes)(i => MinHashSig.mix(i + 100003L) & 0x7FFFFFFFL)

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!in.isNullAt(j)) {
        any = true
        val h = in.getLong(j)
        var i = 0
        while (i < numHashes) {
          var m = (h * aConst(i) + bConst(i)) % MinHashSig.MersP
          if (m < 0) m += MinHashSig.MersP
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](numHashes)
    if (any) { var i = 0; while (i < numHashes) { out(i) = mins(i); i += 1 } }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aConst, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bConst, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val m = ctx.freshName("m"); val mins = ctx.freshName("mins")
      val any = ctx.freshName("any"); val out = ctx.freshName("out")
      s"""
         |int $n = $in.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($in.isNullAt($j)) continue;
         |  $any = true;
         |  long $h = $in.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $m = ($h * $aRef[$i] + $bRef[$i]) % ${MinHashSig.MersP}L;
         |    if ($m < 0) $m += ${MinHashSig.MersP}L;
         |    if ($m < $mins[$i]) $mins[$i] = $m;
         |  }
         |}
         |Object[] $out = new Object[$numHashes];
         |if ($any) for (int $i = 0; $i < $numHashes; $i++) $out[$i] = (Long) $mins[$i];
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val name = "graft_minhash_sig"
  val MersP: Long = (1L << 31) - 1
  private[functions] def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

/** 64-bit SimHash over staged word hashes (`array<long>`): bit i is
  * set when Σ over hashes of ±1 (by hash bit i) is positive. A null
  * element contributes -1 (parity with the HOF formulation's
  * three-valued `when`); empty input → 0.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = SimHashSig.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val contrib = new Array[Long](64)
    var j = 0
    while (j < n) {
      if (in.isNullAt(j)) {
        var i = 0; while (i < 64) { contrib(i) -= 1; i += 1 }
      } else {
        val h = in.getLong(j)
        var i = 0
        while (i < 64) { contrib(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L); i += 1 }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (contrib(i) > 0) sig |= 1L << i; i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val contrib = ctx.freshName("contrib"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $in.numElements();
         |long[] $contrib = new long[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($in.isNullAt($j)) {
         |    for (int $i = 0; $i < 64; $i++) $contrib[$i] -= 1L;
         |  } else {
         |    long $h = $in.getLong($j);
         |    for (int $i = 0; $i < 64; $i++)
         |      $contrib[$i] += ((($h >>> $i) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) if ($contrib[$i] > 0) $sig |= 1L << $i;
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  val name = "graft_simhash_sig"
}
