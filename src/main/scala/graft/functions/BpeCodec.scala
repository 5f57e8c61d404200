package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE token-id codec (Sennrich et al. 2016 merge tables, GPT-2-style
  * greedy lowest-rank-first application) as native codegen'd
  * expressions. The merges table arrives as a FOLDABLE
  * `array<array<string>>` literal of [left, right] pairs in training
  * order — trained driver-side on a bounded sample
  * ([[graft.pipeline.Bpe.trainMerges]]) and shipped into the plan like
  * the IVF centroid literals.
  *
  * Id space (deterministic from the merges alone — no corpus scan):
  *   0                  the inter-word space
  *   1..numMerges       merge results, in training order
  *   numMerges+1+cp     char fallback (codepoint cp) — ANY input
  *                      round-trips, chars outside the training sample
  *                      included; there is no UNK loss.
  *
  * Encode lowercases and whitespace-normalizes first (token identity is
  * defined on the normalized form, matching the rest of the text
  * stack), so decode(encode(x)) == normalize(x) — an invariant the p53
  * gate checks corpus-wide.
  */
abstract class BpeBase extends BinaryExpression {
  def merges: Expression

  protected def requireFoldableMerges(): Unit =
    require(merges.foldable, "BPE merges table must be a literal")

  @transient protected lazy val table: BpeTable = {
    val arr = merges.eval().asInstanceOf[ArrayData]
    val pairs = (0 until arr.numElements()).map { i =>
      val p = arr.getArray(i)
      (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
    }
    BpeTable(pairs.toArray)
  }

  override def right: Expression = merges
}

case class BpeEncode(child: Expression, merges: Expression) extends BpeBase {
  requireFoldableMerges()
  override def left: Expression = child
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = BpeEncode.name

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, merges.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<array<string>>), got $other")
    }

  override def nullSafeEval(text: Any, m: Any): Any =
    table.encode(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, (in, _) => s"${ev.value} = $ref.encode($in);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BpeEncode =
    copy(child = newLeft, merges = newRight)
}

object BpeEncode { val name = "graft_bpe_encode" }

case class BpeDecode(child: Expression, merges: Expression) extends BpeBase {
  requireFoldableMerges()
  override def left: Expression = child
  override def dataType: DataType = StringType
  // malformed ids decode to null even when the inputs are non-null
  override def nullable: Boolean = true
  override def prettyName: String = BpeDecode.name

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, merges.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<string>>), got $other")
    }

  override def nullSafeEval(ids: Any, m: Any): Any =
    table.decode(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, (in, _) =>
      s"""${ev.value} = $ref.decode($in);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BpeDecode =
    copy(child = newLeft, merges = newRight)
}

object BpeDecode { val name = "graft_bpe_decode" }

/** The fitted model: merge ranks for encoding, symbol strings for
  * decoding. One instance per plan (reference object), shared by every
  * task that runs the expression.
  */
case class BpeTable(pairs: Array[(String, String)]) extends Serializable {
  // pair-key separator: symbols are drawn from whitespace-split words,
  // so a space can never occur inside a symbol
  private val Sep = " "
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    pairs.zipWithIndex.foreach { case ((a, b), i) => m.put(a + Sep + b, i) }
    m
  }
  @transient private lazy val mergedId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    // later (more specific) merges win on string collision; collisions
    // cannot happen in a Sennrich table (each merge result is unique)
    pairs.zipWithIndex.foreach { case ((a, b), i) => m.put(a + b, i + 1) }
    m
  }
  private def fallbackBase: Int = pairs.length + 1

  /** id of one post-merge symbol: merge results carry their table id;
    * anything else is necessarily a single char (symbols start as
    * chars and only grow through merges) → char fallback.
    */
  private def symId(s: String): Int = {
    val m = mergedId.get(s)
    if (m != null) m.intValue
    else fallbackBase + s.codePointAt(0)
  }

  def encode(text: UTF8String): GenericArrayData = {
    val words = text.toString.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var first = true
    for (w <- words) {
      if (!first) out += 0 // inter-word space token
      first = false
      val syms = new scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      // greedy lowest-rank-first merging (the GPT-2 application order)
      var done = syms.length < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var j = 0
        while (j < syms.length - 1) {
          val r = rank.get(syms(j) + Sep + syms(j + 1))
          if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestAt = j }
          j += 1
        }
        if (bestAt < 0) done = true
        else {
          syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
          syms.remove(bestAt + 1)
          done = syms.length < 2
        }
      }
      syms.foreach(s => out += symId(s))
    }
    new GenericArrayData(out.toArray)
  }

  /** Null on malformed ids (negative, or past the fallback code-point
    * range) — the same degrade-don't-crash contract as the other
    * native expressions: ids not produced by this merges table must
    * not throw from an executor.
    */
  def decode(ids: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val id = ids.getInt(i)
      if (id == 0) sb.append(' ')
      else if (id > 0 && id <= pairs.length) {
        val (a, b) = pairs(id - 1); sb.append(a).append(b)
      } else {
        val cp = id - fallbackBase
        if (id < 0 || !Character.isValidCodePoint(cp)) return null
        sb.appendCodePoint(cp)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
