package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowed fingerprint selection (Schleimer/Wilkerson/Aiken, MOSS):
  * from an ordered array of k-gram hashes, keep the minimum of every
  * sliding window of `w` hashes; return the selected values as a
  * sorted, distinct array. Winnowing guarantees any shared substring
  * of at least w+k-1 words produces at least one shared fingerprint,
  * which makes it the candidate generator for PARTIAL-overlap /
  * containment dedup (quotes, copied passages) — a different detection
  * family from whole-document MinHash similarity.
  *
  * Fewer than `w` hashes (but at least one) → one fingerprint, the
  * global minimum (the window clamps to the array). Null elements are
  * never selected. One primitive pass per document inside whole-stage
  * codegen.
  */
case class WinnowSig(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = WinnowSig.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowSig.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.WinnowSig.compute($in, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSig =
    copy(child = newChild)
}

object WinnowSig {
  val name = "graft_winnow_sig"

  /** Static so generated code can call it. Naive O(n·w) window scan —
    * w is a small constant (4-16) and n is per-document, so the deque
    * trick isn't worth its branches here.
    */
  def compute(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val wEff = math.min(w, n)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= n - wEff) {
      var m = Long.MaxValue
      var any = false
      var j = i
      while (j < i + wEff) {
        if (!hashes.isNullAt(j)) {
          val h = hashes.getLong(j)
          if (h < m) { m = h; any = true }
        }
        j += 1
      }
      if (any) sel.add(m)
      i += 1
    }
    val out = new Array[Any](sel.size())
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}
