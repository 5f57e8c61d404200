package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column — the native form of
  *
  * {{{
  * n == 1: array_distinct(split(trim(text), "\\s+"))
  * n >= 2: array_distinct(transform(
  *           sequence(0, greatest(size(words) - n, 0)),
  *           i => concat_ws(" ", slice(words, i + 1, n))))
  * }}}
  *
  * That HOF pipeline re-materializes a sliced array and a concat per
  * position, interpreted; shingling runs once per document over the
  * whole corpus, so it gets a single primitive pass (one String.split,
  * one StringBuilder walk per position, first-occurrence dedup).
  * Output order and edge cases are pinned to the HOF formulation by
  * PipelineSpec: empty text yields [""], fewer than n words yields the
  * partial shingle, dedup keeps first occurrences.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = WordNgrams.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.WordNgrams.compute($in, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  val name = "graft_word_ngrams"

  /** One-pass shingle computation; static so generated code can call it.
    * `functions.trim` strips 0x20 only (NOT Java's `String.trim`, which
    * also strips control chars) — replicated here for parity.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = s.substring(lo, hi)
    val words = trimmed.split("\\s+", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (n == 1) {
      var i = 0
      while (i < words.length) { seen.add(words(i)); i += 1 }
    } else {
      // positions 0 .. max(len - n, 0); shingle = words[i .. i+n)
      // joined by " ", truncated at the end (slice semantics)
      val last = math.max(words.length - n, 0)
      var i = 0
      while (i <= last) {
        val sb = new java.lang.StringBuilder
        var j = i
        val end = math.min(i + n, words.length)
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
