package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID over a lowercased words array: one pass counting
  * marker-word hits per language, then argmax (ties resolve to the
  * lexicographically larger code, zero hits → "und").
  *
  * The Column formulation was `greatest` over one `filter` HOF per
  * language — five interpreted passes per document. This makes one
  * hash-probe pass inside whole-stage codegen; results are pinned
  * identical by PipelineSpec.
  */
case class LangIdSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = LangIdSig.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](LangIdSig.langs.length)
    val n = in.numElements()
    var j = 0
    while (j < n) {
      if (!in.isNullAt(j)) {
        val hit = LangIdSig.lookup.get(in.getUTF8String(j))
        if (hit != null) { var k = 0; while (k < hit.length) { counts(hit(k)) += 1; k += 1 } }
      }
      j += 1
    }
    var best = 0
    var i = 1
    while (i < counts.length) { if (counts(i) >= counts(best)) best = i; i += 1 }
    if (counts(best) > 0) LangIdSig.langUtf8(best) else LangIdSig.und
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("langMarkerMap", LangIdSig.lookup,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, int[]>")
    val langsRef = ctx.addReferenceObj("langCodes", LangIdSig.langUtf8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val undRef = ctx.addReferenceObj("langUnd", LangIdSig.und,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, in => {
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val counts = ctx.freshName("counts"); val hit = ctx.freshName("hit")
      val best = ctx.freshName("best")
      val L = LangIdSig.langs.length
      s"""
         |int $n = $in.numElements();
         |int[] $counts = new int[$L];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($in.isNullAt($j)) continue;
         |  int[] $hit = (int[]) $mapRef.get($in.getUTF8String($j));
         |  if ($hit != null) for (int $k = 0; $k < $hit.length; $k++) $counts[$hit[$k]]++;
         |}
         |int $best = 0;
         |for (int $i = 1; $i < $L; $i++) if ($counts[$i] >= $counts[$best]) $best = $i;
         |${ev.value} = ($counts[$best] > 0) ? $langsRef[$best] : $undRef;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdSig =
    copy(child = newChild)
}

object LangIdSig {
  val name = "graft_lang_id"

  /** Marker table — the single source of truth (TextAnalysis.markers
    * aliases this). Kept tiny on purpose; real pipelines broadcast a
    * model table, but the operator shape (score per language, argmax)
    * is identical.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "de", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "de", "es", "un"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我"))

  /** Languages in ascending order: the argmax scan takes later indices
    * on ties, reproducing the Column formulation's greatest-by-struct
    * (score, then lang string) tie-break.
    */
  val langs: Array[String] = markers.keys.toArray.sorted

  private[functions] val langUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  private[functions] val und: UTF8String = UTF8String.fromString("und")

  /** word → indices of the languages listing it (markers overlap:
    * e.g. "la"/"de"/"un" appear in both French and Spanish).
    */
  private[functions] val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for ((lang, ws) <- markers; w <- ws) {
      val key = UTF8String.fromString(w)
      val idx = langs.indexOf(lang)
      val prev = Option(m.get(key)).getOrElse(Array.empty[Int])
      m.put(key, prev :+ idx)
    }
    m
  }
}
