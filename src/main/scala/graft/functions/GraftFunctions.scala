package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.SparkSessionExtensions

/** All of the engine's custom catalyst expressions, registered through
  * SparkSessionExtensions (the public route from Column code to a
  * custom Expression, via `call_function`). Every session factory —
  * GraftSession, Verify, the test base — installs this.
  */
object GraftFunctions {
  def register(ext: SparkSessionExtensions): Unit = {
    inject(ext, OptimizerFence.name, classOf[OptimizerFence],
      exprs => OptimizerFence(exprs.head))
    inject(ext, VecDot.name, classOf[VecDot],
      exprs => VecDot(exprs(0), exprs(1)))
    inject(ext, PqAdc.name, classOf[PqAdc],
      exprs => PqAdc(exprs(0), exprs(1), foldToInt(exprs(2))))
    inject(ext, MinHashSig.name, classOf[MinHashSig],
      exprs => MinHashSig(exprs(0), foldToInt(exprs(1))))
    inject(ext, SimHashSig.name, classOf[SimHashSig],
      exprs => SimHashSig(exprs.head))
    inject(ext, Md5Hash60.name, classOf[Md5Hash60],
      exprs => Md5Hash60(exprs.head))
    inject(ext, BNodeTerm.name, classOf[BNodeTerm],
      exprs => BNodeTerm(exprs.head))
    inject(ext, WordNgrams.name, classOf[WordNgrams],
      exprs => WordNgrams(exprs(0), foldToInt(exprs(1))))
    inject(ext, LangIdSig.name, classOf[LangIdSig],
      exprs => LangIdSig(exprs.head))
    inject(ext, WinnowSig.name, classOf[WinnowSig],
      exprs => WinnowSig(exprs(0), foldToInt(exprs(1))))
    inject(ext, CompressRatio.name, classOf[CompressRatio],
      exprs => CompressRatio(exprs.head))
    inject(ext, BpeEncode.name, classOf[BpeEncode],
      exprs => BpeEncode(exprs(0), exprs(1)))
    inject(ext, BpeDecode.name, classOf[BpeDecode],
      exprs => BpeDecode(exprs(0), exprs(1)))
    inject(ext, BoundedSortedConcat.name, classOf[BoundedSortedConcat],
      exprs => BoundedSortedConcat(exprs(0),
        foldToString(exprs(1)), foldToInt(exprs(2)), foldToBool(exprs(3))))
    // Spark's own runtime-filter Bloom sketch pair, surfaced as Column
    // functions: bloom_agg(xxhash64_col, items, bits) folds hashes into
    // a sketch; bloom_might_contain(sketch_lit, xxhash64_col) probes it
    // (codegen'd, never a false negative).
    inject(ext, "bloom_agg", classOf[BloomFilterAggregate],
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)))
    inject(ext, "bloom_might_contain", classOf[BloomFilterMightContain],
      exprs => BloomFilterMightContain(exprs(0), exprs(1)))
  }

  private def foldToString(e: Expression): String = {
    require(e.foldable, "separator must be a literal")
    String.valueOf(e.eval())
  }

  private def foldToBool(e: Expression): Boolean = {
    require(e.foldable, "distinct flag must be a literal")
    e.eval().asInstanceOf[Boolean]
  }

  private def foldToInt(e: Expression): Int = {
    require(e.foldable, "numHashes must be a literal")
    e.eval().asInstanceOf[Number].intValue
  }

  private def inject(ext: SparkSessionExtensions, name: String, cls: Class[_],
                     builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, name),
      builder))
}
