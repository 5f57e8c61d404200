package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenization for training-data pipelines: train a merge table
  * once (driver-side, bounded deterministic sample — the same model-fit
  * contract as the IVF coarse quantizer), then encode/decode corpus
  * text as token-id arrays with the native codegen'd
  * [[graft.functions.BpeEncode]]/[[graft.functions.BpeDecode]]
  * expressions. Char fallback means encoding is total: ANY document
  * round-trips exactly (decode∘encode = whitespace/case normalization),
  * which the p53 gate asserts corpus-wide.
  *
  * At 100 TB the merge table is a model literal in the plan (like
  * centroids/Bloom sketches): no join, no shuffle — tokenization is a
  * narrow map.
  */
object Bpe {

  /** Sennrich et al. 2016 BPE training on a deterministic sample:
    * count adjacent symbol pairs weighted by word frequency, merge the
    * most frequent (ties: lexicographic pair order — deterministic),
    * repeat `numMerges` times or until no pair repeats.
    */
  def trainMerges(df: DataFrame, textCol: String, idCol: String,
                  numMerges: Int, maxTrain: Int = 4096): Array[(String, String)] = {
    val sample = df
      .select(lower(col(textCol)).as("t"), xxhash64(col(idCol)).as("h"))
      .orderBy("h").limit(maxTrain).select("t")
      .collect().map(_.getString(0))
    // word frequencies; each word starts as its codepoint symbols
    val wordFreq = scala.collection.mutable.HashMap.empty[List[String], Long]
    for (t <- sample if t != null; w <- t.trim.split("\\s+") if w.nonEmpty) {
      val syms = {
        val b = List.newBuilder[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          b += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        b.result()
      }
      wordFreq(syms) = wordFreq.getOrElse(syms, 0L) + 1L
    }
    var words = wordFreq.toArray
    val merges = Array.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; p <- syms.zip(syms.tail))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, f) =>
          val out = List.newBuilder[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tail if a == best._1 && b == best._2 =>
              out += joined; rest = tail
            case a :: tail => out += a; rest = tail
            case Nil => ()
          }
          (out.result(), f)
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Merge table as the plan literal the codec expressions consume. */
  def mergesLit(merges: Array[(String, String)]): Column =
    typedLit(merges.map { case (a, b) => Seq(a, b) }.toSeq)

  def encode(text: Column, merges: Array[(String, String)]): Column =
    call_function(graft.functions.BpeEncode.name, text, mergesLit(merges))

  def decode(ids: Column, merges: Array[(String, String)]): Column =
    call_function(graft.functions.BpeDecode.name, ids, mergesLit(merges))
}
