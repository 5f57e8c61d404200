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
    learnFromWordFreq(wordFreq.toArray.map { case (s, f) => (s.toArray, f) },
      numMerges)
  }

  /** The merge-learning core, with INCREMENTAL pair maintenance: pair
    * counts live in a hash map mirrored by a TreeSet ordered
    * (count desc, pair asc), and each merge touches only the words that
    * contain the merged pair (tracked by an additive pair→word-set
    * index; stale entries are skipped by an adjacency re-check).
    * Per-merge cost is O(touched words × word length + log #pairs)
    * instead of O(all sample words), so 32k-merge vocabularies train in
    * seconds. Counts are maintained exactly (subtract a touched word's
    * old pairs, add its new ones), so the selected sequence is
    * IDENTICAL to a from-scratch recount each round — the test pins
    * this against a naive reference.
    */
  private[graft] def learnFromWordFreq(init: Array[(Array[String], Long)],
                                          numMerges: Int): Array[(String, String)] = {
    import scala.collection.mutable
    val wordSyms = init.map(_._1)
    val freqs = init.map(_._2)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    // count DESC, then pair ASC — head is always the next merge
    val sorted = mutable.TreeSet.empty[(Long, String, String)](
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String))
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addCount(p: (String, String), delta: Long): Unit = {
      val old = pairCounts.getOrElse(p, 0L)
      if (old != 0L) sorted.remove((old, p._1, p._2))
      val now = old + delta
      if (now != 0L) { pairCounts(p) = now; sorted.add((now, p._1, p._2)) }
      else pairCounts.remove(p)
    }
    def indexWord(syms: Array[String], wi: Int, f: Long, sign: Int): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        addCount(p, sign * f)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
    }
    var wi = 0
    while (wi < wordSyms.length) { indexWord(wordSyms(wi), wi, freqs(wi), 1); wi += 1 }
    val merges = Array.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      if (sorted.isEmpty || sorted.head._1 < 2L) exhausted = true
      else {
        val (_, a, b) = sorted.head
        val best = (a, b)
        merges += best
        val joined = a + b
        // sorted order for determinism is unnecessary (count updates
        // commute) but free and makes replays byte-identical
        val touched = pairWords.remove(best).map(_.toArray.sorted)
          .getOrElse(Array.empty[Int])
        for (w <- touched) {
          val syms = wordSyms(w)
          // the index is additive-only: entries go stale once a word
          // mutates away from a pair, so re-check adjacency
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            if (syms(i) == a && syms(i + 1) == b) has = true
            i += 1
          }
          if (has) {
            indexWord(syms, w, freqs(w), -1)
            val out = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += joined; j += 2 // greedy left-to-right, non-overlapping
              } else { out += syms(j); j += 1 }
            }
            val ns = out.toArray
            wordSyms(w) = ns
            indexWord(ns, w, freqs(w), 1)
          }
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
