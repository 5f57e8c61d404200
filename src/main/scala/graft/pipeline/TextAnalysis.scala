package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions — per-row work stays in codegen, no UDFs.
  */
object TextAnalysis {

  /** Tiny per-language marker word lists for the n-gram/stopword
    * language-ID heuristic (real pipelines would load fastText-style
    * models via a broadcast table; the *operator shape* — score per
    * language, argmax — is the same).
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "de", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "de", "es", "un"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我"))

  // split of "" yields [""] — filter empties so blank text has 0 words
  private def words(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), w => length(w) > 0)

  /** Per-language marker-hit count. */
  def langScore(text: Column, lang: String): Column = {
    val set = markers(lang)
    size(filter(words(text), w => w.isin(set: _*)))
  }

  /** Argmax language over [[markers]]; ties resolve alphabetically;
    * zero hits → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val scored = markers.keys.toSeq.sorted.map(l =>
      struct(langScore(text, l).as("score"), lit(l).as("lang")))
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality metrics: length, word stats, punctuation/stopword ratios.
    * The standard cheap pre-filters for web-scale corpora.
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val nWords = size(ws).cast(DoubleType)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_words", size(ws))
      .withColumn("avg_word_len",
        when(nWords > 0, length(regexp_replace(t, "\\s+", "")).cast(DoubleType) / nWords))
      .withColumn("punct_ratio",
        when(length(t) > 0,
          (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast(DoubleType) /
            length(t).cast(DoubleType)))
      .withColumn("stopword_ratio",
        when(nWords > 0, langScore(t, "en").cast(DoubleType) / nWords))
  }

  /** Whitespace token count (0 for blank text). */
  def wsTokenCount(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), w => length(w) > 0))

  /** BPE-ish token estimate: word pieces + digits + punctuation as
    * separate tokens (a common regex pre-tokenizer shape).
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** Rolling-hash document fingerprint: polynomial hash over word
    * xxhashes (order-sensitive, unlike the dedup shingle sets), plus a
    * winnowing-style min-window selection is left to callers.
    * Modular (p = 1e9+7) so the accumulator never overflows a long
    * under ANSI arithmetic: acc < 2^30, acc*31 + h mod p < 2^36.
    */
  private val fpMod = 1000000007L
  def fingerprint(text: Column): Column =
    aggregate(transform(words(text), w => xxhash64(w)),
      lit(0L), (acc, h) => pmod(acc * 31L + pmod(h, lit(fpMod)), lit(fpMod)))

  /** The full per-document analysis frame used by the pipeline entry. */
  def analyze(df: DataFrame, textCol: String, idCol: String): DataFrame =
    qualityMetrics(df, textCol)
      .withColumn("lang_id", langId(col(textCol)))
      .withColumn("ws_tokens", wsTokenCount(col(textCol)))
      .withColumn("bpe_tokens", bpeTokenCount(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
      .select(col(idCol), col("n_words"), col("avg_word_len"), col("punct_ratio"),
        col("stopword_ratio"), col("lang_id"), col("ws_tokens"), col("bpe_tokens"),
        col("fingerprint"))
}
