package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * language, argmax — is the same). The table lives with the native
    * expression; this alias keeps the public API stable.
    */
  val markers: Map[String, Seq[String]] = graft.functions.LangIdSig.markers

  // split of "" yields [""] — filter empties so blank text has 0 words
  private def words(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), w => length(w) > 0)

  /** Per-language marker-hit count. */
  def langScore(text: Column, lang: String): Column = {
    val set = markers(lang)
    size(filter(words(text), w => w.isin(set: _*)))
  }

  /** Argmax language over [[markers]]; ties resolve to the
    * lexicographically larger code; zero hits → "und" (undetermined).
    * Backed by the native codegen'd [[graft.functions.LangIdSig]] (one
    * hash-probe pass per document; the `greatest`-over-`filter`
    * formulation paid one interpreted pass per language).
    */
  def langId(text: Column): Column =
    call_function(graft.functions.LangIdSig.name, words(text))

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

  /** Deflate compression ratio (compressed/raw bytes; empty → 1.0) —
    * the model-free entropy signal: boilerplate, templated spam, and
    * degenerate repetition compress far better than natural prose.
    * Backed by the native codegen'd [[graft.functions.CompressRatio]]
    * (per-thread zlib stream reused across rows). Compare ratios
    * within one run — absolute values depend on the JVM's zlib.
    */
  def compressionRatio(c: Column): Column =
    call_function(graft.functions.CompressRatio.name, c)

  /** Rolling-hash document fingerprint: polynomial hash over word
    * hashes (order-sensitive, unlike the dedup shingle sets); a
    * winnowing-style min-window selection lives in
    * [[Dedup.winnowedFingerprints]]. Modular (p = 1e9+7) so the
    * accumulator never overflows a long under ANSI arithmetic:
    * acc < 2^30, acc*31 + h mod p < 2^36. The word hash defaults to
    * xxhash64 (fastest); pass [[Dedup.md5Hash60]] for an
    * engine-portable variant any SQL engine can re-derive.
    */
  private val fpMod = 1000000007L
  def fingerprint(text: Column, hashFn: Column => Column = xxhash64(_)): Column =
    aggregate(Dedup.mapHash(words(text), hashFn),
      lit(0L), (acc, h) => pmod(acc * 31L + pmod(h, lit(fpMod)), lit(fpMod)))

  /** Gopher-style within-document repetition signals: the fraction of
    * words taken by the most frequent word, the duplicate-word
    * fraction, and the fraction of word bigrams taken by the most
    * frequent bigram. High values flag degenerate/spammy documents.
    *
    * Shape: explode → per-(doc, gram) count → per-doc aggregate — two
    * shuffle stages with map-side combine, the canonical distributed
    * mode computation (a per-row HOF mode would re-scan the array per
    * distinct word).
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"), words(col(textCol)).as("__ws"))
    val wordStats = base.select(col("__id"), explode(col("__ws")).as("w"))
      .groupBy("__id", "w").agg(count(lit(1)).as("c"))
      .groupBy("__id").agg(sum("c").as("n_words"), max("c").as("top_word_n"),
        count(lit(1)).as("n_distinct"))
    // slice() throws on negative length, so clamp for 0/1-word docs
    val nBigrams = greatest(size(col("__ws")) - 1, lit(0))
    val bigrams = zip_with(
      slice(col("__ws"), lit(1), nBigrams),
      slice(col("__ws"), lit(2), nBigrams),
      (a, b) => concat(a, lit(" "), b))
    val bigramStats = base.select(col("__id"), explode(bigrams).as("bg"))
      .groupBy("__id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("__id").agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_n"))
    wordStats.join(bigramStats, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        round(col("top_word_n").cast(DoubleType) / col("n_words"), 6).as("top_word_frac"),
        round(lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_words"), 6).as("dup_word_frac"),
        round(col("top_bigram_n").cast(DoubleType) / col("n_bigrams"), 6).as("top_bigram_frac"))
  }

  /** C4-style corpus-level boilerplate removal: drop every line that
    * occurs in at least `minDocs` distinct documents (navigation
    * chrome, share buttons, license footers), keeping each document's
    * surviving lines in order. Documents whose every line is
    * boilerplate survive with empty text.
    *
    * Scale shape: one shuffle on the line to find boilerplate (the
    * result is small — only lines crossing the threshold), an anti
    * join AQE can broadcast, and a per-doc rebuild keyed by id.
    */
  def removeBoilerplateLines(df: DataFrame, textCol: String, idCol: String,
                             minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = lines.groupBy("line")
      .agg(countDistinct(col(idCol)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select("line")
    val rebuilt = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("line")))).as("ls"))
      .select(col(idCol),
        concat_ws("\n", transform(col("ls"), x => x.getField("line"))).as(textCol))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** PII redaction patterns (RE2-safe: no backrefs or lookaround, so
    * the same patterns run in any engine): emails, NANP-style phone
    * numbers, IPv4 addresses.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{3}[ .-]\\d{3}[ .-]\\d{4}\\b", "<PHONE>"),
    ("\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))

  /** Replace every PII match with its tag — a narrow map, applied in
    * pattern order (emails first so phone/IP fragments inside them
    * cannot be half-redacted).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }

  /** Benchmark decontamination: drop every document whose word
    * `n`-gram shingles intersect the contamination set (eval-set
    * n-grams that must not leak into training data). The shingle
    * explode joins against the gram table — small by construction, so
    * AQE broadcasts it — and the doc-id hit list anti-joins back, so
    * no document body ever moves through a shuffle.
    */
  def decontaminate(docs: DataFrame, textCol: String, idCol: String,
                    grams: DataFrame, gramCol: String, n: Int): DataFrame = {
    val hits = docs
      .select(col(idCol), explode(Dedup.shingles(lower(col(textCol)), n)).as("__g"))
      .join(grams.select(lower(col(gramCol)).as("__g")), Seq("__g"))
      .select(col(idCol)).distinct()
    docs.join(hits, Seq(idCol), "left_anti")
  }

  /** Per-document contamination REPORT against a benchmark gram set —
    * the audit-grade companion to the binary drop in [[decontaminate]]:
    * for every document, how many of its DISTINCT word `n`-grams
    * appear in the benchmark (`hits`) out of how many it has
    * (`n_grams`), and the fraction. Pipelines threshold the fraction
    * (a single shared title is noise; 40% overlap is a leaked eval
    * document) and publish the distribution as the contamination audit
    * next to a release.
    *
    * Scale shape: the gram set is small by construction and broadcasts
    * into the shingle-explode stage (`left` join, not a shuffle); the
    * per-doc re-aggregation moves (id, hit) pairs only. Documents
    * shorter than `n` words follow the [[Dedup.shingles]] convention —
    * one partial shingle (empty text: the empty string) — so they
    * report 1 gram, 0 hits, fraction 0, rows kept.
    */
  def contaminationReport(docs: DataFrame, textCol: String, idCol: String,
                          grams: DataFrame, gramCol: String, n: Int): DataFrame = {
    val gset = broadcast(
      grams.select(lower(col(gramCol)).as("__g")).distinct()
        .withColumn("__hit", lit(1)))
    docs
      .select(col(idCol),
        explode_outer(Dedup.shingles(lower(col(textCol)), n)).as("__g"))
      .join(gset, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__g")).as("n_grams"), count(col("__hit")).as("hits"))
      .withColumn("contamination",
        when(col("n_grams") > 0,
          round(col("hits").cast(DoubleType) / col("n_grams"), 6))
          .otherwise(lit(0.0)))
  }

  /** RAKE-style keyword extraction (Rose et al. 2010, "Automatic
    * Keyword Extraction from Individual Documents"): stopwords split
    * each document into candidate phrases; every content word gets
    * doc-level stats (`freq` = occurrences, `degree` = summed length
    * of the phrase instances containing it); a phrase scores the sum
    * of its words' scores, and the top `topK` distinct phrases per
    * document win. `scoring` picks the word score: `"ratio"`
    * (degree/freq — canonical RAKE, favors words in long phrases),
    * `"degree"` (integer-exact, what the oracle-checked query uses),
    * or `"freq"`.
    *
    * Scale shape: ONE hash exchange on the doc id. The cumulative
    * stopword count (phrase segmentation), the per-(doc, phrase)
    * length, the per-(doc, word) stats, and the final top-k rank are
    * all windows/groupings whose keys are supersets of the doc id, so
    * Catalyst reuses the first exchange (PlanSpec pins "keyword
    * extraction shuffles once"); per-partition cost is bounded by
    * document length, never corpus size. Docs that are empty or all
    * stopwords have no candidate phrases and are absent from the
    * output. Ties rank by score desc then phrase asc; scores round to
    * 6 dp before ranking so the ordering is engine-portable.
    *
    * `maxDocTokens` makes the per-task bound EXPLICIT: because the doc
    * id is the window partition key, one document is one task's work,
    * and a 10⁶-token book would land whole on a single core. Tokens
    * past the cap are truncated (RAKE's stats are doc-local, so the
    * result equals running on the truncated text — pinned by test);
    * the 256k default admits any real article untouched while bounding
    * a task at ~seconds of window work.
    */
  def keywords(docs: DataFrame, textCol: String, idCol: String,
               stopwords: Seq[String], topK: Int,
               scoring: String = "ratio",
               maxDocTokens: Int = 1 << 18): DataFrame = {
    require(Set("ratio", "degree", "freq")(scoring),
      s"scoring must be ratio|degree|freq, got $scoring")
    require(maxDocTokens > 0, s"maxDocTokens $maxDocTokens must be positive")
    val toks = docs.select(col(idCol),
      posexplode(words(col(textCol))).as(Seq("__pos", "__w")))
      .filter(col("__pos") < maxDocTokens)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val seg = toks
      .withColumn("__stop", col("__w").isin(stopwords: _*))
      .withColumn("__pid", sum(when(col("__stop"), 1).otherwise(0)).over(byDoc))
      .filter(!col("__stop"))
      .withColumn("__plen",
        count(lit(1)).over(Window.partitionBy(col(idCol), col("__pid"))))
    val byWord = Window.partitionBy(col(idCol), col("__w"))
    val wordScore = scoring match {
      case "ratio" =>
        sum(col("__plen")).over(byWord).cast(DoubleType) /
          count(lit(1)).over(byWord).cast(DoubleType)
      case "degree" => sum(col("__plen")).over(byWord).cast(DoubleType)
      case "freq"   => count(lit(1)).over(byWord).cast(DoubleType)
    }
    seg.withColumn("__ws", wordScore)
      .groupBy(col(idCol), col("__pid"))
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
            s => s.getField("__w"))).as("phrase"),
        round(sum(col("__ws")), 6).as("__s"))
      .groupBy(col(idCol), col("phrase"))
      .agg(max(col("__s")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("phrase").asc)))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("phrase"), col("score"), col("rank"))
  }

  /** Bloom-filter decontamination: the zero-corpus-shuffle variant of
    * [[decontaminate]], returning the FLAGGED doc ids. The
    * contamination set's n-gram hashes fold into a Bloom sketch via a
    * distributed `bloom_agg`; the sketch — a bounded model artifact
    * like the IVF centroids — ships into the plan as a binary literal,
    * and each document is flagged by an `exists` probe over its
    * shingles. The corpus side is a pure narrow map: no explode, no
    * join, no shuffle — at 100 TB the only data movement is the
    * benchmark-side aggregate, and the corpus is read once. Bloom
    * filters have no false negatives, so every truly contaminated
    * document is flagged; false positives (rate `fpp`) only ever
    * over-remove, which decontamination tolerates by design.
    *
    * Sizing: `expectedItems = 0` (the default) counts the gram table —
    * it is small by construction, and the count keeps the plan-literal
    * sketch proportional to the REAL set instead of a worst-case
    * guess. Spark's `BloomFilterAggregate` silently clamps its inputs
    * to `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`/
    * `maxNumItems` — a clamped sketch's false-positive rate quietly
    * collapses toward 1 and the "over-removal is bounded by fpp" claim
    * with it, so this fails fast instead and tells the caller which
    * conf to raise.
    */
  def bloomContaminated(docs: DataFrame, textCol: String, idCol: String,
                        grams: DataFrame, gramCol: String, n: Int,
                        expectedItems: Long = 0L,
                        fpp: Double = 0.001): DataFrame = {
    val spark = docs.sparkSession
    val items = if (expectedItems > 0) expectedItems
      else math.max(grams.count(), 1L)
    // optimal bit count m = -n ln p / (ln 2)^2 (standard Bloom sizing)
    val numBits = math.ceil(
      -items * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4194304").toLong
    require(numBits <= maxBits && items <= maxItems,
      s"Bloom sketch for $items grams at fpp=$fpp needs $numBits bits, but " +
        s"BloomFilterAggregate silently clamps to $maxBits bits / $maxItems items " +
        "(the clamped filter's false-positive rate collapses); raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits/maxNumItems or use " +
        "the join-based decontaminate")
    val sketch = grams
      .select(xxhash64(lower(col(gramCol))).as("__h"))
      .agg(call_function("bloom_agg", col("__h"),
        lit(items), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (sketch == null) docs.filter(lit(false)).select(col(idCol)) // empty gram set
    else docs.filter(exists(Dedup.shingles(lower(col(textCol)), n),
        g => call_function("bloom_might_contain", lit(sketch), xxhash64(g))))
      .select(col(idCol))
  }

  /** Corpus vocabulary with document frequency and IDF — the
    * building block for TF-IDF weighting, stopword discovery, and
    * vocabulary pruning over a crawl. Words are counted once per
    * document (document frequency, not term frequency).
    *
    * Scale shape: distinct-words-per-doc is a narrow map (the
    * `array_distinct` runs inside the row), then ONE hash shuffle on
    * the word with map-side combine; the corpus size joins in as a
    * broadcast 1-row aggregate, so no driver-side count() action.
    * Common words are capped at n_docs occurrences by the per-doc
    * dedup, which also bounds the skew any single word can produce.
    */
  def documentFrequency(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val perDocWords = df.select(col(idCol),
      explode(array_distinct(words(col(textCol)))).as("word"))
    val total = df.agg(count(lit(1)).as("__n_docs"))
    perDocWords.groupBy(col("word"))
      .agg(count(lit(1)).as("df")) // words are distinct per doc
      .crossJoin(broadcast(total))
      .select(col("word"), col("df"),
        round(log(col("__n_docs").cast(DoubleType) / col("df")), 6).as("idf"))
  }

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram model — the classic cheap fluency/quality proxy (CCNet
    * scores with a KenLM n-gram model; the self-trained unigram variant
    * needs no external model and already separates gibberish and
    * boilerplate-heavy documents from typical text). Lower (more
    * negative) = rarer words on average.
    *
    * Determinism across engines: floating-point addition is not
    * associative, so a distributed `avg(double)` is order-dependent at
    * the ULP level. Each word's log-prob is therefore fixed to an
    * integer number of micro-nats (`round(ln(p)*1e6)` as a long); the
    * per-doc sum is exact integer arithmetic in any order, and only the
    * final per-doc division returns to double.
    *
    * Scale shape: one word-count shuffle builds the vocabulary (map-side
    * combined, output is vocabulary-sized); the corpus total joins as a
    * broadcast 1-row aggregate; scoring joins exploded words to the
    * vocabulary (post-aggregation small — AQE broadcasts it) and
    * re-aggregates on the doc id. Document bodies never shuffle.
    */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(words(col(textCol))).as("word"))
    val total = tok.agg(count(lit(1)).as("__total"))
    val vocab = tok.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("word"),
        round(log(col("cnt").cast(DoubleType) / col("__total")) * 1e6)
          .cast(LongType).as("__logp_micro"))
    tok.join(vocab, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        round(sum(col("__logp_micro")) /
          (count(lit(1)) * lit(1e6)), 6).as("avg_logp"))
  }

  /** Interpolated-bigram language-model perplexity per document — the
    * classic CCNet/KenLM-shaped quality filter one level up from
    * [[unigramLogProb]]: fluent text scores low, shuffled or boilerplate
    * text scores high, because the CONDITIONAL probability of each word
    * given its predecessor carries word-order information a unigram
    * model cannot see. The model is fit on the scored corpus itself
    * (self-perplexity; fit on a clean reference corpus by passing it as
    * `df` and scoring the crawl through the same joins in a variant).
    *
    * For each adjacent word pair (w1, w2):
    *
    *   p(w2|w1) = λ · C(w1,w2)/C1(w1) + (1−λ) · Cu(w2)/T
    *
    * with C(w1,w2) the corpus bigram count, C1(w1) the count of w1 AS A
    * HISTORY (bigram rows starting with w1 — so p sums to 1 over the
    * observed vocabulary), Cu/T plain unigram frequency, and λ the
    * interpolation weight (the unigram back-off makes every observed
    * word reachable from any history). Per-doc:
    * `avg_logp = mean ln p`, `perplexity = exp(−avg_logp)`. Documents
    * with fewer than two tokens have no bigrams: null metrics, row kept.
    *
    * Determinism: per-bigram log-probs are fixed to integer micro-nats
    * (the [[unigramLogProb]] convention) so per-doc sums are exact in
    * any order; outputs round to 6 dp.
    *
    * Scale shape: bigram extraction is an in-row `transform` (narrow),
    * aggregated ONCE to per-(doc, bigram) counts that feed everything
    * downstream: the bigram and history model tables derive from that
    * frame by re-aggregation (never a second corpus pass), and scoring
    * joins the DISTINCT (doc, bigram) groups — each group's rounded
    * micro-nat log-prob is identical for every occurrence, so weighting
    * by the group count is exactly the per-occurrence sum at a fraction
    * of the join volume (natural text repeats bigrams). The unigram
    * table is the one other corpus pass (bigram ends under-count final
    * tokens, so it cannot be derived); its total is its own sum.
    * Post-aggregation model tables are vocabulary-sized — AQE
    * broadcasts them. Document bodies never shuffle.
    */
  def bigramPerplexity(df: DataFrame, textCol: String, idCol: String,
                       lambda: Double = 0.9): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, s"lambda $lambda must be in (0, 1]")
    val ts = words(col(textCol))
    // adjacent pairs via an index walk; guard: sequence(1, 0) would
    // DESCEND, so short docs must short-circuit to an empty array
    val pairs = when(size(col("__ts")) < 2, array())
      .otherwise(transform(sequence(lit(1), size(col("__ts")) - 1),
        i => struct(element_at(col("__ts"), i).as("__w1"),
          element_at(col("__ts"), i + 1).as("__w2"))))
    // one logical corpus pass → per-(doc, bigram) counts, feeding the
    // model tables by re-aggregation and the scoring join directly
    val bgc = df.select(col(idCol), ts.as("__ts"))
      .select(col(idCol), explode(pairs).as("__b"))
      .groupBy(col(idCol), col("__b.__w1").as("__w1"), col("__b.__w2").as("__w2"))
      .agg(count(lit(1)).as("__cb"))
    val uni = df.select(explode(ts).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cu"))
    val total = uni.agg(sum(col("__cu")).as("__tt"))
    val bi = bgc.groupBy(col("__w1"), col("__w2")).agg(sum(col("__cb")).as("__c2"))
    val hist = bi.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
    val scored = bgc
      .join(bi, Seq("__w1", "__w2"))
      .join(hist, Seq("__w1"))
      .join(uni.withColumnRenamed("__w", "__w2"), Seq("__w2"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("__cb"),
        round(log(lit(lambda) * col("__c2").cast(DoubleType) / col("__c1") +
          lit(1.0 - lambda) * col("__cu").cast(DoubleType) / col("__tt")) * 1e6)
          .cast(LongType).as("__micro"))
      .groupBy(col(idCol))
      .agg(sum(col("__cb")).as("n_bigrams"),
        sum(col("__cb") * col("__micro")).as("__sm"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), col("n_bigrams"),
        round(col("__sm") / (col("n_bigrams") * lit(1e6)), 6).as("avg_logp"),
        round(exp(-(col("__sm") / (col("n_bigrams") * lit(1e6)))), 6).as("perplexity"))
  }

  /** DSIR-style hashed-unigram importance log-weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every corpus document by how much more likely its words are
    * under a target-domain unigram model than under the corpus's own —
    * `log w(doc) = Σ_words [ln p_target(bucket(w)) − ln p_corpus(bucket(w))]`.
    * Words hash into `numBuckets` buckets (the hashed-n-gram trick that
    * bounds both models regardless of vocabulary size) and bucket
    * probabilities are add-one smoothed, so unseen buckets are defined.
    * Resampling by these weights then tilts a raw crawl toward the
    * target domain; the weights compose with [[Sampling.sample]] via
    * a Gumbel/exp draw or plain thresholding.
    *
    * Determinism: per-bucket log-probs are fixed to integer micro-nats
    * (the [[unigramLogProb]] convention), so the per-doc sum is exact
    * integer arithmetic in any order and any engine.
    *
    * Scale shape: each model is one bucket-count shuffle whose output
    * is ≤ `numBuckets` rows (map-side combined); the ≤ numBuckets-row
    * log-ratio table broadcast-joins against the exploded corpus
    * words, and the per-doc re-aggregation shuffles only (id, ratio)
    * pairs — document bodies never move. The bucket-domain completion
    * is a `spark.range(numBuckets)`, not a driver loop.
    */
  def dsirLogWeights(corpus: DataFrame, target: DataFrame,
                     textCol: String, idCol: String,
                     numBuckets: Int = 1024,
                     hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(numBuckets > 0, s"numBuckets $numBuckets must be positive")
    val spark = corpus.sparkSession
    def bucket(w: Column) = pmod(hashFn(w), lit(numBuckets.toLong))
    def toks(df: DataFrame) =
      df.select(col(idCol), explode(words(col(textCol))).as("word"))
        .select(col(idCol), bucket(col("word")).as("b"))
    // smoothed per-bucket log-prob over the FULL bucket domain: absent
    // buckets still get the +1 numerator, so the ratio is total. The
    // corpus total re-derives from the ≤numBuckets-row counts aggregate
    // — one shuffle per model, not a second scan of the token stream.
    def logProbs(tok: DataFrame, out: String) = {
      val counts = tok.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("__total"))
      spark.range(numBuckets).select(col("id").as("b"))
        .join(counts, Seq("b"), "left")
        .crossJoin(broadcast(total))
        .select(col("b"),
          round(log((coalesce(col("cnt"), lit(0L)) + 1L).cast(DoubleType) /
              (coalesce(col("__total"), lit(0L)) + numBuckets).cast(DoubleType)) * 1e6)
            .cast(LongType).as(out))
    }
    val corpusToks = toks(corpus)
    val ratio = logProbs(toks(target), "__lp_t")
      .join(logProbs(corpusToks, "__lp_r"), Seq("b"))
      .select(col("b"), (col("__lp_t") - col("__lp_r")).as("__lr_micro"))
    corpusToks
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        round(sum(col("__lr_micro")) / 1e6, 6).as("log_weight"))
  }

  /** Split each document into fixed-size word windows with `overlap`
    * carried words — context-window chunking for training-sequence or
    * retrieval-index construction. Chunk starts are `0, step, 2*step, …`
    * with `step = size - overlap`, stopping once the previous chunk
    * already covers the remaining words (a start is emitted only while
    * `start + overlap < n_words`, plus start 0 always); the final chunk
    * may be shorter than `size`. Zero-word documents yield no chunks.
    *
    * Scale shape: pure narrow map + explode — the chunk arithmetic is a
    * `sequence`/`slice` expression inside the row, no shuffle at all;
    * output order/partitioning follows the input scan.
    */
  def chunkWords(df: DataFrame, textCol: String, idCol: String,
                 size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0, s"chunk size $size must be positive")
    require(overlap >= 0 && overlap < size,
      s"overlap $overlap must be in [0, $size)")
    val step = size - overlap
    // raw whitespace tokens (no lowercasing — chunk text preserves case)
    val ws = filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0)
    val nw = org.apache.spark.sql.functions.size(col("__ws"))
    val starts = when(nw > 0,
      sequence(lit(0), greatest(nw - overlap - 1, lit(0)), lit(step)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), ws.as("__ws"))
      .select(col(idCol), col("__ws"),
        posexplode(starts).as(Seq("chunk_id", "start")))
      .select(col(idCol),
        col("chunk_id").cast(LongType),
        col("start").cast(LongType),
        least(lit(size), nw - col("start")).cast(LongType).as("n_tokens"),
        array_join(slice(col("__ws"), col("start") + 1, lit(size)), " ")
          .as("chunk_text"))
  }

  /** Deterministic sequence packing: assign each document to a
    * fixed-`budget` token bin by concatenating documents in id order
    * and cutting at budget boundaries (the concat-and-chop packing of
    * LM training pipelines). A document's bin is the one its first
    * token lands in; `bin_pos` is that token's offset within the bin
    * (a document may spill past its bin's end — the trainer's chop
    * handles the tail, the assignment only needs the start).
    *
    * A single global concatenation order would force a one-partition
    * window sort. Instead documents pack within bounded `groupSize`
    * id-range pack groups (`pack_group = id div groupSize`): the
    * cumulative-token window partitions on the group, so the sort
    * parallelizes across groups, any group fits one task by
    * construction, and the output is a pure function of (id,
    * n_tokens) — repartition-stable and re-derivable by any engine.
    * Bin identity is the pair (pack_group, bin_id).
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    budget: Int, groupSize: Int = 4096): DataFrame = {
    require(budget > 0, s"token budget $budget must be positive")
    require(groupSize > 0, s"pack group size $groupSize must be positive")
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol),
        wsTokenCount(col(textCol)).cast(LongType).as("n_tokens"),
        expr(s"CAST($idCol AS BIGINT) DIV $groupSize").as("pack_group"))
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("pack_group"),
        expr(s"__start DIV ${budget.toLong}").as("bin_id"),
        pmod(col("__start"), lit(budget.toLong)).as("bin_pos"),
        col("n_tokens"))
  }

  /** Per-language corpus statistics with EXACT discrete quantiles of
    * document word counts — the corpus census step of a curation
    * pipeline (how much data per language, how long are documents).
    *
    * Exact quantiles normally mean a per-group sort, which skews badly
    * when one language dominates a 100 TB crawl. This takes the
    * histogram route instead: word counts have bounded cardinality, so
    * a (lang, n_words) count aggregation — map-side combined, tiny
    * result — followed by a cumulative-count window over the histogram
    * rows gives the same exact quantile without ever sorting documents.
    * The heavy shuffle carries one row per distinct (lang, length),
    * not one per document.
    *
    * The quantile is the discrete lower quantile: the smallest value
    * whose cumulative count reaches `ceil(q * n)` — integer-only
    * position arithmetic, so any engine re-derives it bit-for-bit.
    */
  def corpusStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val perDoc = df.select(
      langId(col(textCol)).as("lang"),
      wsTokenCount(col(textCol)).cast(LongType).as("n_words"),
      length(col(textCol)).cast(LongType).as("n_chars"))
    val hist = perDoc.groupBy(col("lang"), col("n_words"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
    val cum = Window.partitionBy("lang").orderBy("n_words")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ceil(n/2) = floor((n+1)/2); ceil(9n/10) = floor((9n+9)/10)
    val p50pos = floor((col("nd") + 1) / 2)
    val p90pos = floor((col("nd") * 9 + 9) / 10)
    hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("nd", sum(col("cnt")).over(Window.partitionBy("lang")))
      .groupBy(col("lang"))
      .agg(
        max(col("nd")).as("n_docs"),
        sum(col("n_words") * col("cnt")).as("total_words"),
        sum(col("chars")).as("total_chars"),
        min(col("n_words")).as("min_words"),
        max(col("n_words")).as("max_words"),
        min(when(col("cum") >= p50pos, col("n_words"))).as("p50_words"),
        min(when(col("cum") >= p90pos, col("n_words"))).as("p90_words"))
  }

  /** Per-document top-`k` terms by TF-IDF — keyword extraction /
    * topic signals over a crawl. TF is the in-document term count; IDF
    * comes from [[documentFrequency]] (rounded to 6 decimals first, so
    * the score `round(tf * idf, 6)` is reproducible in any engine).
    * Ties break by word ascending, so the top-k set is deterministic.
    *
    * Scale shape: term counting is one (doc, word) shuffle with
    * map-side combine; the IDF join keys on the word (the vocabulary
    * side is post-aggregation small — AQE broadcasts it); the top-k
    * window shuffles on the doc id. No stage carries document bodies.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    val tf = df.select(col(idCol), explode(words(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val idf = documentFrequency(df, textCol, idCol).select(col("word"), col("idf"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("word").asc)
    tf.join(idf, Seq("word"))
      .withColumn("score", round(col("tf") * col("idf"), 6))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("word"), col("tf"), col("score"))
  }

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
