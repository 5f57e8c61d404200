package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse keyword retrieval over a document corpus — the inverted-index
  * complement to the dense-vector search in [[Similarity]]. Training-data
  * pipelines use it for query-grounded curation (pulling the docs a
  * benchmark question would retrieve), fuzzy decontamination triage, and
  * building retrieval eval sets.
  *
  * The 100 TB shape matters more than the formula: postings are derived
  * per document WITHOUT a corpus shuffle (term frequencies come from an
  * in-row `transform` over the token array, so tf extraction is a narrow
  * map), the tiny query-term table broadcasts INTO that narrow stage, and
  * only the postings that match a query term ever enter a shuffle. The
  * corpus is read once; everything that moves afterwards is
  * query-proportional, not corpus-proportional.
  */
object Retrieval {

  /** Whitespace tokens, lowercased, empties dropped — the same
    * tokenizer as TextAnalysis so retrieval and quality metrics agree
    * on what a "word" is.
    */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), w => length(w) > 0)

  /** Token-count threshold above which [[postings]] switches from the
    * in-row tf kernel to explode+groupBy. The in-row kernel is
    * quadratic in distinct terms per document (u·n comparisons): ideal
    * for web-page-length text, but one book-length document (10⁵⁺
    * tokens, 10⁴⁺ distinct terms) would cost ~10⁹ comparisons inside a
    * single row and stall an executor core. At 8192 tokens the
    * worst-case in-row cost stays ~10⁷ comparisons (&lt;10 ms), and
    * anything longer pays one SHUFFLE OF ITS OWN TOKENS instead —
    * linear, and proportional to the long tail only, never the corpus.
    */
  val LongDocTokens = 8192

  /** Per-document postings (doc, dl, term, tf). Documents at or below
    * `longDocTokens` compute term frequencies in-row (`transform` over
    * the token array — a narrow map, no corpus shuffle; quadratic in
    * distinct terms, cheap at that length). Longer documents explode
    * their tokens and groupBy (doc, term) — linear per token, with a
    * shuffle proportional to the LONG documents' tokens only. Both
    * branches produce identical rows (pinned by test); the cost of the
    * split is a second column-pruned pass over (id, text) for the long
    * branch, which on a mixed 100 TB corpus is noise next to either an
    * executor-stalling row or an all-corpus shuffle.
    */
  private[pipeline] def postings(docs: DataFrame, textCol: String, idCol: String,
                                 longDocTokens: Int = LongDocTokens): DataFrame = {
    require(longDocTokens > 0, s"longDocTokens $longDocTokens must be positive")
    val ts = tokens(col(textCol))
    val short = docs.select(col(idCol).as("__doc"), ts.as("__ts"))
      .select(col("__doc"), col("__ts"), size(col("__ts")).as("__dl"))
      .filter(col("__dl") <= longDocTokens)
      .select(col("__doc"), col("__dl"),
        explode(transform(array_distinct(col("__ts")),
          t => struct(t.as("__t"),
            size(filter(col("__ts"), x => x === t)).as("__tf")))).as("__p"))
      .select(col("__doc"), col("__dl"), col("__p.__t").as("__t"), col("__p.__tf").as("__tf"))
    // cheap sieve before the long branch re-tokenizes: k whitespace
    // tokens need ≥ 2k−1 characters (k token chars + k−1 separators),
    // so length ≤ 2·threshold rules a doc out with a per-row length
    // check — on an all-short corpus the second pass scans text bytes
    // but never pays the split/explode
    val long = docs.filter(length(col(textCol)) > lit(2L * longDocTokens))
      .select(col(idCol).as("__doc"), ts.as("__ts"))
      .select(col("__doc"), col("__ts"), size(col("__ts")).as("__dl"))
      .filter(col("__dl") > longDocTokens)
      .select(col("__doc"), col("__dl"), explode(col("__ts")).as("__t"))
      .groupBy(col("__doc"), col("__dl"), col("__t"))
      .agg(count(lit(1)).cast("int").as("__tf"))
      .select(col("__doc"), col("__dl"), col("__t"), col("__tf"))
    short.union(long)
  }

  /** BM25 top-k retrieval: for each query row, the `k` highest-scoring
    * documents under Okapi BM25 with the non-negative (Lucene-style)
    * idf,
    *
    *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *   score(q, d) = Σ_{t ∈ distinct(q)} idf(t) ·
    *                 tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * where N is the corpus size, dl the document token count, avgdl its
    * corpus mean, and df(t) the number of documents containing t. Query
    * terms are deduplicated (standard BM25 ignores query-side tf);
    * terms absent from the corpus contribute nothing. Scores are
    * rounded to 6 dp BEFORE ranking — ties break on ascending doc id —
    * so the ranking is reproducible across engines and runs (float
    * partial-aggregation order cannot flip a rank).
    *
    * Plan shape: postings narrow → broadcast semi-filter by query terms
    * → df over the SURVIVING postings only (tiny agg; equals corpus df
    * because filtering by term keeps every posting of that term) → one
    * candidate-proportional shuffle for the per-(query, doc) sum → a
    * per-query top-k window. N/avgdl ride in as a broadcast scalar row.
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: DataFrame, qTextCol: String, qIdCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               longDocTokens: Int = LongDocTokens): DataFrame = {
    val (post, stats) = corpusPostings(docs, textCol, idCol, longDocTokens)
    bm25TopKFromPostings(post, stats, queries, qTextCol, qIdCol, k, k1, b)
  }

  /** The tokenize-and-count pass of [[bm25TopK]] as a reusable value:
    * (postings, stats). A corpus snapshot serving several retrieval
    * tasks in one job — ranking plus decontamination triage is the
    * canonical pair — should compute this ONCE (and typically
    * `localCheckpoint` it) instead of paying a corpus pass per task;
    * at 100 TB the corpus passes are the whole cost. The persisted
    * [[buildTextIndex]] is the cross-job form of the same idea.
    */
  def corpusPostings(docs: DataFrame, textCol: String, idCol: String,
                     longDocTokens: Int = LongDocTokens): (DataFrame, DataFrame) =
    (postings(docs, textCol, idCol, longDocTokens),
      docs.select(tokens(col(textCol)).as("__ts"))
        .agg(count(lit(1)).as("__n"), avg(size(col("__ts"))).as("__avgdl")))

  /** [[bm25TopK]] over precomputed [[corpusPostings]]. */
  def bm25TopKFromPostings(post: DataFrame, stats: DataFrame,
                           queries: DataFrame, qTextCol: String, qIdCol: String,
                           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queries
      .select(col(qIdCol).as("__q"), explode(array_distinct(tokens(col(qTextCol)))).as("__t"))
    val cand = post.join(broadcast(qTerms.select("__t").distinct()), Seq("__t"))
    scoreAndRank(cand, qTerms, stats, k, k1, b)
  }

  /** Shared BM25 scoring tail: candidates (__t, __doc, __dl, __tf) →
    * df over the surviving postings (row count per term IS the corpus
    * document frequency — each doc emits one posting row per distinct
    * term, and candidate filtering keeps every posting of a matched
    * term) → per-(query, doc) contribution sum → per-query top-k.
    */
  private def scoreAndRank(cand: DataFrame, qTerms: DataFrame, stats: DataFrame,
                           k: Int, k1: Double, b: Double): DataFrame = {
    val dfT = cand.groupBy("__t").agg(count(lit(1)).as("__df"))
    val contrib = broadcast(qTerms).join(cand, Seq("__t"))
      .join(broadcast(dfT), Seq("__t"))
      .crossJoin(broadcast(stats))
      .select(col("__q"), col("__doc"),
        (log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) *
          (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__c"))
    val scored = contrib.groupBy("__q", "__doc")
      .agg(round(sum(col("__c")), 6).as("score"))
    val w = Window.partitionBy("__q").orderBy(col("score").desc, col("__doc").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__q").as("query_id"), col("__doc").as("doc_id"),
        col("score"), col("rank"))
  }

  /** Persist an inverted text index: `dir/stats` (one row: corpus size
    * and mean document length) plus `dir/postings` — (term, doc_id, dl,
    * tf) partitioned by `bucket = xxhash64(term) mod buckets`. The
    * tokenize/count pass runs ONCE at build time; every subsequent
    * query via [[bm25TopKIndexed]] reads only the buckets its terms
    * hash into. The [[Similarity.buildIvfIndex]]-for-text: at 100 TB the
    * difference between re-tokenizing the corpus per query batch and a
    * partition-pruned scan of matched postings.
    *
    * `buckets` trades pruning sharpness against file count: each query
    * term opens one bucket, so a q-term query batch reads ≤ q/buckets
    * of the postings. Postings within a bucket cluster by term so the
    * term equi-join stays tight under parquet row-group stats.
    */
  /** Fuzzy decontamination triage — the composed use this module was
    * built for: BM25-score the corpus against benchmark questions, keep
    * documents whose best score reaches `minScore` (the fuzzy recall
    * net: paraphrases and partial copies that exact n-gram matching
    * misses), then EXACT-verify just those candidates with
    * [[TextAnalysis.contaminationReport]] against the benchmark's word
    * `n`-grams. Output per flagged doc: (id, max_bm25, n_grams, hits,
    * contamination) — threshold `contamination` to drop, audit the
    * rest.
    *
    * Scale shape: stage 1 is [[bm25TopK]] (corpus read once, candidate-
    * proportional shuffle); stage 2 re-reads only the ≤ |bench|·k
    * flagged docs for exact gram counting. The expensive exact pass is
    * candidate-proportional, never corpus-proportional.
    */
  def decontaminationTriage(docs: DataFrame, textCol: String, idCol: String,
                            bench: DataFrame, qTextCol: String, qIdCol: String,
                            minScore: Double, k: Int = 100, n: Int = 3,
                            longDocTokens: Int = LongDocTokens,
                            precomputed: Option[(DataFrame, DataFrame)] = None): DataFrame =
    triageVerify(
      precomputed match {
        // a caller already holding corpusPostings (e.g. because BM25
        // ranking runs in the same job) skips this operator's corpus
        // pass — stage 1 becomes candidate-proportional too. NOTE:
        // `longDocTokens` is then unused — the routing threshold was
        // fixed when the postings were built, so pass the SAME value to
        // corpusPostings or accept its default
        case Some((post, stats)) =>
          bm25TopKFromPostings(post, stats, bench, qTextCol, qIdCol, k)
        case None =>
          bm25TopK(docs, textCol, idCol, bench, qTextCol, qIdCol, k,
            longDocTokens = longDocTokens)
      },
      docs, textCol, idCol, bench, qTextCol, minScore, n)

  /** [[decontaminationTriage]] against a persisted [[buildTextIndex]]
    * layout: the corpus is never re-tokenized — BM25 candidates come
    * from the partition-pruned postings scan, and only the flagged
    * documents are read back for exact gram verification. Identical
    * output to the direct form (both reduce to the same deterministic
    * scores), at index-lookup cost instead of a corpus pass — the
    * production shape when triage runs per benchmark drop, not once.
    */
  def decontaminationTriageIndexed(docs: DataFrame, textCol: String, idCol: String,
                                   bench: DataFrame, qTextCol: String, qIdCol: String,
                                   indexDir: String, minScore: Double,
                                   k: Int = 100, n: Int = 3): DataFrame =
    triageVerify(
      bm25TopKIndexed(bench, indexDir, qTextCol, qIdCol, k),
      docs, textCol, idCol, bench, qTextCol, minScore, n)

  /** Shared triage tail: max-score threshold over the BM25 top-k, then
    * exact contamination verification on the flagged docs only.
    */
  private def triageVerify(topk: DataFrame, docs: DataFrame, textCol: String,
                           idCol: String, bench: DataFrame, qTextCol: String,
                           minScore: Double, n: Int): DataFrame = {
    val flagged = topk
      .groupBy(col("doc_id")).agg(max(col("score")).as("max_bm25"))
      .filter(col("max_bm25") >= minScore)
      .select(col("doc_id").as(idCol), col("max_bm25"))
    val grams = bench.select(
      explode(Dedup.shingles(lower(col(qTextCol)), n)).as("gram")).distinct()
    TextAnalysis.contaminationReport(docs.join(flagged, Seq(idCol)),
        textCol, idCol, grams, "gram", n)
      .join(flagged, Seq(idCol))
      .select(col(idCol), col("max_bm25"), col("n_grams"), col("hits"),
        col("contamination"))
  }

  /** Per-JVM cache of each text index's stats row (corpus size, mean
    * doc length, bucket modulus), keyed by a CONTENT TOKEN of the stats
    * directory — the sorted (name, length, mtime) listing of its data
    * files: a rebuild at the same path — from any JVM — writes part
    * files with fresh task-UUID names, so the token changes even when
    * the rebuild lands within the same coarse (1 s) filesystem
    * timestamp as a prior read, and the reload is forced; a
    * long-running query server can never keep serving a stale bucket
    * modulus (which would silently prune to the wrong partitions). The
    * token probe is one filesystem listing per query batch vs. the
    * Spark job the cache saves.
    */
  private val statsCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, (Long, Double, Int))]

  private def statsToken(spark: org.apache.spark.sql.SparkSession,
                         statsPath: org.apache.hadoop.fs.Path): String = {
    val fs = statsPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(statsPath)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(";")
  }

  def buildTextIndex(docs: DataFrame, textCol: String, idCol: String,
                     dir: String, buckets: Int = 64,
                     longDocTokens: Int = LongDocTokens): Unit = {
    require(buckets > 0, s"buckets $buckets must be positive")
    statsCache.remove(dir) // a rebuild at the same path changes the facts
    // the bucket modulus is a layout fact queries must reproduce, so it
    // rides in the stats row alongside the corpus aggregates
    docs.select(tokens(col(textCol)).as("__ts"))
      .agg(count(lit(1)).as("__n"), avg(size(col("__ts"))).as("__avgdl"))
      .withColumn("__buckets", lit(buckets))
      .repartition(1) // one row: a single stats file read at query time
      .write.mode("overwrite").parquet(s"$dir/stats")
    postings(docs, textCol, idCol, longDocTokens)
      .select(col("__t").as("term"), col("__doc").as("doc_id"),
        col("__dl").as("dl"), col("__tf").as("tf"),
        pmod(xxhash64(col("__t")), lit(buckets.toLong)).cast("int").as("bucket"))
      .sortWithinPartitions("bucket", "term")
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
  }

  /** BM25 top-k against a persisted [[buildTextIndex]] layout. The
    * query batch is driver-bounded by contract (like the ANN probe
    * sets), so its distinct term BUCKETS — computed by the same Spark
    * `xxhash64` expression the builder used — collect once into a
    * STATIC `isin` filter: the postings scan partition-prunes to the
    * matched buckets before the term equi-join, visible as
    * `PartitionFilters` in the plan. df/avgdl semantics are identical
    * to [[bm25TopK]]: a term's postings live entirely in its bucket,
    * so pruning drops no posting of a matched term and document
    * frequencies stay exact.
    */
  def bm25TopKIndexed(queries: DataFrame, dir: String,
                      qTextCol: String, qIdCol: String,
                      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = queries.sparkSession
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val token = statsToken(spark, statsPath)
    val (n, avgdl, buckets) = statsCache.get(dir).filter(_._1 == token)
      .map(_._2).getOrElse {
        val r = spark.read.parquet(statsPath.toString).head()
        val v = (r.getAs[Long]("__n"), r.getAs[Double]("__avgdl"),
          r.getAs[Int]("__buckets"))
        statsCache.put(dir, (token, v))
        v
      }
    val stats = spark.range(1).select(lit(n).as("__n"), lit(avgdl).as("__avgdl"))
    val qTerms = queries
      .select(col(qIdCol).as("__q"), explode(array_distinct(tokens(col(qTextCol)))).as("__t"))
    val hitBuckets = qTerms
      .select(pmod(xxhash64(col("__t")), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0))
    val cand = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(hitBuckets.toSeq: _*))
      .select(col("term").as("__t"), col("doc_id").as("__doc"),
        col("dl").as("__dl"), col("tf").as("__tf"))
      .join(broadcast(qTerms.select("__t").distinct()), Seq("__t"))
    scoreAndRank(cand, qTerms, stats, k, k1, b)
  }
}
