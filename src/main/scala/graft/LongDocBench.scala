package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Retrieval, TextAnalysis}

/** Long-document stress harness for the text stack — the round-9 audit
  * flagged two latent per-document hazards: the in-row BM25 tf kernel
  * is quadratic in distinct terms (u·n comparisons inside ONE row) and
  * RAKE keyword extraction windows a whole document into one task. This
  * bench synthesizes a deterministic mixed corpus (mostly web-page
  * length plus a tail of ≥200k-token books), then records:
  *
  *  - `bm25_default`  — threshold routing: books explode+groupBy,
  *    short docs stay in-row (the production path)
  *  - `bm25_inrow`    — the threshold disabled (books forced through
  *    the quadratic kernel), quantifying the hazard the fallback
  *    removes
  *  - `keywords_capped` — RAKE with the 256k `maxDocTokens` guard
  *
  * Usage: `runMain graft.LongDocBench [nShort] [nBooks] [bookTokens]`
  * (defaults 2000 / 8 / 200000). Prints one JSON line on stdout.
  */
object LongDocBench {

  def main(args: Array[String]): Unit = {
    val nShort = args.lift(0).map(_.toInt).getOrElse(2000)
    val nBooks = args.lift(1).map(_.toInt).getOrElse(8)
    val bookTokens = args.lift(2).map(_.toInt).getOrElse(200000)
    val spark = GraftSession.get()

    // deterministic synthetic text: token i of doc d is w{(i*K+d) mod V}
    // — ~1k distinct terms per book, ~120 per short doc, no RNG
    def synth(n: Int, tokens: Int, vocab: Int, idOffset: Long) =
      spark.range(n).select((col("id") + idOffset).as("doc_id"),
        array_join(transform(sequence(lit(0), lit(tokens - 1)),
          i => concat(lit("w"),
            pmod(i * lit(2654435761L) + col("id"), lit(vocab)))), " ").as("text"))
    val corpus = synth(nShort, 160, 120, 0L)
      .union(synth(nBooks, bookTokens, 1000, 1000000L))
      .localCheckpoint() // pay generation once, time the operators
    val queries = spark.range(8).select(col("id").as("query_id"),
      concat(lit("w"), col("id") * 7, lit(" w"), col("id") * 13 + 1,
        lit(" w"), col("id") * 29 + 2).as("qtext")).localCheckpoint()

    def time(name: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[longdoc] $name: $secs%.2f s, $rows rows")
      (name, secs, rows)
    }

    val results = Seq(
      time("bm25_default") {
        Retrieval.bm25TopK(corpus, "text", "doc_id",
          queries, "qtext", "query_id", k = 10).count()
      },
      time("bm25_inrow") {
        Retrieval.bm25TopK(corpus, "text", "doc_id",
          queries, "qtext", "query_id", k = 10,
          longDocTokens = Int.MaxValue).count()
      },
      // the cap must actually BITE for the entry to measure the guard:
      // 64k < bookTokens truncates every book, bounding one task's
      // window work at 64k tokens regardless of document length
      time("keywords_capped") {
        TextAnalysis.keywords(corpus, "text", "doc_id",
          TextAnalysis.markers("en"), topK = 5, scoring = "degree",
          maxDocTokens = 1 << 16).count()
      })

    val ops = results.map { case (n, s, r) =>
      f""""$n":{"sec":$s%.3f,"rows":$r}"""
    }.mkString(",")
    println(s"""{"metric":"longdocbench","n_short":$nShort,"n_books":$nBooks,"book_tokens":$bookTokens,"ops":{$ops}}""")
    spark.stop()
  }
}
