package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Gap-closure entries (VERDICT r1 item 4): AVG, SAMPLE/arg-max,
  * sha1/sha384/sha512, StrBefore/StrAfter, IN, OFFSET — each a one-line
  * operator the round-1 pack never exercised.
  */
object ExtraQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // AVG with the exact-decimal-sum / count determinism policy
    "q23_avg" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg((sum(dec($"l_quantity")) / count(lit(1))).cast("double").as("avg_qty"),
          (sum(dec($"l_discount")) / count(lit(1))).cast("double").as("avg_disc"))
    }),

    // SAMPLE-style deterministic pick: arg-max row per group
    "q24_argmax" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(max_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("top_order"),
          max($"o_totalprice").as("top_price"))
    }),

    // sha1/sha384/sha512 against published test vectors (DuckDB lacks
    // sha1/384/512, so the oracle pins the expected digests)
    "q25_sha_vectors" -> ((s, _) => {
      import s.implicits._
      Seq("abc", "").toDF("input")
        .select($"input", sha1($"input").as("h1"),
          sha2($"input", 384).as("h384"), sha2($"input", 512).as("h512"))
    }),

    // StrBefore/StrAfter analogs: first word / rest of the text
    "q26_str_before_after" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          substring_index($"text", " ", 1).as("before_sp"),
          expr("substring(text, instr(text, ' ') + 1)").as("after_sp"))
        .filter(instr($"text", " ") > 0)
    }),

    // IN-list filter (SPARQL In / SQL IN)
    "q27_in_filter" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_returnflag".isin("A", "R"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"))
    }),

    // OFFSET + LIMIT pagination (deterministic via unique sort key)
    "q28_offset" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_orderkey")
        .offset(10).limit(5)
        .select($"o_orderkey", $"o_custkey")
    }),

    // ROLLUP hierarchy totals (drill-down telemetry shape); exact
    // decimal sums per the q01 determinism policy. Two-phase: a naive
    // `rollup` Expands every input row 3x BEFORE the partial aggregate
    // — at 100 TB that triples the heavy pass. SUM/COUNT are
    // decomposable, so aggregate once at the finest grain and rollup
    // the K-row result (Expand now amplifies ~K rows, not the corpus).
    "q32_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum(dec($"l_quantity")).as("__sq"), count(lit(1)).as("__n"))
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum($"__sq").cast("double").as("sum_qty"),
          sum($"__n").as("n_rows"))
    }),

    // PIVOT with an explicit value list (no extra pass to discover
    // values — the codegen-friendly form at scale)
    "q33_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(sum(dec($"o_totalprice")).cast("double"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q23_avg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) / count(*) AS DOUBLE) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q24_argmax" ->
      """SELECT o_custkey, o_orderkey AS top_order, o_totalprice AS top_price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS r
        |      FROM orders) WHERE r = 1""".stripMargin,
    "q25_sha_vectors" ->
      """SELECT * FROM (VALUES
        |  ('abc', 'a9993e364706816aba3e25717850c26c9cd0d89d',
        |   'cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed8086072ba1e7cc2358baeca134c825a7',
        |   'ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f'),
        |  ('', 'da39a3ee5e6b4b0d3255bfef95601890afd80709',
        |   '38b060a751ac96384cd9327eb1b1e36a21fdb71114be07434c0cc7bf63f6e1da274edebfe76f65fbd51ad2f14898b95b',
        |   'cf83e1357eefb8bdf1542850d66d8007d620e4050b5715dc83f4a921d36ce9ce47d0d13c5d85f2b0ff8318d2877eec2f63b931bd47417a81a538327af927da3e')
        |) t(input, h1, h384, h512)""".stripMargin,
    "q26_str_before_after" ->
      """SELECT doc_id, split_part(text, ' ', 1) AS before_sp,
        |  substr(text, instr(text, ' ') + 1) AS after_sp
        |FROM documents WHERE instr(text, ' ') > 0""".stripMargin,
    "q27_in_filter" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE l_returnflag IN ('A','R') GROUP BY l_returnflag""".stripMargin,
    "q28_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey OFFSET 10 LIMIT 5""".stripMargin,
    "q32_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q33_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O",
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F",
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin
  )
}
