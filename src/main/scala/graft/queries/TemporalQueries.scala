package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Temporal

/** CORRECTNESS entries for the temporal/interval operators: backward
  * as-of join, bucketed range join, and gap sessionization — classic
  * event-pipeline operators plain equi-joins don't express. Oracles
  * use DuckDB's native ASOF JOIN / inequality join / window SQL, so
  * the gate checks our single-shuffle formulations against an engine
  * that executes the textbook semantics directly.
  *
  * Timestamps surface as epoch microseconds (BIGINT) in every output:
  * events.ts is parquet TIMESTAMP(NANOS), which both engines truncate
  * to micros the same way (see [[Tables.events]]), and integer columns
  * hash identically where formatted timestamps might not.
  */
object TemporalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // backward as-of join: each click attaches its user's most recent
    // view at-or-before the click (inner: clicks with no prior view
    // drop out)
    "q29_asof_join" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id".as("view_id"))
      Temporal.asofBackward(clicks, views, Seq("user_id"), "ts")
        .select($"event_id".as("click_id"), $"user_id", $"r_view_id".as("view_id"),
          (unix_micros($"ts") - unix_micros($"r_ts")).as("gap_us"))
    }),

    // range join: lineitem quantities against [lo, hi) tier bands via
    // the bin-explode equi-join (bins of 10 over the 1..50 domain)
    "q30_range_join" -> ((s, d) => {
      import s.implicits._
      val tiers = Seq(("low", 1, 10), ("mid", 10, 25), ("high", 25, 41), ("bulk", 41, 51))
        .toDF("tier", "lo", "hi")
      Temporal.rangeJoin(Tables.lineitem(s, d).select($"l_orderkey", $"l_quantity"),
          "l_quantity", tiers, "lo", "hi", binWidth = 10)
        .groupBy($"tier")
        .agg(count(lit(1)).as("n"), sum(dec($"l_quantity")).cast("double").as("sum_qty"))
    }),

    // gap sessionization: a 6-hour silence starts a new session; one
    // row per (user, session) with count/extent/value rollups
    "q31_sessionize" -> ((s, d) => {
      import s.implicits._
      Temporal.sessionize(Tables.events(s, d), "user_id", "ts", gapSeconds = 6 * 3600)
        .groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros($"ts")).as("start_us"),
          max(unix_micros($"ts")).as("end_us"),
          sum(dec($"value")).cast("double").as("total_value"))
    }),

    // window navigation: prev/next event value, partition-first
    // timestamp, and quartile bucketing per user timeline — the
    // lag/lead/first_value/ntile family beyond q13's rank. One
    // window spec (one shuffle + one sort) serves all four.
    "q34_lag_lead" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d).select($"event_id", $"user_id",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        first(unix_micros($"ts")).over(w).as("first_us"),
        ntile(4).over(w).cast("long").as("quartile"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q29_asof_join" ->
      """SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id,
        |  epoch_us(CAST(c.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts""".stripMargin,

    "q30_range_join" ->
      """SELECT t.tier, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l
        |JOIN (VALUES ('low',1,10),('mid',10,25),('high',25,41),('bulk',41,51)) t(tier,lo,hi)
        |  ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
        |GROUP BY t.tier""".stripMargin,

    "q31_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP)) -
        |              epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 21600000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM g)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(epoch_us(CAST(ts AS TIMESTAMP))) AS start_us,
        |  max(epoch_us(CAST(ts AS TIMESTAMP))) AS end_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    // ORDER BY the micros-cast ts so both engines see the same order
    // (events.ts is TIMESTAMP_NS raw; Spark surfaces truncated micros)
    "q34_lag_lead" ->
      """SELECT event_id, user_id,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  first_value(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS first_us,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)""".stripMargin
  )
}
