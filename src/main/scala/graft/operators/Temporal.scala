package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / interval operators a training-data or event pipeline
  * needs that plain SQL joins don't express directly: backward as-of
  * join, bucketed range join, and gap-based sessionization.
  *
  * All three are single-shuffle plans:
  *   - as-of join: union the two inputs, one shuffle+sort on the `by`
  *     keys, then a running `last(ignoreNulls)` window picks the most
  *     recent right row for every left row. No join explosion, no
  *     per-row probe; at 100 TB this is one sort-merge pass.
  *   - range join: the range side explodes into the coarse bins it
  *     covers, turning the inequality join into an equi-join on the bin
  *     (plus a residual filter). Never a broadcast-nested-loop over the
  *     fact side; bin width trades range-side duplication for fact-side
  *     selectivity.
  *   - sessionize: lag + running sum over one (key, ts) sort.
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the latest right
    * row with the same `by` keys and `right.ts <= left.ts` (ties at
    * equal ts match, like DuckDB's ASOF JOIN). Right's non-key columns
    * come back prefixed with `rightPrefix`; `joinType` "inner" drops
    * unmatched left rows, "left" keeps them with null payload.
    */
  def asofBackward(left: DataFrame, right: DataFrame, by: Seq[String],
                   tsCol: String, rightPrefix: String = "r_",
                   joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asofBackward joinType must be inner|left, got $joinType")
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(by.contains)
    val lType = left.schema
    val rType = right.select(rPayload.map(col): _*).schema

    // Common shape: (by..., __ts, __side, __l, __r). Right rows sort
    // before left rows at equal ts so an equal-timestamp match counts.
    val l2 = left.select(
      by.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r2 = right.select(
      by.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(rPayload.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val kept = if (joinType == "inner") matched.filter(col("__m").isNotNull) else matched
    kept.select(
      lCols.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  /** Bucketed range join: rows of `fact` against ranges
    * `[loCol, hiCol)` of `ranges`. The range side explodes into the
    * `binWidth`-sized bins it covers; the join is then bin-equality
    * plus a residual bound filter, so Catalyst plans a hash/sort-merge
    * (or broadcast, when the exploded range side is small) equi-join —
    * never a nested loop over the fact table. A fact row lands in
    * exactly one bin, so no result deduplication is needed.
    */
  def rangeJoin(fact: DataFrame, valueCol: String, ranges: DataFrame,
                loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // last covered bin: hi is exclusive, so an hi on a bin boundary
    // does not reach into the next bin
    val lastBin = (floor(col(hiCol) / binWidth) -
      when(pmod(col(hiCol), lit(binWidth)) === 0, 1).otherwise(0)).cast("long")
    val rb = ranges.where(col(loCol) < col(hiCol))
      .withColumn("__bin", explode(sequence(floor(col(loCol) / binWidth).cast("long"), lastBin)))
    fact.withColumn("__bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(rb, Seq("__bin"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** Gap-based sessionization (batch analog of the streaming session
    * windows in [[graft.streaming.StreamingIngest]]): a new session
    * starts whenever the gap to the previous event of the same key
    * exceeds `gapSeconds`. Adds a per-key `session_seq` (1-based, in ts
    * order). One shuffle+sort on the key; both windows share it.
    */
  def sessionize(events: DataFrame, byCol: String, tsCol: String,
                 gapSeconds: Long, sessionCol: String = "session_seq"): DataFrame = {
    val order = Window.partitionBy(byCol).orderBy(col(tsCol))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(order))
      .withColumn("__brk",
        when(col("__prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev_ts")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn(sessionCol, sum(col("__brk")).over(cum))
      .drop("__prev_ts", "__brk")
  }
}
