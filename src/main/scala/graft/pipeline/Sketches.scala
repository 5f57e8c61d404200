package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Sketch-backed approximate aggregates — the 100 TB workhorses for
  * corpus telemetry, where exact answers are either unnecessary
  * (dashboard-grade distinct counts) or force a full shuffle of
  * high-cardinality keys.
  *
  *   - distinct counting rides Spark's HyperLogLog++
  *     (`approx_count_distinct`): fixed ~kilobytes of state per group
  *     regardless of cardinality, merged tree-wise — no shuffle of the
  *     values themselves, only the sketches.
  *   - quantiles ride `approx_percentile` (Greenwald-Khanna): bounded
  *     state per group at any input size, vs the exact path's
  *     histogram shuffle in [[TextAnalysis.corpusStats]] (itself only
  *     viable because word counts have bounded cardinality).
  *
  * Both are deterministic in Spark (no random seeds), but their exact
  * outputs are implementation-defined, so no SQL oracle can re-derive
  * them. Instead each gets an accuracy GATE in the style of the ANN
  * recall gates (p23-p25): the plan computes the approximate AND the
  * exact answer and folds them into one constant `pass`/`fail` row —
  * the driver's oracle pins `pass`, so an accuracy collapse fails the
  * correctness gate, not just a unit test.
  */
object Sketches {

  /** HLL++ distinct count of `valueCol`, grouped by `keys` (global
    * when empty). `rsd` is the target relative standard deviation.
    */
  def approxDistinct(df: DataFrame, valueCol: String, rsd: Double,
                     keys: Seq[String] = Nil): DataFrame = {
    val agg = approx_count_distinct(col(valueCol), rsd).as("approx_distinct")
    if (keys.isEmpty) df.agg(agg)
    else df.groupBy(keys.map(col): _*).agg(agg)
  }

  /** Approximate quantiles of `valueCol` at `qs` (Greenwald-Khanna;
    * `accuracy` trades state for error: rank error <= 1/accuracy).
    */
  def approxQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(valueCol),
      array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Accuracy gate: HLL++ vs exact distinct count in ONE plan, folded
    * to a `pass`/`fail` row. `bound` is the max tolerated relative
    * error (pick ~2.5x the rsd; HLL++ error is approximately normal,
    * so 2.5 sigma passes with probability ~0.988 per run and the
    * estimator is deterministic, so a pass is stable across runs).
    */
  def distinctCountGate(df: DataFrame, valueCol: String, rsd: Double,
                        bound: Double): DataFrame =
    df.agg(
      countDistinct(col(valueCol)).cast(DoubleType).as("exact"),
      approx_count_distinct(col(valueCol), rsd).cast(DoubleType).as("approx"))
      .select(when(abs(col("approx") - col("exact")) / col("exact") <= bound,
        lit("pass")).otherwise(lit("fail")).as("status"))

  /** Accuracy gate: approximate vs exact quantile. The exact side uses
    * `percentile` (exact interpolated); the bound is on RELATIVE VALUE
    * error, appropriate for long-tailed length/size distributions.
    */
  def quantileGate(df: DataFrame, valueCol: String, q: Double,
                   accuracy: Int, bound: Double): DataFrame =
    df.agg(
      percentile(col(valueCol), lit(q)).as("exact"),
      percentile_approx(col(valueCol), lit(q), lit(accuracy))
        .cast(DoubleType).as("approx"))
      .select(when(abs(col("approx") - col("exact")) / col("exact") <= bound,
        lit("pass")).otherwise(lit("fail")).as("status"))
}
