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

  /** EXACT heavy hitters without shuffling the tail: every item whose
    * frequency exceeds `support` of the input, with its exact count.
    *
    * A plain `groupBy(item).count()` shuffles one row per DISTINCT
    * item — at corpus scale that is the entire vocabulary, almost all
    * of it tail that can never pass the threshold. This instead runs
    * the two-pass frequent-items scheme: (1) a single-pass bounded
    * candidate sketch (Spark's Karp-Shenker-Papadimitriou
    * `stat.freqItems`, ≤ 1/support entries of state per partition,
    * merged on the driver — no shuffle at all) which guarantees every
    * item with frequency > support is a candidate (false POSITIVES
    * possible, false negatives impossible); then (2) an exact recount
    * of only the candidate set — the `isin` filter compiles to a
    * codegen'd hash-set probe in the scan stage, so the groupBy
    * shuffles candidate rows only. The exact recount makes the output
    * independent of partitioning and sketch internals: exactly the
    * items with `cnt > support * N`, re-derivable by any engine.
    *
    * The candidate pass and the row count run eagerly at call time
    * (bounded driver state, like the IVF quantizer fit).
    */
  def heavyHitters(items: DataFrame, itemCol: String, support: Double,
                   maxCandidates: Int = 1 << 20): DataFrame =
    heavyHittersWithTotal(items, itemCol, support, maxCandidates)._1

  /** [[heavyHitters]] plus the total row count the scheme already
    * measures — callers that need both (e.g. a hot-key FRACTION, like
    * [[graft.operators.Skew.autoSalts]]) avoid paying a second full
    * scan of the input on top of the candidate pass.
    */
  def heavyHittersWithTotal(items: DataFrame, itemCol: String, support: Double,
                            maxCandidates: Int = 1 << 20): (DataFrame, Long) = {
    require(support > 0 && support < 1, s"support $support must be in (0,1)")
    require(1 / support <= maxCandidates,
      s"support $support tracks ${(1 / support).toLong} candidates > $maxCandidates")
    val cands = items.stat.freqItems(Array(itemCol), support)
      .head().getSeq[Any](0)
    val n = items.count()
    val pruned =
      if (cands.isEmpty) items.limit(0)
      else items.where(col(itemCol).isin(cands: _*)) // pre-shuffle prune
    val hh = pruned.groupBy(col(itemCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(support) * lit(n))
    (hh, n)
  }

  /** Accuracy gate for `approx_top_k` (DataSketches frequent-items):
    * at least `bound` of the EXACT top-`k` items (count desc, item asc
    * — a deterministic total order) must appear in the approximate
    * top-k. With `maxItemsTracked >> k` the sketch's count error is
    * ≤ ~3.5/maxItemsTracked of the stream, far below top-k count
    * gaps, so the gate is stable run-to-run.
    */
  def topKGate(items: DataFrame, itemCol: String, k: Int,
               maxItemsTracked: Int, bound: Double): DataFrame = {
    val approx = items
      .agg(expr(s"approx_top_k($itemCol, $k, $maxItemsTracked)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), lit(1).as("hit"))
    val exactTop = items.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc).limit(k)
    exactTop.join(approx, Seq("item"), "left")
      .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("overlap"))
      .select(when(col("overlap") >= bound, lit("pass"))
        .otherwise(lit("fail")).as("status"))
  }
}
