package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * All draws are content-addressed: a row's inclusion depends only on
  * the md5 of its id (+ salt), never on partitioning or row order. That
  * makes samples (a) reproducible across runs and engines, (b) stable
  * under repartitioning — `rand(seed)` is per-partition-deterministic
  * only, so a repartition reshuffles the sample — and (c) consistent
  * across tables: sampling two tables by the same key draws the same
  * ids, so joins between samples stay dense. Every operator here is a
  * narrow map (no shuffle); at 100 TB the sample predicate evaluates
  * inside the scan stage and rows are dropped before anything moves.
  */
object Sampling {

  /** Uniform [0,1) draw from md5(id ++ salt): the first 8 hex chars as
    * a 32-bit integer over 2^32. Portable to any engine with md5.
    */
  def hashDraw(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast(StringType), lit(salt))), 1, 8), 16, 10)
      .cast(LongType) / lit(4294967296.0)

  /** Deterministic Bernoulli sample: keep rows whose draw < fraction. */
  def sample(df: DataFrame, idCol: String, fraction: Double,
             salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    df.filter(hashDraw(col(idCol), salt) < fraction)
  }

  /** Assign every row to a named split (e.g. train/val/test) by carving
    * [0,1) into cumulative-weight intervals over the hash draw. Weights
    * must sum to 1 so every row lands in exactly one split.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val u = hashDraw(col(idCol), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    var e: Column = lit(splits.last._1) // the tail interval absorbs rounding
    for (((name, _), c) <- splits.zip(cum).init.reverse)
      e = when(u < c, lit(name)).otherwise(e)
    df.withColumn("split", e)
  }

  /** Cap the number of rows per key (the "domain cap" of crawl
    * curation: no source may contribute more than `maxPerKey`
    * documents). Survivors are a deterministic uniform sample of the
    * key's rows — ranked by the content-addressed hash draw, id as the
    * total-order tie-break — so the cap composes with [[sample]] /
    * [[assignSplits]] on the same salt without correlation.
    *
    * Scale shape: one shuffle on the key, then a per-key sort feeding
    * `row_number`. A pathologically dominant key sorts all its rows on
    * one task; if one key can exceed a task's memory, pre-thin it with
    * [[stratifiedSample]] (cheap narrow filter) before the exact cap.
    */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String, maxPerKey: Int,
                salt: String = ""): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey $maxPerKey must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashDraw(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__cap_rank", row_number().over(w))
      .filter(col("__cap_rank") <= maxPerKey)
      .drop("__cap_rank")
  }

  /** Class-balance resampling: downsample every class to the size of
    * the SMALLEST one (the standard rebalance before training on a
    * skewed label distribution), keeping per class the rows with the
    * smallest deterministic hash draw — retry-stable and
    * engine-portable like every sampler here. The minority count is a
    * one-row-per-class aggregate collected eagerly at call time (the
    * same bounded model-fit pattern as the IVF centroids and
    * autoSalts); the cap itself is [[capPerKey]]'s one-shuffle shape.
    */
  def balanceClasses(df: DataFrame, idCol: String, labelCol: String,
                     salt: String = ""): DataFrame = {
    val minRow = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n"))).head()
    if (minRow.isNullAt(0)) df // empty input: nothing to balance
    else capPerKey(df, idCol, labelCol, minRow.getLong(0).toInt, salt)
  }

  /** Deterministic global shuffle: a content-addressed total order for
    * randomizing training-example order. Rows sort by their hash draw
    * (id as total-order tie-break), exposed as `shuffle_key` so
    * downstream writers can verify or re-sort; the same (id, salt)
    * always lands at the same position regardless of partitioning, and
    * a new salt is a fresh epoch permutation.
    *
    * Scale shape: one range-partitioned total sort (Spark samples the
    * key boundaries) — the standard total-order write path; the draw
    * keys are uniform by construction, so range partitions are
    * skew-free no matter how skewed the ids. A LIMIT-k head executes
    * as take-ordered, never a full sort.
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String = ""): DataFrame =
    df.withColumn("shuffle_key", hashDraw(col(idCol), salt))
      .orderBy(col("shuffle_key").asc, col(idCol).asc)

  /** Temperature-based mixture resampling: flatten a skewed key
    * distribution (language, domain, source) toward uniform, the way
    * multilingual corpora are rebalanced before training (XLM-R-style
    * `q_k ∝ p_k^T` sampling, re-expressed as a per-key Bernoulli keep
    * rate). Each key keeps rows with probability
    * `(c_min / c_k)^(1 - temperature)`: `temperature = 1` keeps every
    * row (no change), `temperature = 0` equalizes the expected count of
    * every key to the smallest key's count, and values between
    * interpolate geometrically.
    *
    * Scale shape: one tiny per-key count aggregate (rows = key
    * cardinality — languages or domains, never documents), broadcast
    * back onto the corpus, then the usual narrow content-addressed
    * filter. No shuffle touches the documents themselves, so at 100 TB
    * the keep/drop decision happens inside the scan stage. The draw is
    * [[hashDraw]], so the survivor set is reproducible across engines
    * and stable under repartitioning, and composes with the other
    * samplers on a distinct salt.
    */
  def temperatureResample(df: DataFrame, idCol: String, keyCol: String,
                          temperature: Double, salt: String = ""): DataFrame = {
    require(temperature >= 0.0 && temperature <= 1.0,
      s"temperature $temperature out of [0,1]")
    // per-key counts collected eagerly (rows = key cardinality —
    // languages or domains, never documents; the same bounded
    // model-fit pattern as balanceClasses and the IVF centroids).
    // Referencing the aggregate lazily in both the rate table and its
    // global min would re-run the counting scan per reference — this
    // way the corpus is read exactly twice: once to count, once to
    // filter, which is the floor for a rate that depends on totals.
    val countsDf = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__key_n"))
    val counts = countsDf.collect()
    if (counts.isEmpty) df
    else {
      val minN = counts.map(_.getLong(1)).min
      val local = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(counts: _*), countsDf.schema)
      // rate arithmetic stays IN Spark expressions so the 9-dp
      // quantization grid is bit-identical to the SQL re-derivation:
      // Math.pow differs from other engines' pow by ≤1 ulp, and
      // rounding both sides to the same decimal grid makes the
      // survivor set engine-portable
      val rates = local.select(col(keyCol).as("__rate_key"),
        round(pow(lit(minN).cast("double") / col("__key_n"),
          lit(1.0 - temperature)), 9).as("__keep_p"))
      // null-safe join: a NULL key is a group like any other (it was
      // counted above), so its rows resample at their own rate instead
      // of silently vanishing through a plain equi-join
      df.join(broadcast(rates), col(keyCol) <=> col("__rate_key"))
        .filter(hashDraw(col(idCol), salt) < col("__keep_p"))
        .select(df.columns.map(col).toSeq: _*) // restore input column order
    }
  }

  /** Per-stratum Bernoulli sample: keep a row if its draw < the
    * fraction configured for its key (e.g. downsample the dominant
    * language, keep the rare ones whole). Keys without a configured
    * fraction fall back to `default`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, keyCol: Column,
                       fractions: Map[String, Double], default: Double = 0.0,
                       salt: String = ""): DataFrame = {
    // stage the key once behind the optimizer fence: the when-chain
    // references it per configured stratum, and predicate pushdown
    // would otherwise substitute the full key expression (often a large
    // tree like language-ID) into every branch
    val key = col("__strat_key")
    val frac = fractions.foldLeft(lit(default)) {
      case (acc, (k, f)) => when(key === k, lit(f)).otherwise(acc)
    }
    df.withColumn("__strat_key",
        call_function(graft.functions.OptimizerFence.name, keyCol))
      .filter(hashDraw(col(idCol), salt) < frac)
      .drop("__strat_key")
  }
}
