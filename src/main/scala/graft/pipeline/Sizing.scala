package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Input-size-derived parallelism for the pipeline operators.
  *
  * The operators used to open with `repartition(defaultParallelism)` —
  * a CORE count, unrelated to data size (guide §2.2: derive
  * partitioning from input size, not a constant). That over-partitions
  * small inputs (32 near-empty tasks plus 32×32 shuffle blocks per
  * stage for a few-hundred-KB corpus — the sub-1.0 low-core scaling
  * ratios in PERF_r15) and under-partitions huge ones (32 partitions
  * of a 100 TB corpus). [[parts]] instead plans one partition per
  * `spark.graft.pipeline.partitionBytes` (default 1 MB — pipeline
  * stages explode rows into shingles/hashes/tokens, so the working set
  * is a large multiple of the scan bytes) up to a cap that itself
  * grows with the data: max(2×cores, one per
  * `spark.graft.pipeline.maxPartitionBytes` = 128 MB). A KB-scale
  * corpus runs in ONE partition; a 1 GB corpus fills every core; a
  * 100 TB corpus gets ~800k partitions instead of 32.
  *
  * Size source: the optimizer's plan statistics — for the parquet
  * scans these operators open with, that is the real file footprint;
  * no job is run.
  */
object Sizing {

  private def parts(df: DataFrame, perPartConf: String, default: Long): Int = {
    val spark = df.sparkSession
    val perPart = spark.conf
      .get(perPartConf, default.toString).toLong
    val maxPart = spark.conf
      .get("spark.graft.pipeline.maxPartitionBytes", (128L << 20).toString).toLong
    val cores = spark.sparkContext.defaultParallelism.toLong
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val wanted = (bytes / perPart).min(BigInt(Int.MaxValue)).toLong
    val cap = math.max(2L * cores, (bytes / maxPart).min(BigInt(Int.MaxValue)).toLong)
    math.max(1L, math.min(wanted, cap)).toInt
  }

  /** Size-derived partition count for `df` (see class doc). */
  def parts(df: DataFrame): Int =
    parts(df, "spark.graft.pipeline.partitionBytes", 1L << 20)

  /** `df` round-robin-spread over [[parts]] partitions — the drop-in
    * replacement for the old `repartition(defaultParallelism)` on
    * shuffle/aggregation-shaped operators, where extra partitions cost
    * (M×R shuffle blocks, per-stage scheduling) and buy nothing.
    */
  def spread(df: DataFrame): DataFrame = df.repartition(parts(df))

  /** Like [[spread]] but for operators whose per-row CPU work is a
    * large multiple of the input bytes (winnowed fingerprints, per-word
    * md5, regex redaction, BPE training, compression probes): one
    * partition per `spark.graft.pipeline.computePartitionBytes`
    * (default 16 KB) so even a KB-scale corpus keeps every core busy,
    * under the same data-proportional cap as [[spread]].
    */
  def spreadCompute(df: DataFrame): DataFrame =
    df.repartition(parts(df, "spark.graft.pipeline.computePartitionBytes", 16L << 10))
}
