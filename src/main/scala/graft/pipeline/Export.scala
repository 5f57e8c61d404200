package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sharded corpus export — the hand-off contract between a curation
  * pipeline and a training data loader: a fixed number of shard files,
  * stable membership, deterministic within-shard order (the shape
  * WebDataset/Parquet-sharded loaders consume).
  *
  * Scale shape: shard assignment is a salted hash of the id (a narrow
  * map — membership never depends on partitioning or row order, so
  * reruns and retries land every row in the same shard); the single
  * shuffle hash-partitions by shard id so each shard group lands in
  * exactly one task, and `partitionBy` then writes exactly one file
  * per shard directory. Within-shard order is (shard, id) — sorted in
  * the task, no global sort.
  */
object Export {

  /** Stable shard id in [0, numShards): salted xxhash64 of the id
    * column. Exposed separately so a pipeline can co-group or audit by
    * shard before writing.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int,
                  salt: String = ""): DataFrame = {
    require(numShards > 0, s"numShards $numShards must be positive")
    df.withColumn("shard",
      pmod(xxhash64(col(idCol), lit(salt)), lit(numShards.toLong)).cast("int"))
  }

  /** Write `df` as `numShards` shard directories (`dir/shard=N/`), one
    * parquet file each, rows ordered by id within a shard. Reruns over
    * the same input produce identical shard membership and order.
    */
  def exportShards(df: DataFrame, idCol: String, dir: String,
                   numShards: Int, salt: String = ""): Unit =
    shardAssign(df, idCol, numShards, salt)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(dir)
}
