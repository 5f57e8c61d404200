package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout: co-located, shuffle-free equi-joins.
  *
  * The biggest shuffle in a relational analytics workload is the
  * fact-to-fact join (lineitem ⋈ orders at TPC-H scale; at 100 TB the
  * probe side alone is tens of TB of network). Spark's answer is
  * BUCKETING: write both tables hash-partitioned into the same number
  * of buckets on the join key, with each bucket sorted. A later
  * equi-join on that key reads bucket i of A against bucket i of B —
  * the SortMergeJoin plans with NO Exchange on either side (and no
  * Sort when each bucket is a single pre-sorted file), so the join
  * cost is a streaming merge of co-located parquet, repeatable every
  * query for a one-time layout cost.
  *
  * This is the relational mirror of the SPARQL store's predicate
  * bucketing (`WikidataIngest.predBucket`): pay the partitioning once
  * at write time, never at query time.
  */
object Bucketing {

  /** Materialize `df` as an external bucketed table at `path`:
    * `buckets` hash buckets on `key`, one pre-sorted file per bucket.
    *
    * The pre-repartition on the bucket key aligns rows so every write
    * task holds exactly one bucket (Spark's bucket id and
    * `repartition(n, col)` use the same Murmur3 hash), which yields
    * the one-file-per-bucket layout the scan needs to also skip the
    * merge-join Sort. Without it each task writes a sliver of every
    * bucket: same join semantics, but `buckets × tasks` small files.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, path: String,
                    buckets: Int = 32): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a bucketed table by name. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
