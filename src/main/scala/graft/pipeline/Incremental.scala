package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-corpus operators: diff two snapshots of a keyed corpus
  * so downstream stages (dedup, featurization, index builds) can run
  * on the delta instead of the full 100 TB re-read.
  */
object Incremental {

  /** Classify every document across two corpus snapshots as `added`
    * (only in `newDf`), `removed` (only in `oldDf`), `changed` (both,
    * different content), or `unchanged`. The standard front gate of an
    * incremental pipeline: everything downstream re-processes only
    * `added`/`changed` and tombstones `removed`.
    *
    * Scale shape: each side projects to (id, content hash) BEFORE the
    * full-outer join, so the shuffle moves a few bytes per row no
    * matter how wide the documents are (PlanSpec pins that the text
    * column is hashed below the exchange). With both snapshots
    * bucketed on the id the join goes exchange-free. `hashFn` defaults
    * to the 8-byte `xxhash64`; the oracle-checked query passes `md5`
    * so DuckDB can replay the comparison bit-for-bit (statuses differ
    * only on a content-hash collision).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   textCol: String,
                   includeUnchanged: Boolean = false,
                   hashFn: Column => Column = xxhash64(_)): DataFrame = {
    // presence is tracked by an explicit per-side flag, never by hash
    // nullness: a null text column hashes to null under md5, and a
    // hash-null test would misread a present-but-null document as
    // missing. The content compare is null-safe (<=>) so null-text on
    // both sides reads `unchanged`, matching a join-side oracle.
    val o = oldDf.select(col(idCol), hashFn(col(textCol)).as("__oh"),
      lit(true).as("__op"))
    val n = newDf.select(col(idCol), hashFn(col(textCol)).as("__nh"),
      lit(true).as("__np"))
    val d = o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(col("__oh") <=> col("__nh"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"))
    if (includeUnchanged) d else d.filter(col("status") =!= "unchanged")
  }
}
