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

  /** Delta-only maintenance of a persisted IVF index
    * ([[Similarity.buildIvfIndex]] layout): diff the old embedding
    * snapshot (what the index was built from) against the new one,
    * then touch ONLY the delta — tombstone `removed` and `changed`
    * ids, append `added` and `changed` vectors, both at one generation
    * (a tombstone kills strictly older copies, so the same-gen append
    * re-adds a changed id; see [[Similarity.tombstoneIvfIds]]). The
    * generation defaults to [[Similarity.nextIndexGen]] — one past
    * everything already in the index — so REPEATED updates stay
    * monotonic (a fixed value would stop killing rows the previous
    * update wrote); pass `gen` explicitly only to replay a known step.
    * No existing index file is rewritten and no unchanged vector is
    * re-embedded or re-assigned — at 100 TB the update costs
    * O(|delta|), not O(corpus), and the live index contents equal a
    * full rebuild over the new snapshot (hash-gated by the p72 entry;
    * cell ASSIGNMENTS may differ because the rebuild refits centroids,
    * which changes pruning efficiency, never stored vectors).
    *
    * Returns the diff statuses it acted on (id, status), so callers
    * can chain downstream delta work off the same frame.
    */
  def incrementalIvfUpdate(oldEmb: DataFrame, newEmb: DataFrame,
                           idCol: String, vecCol: String, dir: String,
                           gen: Option[Long] = None): DataFrame = {
    val g = gen.getOrElse(Similarity.nextIndexGen(newEmb.sparkSession, dir))
    // the diff feeds THREE consumers (tombstone write, append write,
    // the returned frame) — materialize it once or every action
    // re-reads and re-joins both full snapshots. The delta is tiny by
    // premise (ids + statuses), so localCheckpoint holds it in block
    // storage instead of recomputing two corpus passes.
    val d = snapshotDiff(oldEmb, newEmb, idCol, vecCol).localCheckpoint()
    Similarity.tombstoneIvfIds(
      d.filter(col("status").isin("removed", "changed")).select(col(idCol)),
      idCol, dir, g)
    Similarity.appendToIvfIndex(
      newEmb.join(
        d.filter(col("status").isin("added", "changed")).select(col(idCol)),
        Seq(idCol)),
      vecCol, idCol, dir, g)
    d
  }

  /** Audit an incremental index against a full rebuild: full-outer join
    * the LIVE contents of both layouts on id and compare the stored
    * payload column (`qv` for the default int8 layout — quantization is
    * deterministic, so identical input vectors yield bit-equal structs).
    * One row: (n_incremental, n_full, all_match). `all_match` demands
    * every id present on both sides with equal payload; cell
    * assignments are deliberately NOT compared (a rebuild refits
    * centroids — different pruning, same contents).
    */
  def compareIvfContents(spark: org.apache.spark.sql.SparkSession,
                         incDir: String, fullDir: String, idCol: String,
                         contentCol: String = "qv"): DataFrame = {
    val a = Similarity.liveIndexVectors(spark, incDir, idCol)
      .select(col(idCol), col(contentCol).as("__ca"))
    val b = Similarity.liveIndexVectors(spark, fullDir, idCol)
      .select(col(idCol), col(contentCol).as("__cb"))
    a.join(b, Seq(idCol), "full_outer")
      .agg(count(col("__ca")).as("n_incremental"),
        count(col("__cb")).as("n_full"),
        min(col("__ca") <=> col("__cb")).as("all_match"))
  }
}
