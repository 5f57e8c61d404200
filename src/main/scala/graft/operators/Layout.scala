package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how rows are ORDERED on disk decides what a
  * parquet scan can skip. A single-column sort gives perfect row-group
  * min/max pruning on that column and none on any other; Z-ordering
  * interleaves the bits of two dimensions so row groups stay tight in
  * BOTH — the standard lakehouse layout pass for fact tables queried
  * along more than one axis (e.g. events by user AND by time window).
  * At 100 TB this is a write-once cost that turns two full-scan
  * predicates into partial scans for the table's whole lifetime.
  */
object Layout {

  /** Morton z-value: interleave the low `bitsPerDim` bits of two
    * non-negative dimension columns (a's bit i at even position 2i,
    * b's at odd 2i+1). Pure integer Column math — a narrow map, no
    * shuffle; the OR-terms occupy disjoint bits so evaluation order is
    * irrelevant. Callers bucket/clamp dimensions into [0, 2^bitsPerDim)
    * first (e.g. `pmod(col, lit(1 << bits))`).
    */
  def zValue(a: Column, b: Column, bitsPerDim: Int = 16): Column = {
    require(bitsPerDim > 0 && bitsPerDim <= 31,
      s"bitsPerDim $bitsPerDim must be in [1, 31]")
    (0 until bitsPerDim).flatMap { i =>
      Seq(shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Rows ordered by the z-value of two bucketed dimensions — the
    * layout pass before a partitioned write. One range-partitioned
    * sort; the z keys spread uniformly when the buckets do, so the
    * sort's range partitions stay balanced.
    */
  def zOrderBy(df: DataFrame, a: Column, b: Column,
               bitsPerDim: Int = 16): DataFrame =
    df.orderBy(zValue(a, b, bitsPerDim).asc)
}
