package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Ladder safety of the size-adaptive layout constants introduced for
  * small stores: at dump-scale sizes the adaptive formulas must pick AT
  * LEAST the legacy counts, so a 128M-quad (or 100 TB) store plans
  * exactly as the fixed-constant layout did. Sizes below use the
  * measured flat-store footprint of the QuadScale harness
  * (~55-65 bytes/quad on disk): 1M quads ≈ 64 MB, 32M ≈ 2 GB,
  * 128M ≈ 8 GB.
  */
class LayoutLadderSpec extends AnyFunSuite {

  private val MB = 1L << 20
  private val GB = 1L << 30

  test("bucket count reaches the legacy 64 by ~1 GB and stays there") {
    assert(WikidataIngest.sizedBuckets(0L) === 1)
    assert(WikidataIngest.sizedBuckets(64 * MB) === 5)
    // 64 buckets × 16 MB = 1 GB: everything at or past it gets 64
    assert(WikidataIngest.sizedBuckets(2 * GB) === WikidataIngest.NumPredBuckets)
    assert(WikidataIngest.sizedBuckets(8 * GB) === WikidataIngest.NumPredBuckets)
    assert(WikidataIngest.sizedBuckets(100L * 1024 * GB)
      === WikidataIngest.NumPredBuckets)
  }

  test("range-partition count is monotonic and >= legacy floor at scale") {
    val floor = 64
    val ladder = Seq(1 * MB, 64 * MB, 256 * MB, 2 * GB, 8 * GB, 64 * GB)
      .map(b => WikidataIngest.sizedRangeParts(b, floor))
    assert(ladder === ladder.sorted, s"not monotonic: $ladder")
    // >= floor × MinPartitionBytes (256 MB): exactly the legacy floor
    // or more — never fewer write tasks than the fixed layout had
    assert(WikidataIngest.sizedRangeParts(
      floor * WikidataIngest.MinPartitionBytes, floor) >= floor)
    assert(WikidataIngest.sizedRangeParts(8 * GB, floor) >= floor)
    // and above TargetFileBytes×floor it keeps growing with the data
    assert(WikidataIngest.sizedRangeParts(64 * GB, floor)
      > WikidataIngest.sizedRangeParts(8 * GB, floor))
    // tiny stores collapse to one partition
    assert(WikidataIngest.sizedRangeParts(100, floor) === 1)
  }
}
