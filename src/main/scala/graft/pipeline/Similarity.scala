package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *     baseline. Probe set × corpus join; only viable when one side is
  *     small (it broadcasts the probes).
  *   - [[lshTopK]]: random-hyperplane LSH bucketing — the scale path.
  *     The corpus is bucketed once (shuffle on signature); probes only
  *     join their own bucket (and optionally 1-bit-flip neighbor
  *     buckets for recall). At 100 TB the bucket count ~2^planes keeps
  *     per-bucket candidate lists bounded.
  *
  * All math is Column expressions over the array (zip_with/aggregate) —
  * codegen applies, no UDFs, no driver-side loops.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for plane `j`,
    * dimension `i`: ±1 from the parity of xxhash64(j, i). A ±1 plane
    * basis is standard sign-random-projection; deterministic across
    * executors with no broadcast state.
    */
  private def planeComponent(j: Int, i: Column): Column =
    when(pmod(xxhash64(lit(j), i), lit(2)) === 0, 1d).otherwise(-1d)

  /** LSH signature: one bit per hyperplane = sign of the projection. */
  def planeSignature(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast(DoubleType) * planeComponent(j, i)),
        lit(0d), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Exact cosine top-k neighbors for each probe. Probes broadcast;
    * corpus streams once; per-probe top-k via window rank (the shuffle
    * key is the probe id — k and |probes| bound the result).
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.alias("c")
      .join(broadcast(probes.alias("p")),
        col(s"c.$idCol") =!= col(s"p.$idCol"))
      .select(
        col(s"p.$idCol").as("probe_id"),
        col(s"c.$idCol").as("neighbor_id"),
        cosine(col(s"p.$vecCol"), col(s"c.$vecCol")).as("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos"))
  }

  /** Bucketed ANN: corpus bucketed by plane signature; each probe
    * scans only its bucket. Recall measured against brute force in the
    * test suite; raise `planes` for smaller buckets, add multi-probe
    * (bit flips) for higher recall.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame,
              vecCol: String, idCol: String, k: Int, planes: Int = 8,
              multiProbeBits: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      planeSignature(col(vecCol), planes).as("sig"))
    val pSig = planeSignature(col(vecCol), planes)
    // multi-probe: probe its own bucket plus every 1-bit-flip bucket
    val probeSigs = array(
      (pSig +: (0 until (if (multiProbeBits >= 1) planes else 0))
        .map(j => pSig.bitwiseXOR(shiftleft(lit(1L), j)))): _*)
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
      explode(probeSigs).as("sig"))
    val scored = c.join(broadcast(p), Seq("sig"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), cosine(col("pv"), col("cv")).as("cos"))
      .dropDuplicates("probe_id", "neighbor_id")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos"))
  }
}
