package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation rewrites. AQE's skew-join splitting covers the
  * sort-merge case at runtime; explicit salting remains the tool when
  * the skew is in the SHUFFLE KEY itself (one hot key overwhelms any
  * single reducer no matter how the merge is split) or when a
  * deterministic, planner-independent layout is required.
  */
object Skew {

  /** Equi-join with a salted hot side: the big side's rows get a
    * uniform salt in [0, salts) and the small side is replicated once
    * per salt, so a hot key's rows spread over `salts` reducer
    * partitions instead of hammering one. The output is EXACTLY the
    * plain `big.join(small, key, joinType)` rows — every (key, salt)
    * row matches exactly the one replica carrying its salt, whatever
    * the salt value, so the RESULT is salt-independent by construction
    * (which is also why a seeded `rand` draw is safe here where
    * [[graft.pipeline.Sampling]] forbids it: a draw that changes under
    * retry changes only which partition a row lands in, never the
    * rows). A row-content hash would NOT work as the salt: duplicate
    * rows on the hot key — the norm in a pre-dedup crawl — would all
    * hash to one salt and re-concentrate the skew.
    *
    * Cost model: the small side shuffles ×`salts` — size salts to the
    * hot key's dominance (a key holding p of all rows needs ~p·shuffle
    * partitions spread), not to the partition count.
    *
    * `joinType` supports "inner" and "left" (an unmatched big row
    * keeps exactly one null-padded copy — its (key, salt) pair misses
    * every replica except none; replication is on the small side only).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts $salts must be positive")
    require(joinType == "inner" || joinType == "left",
      s"saltedEquiJoin joinType must be inner|left, got $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by saltedEquiJoin")
    val salted = big.withColumn("__salt",
      floor(rand(2654435769L) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Measured salt count for [[saltedEquiJoin]]: the hottest key's row
    * fraction `p` (from the exact two-pass heavy-hitter scheme —
    * bounded sketch + recount, no tail shuffle,
    * [[graft.pipeline.Sketches.heavyHitters]]) needs its rows spread
    * over ~`p × shuffle.partitions` reducers to even out; below the
    * `support` detection threshold no key dominates and salting is
    * pure overhead, so 1 (= plain join). Runs eagerly at call time
    * like the other bounded model fits (IVF centroids, freqItems).
    */
  def autoSalts(big: DataFrame, key: String, support: Double = 0.05,
                maxSalts: Int = 64): Int = {
    val keyed = big.select(col(key))
    // the heavy-hitter scheme already counts the input; reusing its
    // total avoids a second full scan of the big side
    val (hh, n) = graft.pipeline.Sketches.heavyHittersWithTotal(keyed, key, support)
    val top = hh.agg(max(col("cnt"))).head()
    if (top.isNullAt(0) || n == 0) 1
    else {
      val p = top.getLong(0).toDouble / n
      val parts = big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      math.max(1, math.min(maxSalts, math.ceil(p * parts).toInt))
    }
  }

  /** [[saltedEquiJoin]] with the salt count measured from the data
    * ([[autoSalts]]) instead of guessed at the call site. No detected
    * hot key → the plain equi-join, zero replication cost.
    */
  def saltedEquiJoinAuto(big: DataFrame, small: DataFrame, key: String,
                         joinType: String = "inner", support: Double = 0.05,
                         maxSalts: Int = 64): DataFrame = {
    val salts = autoSalts(big, key, support, maxSalts)
    if (salts <= 1) big.join(small, Seq(key), joinType)
    else saltedEquiJoin(big, small, key, salts, joinType)
  }
}
