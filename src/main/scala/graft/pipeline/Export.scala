package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * the task, no global sort. Empty-shard backfill is one extra job
  * TOTAL (not one per shard) and goes through the Hadoop FileSystem
  * API, so the fixed-directory-set contract holds on hdfs:// and
  * s3:// exactly as on file://.
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
                   numShards: Int, salt: String = ""): Unit = {
    val assigned = shardAssign(df, idCol, numShards, salt)
    assigned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(dir)
    // `partitionBy` emits nothing for a shard with zero rows; the
    // loader contract is a FIXED directory set, so materialize the
    // empty ones (small/skewed corpora otherwise break enumeration)
    val dataSchema = org.apache.spark.sql.types.StructType(
      assigned.schema.filterNot(_.name == "shard"))
    backfillEmptyShards(df.sparkSession, dir, numShards) { tmp =>
      df.sparkSession.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), dataSchema)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    }
  }

  /** Order-independent per-shard manifest: row count plus an XOR fold
    * of the id hashes (overflow-free and commutative, so any read
    * order reproduces it; paired with the count, truncated, duplicated
    * or reshuffled shards are detected). A loader (or a later pipeline
    * run) recomputes it from whatever it read and compares. One
    * aggregate over the corpus, `numShards` output rows.
    */
  def shardManifest(df: DataFrame, idCol: String, numShards: Int,
                    salt: String = ""): DataFrame = {
    val agg = shardAssign(df, idCol, numShards, salt)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(xxhash64(col(idCol))).as("id_checksum"))
    // one row per shard even when empty (count 0, checksum 0) — the
    // manifest enumerates the same fixed set as the directories
    df.sparkSession.range(numShards)
      .select(col("id").cast("int").as("shard"))
      .join(agg, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("id_checksum"), lit(0L)).as("id_checksum"))
  }

  /** JSONL variant of [[exportShards]] — the other standard training
    * hand-off (one JSON document per line, one text file per shard
    * directory, same deterministic membership and in-shard order as
    * the parquet path), with the [[shardManifest]] written alongside
    * at `dir/_manifest` so consumers can verify what they ingest.
    * Null-valued fields serialize explicitly (`"f":null`) so every
    * line carries the full column set — strict fixed-schema JSONL
    * consumers need identical key sets per line.
    */
  def exportShardsJsonl(df: DataFrame, idCol: String, dir: String,
                        numShards: Int, salt: String = ""): Unit = {
    shardAssign(df, idCol, numShards, salt)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .select(col("shard"),
        to_json(struct(df.columns.map(col).toSeq: _*),
          Map("ignoreNullFields" -> "false")).as("value"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").text(dir)
    // fixed directory set, like the parquet path: zero-row shards
    // still get an (empty) JSONL file
    val spark = df.sparkSession
    import spark.implicits._
    backfillEmptyShards(spark, dir, numShards) { tmp =>
      Seq.empty[String].toDF("value")
        .coalesce(1).write.mode(SaveMode.Overwrite).text(tmp)
    }
    shardManifest(df, idCol, numShards, salt)
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$dir/_manifest")
  }

  /** Materialize `shard=N` directories for every shard the main
    * `partitionBy` write skipped (it emits nothing for zero-row
    * groups), preserving the loader's fixed-directory-set contract.
    *
    * Cost is independent of `numShards`: ONE Spark job writes the
    * empty-shard template once to a temp dir, then plain filesystem
    * copies fan it out to each missing directory (an empty parquet
    * part is footer+schema only — a few hundred bytes — so thousands
    * of copies are milliseconds each, vs. thousands of sequential
    * Spark jobs before). Existence checks and copies use the Hadoop
    * FileSystem resolved from the export URI, not `java.io.File`,
    * so remote stores (hdfs://, s3a://) see the same behavior as the
    * local filesystem.
    */
  private def backfillEmptyShards(spark: SparkSession, dir: String, numShards: Int)
                                 (writeEmptyTemplate: String => Unit): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val present = fs.listStatus(root).iterator
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case n if n.startsWith("shard=") =>
        scala.util.Try(n.stripPrefix("shard=").toInt).toOption }
      .flatten.toSet
    val missing = (0 until numShards).filterNot(present)
    if (missing.nonEmpty) {
      val tmp = new Path(root, "_empty_shard_template")
      writeEmptyTemplate(tmp.toString) // the only job — shard-count independent
      val parts = fs.listStatus(tmp).filter(_.getPath.getName.startsWith("part-"))
      missing.foreach { n =>
        val dst = new Path(root, s"shard=$n")
        fs.mkdirs(dst)
        parts.foreach(p =>
          FileUtil.copy(fs, p.getPath, fs, new Path(dst, p.getPath.getName), false, conf))
      }
      fs.delete(tmp, true)
    }
  }
}
