package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * The Spark-side plumbing — schema, batch shape, partitioning, feature
  * schema — is real; the actual media DECODE step is a clearly-marked
  * deterministic STUB (this container has no image/audio codecs). In
  * production the stub body is replaced by a codec call inside the same
  * `mapPartitions`/expression shape; nothing else changes.
  */
object Multimodal {

  /** Media-table schema: payload + mime + typed metadata. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("duration_ms", LongType), StructField("sample_rate", IntegerType)))

  /** Wrap a text table as a media table (payload = utf8 bytes). Real
    * pipelines read payloads via `binaryFile` data source; the schema
    * and downstream operators are identical.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      when(pmod(col(idCol), lit(3)) === 0, "image/png")
        .when(pmod(col(idCol), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      struct(
        (pmod(col(idCol), lit(640)) + 1).cast(IntegerType).as("width"),
        (pmod(col(idCol), lit(480)) + 1).cast(IntegerType).as("height"),
        (pmod(col(idCol), lit(60000))).cast(LongType).as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))

  /** STUB decode→featurize: 8 deterministic pseudo-features derived
    * from the payload's md5 (each hex slice → [0,1) float). Replace the
    * md5 derivation with a real decoder + model to productionize; the
    * output schema (fixed-size float array) is the real contract.
    */
  def extractFeatures(payload: Column, dims: Int = 8): Column = {
    val h = md5(payload)
    array((0 until dims).map(i =>
      (conv(substring(h, i * 4 + 1, 4), 16, 10).cast(DoubleType) / 65535.0)
        .cast(FloatType)): _*)
  }

  /** STUB image resize: passes metadata through with new dimensions —
    * the real version maps payload bytes partition-wise through a
    * codec; the plan shape (narrow map, no shuffle) is what matters.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta",
      col("meta").withField("width", lit(w)).withField("height", lit(h)))

  /** Frame-sample offsets for video rows: every `everyMs` within the
    * clip duration (array of timestamps, exploded downstream as
    * needed) — pure expression, proportional output size.
    */
  def frameSampleOffsets(df: DataFrame, everyMs: Long = 1000L): DataFrame =
    df.withColumn("frame_offsets_ms",
      when(col("mime").startsWith("video"),
        sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))

  /** Partition-wise decode: the shape a real media decoder runs in —
    * one partition of payload rows at a time through `mapPartitions`
    * (a narrow map: no shuffle, and per-partition init is where codec
    * handles / model weights load once). The decode body here is a
    * clearly-marked deterministic STUB (payload bytes → [0,1) floats);
    * swapping it for a real codec changes nothing about the plan
    * shape, batching, or output schema.
    */
  def decodePartitionwise(df: DataFrame, dims: Int = 8): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition initialization point (codec/model setup in prod)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = Array.tabulate(dims) { i => // STUB decode
          if (payload == null || payload.isEmpty) 0f
          else (payload(i % payload.length) & 0xFF) / 255.0f
        }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Full demo pipeline over a text table standing in for media blobs. */
  def pipeline(docs: DataFrame): DataFrame =
    frameSampleOffsets(asMediaTable(docs, "doc_id", "text"))
      .withColumn("features", extractFeatures(col("payload")))
      .select(col("media_id"), col("mime"), length(col("payload")).as("payload_bytes"),
        col("meta.width").as("width"), col("meta.duration_ms").as("duration_ms"),
        size(coalesce(col("frame_offsets_ms"), array())).as("n_frames"),
        col("features"))
}
