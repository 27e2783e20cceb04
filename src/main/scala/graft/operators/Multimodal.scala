package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.11 X6): image/audio/video as
  * opaque BinaryType payloads with a typed metadata struct, flowing
  * through the same relational operators as any column.
  *
  * The decode/feature-extract step is a STUB — media codec libraries are
  * not in this container. `decodeFeatures` computes a deterministic fake
  * feature vector from the payload bytes, but the Spark-side plumbing is
  * real: schema, per-partition batched processing (mapPartitions — the
  * Scala analog of a Pandas-UDF batch), partition-preserving execution
  * (no shuffle), and a typed output schema.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("size_bytes", LongType),
      StructField("width_px", IntegerType),
      StructField("height_px", IntegerType),
      StructField("duration_ms", LongType))))))

  private val modalities = Seq("image", "audio", "video")

  /** Synthesize a media table from the documents fixture: the UTF-8
    * bytes stand in for an encoded payload; modality round-robins by id.
    * Deterministic — usable in oracle-checked queries. */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(modalities.map(lit): _*),
        (col("doc_id") % modalities.size).cast("int") + 1).as("modality"),
      payload.as("payload"),
      struct(
        concat(lit("application/x-fake-"),
          element_at(array(modalities.map(lit): _*),
            (col("doc_id") % modalities.size).cast("int") + 1)).as("mime"),
        octet_length(payload).cast("long").as("size_bytes"),
        lit(64).as("width_px"),
        lit(64).as("height_px"),
        (octet_length(payload) * 10).cast("long").as("duration_ms"))
        .as("meta"))
  }

  /** Decoded-feature record. `features` is what a real decoder would
    * emit (pixel stats, mel energies, …). */
  case class MediaFeatures(media_id: Long, modality: String,
                           size_bytes: Long, n_frames: Int,
                           features: Array[Float])

  /** STUB decode + feature extraction, batched per partition.
    *
    * Real implementation would decode `payload` with an image/audio
    * codec here; the container has none, so the "decoder" derives a
    * deterministic 8-dim feature vector from byte statistics. The
    * batching shape (iterator-of-rows in, iterator-of-case-class out,
    * one batch per partition, zero shuffle) is exactly what a production
    * decode stage needs — swap the body, keep the plumbing. */
  def decodeFeatures(spark: SparkSession,
                     media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    graft.scaleOut(media).select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, payload) =>
          // ??? real codec goes here — deterministic fake below.
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val frameSize = 100
          val nFrames = (bytes.length + frameSize - 1) / frameSize
          val feats = new Array[Float](8)
          var i = 0
          while (i < bytes.length) {
            feats(i % 8) += (bytes(i) & 0xFF) / 255.0f
            i += 1
          }
          MediaFeatures(id, modality, bytes.length.toLong, nFrames, feats)
        }
      }
  }

  /** Frame sampling: slice the payload into fixed-size "frames" and keep
    * every `stride`-th — pure binary substring expressions, no UDF. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"), col("modality"),
      posexplode(
        transform(
          filter(
            sequence(lit(0),
              greatest(((octet_length(col("payload")) - 1) / frameBytes)
                .cast("int"), lit(0))),
            i => i % stride === 0),
          i => call_function("substring", col("payload"),
            i * frameBytes + 1, lit(frameBytes)))))
      .toDF("media_id", "modality", "frame_idx", "frame")

  /** "Resize": truncate payload to a byte budget — stands in for a
    * resolution downsample; demonstrates binary expression surgery. */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("payload",
      substring(col("payload"), 1, maxBytes))
      .withColumn("meta", col("meta")
        .withField("size_bytes",
          least(col("meta.size_bytes"), lit(maxBytes.toLong))))
}
