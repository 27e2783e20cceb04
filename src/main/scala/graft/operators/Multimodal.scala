package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column plumbing (SURVEY.md §2.11 X6): image/audio/video as
  * opaque BinaryType payloads with a typed metadata struct, flowing
  * through the same relational operators as any column.
  *
  * The IMAGE modality decodes for real: `decodeImageStats` (and the
  * image branch of `decodeFeatures`) runs the payload through the JDK's
  * `javax.imageio` PNG/BMP codec — no external dependency — and emits
  * exact per-pixel statistics. Audio/video codecs are not in the JDK, so
  * those modalities keep a deterministic byte-stat fallback; the
  * Spark-side plumbing is identical either way: per-partition batched
  * processing (mapPartitions — the Scala analog of a Pandas-UDF batch),
  * partition-preserving execution (no shuffle), and a typed output
  * schema.
  */
object Multimodal {

  /** ImageIO's default scratch-file cache costs a temp-file create per
    * encode/decode; disable it once per executor JVM (thread-safe static,
    * idempotent). */
  private lazy val imageIoNoCache: Unit = ImageIO.setUseCache(false)

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

  /** Magic-byte sniff: PNG (\x89PNG) or BMP (BM). Cheap gate so
    * non-image payloads never enter the ImageIO reader machinery. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    (b.length > 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') ||
      (b.length > 2 && b(0) == 'B' && b(1) == 'M')

  /** Decode + feature extraction, batched per partition.
    *
    * Payloads carrying a PNG/BMP magic number are decoded for REAL with
    * the JDK's `javax.imageio` codec: features = [width, height, mean R,
    * mean G, mean B, mean luma, px count, 0], one "frame" per image.
    * Anything else (the container has no audio/video codecs — JDK ships
    * image ones only) falls back to a deterministic 8-dim byte-stat
    * vector. The batching shape (iterator-of-rows in,
    * iterator-of-case-class out, one batch per partition, zero shuffle)
    * is exactly what a production decode stage needs. */
  def decodeFeatures(spark: SparkSession,
                     media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    graft.scaleOut(media).select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val decoded: Option[BufferedImage] =
            if (looksLikeImage(bytes))
              Option(ImageIO.read(new ByteArrayInputStream(bytes)))
            else None
          decoded match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xFF
                  sg += (rgb >> 8) & 0xFF
                  sb += rgb & 0xFF
                  x += 1
                }
                y += 1
              }
              val n = (w * h).toFloat
              MediaFeatures(id, modality, bytes.length.toLong, 1,
                Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n,
                  (0.299f * sr + 0.587f * sg + 0.114f * sb) / n, n, 0f))
            case None =>
              val frameSize = 100
              val nFrames = (bytes.length + frameSize - 1) / frameSize
              val feats = new Array[Float](8)
              var i = 0
              while (i < bytes.length) {
                feats(i % 8) += (bytes(i) & 0xFF) / 255.0f
                i += 1
              }
              MediaFeatures(id, modality, bytes.length.toLong, nFrames,
                feats)
          }
        }
      }
  }

  /** Deterministic RGB test-pattern images, ENCODED with the real JDK
    * PNG codec. Pixel (x,y) of image `id` is
    * r=(31·id+7x+13y)%256, g=(17·id+11x+3y)%256, b=(29·id+5x+19y)%256
    * over a w×h = (8+id%9)×(8+(7·id)%9) canvas — a closed form a SQL
    * oracle can recompute without any codec, so a green hash proves the
    * encode→decode round trip touched real pixels. Map-only, no
    * shuffle; encode cost is per-row and scales linearly. */
  def pngFromDocuments(spark: SparkSession, docs: DataFrame,
                       rBump: Boolean = false): DataFrame = {
    import spark.implicits._
    graft.scaleOut(docs).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        imageIoNoCache
        ids.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + (id * 7) % 9).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // rBump = a deterministic one-count red nudge on the
              // even-checkerboard pixels: a VISUALLY near-identical
              // variant (for perceptual-hash near-dup fixtures) whose
              // pixels stay a closed form the oracle can recompute
              val bump = if (rBump) (1 - (x + y) % 2) else 0
              val r = ((id * 31 + x * 7 + y * 13 + bump) % 256).toInt
              val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
              val b = ((id * 29 + x * 5 + y * 19) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream(1024)
          ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("media_id", "payload")
  }

  /** 64-bit AVERAGE-HASH perceptual fingerprint from a REAL decode
    * (the classic aHash, nearest-neighbor variant): sample an 8×8
    * grid at `(gx·w/8, gy·h/8)` (integer arithmetic — no resampling
    * kernel, so any engine replays the exact samples), take
    * `gray = r+g+b` (monotone in luminance, division-free), and set
    * bit `gy·8+gx` iff the sample exceeds the 64-sample mean. Two
    * images that LOOK the same hash within a few bits regardless of
    * byte-level differences — the image analog of SimHash for text.
    * Map-only; one decode per image. */
  case class ImageHash(media_id: Long, ahash: Long)

  def imageAHash(spark: SparkSession, media: DataFrame)
      : Dataset[ImageHash] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { case (id, payload) =>
          val img = ImageIO.read(new ByteArrayInputStream(payload))
          require(img != null,
            s"media_id=$id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val gray = new Array[Long](64)
          var sum = 0L
          var i = 0
          while (i < 64) {
            val sx = (i % 8) * w / 8
            val sy = (i / 8) * h / 8
            val rgb = img.getRGB(sx, sy)
            gray(i) = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
              (rgb & 0xFF)
            sum += gray(i)
            i += 1
          }
          val mean = sum / 64.0
          var hash = 0L
          i = 0
          while (i < 64) {
            if (gray(i) > mean) hash |= (1L << i)
            i += 1
          }
          ImageHash(id, hash)
        }
      }
  }

  /** All image pairs within `maxHamming` aHash bits — perceptual
    * (near-)duplicate detection over a decoded corpus. Blocking is the
    * standard LSH pigeonhole: the 64 bits split into `maxHamming + 1`
    * bands, and any pair within the threshold must agree EXACTLY on at
    * least one band, so the self-join runs per (band, value) bucket —
    * never a corpus × corpus product — and the hamming verify
    * (`bit_count(xor)`) touches only banded candidates. Guaranteed
    * complete at the threshold (no missed pairs, unlike probabilistic
    * MinHash banding). `maxHamming` ≤ 15 keeps every band ≥ 4 bits. */
  def nearDupImagePairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15], got $maxHamming")
    val nb = maxHamming + 1
    val hashes = imageAHash(spark, media).toDF("media_id", "ahash")
    val bands = hashes.select(col("media_id"), col("ahash"),
      posexplode(array((0 until nb).map { j =>
        val lo = j * 64 / nb
        val width = (j + 1) * 64 / nb - lo
        val mask = if (width >= 64) -1L else (1L << width) - 1L
        shiftrightunsigned(col("ahash"), lo).bitwiseAND(lit(mask))
      }: _*)).as(Seq("band_idx", "band_val")))
    val a = bands.select(col("media_id").as("id_a"),
      col("ahash").as("h_a"), col("band_idx"), col("band_val"))
    val b = bands.select(col("media_id").as("id_b"),
      col("ahash").as("h_b"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact per-image pixel statistics from a REAL `javax.imageio`
    * decode of the payload. PNG is lossless and `TYPE_INT_RGB` carries
    * no color profile, so the sums are exact — oracle-checkable against
    * a codec-free recompute of the generator formula. Throws on an
    * undecodable payload (a decode stage that silently drops rows hides
    * corpus corruption). */
  case class ImageStats(media_id: Long, width_px: Int, height_px: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  def decodeImageStats(spark: SparkSession,
                       media: DataFrame): Dataset[ImageStats] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { case (id, payload) =>
          val img = ImageIO.read(new ByteArrayInputStream(payload))
          require(img != null, s"media_id=$id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF
              sg += (rgb >> 8) & 0xFF
              sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          ImageStats(id, w, h, sr, sg, sb)
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

  /** REAL image resize through the decode path: nearest-neighbor
    * rescale to (w·num/den, h·num/den), re-encoded PNG (lossless, so
    * the only pixel change is the resampling itself). Nearest-neighbor
    * with integer sample arithmetic — `dst(x,y) = src(x·sw/dw,
    * y·sh/dh)`, no kernel — keeps the transform engine-replayable and
    * makes [[imageAHash]] PROVABLY invariant under integer upscales:
    * the scaled image's 8×8 sample grid lands on exactly the source
    * grid's pixels (`floor(floor(k·a)/k) = floor(a)`), so an upscaled
    * variant hashes IDENTICALLY and near-dup detection catches it at
    * hamming 0. Downscales resample (floor vs exact grid drift of at
    * most one pixel per sample), so their hamming distance is small
    * but non-zero — MultimodalSpec pins the bound on the deterministic
    * fixture corpus. Map-only, one decode+encode per image;
    * [[resizeStub]] stays as the binary-surgery stand-in for
    * modalities the JDK ships no codec for. */
  def resizeImage(spark: SparkSession, media: DataFrame,
                  num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0, s"scale must be positive, got $num/$den")
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { case (id, payload) =>
          val img = ImageIO.read(new ByteArrayInputStream(payload))
          require(img != null,
            s"media_id=$id: payload is not a decodable image")
          val (sw, sh) = (img.getWidth, img.getHeight)
          // Long arithmetic: sw·num (and x·sw) overflows Int past
          // ~32k-pixel sources at 2×, yielding negative indices —
          // the products are exact in Long for any BufferedImage
          val dw = math.max(1, (sw.toLong * num / den).toInt)
          val dh = math.max(1, (sh.toLong * num / den).toInt)
          val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < dh) {
            val sy = (y.toLong * sh / dh).toInt
            var x = 0
            while (x < dw) {
              out.setRGB(x, y, img.getRGB((x.toLong * sw / dw).toInt, sy))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream(1024)
          ImageIO.write(out, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("media_id", "payload")
  }

  /** "Resize": truncate payload to a byte budget — stands in for a
    * resolution downsample; demonstrates binary expression surgery. */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("payload",
      substring(col("payload"), 1, maxBytes))
      .withColumn("meta", col("meta")
        .withField("size_bytes",
          least(col("meta.size_bytes"), lit(maxBytes.toLong))))
}
