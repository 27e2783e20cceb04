package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** X6 real-codec path: the PNG encode→decode round trip through the
  * JDK's javax.imageio must reproduce the generator formula's pixels
  * exactly, and the byte-stat fallback must keep handling non-image
  * payloads (q59's contract). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def expected(id: Long): (Int, Int, Long, Long, Long) = {
    val w = (8 + id % 9).toInt
    val h = (8 + (id * 7) % 9).toInt
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      sr += (id * 31 + x * 7 + y * 13) % 256
      sg += (id * 17 + x * 11 + y * 3) % 256
      sb += (id * 29 + x * 5 + y * 19) % 256
    }
    (w, h, sr, sg, sb)
  }

  test("pngFromDocuments emits real PNGs; decodeImageStats recovers exact pixel sums") {
    val docs = (0L until 40L).toDF("doc_id")
    val png = Multimodal.pngFromDocuments(spark, docs)
    // Payloads are genuine PNG files (magic number).
    val magic = png.select("payload").as[Array[Byte]].collect()
    assert(magic.forall(b =>
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'))
    val stats = Multimodal.decodeImageStats(spark, png).collect()
      .map(s => s.media_id -> s).toMap
    assert(stats.size == 40)
    for (id <- 0L until 40L) {
      val (w, h, sr, sg, sb) = expected(id)
      val s = stats(id)
      assert((s.width_px, s.height_px) == (w, h), s"dims for id=$id")
      assert((s.sum_r, s.sum_g, s.sum_b) == (sr, sg, sb), s"sums for id=$id")
    }
  }

  test("decodeImageStats throws on a non-decodable payload") {
    val junk = Seq((1L, "junk-not-an-image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val e = intercept[Exception] {
      Multimodal.decodeImageStats(spark, junk).collect()
    }
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("decodeFeatures: real image branch for PNG payloads, byte-stat fallback otherwise") {
    val png = Multimodal.pngFromDocuments(spark, (0L to 2L).toDF("doc_id"))
      .withColumn("modality", lit("image"))
      .select("media_id", "modality", "payload")
    val imgFeats = Multimodal.decodeFeatures(spark, png).collect()
      .map(f => f.media_id -> f).toMap
    for (id <- 0L to 2L) {
      val (w, h, sr, sg, sb) = expected(id)
      val f = imgFeats(id)
      assert(f.n_frames == 1)
      assert(f.features(0) == w.toFloat && f.features(1) == h.toFloat)
      assert(math.abs(f.features(2) - sr.toFloat / (w * h)) < 1e-3)
      assert(math.abs(f.features(4) - sb.toFloat / (w * h)) < 1e-3)
    }
    // Non-image payload: the q59-shaped fallback (frames = ceil(bytes/100)).
    val txt = Seq((9L, "audio", Array.fill[Byte](250)(7)))
      .toDF("media_id", "modality", "payload")
    val f = Multimodal.decodeFeatures(spark, txt).collect().head
    assert(f.n_frames == 3 && f.size_bytes == 250L)
  }

  test("imageAHash is stable across byte-identical copies and close " +
    "for the nudged variant; nearDupImagePairs finds exactly the " +
    "threshold pairs the brute-force hamming check admits") {
    val docs = (0L until 40L).toDF("doc_id")
    val base = Multimodal.pngFromDocuments(spark, docs)
    // byte-identical copy under a shifted id → hamming 0
    val copies = base.withColumn("media_id",
      col("media_id") + 500L)
    val variants = Multimodal.pngFromDocuments(spark, docs,
        rBump = true)
      .withColumn("media_id", col("media_id") + 1000L)
    val all = base.unionByName(copies).unionByName(variants)

    val hashes = Multimodal.imageAHash(spark, all)
      .collect().map(h => h.media_id -> h.ahash).toMap
    // exact copies hash identically
    (0L until 40L).foreach { d =>
      assert(hashes(d) == hashes(d + 500L))
    }
    // the nudged variant stays CLOSE (a one-count gray nudge can only
    // flip samples near the mean) but is a different image byte-wise
    val drifts = (0L until 40L).map(d =>
      java.lang.Long.bitCount(hashes(d) ^ hashes(d + 1000L)))
    assert(drifts.max <= 10 && drifts.count(_ == 0) < 40)

    // blocked pairs == brute force at the threshold (completeness of
    // the pigeonhole banding)
    val got = Multimodal.nearDupImagePairs(spark, all, maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val idsAll = hashes.keys.toSeq.sorted
    val brute = (for {
      a <- idsAll; b <- idsAll if a < b
      h = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("aHash survives resizeImage: integer upscales hash IDENTICALLY " +
    "(provable: the sample grid lands on source pixels), downscale " +
    "drifts within the near-dup threshold on the fixture corpus") {
    val docs = (0L until 40L).toDF("doc_id")
    val base = Multimodal.pngFromDocuments(spark, docs)
    val hashes = Multimodal.imageAHash(spark, base)
      .collect().map(h => h.media_id -> h.ahash).toMap

    // 2x and 3x nearest-neighbor upscales: exactly the same 64 samples
    // (floor(floor(k·a)/k) = floor(a)) → hamming 0 on every image
    Seq(2, 3).foreach { k =>
      val up = Multimodal.imageAHash(spark,
          Multimodal.resizeImage(spark, base, k, 1))
        .collect().map(h => h.media_id -> h.ahash).toMap
      (0L until 40L).foreach { d =>
        assert(up(d) == hashes(d),
          s"${k}x upscale changed the hash of media $d")
      }
    }

    // Downscale robustness is a SMOOTHNESS property (the published
    // aHash caveat): resampling shifts each of the 64 sample points by
    // at most one source pixel, which moves the sampled gray a LOT on
    // high-frequency content and barely at all on smooth content. The
    // wrapping mod-256 ramp fixture is the adversarial extreme —
    // document (deterministically) that halving it drifts far past any
    // bandable threshold, so a downscaled duplicate of such content is
    // out of the average-hash family's reach by design.
    val downAdv = Multimodal.imageAHash(spark,
        Multimodal.resizeImage(spark, base, 1, 2))
      .collect().map(h => h.media_id -> h.ahash).toMap
    val advDrifts = (0L until 40L).map(d =>
      java.lang.Long.bitCount(hashes(d) ^ downAdv(d)))
    info(s"adversarial downscale hamming: max=${advDrifts.max} " +
      s"mean=${advDrifts.sum / 40.0}")
    assert(advDrifts.max > 15,
      "the ramp fixture stopped being adversarial — revisit the bound")

    // On smooth natural-image-like gradients (non-wrapping 64×64
    // planes, neighbor gray delta ≤ ~4) the same halving stays within
    // the near-dup threshold and the banded join catches every
    // original↔downscale pair.
    def smoothPng(id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val ax = 1 + (id % 3).toInt; val ay = 1 + (id % 4).toInt
      var y = 0
      while (y < 64) {
        var x = 0
        while (x < 64) {
          val v = (ax * x + ay * y) * 255 / ((ax + ay) * 63)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream(1024)
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val smooth = (0L until 40L).map(d => (d, smoothPng(d)))
      .toDF("media_id", "payload")
    val sHash = Multimodal.imageAHash(spark, smooth)
      .collect().map(h => h.media_id -> h.ahash).toMap
    val sDown = Multimodal.imageAHash(spark,
        Multimodal.resizeImage(spark, smooth, 1, 2))
      .collect().map(h => h.media_id -> h.ahash).toMap
    val sDrifts = (0L until 40L).map(d =>
      java.lang.Long.bitCount(sHash(d) ^ sDown(d)))
    info(s"smooth downscale hamming: max=${sDrifts.max} " +
      s"mean=${sDrifts.sum / 40.0}")
    assert(sDrifts.max <= 8,
      s"smooth downscale drift ${sDrifts.max} exceeds the pinned bound")
    val shifted = Multimodal.resizeImage(spark, smooth, 1, 2)
      .withColumn("media_id", col("media_id") + 500L)
    val pairs = Multimodal
      .nearDupImagePairs(spark, smooth.unionByName(shifted),
        maxHamming = 8)
      .filter(col("id_b") === col("id_a") + 500L)
      .count()
    assert(pairs == 40L,
      s"expected all 40 original-downscale pairs, got $pairs")
  }
}
