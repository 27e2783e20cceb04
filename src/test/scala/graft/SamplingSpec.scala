package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Curation, Sampling}

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  test("deterministicSample: reproducible, salt-sensitive, ~frac sized") {
    val ids = spark.range(0, 4000).toDF("id")
    val s1 = Sampling.deterministicSample(ids, "id", 0.25, "a")
      .as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(ids, "id", 0.25, "a")
      .as[Long].collect().toSet
    val s3 = Sampling.deterministicSample(ids, "id", 0.25, "b")
      .as[Long].collect().toSet
    assert(s1 == s2)                 // same salt → same rows, always
    assert(s3 != s1)                 // different salt → different rows
    assert(math.abs(s1.size - 1000) < 150) // ~25% of 4000
    // nested property: a smaller frac with the same salt is NOT
    // guaranteed to nest (threshold moves), but frac=0 and frac=1 bound
    assert(Sampling.deterministicSample(ids, "id", 0.0, "a").count() == 0)
    assert(Sampling.deterministicSample(ids, "id", 1.0, "a").count() == 4000)
  }

  test("balanceStrata: every stratum lands near the smallest's size") {
    val df = (Seq.fill(1600)("big") ++ Seq.fill(400)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "source")
    val bal = Sampling.balanceStrata(df, "source", "id", "mix")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bal("small") == 400)            // smallest stratum: kept whole
    assert(math.abs(bal("big") - 400) < 120) // big: downsampled to ~400
    // deterministic: second run identical
    val again = Sampling.balanceStrata(df, "source", "id", "mix")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == bal)
  }

  test("balanceStrataBy: strata balance in UNITS, not rows — a " +
    "verbose stratum downsamples by token mass; smallest kept whole") {
    // 'big' has 400 rows of 40 units (16,000 units); 'small' has 400
    // rows of 10 units (4,000 units) — row-balanced already, 4x
    // token-imbalanced
    val df = ((0 until 400).map(i => (i.toLong, "big", 40L)) ++
      (400 until 800).map(i => (i.toLong, "small", 10L)))
      .toDF("id", "source", "units")
    val bal = Sampling.balanceStrataBy(df, "source", "id", "units", "mixt")
      .groupBy("source").agg(sum("units").as("u"))
      .as[(String, Long)].collect().toMap
    assert(bal("small") == 4000)              // smallest mass: kept whole
    assert(math.abs(bal("big") - 4000) < 1400) // ~4,000 of 16,000 units
    // deterministic
    val again = Sampling
      .balanceStrataBy(df, "source", "id", "units", "mixt")
      .groupBy("source").agg(sum("units").as("u"))
      .as[(String, Long)].collect().toMap
    assert(again == bal)
  }

  test("sampleKPerStratum: exactly k per stratum, reproducible") {
    val df = (0 until 300).map(i => (i.toLong, "s" + (i % 3)))
      .toDF("id", "source")
    val s1 = Sampling.sampleKPerStratum(df, "source", "id", 5, "peek")
      .select("source", "id").as[(String, Long)].collect().toSet
    assert(s1.size == 15)
    assert(s1.groupBy(_._1).forall(_._2.size == 5))
    val s2 = Sampling.sampleKPerStratum(df, "source", "id", 5, "peek")
      .select("source", "id").as[(String, Long)].collect().toSet
    assert(s1 == s2)
  }

  test("scrubPii replaces emails and phone spans with placeholders") {
    val df = Seq(
      ("reach me at jo.doe+x@mail-host.co.uk thanks",
        "reach me at <EMAIL> thanks"),
      ("call +1-555-0042 or (020) 7946-0958 now",
        "call <PHONE> or <PHONE> now"),
      ("no pii here", "no pii here"))
      .toDF("raw", "expected")
    val bad = df.filter(Text.scrubPii(col("raw")) =!= col("expected"))
      .count()
    assert(bad == 0)
  }

  test("contamination finds planted train/bench n-gram overlap only") {
    val shared = (1 to 10).map("s" + _).mkString(" ") // 10 tokens
    val train = Seq(
      (1L, shared + " tail tokens here"),
      (2L, "completely different words " + (1 to 8).map("t" + _)
        .mkString(" "))).toDF("doc_id", "text")
    val bench = Seq((100L, shared + " other ending")).toDF("doc_id", "text")
    val hits = Curation.contamination(train, bench, "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 shares the 3 8-grams inside `shared`; doc 2 shares none
    assert(hits == Seq((1L, 3L, 1L)))
  }

  test("packContiguous assigns docs to contexts by starting offset") {
    val docs = Seq(
      (1L, "en", 3000L), (2L, "en", 2000L), (3L, "en", 2000L),
      (4L, "de", 5000L))
      .toDF("doc_id", "lang", "n_chars")
    val packed = Curation
      .packContiguous(docs, "lang", "doc_id", "n_chars", 4096L)
      .orderBy("lang", "bin")
      .as[(String, Long, Long, Long)].collect().toSeq
    // en: doc1 starts 0 → bin 0; doc2 starts 3000 → bin 0; doc3 starts
    // 5000 → bin 1. de: doc4 starts 0 → bin 0.
    assert(packed == Seq(
      ("de", 0L, 1L, 5000L), ("en", 0L, 2L, 5000L), ("en", 1L, 1L, 2000L)))
  }

  test("deterministicShuffle: reproducible permutation, uniform hash-mod " +
    "buckets, salt changes the order") {
    val ids = spark.range(0, 2000).toDF("id")
    def order(salt: String) = Sampling
      .deterministicShuffle(ids, "id", salt, buckets = 8)
      .orderBy("shuffle_key", "id").select("id").as[Long].collect().toSeq
    val o1 = order("ep0")
    assert(o1 == order("ep0"))            // pure function of (id, salt)
    assert(o1 != order("ep1"))            // new salt → new permutation
    assert(o1 != (0L until 2000L))        // actually shuffled
    assert(o1.sorted == (0L until 2000L)) // a permutation, nothing lost
    val buckets = Sampling.deterministicShuffle(ids, "id", "ep0", 8)
      .groupBy("bucket").count().collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("count")).toMap
    assert(buckets.keySet == (0L until 8L).toSet)
    assert(buckets.values.forall(n => n > 150 && n < 350)) // ~250 each
  }

  test("splitFractions: exactly one label per row, sizes near the " +
    "fractions, stable under corpus growth, bad fractions refused") {
    val ids = spark.range(0, 4000).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitFractions(ids, "id", "sp0", fr)
    assert(out.count() == 4000L) // one row in, one row out
    val sizes = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes("train") > 3000 && sizes("train") < 3400)
    assert(sizes("val") > 250 && sizes("val") < 550)
    // growth stability: the same doc keeps its split when the corpus
    // doubles — the property that keeps eval sets uncontaminated
    val small = out.select("id", "split").as[(Long, String)]
      .collect().toMap
    val grown = Sampling.splitFractions(
        spark.range(0, 8000).toDF("id"), "id", "sp0", fr)
      .filter($"id" < 4000).select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(grown == small)
    intercept[IllegalArgumentException] {
      Sampling.splitFractions(ids, "id", "s", Seq("a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitFractions(ids, "id", "s",
        Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("repeatWeighted: integer weights repeat exactly, fractional " +
    "weights hit the expected count, zero drops, out-of-range fails " +
    "loudly") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("w", when($"id" < 100, 3.0)   // exactly 3 copies
        .when($"id" < 200, 0.0)                 // dropped
        .otherwise(2.5))                        // 2 or 3, E = 2.5
    val out = Sampling.repeatWeighted(df, "id", "w", "ep0")
    val byBand = out.groupBy(when($"id" < 100, "i3")
        .when($"id" < 200, "z").otherwise("f").as("band"))
      .agg(count(lit(1)).as("copies"),
        countDistinct($"id").as("docs"),
        max("copy_idx").as("maxi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byBand("i3") == ((300L, 100L, 2L))) // 100 docs × exactly 3
    assert(!byBand.contains("z"))              // w = 0 emits nothing
    val (fCopies, fDocs, fMax) = byBand("f")
    assert(fDocs == 800L && fMax == 2L)
    assert(fCopies > 1900L && fCopies < 2100L) // ≈ 800 × 2.5
    // reproducible: same salt, same realization
    assert(Sampling.repeatWeighted(df, "id", "w", "ep0").count() ==
      out.count())
    val bad = df.withColumn("w", lit(-1.0))
    // raise_error surfaces as SparkRuntimeException (local relation) or
    // SparkException (task failure) depending on where eval happens
    intercept[Exception] {
      Sampling.repeatWeighted(bad, "id", "w", "ep0").count()
    }
  }

  test("temperatureMixture: α=1 is exactly deterministicSample; α<1 " +
    "upsamples the tail stratum (rate caps at 1 → every row kept)") {
    import org.apache.spark.sql.functions._
    // 900 'a' rows + 100 'b' rows; α=.5, target .5:
    //   z = √900 + √100 = 40
    //   r_a = min(1, .5·1000·30/40/900) = .4166667 ; r_b = min(1, 1.25) = 1
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("dom", when(col("id") < 900, "a").otherwise("b"))
    val out = Sampling.temperatureMixture(df, "dom", "id", 0.5, 0.5, "s")
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("b") == 100L) // capped rate 1.0 → whole tail stratum kept
    assert(out("a") > 300L && out("a") < 450L) // ≈ .4167 · 900
    // α=1 → r_s = targetFrac for every stratum = plain deterministic
    // sampling with the same salt, row for row
    val t1 = Sampling.temperatureMixture(df, "dom", "id", 1.0, 0.25, "s")
      .select("id").as[Long].collect().toSet
    val ds = Sampling.deterministicSample(df, "id", 0.25, "s")
      .select("id").as[Long].collect().toSet
    assert(t1 == ds)
  }

  test("mixtureRates: α=1 is uniform targetFrac, α=0 equalizes " +
    "strata with the cap binding on the small one — hand-checked") {
    val docs = (1L to 90L)
      .map(i => (i, if (i <= 80) "big" else "small"))
      .toDF("id", "dom")
    def rates(alpha: Double, f: Double): Map[String, (Double, Double)] =
      Sampling.mixtureRates(docs, "dom", alpha, f).collect()
        .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
        .toMap
    // α=0, f=0.5: z = 2, c = 90 → rate_s = min(1, 22.5/n):
    // big (80) = 0.28125, small (10) capped at 1.0
    assert(rates(0.0, 0.5) ==
      Map("big" -> (0.28125, 22.5), "small" -> (1.0, 10.0)))
    // α=1: every stratum keeps exactly targetFrac
    assert(rates(1.0, 0.4) ==
      Map("big" -> (0.4, 32.0), "small" -> (0.4, 4.0)))
  }

  test("mixToShares: hand-checked weights — under-share strata repeat, " +
    "over-share strata thin, expected output mass = share · T") {
    // units: a = 800, b = 200 → T = 1000; targets a 0.3 / b 0.7 →
    // weight_a = 300/800 = 0.375 (downsample), weight_b = 700/200 =
    // 3.5 (upsample: 3 whole copies + Bernoulli(.5))
    val df = ((1L to 80L).map(i => (i, "a", 10L)) ++
      (81L to 100L).map(i => (i, "b", 10L)))
      .toDF("id", "dom", "units")
    val targets = Seq(("a", 0.3), ("b", 0.7)).toDF("dom", "target_share")
    val w = Sampling.shareWeights(df, "dom", "units", targets)
      .collect().map(r => r.getString(0) -> (r.getDouble(1),
        r.getDouble(2))).toMap
    assert(w == Map("a" -> (0.3, 0.375), "b" -> (0.7, 3.5)))
    val out = Sampling.mixToShares(df, "dom", "id", "units", targets,
      "s17").groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // b: every doc emits 3 or 4 copies → 60 ≤ count ≤ 80; a: ≈ 30
    assert(out("b") >= 60L && out("b") <= 80L, s"b = ${out("b")}")
    assert(out("a") > 10L && out("a") < 55L, s"a = ${out("a")}")
    // copies of one id are distinct copy_idx rows
    val ci = Sampling.mixToShares(df, "dom", "id", "units", targets,
      "s17").filter(col("id") === 90L).select("copy_idx")
      .as[Long].collect().sorted
    assert(ci.length >= 3 && ci.toSeq == (0L until ci.length).toSeq)
    // a stratum absent from the recipe is dropped; bad recipes fail
    val partial = Sampling.mixToShares(df, "dom", "id", "units",
      Seq(("a", 1.0)).toDF("dom", "target_share"), "s17")
    assert(partial.filter(col("dom") === "b").count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.shareWeights(df, "dom", "units",
        Seq(("a", 0.6), ("b", 0.6)).toDF("dom", "target_share"))
    }
    intercept[IllegalArgumentException] {
      Sampling.shareWeights(df, "dom", "units",
        Seq(("a", 0.5), ("a", 0.5)).toDF("dom", "target_share"))
    }
  }
}
