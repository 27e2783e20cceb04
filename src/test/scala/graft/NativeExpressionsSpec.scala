package graft

import org.apache.spark.sql.functions._

import graft.functions.Native

class NativeExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("minhash_signature: deterministic, similarity-sensitive, " +
    "null below shingle width") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different document about spark internals"),
      (4L, "too short")).toDF("id", "t")
    val sigs = df.select(col("id"),
        Native.minhashSignature(col("t"), 3, 64).as("sig"))
      .collect().map(r =>
        r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(sigs(1L).get == sigs(2L).get)   // identical text, same sig
    assert(sigs(1L).get != sigs(3L).get)   // different text, different sig
    assert(sigs(1L).get.length == 64)
    assert(sigs(4L).isEmpty)               // < 3 tokens → null
  }

  test("simhash64: identical → equal; near-dup → small hamming") {
    val base = "spark catalyst optimizes declarative query plans into " +
      "codegen stages for distributed execution across many workers"
    val df = Seq((1L, base), (2L, base), (3L, base + " quickly"),
      (4L, "entirely unrelated content about cooking pasta al dente"))
      .toDF("id", "t")
    val s = df.select(col("id"), Native.simhash64(col("t")).as("sig"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(s(1L) == s(2L))
    assert(ham(s(1L), s(3L)) <= 6)   // one appended word flips few bits
    assert(ham(s(1L), s(4L)) > 10)   // unrelated text is far
  }

  test("expressions run identically via codegen and interpreted eval") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "t")
    val viaCodegen = df
      .select(Native.minhashSignature(col("t")).as("sig"),
        Native.simhash64(col("t")).as("sh"))
      .head()
    // interpreted path: eval through a literal-free projection on a
    // non-codegen plan (local relation + explicit eval)
    import graft.functions.{MinHashSignature, SimHash64, TextSignatureKernels}
    import org.apache.spark.unsafe.types.UTF8String
    val t = UTF8String.fromString("alpha beta gamma delta epsilon zeta")
    val direct = TextSignatureKernels.minhash(t, 3, 64, 42L)
    assert(viaCodegen.getSeq[Long](0) == direct.toLongArray().toSeq)
    assert(viaCodegen.getLong(1) == TextSignatureKernels.simhash(t, 42L))
  }

  test("SQL surface via GraftExtensions: minhash_signature/simhash64 " +
    "callable from spark.sql") {
    Seq((1L, "one two three four five")).toDF("id", "t")
      .createOrReplaceTempView("native_docs")
    val r = spark.sql(
      """SELECT size(minhash_signature(t, 3, 16)) AS k,
                simhash64(t) AS sh,
                minhash_signature(t) IS NOT NULL AS ok
         FROM native_docs""").head()
    assert(r.getInt(0) == 16)
    assert(r.getBoolean(2))
  }

  test("minhash_bands rejects non-dividing or non-positive band counts " +
    "at construction, from Scala and SQL") {
    import graft.functions.MinHashBands
    import org.apache.spark.sql.catalyst.expressions.Literal
    // bands=5 does not divide 64 → trailing lanes would be silently
    // ignored; bands=0 → degenerate keys. Both must fail fast.
    intercept[IllegalArgumentException] {
      MinHashBands(Literal("x"), 3, 64, 5, 42L)
    }
    intercept[IllegalArgumentException] {
      MinHashBands(Literal("x"), 3, 64, 0, 42L)
    }
    Seq((1L, "a b c d e")).toDF("id", "t")
      .createOrReplaceTempView("native_docs_bands")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT minhash_bands(t, 3, 64, 5) FROM native_docs_bands").head()
    }
    assert(e.getMessage.contains("divide"), e.getMessage)
    // the dividing case still works end-to-end
    val ok = spark.sql(
      "SELECT size(minhash_bands(t, 3, 64, 16)) FROM native_docs_bands")
      .head().getInt(0)
    assert(ok == 16)
  }

  test("near-dup operators still find planted pairs with native sigs") {
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "sun sets slowly behind the quiet green hills of the north"
    val docs = Seq((1L, base), (2L, base), (3L, base + " tonight"),
      (4L, "unrelated words about catalyst expression codegen internals " +
        "and shuffle partition planning in large clusters"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .nearDupPairsMinhash(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("hyperplane_buckets: deterministic, scale-invariant, " +
    "table count honored") {
    import graft.functions.Native
    val df = Seq(
      (1L, Array(0.3, -1.2, 0.8, 2.0)),
      (2L, Array(0.6, -2.4, 1.6, 4.0)),  // 2× vector 1: same signs
      (3L, Array(-0.3, 1.2, -0.8, -2.0))) // negated: complement signs
      .toDF("id", "v")
      .select(col("id"), Native.hyperplaneBuckets(col("v"), 6, 8).as("b"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(rows(1).size == 8)
    assert(rows(1) == rows(2))    // positive scaling never moves buckets
    assert(rows(1) != rows(3))
    // re-evaluation is bit-identical (pure function of (v, seed))
    assert(df.collect().map(_.getSeq[Long](1).toList).toList ==
      List(rows(1), rows(2), rows(3)))
  }

  test("scrub_pii / portable_hash SQL surface matches the Column API") {
    Seq(("mail me: a.b@c.io or +1-555-0042", 7L))
      .toDF("t", "id").createOrReplaceTempView("pii_t")
    val r = spark.sql(
      "SELECT scrub_pii(t) AS c, portable_hash(id, 'x') AS h FROM pii_t")
      .head()
    assert(r.getAs[String]("c") == "mail me: <EMAIL> or <PHONE>")
    val viaColumn = Seq(7L).toDF("id")
      .select(graft.operators.Sampling.portableHash(col("id"), "x"))
      .head().getLong(0)
    assert(r.getAs[Long]("h") == viaColumn)
    // non-literal salt fails loudly
    val err = intercept[Exception] {
      spark.sql("SELECT portable_hash(id, t) FROM pii_t").collect()
    }
    assert(err.getMessage.contains("string literal"))
  }

  test("hyperplane_buckets SQL surface matches the Column API") {
    Seq((1L, Seq(0.4, -1.1, 2.2))).toDF("id", "v")
      .createOrReplaceTempView("hb_t")
    val viaSql = spark.sql(
      "SELECT hyperplane_buckets(v, 6, 8) AS b FROM hb_t")
      .head().getSeq[Long](0).toList
    val viaCol = spark.table("hb_t")
      .select(graft.functions.Native.hyperplaneBuckets(col("v"), 6, 8))
      .head().getSeq[Long](0).toList
    assert(viaSql == viaCol && viaSql.size == 8)
  }

  test("token_fingerprint native kernel equals the declarative HOF " +
    "fold, including empties, repeated spaces, and unicode") {
    val samples = Seq("", " ", "a", "the quick brown fox", "a  b",
      "Mixed CASE Words here", "word " * 30 + "tail",
      "\u00fcber caf\u00e9 na\u00efve")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val both = samples.select(col("id"),
      graft.functions.Native.tokenFingerprint(col("text")).as("native"),
      graft.functions.Text.tokenFingerprint(col("text")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[Long]("native") == r.getAs[Long]("hof"),
        s"id=${r.getAs[Long]("id")}")
    }
    // SQL surface matches the Column API
    samples.createOrReplaceTempView("fp_t")
    val viaSql = spark.sql(
      "SELECT id, token_fingerprint(text) AS fp FROM fp_t")
      .as[(Long, Long)].collect().toMap
    val viaCol = samples.select(col("id"),
      graft.functions.Native.tokenFingerprint(col("text")))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaCol)
  }
}
