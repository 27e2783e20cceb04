package graft

import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}

class TextVectorsSpec extends SparkSpec {

  import spark.implicits._

  test("token counts, shingles, occ") {
    val df = Seq(("the cat sat on the mat", 1)).toDF("t", "id")
    val r = df.select(
      Text.tokenCount(col("t")).as("n"),
      Text.distinctTokenCount(col("t")).as("u"),
      Text.occ(col("t"), "the").as("the_n"),
      Text.shingleSet(col("t"), 2).as("sh"))
      .head()
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("u") == 5)
    assert(r.getAs[Long]("the_n") == 2)
    assert(r.getAs[Seq[String]]("sh").toSet ==
      Set("the cat", "cat sat", "sat on", "on the", "the mat"))
  }

  test("shingles of short docs are empty, not null") {
    val df = Seq(("one two", 1)).toDF("t", "id")
    assert(df.select(Text.shingleSet(col("t"), 3)).head().getSeq[String](0)
      .isEmpty)
  }

  test("chunkPassages: overlap windows, boundary counts, tiny docs") {
    def chunksOf(text: String, c: Int, ov: Int): Seq[Seq[String]] =
      Seq(text).toDF("t")
        .select(Text.chunkPassages(col("t"), c, ov).as("ch"))
        .as[Seq[Seq[String]]].collect().head
    // 10 tokens, chunk 4, overlap 1 (stride 3): ceil(9/3)=3 chunks
    val got = chunksOf((1 to 10).map("w" + _).mkString(" "), 4, 1)
    assert(got == Seq(
      Seq("w1", "w2", "w3", "w4"),
      Seq("w4", "w5", "w6", "w7"),
      Seq("w7", "w8", "w9", "w10")))
    // doc shorter than one chunk → exactly one short chunk
    assert(chunksOf("a b", 4, 1) == Seq(Seq("a", "b")))
    // exact multiple: 7 tokens, chunk 4, overlap 1 → 2 chunks, last full
    assert(chunksOf((1 to 7).map("w" + _).mkString(" "), 4, 1) ==
      Seq(Seq("w1", "w2", "w3", "w4"), Seq("w4", "w5", "w6", "w7")))
    // every token appears in ≥1 chunk (coverage invariant)
    val all = chunksOf((1 to 23).map("w" + _).mkString(" "), 5, 2).flatten
    assert((1 to 23).forall(i => all.contains("w" + i)))
  }

  test("bpeish token count splits at word/digit/punct boundaries") {
    val df = Seq(("hello world42 foo-bar", 1)).toDF("t", "id")
    // hello | world | 42 | foo | - | bar
    assert(df.select(Text.bpeishTokenCount(col("t"))).head().getLong(0) == 6)
  }

  test("langId picks the marker-dominant language") {
    val df = Seq(
      ("the house of a king", "en"),
      ("el rey de la casa", "es"),
      ("der hund und die katze", "de"),
      ("xyzzy plugh", "und")).toDF("t", "expected")
    val got = df.select(Text.langId(col("t")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("fingerprints are deterministic and order-sensitive") {
    val df = Seq(("a b c", 1), ("c b a", 2), ("a b c", 3)).toDF("t", "id")
    val fps = df.orderBy("id")
      .select(Text.tokenFingerprint(col("t"))).as[Long].collect()
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
  }

  test("cosine: exact values, zero-norm guard, hamming") {
    val df = Seq((Array(1.0, 0.0), Array(0.6, 0.8)),
      (Array(0.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
    val vals = df.select(Vectors.cosine(col("a"), col("b"))).collect()
    assert(math.abs(vals(0).getDouble(0) - 0.6) < 1e-12)
    assert(vals(1).isNullAt(0)) // zero norm → NULL, never NaN
    val h = Seq((5L, 3L)).toDF("x", "y")
      .select(Vectors.hamming64(col("x"), col("y"))).as[Long].head()
    assert(h == 2) // 101 xor 011 = 110
  }

  test("lshBucket: same vector → same bucket; buckets within [0, 2^n)") {
    val df = Seq(
      (1L, Array(0.1f, 0.9f, -0.3f)),
      (2L, Array(0.1f, 0.9f, -0.3f)),
      (3L, Array(-0.5f, 0.2f, 0.8f))).toDF("id", "v")
    val b = df.select(col("id"),
      Vectors.lshBucket(Vectors.toDouble(col("v")), 6).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))
    assert(b.values.forall(x => x >= 0 && x < 64))
  }
}
