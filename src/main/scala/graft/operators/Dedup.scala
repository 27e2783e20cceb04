package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}

/** Deduplication operators for pretraining-scale corpora
  * (SURVEY.md §2.11 X1/X2).
  *
  * Scale design: every variant reduces the O(n²) pair problem to a
  * shuffle on a deterministic key —
  *  - exact:    hash-groupBy on a content digest (one shuffle, linear)
  *  - MinHash:  shingle → k seeded min-hashes → band buckets →
  *              self-join within buckets (candidate pairs only)
  *  - SimHash:  64-bit signature → band chunks → hamming verify
  *  - embedding: random-hyperplane LSH buckets → cosine verify
  * None of them ever materializes the full cross product; the verify
  * step touches candidate pairs only.
  */
object Dedup {

  /** X1: exact dedup by content digest. Returns one surviving row id per
    * distinct content + the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** X1 applied: the deduplicated relation itself. */
  def dropExactDups(df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val keep = exact(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signature: k seeded min-hashes over the distinct shingle
    * set. xxhash64(seed, shingle) is the hash family; array_min folds
    * each. Pure per-row expressions — no shuffle, no UDF. */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = Text.shingleSet(text, shingleN)
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))
  }

  /** Band keys for LSH banding: split the signature into `bands` rows of
    * `rowsPerBand`, hash each band. Two docs sharing ANY band key become
    * a candidate pair. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b,
        slice(sig, b.cast("int") * rowsPerBand + 1, lit(rowsPerBand))))

  /** X2: MinHash/LSH candidate pairs (id_a < id_b), deduplicated across
    * bands. The groupBy-free formulation: explode bands → self-join on
    * (band index, band hash) → distinct. Shuffle key is the band hash —
    * uniform by construction, skew-free. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, numHashes: Int = 64,
                            bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(col(textCol), shingleN, numHashes)
    val banded = df.select(col(idCol).as("doc"),
        posexplode(minhashBands(sig, bands, rowsPerBand)))
      .toDF("doc", "band", "bkey")
    val a = banded.select(col("band"), col("bkey"), col("doc").as("id_a"))
    val b = banded.select(col("band"), col("bkey"), col("doc").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over distinct shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** X2 end-to-end: MinHash candidates verified with exact Jaccard ≥
    * threshold. Verification re-joins the shingle sets for candidate
    * pairs only. */
  def nearDupPairsMinhash(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double, shingleN: Int = 3,
                          numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val cands = minhashCandidatePairs(df, idCol, textCol, shingleN,
      numHashes, bands)
    val sh = df.select(col(idCol),
      Text.shingleSet(col(textCol), shingleN).as("sh"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Blocked exact-Jaccard near-dup join: candidate pairs limited to a
    * deterministic blocking key (e.g. (lang, source)). Fully
    * SQL-expressible → DuckDB-verifiable, and the blocking key is the
    * shuffle key at scale. */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], shingleN: Int,
                          threshold: Double): DataFrame = {
    val withSh = df.select(
      (blockCols.map(col) :+ col(idCol) :+
        Text.shingleSet(col(textCol), shingleN).as("sh")): _*)
    val a = withSh.select(
      (blockCols.map(col) :+ col(idCol).as("id_a") :+ col("sh").as("sh_a")): _*)
    val b = withSh.select(
      (blockCols.map(col) :+ col(idCol).as("id_b") :+ col("sh").as("sh_b")): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
        col("jaccard")): _*)
  }

  /** SimHash: 64-bit signature — bit j of each token's hash votes ±1;
    * the sign of the tally sets bit j of the fingerprint. Near-dups have
    * small Hamming distance. Expressed as a 64-lane fold over the token
    * array — per-row, codegen'd. */
  def simhash64(text: Column): Column = {
    val toks = Text.tokens(text)
    // call_function: the SQL forms of bit_get/shiftleft accept a column
    // position, unlike their Scala wrappers which require a literal Int.
    val lanes = transform(sequence(lit(0), lit(63)), j =>
      aggregate(toks, lit(0L), (acc, t) =>
        acc + when(call_function("bit_get", xxhash64(t), j) === 1, lit(1L))
          .otherwise(lit(-1L))))
    aggregate(
      zip_with(lanes, sequence(lit(0), lit(63)), (v, j) =>
        when(v > 0, call_function("shiftleft", lit(1L), j))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into four 16-bit
    * chunks (any equal chunk → candidate; guarantees recall for hamming
    * ≤ 3 by pigeonhole), verify with exact Hamming ≤ maxHamming. */
  def nearDupPairsSimhash(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val sigd = df.select(col(idCol).as("doc"),
      simhash64(col(textCol)).as("sig"))
    val banded = sigd.select(col("doc"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sig"), b * 16)
          .bitwiseAND(lit(0xFFFFL)))))
      .toDF("doc", "sig", "band", "chunk")
    val a = banded.select(col("band"), col("chunk"),
      col("doc").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("doc").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Vectors.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: LSH-bucket join + exact cosine ≥ threshold.
    * The bucket key collapses the cross product; only same-bucket pairs
    * are scored. */
  def nearDupPairsEmbedding(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, nPlanes: Int = 12): DataFrame = {
    val withB = df.select(col(idCol).as("doc"),
      Vectors.toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", Vectors.lshBucket(col("v"), nPlanes))
    val a = withB.select(col("bucket"), col("doc").as("id_a"),
      col("v").as("v_a"))
    val b = withB.select(col("bucket"), col("doc").as("id_b"),
      col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Vectors.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
