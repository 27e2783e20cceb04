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

  /** MinHash signatures as a STAGED relation (doc, sig: array<long>):
    * explode the distinct shingle set, then take k seeded min-hashes as
    * k codegen'd `min` aggregates with map-side partial aggregation.
    *
    * Why not a per-row expression tree? Higher-order functions
    * (transform/aggregate) are CodegenFallback — interpreted — and
    * Catalyst inlines a referenced subtree into each lambda invocation,
    * so a nested `transform(0..k, i => array_min(transform(shingles, …)))`
    * re-tokenizes the document k×3 times per row (measured: minutes for
    * 500 docs). The explode+agg shape computes the shingle set once per
    * document and keeps the hot path inside WholeStageCodegen; the
    * shuffle key is the doc id — the same key the band join needs next.
    *
    * Documents with fewer than `shingleN` tokens have no shingles and
    * drop out (they can never be near-dup candidates). */
  /** (doc, sh) staged shingle-set relation: tokens materialized first so
    * the shingle lambda reads a column, not a re-split expression.
    * `scaleOut` on the doc id parallelizes the tokenize/shingle compute
    * for single-split sources AND pre-partitions for the signature
    * groupBy(doc), which then reuses the exchange. */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int): DataFrame =
    graft.scaleOut(df, col(idCol))
      .select(col(idCol).as("doc"), Text.tokens(col(textCol)).as("toks"))
      .select(col("doc"),
        Text.shingleSetOfTokens(col("toks"), shingleN).as("sh"))

  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame = {
    // explode_OUTER + post-filter, not plain explode: for non-outer
    // explode the optimizer infers a `size(child)>0` filter and pushes
    // it below the scale-out exchange, re-inlining the whole shingle
    // expression into a single-partition interpreted Filter (measured:
    // the filter alone cost more than the aggregation). Outer explode
    // infers nothing; the cheap isNotNull on the GENERATED column runs
    // parallel, above the exchange, and drops the same rows.
    val exploded = shingleSets(df, idCol, textCol, shingleN)
      .select(col("doc"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
    val aggs = (0 until numHashes)
      .map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    exploded.groupBy("doc").agg(aggs.head, aggs.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Band keys for LSH banding: split the signature into `bands` rows of
    * `rowsPerBand`, hash each band. Two docs sharing ANY band key become
    * a candidate pair. Cheap per-row HOF: `sig` is a materialized column,
    * the lambda only slices and hashes it. */
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
    val banded = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
      .select(col("doc"),
        posexplode(minhashBands(col("sig"), bands, rowsPerBand)))
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
    val sh = shingleSets(df, idCol, textCol, shingleN)
    cands
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
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
    val withSh = graft.scaleOut(df, blockCols.map(col): _*)
      .select(
        (blockCols.map(col) :+ col(idCol) :+
          Text.tokens(col(textCol)).as("toks")): _*)
      .select(
        (blockCols.map(col) :+ col(idCol) :+
          Text.shingleSetOfTokens(col("toks"), shingleN).as("sh")): _*)
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
    * small Hamming distance.
    *
    * Staged relation (doc, sig: long): explode tokens, hash each once,
    * then 64 codegen'd `sum` lanes (bit_get votes) with map-side partial
    * aggregation — the same explode+agg shape as `minhashSignatures`,
    * for the same reason (HOF lambdas are interpreted and re-evaluate
    * captured subtrees per invocation). Empty-token docs drop out. */
  def simhashSignatures(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // explode_outer + isNotNull: see minhashSignatures — avoids the
    // inferred size() filter re-inlining the tokenizer below the
    // exchange.
    val hashed = graft.scaleOut(df, col(idCol))
      .select(col(idCol).as("doc"), Text.tokens(col(textCol)).as("toks"))
      .select(col("doc"), explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
      .select(col("doc"), xxhash64(col("t")).as("h"))
    val lanes = (0 until 64).map(j =>
      sum(when(call_function("bit_get", col("h"), lit(j)) === 1, lit(1L))
        .otherwise(lit(-1L))).as(s"b$j"))
    hashed.groupBy("doc").agg(lanes.head, lanes.tail: _*)
      .select(col("doc"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sig"))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into four 16-bit
    * chunks (any equal chunk → candidate; guarantees recall for hamming
    * ≤ 3 by pigeonhole), verify with exact Hamming ≤ maxHamming. */
  def nearDupPairsSimhash(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val sigd = simhashSignatures(df, idCol, textCol)
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
    val withB = graft.scaleOut(df, col(idCol))
      .select(col(idCol).as("doc"),
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
