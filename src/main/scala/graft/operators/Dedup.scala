package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Native, Text, Vectors}

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

  /** (doc, sh) staged shingle-set relation (the Jaccard-verify input) —
    * native one-pass expression; `scaleOut` parallelizes single-split
    * sources. */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int): DataFrame =
    graft.scaleOut(df, col(idCol))
      .select(col(idCol).as("doc"),
        Native.shingleSet(col(textCol), shingleN).as("sh"))

  /** MinHash signatures as a staged relation (doc, sig: array<long>),
    * computed by the NATIVE one-pass expression
    * (functions.MinHashSignature — custom Catalyst Expression with
    * codegen): zero shuffle, no explode, embarrassingly parallel.
    *
    * History: the first formulation (nested HOF lambdas) ran
    * interpreted and re-tokenized each doc k×3 times per shingle; the
    * second (explode shingles → k min-aggregates) was codegen'd but
    * paid a full shuffle of the exploded corpus. The native expression
    * does one pass per row. Documents with fewer than `shingleN` tokens
    * yield a null signature and drop out (they can never be near-dup
    * candidates). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame =
    graft.scaleOut(df)
      .select(col(idCol).as("doc"),
        Native.minhashSignature(col(textCol), shingleN, numHashes)
          .as("sig"))
      .filter(col("sig").isNotNull)

  /** Band keys for LSH banding: split the signature into `bands` rows of
    * `rowsPerBand`, hash each band. Two docs sharing ANY band key become
    * a candidate pair. Cheap per-row HOF: `sig` is a materialized column,
    * the lambda only slices and hashes it. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b,
        slice(sig, b.cast("int") * rowsPerBand + 1, lit(rowsPerBand))))

  /** X2: MinHash/LSH candidate pairs (id_a < id_b), deduplicated across
    * bands. The groupBy-free formulation: fused signature+banding
    * expression (one pass per doc, zero shuffle to produce band keys) →
    * explode → self-join on (band index, band hash) → distinct. Shuffle
    * key is the band hash — uniform by construction, skew-free.
    * posexplode_OUTER + isNotNull keeps the optimizer from inferring a
    * size() filter that would re-run the kernel (see tokenStream). */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, numHashes: Int = 64,
                            bands: Int = 16): DataFrame = {
    val banded = bandSignatureTable(df, idCol, textCol, Nil, shingleN,
      numHashes, bands)
    val a = banded.select(col("band"), col("bkey"), col("doc").as("id_a"))
    val b = banded.select(col("band"), col("bkey"), col("doc").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The persisted SIGNATURE-TABLE shape of LSH banding — one row per
    * (doc, band) with the band's hash key, plus any blocking columns:
    * the relation a 100 TB continual-ingestion deployment keeps as its
    * own bucketed table so nightly admission never rescans corpus
    * text ([[incrementalNewNearDupBanded]] consumes it; append each
    * admitted batch's rows to keep it current). Map-only: the fused
    * native signature+banding expression computes keys in one pass per
    * row, the explode is 'bands' rows per doc. Docs below the shingle
    * width yield no rows (null signature) — no shingle evidence, so
    * they can never block or be blocked. */
  def bandSignatureTable(df: DataFrame, idCol: String, textCol: String,
                         blockCols: Seq[String] = Nil, shingleN: Int = 3,
                         numHashes: Int = 64, bands: Int = 16): DataFrame =
    explodeBandKeys(
      graft.scaleOut(df)
        .select((blockCols.map(col) :+ col(idCol).as("doc") :+
          Native.minhashBands(col(textCol), shingleN, numHashes, bands)
            .as("bkeys")): _*),
      "doc", "bkeys", blockCols)

  /** The signature relation from an ALREADY-MATERIALIZED band-key
    * column — the columnar deployment shape, where signatures ride the
    * curated table itself (stamped at admission, one commit per batch,
    * and the signature scan is column-pruned to
    * (blockCols, id, bkeys)) instead of living in a second table whose
    * extra per-batch commits dominate small waves (measured: the
    * two-table q218 draft cost 2.5× the columnar one at sf0.1). */
  def explodeBandKeys(df: DataFrame, idCol: String, bkeysCol: String,
                      blockCols: Seq[String] = Nil): DataFrame =
    df.select((blockCols.map(col) :+ col(idCol).as("doc") :+
        posexplode_outer(col(bkeysCol))): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
      .filter(col("bkey").isNotNull)

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
      // size prefilter: |A∩B| ≤ min(|A|,|B|), |A∪B| ≥ max(|A|,|B|), so
      // jaccard ≤ min/max — pairs failing the cheap ratio can never pass
      // the threshold; the expensive intersect runs on survivors only.
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double")
        / greatest(size(col("sh_a")), size(col("sh_b"))).cast("double")
        >= threshold)
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Blocked exact-Jaccard near-dup join with TWO-LEVEL keying: the
    * user's deterministic blocking key (e.g. (lang, source)) × a
    * shingle-count log₂ bucket. Fully SQL-expressible → DuckDB-
    * verifiable, and the composite key is the shuffle key at scale.
    *
    * The size-bucket level is exactness-preserving: jaccard = |∩|/|∪| ≤
    * min(|A|,|B|)/max(|A|,|B|), so any pair above `threshold` has log₂
    * shingle-count gap ≤ log₂(1/threshold) — joining each doc's bucket
    * against the ⌊log₂(1/t)⌋+1 neighboring buckets on each side loses
    * nothing the size-ratio prune would have kept. The bucket is
    * computed integer-exactly (`length(bin(n))` = ⌊log₂ n⌋+1, no FP
    * boundary hazard), and each surviving pair matches on exactly one
    * composite key (side a's own bucket), so no post-join distinct is
    * needed. Within a coarse (lang, source) block this subdivides the
    * self-join by document size — mixed-length corpora (the 100 TB
    * case) stop being quadratic in the block.
    *
    * FENCED as a backstop: pair count is still quadratic in a (block ×
    * bucket) cell, so this exact variant refuses inputs past `maxRows` —
    * it exists as the oracle twin of the scale path, which is
    * `nearDupPairsMinhash` (band-hash keys, candidates only, never
    * all-pairs). */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], shingleN: Int,
                          threshold: Double,
                          maxRows: Int = 1000000): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    // bucket-gap bound for pairs above threshold; +1 absorbs the floor
    val nbr = (math.log(1.0 / threshold) / math.log(2.0)).toInt + 1
    val fenced = graft.fenceQuadratic(df, maxRows,
      s"blockedJaccardPairs on coarse blocks (${blockCols.mkString(",")})",
      "use nearDupPairsMinhash (band-hash candidate keys)")
    val withSh = graft.scaleOut(fenced, blockCols.map(col): _*)
      .select(
        (blockCols.map(col) :+ col(idCol) :+
          Native.shingleSet(col(textCol), shingleN).as("sh")): _*)
      .filter(col("sh").isNotNull)
      .withColumn("szb",
        length(bin(greatest(size(col("sh")), lit(1)).cast("long"))))
    // Side a carries its shingle set once; the EXPLODED side b ships only
    // scalars (id + size) so the neighbor-bucket fan-out never multiplies
    // array payload through the shuffle. sh_b is fetched afterwards for
    // the few candidates surviving the integer size-ratio prune.
    val a = withSh.select(
      (blockCols.map(col) :+ col("szb") :+ col(idCol).as("id_a")
        :+ col("sh").as("sh_a") :+ size(col("sh")).as("n_a")): _*)
    val b = withSh.select(
      (blockCols.map(col) :+
        explode(sequence(col("szb") - nbr, col("szb") + nbr)).as("szb")
        :+ col(idCol).as("id_b") :+ size(col("sh")).as("n_b")): _*)
    val cand = a.join(b, blockCols :+ "szb")
      .filter(col("id_a") < col("id_b"))
      // same size-ratio prune as nearDupPairsMinhash: jaccard ≤ min/max
      .filter(least(col("n_a"), col("n_b")).cast("double")
        / greatest(col("n_a"), col("n_b")).cast("double") >= threshold)
    cand
      .join(withSh.select(col(idCol).as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
        col("jaccard")): _*)
  }

  /** X2/X4: EXACT duplicated-span coverage — the signal behind
    * suffix-array exact-substring dedup (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"),
    * re-expressed relationally: for every document, how many of its
    * DISTINCT n-token spans also occur in at least `minDocs`
    * documents corpus-wide (itself included), plus the coverage
    * ratio. Documents with high `dup_ratio` are boilerplate/mirror
    * suspects; a length-L duplicated substring in the suffix-array
    * formulation is exactly a run of duplicated n-grams here.
    *
    * Scale design: one explode → one aggregation keyed on the n-gram
    * → one semi-join back, all shuffles on the gram key — linear in
    * corpus token count, never pairwise in documents. The per-gram
    * state is a counter (no doc-list materialization), so viral
    * grams ("click here to subscribe") cost one long, not one list;
    * map-side partial counts absorb within-partition repeats. The
    * gram string itself is the shuffle key to keep the operator
    * exact and oracle-replayable; at 100 TB substitute
    * `xxhash64(gram)` for the key (64-bit, collision-safe at any
    * realistic gram cardinality) — same plan shape, smaller shuffle.
    *
    * Output: (idCol, total_ngrams, dup_ngrams, dup_ratio); documents
    * below the shingle width carry 0 totals and a NULL ratio. */
  def dupSpanCoverage(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val sh = shingleSets(df, idCol, textCol, shingleN)
    val grams = sh.select(col("doc"), explode(col("sh")).as("gram"))
    // shingle sets are per-doc distinct, so count(*) = document count
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("docs"))
      .filter(col("docs") >= minDocs).select("gram")
    val dupPerDoc = grams.join(dup, Seq("gram"), "left_semi")
      .groupBy("doc").agg(count(lit(1)).as("dup_ngrams"))
    val dups = coalesce(col("dup_ngrams"), lit(0L))
    sh.select(col("doc"), size(col("sh")).cast("long").as("total_ngrams"))
      .join(dupPerDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("total_ngrams"),
        dups.as("dup_ngrams"),
        when(col("total_ngrams") > 0L,
          dups.cast("double") / col("total_ngrams").cast("double"))
          .as("dup_ratio"))
  }

  /** X2: CONTENT-DEFINED CHUNKING — shift-robust chunk fingerprints
    * (the CDC idea from dedup storage and the winnowing/MOSS
    * fingerprint literature, public prior art): the token stream
    * splits AFTER every token whose portable hash ≡ 0 (mod m), so
    * chunk boundaries are decided by CONTENT, not position. Inserting
    * a preamble or editing a paragraph moves no boundary outside the
    * touched chunk — exactly the robustness fixed windows (q143's
    * n-gram spans, [[Curation.dropBoilerplate]]'s fixed chunks) cannot
    * give, and the reason storage dedup uses CDC. Expected chunk
    * length ≈ m tokens; every boundary decision is the q74 portable
    * hash, so an external engine replays the chunking bit-for-bit.
    *
    * Scale: one explode → a per-doc running sum of boundary flags
    * (doc-partitioned window, uniform keys, no corpus-wide sort) →
    * one (doc, chunk) hash-aggregate. The digests then aggregate or
    * join BY DIGEST for corpus-wide duplicate-chunk analysis — linear
    * at any corpus size, never pairwise.
    *
    * Returns one row per chunk: (idCol, chunk_idx, n_tokens, digest),
    * digest = md5 of the space-joined chunk text. */
  def cdcChunkDigests(df: DataFrame, idCol: String, textCol: String,
                      m: Int = 16): DataFrame =
    cdcChunks(df, idCol, textCol, m)
      .select(col(idCol), col("chunk_idx"), col("n_tokens"),
        col("digest"))

  /** CDC chunk RELATION — one row per chunk carrying the chunk's TEXT
    * alongside its digest: (idCol, chunk_idx, n_tokens, chunk_text,
    * digest). The shared stage behind [[cdcChunkDigests]] (digest-only
    * view) and [[removeDupChunks]] (needs the text back to reassemble
    * cleaned documents). Same plan: one explode → per-doc running sum
    * of boundary flags → one (doc, chunk) hash-aggregate. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                m: Int = 16): DataFrame = {
    require(m >= 2, s"mean chunk length m must be >= 2, got $m")
    val toks = graft.scaleOut(df, col(idCol))
      .select(col(idCol),
        posexplode_outer(Text.tokens(col(textCol)))
          .as(Seq("pos", "tok")))
      .filter(col("tok").isNotNull)
    // chunk id of a token = boundary tokens strictly BEFORE it (the
    // boundary token closes its own chunk); per-doc window state is
    // one running sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    toks
      .withColumn("_b",
        when(pmod(Native.md5Prefix32(concat(col("tok"), lit("|cdc"))),
          lit(m.toLong)) === 0L, 1L).otherwise(0L))
      .withColumn("chunk_idx",
        coalesce(sum(col("_b")).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("chunk_text"))
      .withColumn("digest", md5(col("chunk_text")))
  }

  /** X2 applied: duplicated-span REMOVAL (the ExactSubstr behavior of
    * Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better", and the public deduplicate-text-datasets tool):
    * emit CLEANED text with cross-document duplicated spans cut out,
    * not just measured. Span = content-defined chunk ([[cdcChunks]],
    * boundaries after tokens whose portable hash ≡ 0 mod m, expected
    * length ≈ m tokens — shift-robust, so a quoted paragraph matches
    * no matter where it lands in the host document). A chunk is cut
    * when its digest occurs more than `maxOccurrences` times
    * corpus-wide (every copy is cut — the conservative suffix-array
    * tool behavior). `keepOne = true` switches to the keep-one-copy
    * variant real corpus builds often prefer: the corpus-wide FIRST
    * occurrence (min (doc, chunk_idx) — deterministic,
    * arrival-order-free) of an over-limit digest survives, every other
    * copy is cut — computed as a per-digest min-struct aggregate
    * (linear, map-side partial, one value per digest), NOT a window
    * over occurrences, so a viral digest still costs one counter, not
    * a buffered partition. Survivor chunks reassemble
    * in chunk order; the output text is therefore the NORMALIZED token
    * stream (lowercased, single-spaced) — inherent to token-level
    * chunking and what makes the operator engine-replayable.
    *
    * Scale: the chunk relation feeds two legs (the digest-count
    * aggregation and the keep/cut flagging join), so it is
    * materialized ONCE via [[graft.CacheScope]] — both legs share the
    * tokenize+window stage instead of paying it twice. Both legs are
    * linear, keyed on digest with map-side partial counts, so a viral
    * chunk ("click here to subscribe" × 10⁸) costs one counter, never
    * a buffered partition (the reason this is a groupBy + join back,
    * NOT a count-over-digest-window, which would buffer every
    * occurrence of the hottest digest in one task). At 100 TB,
    * materialize [[cdcChunks]] as its own table and feed both legs
    * from it — the chunk relation is the artifact a corpus build
    * keeps anyway; the in-session persist here is the same shape.
    *
    * Returns one row per input document: (idCol, clean_text,
    * kept_chunks, cut_chunks, kept_tokens); a fully-duplicated
    * document survives with empty clean_text (caller filters). */
  def removeDupChunks(df: DataFrame, idCol: String, textCol: String,
                      m: Int = 16, maxOccurrences: Long = 1,
                      keepOne: Boolean = false): DataFrame = {
    require(maxOccurrences >= 1,
      s"maxOccurrences must be >= 1, got $maxOccurrences")
    // one materialized chunk relation shared by the count and flag legs
    // (released at the caller's operation boundary)
    val chunks = graft.CacheScope.persist(cdcChunks(df, idCol, textCol, m))
    val occ = chunks.groupBy("digest")
      .agg(count(lit(1)).as("_occ"),
        min(struct(col(idCol), col("chunk_idx"))).as("_first"))
    val over = col("_occ") > lit(maxOccurrences)
    val cut =
      if (keepOne) over &&
        !(struct(col(idCol), col("chunk_idx")) === col("_first"))
      else over
    // inner join keeps every chunk row (occ covers all digests)
    reassembleKept(df,
      chunks.join(occ, Seq("digest")).withColumn("_cut", cut),
      idCol)
  }

  /** X2/X11 STREAMING face of `removeDupChunks(keepOne = true)`: clean
    * ONE arriving batch against the chunk digests of already-admitted
    * text, keeping the batch-internal first copy of any new span.
    * A batch chunk is cut when (a) its digest is already present in
    * `corpusDigests` — the span exists in committed text, every new
    * copy is a duplicate — or (b) another batch chunk with the same
    * digest precedes it (min (id, chunk_idx), the same deterministic
    * first-copy rule the static operator uses).
    *
    * EQUIVALENCE CONTRACT (what makes the streaming build replayable):
    * when waves arrive in id order and `corpusDigests` is exactly the
    * kept-chunk digests of all previously admitted waves, the union of
    * the waves' outputs EQUALS the static
    * `removeDupChunks(keepOne = true)` over the full corpus — the
    * global first copy of a digest lives in the earliest wave that
    * carries it, which is precisely the copy this admission keeps
    * (DedupSpec pins the two-wave equivalence). Re-chunking committed
    * clean text reproduces its kept chunks (cutting a chunk moves no
    * other boundary — boundaries are per-token content decisions), so
    * the digest ledger can be maintained EITHER by re-chunking the
    * table or — the 100 TB shape, the q218 columnar-signature move —
    * by storing this function's `chunk_digests` column at admission
    * and exploding the pruned column per wave, never re-tokenizing
    * the corpus.
    *
    * Returns one row per batch document: (idCol, clean_text,
    * kept_chunks, cut_chunks, kept_tokens, chunk_digests — the kept
    * digests in chunk order, the ledger column). */
  def removeDupChunksVsCorpus(batch: DataFrame, idCol: String,
                              textCol: String, m: Int,
                              corpusDigests: DataFrame,
                              preChunked: Option[DataFrame] = None)
      : DataFrame = {
    // one materialized chunk relation shared by the first-copy
    // aggregate and the flag join (caller releases at the wave
    // boundary — the foreachBatch releaseAll, as in the q218 shape).
    // A caller that already chunked the batch (e.g. to derive ledger
    // probe buckets) passes the cached relation in via `preChunked`
    // so the wave is chunked exactly once. CONTRACT: `preChunked`
    // MUST be cdcChunks(batch, idCol, textCol, m) with the SAME m —
    // chunks cut under a different modulus carry different digests
    // than the ledger's, so admission decisions would silently
    // diverge; the schema check below catches shape drift but cannot
    // detect a wrong modulus (same columns), hence the contract.
    preChunked.foreach { c =>
      val want = Set(idCol, "chunk_idx", "n_tokens", "chunk_text",
        "digest")
      require(want.subsetOf(c.columns.toSet),
        s"preChunked must be cdcChunks($idCol, $textCol, m=$m) " +
          s"output — missing ${(want -- c.columns.toSet).mkString(",")}")
    }
    val chunks = preChunked.getOrElse(graft.CacheScope.persist(
      cdcChunks(batch, idCol, textCol, m)))
    val first = chunks.groupBy("digest")
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("_first"))
    val seen = corpusDigests.select(col("digest")).distinct()
      .withColumn("_seen", lit(true))
    val cut = coalesce(col("_seen"), lit(false)) ||
      !(struct(col(idCol), col("chunk_idx")) === col("_first"))
    val flagged = chunks.join(first, Seq("digest"))
      .join(seen, Seq("digest"), "left")
      .withColumn("_cut", cut)
    val keep = !col("_cut")
    val perDoc = flagged.groupBy(col(idCol)).agg(
      array_join(transform(
        array_sort(collect_list(when(keep,
          struct(col("chunk_idx"), col("chunk_text"))))),
        s => s.getField("chunk_text")), " ").as("clean_text"),
      sum(when(keep, 1L).otherwise(0L)).as("kept_chunks"),
      sum(when(col("_cut"), 1L).otherwise(0L)).as("cut_chunks"),
      sum(when(keep, col("n_tokens")).otherwise(0L)).as("kept_tokens"),
      transform(array_sort(collect_list(when(keep,
        struct(col("chunk_idx"), col("digest"))))),
        s => s.getField("digest")).as("chunk_digests"))
    batch.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("cut_chunks"), lit(0L)).as("cut_chunks"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("chunk_digests"),
          typedLit(Array.empty[String])).as("chunk_digests"))
  }

  /** Reassemble the kept chunks of a flagged chunk relation
    * ((idCol, chunk_idx, n_tokens, chunk_text, _cut)) into cleaned
    * documents — the shared tail of [[removeDupChunks]] and
    * [[graft.operators.Curation.removeBenchSpans]]: collect_list skips
    * the nulls the `when` leaves on cut chunks, so ONE per-doc
    * aggregate yields text + kept/cut counts together; null-text docs
    * have zero chunks and come back empty, keeping the output
    * row-aligned with the input corpus. */
  private[operators] def reassembleKept(df: DataFrame, flagged: DataFrame,
                                        idCol: String): DataFrame = {
    val cut = col("_cut")
    val perDoc = flagged
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(!cut,
            struct(col("chunk_idx"), col("chunk_text"))))),
          s => s.getField("chunk_text")), " ").as("clean_text"),
        sum(when(!cut, 1L).otherwise(0L)).as("kept_chunks"),
        sum(when(cut, 1L).otherwise(0L)).as("cut_chunks"),
        sum(when(!cut, col("n_tokens")).otherwise(0L))
          .as("kept_tokens"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("cut_chunks"), lit(0L)).as("cut_chunks"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  /** X1 incremental: dedup a NEW batch against an already-ingested
    * corpus — the continual-ingestion shape (nightly crawl vs the
    * existing 100 TB corpus). Survivors are batch rows that are (a)
    * first of their digest within the batch and (b) not present in the
    * corpus. Cost: one digest agg over the (small) batch + one anti
    * join against the corpus digest stream — the corpus is never
    * re-deduped, only scanned for digests (at scale, keep the digest
    * set as its own bucketed table and this becomes a co-located
    * join). */
  def incrementalNew(batch: DataFrame, corpus: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val firstIds = batch.groupBy(md5(col(textCol)).as("_d"))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val seen = corpus.select(md5(col(textCol)).as("_d")).distinct()
    batch.join(firstIds, Seq(idCol), "left_semi")
      .withColumn("_d", md5(col(textCol)))
      .join(seen, Seq("_d"), "left_anti")
      .drop("_d")
  }

  /** X11 near-dup form: admit a NEW batch against an already-curated
    * corpus by NEAR-duplicate distance, not just digest equality — the
    * continual-ingestion shape for FUZZY dedup (nightly crawl vs the
    * existing corpus; [[incrementalNew]] is the exact sibling). A
    * batch row is admitted iff no corpus doc and no SMALLER-id batch
    * doc lies within `threshold` Jaccard of its shingleN-gram shingle
    * set — the non-recursive min-id-survivor rule: deterministic,
    * arrival-order-free, engine-replayable (a chain b~a~corpus drops
    * both a and b — the conservative choice, and the one a plain SQL
    * oracle can express without recursion). Exact and COMPLETE at the
    * threshold: size bucketing bounds candidate generation (j ≥ t
    * forces the log2-size gap ≤ log2(1/t), the blockedJaccardPairs
    * bound) and every candidate is verified with exact Jaccard. Docs
    * below the shingle width carry no shingle evidence and are always
    * admitted — run the digest-exact [[incrementalNew]] first.
    *
    * Scale: candidate cost ∝ batch × (corpus rows sharing a block and
    * size bucket) — `blockCols` (e.g. lang, source) bound the cells;
    * the batch's shingle frame persists (it feeds probe, lower-id
    * blocker and admission legs), the corpus side streams. This exact
    * variant is the oracle twin: at 100 TB swap candidate generation
    * for banded MinHash keys against a persisted corpus signature
    * table (the recall-for-cost trade q43 documents) — same verify,
    * same admission rule — so the fence refuses degenerate batches.
    * Returns the admitted batch rows, all columns intact.
    *
    * CONCURRENCY CONTRACT: admission is read-committed against the
    * corpus snapshot the caller passes — the manifest CAS serializes
    * the COMMITS, but nothing re-validates the admission predicate at
    * commit time, so two writers admitting concurrently into the same
    * table (each reading the pre-both snapshot) can each admit docs
    * that are mutual near-dups (DedupSpec pins this). Deploy ONE
    * admitting writer per curated table — the q208 AvailableNow drain
    * serializes micro-batches by construction — and scale ingest by
    * sharding batches WITHIN that writer (blockCols bound the work),
    * not by adding writers; OR use [[admitNearDupAndCommit]], which
    * composes this operator with a conditional commit and re-runs
    * admission against the new snapshot on every lost race, making
    * concurrent admitters converge to the single-writer result. */
  def incrementalNewNearDup(batch: DataFrame, corpus: DataFrame,
                            idCol: String, textCol: String,
                            blockCols: Seq[String] = Nil,
                            shingleN: Int = 3, threshold: Double = 0.5,
                            maxRows: Int = 1000000): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val nbr = (math.log(1.0 / threshold) / math.log(2.0)).toInt + 1
    graft.fenceQuadratic(batch.select(idCol), maxRows,
      s"incrementalNewNearDup on coarse blocks (${blockCols.mkString(",")})",
      "use banded MinHash candidates vs a corpus signature table")
    def side(df: DataFrame): DataFrame =
      graft.scaleOut(df, blockCols.map(col): _*)
        .select((blockCols.map(col) :+ col(idCol).as("_id") :+
          Native.shingleSet(col(textCol), shingleN).as("_sh")): _*)
        // shingleSet returns an EMPTY array (never null) below the
        // shingle width — filter on size so short docs skip candidate
        // generation entirely and flow straight to admission (the
        // documented "no shingle evidence → admitted" contract)
        .filter(size(col("_sh")) > 0)
        .withColumn("_szb",
          length(bin(greatest(size(col("_sh")), lit(1)).cast("long"))))
    // BOTH shingle frames persist: each feeds two legs (the exploded
    // candidate side and the verify fetch; the batch side also feeds
    // the admission anti-join) — without the cache the corpus
    // tokenizes twice per call. The frames outlive this call (the
    // returned admission plan reads them), so they register with
    // [[graft.CacheScope]]; per-micro-batch callers (the q208
    // streaming shape) release at each batch commit. The 100 TB path
    // keeps corpus signatures as their own table anyway.
    val bsh = graft.CacheScope.persist(side(batch))
    val blockers = graft.CacheScope.persist(side(corpus))
      .withColumn("_c", lit(true))
      .unionByName(bsh.withColumn("_c", lit(false)))
    // probe carries its shingle array once; the size-bucket-exploded
    // blocker side ships scalars only (id, origin, size) — the
    // blockedJaccardPairs payload discipline — and arrays are fetched
    // back for the few candidates surviving the size-ratio prune
    val probe = bsh.select((blockCols.map(col) :+ col("_szb") :+
      col("_id") :+ col("_sh") :+ size(col("_sh")).as("_n")): _*)
    val exploded = blockers.select((blockCols.map(col) :+
      explode(sequence(col("_szb") - nbr, col("_szb") + nbr))
        .as("_szb") :+
      col("_id").as("_pid") :+ col("_c") :+
      size(col("_sh")).as("_pn")): _*)
    val cand = probe.join(exploded, blockCols :+ "_szb")
      .filter(col("_c") || col("_pid") < col("_id"))
      .filter(least(col("_n"), col("_pn")).cast("double")
        / greatest(col("_n"), col("_pn")).cast("double") >= threshold)
    val blockedIds = cand
      .join(blockers.select(col("_id").as("_pid"), col("_c"),
        col("_sh").as("_psh")), Seq("_pid", "_c"))
      .filter(jaccard(col("_sh"), col("_psh")) >= threshold)
      .select(col("_id").as(idCol)).distinct()
    batch.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** X11 SCALE PATH: the banded-MinHash incremental admission that
    * [[incrementalNewNearDup]]'s Scaladoc names as its 100 TB swap —
    * now real and measured (SCALING.md) instead of documented. Same
    * admission rule (a batch row is admitted iff no corpus doc and no
    * smaller-id batch doc verifies ≥ `threshold` exact Jaccard; docs
    * below the shingle width carry no evidence and are admitted), but
    * candidate generation comes from LSH band-key equality against a
    * signature table instead of size-bucket enumeration: candidates =
    * batch band keys ⋈ corpus signatures ∪ batch self-join, then exact
    * Jaccard verify over shingle sets fetched for candidates only.
    *
    * Pass `corpusSigs` = the persisted [[bandSignatureTable]] relation
    * (same blockCols/shingleN/numHashes/bands) to skip re-signing the
    * corpus — the production shape: signatures live as their own
    * bucketed table, appended per admitted batch, and the corpus is
    * touched only to fetch candidate texts (id-keyed, broadcast-prunable
    * — candidate sets are tiny next to the corpus). No quadratic stage
    * and no fence: band keys are the shuffle key (uniform unless the
    * corpus is pathologically single-valued, where any LSH degrades to
    * its true duplicate structure).
    *
    * The recall trade vs the exact sibling: banding can MISS marginal
    * pairs (pair-candidate probability 1-(1-s^r)^b), so the banded
    * admission is a SUPERSET of the exact admission — it never falsely
    * blocks (every block is exact-verified) but may admit a doc the
    * exact rule blocks. q217 gates that containment plus equality on
    * the planted corpus; DedupSpec pins both directions. */
  def incrementalNewNearDupBanded(batch: DataFrame, corpus: DataFrame,
                                  idCol: String, textCol: String,
                                  blockCols: Seq[String] = Nil,
                                  shingleN: Int = 3,
                                  threshold: Double = 0.5,
                                  numHashes: Int = 64, bands: Int = 16,
                                  corpusSigs: Option[DataFrame] = None)
      : DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    // batch signatures feed the corpus-candidate join and both sides
    // of the self-join; registered with CacheScope (the returned
    // admission plan reads them — callers release at the operation
    // boundary, per-micro-batch in the streaming shape)
    val bsig = graft.CacheScope.persist(bandSignatureTable(batch,
      idCol, textCol, blockCols, shingleN, numHashes, bands))
    val csig = corpusSigs.getOrElse(bandSignatureTable(corpus,
      idCol, textCol, blockCols, shingleN, numHashes, bands))
    val keys = blockCols ++ Seq("band", "bkey")
    def probe(sig: DataFrame) = sig.withColumnRenamed("doc", "_id")
    def blocker(sig: DataFrame) = sig.withColumnRenamed("doc", "_pid")
    // origin tag rides the candidate so the text fetch can't cross
    // id spaces (batch and corpus ids may collide numerically)
    val cand = probe(bsig).join(blocker(csig), keys)
      .select(col("_id"), col("_pid")).withColumn("_c", lit(true))
      .unionByName(probe(bsig).join(blocker(bsig), keys)
        .filter(col("_pid") < col("_id"))
        .select(col("_id"), col("_pid")).withColumn("_c", lit(false)))
      .distinct()
    val bsh = graft.CacheScope.persist(
      shingleSets(batch, idCol, textCol, shingleN))
    // candidate texts fetched BY ID, shingled post-join — the corpus
    // is never shingled corpus-wide on this path
    val blockerTexts = corpus
      .select(col(idCol).as("_pid"), col(textCol).as("_ptxt"))
      .withColumn("_c", lit(true))
      .unionByName(batch
        .select(col(idCol).as("_pid"), col(textCol).as("_ptxt"))
        .withColumn("_c", lit(false)))
    val blockedIds = cand
      .join(bsh.select(col("doc").as("_id"), col("sh").as("_sh")),
        Seq("_id"))
      .join(blockerTexts, Seq("_pid", "_c"))
      .withColumn("_psh", Native.shingleSet(col("_ptxt"), shingleN))
      .filter(size(col("_sh")) > 0 && size(col("_psh")) > 0)
      // the cheap size-ratio prune before the expensive intersect
      .filter(least(size(col("_sh")), size(col("_psh"))).cast("double")
        / greatest(size(col("_sh")), size(col("_psh"))).cast("double")
        >= threshold)
      .filter(jaccard(col("_sh"), col("_psh")) >= threshold)
      .select(col("_id").as(idCol)).distinct()
    batch.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** X11 concurrent-safe composition: admit a batch against a
    * manifest-backed curated table and COMMIT the survivors, with the
    * admission predicate RE-VALIDATED on every lost commit race — the
    * upgrade from the documented single-writer contract (the r13/r14
    * pin at [[incrementalNewNearDup]]: the manifest CAS serializes
    * commits but nothing re-checks admission, so two concurrent
    * admitters can each admit mutual near-dups).
    *
    * Loop: read head → admit against that snapshot
    * ([[incrementalNewNearDup]]) → conditional commit
    * ([[graft.sources.Manifest.commitAppendIf]], which claims
    * head+1 or throws WITHOUT retrying). A loser re-reads the NEW
    * snapshot — which now contains the winner's rows — and re-runs
    * admission, so its mutual near-dups are excluded exactly as in a
    * serial schedule; racing admitters therefore CONVERGE to the
    * single-writer result (DedupSpec pins it with an injected race).
    * An empty admitted set commits nothing (adding nothing is
    * snapshot-stale-safe) and returns the head it validated against.
    *
    * Scale: each attempt costs one admission pass (batch-sized work
    * against the corpus digest/shingle stream) plus one batch-sized
    * file write; contention is per-TABLE commit contention, the same
    * as every other manifest writer, with attempts bounded — this
    * makes concurrent admitters SAFE, not free, so the q208
    * single-drain deployment remains the throughput shape and this is
    * the correctness net under it. */
  def admitNearDupAndCommit(spark: org.apache.spark.sql.SparkSession,
                            root: String, batch: DataFrame,
                            idCol: String, textCol: String,
                            blockCols: Seq[String] = Nil,
                            shingleN: Int = 3, threshold: Double = 0.5,
                            maxAttempts: Int = 5): Long = {
    import graft.sources.Manifest
    var n = 0
    var last: Throwable = null
    while (n < maxAttempts) {
      val head = Manifest.latestVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"$root not initialized"))
      // materialize the admission ONCE per attempt: both consumers —
      // the emptiness probe and the commit's file write — read the
      // cached frame, instead of running the batch-vs-corpus
      // shingle/digest plan twice per successful commit. The frame is
      // batch-bounded; it is released in-loop because its consumers
      // complete inside the attempt (the MaterializedAgg idiom, not
      // CacheScope — nothing outlives the call).
      val admitted = incrementalNewNearDup(batch,
        Manifest.read(spark, root), idCol, textCol, blockCols,
        shingleN, threshold).persist()
      try {
        // count() fills the cache fully (an isEmpty probe would cache
        // only the partitions it touched); it is the same batch-bounded
        // job the probe already paid
        return if (admitted.count() == 0L) head
        else Manifest.commitAppendIf(spark, root, head, admitted)
      } catch {
        case e: IllegalStateException
            if Option(e.getMessage).exists(_.contains("commit conflict")) =>
          last = e; n += 1 // re-validate against the new snapshot
      } finally admitted.unpersist(false)
    }
    throw last
  }

  /** X1 pair form: exact-dup STAR pairs (group min id → every other
    * member) per content digest — linear in corpus size where emitting
    * the full within-group clique would be quadratic in group size,
    * and a star preserves exactly the clique's connectivity for
    * [[clusterPairs]]. */
  def exactDupStarPairs(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol)))
    df.select(min(col(idCol)).over(w).as("id_a"), col(idCol).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
  }

  /** X2 completion: collapse near-dup PAIRS into clusters (connected
    * components) by smallest-id label propagation, so "keep one doc per
    * near-dup cluster" is answerable — pairs alone under-merge when
    * A~B and B~C but A≁C. Hybrid schedule: the first `plainRounds`
    * iterations are one neighbor-min join each (diameter ≤ 4 — every
    * realistic near-dup cluster — converges at minimum cost), then a
    * pointer-doubling hop (label-of-label) joins each round so the
    * remaining reach DOUBLES per round and pathological chains finish
    * in O(log diameter) total. Per-round label frames are checkpointed
    * to truncate lineage: `localCheckpoint()` by default (fast,
    * executor-local blocks — fine single-node / short jobs), or
    * reliable `checkpoint()` to `checkpointDir` when given (survives
    * executor loss — what a 1000-executor fixpoint needs; the dir
    * should be cluster-visible, e.g. HDFS/S3A).
    * Throws IllegalStateException if the fixpoint
    * is not reached within maxIter — a silent partial result would KEEP
    * duplicates downstream ("one doc per cluster" over under-merged
    * labels). Returns (node, cluster) — cluster = min id in the
    * component. Only nodes appearing in a pair are returned (singletons
    * are their own cluster by definition). */
  def clusterPairs(pairs: DataFrame, aCol: String, bCol: String,
                   maxIter: Int = 16, plainRounds: Int = 4,
                   checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(
      pairs.sparkSession.sparkContext.setCheckpointDir)
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val edges = snap(pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .union(pairs.select(col(bCol).as("x"), col(aCol).as("y")))
      .distinct())
    var labels = snap(edges.select(col("x").as("node")).distinct()
      .withColumn("cluster", col("node")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("node").as("y"),
          col("cluster").as("ycluster")), Seq("y"))
        .groupBy(col("x").as("node"))
        .agg(min("ycluster").as("nbr"))
      val hooked = labels.join(nbrMin, Seq("node"), "left_outer")
        .select(col("node"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster")))
            .as("cluster"))
      // Pointer doubling (rounds ≥ plainRounds only): jump each node's
      // label to its LABEL's label. min-labels only ever shrink, so the
      // hop is always sound, and it halves the remaining pointer-chain
      // depth every round it runs.
      val updated = snap(if (i < plainRounds) hooked
        else hooked
          .join(hooked.select(col("node").as("cluster"),
            col("cluster").as("cc")), Seq("cluster"), "left_outer")
          .select(col("node"),
            least(col("cluster"), coalesce(col("cc"), col("cluster")))
              .as("cluster")))
      converged = updated
        .join(labels.withColumnRenamed("cluster", "old"), Seq("node"))
        .filter(col("cluster") =!= col("old"))
        .limit(1).count() == 0
      labels = updated
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"clusterPairs did not converge in $maxIter rounds — component " +
          "diameter exceeds 2^maxIter under doubling; raise maxIter " +
          "rather than accept under-merged (duplicate-keeping) clusters")
    labels
  }

  /** X2 deliverable: ONE survivor per near-dup cluster, chosen by
    * quality (`qualityCol` desc, id asc tie-break); docs in no pair are
    * their own cluster and pass through untouched. This is the actual
    * "dedup the corpus" output — [[clusterPairs]] labels made
    * actionable.
    *
    * Scale: the label frame is bounded by the paired docs (not the
    * corpus); one left join attaches labels, the top-1 window runs ONLY
    * over clustered docs partitioned by cluster id, and the untouched
    * majority streams through a filter. */
  def keepBestPerCluster(df: DataFrame, idCol: String, pairs: DataFrame,
                         aCol: String, bCol: String, qualityCol: String,
                         checkpointDir: Option[String] = None): DataFrame = {
    val labels = clusterPairs(pairs, aCol, bCol,
        checkpointDir = checkpointDir)
      .withColumnRenamed("node", idCol)
    val labeled = df.join(labels, Seq(idCol), "left_outer")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster")
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    val winners = labeled.filter(col("cluster").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "cluster")
    labeled.filter(col("cluster").isNull).drop("cluster")
      .unionByName(winners)
  }

  /** SimHash: 64-bit signature — bit j of each token's hash votes ±1;
    * the sign of the tally sets bit j of the fingerprint. Near-dups have
    * small Hamming distance. Computed by the NATIVE one-pass expression
    * (functions.SimHash64, custom Catalyst Expression with codegen) —
    * zero shuffle, no explode; see minhashSignatures for the history of
    * the slower declarative formulations. */
  def simhashSignatures(df: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    graft.scaleOut(df)
      .select(col(idCol).as("doc"), Native.simhash64(col(textCol)).as("sig"))

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

  /** Embedding near-dup: OR-amplified LSH — `nTables` independent
    * hyperplane tables of `nPlanes` bits each; a pair becomes a
    * candidate if ANY table buckets it together (recall per pair with
    * same-bucket prob p: 1-(1-pᵏ)ᴸ, vs the single-table pᵏ that made
    * the one-table variant miss most mid-similarity pairs). Candidates
    * are deduplicated as bare id pairs BEFORE vectors are fetched, so
    * the cross-table fan-out never ships or re-scores arrays; exact
    * cosine ≥ threshold verifies survivors only. The (table, bucket)
    * join key stays uniform — never all-pairs. */
  def nearDupPairsEmbedding(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, nPlanes: Int = 6,
                            nTables: Int = 8): DataFrame = {
    val withV = graft.scaleOut(df, col(idCol))
      .select(col(idCol).as("doc"),
        Vectors.toDouble(col(vecCol)).as("v"))
    val keyed = withV.select(col("doc"),
      posexplode(Native.hyperplaneBuckets(col("v"), nPlanes, nTables)))
      .toDF("doc", "tab", "bucket")
    val a = keyed.select(col("tab"), col("bucket"), col("doc").as("id_a"))
    val b = keyed.select(col("tab"), col("bucket"), col("doc").as("id_b"))
    val cand = a.join(b, Seq("tab", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(withV.select(col("doc").as("id_a"), col("v").as("v_a")),
        Seq("id_a"))
      .join(withV.select(col("doc").as("id_b"), col("v").as("v_b")),
        Seq("id_b"))
      .withColumn("cosine", Vectors.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
