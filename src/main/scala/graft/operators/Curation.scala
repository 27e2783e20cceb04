package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** End-to-end training-corpus curation (SURVEY.md §2.11, composed):
  * exact dedup → text annotation (token stats, language-ID, quality
  * bucket) → gate filters. The canonical cleaning pass an LLM data
  * pipeline runs before tokenization.
  *
  * Every stage is a pure relational transform: one digest shuffle for
  * the dedup, then map-only annotation + filters that all ride the same
  * scan — at 100 TB the pipeline is one shuffle plus one pass, and the
  * filters push into the scan where the source format allows.
  */
object Curation {

  /** Gate thresholds; defaults follow the quality heuristics in
    * `Text.qualityBucket`. */
  final case class Config(
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      keepQuality: Seq[String] = Seq("ok", "high"),
      dropUnknownLang: Boolean = true)

  /** Map-only annotation: token counts, uniq ratio, language, quality. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", Text.tokenCount(t))
      .withColumn("uniq_ratio",
        Text.distinctTokenCount(t).cast("double") /
          Text.tokenCount(t).cast("double"))
      .withColumn("lang_id", Text.langId(t))
      .withColumn("quality",
        Text.qualityBucket(col("n_tokens"), col("uniq_ratio")))
  }

  /** The gate predicate alone (useful for auditing what was dropped). */
  def gate(cfg: Config): Column = {
    val base = col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
      col("quality").isin(cfg.keepQuality: _*)
    if (cfg.dropUnknownLang) base && col("lang_id") =!= "und" else base
  }

  /** Full pass: dedup exactly, annotate, keep gated rows. */
  def clean(df: DataFrame, idCol: String, textCol: String,
            cfg: Config = Config()): DataFrame =
    annotate(Dedup.dropExactDups(df, idCol, textCol), textCol)
      .filter(gate(cfg))

  /** Benchmark-contamination check: training docs sharing at least one
    * word n-gram with an eval/benchmark set — the train/test overlap
    * scan every LLM data pipeline must run before training. Returns
    * (train id, #shared n-grams, #eval docs hit).
    *
    * Scale: both sides reduce to (n-gram, id) streams; the join key is
    * the n-gram — uniform, skew-free (stop-phrase n-grams at n ≥ 8 are
    * rare), and candidate work is proportional to actual overlap, never
    * all-pairs. Docs shorter than n tokens cannot be contaminated at
    * this n and drop out via the null shingle set. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    def grams(df: DataFrame, as: String) =
      graft.scaleOut(df)
        .select(col(idCol).as(as),
          explode_outer(graft.functions.Native.shingleSet(col(textCol), n))
            .as("g"))
        .filter(col("g").isNotNull)
    grams(train, "train_id")
      .join(grams(bench, "bench_id"), Seq("g"))
      .groupBy("train_id")
      .agg(countDistinct(col("g")).as("shared_ngrams"),
        countDistinct(col("bench_id")).as("bench_docs_hit"))
  }

  /** Per-document repetition statistics in the style of the published
    * Gopher/MassiveText filtering rules (word-count bounds, mean word
    * length, most-frequent-word fraction, type-token ratio) — the
    * repetition axis [[annotate]]'s map-only pass cannot see because
    * top-word fraction needs a per-(doc, token) count.
    *
    * Shape: explode → two hash aggregates on uniform keys ((id, token)
    * then id), both with map-side partial aggregation — linear at
    * 100 TB, no windows, no skew (the key includes the doc id). Every
    * emitted ratio is an exact integer division, so other engines
    * compute bit-identical doubles (DuckDB-oracle-safe unrounded). */
  def repetitionStats(df: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    graft.scaleOut(df, col(idCol))
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"),
        sum(length(col("tok")).cast("long")).as("chars"))
      .groupBy(col(idCol))
      .agg(sum("c").as("words"),
        count(lit(1)).as("distinct_words"),
        max("c").as("top_word_count"),
        sum("chars").as("word_chars"))
      .select(col(idCol), col("words"),
        (col("word_chars").cast("double") / col("words").cast("double"))
          .as("mean_word_len"),
        (col("top_word_count").cast("double") / col("words").cast("double"))
          .as("top_word_frac"),
        (col("distinct_words").cast("double") / col("words").cast("double"))
          .as("distinct_frac"))

  /** Gopher-rule thresholds (defaults follow the published ranges). */
  final case class GopherConfig(
      minWords: Long = 50,
      maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopWordFrac: Double = 0.2,
      minDistinctFrac: Double = 0.3)

  /** The Gopher-style keep predicate over [[repetitionStats]] output. */
  def gopherGate(cfg: GopherConfig = GopherConfig()): Column =
    col("words").between(cfg.minWords, cfg.maxWords) &&
      col("mean_word_len").between(cfg.minMeanWordLen, cfg.maxMeanWordLen) &&
      col("top_word_frac") <= cfg.maxTopWordFrac &&
      col("distinct_frac") >= cfg.minDistinctFrac

  /** Per-document REPETITION signals — the other half of the published
    * Gopher/MassiveText repetition-removal rules that
    * [[repetitionStats]]'s word-level pass cannot see: duplicate-LINE
    * fractions and repeated-N-GRAM character coverage. These are the
    * filters that catch boilerplate pages (navigation chrome repeated
    * per line) and degenerate generations (the same phrase looping),
    * and every production web-scale corpus build runs them.
    *
    * Emitted per doc:
    *  - `lines` — line count (split on `lineDelim`, literal);
    *  - `dup_line_frac` — fraction of lines that are repeats of an
    *    earlier-seen line (occurrences beyond the first, over lines);
    *  - `dup_line_char_frac` — characters inside those repeated
    *    occurrences, over total line characters (delimiters excluded);
    *  - `top_gram_char_frac` — characters covered by the single
    *    heaviest `topN`-gram (count x gram length, over doc chars).
    *    Deterministic form of Gopher's "most frequent n-gram" rule:
    *    max coverage, so frequency ties cannot make the answer
    *    engine-dependent;
    *  - `dup_gram_char_frac` — characters covered by ALL `dupN`-grams
    *    occurring more than once (count x length summed; overlapping
    *    occurrences counted per occurrence — the standard linear-cost
    *    approximation, may exceed 1 on pathological docs).
    *
    * Shape, scale-first: three explode → hash-aggregate passes, every
    * shuffle key (id, line) / (id, gram) carrying the doc id — uniform,
    * skew-free, linear at 100 TB; joined back per doc (id key). All
    * ratios are exact long/long divisions → bit-identical doubles in
    * any engine (DuckDB-oracle-safe unrounded). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        lineDelim: String = "\n", topN: Int = 2,
                        dupN: Int = 5): DataFrame = {
    val id = col(idCol)
    val base = df.select(id, length(col(textCol)).as("chars"),
      col(textCol).as("_t"))
    val lineAgg = graft.scaleOut(base, id)
      .select(id, explode(split(col("_t"),
        java.util.regex.Pattern.quote(lineDelim), -1)).as("line"))
      .groupBy(id, col("line")).agg(count(lit(1)).as("c"))
      .groupBy(id).agg(
        sum("c").as("lines"),
        (sum("c") - count(lit(1))).as("dup_lines"),
        sum(col("c") * length(col("line"))).as("line_chars"),
        sum(when(col("c") > 1, (col("c") - 1) * length(col("line")))
          .otherwise(0L)).as("dup_line_chars"))
    def gramAgg(n: Int, out: Column => Column, as: String) =
      graft.scaleOut(base, id)
        .select(id, Text.tokens(col("_t")).as("_toks"))
        .select(id,
          explode(Text.shinglesOfTokens(col("_toks"), n)).as("g"))
        .groupBy(id, col("g")).agg(count(lit(1)).as("c"))
        .groupBy(id).agg(out(col("c") * length(col("g"))).as(as))
    val top = gramAgg(topN, max, "top_chars")
    val dup = gramAgg(dupN,
      cov => sum(when(col("c") > 1, cov).otherwise(0L)), "dup_chars")
    base.drop("_t")
      .join(lineAgg, Seq(idCol))
      .join(top, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .select(id, col("lines"),
        (col("dup_lines").cast("double") / col("lines").cast("double"))
          .as("dup_line_frac"),
        when(col("line_chars") === 0L, lit(0.0))
          .otherwise(col("dup_line_chars").cast("double") /
            col("line_chars").cast("double")).as("dup_line_char_frac"),
        when(col("chars") === 0L, lit(0.0))
          .otherwise(coalesce(col("top_chars"), lit(0L)).cast("double") /
            col("chars").cast("double")).as("top_gram_char_frac"),
        when(col("chars") === 0L, lit(0.0))
          .otherwise(coalesce(col("dup_chars"), lit(0L)).cast("double") /
            col("chars").cast("double")).as("dup_gram_char_frac"))
  }

  /** The Gopher repetition-removal keep predicate over
    * [[repetitionSignals]] output (published thresholds: dup-line 0.30,
    * dup-line-chars 0.20, top-2-gram 0.20, dup-5-gram 0.15). */
  def repetitionGate(maxDupLineFrac: Double = 0.30,
                     maxDupLineCharFrac: Double = 0.20,
                     maxTopGramFrac: Double = 0.20,
                     maxDupGramFrac: Double = 0.15): Column =
    col("dup_line_frac") <= maxDupLineFrac &&
      col("dup_line_char_frac") <= maxDupLineCharFrac &&
      col("top_gram_char_frac") <= maxTopGramFrac &&
      col("dup_gram_char_frac") <= maxDupGramFrac

  /** Fuzzy train/eval decontamination: MinHash band keys joined ACROSS
    * the two corpora, candidates verified with exact Jaccard ≥
    * `threshold`. Complements [[contamination]] (exact n-gram overlap):
    * this catches paraphrase-level leaks where the benchmark doc was
    * lightly edited before landing in the training crawl.
    *
    * Scale: same shape as Dedup.minhashCandidatePairs but the band-hash
    * equi-join is train × eval (never a self-join), so work is
    * proportional to true band collisions — never |train|·|eval| — and
    * the shuffle key is the uniform band hash. */
  def fuzzyContamination(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, threshold: Double,
                         shingleN: Int = 3, numHashes: Int = 64,
                         bands: Int = 16): DataFrame = {
    import graft.functions.Native
    def banded(df: DataFrame, as: String) =
      graft.scaleOut(df)
        .select(col(idCol).as(as),
          Native.minhashBands(col(textCol), shingleN, numHashes, bands)
            .as("bkeys"))
        .select(col(as), posexplode_outer(col("bkeys")))
        .toDF(as, "band", "bkey")
        .filter(col("bkey").isNotNull)
    def sh(df: DataFrame, as: String, shAs: String) =
      df.select(col(idCol).as(as),
        Native.shingleSet(col(textCol), shingleN).as(shAs))
        .filter(col(shAs).isNotNull && size(col(shAs)) > 0)
    banded(bench, "eval_id")
      .join(banded(train, "train_id"), Seq("band", "bkey"))
      .select("eval_id", "train_id").distinct()
      .join(sh(bench, "eval_id", "sh_e"), Seq("eval_id"))
      .join(sh(train, "train_id", "sh_t"), Seq("train_id"))
      // size-ratio prune: jaccard ≤ min/max, so the expensive intersect
      // runs only on pairs that could pass (see nearDupPairsMinhash)
      .filter(least(size(col("sh_e")), size(col("sh_t"))).cast("double")
        / greatest(size(col("sh_e")), size(col("sh_t"))).cast("double")
        >= threshold)
      .withColumn("jaccard", Dedup.jaccard(col("sh_e"), col("sh_t")))
      .filter(col("jaccard") >= threshold)
      .select(col("eval_id"), col("train_id"), col("jaccard"))
  }

  /** X8 applied: SPAN-LEVEL decontamination — cut only the
    * contaminated spans and keep the rest of the document, where
    * [[contamination]] → anti-join drops whole documents (the
    * conservative default; span surgery is what published corpus
    * builds apply when a host document merely QUOTES a benchmark
    * passage). Built on content-defined chunking
    * ([[graft.operators.Dedup.cdcChunks]]): both sides chunk with the
    * same portable-hash boundaries, so a quoted benchmark passage
    * chunks identically inside the host document no matter its offset
    * (shift-robust — the property fixed-width windows lack), and a
    * train chunk is cut iff its digest appears in the benchmark's
    * chunk-digest set. Granularity = the chunk (expected m tokens):
    * interior chunks of a long quote always match; the quote's two
    * boundary chunks blend host and benchmark tokens and may survive —
    * choose m small enough that residual shards are harmless (every
    * cut is exact-content-verified by construction, digests are md5 of
    * the chunk text).
    *
    * Scale: both chunk relations are linear (one explode + per-doc
    * running-sum window + one hash agg); the cut decision is a
    * digest-keyed semi-join against the (small) benchmark digest set —
    * broadcast at any corpus size; reassembly is one per-doc
    * aggregate. Returns one row per train document:
    * (idCol, clean_text, kept_chunks, cut_chunks, kept_tokens). */
  def removeBenchSpans(docs: DataFrame, bench: DataFrame, idCol: String,
                       textCol: String, m: Int = 16): DataFrame = {
    val chunks = graft.operators.Dedup.cdcChunks(docs, idCol, textCol, m)
    val benchD = graft.operators.Dedup
      .cdcChunkDigests(bench, idCol, textCol, m)
      .select(col("digest")).distinct()
    graft.operators.Dedup.reassembleKept(docs,
      chunks.join(broadcast(benchD.withColumn("_dirty", lit(true))),
          Seq("digest"), "left")
        .withColumn("_cut", coalesce(col("_dirty"), lit(false))),
      idCol)
  }

  /** Greedy contiguous sequence packing: within each `partCol` group
    * (e.g. language), docs in deterministic `orderCol` order are packed
    * into consecutive training contexts of `budget` units (tokens,
    * chars); a doc belongs to the context its starting offset falls in
    * (docs may straddle context boundaries — the standard contiguous-
    * concatenation packing, not exact bin packing). Emits the packing
    * assignment (part, bin, docs, units).
    *
    * Scale: one partitioned window cumsum — state per task is a single
    * running sum, and the partition key keeps contexts independent
    * across groups. */
  def packContiguous(df: DataFrame, partCol: String, orderCol: String,
                     unitsCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("_start", coalesce(sum(col(unitsCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("_start") / budget))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("docs"), sum(col(unitsCol)).as("units"))
  }

  /** Best-fit-decreasing sequence packing — the non-splitting sibling
    * of [[packContiguous]]: documents are never cut at context
    * boundaries; instead each doc goes whole into the open bin with
    * the LEAST remaining capacity that still fits it (ties → lowest
    * bin id), docs considered largest-first — the classic BFD bound
    * (≤ 11/9·OPT + 1), the shape published packing work approximates
    * by histogram (Krell et al. 2021, "Efficient Sequence Packing
    * without Cross-contamination" — public prior art). Docs larger
    * than `budget` open a bin of their own whose negative remainder
    * is never eligible again.
    *
    * Packing is inherently sequential, so the distributed shape bounds
    * the sequential state instead of pretending there is none: docs
    * hash into `numSegs` segments per `partCol` group (portable
    * md5-hash — map-only, engine-replayable, growth-stable), and BFD
    * runs independently inside each (part, segment) via ONE
    * `collect_list` + `aggregate` higher-order fold — native Catalyst
    * expressions end to end (no ScalaUDF, PlanSpec-checked), state =
    * the bin-remainder array. At 100 TB the caller scales `numSegs`
    * with the corpus so a segment stays executor-sized (expected
    * rows/segment = corpus / (parts·numSegs)); cross-segment waste is
    * bounded by one partially-filled bin per segment. Deterministic
    * given (salt, budget): the oracle replays every decision with a
    * recursive CTE.
    *
    * Returns one row per doc: (partCol, seg, idCol, bin, unitsCol) —
    * bin ids are 0-based and scoped to (partCol, seg). `idCol` must be
    * integral (it rides the fold state as a long). */
  def packBestFit(df: DataFrame, partCol: String, idCol: String,
                  unitsCol: String, budget: Long, numSegs: Int = 64,
                  salt: String = "pack"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(numSegs > 0, s"numSegs must be positive, got $numSegs")
    val seg = (graft.operators.Sampling.portableHash(col(idCol), salt)
      % numSegs).cast("int")
    // largest-first within the segment: struct sort is lexicographic
    // ascending, so (-units, id) orders units desc, id asc
    val sorted = graft.scaleOut(df, col(partCol))
      .select(col(partCol), seg.as("seg"),
        col(idCol).cast("long").as("_id"),
        col(unitsCol).cast("long").as("_u"))
      .groupBy(col(partCol), col("seg"))
      .agg(array_sort(collect_list(
        struct((-col("_u")).as("_nu"), col("_id"), col("_u"))))
        .as("_docs"))
    val emptyRems = array().cast("array<bigint>")
    val emptyAsg = array()
      .cast("array<struct<id:bigint,bin:int,units:bigint>>")
    val packed = sorted.select(col(partCol), col("seg"),
      aggregate(col("_docs"),
        struct(emptyRems.as("rems"), emptyAsg.as("asg")),
        (acc, d) => {
          val rems = acc.getField("rems")
          val u = d.getField("_u")
          // best fit: min remainder among bins that fit; 1-based
          // position, 0 = none fits → open a new bin
          val elig = filter(rems, r => r >= u)
          val pos = when(size(elig) > 0,
            array_position(rems, array_min(elig))).otherwise(lit(0L))
          val bin = when(pos > 0, pos - 1)
            .otherwise(size(rems).cast("long")).cast("int")
          struct(
            when(pos > 0, transform(rems, (r, i) =>
              when(i.cast("long") === pos - 1, r - u).otherwise(r)))
              .otherwise(concat(rems, array(lit(budget) - u)))
              .as("rems"),
            concat(acc.getField("asg"), array(struct(
              d.getField("_id").as("id"), bin.as("bin"),
              u.as("units")))).as("asg"))
        }).getField("asg").as("_asg"))
    packed.select(col(partCol), col("seg"),
        explode(col("_asg")).as("a"))
      .select(col(partCol), col("seg"), col("a.id").as(idCol),
        col("a.bin").as("bin"), col("a.units").as(unitsCol))
  }

  /** The composed end-to-end curation pipeline — one call from raw
    * corpus to export-ready shards, chaining the library's stages in
    * the order a production training-data build runs them:
    *
    *   1. exact dedup (digest groupBy, min-id survivor)
    *   2. Gopher-rule quality gate ([[repetitionStats]] + [[gopherGate]])
    *   3. exact n-gram decontamination vs `bench` ([[contamination]]
    *      → anti-join; every doc sharing ANY n-gram with the benchmark
    *      is dropped)
    *   4. deterministic shuffle + hash-mod shard assignment
    *      ([[graft.operators.Sampling.deterministicShuffle]])
    *
    * Returns the clean corpus with `shuffle_key` and `bucket` columns.
    * Every stage is linear with uniform shuffle keys (digest, (id,
    * token), gram, id — no windows over the corpus, no collects), so
    * the composition inherits each stage's 100 TB posture; it is also
    * engine-replayable end-to-end (md5 digests, integer-exact ratios,
    * portable hash), which q147 exploits to oracle-check the whole
    * pipeline, not just its parts. */
  def curate(docs: DataFrame, bench: DataFrame, idCol: String,
             textCol: String, cfg: GopherConfig = GopherConfig(),
             contamN: Int = 8, salt: String = "epoch0",
             buckets: Int = 8): DataFrame = {
    // persist() at the reused stage boundaries — `deduped` feeds both
    // the repetition-stats pass and the gate join's left side, `kept`
    // both the contamination train side and the anti-join left:
    // without the cache each upstream stage re-evaluates once per
    // consumer inside the same action (stage 1 would run ~4×). The
    // frames outlive this call (the returned plan reads them), so they
    // register with [[graft.CacheScope]] and are released at the
    // caller's operation boundary; a production 100 TB build would
    // instead commit each stage boundary to the lake and read it back.
    val deduped = graft.CacheScope.persist(
      graft.operators.Dedup.dropExactDups(docs, idCol, textCol))
    val kept = graft.CacheScope.persist(deduped.join(
      repetitionStats(deduped, idCol, textCol)
        .filter(gopherGate(cfg)).select(col(idCol)),
      Seq(idCol), "left_semi"))
    val dirty = contamination(kept, bench, idCol, textCol, contamN)
      .select(col("train_id").as(idCol))
    val clean = kept.join(dirty, Seq(idCol), "left_anti")
    graft.operators.Sampling.deterministicShuffle(clean, idCol, salt,
      buckets)
  }

  /** The v3 composed pipeline — [[curate]] with LEARNED SELECTION as
    * the leading stage: DSIR importance weights gate the corpus toward
    * the `target` slice before any rule-based filtering, making the
    * learned-selection axis a first-class stage of the end-to-end
    * corpus build rather than a standalone score frame:
    *
    *   1. DSIR gate ([[dsirWeights]] vs `target`, keep w > 0 — the
    *      q203 selection rule)
    *   2. Gopher-rule quality gate ([[repetitionStats]] + [[gopherGate]])
    *   3. exact n-gram decontamination vs `bench` ([[contamination]]
    *      → anti-join)
    *   4. temperature mixture over `mixCol`
    *      ([[graft.operators.Sampling.temperatureMixture]] — share^α
    *      flattening, portable-hash decisions)
    *   5. deterministic shuffle + hash-mod shard assignment
    *
    * Returns the selected corpus with `shuffle_key` and `bucket`.
    * Same 100 TB posture as [[curate]]: every stage is linear with
    * uniform shuffle keys ((doc, bucket), (id, token), gram, id; the
    * DSIR ratio and mixture-rate frames broadcast), and every decision
    * is engine-replayable (portable hash, 4-dp rounded weights), so
    * one oracle can check the whole composition. persist() marks each
    * reused stage boundary — [[curate]]'s idiom. */
  def curateV3(docs: DataFrame, bench: DataFrame, idCol: String,
               textCol: String, target: Column, mixCol: String,
               cfg: GopherConfig = GopherConfig(), contamN: Int = 8,
               dsirBuckets: Int = 64, alpha: Double = 0.5,
               targetFrac: Double = 0.5, salt: String = "v3",
               buckets: Int = 8): DataFrame = {
    val selected = graft.CacheScope.persist(docs.join(
      dsirWeights(docs, idCol, textCol, target, dsirBuckets)
        .filter(col("w") > 0.0).select(col(idCol)),
      Seq(idCol), "left_semi"))
    val kept = graft.CacheScope.persist(selected.join(
      repetitionStats(selected, idCol, textCol)
        .filter(gopherGate(cfg)).select(col(idCol)),
      Seq(idCol), "left_semi"))
    val dirty = contamination(kept, bench, idCol, textCol, contamN)
      .select(col("train_id").as(idCol))
    val clean = graft.CacheScope.persist(
      kept.join(dirty, Seq(idCol), "left_anti"))
    val mixed = graft.operators.Sampling.temperatureMixture(
      clean, mixCol, idCol, alpha, targetFrac, salt + "mix")
    graft.operators.Sampling.deterministicShuffle(mixed, idCol, salt,
      buckets)
  }

  /** X2/X13: BOILERPLATE CHUNK REMOVAL WITH RECONSTRUCTION — the
    * C4-style corpus-wide duplicated-span removal (Raffel et al. 2020
    * drop any three-sentence span occurring more than once; CCNet drops
    * duplicated paragraphs): the document is cut into fixed
    * `chunkTokens`-token chunks, a chunk whose exact text occurs in
    * more than `maxDocFreq` DISTINCT documents is boilerplate, and the
    * document is REBUILT from its surviving chunks in order — this is
    * the rewriting half that the q143 dup-span COVERAGE pass only
    * measures.
    *
    * Shape, scale-first:
    *  - chunking is map-side expression work (`transform` over a
    *    staged token array — one explode, no positional joins);
    *  - chunk doc-frequency is a two-level distinct aggregate whose
    *    first shuffle key is the uniform (chunk, doc) pair;
    *  - the boilerplate SET (cdf > maxDocFreq) is small by definition
    *    (it's the repeated matter), so instances are cleaned by a
    *    broadcast ANTI-join — the instance stream never shuffles on
    *    the skewed chunk text. (If the boilerplate set ever outgrew a
    *    broadcast, drop the hint and Spark falls back to a shuffled
    *    anti-join; the aggregate side is already uniform.)
    *  - reconstruction is one per-doc hash-aggregate
    *    (array_sort(collect_list(struct(pos, chunk)))) — keyed by doc
    *    id, uniform.
    *
    * Returns one row per input document:
    * (idCol, n_chunks, n_kept, clean_text) — clean_text = "" when
    * every chunk was boilerplate. */
  def dropBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                      chunkTokens: Int, maxDocFreq: Int): DataFrame = {
    require(chunkTokens > 0 && maxDocFreq > 0, "positive chunk/df args")
    val chunks = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), Text.tokens(col(textCol)).as("a"))
      .withColumn("_nch", floor(
        (size(col("a")) + (chunkTokens - 1)).cast("double") / chunkTokens)
        .cast("int"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), col("_nch") - 1),
        i => array_join(
          slice(col("a"), i * chunkTokens + 1, lit(chunkTokens)), " ")))
        .as(Seq("cpos", "chunk")))
    val boiler = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col(idCol)).as("cdf"))
      .filter(col("cdf") > maxDocFreq)
      .select(col("chunk"))
    val kept = chunks.join(broadcast(boiler), Seq("chunk"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("cpos"), col("chunk")))),
          s => s.getField("chunk")), " ").as("clean_text"))
    chunks.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** X4/X13: BIGRAM LANGUAGE-MODEL QUALITY SCORING — the CCNet-style
    * LM-perplexity filter axis (Wenzek et al. 2020 rank documents by a
    * KenLM score; here the LM is a bigram model TRAINED ON THE CORPUS
    * ITSELF with add-α smoothing, so the whole pipeline stays inside
    * the engine and is exactly replayable):
    *
    *   P(w2 | w1) = (c(w1 w2) + α) / (c(w1 ·) + α·V)
    *   score(doc) = avg over the doc's bigrams of −ln P   (≈ log-PPL)
    *
    * A high score marks improbable token sequences — boilerplate,
    * shuffled text, lorem-noise — exactly what the perplexity filter
    * drops.
    *
    * Shape, scale-first:
    *  - bigrams come straight off the split array (`zip_with` of two
    *    `slice`s — map-side expression work, ONE explode; never a
    *    positional self-join);
    *  - model training is two hash-aggregates (bigram counts; context
    *    counts as their w1-rollup, so c(w1·) is consistent with c(w1w2)
    *    by construction) + a 1-row vocabulary count, all linear;
    *  - scoring rejoins the instance stream to the count tables on
    *    (w1, w2) then (w1) — hash equi-joins whose hot keys are the
    *    most frequent bigrams; at real corpus scale salt these two
    *    joins (the count tables are replicable) — and one per-doc
    *    average.
    *
    * Returns (idCol, avg_nll, n_bigrams), the `k` WORST (highest
    * avg −ln P) documents, avg rounded 4 dp, id tie-break. */
  def bigramLmScores(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, alpha: Double = 0.5): DataFrame =
    bigramNll(docs, idCol, textCol, alpha)
      .orderBy(col("avg_nll").desc, col(idCol).asc)
      .limit(k)

  /** The full per-document score frame behind [[bigramLmScores]] —
    * (idCol, avg_nll, n_bigrams), one row per document that HAS at
    * least one bigram (single-token documents carry no sequence
    * evidence and are absent; a gate built on this frame therefore
    * drops them, which is the C4/CCNet short-document behavior).
    * avg_nll is rounded 4 dp so a downstream threshold gate compares
    * the same value in every engine. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.5): DataFrame = {
    val grams = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), Text.tokens(col(textCol)).as("a"))
      .select(col(idCol), explode_outer(zip_with(
        slice(col("a"), lit(1), greatest(size(col("a")) - 1, lit(0))),
        slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("g"))
      .filter(col("g").isNotNull)
      .select(col(idCol), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val c12 = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs
      .select(explode_outer(Text.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull)
      .agg(countDistinct(col("token")).as("v"))
    grams.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("_nll", -log(
        (col("c12") + alpha) / (col("c1") + lit(alpha) * col("v"))))
      .groupBy(col(idCol))
      .agg(round(avg(col("_nll")), 4).as("avg_nll"),
        count(lit(1)).as("n_bigrams"))
  }

  /** X13: NAIVE-BAYES QUALITY CLASSIFIER — the fasttext/CCNet-style
    * learned quality axis (CCNet trains a linear classifier to rank
    * web text against a high-quality corpus; fasttext's supervised
    * mode is the standard tool), self-contained in the engine: a
    * multinomial NB model is TRAINED on the corpus itself against a
    * caller-supplied boolean label column (any heuristic gate — a
    * length cut, a Gopher pass, a trusted-source flag), then every
    * document is scored with the per-token average log-likelihood
    * ratio
    *
    *   avg_llr(d) = (1/dl) Σ_t tf_t · [ ln((c⁺_t + 1)/(T⁺ + V))
    *                                  − ln((c⁻_t + 1)/(T⁻ + V)) ]
    *
    * (add-1 smoothing over the joint vocabulary V; c± = class token
    * counts, T± = class token totals). Positive = looks like the
    * positive class; the length normalization makes the threshold
    * length-free, the CCNet move. Training and scoring are exactly
    * replayable (integer counts, one ln per distinct token, 4-dp
    * rounding at the end), so the whole learned gate sits under a
    * DuckDB oracle — the distinction vs an external model import.
    *
    * Shape, scale-first: the label rides the tokenize explode (no
    * doc-level join); class counts are ONE (token)-keyed hash
    * aggregate with map-side partials; T±/V ride a broadcast 1-row
    * frame; scoring joins per-doc postings (uniform (id, token) first
    * shuffle) to the vocabulary-sized weight frame on token, then one
    * per-doc aggregate. No windows, no collects, nothing corpus-sized
    * on the driver.
    *
    * Returns (idCol, dl, llr, avg_llr), one row per document with at
    * least one token, llr/avg_llr rounded 4 dp. */
  def nbQualityScores(docs: DataFrame, idCol: String, textCol: String,
                      label: Column): DataFrame = {
    // ONE tokenize+explode pass: the per-doc postings (with the label
    // riding along — it is constant per doc) feed BOTH the class
    // counts (Σ tf per class ≡ class token occurrences) and the
    // scoring join; persist() cuts the three-consumer re-evaluation
    // (counts, totals, scoring) to one, the same stage-boundary move
    // as [[curate]]. tf is postings-sized — far smaller than the
    // exploded stream.
    val tf0 = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), label.cast("boolean").as("_lab"),
        Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("_lab"),
        size(col("toks")).cast("long").as("dl"),
        explode_outer(col("toks")).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col(idCol), col("_lab"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val tf = graft.CacheScope.persist(tf0)
    val counts = tf.groupBy(col("token"))
      .agg(sum(when(col("_lab"), col("tf")).otherwise(0L)).as("cpos"),
        sum(when(!col("_lab"), col("tf")).otherwise(0L)).as("cneg"))
    val tot = counts.agg(sum(col("cpos")).as("tpos"),
      sum(col("cneg")).as("tneg"), count(lit(1)).as("v"))
    val w = counts.crossJoin(broadcast(tot))
      .select(col("token"),
        (log((col("cpos") + 1) / (col("tpos") + col("v"))) -
          log((col("cneg") + 1) / (col("tneg") + col("v")))).as("_w"))
    tf.join(w, Seq("token"))
      .groupBy(col(idCol), col("dl"))
      .agg(sum(col("tf") * col("_w")).as("_llr"))
      // + 0.0 collapses IEEE negative zero (a tiny negative sum rounds
      // to -0.0, which engines print differently from 0.0)
      .select(col(idCol), col("dl"),
        (round(col("_llr"), 4) + lit(0.0)).as("llr"),
        (round(col("_llr") / col("dl"), 4) + lit(0.0)).as("avg_llr"))
  }

  /** X4/X13: LANGUAGE-ID as a trained multiclass Naive Bayes
    * classifier — the supervised sibling of the marker-word heuristic
    * ([[graft.functions.Text.langId]]): real pipelines gate on
    * detected language before every quality stage, and a trained
    * model replaces the hand-picked marker lists with whatever the
    * labeled slice actually separates on. Add-1-smoothed multinomial
    * NB over whitespace tokens: per-class token counts and doc-count
    * priors come from the `train` slice; every document (train and
    * held-out alike) is scored per class as
    * `ln prior + Σ_t tf_t · (ln(c_{class,t}+1) − ln(tot_class+V))`
    * over the TRAIN vocabulary (out-of-vocab tokens carry no
    * evidence), the prediction is the argmax over the 4-dp-ROUNDED
    * scores with a lexicographic tie-break — rounding BEFORE the
    * argmax is what makes the decision engine-replayable (two engines
    * summing doubles in different orders agree on a 4-dp round, and
    * the tie-break resolves exact rounded ties deterministically).
    *
    * Scale shape: one tokenize of the train slice → (class, token)
    * counts → a per-token class-count MAP (≤ L entries, L = number of
    * labels); one tokenize of the score side reduced to postings;
    * the scoring join shuffles on the uniform token key; the L-row
    * class frame (totals + priors) broadcasts. Per-doc work is
    * postings × L rows — linear at any corpus size, nothing
    * corpus-sized on the driver.
    *
    * Returns (idCol, predicted_lang, margin): margin = best minus
    * runner-up rounded score (0.0 when only one class exists) — the
    * confidence a downstream gate thresholds on. Documents with no
    * train-vocab token overlap fall back to the prior argmax. */
  def nbLangId(docs: DataFrame, idCol: String, textCol: String,
               labelCol: String, train: Column,
               features: Column => Column = Text.tokens): DataFrame = {
    val trainDocs = docs.filter(train)
    // (class, token) counts + per-class totals + doc-count priors;
    // V rides the 1-row vocab frame and broadcasts with the classes.
    // `features` picks the evidence unit: word unigrams (default,
    // q214) or char n-grams (Text.charNgrams — the fastText-style
    // variant, q225); the NB machinery is identical either way.
    val tok = graft.scaleOut(trainDocs, col(idCol))
      .select(col(labelCol).as("_cls"),
        explode(features(col(textCol))).as("token"))
    val counts = tok.groupBy(col("_cls"), col("token"))
      .agg(count(lit(1)).as("_c"))
    val tokMap = counts.groupBy(col("token"))
      .agg(map_from_entries(collect_list(struct(col("_cls"), col("_c"))))
        .as("_cm"))
    val classes = trainDocs.groupBy(col(labelCol).as("_cls"))
      .agg(count(lit(1)).as("_docs"))
      .join(counts.groupBy("_cls").agg(sum(col("_c")).as("_tot")),
        Seq("_cls"))
      .crossJoin(broadcast(tokMap.agg(count(lit(1)).as("_v"))))
      .crossJoin(broadcast(
        trainDocs.agg(count(lit(1)).as("_n"))))
      .select(col("_cls"), col("_tot"), col("_v"),
        log(col("_docs").cast("double") / col("_n")).as("_prior"))
    // score-side postings ⋈ vocab map, then one row per (doc, class)
    val tf = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), explode(features(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("_tf"))
    val contrib = tf.join(tokMap, Seq("token"))
      .crossJoin(broadcast(classes))
      .groupBy(col(idCol), col("_cls"))
      .agg(sum(col("_tf") *
        (log(coalesce(element_at(col("_cm"), col("_cls")), lit(0L)) + 1)
          - log(col("_tot") + col("_v")))).as("_sum"))
    // every doc × every class, prior-only when no vocab overlap;
    // round BEFORE the argmax so the decision replays exactly
    val scored = docs.select(col(idCol))
      .crossJoin(broadcast(classes.select("_cls", "_prior")))
      .join(contrib, Seq(idCol, "_cls"), "left")
      .select(col(idCol), col("_cls"),
        (round(col("_prior") + coalesce(col("_sum"), lit(0.0)), 4)
          + lit(0.0)).as("_llr"))
    scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct((-col("_llr")).as("_nl"), col("_cls")))).as("_a"))
      .select(col(idCol),
        col("_a").getItem(0).getField("_cls").as("predicted_lang"),
        (round(when(size(col("_a")) > 1,
          col("_a").getItem(1).getField("_nl")
            - col("_a").getItem(0).getField("_nl"))
          .otherwise(lit(0.0)), 4) + lit(0.0)).as("margin"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — public prior
    * art): score every document by how much more likely its hashed
    * token features are under a TARGET slice's distribution than under
    * the raw corpus distribution. Features are portable-hash token
    * buckets (`b = md5_32(token|dsir) mod buckets` — the q74 oracle
    * hash, so an external engine can replay bucketing bit-for-bit);
    * both distributions are add-½-smoothed bucket frequencies; a doc's
    * weight is its length-normalized Σ count_b · (ln p̂(b) − ln q̂(b)),
    * rounded 4 dp with the negative-zero collapse every score frame
    * here uses.
    *
    * Scale shape: one token pass feeds both distribution aggregates
    * and the per-doc feature counts (uniform (token) and (doc, bucket)
    * keys); the ≤`buckets`-row log-ratio frame broadcasts — nothing
    * corpus-sized ever sits on the driver or a single partition. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  target: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"need at least 2 feature buckets, got $buckets")
    // ONE tokenize+explode pass: reduce the exploded stream to
    // per-(doc, bucket) counts (postings-sized, ≤`buckets` rows per
    // doc — far smaller than the token stream) and persist() that, so
    // the two consumers (bucket distributions, per-doc scoring) share
    // a single corpus tokenize — the [[nbQualityScores]] stage-boundary
    // idiom. `_t` is constant per doc, so it rides the group key free.
    val feat0 = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), target.as("_t"),
        explode(Text.tokens(col(textCol))).as("token"))
      .select(col(idCol), col("_t"),
        pmod(graft.functions.Native.md5Prefix32(
          concat(col("token"), lit("|dsir"))), lit(buckets.toLong))
          .as("b"))
      .groupBy(col(idCol), col("_t"), col("b"))
      .agg(count(lit(1)).as("c"))
    val feat = graft.CacheScope.persist(feat0)
    val q = feat.groupBy(col("b")).agg(sum(col("c")).as("qc"),
      sum(when(col("_t"), col("c")).otherwise(0L)).as("pc"))
    val tot = q.agg(sum(col("qc")).as("qtot"), sum(col("pc")).as("ptot"))
    val half = lit(buckets * 0.5)
    val ratios = q.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("pc") + 0.5) / (col("ptot") + half)) -
          log((col("qc") + 0.5) / (col("qtot") + half))).as("lr"))
    feat.join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol))
      .agg((sum(col("c") * col("lr")) / sum(col("c"))).as("_w"))
      .select(col(idCol),
        (round(col("_w"), 4) + lit(0.0)).as("w"))
  }

  /** X13 PERCENTILE QUALITY GATE: keep the top `keepFrac` of each
    * stratum by a (rounded) score column — the GPT-3/FineWeb-style
    * classifier-thresholded selection, where the cut is a per-language
    * percentile of the quality score rather than an absolute value.
    *
    * Semantics: cutoff_s = the highest score at which the
    * top-cumulative count reaches ceil(keepFrac · n_s); every row with
    * score ≥ cutoff is kept, so boundary TIES are kept inclusively
    * (kept fraction ≥ keepFrac — the deterministic, arrival-order-free
    * choice; real gates accept the tie inflation rather than break
    * ties arbitrarily).
    *
    * Scale shape — deliberately NOT a per-stratum row_number window
    * (that ranks the corpus inside |strata| partitions, a skew sort at
    * 100 TB): the score column is expected to be ROUNDED (the
    * registry's 4-dp quality scores), so the (stratum, score)
    * HISTOGRAM is bounded by score granularity, not corpus size; the
    * cumulative scan runs over that stats-sized frame, and the corpus
    * is touched only by one map-side broadcast-join filter. */
  def qualityPercentileGate(scored: DataFrame, stratumCol: String,
                            scoreCol: String,
                            keepFrac: Double): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"keepFrac in (0,1], got $keepFrac")
    val hist = scored.groupBy(stratumCol, scoreCol)
      .agg(count(lit(1)).as("_c"))
    val n = scored.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col(scoreCol).desc)
    val cum = hist.withColumn("_cum", sum(col("_c")).over(w))
    val cut = cum.join(n, Seq(stratumCol))
      .withColumn("_k", ceil(col("_n") * keepFrac).cast("long"))
      .groupBy(stratumCol)
      // the lowest score whose top-cumulative count reaches k; the
      // bottom score always does (cum = n ≥ k), so the max never NULLs
      .agg(max(when(col("_cum") >= col("_k"), col(scoreCol)))
        .as("_cutoff"))
    scored.join(broadcast(cut), Seq(stratumCol))
      .filter(col(scoreCol) >= col("_cutoff"))
      .drop("_cutoff")
  }

  /** X13 CORPUS DRIFT MONITOR: population-stability index (PSI — the
    * standard model-monitoring drift statistic: Σ_b (q_b − p_b) ·
    * ln(q_b / p_b) over histogram buckets, with add-one smoothing so
    * empty buckets stay finite) between TWO corpus snapshots, per
    * stratum. The deployment shape: `v1`/`v2` are two versions of a
    * curated manifest table (time travel), and the monitor answers
    * "did this refresh wave move any source's length/quality
    * distribution?" before the wave feeds a tokenizer run. Rule of
    * thumb from the monitoring literature: PSI < 0.1 stable, 0.1–0.25
    * drifting, > 0.25 investigate.
    *
    * `valueCol` is bucketed as min(floor(value / bucketWidth),
    * numBuckets−1), clamped at 0 — fixed-width buckets with an
    * overflow tail, so the SAME bucket edges apply to both snapshots
    * (quantile edges would re-derive per snapshot and mask drift).
    * NULL values carry no distribution evidence and are EXCLUDED from
    * the histograms (n_v1/n_v2 count non-null rows) — without the
    * explicit filter, floor(NULL/width) is NULL and Spark's
    * null-skipping least/greatest would silently fold missing data
    * into the overflow bucket, reading as tail drift in a monitor.
    * Null-RATE drift is a completeness concern; monitor it with its
    * own count, not by aliasing nulls into a value bucket.
    * `max_shift_bucket` is the bucket with the largest |q_b − p_b|
    * (ties → lowest bucket): where to look first. Strata are the UNION
    * of both snapshots' — a source present in only one version is
    * itself drift, not an error.
    *
    * Engine-replayable: counts are exact integers, p/q are exact
    * IEEE divisions, the tie-break shift |q−p| never touches a
    * transcendental, and the PSI sum is rounded to 6 dp. Scale shape:
    * two histogram aggregates (|strata|·numBuckets rows each, shuffled
    * on the uniform stratum key), everything downstream is
    * stats-frame-sized — the corpora are each read ONCE, map-side. */
  def distributionDrift(v1: DataFrame, v2: DataFrame, stratumCol: String,
                        valueCol: String, bucketWidth: Long,
                        numBuckets: Int): DataFrame = {
    // strata from the RAW frames (not the histograms): a stratum whose
    // rows are all NULL-valued still appears, with an all-smoothing
    // (psi = 0) row — same shape a recompute would surface
    val strata = v1.select(stratumCol).union(v2.select(stratumCol))
      .distinct()
    driftFromHists(
      driftHistogram(v1, stratumCol, valueCol, bucketWidth, numBuckets),
      driftHistogram(v2, stratumCol, valueCol, bucketWidth, numBuckets),
      strata, stratumCol, numBuckets)
  }

  /** One snapshot's drift histogram — `(stratumCol, bucket, c)` with
    * the SAME bucketing rule [[distributionDrift]] applies internally
    * (fixed-width, overflow tail, NULL values excluded). This is the
    * MAINTAINABLE form: counts are exact integers, so per-wave
    * histograms SUM to the live table's histogram — a gate can carry
    * it in a commit header (the VectorIndex pivot pattern) or a
    * [[graft.sources.MaterializedAgg]] view and never rescan the
    * corpus per invocation. */
  def driftHistogram(df: DataFrame, stratumCol: String, valueCol: String,
                     bucketWidth: Long, numBuckets: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    df.filter(col(valueCol).isNotNull)
      .select(col(stratumCol),
        greatest(lit(0L), least(floor(col(valueCol).cast("double") /
          lit(bucketWidth.toDouble)), lit((numBuckets - 1).toLong)))
          .cast("int").as("bucket"))
      .groupBy(stratumCol, "bucket").agg(count(lit(1)).as("c"))
  }

  /** [[distributionDrift]] from PRE-AGGREGATED histograms (the
    * [[driftHistogram]] shape, `(stratumCol, bucket, c)`) — the
    * stats-sized path for maintained/header-carried histograms.
    * Strata = the union of both histograms'. NULL-`bucket` rows are
    * ACCEPTED and carry stratum MEMBERSHIP but no mass (they never
    * match the 0..numBuckets-1 grid): a maintained view that buckets
    * without a non-null predicate (NULL values → NULL bucket) then
    * reproduces the raw-frame entry point EXACTLY — a stratum whose
    * rows are all NULL-valued still surfaces, as the same smoothing-
    * only psi=0 row [[distributionDrift]] emits. Feed histograms that
    * DROP null-valued rows entirely and such strata are absent — the
    * one shape difference to avoid when an oracle replays raw frames. */
  def distributionDriftHists(h1: DataFrame, h2: DataFrame,
                             stratumCol: String,
                             numBuckets: Int): DataFrame = {
    val strata = h1.select(stratumCol).union(h2.select(stratumCol))
      .distinct()
    driftFromHists(h1, h2, strata, stratumCol, numBuckets)
  }

  private def driftFromHists(h1: DataFrame, h2: DataFrame,
                             strata: DataFrame, stratumCol: String,
                             numBuckets: Int): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val spark = h1.sparkSession
    val buckets = spark.range(numBuckets)
      .select(col("id").cast("int").as("bucket"))
    val grid = strata.crossJoin(broadcast(buckets))
    val h = grid
      .join(h1.select(col(stratumCol), col("bucket"), col("c").as("_c1")),
        Seq(stratumCol, "bucket"), "left")
      .join(h2.select(col(stratumCol), col("bucket"), col("c").as("_c2")),
        Seq(stratumCol, "bucket"), "left")
      .na.fill(0L, Seq("_c1", "_c2"))
    val tot = h.groupBy(stratumCol)
      .agg(sum(col("_c1")).as("_n1"), sum(col("_c2")).as("_n2"))
    val pq = h.join(tot, Seq(stratumCol))
      .withColumn("_p", (col("_c1") + 1).cast("double") /
        (col("_n1") + numBuckets))
      .withColumn("_q", (col("_c2") + 1).cast("double") /
        (col("_n2") + numBuckets))
      .withColumn("_term",
        (col("_q") - col("_p")) * log(col("_q") / col("_p")))
      .withColumn("_shift", abs(col("_q") - col("_p")))
    pq.groupBy(stratumCol)
      .agg(max(col("_n1")).as("n_v1"), max(col("_n2")).as("n_v2"),
        round(sum(col("_term")), 6).as("psi"),
        // struct max = (max shift, then LOWEST bucket): shifts are
        // exact doubles, so the ordering is engine-identical
        max(struct(col("_shift"), (-col("bucket")).as("_nb"))).as("_m"))
      .select(col(stratumCol), col("n_v1"), col("n_v2"), col("psi"),
        (-col("_m._nb")).cast("int").as("max_shift_bucket"))
  }

  /** Serialize a BOUNDED drift histogram into a commit-header string
    * (`url(stratum):bucket:count;…` in sorted order — deterministic).
    * The collect is |strata|·|buckets| rows, stats-sized by contract;
    * strata must be non-null strings (a header key is not the place
    * for a NULL-keyed group). */
  def serializeHist(h: DataFrame): String = {
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    h.collect().map { r =>
      require(!r.isNullAt(0), "header histograms need non-null strata")
      (r.getString(0), r.getInt(1), r.getLong(2))
    }.sortBy { case (s, b, _) => (s, b) }
      .map { case (s, b, c) => s"${enc(s)}:$b:$c" }.mkString(";")
  }

  /** Inverse of [[serializeHist]] — `(stratumCol, bucket, c)`. */
  def parseHist(spark: org.apache.spark.sql.SparkSession, s: String,
                stratumCol: String): DataFrame = {
    import spark.implicits._
    val dec = (x: String) =>
      java.net.URLDecoder.decode(x, java.nio.charset.StandardCharsets.UTF_8)
    val rows =
      if (s.isEmpty) Seq.empty[(String, Int, Long)]
      else s.split(";").toSeq.map { e =>
        val p = e.split(":")
        (dec(p(0)), p(1).toInt, p(2).toLong)
      }
    rows.toDF(stratumCol, "bucket", "c")
  }
}
