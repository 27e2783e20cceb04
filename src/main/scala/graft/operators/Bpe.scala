package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** In-engine byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public prior art): TRAIN merge rules on a corpus slice as pure
  * aggregations, ENCODE via rank-ordered merge folds, and ACCOUNT in
  * subword tokens — so packing budgets, mixture weights and per-source
  * token counts can be denominated the way real corpus builds ship
  * them (BPE tokens), not whitespace words or characters
  * ([[Curation.packBestFit]]'s `unitsCol`).
  *
  * Reference scope: the reference pipeline has no tokenizer at all
  * (its Athena surface counts rows, `python-data-ingestions/
  * query-data-lambda.py:195-218`); this operator is part of the
  * north-star 100 TB training-data suite the engine adds on top.
  *
  * Everything is engine-replayable — training decisions are integral
  * pair counts with a total (count DESC, pair ASC) order, encoding is
  * a deterministic left-to-right greedy fold — so a DuckDB oracle can
  * replay train AND encode exactly (the q190/q214 trained-model
  * discipline).
  *
  * Scale shape (100 TB): the corpus never meets the merge loop — the
  * WORD-TYPE vocabulary does (one tokenize → `groupBy(word).count`,
  * shuffled on the uniform word key; word types grow sub-linearly in
  * corpus size and train slices are bounded by contract). Each merge
  * round is one distributed adjacent-pair aggregation over that vocab
  * plus a 1-row argmax collect (the merge becomes a literal in the
  * next round's plan — driver traffic is `numMerges` single rows, by
  * construction). Merge application is a map-only per-row fold.
  * Encoding touches only DISTINCT words (encode once, join back to
  * the token stream — the word-piece table broadcasts when small and
  * shuffles on the word key otherwise), so per-document cost is one
  * postings-shaped join, never a per-occurrence re-encode.
  */
object Bpe {

  /** One learned merge: rank r rewrites adjacent (left, right) →
    * left+right. Ranks are 1-based and dense. */
  final case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** Sennrich's end-of-word marker: the final character symbol of
    * every word carries it, so a word-FINAL piece ("est" in "lowest")
    * and the same characters word-INTERNALLY ("est" in "estimate")
    * learn SEPARATE merge statistics — without it the two pool and the
    * learned merges diverge from what a reference BPE trainer
    * produces. Caveat shared with the original: a corpus word that
    * literally contains the marker string would alias a marked symbol;
    * the registry's corpora are plain text, where it cannot occur. */
  val EndOfWord = "</w>"

  /** Character symbol list of a word (the rank-0 segmentation), the
    * last symbol suffixed with [[EndOfWord]]. `substr` is
    * character-based on both engines (oracle mirror:
    * `list_transform(range(1, len(w)+1), i -> w[i] || CASE WHEN
    * i = len(w) THEN '</w>' ELSE '' END)`). */
  def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)),
      i => concat(word.substr(i, lit(1)),
        when(i === length(word), lit(EndOfWord)).otherwise(lit(""))))

  /** Word-type vocabulary of a corpus: one row per distinct
    * whitespace token with its occurrence count — the frame BPE
    * training actually iterates (corpus-sized data reduces to
    * vocab-sized state here, the whole scale story). */
  def wordVocab(corpus: DataFrame, textCol: String): DataFrame =
    graft.scaleOut(corpus)
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Apply ONE merge to a symbol array: greedy left-to-right,
    * non-overlapping — the fold `acc[-1]==left && s==right → replace
    * tail with merged` reproduces the scan exactly because a merged
    * token ceases to equal `left` unless it literally is `left`.
    * CaseWhen branches guard the empty accumulator (ANSI-safe).
    * The zero is a LITERAL empty array, never an expression over
    * `syms` — [[encode]] nests these folds rank-deep, and a zero that
    * referenced the input would double the expression tree per level
    * (2^ranks nodes; the first cut used `slice(syms,1,0)` and a
    * 16-merge encode sat minutes in the optimizer). */
  def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms, typedLit(Array.empty[String]),
      (acc, s) =>
        when(size(acc) === 0, array(s))
          .when(element_at(acc, -1) === lit(left) && (s === lit(right)),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(lit(left + right))))
          .otherwise(concat(acc, array(s))))

  /** Adjacent-pair counts of a (word, n, syms) vocab frame, weighted
    * by word frequency — one explode + one hash aggregate. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) > 1)
      .select(col("n"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p").getField("a").as("a"),
        col("p").getField("b").as("b"))
      .agg(sum(col("n")).as("c"))

  /** Train `numMerges` merge rules on a corpus slice. Each round:
    * distributed pair-count aggregation over the word-type vocab →
    * 1-row argmax (total order: count DESC, then pair ASC — both
    * engines agree on ties) → map-only merge application. Stops early
    * when no adjacent pair remains.
    *
    * Per-round state is `localCheckpoint` (eager), NOT `persist`: the
    * loop's plan deepens by one fold per round, and keeping lineage
    * makes round r's analysis/canonicalization cost grow with r —
    * measured 42 s for 16 rounds under persist vs 2.7 s checkpointed
    * on the same corpus (planning, not compute: the vocab is tiny).
    * The usual lineage-for-recompute argument doesn't buy anything in
    * an iterative TRAIN loop — a lost block fails one restartable
    * training call, the standard trade iterative algorithms make.
    * Checkpointed blocks are vocab-sized × live rounds and are freed
    * by the ContextCleaner as round refs drop. */
  def train(corpus: DataFrame, textCol: String,
            numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val merges = Seq.newBuilder[Merge]
    var vocab = wordVocab(corpus, textCol)
      .withColumn("syms", charSyms(col("word")))
      .localCheckpoint(true)
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect() // 1 row × numMerges — bounded by contract
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(r, a, b)
        vocab = vocab.withColumn("syms",
          when(size(col("syms")) > 1,
            applyMerge(col("syms"), a, b)).otherwise(col("syms")))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result()
  }

  /** Segment each word of a one-column frame into BPE pieces by
    * applying the learned merges in rank order — one chained fold per
    * merge, composed into a single map-only projection. Call on
    * DISTINCT words and join back (the [[tokenCounts]] shape); at
    * serving scale the result IS the word-piece table a build
    * persists. Adds `syms` (array of pieces). */
  def encode(words: DataFrame, wordCol: String,
             merges: Seq[Merge]): DataFrame = {
    val segmented = merges.sortBy(_.rank)
      .foldLeft(charSyms(col(wordCol)))((e, m) =>
        applyMerge(e, m.left, m.right))
    words.withColumn("syms", segmented)
  }

  /** Token-true accounting: per-document whitespace AND BPE token
    * counts under the given merge table. Encodes each distinct word
    * once, joins the piece counts back to the token stream, and
    * left-joins to the document spine so the output is row-aligned
    * with the input (NULL/empty text → 0s).
    * Returns (idCol, ws_tokens, bpe_tokens). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val toks = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    val pieces = encode(toks.select("word").distinct(), "word", merges)
      .select(col("word"), size(col("syms")).cast("long").as("_bpe"))
    val per = toks.join(pieces, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_ws"), sum(col("_bpe")).as("_bp"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_ws"), lit(0L)).as("ws_tokens"),
        coalesce(col("_bp"), lit(0L)).as("bpe_tokens"))
  }

  /** Tokenizer AUDIT: per-stratum fertility / compression / coverage
    * of a merge table over a corpus — the numbers a tokenizer
    * deployment reports before a vocabulary is frozen (model cards
    * publish exactly these, e.g. SentencePiece/HF tokenizer evals):
    *
    *  - `fertility`        — BPE tokens per whitespace word (the
    *    context-length multiplier a vocab costs each stratum; >2 on a
    *    language means its documents burn twice the context budget),
    *  - `chars_per_token`  — characters compressed into one subword,
    *  - `whole_word_rate`  — fraction of word OCCURRENCES encoded as
    *    ONE marker-terminated piece (vocab-hit rate),
    *  - `distinct_pieces`  — the piece inventory the stratum's word
    *    TYPES actually exercise.
    *
    * Ratios are rounded to 6 dp over exact integral sums, so the frame
    * is engine-replayable. Scale shape: one tokenize pass to (stratum,
    * word) occurrences, the DISTINCT-word piece table met with the
    * same postings-shaped word-key join as [[tokenCounts]], then two
    * stratum-keyed aggregates — |strata| output rows, no corpus-sized
    * collect anywhere. */
  def fertilityAudit(docs: DataFrame, stratumCol: String, textCol: String,
                     merges: Seq[Merge]): DataFrame = {
    val toks = graft.scaleOut(docs)
      .select(col(stratumCol),
        explode(Text.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    // the word-piece table feeds BOTH aggregates — persist the one
    // vocab-sized frame so the rank-deep encode folds (expensive to
    // plan AND run) are paid once, not per consumer; the corpus-sized
    // token stream deliberately stays unpersisted (re-scanning two
    // map-side passes beats caching a 100 TB explode)
    val pieces = graft.CacheScope.persist(
      encode(toks.select("word").distinct(), "word", merges)
        .select(col("word"), col("syms"),
          size(col("syms")).cast("long").as("_pieces")))
    val occ = toks.join(pieces.select("word", "_pieces"), Seq("word"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("word_occurrences"),
        sum(col("_pieces")).as("bpe_tokens"),
        sum(length(col("word")).cast("long")).as("chars"),
        sum(when(col("_pieces") === 1, 1L).otherwise(0L))
          .as("whole_word_occurrences"))
    val inventory = toks.select(stratumCol, "word").distinct()
      .join(pieces.select("word", "syms"), Seq("word"))
      .select(col(stratumCol), explode(col("syms")).as("_piece"))
      .groupBy(stratumCol)
      .agg(countDistinct(col("_piece")).as("distinct_pieces"))
    occ.join(inventory, Seq(stratumCol))
      .select(col(stratumCol), col("word_occurrences"), col("bpe_tokens"),
        col("chars"), col("whole_word_occurrences"),
        col("distinct_pieces"),
        round(col("bpe_tokens").cast("double") /
          col("word_occurrences"), 6).as("fertility"),
        round(col("chars").cast("double") / col("bpe_tokens"), 6)
          .as("chars_per_token"),
        round(col("whole_word_occurrences").cast("double") /
          col("word_occurrences"), 6).as("whole_word_rate"))
  }

  /** DECODE: the inverse of [[encode]] over a PIECE STREAM — the half
    * a deployable tokenizer artifact must ship with (training contexts
    * are stored as token streams; evaluation, inspection and serving
    * all read text back out). Pieces concatenate byte-for-byte and
    * every word's final piece carries [[EndOfWord]], so the inverse is
    * exact: join the pieces, rewrite each marker to a single space,
    * trim the trailing one. The round-trip invariant (BpeSpec pins it
    * on the Sennrich corpus; q242 oracle-replays it corpus-wide):
    *
    *   decodePieces(encode(w₁..wₙ pieces in order)) ==
    *     whitespace-normalized input (tokens joined by ONE space)
    *
    * — BPE segmentation loses nothing; only the whitespace RUNS the
    * registry tokenization already collapses are normalized. Map-only
    * string expression, engine-portable (DuckDB:
    * `rtrim(replace(string_agg(...), '</w>', ' '))`).
    *
    * MARKER-COLLISION CAVEAT: exactness assumes no input token contains
    * the literal marker text [[EndOfWord]] ("&lt;/w&gt;") — such a
    * substring would decode to a space. Both engines compute the decode
    * identically (hashes stay green) and [[decodeAudit]]'s
    * `roundtrip_ok` correctly reads false for such a document, so the
    * failure is visible, never silent; escape the marker during charSyms
    * if exactness on arbitrary bytes is ever needed. */
  def decodePieces(pieces: Column): Column =
    rtrim(replace(array_join(pieces, ""), lit(EndOfWord), lit(" ")))

  /** Per-document decode round-trip audit: encode each doc's token
    * stream under `merges` (distinct-word encode + postings join — the
    * [[tokenCounts]] scale shape), decode the assembled piece stream
    * back, and compare against the whitespace-normalized text. Returns
    * (idCol, bpe_tokens, decoded, normalized) row-aligned with the
    * input (NULL/empty text → empty strings, 0 tokens). The per-doc
    * piece assembly is one ordered collect_list — bounded by document
    * length, the reassembleKept class. */
  def decodeAudit(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val toks = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), posexplode(Text.tokens(col(textCol))))
      .toDF(idCol, "pos", "word")
      .filter(col("word") =!= "")
    val pieces = encode(toks.select("word").distinct(), "word", merges)
    val per = toks.join(pieces, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(size(col("syms")).cast("long")).as("_bp"),
        collect_list(struct(col("pos"), col("syms"))).as("_ps"))
      // stage the flattened stream as a real column: the sort/flatten/
      // join chain stays out of downstream lambda inlining
      .select(col(idCol), col("_bp"),
        flatten(transform(array_sort(col("_ps")),
          x => x.getField("syms"))).as("_stream"))
      .select(col(idCol), col("_bp"),
        decodePieces(col("_stream")).as("decoded"))
    docs.select(col(idCol),
        coalesce(array_join(filter(Text.tokens(col(textCol)),
          w => w =!= ""), " "), lit("")).as("normalized"))
      .join(per, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_bp"), lit(0L)).as("bpe_tokens"),
        coalesce(col("decoded"), lit("")).as("decoded"),
        col("normalized"))
  }

  /** The learned merge table as a frame (merge_rank, left_sym,
    * right_sym, merged) — the registrable/persistable artifact. */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.merged))
      .toDF("merge_rank", "left_sym", "right_sym", "merged")
  }
}
