package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library (SURVEY.md §2.10/§2.11 X4).
  *
  * Every function here is a pure Catalyst expression tree built from
  * `org.apache.spark.sql.functions._` — codegen'd, no UDFs, so the whole
  * pipeline stays inside WholeStageCodegen and scales linearly with input
  * splits at 100 TB.
  *
  * Oracle-parity note: several functions are intentionally expressed with
  * engine-portable primitives (replace/length/split) so that the DuckDB
  * oracle can evaluate byte-identical semantics.
  */
object Text {

  /** Whitespace tokens of the lowercased text — the registry-wide
    * tokenization convention: `\s+` (runs of tabs/newlines/spaces are
    * ONE boundary, the way real corpora need), DuckDB mirror
    * `regexp_split_to_array(lower(text), '\s+')`, native-kernel twin
    * [[TextSignatureKernels.wsTokens]]. All three agree on edge
    * semantics (leading/trailing runs yield one empty token, which
    * consumers filter). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Character n-grams of the lowercased text (spaces included — the
    * fastText-style language-ID feature: word-boundary characters
    * carry signal word unigrams miss). Empty for NULL or shorter-
    * than-n text; the guard also avoids `sequence`'s descending range
    * when length-n+1 < 1. Engine-portable: DuckDB mirror is
    * `list_transform(range(1, len(s) - (n-2)), i -> s[i:i+(n-1)])`
    * (DuckDB `range` is empty when stop <= start, slices are 1-based
    * end-inclusive). */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val t = lower(text)
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
      .otherwise(typedLit(Array.empty[String]))
  }

  /** BPE-ish subword segmentation: split on whitespace AND at
    * letter/digit/punct boundaries — a deterministic stand-in for a real
    * BPE vocab (tokenizer libs are not in scope). */
  def bpeishTokenCount(text: Column): Column =
    size(filter(
      split(lower(text), "\\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|(?=[^a-z0-9\\s])|(?<=[^a-z0-9\\s])"),
      t => length(t) > 0)).cast("long")

  /** Email-address pattern, written in the RE2-compatible subset (no
    * backrefs/lookaround) so the SAME pattern string runs identically
    * in Java regex (Spark) and RE2 (DuckDB, Go engines). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-number-shaped spans: international-prefix optional, ≥ 8
    * digits/separators. RE2-compatible like [[emailRe]]. */
  val phoneRe = "\\+?\\(?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII scrubbing: replace emails then phone-shaped spans with typed
    * placeholders — the redaction pass a training corpus gets before
    * tokenization. Map-only, codegen'd; order matters (emails first, so
    * digit runs inside addresses are gone before the phone pass). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** RAG/pretraining chunking: overlapping token windows of
    * `chunkTokens` tokens, consecutive chunks sharing `overlap` tokens
    * (stride = chunkTokens − overlap). Returns array&lt;array&lt;
    * string&gt;&gt; — one inner array per chunk; a doc shorter than one
    * chunk yields a single short chunk. Pure expression (sequence →
    * transform → slice): map-only, codegen-friendly, no explode until
    * the caller wants chunk rows — at 100 TB the chunk multiplicity
    * rides the same scan task as its document. */
  def chunkPassages(text: Column, chunkTokens: Int,
                    overlap: Int): Column = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap / $chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(text)
    val n = size(toks)
    // chunk count = ceil((n - overlap) / stride), min 1:
    // floor((n - overlap - 1) / stride) clamps to -1.. for tiny docs,
    // greatest(., 0) keeps exactly one chunk for them.
    val lastIdx = greatest(
      floor((n - lit(overlap + 1)) / lit(stride)), lit(0L))
    transform(sequence(lit(0L), lastIdx),
      i => slice(toks, (i * stride + 1).cast("int"), lit(chunkTokens)))
  }

  /** Non-overlapping occurrence count of a token (word-bounded by space
    * padding). Removal is left-to-right non-overlapping in both Spark
    * and DuckDB → oracle-exact. */
  def occ(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    ((length(padded) - length(regexp_replace(padded,
      java.util.regex.Pattern.quote(s" $word "), ""))) / (word.length + 2))
      .cast("long")
  }

  /** Language-ID by stopword-marker scoring (n-gram heuristic): count
    * marker-word hits per language, argmax with a deterministic
    * tie-break order. Linear scan per row — no shuffle. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"))

  def langScore(text: Column, words: Seq[String]): Column =
    words.map(occ(text, _)).reduce(_ + _)

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ws) => l -> langScore(text, ws) }
    val Seq(en, es, de) = scores.map(_._2)
    when(en >= greatest(es, de) && en > 0, lit("en"))
      .when(es >= de && es > 0, lit("es"))
      .when(de > 0, lit("de"))
      .otherwise(lit("und"))
  }

  /** Quality score: token count, type-token ratio, mean token length,
    * and a coarse bucket — the length/punct/stopword-ratio style score a
    * pretraining pipeline gates on. */
  def qualityBucket(nTokens: Column, uniqRatio: Column): Column =
    when(nTokens < 10, lit("too_short"))
      .when(uniqRatio < 0.3, lit("repetitive"))
      .when(uniqRatio > 0.95, lit("high"))
      .otherwise(lit("ok"))

  /** Rolling polynomial fingerprint over tokens (document fingerprinting
    * X4). Pure integer arithmetic → bit-exact across engines. Each token
    * contributes ascii(first char)*31 + length; fold is
    * acc*1000003 + x (mod 1e9+7). */
  def tokenFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text),
        t => (ascii(t).cast("long") * 31 + length(t).cast("long"))),
      lit(0L),
      (acc, x) => (acc * 1000003L + x) % 1000000007L)

  /** Character-level rolling hash (classic Rabin-Karp shape) — Scala-side
    * only (char split differs across engines; covered by ScalaTest). */
  def charFingerprint(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => length(c) > 0),
      lit(0L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")) % 1000000007L)

  /** Word n-gram shingles over a PRE-SPLIT token array column
    * ("a b c", n=2 → ["a b","b c"]). Used by MinHash and Jaccard dedup.
    *
    * `toks` should be a materialized column (staged `select`), not an
    * inline `split(...)` expression: higher-order lambdas are
    * interpreted, and an embedded subtree is re-evaluated on every
    * `element_at` call — a column reference is O(1). */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Shingles straight from text — convenience for single-pass use.
    * Prefer staging `tokens(text)` as a column first (see above). */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** Distinct shingle set — the MinHash/Jaccard input. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingles(text, n))

  /** Distinct shingle set from a pre-split token column. */
  def shingleSetOfTokens(toks: Column, n: Int): Column =
    array_distinct(shinglesOfTokens(toks, n))
}
