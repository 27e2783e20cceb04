package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text

/** Native search operators — the OpenSearch-delegated surface of the
  * reference re-expressed as Spark relational operators (SURVEY.md §2.10).
  *
  *  - tokenization / analyzed text → lower + split + explode
  *  - the index itself → an inverted-postings TABLE (token → doc, tf);
  *    at 100 TB this is one shuffle on token, then any term lookup is a
  *    pushed-down point predicate on a token-partitioned parquet table
  *  - bulk indexing with positional _id (reference lambda-function.py:154-159)
  *  - single-doc idempotent upsert (index-data-lambda.py:390-411) →
  *    Catalog.upsert (anti-join + union)
  */
object Search {

  /** T3/K5 helper: index-name normalization `{ds}_{env}` lowercased,
    * `-` → `_` (reference lambda-function.py:192-193). */
  def normalizeIndexName(name: Column): Column =
    lower(regexp_replace(name, "-", "_"))

  /** Index routing `data-{dataType}`, defaulting unknown
    * (reference index-data-lambda.py:158-159). */
  def indexNameFor(dataType: Column): Column =
    lower(concat(lit("data-"), coalesce(dataType, lit("unknown"))))

  /** T3: the explicit typed mapping of an index document — the
    * OpenSearch-mapping analog, declared instead of inferred. */
  val indexDocSchema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("dataType", StringType),
      StructField("source", StringType),
      StructField("s3Location", StringType),
      StructField("size_bytes", LongType)))),
    StructField("content", StructType(Seq(
      StructField("text", StringType)))),
    StructField("indexed_at", StringType)))

  /** P13: the reference's index-document assembly
    * `{metadata, content, indexed_at}` (index-data-lambda.py:150-155) as
    * one struct expression. `at` is explicit — verified queries must not
    * depend on wall-clock. */
  def buildIndexDoc(metadata: Column, content: Column,
                    at: String): Column =
    struct(metadata.as("metadata"), content.as("content"),
      lit(at).as("indexed_at"))

  /** A3: the ingest size metric — serialized-document byte length, the
    * reference's `len(json.dumps(data))` analog. Pure expression:
    * to_json is codegen'd. */
  def docSizeBytes(doc: Column): Column =
    octet_length(to_json(doc)).cast("long")

  /** (doc_id, token) pairs — the analyzed-text stream. `scaleOut`
    * parallelizes tokenization for single-split sources (no-op on an
    * already-parallel input); explode_outer + isNotNull instead of plain
    * explode so the optimizer's inferred size() filter can't re-inline
    * the tokenizer below the exchange (see Dedup.minhashSignatures). */
  def tokenStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.scaleOut(docs, col(idCol))
      .select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode_outer(col("toks")).as("token"))
      .filter(col("token").isNotNull)

  /** POSITIONAL analyzed token stream — (doc_id, pos, token), pos
    * 0-based within the document. The phrase-search input: same
    * tokenizer as [[tokenStream]], plus the ordinal that plain explode
    * drops. At 100 TB the position column adds 4-8 bytes per token to
    * the (map-side, pre-filter) stream — it never reaches a shuffle
    * unfiltered (see [[phraseMatches]]). */
  def posTokenStream(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    graft.scaleOut(docs, col(idCol))
      .select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        posexplode_outer(col("toks")).as(Seq("pos", "token")))
      .filter(col("token").isNotNull)

  /** T2: match_phrase — documents containing the EXACT adjacent-term
    * sequence, with per-document phrase frequency. The OpenSearch
    * `match_phrase` analog (reference README.md:26; index at
    * lambda-function.py:134-172): the repo's token stream is analyzed
    * the same way, so phrase semantics = consecutive positions.
    *
    * Shape, scale-first (anchor trick — no per-term self-joins):
    *  - the positional stream is filtered to the phrase's terms BEFORE
    *    any shuffle (literal isin, codegen'd);
    *  - each surviving (doc, pos, token) row fans out to the phrase
    *    RANKS that token occupies — via a literal token→ranks MAP
    *    expression (repeated phrase terms yield several ranks), so the
    *    fan-out is pure expression work, no join;
    *  - anchor = pos − rank: a phrase occurrence starting at position a
    *    puts ALL its ranks on anchor a, so one hash-aggregate on
    *    (doc, anchor) counting distinct ranks finds full matches —
    *    m-term phrases cost ONE shuffle of phrase-term rows only,
    *    never an m-way positional self-join;
    *  - phrase frequency = matching anchors per doc (second, tiny agg).
    *
    * Returns (idCol, phrase_tf), one row per matching document. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrase: String): DataFrame = {
    val terms = phrase.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(terms.size >= 2,
      s"match_phrase needs >= 2 terms, got '$phrase' — use matchTerm/rankBm25")
    val ranksByTerm: Map[String, Seq[Int]] =
      terms.zipWithIndex.groupBy(_._1).map { case (t, trs) =>
        t -> trs.map(_._2)
      }
    val rankMap: Column = map(ranksByTerm.toSeq.sortBy(_._1).flatMap {
      case (t, rs) => Seq(lit(t), array(rs.map(lit(_)): _*))
    }: _*)
    posTokenStream(docs, idCol, textCol)
      .filter(col("token").isin(ranksByTerm.keys.toSeq: _*))
      .select(col(idCol), col("pos"),
        explode(element_at(rankMap, col("token"))).as("rank"))
      .groupBy(col(idCol), (col("pos") - col("rank")).as("anchor"))
      .agg(countDistinct(col("rank")).as("hits"))
      .filter(col("hits") === terms.size)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("phrase_tf"))
  }

  /** T2: relevance-ranked phrase search — [[phraseMatches]] scored with
    * the BM25 arithmetic of [[rankBm25]], treating the WHOLE phrase as
    * one term (Lucene PhraseQuery semantics: tf = phrase frequency,
    * df = number of documents containing the phrase). Doc length /
    * avgdl / N are the same broadcast one-row frames as rankBm25; the
    * phrase df reduces to one row (count of matching docs), broadcast.
    * Rounded (4 dp) score drives the ordering, doc id tie-breaks;
    * orderBy+limit → TakeOrderedAndProject, never a global sort.
    *
    * Returns (idCol, score, phrase_tf), top `k`. */
  def rankPhrase(docs: DataFrame, idCol: String, textCol: String,
                 phrase: String, k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankAsOneTerm(docs, idCol, textCol,
      phraseMatches(docs, idCol, textCol, phrase), "phrase_tf", k, k1, b)

  /** THE BM25 per-term weight — every scorer in this library and in
    * [[graft.sources.SearchIndex]] builds this exact expression tree
    * (same operand order, so the floating-point result is
    * bit-identical across paths):
    *   ln(1 + (N − df + 0.5)/(df + 0.5)) · tf·(k1+1) /
    *     (tf + k1·(1 − b + b·dl/avgdl)) */
  private[graft] def bm25Weight(tf: Column, dl: Column, df: Column,
                                n: Column, avgdl: Column,
                                k1: Double, b: Double): Column =
    log(lit(1.0) + (n - df + 0.5) / (df + 0.5)) * tf * (lit(k1) + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))

  /** BM25 scoring of a (idCol, tfCol) hit frame as if the whole match
    * were ONE term (Lucene PhraseQuery/SpanQuery scoring: tf = match
    * frequency, df = matching-doc count — one broadcast row). Shared by
    * [[rankPhrase]] and [[rankNear]] so their arithmetic cannot
    * diverge. */
  private def rankAsOneTerm(docs: DataFrame, idCol: String,
                            textCol: String, hits: DataFrame,
                            tfCol: String, k: Int, k1: Double,
                            b: Double): DataFrame = {
    // one tokenize pass covers BOTH corpus stats; the doc-length join
    // keeps its own pass (hits carries no dl — the phrase kernel's
    // output), so this path is two passes, not three
    val stats = broadcast(docs.agg(count(lit(1)).as("n"),
      avg(size(Text.tokens(col(textCol))).cast("long")).as("avgdl")))
    val docLen = docLengths(docs, idCol, textCol)
    val dfp = hits.agg(count(lit(1)).as("df"))
    hits.join(docLen, idCol)
      .crossJoin(broadcast(dfp))
      .crossJoin(stats)
      .withColumn("score", round(bm25Weight(col(tfCol), col("dl"),
        col("df"), col("n"), col("avgdl"), k1, b), 4))
      .select(col(idCol), col("score"), col(tfCol))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** T2: SPAN-NEAR (in-order sloppy phrase) — documents where the
    * phrase terms appear IN ORDER within a window of `terms.size - 1 +
    * slop` positions; slop 0 degenerates to the exact phrase. Span
    * count (the Lucene SpanNearQuery frequency analog) is defined
    * head-anchored: the number of distinct occurrences q₀ of the FIRST
    * term from which an in-order chain q₀ < q₁ < … < q_{m−1} of the
    * remaining terms exists with q_{m−1} − q₀ ≤ m−1+slop. The chain is
    * found GREEDILY — each next position is the smallest one past the
    * current — which is exact for this definition (picking the
    * smallest next position minimizes the chain end, by exchange), and
    * being deterministic arithmetic any engine replays it bit-for-bit.
    *
    * Shape, scale-first: the positional stream is filtered to the
    * phrase's terms BEFORE its one shuffle (same posture as
    * [[phraseMatches]]); per-doc state is the matched terms' position
    * arrays (bounded by those terms' tf), and the chain walk is a
    * nested higher-order `filter`/`array_min` over them — map-side,
    * codegen-friendly, no positional self-joins. Worst case per doc is
    * O(tf₀ · Σᵣ tfᵣ) array scans; for the pathological
    * stopword-phrase case a per-doc merge scan would be O(Σ tf), but
    * the HOF form wins everywhere short of that and keeps the plan
    * free of explode-again joins.
    *
    * Returns (idCol, span_tf), one row per matching document. */
  def spanNearMatches(docs: DataFrame, idCol: String, textCol: String,
                      phrase: String, slop: Int): DataFrame = {
    val terms = parseSpanTerms(phrase, slop)
    val perTerm = posTokenStream(docs, idCol, textCol)
      .filter(col("token").isin(terms.distinct: _*))
      .groupBy(col(idCol), col("token"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    spanFromPerTerm(perTerm, idCol, terms, slop)
  }

  private[graft] def parseSpanTerms(phrase: String,
                                    slop: Int): Seq[String] = {
    val terms = phrase.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(terms.size >= 2,
      s"span_near needs >= 2 terms, got '$phrase' — use matchTerm/rankBm25")
    require(slop >= 0, "slop must be >= 0")
    terms
  }

  /** The greedy span-chain walk over an already-materialized
    * per-(doc, token) SORTED position-array frame (idCol, token, ps) —
    * shared by the corpus pass above and the positional-index serving
    * path ([[graft.sources.SearchIndex.searchNear]]), so the two
    * cannot diverge. */
  private[graft] def spanFromPerTerm(perTerm: DataFrame, idCol: String,
                                     terms: Seq[String],
                                     slop: Int): DataFrame = {
    val distinctTerms = terms.distinct
    val perDoc = perTerm.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("token"), col("ps"))))
        .as("tp"))
      .filter(size(col("tp")) === distinctTerms.size)
    val bound = lit(terms.size - 1 + slop)
    val starts = element_at(col("tp"), lit(terms.head))
    val spanOk: Column => Column = p0 => {
      val end = terms.indices.tail.foldLeft(p0)((cur, r) =>
        array_min(filter(element_at(col("tp"), lit(terms(r))),
          x => x > cur)))
      end.isNotNull && (end - p0) <= bound
    }
    perDoc
      .select(col(idCol),
        size(filter(starts, spanOk)).cast("long").as("span_tf"))
      .filter(col("span_tf") > 0)
  }

  /** T2: relevance-ranked span-near search — [[spanNearMatches]] scored
    * with the single-term BM25 arithmetic of [[rankPhrase]] (tf = span
    * frequency, df = span-matching doc count). Returns (idCol, score,
    * span_tf), top `k`. */
  def rankNear(docs: DataFrame, idCol: String, textCol: String,
               phrase: String, slop: Int, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankAsOneTerm(docs, idCol, textCol,
      spanNearMatches(docs, idCol, textCol, phrase, slop), "span_tf",
      k, k1, b)

  /** T2: fuzzy term match (edit distance ≤ `maxEdits`) — the OpenSearch
    * `match` fuzziness analog (reference README.md:26): a typo'd query
    * term retrieves documents containing any vocabulary token within
    * `maxEdits` Levenshtein edits.
    *
    * Shape, scale-first — never query-terms × vocabulary, and never a
    * vocabulary shuffle:
    *  - candidate filtering runs on the exploded token stream BEFORE
    *    any shuffle: a cheap length-window predicate
    *    (|len(token) − len(term)| ≤ maxEdits — sound: each edit changes
    *    length by at most 1) guards the `levenshtein()` call, both
    *    codegen'd map-side expressions;
    *  - only surviving candidate rows reach the (doc, token) postings
    *    aggregation — the shuffle carries matched-variant rows only;
    *  - per-variant distance is recomputed on the ≤|variants| postings
    *    frame (tiny) to weight the score.
    *
    * Score = Σ_variants tf · (maxEdits + 1 − dist): exact hits weigh
    * full, each edit steps the weight down — integer arithmetic,
    * bit-exact across engines. `matched` = distinct variant tokens in
    * the doc. Returns (idCol, score, matched), top `k`, score desc /
    * id asc. */
  def matchFuzzy(docs: DataFrame, idCol: String, textCol: String,
                 term: String, k: Int, maxEdits: Int = 2): DataFrame = {
    val q = term.toLowerCase
    require(q.nonEmpty && !q.exists(_.isWhitespace),
      s"fuzzy match takes ONE term, got '$term' — use rankBm25 for multi-term")
    val cand = tokenStream(docs, idCol, textCol)
      .filter(
        abs(length(col("token")) - lit(q.length)) <= maxEdits &&
          levenshtein(col("token"), lit(q)) <= maxEdits)
    cand.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dist", levenshtein(col("token"), lit(q)))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * (lit(maxEdits + 1) - col("dist"))).as("score"),
        count(lit(1)).as("matched"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Term frequencies per document: the inverted-index postings list.
    * One hash-aggregate shuffle on (token, doc) — partial aggregation
    * (map-side combine) does the heavy lifting before the exchange. */
  def invertedIndex(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    tokenStream(docs, idCol, textCol)
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Corpus term counts (document frequency + collection frequency). */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenStream(docs, idCol, textCol)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cf"),
           countDistinct(col(idCol)).as("df"))

  /** Per-document analyzed length — (idCol, dl) — computed MAP-SIDE as
    * `size(tokens(text))`: bit-identical to counting the exploded
    * stream (split never yields nulls; "" counts in both), but with no
    * explode, no shuffle, and no aggregation. The BM25 family uses
    * this for dl and avgdl; before this, each scorer paid 2 extra
    * tokenize+shuffle+agg passes over the corpus for lengths alone.
    * (null text → null dl, which avg() skips — same aggregate the old
    * explode path produced by dropping those docs.) */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(Text.tokens(col(textCol))).cast("long").as("dl"))

  /** T1: match_all — trivial scan. */
  def matchAll(index: DataFrame): DataFrame = index

  /** T2: full-text term match — substring/word predicate over the text
    * column; pushes down as a parquet string predicate. */
  def matchTerm(docs: DataFrame, textCol: String, term: String): DataFrame =
    docs.filter(col(textCol).contains(term))

  /** Term-frequency relevance ranking for a single term: deterministic
    * (length - length(remove)) / len(term) tf, descending. */
  def rankByTf(docs: DataFrame, idCol: String, textCol: String,
               term: String, k: Int): DataFrame =
    docs.withColumn("tf", Text.occ(col(textCol), term))
      .filter(col("tf") > 0)
      .orderBy(col("tf").desc, col(idCol).asc)
      .limit(k)

  /** T2: relevance-ranked multi-term search — the reference's analyzed
    * OpenSearch `match` query with scoring (reference README.md:26;
    * index built at lambda-function.py:134-172), re-expressed as BM25
    * over the same analyzed token stream the inverted index uses.
    *
    * Shape, scale-first:
    *  - the query's terms become an `isin` literal filter applied to
    *    the exploded token stream BEFORE any shuffle — the postings
    *    aggregation only ever carries query-term rows;
    *  - document lengths are one hash-aggregate over the stream (the
    *    same shuffle an index build pays); avgdl and N reduce to
    *    1-row frames, broadcast;
    *  - per-term df comes from the already-tiny postings frame
    *    (≤ |terms| rows after its groupBy), broadcast back;
    *  - final ranking is orderBy+limit → TakeOrderedAndProject, never
    *    a global sort.
    *
    * Scoring is textbook Robertson/Lucene BM25:
    *   idf = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   s   = Σ_terms idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * The score is rounded (4 dp) and the rounded value drives the
    * ordering, so a sub-ulp engine difference cannot reorder the
    * top-k (doc id tie-breaks equal rounded scores).
    *
    * `requireAll` = the reference `match` operator=and: only documents
    * containing EVERY query term rank (filter on matched = |terms| —
    * applied after the per-doc aggregation, before top-k).
    *
    * Returns (idCol, score, matched) — matched = how many distinct
    * query terms hit the document. */
  def rankBm25(docs: DataFrame, idCol: String, textCol: String,
               query: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               requireAll: Boolean = false): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "BM25 query needs at least one term")
    val (tf, stats) = termPostings(docs, idCol, textCol, terms)
    val df = tf.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    tf.join(broadcast(df), "token")
      .crossJoin(stats)
      .withColumn("_s", bm25Weight(col("tf"), col("dl"), col("df"),
        col("n"), col("avgdl"), k1, b))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")), 4).as("score"),
        count(lit(1)).as("matched"))
      .filter(if (requireAll) col("matched") === terms.size else lit(true))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** The corpus-side BM25 input shape every variant shares: ONE corpus
    * tokenization feeds the term-filtered postings AND each posting's
    * doc length (dl is functionally determined by the id, so it rides
    * the (id, token) aggregation for free — the SearchIndex.indexRows
    * move, which also deletes the corpus-sized doc-length join), and a
    * second single pass covers both corpus stats. The naive layout
    * tokenized the corpus four times per query (tf once per consumer,
    * doc lengths once per consumer); the postings frame persists via
    * [[graft.CacheScope]] (query-term-postings sized, bounded at any
    * corpus scale; released at the caller's operation boundary).
    * Returns (tf = (idCol, dl, token, tf), broadcast 1-row (n, avgdl)). */
  private def termPostings(docs: DataFrame, idCol: String,
                           textCol: String, terms: Seq[String])
      : (DataFrame, DataFrame) =
    prunedTermPostings(docs, idCol, textCol,
      _.filter(col("token").isin(terms: _*)))

  /** [[termPostings]] with a caller-supplied pre-shuffle prune (the
    * batch path's term set is a frame, not literals). */
  private def prunedTermPostings(docs: DataFrame, idCol: String,
                                 textCol: String,
                                 prune: DataFrame => DataFrame)
      : (DataFrame, DataFrame) = {
    val analyzed = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), size(col("toks")).cast("long").as("dl"),
        explode_outer(col("toks")).as("token"))
      .filter(col("token").isNotNull)
    val tf = graft.CacheScope.persist(prune(analyzed)
      .groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf")))
    val stats = broadcast(docs.agg(count(lit(1)).as("n"),
      avg(size(Text.tokens(col(textCol))).cast("long")).as("avgdl")))
    (tf, stats)
  }

  /** T2: SYNONYM-EXPANDED match — the OpenSearch `synonym_graph`
    * query-time filter scored with Lucene SynonymQuery semantics: each
    * original query term and its synonyms form ONE concept, scored as
    * a single BM25 term whose tf is the summed occurrences of ALL
    * variants and whose df counts documents containing ANY variant —
    * so expanding a query can only broaden recall, never double-count
    * a concept's idf (the failure mode of naively OR-ing variants as
    * independent terms).
    *
    * Shape: identical to [[rankBm25]] except the pre-shuffle stream
    * filter admits every variant and a literal variant→concepts map
    * (a shared synonym token maps to each of its concepts) rewrites
    * tokens before the postings aggregation — still one shuffle of
    * matched-variant rows only.
    *
    * Returns (idCol, score, matched) — matched = distinct concepts
    * present in the document. */
  def rankBm25Synonyms(docs: DataFrame, idCol: String, textCol: String,
                       query: String,
                       synonyms: Map[String, Seq[String]], k: Int,
                       k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq
    require(terms.nonEmpty, "BM25 query needs at least one term")
    // keys normalize like the query terms they must match — a
    // mixed-case key would otherwise silently disable its expansion
    val syn = synonyms.map { case (t, vs) => t.toLowerCase -> vs }
    val groups: Seq[(String, Seq[String])] = terms.map(t =>
      t -> (t +: syn.getOrElse(t, Nil).map(_.toLowerCase)).distinct)
    val variantToConcepts: Seq[(String, Seq[String])] = groups
      .flatMap { case (c, vs) => vs.map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toSeq
      .sortBy(_._1)
    val conceptMap: Column = map(variantToConcepts.flatMap {
      case (v, cs) => Seq(lit(v), array(cs.map(lit(_)): _*))
    }: _*)
    val variants = variantToConcepts.map(_._1)
    // [[termPostings]]' four-passes-to-two shape, with the
    // variant→concept rewrite between the stream filter and the
    // postings aggregation; the concept postings persist across the
    // df aggregate and the score join
    val (vtf, stats) = termPostings(docs, idCol, textCol, variants)
    val tf = graft.CacheScope.persist(vtf
      .select(col(idCol), col("dl"), col("tf"),
        explode(element_at(conceptMap, col("token"))).as("concept"))
      .groupBy(col(idCol), col("dl"), col("concept"))
      .agg(sum(col("tf")).as("tf")))
    val df = tf.groupBy(col("concept"))
      .agg(countDistinct(col(idCol)).as("df"))
    tf.join(broadcast(df), "concept")
      .crossJoin(stats)
      .withColumn("_s", bm25Weight(col("tf"), col("dl"), col("df"),
        col("n"), col("avgdl"), k1, b))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")), 4).as("score"),
        count(lit(1)).as("matched"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** T2: BOOL query — the OpenSearch compound `bool` analog
    * (must / should / must_not; reference README.md:26 — the query DSL
    * tier above the analyzed `match`): a document ranks iff it
    * contains EVERY `must` term and NO `mustNot` term; both `must` and
    * `should` terms contribute BM25 score (identical arithmetic to
    * [[rankBm25]], ES semantics: should-clauses only boost).
    *
    * Shape, scale-first: ONE pass over the token stream filtered to
    * must ∪ should ∪ mustNot BEFORE any shuffle; the postings frame
    * then splits — banned doc ids (≤ docs containing a mustNot term)
    * anti-join the scored side, the must-coverage gate is a per-doc
    * indicator sum on the already-aggregated frame. No second corpus
    * pass, no cartesian anything.
    *
    * Returns (idCol, score, matched), top `k` — matched counts
    * distinct scoring terms present. */
  def searchBool(docs: DataFrame, idCol: String, textCol: String,
                 must: Seq[String], should: Seq[String],
                 mustNot: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val mustT = must.map(_.toLowerCase).distinct
    val shouldT = should.map(_.toLowerCase).distinct
      .filterNot(mustT.contains)
    val notT = mustNot.map(_.toLowerCase).distinct
    val scoreT = mustT ++ shouldT
    require(scoreT.nonEmpty, "bool query needs a must or should term")
    require(notT.intersect(scoreT).isEmpty,
      "a term cannot be both required/optional and excluded")
    // [[termPostings]] persists tf across its THREE consumers here
    // (banned ids, df aggregate, score join)
    val (tf, stats) = termPostings(docs, idCol, textCol, scoreT ++ notT)
    val banned = tf.filter(col("token").isin(notT: _*))
      .select(col(idCol)).distinct()
    val scoreTf = tf.filter(col("token").isin(scoreT: _*))
    val df = scoreTf.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    scoreTf.join(broadcast(df), "token")
      .crossJoin(stats)
      .withColumn("_s", bm25Weight(col("tf"), col("dl"), col("df"),
        col("n"), col("avgdl"), k1, b))
      .withColumn("_m",
        when(col("token").isin(mustT: _*), lit(1L)).otherwise(lit(0L)))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")), 4).as("score"),
        count(lit(1)).as("matched"), sum(col("_m")).as("_mm"))
      .filter(col("_mm") === mustT.size).drop("_mm")
      .join(banned, Seq(idCol), "left_anti")
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** T2/A1: FACETED search — the OpenSearch `aggs` analog: the terms
    * aggregation runs over ALL matching documents (not the top-k page),
    * here per `facetCol` with doc counts, total matched-term count and
    * the best per-doc BM25 score in the facet. Scoring is [[rankBm25]]
    * without the top-k (the facet rollup replaces it): same one-pass
    * term-filtered stream, same broadcasts; the extra cost over a
    * search is one facet-keyed hash aggregate. Facet metrics are
    * chosen order-independent (count/sum of longs, max of the ROUNDED
    * per-doc score) so the result is engine-replayable. */
  def facetedSearch(docs: DataFrame, idCol: String, textCol: String,
                    query: String, facetCol: String,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(docs, idCol, textCol, query, k1, b)
      .join(docs.select(col(idCol), col(facetCol)), idCol)
      .groupBy(col(facetCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("matched")).as("matched_terms"),
        max(col("score")).as("top_score"))
      .orderBy(col(facetCol).asc)

  /** The all-matching-docs BM25 frame (idCol, score, matched) —
    * [[rankBm25]] without the top-k — shared by the facet family. */
  private def bm25Scored(docs: DataFrame, idCol: String,
                         textCol: String, query: String, k1: Double,
                         b: Double): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq
    require(terms.nonEmpty, "faceted search needs at least one term")
    val (tf, stats) = termPostings(docs, idCol, textCol, terms)
    val df = tf.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    tf.join(broadcast(df), "token")
      .crossJoin(stats)
      .withColumn("_s", bm25Weight(col("tf"), col("dl"), col("df"),
        col("n"), col("avgdl"), k1, b))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")), 4).as("score"),
        count(lit(1)).as("matched"))
  }

  /** T2/A1: `top_hits` SUB-AGGREGATION — the OpenSearch `aggs` +
    * `top_hits` combination [[facetedSearch]]'s summary metrics can't
    * answer: the actual top `kPerBucket` matching DOCUMENTS inside
    * each facet bucket. The per-bucket top-k runs through the
    * TopKPerGroup bounded-heap plan (O(n log k) heaps, no per-bucket
    * sort or window spill — the same operator the batch-ANN path
    * uses), so bucket skew (one hot facet value holding most matches)
    * costs a heap insert, never a partition sort. Returns
    * (facetCol, idCol, score, matched), buckets ascending, hits by
    * (score desc, id asc) within each. */
  def facetTopHits(docs: DataFrame, idCol: String, textCol: String,
                   query: String, facetCol: String, kPerBucket: Int,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(kPerBucket >= 1, "kPerBucket must be >= 1")
    val withFacet = bm25Scored(docs, idCol, textCol, query, k1, b)
      .join(docs.select(col(idCol), col(facetCol)), idCol)
      .select(col(facetCol), col(idCol), col("score"), col("matched"))
    graft.plans.TopK.perGroup(withFacet, Seq(facetCol),
        Seq(graft.plans.TopK.desc("score"),
          graft.plans.TopK.asc(idCol)), kPerBucket)
      .orderBy(col(facetCol).asc, col("score").desc, col(idCol).asc)
  }

  /** T2/A1: HISTOGRAM AGGREGATION — the ES `histogram` agg over a
    * numeric document field, restricted to the query's matches:
    * bucket = floor(field / width) · width, per bucket the match
    * count and best rounded BM25 score. Same one term-filtered pass
    * as [[facetedSearch]]; the bucketing is a map-side expression, so
    * the extra cost over a terms facet is zero. `date_histogram` is
    * this exact shape with a time column bucketed by
    * `width`-second/day arithmetic. */
  def histogramFacet(docs: DataFrame, idCol: String, textCol: String,
                     query: String, numCol: String, width: Long,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(width >= 1, "histogram width must be >= 1")
    bm25Scored(docs, idCol, textCol, query, k1, b)
      .join(docs.select(col(idCol), col(numCol)), idCol)
      // ES histogram semantics: docs missing the field are skipped,
      // never pooled into a phantom NULL bucket
      .filter(col(numCol).isNotNull)
      .groupBy((floor(col(numCol) / width) * width).cast("long")
        .as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("score")).as("top_score"))
      .orderBy(col("bucket").asc)
  }

  /** T2/X12: BATCH BM25 — score a whole frame of queries against the
    * corpus in ONE pass over the token stream, the search twin of the
    * batch-ANN shape (q82): per-query scans would pay |queries| corpus
    * passes; here the union of all query terms semi-join-filters the
    * exploded stream once (broadcast — the query frame is small by
    * construction), the per-(doc, token) postings fan out to the
    * queries mentioning each token via a second broadcast join, and
    * the per-query top-k runs through the bounded-heap TopKPerGroup
    * operator — no global sort, no per-query window over the corpus.
    * Scoring and rounding exactly as [[rankBm25]].
    *
    * `queries` must have (queryIdCol, queryTextCol) and be SMALL —
    * its distinct term union is broadcast (thousands of queries are
    * fine; a corpus-sized query frame belongs in a join-based design,
    * not this operator).
    *
    * `requireAll` = the reference `match` operator=and, per query: a
    * document ranks for query q only when it contains EVERY distinct
    * term of q — filter on matched = |terms(q)| (the per-query term
    * count is a ≤|queries|-row broadcast), applied after the per-
    * (query, doc) aggregation and BEFORE the top-k heaps, so heap
    * slots never go to partial matches. Mirrors [[rankBm25]].
    *
    * Returns (queryIdCol, idCol, score, matched),
    * k rows per query, ordered (queryId asc, score desc, id asc). */
  def rankBm25Batch(docs: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, queryIdCol: String,
                    queryTextCol: String, k: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    requireAll: Boolean = false): DataFrame = {
    val qToks = queries.select(col(queryIdCol),
        explode(array_distinct(Text.tokens(col(queryTextCol))))
          .as("token"))
      .filter(col("token") =!= "")
    // the shared four-passes-to-two postings shape, pruned by the
    // batch's distinct query-term frame instead of literals
    val (tf, stats) = prunedTermPostings(docs, idCol, textCol,
      _.join(broadcast(qToks.select("token").distinct()),
        Seq("token"), "left_semi"))
    val df = tf.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    val scored = tf
      .join(broadcast(qToks), "token")
      .join(broadcast(df), "token")
      .crossJoin(stats)
      .withColumn("_s",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("_s")), 4).as("score"),
        count(lit(1)).as("matched"))
    val gated =
      if (!requireAll) scored
      else {
        val qn = qToks.groupBy(col(queryIdCol))
          .agg(count(lit(1)).as("_qn")) // qToks is distinct per query
        scored.join(broadcast(qn), queryIdCol)
          .filter(col("matched") === col("_qn"))
          .drop("_qn")
      }
    graft.plans.TopK.perGroup(gated, Seq(queryIdCol),
        Seq(graft.plans.TopK.desc("score"), graft.plans.TopK.asc(idCol)), k)
      .orderBy(col(queryIdCol).asc, col("score").desc, col(idCol).asc)
  }

  /** K5: bulk index build — positional _id like the reference's bulk
    * body (row ordinal), made deterministic with an explicit total
    * order, WITHOUT a global single-partition window. Shape:
    * range-repartition on the order column (so partition i holds keys
    * strictly below partition i+1), number rows within each partition,
    * then add per-partition cumulative offsets. The offset table has one
    * row per partition — the only global ordering pass runs over ~10²
    * rows, and the corpus itself never funnels through one task. At
    * scale still prefer the carried document id (T4) when positional ids
    * are not strictly required. */
  def bulkIndex(docs: DataFrame, orderCol: String): DataFrame = {
    val parted = docs.repartitionByRange(col(orderCol).asc)
      .withColumn("_pid", spark_partition_id())
    val offsets = parted.groupBy("_pid")
      .agg(count(lit(1)).as("_n"))
      // one row per source partition (~10²-10⁵ rows even at 100 TB):
      // coalesce(1) makes the global-order window's single task explicit
      // and reports SinglePartition, so the planner adds no exchange and
      // WindowExec's "all data to a single partition" warning refers to
      // this bounded offsets frame, never the corpus.
      .coalesce(1)
      .withColumn("_offset",
        coalesce(sum("_n").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    val local = Window.partitionBy("_pid").orderBy(col(orderCol).asc)
    parted.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_id",
        row_number().over(local).cast("long") + col("_offset"))
      .drop("_pid", "_offset")
  }

  /** Rank 1..n of a BOUNDED top-k frame without a window: rank(row) =
    * 1 + |rows strictly better|, computed as a conditional sum over a
    * broadcast self-product. The input is always a `limit k` result
    * (k ≤ ~10²), so the nested-loop product is k² ≤ 10⁴ rows of pure
    * expression work — constant at any corpus size — and the registry's
    * no-single-partition-window audit keeps holding (a bare
    * `row_number().over(orderBy)` would funnel through
    * Exchange SinglePartition). Ties cannot occur: callers order by
    * (score, id) and id is unique. */
  private def withRank(topk: DataFrame, idCol: String,
                       scoreCol: String): DataFrame = {
    val other = topk.select(col(idCol).as("_oid"), col(scoreCol).as("_os"))
    topk.crossJoin(broadcast(other))
      .groupBy(col(idCol), col(scoreCol))
      .agg((sum(when(col("_os") > col(scoreCol) ||
          (col("_os") === col(scoreCol) && col("_oid") < col(idCol)), 1L)
        .otherwise(0L)) + 1L).as("rank"))
  }

  /** T2/X3: HYBRID RETRIEVAL — reciprocal-rank fusion (RRF, Cormack et
    * al. 2009; the OpenSearch/Elasticsearch `rrf` retriever) of a
    * sparse BM25 leg and a dense cosine-ANN leg over the same corpus:
    *
    *   rrf(d) = Σ_legs 1 / (rrfK + rank_leg(d)),   missing leg → 0
    *
    * Shape, scale-first: each leg is its own top-`kEach` pipeline
    * ([[rankBm25]]: term-filtered postings, broadcast stats,
    * TakeOrderedAndProject; `Similarity.bruteForceTopK`: broadcast
    * query vector, map-side cosine, TakeOrderedAndProject) — the
    * fusion itself then touches ONLY the two ≤kEach-row results:
    * bounded rank join ([[withRank]]), one tiny full-outer join on the
    * doc id, one TakeOrderedAndProject. Corpus cost = the two legs,
    * fusion cost = O(kEach²) constant. At 100 TB serve the sparse leg
    * from the materialized [[graft.sources.SearchIndex]] and the dense
    * leg from IVF-PQ — same fusion, same contract.
    *
    * Returns (idCol, rrf, sparse_rank, dense_rank), top `k` by
    * (rrf desc, id asc); a leg's rank is NULL when the doc is outside
    * that leg's top-kEach. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, idCol: String,
                textCol: String, vecIdCol: String, vecCol: String,
                query: String, queryVecId: Long, k: Int,
                kEach: Int = 20, rrfK: Int = 60,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    rrfFuse(
      rankBm25(docs, idCol, textCol, query, kEach, k1, b)
        .select(col(idCol), col("score")),
      Similarity.bruteForceTopK(emb, vecIdCol, vecCol, queryVecId, kEach)
        .select(col(vecIdCol), col("cosine")),
      idCol, vecIdCol, idCol, k, rrfK)
  }

  /** RRF fusion of two ALREADY-RETRIEVED legs — `sparse` = (sparseIdCol,
    * score), `dense` = (denseIdCol, cosine), each a ≤kEach-row top-k
    * frame from any retriever (corpus-pass [[rankBm25]] /
    * `bruteForceTopK`, or the served [[graft.sources.SearchIndex]] /
    * [[graft.sources.VectorIndex]] paths — the fusion is retriever-
    * agnostic, which is why it is factored out). The legs' SCORE
    * columns are parameters too (defaults match the library's own
    * retrievers), so an external retriever with its own naming fuses
    * without a rename — and a missing column fails fast with a clear
    * message instead of an unrelated analysis error. Ranks come from
    * the k²-broadcast [[withRank]] product (constant at any corpus
    * size), fused full-outer as Σ 1/(rrfK + rank) with 0 for a missing
    * leg. Returns (outIdCol, rrf, sparse_rank, dense_rank), top `k` by
    * (rrf desc, id asc); rrf rounded 6 dp. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, sparseIdCol: String,
              denseIdCol: String, outIdCol: String, k: Int,
              rrfK: Int = 60, sparseScoreCol: String = "score",
              denseScoreCol: String = "cosine"): DataFrame = {
    Seq((sparse, "sparse", sparseIdCol, sparseScoreCol),
      (dense, "dense", denseIdCol, denseScoreCol)).foreach {
      case (leg, name, id, score) => Seq(id, score).foreach(c =>
        require(leg.columns.contains(c),
          s"rrfFuse $name leg has no '$c' column " +
            s"(columns: ${leg.columns.mkString(", ")}) — pass the " +
            "right idCol/scoreCol for this retriever"))
    }
    val s = withRank(sparse, sparseIdCol, sparseScoreCol)
      .select(col(sparseIdCol).as("_id"), col("rank").as("sparse_rank"))
    val d = withRank(dense, denseIdCol, denseScoreCol)
      .select(col(denseIdCol).as("_id"), col("rank").as("dense_rank"))
    s.join(d, Seq("_id"), "full_outer")
      .select(col("_id").as(outIdCol),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("sparse_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)),
          6).as("rrf"),
        col("sparse_rank"), col("dense_rank"))
      .orderBy(col("rrf").desc, col(outIdCol).asc)
      .limit(k)
  }

  /** T2/X3: RESCORE — the Elasticsearch `rescore` API: a cheap first
    * pass retrieves a top-`windowN` candidate window (BM25), then an
    * expensive secondary signal re-scores ONLY that window — here the
    * cosine of each candidate's embedding to a query vector:
    *
    *   combined = queryWeight·bm25 + rescoreWeight·cosine
    *
    * Shape, scale-first: the corpus pays exactly the [[rankBm25]] cost;
    * the rescore pass is a broadcast hash join of the ≤windowN-row
    * window against the embeddings table (point lookups on the id) plus
    * a broadcast 1-row query vector — the expensive signal is evaluated
    * windowN times, never corpus-wide. This is the two-phase shape that
    * makes cross-encoder-style reranking affordable at 100 TB.
    *
    * Returns (idCol, combined, score, cosine), top `k` by
    * (combined desc, id asc); combined and cosine rounded 6 dp. */
  def rescore(docs: DataFrame, emb: DataFrame, idCol: String,
              textCol: String, vecIdCol: String, vecCol: String,
              query: String, queryVecId: Long, windowN: Int, k: Int,
              queryWeight: Double = 1.0,
              rescoreWeight: Double = 1.0): DataFrame = {
    import graft.functions.Vectors
    val window = rankBm25(docs, idCol, textCol, query, windowN)
      .select(col(idCol), col("score"))
    val qv = broadcast(emb.filter(col(vecIdCol) === queryVecId)
      .select(Vectors.toDouble(col(vecCol)).as("_qv")))
    emb.select(col(vecIdCol).as(idCol),
        Vectors.toDouble(col(vecCol)).as("_v"))
      .join(broadcast(window), Seq(idCol))
      .crossJoin(qv)
      .withColumn("cosine", Vectors.cosine(col("_v"), col("_qv")))
      .select(col(idCol),
        round(lit(queryWeight) * col("score") +
          lit(rescoreWeight) * col("cosine"), 6).as("combined"),
        col("score"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("combined").desc, col(idCol).asc)
      .limit(k)
  }

  /** T2: MORE-LIKE-THIS — the Elasticsearch `more_like_this` query:
    * select the seed document's most characteristic terms by tf·idf,
    * then BM25-rank the rest of the corpus against them.
    *
    * Shape, scale-first — every corpus-wide aggregation is bounded by
    * the SEED's vocabulary, never the corpus's:
    *  - seed term frequencies: pushed-down point filter on the seed id
    *    (one document's tokens);
    *  - document frequencies: the token stream is broadcast-semi-joined
    *    to the seed's distinct tokens BEFORE the df aggregation, so the
    *    shuffle carries only seed-vocabulary rows (mirrors the
    *    [[rankBm25Batch]] term-filter contract);
    *  - term selection: round(tf·idf, 4) desc / token asc, `limit
    *    mTerms` → TakeOrderedAndProject over a ≤|seed vocab| frame
    *    (the rounding makes engine tie-order deterministic);
    *  - scoring: identical arithmetic to [[rankBm25]] with the selected
    *    terms' already-computed df rejoined by broadcast; the seed
    *    itself is excluded from the ranking.
    *
    * Returns (idCol, score, matched), top `k`. */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
                   seedId: Long, mTerms: Int, k: Int,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokenStream(docs, idCol, textCol)
    val n = docs.agg(count(lit(1)).as("n"))
    val seedTf = toks.filter(col(idCol) === seedId)
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val df = toks
      .join(broadcast(seedTf.select("token")), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    val sel = seedTf.join(broadcast(df), "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf"), 4))
      .orderBy(col("tfidf").desc, col("token").asc)
      .limit(mTerms)
      .select(col("token"), col("df"))
    val docLen = docLengths(docs, idCol, textCol)
    val avgdl = docLen.agg(avg(col("dl")).as("avgdl"))
    val tf = toks
      .join(broadcast(sel.select("token")), Seq("token"), "left_semi")
      .filter(col(idCol) =!= seedId)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(sel), "token")
      .join(docLen, idCol)
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(avgdl))
      .withColumn("_s",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")), 4).as("score"),
        count(lit(1)).as("matched"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** T2/A6: SIGNIFICANT TERMS — the Elasticsearch `significant_terms`
    * aggregation: terms over-represented in a FOREGROUND document set
    * (the `fgPred` rows) relative to the background corpus, scored by
    * the document-frequency proportion ratio
    *
    *   score = (fg_df / fg_total) / ((bg_df + 1) / (bg_total + 1))
    *
    * (+1-smoothed so a foreground-only term scores finite; the ratio is
    * ES's `percentage` heuristic shape). One distinct-(doc, token) pass
    * with the foreground flag computed BEFORE the explode (a per-doc
    * expression, no join), one hash-aggregate per token carrying a
    * conditional sum — fg and bg counted in the SAME aggregate, never
    * two corpus passes. Totals are a 1-row broadcast.
    *
    * Returns (token, fg_df, bg_df, score), top `k` by
    * (score desc, token asc), foreground support ≥ `minDocCount`. */
  def significantTerms(docs: DataFrame, idCol: String, textCol: String,
                       fgPred: Column, k: Int,
                       minDocCount: Int = 3): DataFrame = {
    val pairs = graft.scaleOut(docs, col(idCol))
      .select(col(idCol), fgPred.cast("long").as("fg"),
        explode_outer(Text.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull)
      .select(col(idCol), col("fg"), col("token"))
      .distinct()
    val totals = docs.agg(
      sum(fgPred.cast("long")).as("fg_total"),
      count(lit(1)).as("n"))
    pairs.groupBy(col("token"))
      .agg(sum(col("fg")).as("fg_df"), count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .withColumn("bg_df", col("df") - col("fg_df"))
      .filter(col("fg_df") >= minDocCount)
      .withColumn("score", round(
        (col("fg_df") / col("fg_total")) /
          ((col("bg_df") + lit(1.0)) / (col("n") - col("fg_total") + lit(1.0))),
        4))
      .select(col("token"), col("fg_df"), col("bg_df"), col("score"))
      .orderBy(col("score").desc, col("token").asc)
      .limit(k)
  }

  /** T2: HIGHLIGHTING — the search-hit snippet: for each document
    * matching any query term, the ±`window`-token context around the
    * FIRST match position (Lucene's unified highlighter's
    * first-passage default, token-granular).
    *
    * Shape, scale-first: the anchor pass filters the positional stream
    * to the query terms BEFORE its per-doc aggregation (the standard
    * search-family pre-shuffle contract), producing (doc, anchor,
    * hits); the snippet is then cut from the ORIGINAL text array with
    * `slice` after ONE hash join docs ⋈ anchors on the doc id — the
    * corpus is never re-exploded for context, and nothing positional
    * crosses a shuffle unfiltered.
    *
    * Returns (idCol, anchor, hits, snippet), first `k` docs by id. */
  def highlight(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], window: Int, k: Int): DataFrame = {
    val ts = terms.map(_.toLowerCase).distinct
    require(ts.nonEmpty, "highlight needs at least one term")
    val anchors = posTokenStream(docs, idCol, textCol)
      .filter(col("token").isin(ts: _*))
      .groupBy(col(idCol))
      .agg(min(col("pos")).as("anchor"), count(lit(1)).as("hits"))
    val start = greatest(col("anchor") - window, lit(0))
    docs.join(anchors, idCol)
      .withColumn("snippet", array_join(
        slice(Text.tokens(col(textCol)), start + 1,
          col("anchor") + window - start + 1), " "))
      // anchor is exposed as long (the positional int is slice-internal)
      .select(col(idCol), col("anchor").cast("long").as("anchor"),
        col("hits"), col("snippet"))
      .orderBy(col(idCol).asc)
      .limit(k)
  }

  /** T2: COMPLETION SUGGEST — the Elasticsearch completion/term
    * suggester over the analyzed vocabulary: tokens extending `prefix`,
    * ranked by collection frequency (ties alphabetical). The prefix
    * predicate sits directly on the exploded stream (codegen'd
    * `startswith`, pre-shuffle — only completions reach the
    * aggregation); at 100 TB serve the same query from the materialized
    * [[graft.sources.SearchIndex]] postings with a token-prefix range
    * scan. Returns (token, freq, docs), top `k`. */
  def suggest(docs: DataFrame, idCol: String, textCol: String,
              prefix: String, k: Int): DataFrame =
    tokenStream(docs, idCol, textCol)
      .filter(col("token").startsWith(prefix.toLowerCase))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"), countDistinct(col(idCol)).as("docs"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** T2: PERCOLATE — the Elasticsearch percolator, reversed search:
    * REGISTERED queries (a frame of (query_id, query_text)) are matched
    * against a document stream; a document matches a query when it
    * contains EVERY distinct term of it (`match` operator=and
    * semantics, the percolator's conjunctive core).
    *
    * Shape, scale-first — one corpus pass for ALL registered queries
    * (the percolator's whole point):
    *  - the (doc, token) stream is broadcast-semi-joined to the UNION
    *    of all query vocabularies before its distinct-pair aggregation
    *    (only query-vocabulary rows shuffle);
    *  - distinct pairs fan out to the queries mentioning the token
    *    (broadcast), one hash-aggregate counts matched terms per
    *    (query, doc), and the conjunctive gate compares against the
    *    per-query term count (≤|queries|-row broadcast) — exactly the
    *    [[rankBm25Batch]] requireAll bookkeeping without the scoring.
    *
    * Returns one row per query: (queryIdCol, n_matches, first_doc,
    * last_doc) — count + id range of matching documents (0/NULL when
    * none match), ordered by query id. */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, queryIdCol: String,
                queryTextCol: String): DataFrame = {
    val qToks = queries.select(col(queryIdCol),
        explode(array_distinct(Text.tokens(col(queryTextCol))))
          .as("token"))
      .filter(col("token") =!= "")
    val qn = qToks.groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("_qn"))
    val pairs = tokenStream(docs, idCol, textCol)
      .join(broadcast(qToks.select("token").distinct()),
        Seq("token"), "left_semi")
      .distinct()
    val matches = pairs.join(broadcast(qToks), "token")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("_m"))
      .join(broadcast(qn), Seq(queryIdCol))
      .filter(col("_m") === col("_qn"))
    matches.groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
      .join(qn.select(col(queryIdCol)), Seq(queryIdCol), "right_outer")
      .select(col(queryIdCol),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("first_doc"), col("last_doc"))
      .orderBy(col(queryIdCol).asc)
  }
}
