package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.Search
import graft.sources.{Manifest, SearchIndex}

/** The search-engine surface as native operators (SURVEY.md §2.10). */
object SearchQueries {

  val entries: Seq[QueryDef] = Seq(

    // ---- T2: tokenize + corpus term frequencies ------------------------
    QueryDef("q38_token_counts",
      (s, dir) => Search
        .tokenStream(Tables.load(s, dir, "documents"), "doc_id", "text")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(30),
      Some("""SELECT token, count(*) AS n FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS token
          FROM documents) t
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 30""")),

    // ---- T2/K5: inverted-index postings stats ---------------------------
    QueryDef("q39_inverted_postings",
      (s, dir) => Search
        .termStats(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("df").desc, col("token").asc)
        .limit(30),
      Some("""SELECT token, count(*) AS cf, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents) t
        GROUP BY token ORDER BY df DESC, token ASC LIMIT 30""")),

    // ---- T2: term match + tf relevance ranking ----------------------------
    QueryDef("q40_tf_rank",
      (s, dir) => Search.rankByTf(
        Tables.load(s, dir, "documents"), "doc_id", "text", "spark", 20)
        .select("doc_id", "tf"),
      Some("""SELECT doc_id, tf FROM (
          SELECT doc_id,
            CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' spark ', ''))) / 7
              AS BIGINT) AS tf
          FROM documents) t
        WHERE tf > 0 ORDER BY tf DESC, doc_id ASC LIMIT 20""")),

    // ---- T2: BM25 relevance-ranked multi-term search --------------------
    // The reference's scored OpenSearch `match` query (README.md:26,
    // lambda-function.py:134-172) as native BM25 over the analyzed
    // token stream. Ordering is on the ROUNDED score so a sub-ulp
    // ln/division difference between engines cannot flip the top-k.
    QueryDef("q144_bm25_search",
      (s, dir) => Search.rankBm25(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        "window merge scan", 15),
      Some("""WITH t AS (SELECT doc_id,
            unnest(string_split(lower(text), ' ')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf AS (SELECT doc_id, token, count(*) AS tf
          FROM t JOIN q USING (token) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1)
        SELECT tf.doc_id,
          round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
            * tf.tf * 2.2
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
            AS score,
          count(*) AS matched
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
          CROSS JOIN n CROSS JOIN s
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id ASC LIMIT 15""")),

    // ---- T2/X12: batch BM25 — K queries, one corpus pass, top-k per
    // query via the bounded-heap TopKPerGroup operator (no per-query
    // corpus scans, no window sort). df is GLOBAL per token (shared
    // across queries), identical to q144's arithmetic.
    QueryDef("q145_bm25_batch",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((1L, "window merge scan"), (2L, "spark query data"),
          (3L, "slow batch"))
          .toDF("query_id", "qtext")
        Search.rankBm25Batch(Tables.load(s, dir, "documents"),
          "doc_id", "text", qs, "query_id", "qtext", 10)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(string_split(lower(text), ' ')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        qs(query_id, qtext) AS (VALUES (1, 'window merge scan'),
          (2, 'spark query data'), (3, 'slow batch')),
        q AS (SELECT DISTINCT query_id,
            unnest(string_split(qtext, ' ')) AS token FROM qs),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM t
          WHERE token IN (SELECT token FROM q) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1),
        scored AS (SELECT q.query_id, tf.doc_id,
            round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
              AS score,
            count(*) AS matched
          FROM tf JOIN q USING (token) JOIN df USING (token)
            JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN s
          GROUP BY q.query_id, tf.doc_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id ASC) AS rn FROM scored)
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
          matched
        FROM ranked WHERE rn <= 10
        ORDER BY query_id ASC, score DESC, doc_id ASC""")),

    // ---- T2: match_phrase — adjacency via the positional token stream
    // (anchor trick: one shuffle of phrase-term rows, no positional
    // self-joins), scored as BM25 with the phrase as one term (Lucene
    // PhraseQuery: tf = phrase frequency, df = phrase doc count). The
    // oracle replays positions with DuckDB's zipped unnest (unnest +
    // range over the same array align element-wise = WITH ORDINALITY).
    QueryDef("q148_phrase_search",
      (s, dir) => Search.rankPhrase(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        "window merge", 15),
      Some("""WITH arr AS (SELECT doc_id, string_split(lower(text), ' ') AS a
          FROM documents),
        t AS (SELECT doc_id, unnest(a) AS token,
            unnest(range(0, len(a))) AS pos
          FROM arr),
        q(rank, term) AS (VALUES (0, 'window'), (1, 'merge')),
        cand AS (SELECT t.doc_id, t.pos - q.rank AS anchor, q.rank AS rank
          FROM t JOIN q ON t.token = q.term),
        hits AS (SELECT doc_id, anchor, count(DISTINCT rank) AS h
          FROM cand GROUP BY 1, 2),
        ph AS (SELECT doc_id, count(*) AS phrase_tf
          FROM hits WHERE h = 2 GROUP BY 1),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        d AS (SELECT count(*) AS df FROM ph)
        SELECT ph.doc_id,
          round(ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5))
            * ph.phrase_tf * 2.2
            / (ph.phrase_tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 4)
            AS score,
          ph.phrase_tf
        FROM ph JOIN dl USING (doc_id) CROSS JOIN s CROSS JOIN n
          CROSS JOIN d
        ORDER BY score DESC, doc_id ASC LIMIT 15""")),

    // ---- T2: fuzzy term match — 'sprak' (planted typo) retrieves docs
    // containing vocabulary tokens within 2 Levenshtein edits; the
    // length-window + levenshtein candidate filter runs on the token
    // stream BEFORE any shuffle. Integer score: Σ tf·(maxEdits+1−dist).
    QueryDef("q149_fuzzy_match",
      (s, dir) => Search.matchFuzzy(
        Tables.load(s, dir, "documents"), "doc_id", "text", "sprak", 20),
      Some("""WITH t AS (SELECT doc_id,
            unnest(string_split(lower(text), ' ')) AS token
          FROM documents),
        c AS (SELECT doc_id, token FROM t
          WHERE abs(length(token) - 5) <= 2
            AND levenshtein(token, 'sprak') <= 2),
        tf AS (SELECT doc_id, token, count(*) AS tf,
            levenshtein(token, 'sprak') AS dist
          FROM c GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(tf * (3 - dist)) AS BIGINT) AS score,
          count(*) AS matched
        FROM tf GROUP BY 1
        ORDER BY score DESC, doc_id ASC LIMIT 20""")),

    // ---- T2/K5: MATERIALIZED inverted index, incrementally maintained,
    // BM25 served FROM the index (SearchIndex.scala — the OpenSearch
    // tier as a versioned manifest table). The pipeline exercises every
    // maintenance path under ONE oracle over the final corpus: create
    // on 4/5 of the docs → append the rest (atomic append-only
    // refresh) → copy-on-write merge rewriting one lang partition
    // (delete+append refresh: merge-on-read erase of the rewritten
    // docs, re-index of their post-images) → query. Hash-equality with
    // corpus BM25 proves index ≡ corpus at every step.
    QueryDef("q152_indexed_bm25",
      (s, dir) => {
        val src = "file://" + java.nio.file.Files
          .createTempDirectory("graft_idx_src").toString + "/t"
        val idx = "file://" + java.nio.file.Files
          .createTempDirectory("graft_idx").toString + "/i"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text")
        Manifest.init(s, src, docs.filter(col("doc_id") % 5 =!= 0),
          Seq("lang"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        Manifest.commitAppend(s, src,
          docs.filter(col("doc_id") % 5 === 0), Seq("lang"))
        SearchIndex.refresh(s, src, idx) // append-only: one atomic commit
        Manifest.mergeInto(s, src,
          docs.filter(col("lang") === "de" && col("doc_id") % 7 === 0)
            .withColumn("text", concat(col("text"), lit(" merge merge"))),
          "doc_id", "lang")
        SearchIndex.refresh(s, src, idx) // rewrite: MoR erase + append
        SearchIndex.searchBm25(s, idx, "window merge scan", 15)
      },
      Some("""WITH src AS (SELECT doc_id,
            CASE WHEN lang = 'de' AND doc_id % 7 = 0
              THEN text || ' merge merge' ELSE text END AS text
          FROM documents),
        t AS (SELECT doc_id,
            unnest(string_split(lower(text), ' ')) AS token FROM src),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM src),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf AS (SELECT doc_id, token, count(*) AS tf
          FROM t JOIN q USING (token) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1)
        SELECT tf.doc_id,
          round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
            * tf.tf * 2.2
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
            AS score,
          count(*) AS matched
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
          CROSS JOIN n CROSS JOIN s
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id ASC LIMIT 15"""),
      kind = QueryDef.Pipeline),

    // ---- T2: compound bool query (must / should / must_not) -------------
    // The OpenSearch `bool` DSL analog: docs must contain BOTH required
    // terms, must not contain the excluded one; the optional term only
    // boosts. One term-filtered pass; BM25 arithmetic identical to q144.
    QueryDef("q153_bool_search",
      (s, dir) => Search.searchBool(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        must = Seq("window", "scan"), should = Seq("merge"),
        mustNot = Seq("slow"), k = 15),
      Some("""WITH t AS (SELECT doc_id,
            unnest(string_split(lower(text), ' ')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        q(token, req) AS (VALUES ('window', 1), ('scan', 1),
          ('merge', 0)),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM t
          WHERE token IN ('window', 'scan', 'merge') GROUP BY 1, 2),
        banned AS (SELECT DISTINCT doc_id FROM t WHERE token = 'slow'),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id,
            round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
              AS score,
            count(*) AS matched, sum(q.req) AS mm
          FROM tf JOIN q USING (token) JOIN df USING (token)
            JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN s
          GROUP BY 1)
        SELECT doc_id, score, matched FROM sc
        WHERE mm = 2
          AND doc_id NOT IN (SELECT doc_id FROM banned)
        ORDER BY score DESC, doc_id ASC LIMIT 15""")),

    // ---- T2/A1: faceted search (the OpenSearch `aggs` analog) -----------
    // Terms aggregation over ALL matching docs, per language: doc count,
    // matched-term total, best rounded per-doc BM25 score (all
    // order-independent metrics — engine-replayable).
    QueryDef("q154_search_facets",
      (s, dir) => Search.facetedSearch(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        "window merge scan", "lang"),
      Some("""WITH t AS (SELECT doc_id,
            unnest(string_split(lower(text), ' ')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf AS (SELECT doc_id, token, count(*) AS tf
          FROM t JOIN q USING (token) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id,
            round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
              AS score,
            count(*) AS matched
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
            CROSS JOIN n CROSS JOIN s
          GROUP BY 1)
        SELECT d.lang, count(*) AS n_docs,
          CAST(sum(sc.matched) AS BIGINT) AS matched_terms,
          max(sc.score) AS top_score
        FROM sc JOIN documents d USING (doc_id)
        GROUP BY d.lang ORDER BY d.lang ASC""")))
}
