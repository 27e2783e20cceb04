package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.Search
import graft.sources.{IndexAlias, Manifest, SearchIndex, VectorIndex}
import graft.streaming.IngestStream

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
          SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents) t
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 30""")),

    // ---- T2/K5: inverted-index postings stats ---------------------------
    QueryDef("q39_inverted_postings",
      (s, dir) => Search
        .termStats(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("df").desc, col("token").asc)
        .limit(30),
      Some("""SELECT token, count(*) AS cf, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        qs(query_id, qtext) AS (VALUES (1, 'window merge scan'),
          (2, 'spark query data'), (3, 'slow batch')),
        q AS (SELECT DISTINCT query_id,
            unnest(regexp_split_to_array(qtext, '\s+')) AS token FROM qs),
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
      Some("""WITH arr AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS a
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
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        val src = "file://" + graft.TempRoots.create("graft_idx_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_idx") + "/i"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text")
        // Clustered writes for the whole build pipeline: a W-task
        // shuffle writing P hive partitions otherwise leaves W×P
        // small files per commit; one file per touched partition is
        // what an index-build job would configure.
        val key = "spark.graft.manifest.write.clustered"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "true")
        try {
          Manifest.init(s, src, docs.filter(col("doc_id") % 5 =!= 0),
            Seq("lang"))
          SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
          Manifest.commitAppend(s, src,
            docs.filter(col("doc_id") % 5 === 0), Seq("lang"))
          SearchIndex.refresh(s, src, idx) // append-only: one atomic commit
          Manifest.mergeInto(s, src,
            docs.filter(col("lang") === "de" && col("doc_id") % 7 === 0)
              .withColumn("text",
                concat(col("text"), lit(" merge merge"))),
            "doc_id", "lang")
          SearchIndex.refresh(s, src, idx) // rewrite: MoR erase + append
        } finally {
          prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        }
        SearchIndex.searchBm25(s, idx, "window merge scan", 15)
      },
      Some("""WITH src AS (SELECT doc_id,
            CASE WHEN lang = 'de' AND doc_id % 7 = 0
              THEN text || ' merge merge' ELSE text END AS text
          FROM documents),
        t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM src),
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
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        GROUP BY d.lang ORDER BY d.lang ASC""")),

    // ---- T2/X3: hybrid retrieval — reciprocal-rank fusion of the BM25
    // sparse leg (q144's arithmetic) and the dense cosine leg (q47's),
    // fused on bounded top-20 frames (rank join is k², constant). The
    // modern two-tower retrieval stack in one declarative plan.
    QueryDef("q155_hybrid_rrf",
      (s, dir) => Search.hybridRrf(
        Tables.load(s, dir, "documents"), Tables.load(s, dir, "embeddings"),
        "doc_id", "text", "vec_id", "embedding",
        "window merge scan", queryVecId = 7L, k = 10),
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf AS (SELECT doc_id, token, count(*) AS tf
          FROM t JOIN q USING (token) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1),
        bm AS (SELECT tf.doc_id,
            round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
              AS score
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
            CROSS JOIN n CROSS JOIN s
          GROUP BY 1 ORDER BY score DESC, doc_id ASC LIMIT 20),
        sr AS (SELECT doc_id, row_number()
            OVER (ORDER BY score DESC, doc_id ASC) AS sparse_rank
          FROM bm),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        qv AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        cos AS (SELECT e.vec_id,
            list_dot_product(e.v, qv.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(qv.qv, qv.qv))) AS cosine
          FROM e, qv WHERE e.vec_id <> 7
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 20),
        dr AS (SELECT vec_id AS doc_id, row_number()
            OVER (ORDER BY cosine DESC, vec_id ASC) AS dense_rank
          FROM cos)
        SELECT doc_id,
          round(COALESCE(1.0 / (60 + sparse_rank), 0)
            + COALESCE(1.0 / (60 + dense_rank), 0), 6) AS rrf,
          sparse_rank, dense_rank
        FROM sr FULL OUTER JOIN dr USING (doc_id)
        ORDER BY rrf DESC, doc_id ASC LIMIT 10""")),

    // ---- T2: more-like-this — seed doc 42's top-5 tf-idf terms drive a
    // BM25 ranking of the rest of the corpus; every corpus aggregation
    // is bounded by the seed's vocabulary (semi-join before df).
    QueryDef("q156_more_like_this",
      (s, dir) => Search.moreLikeThis(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        seedId = 42L, mTerms = 5, k = 10),
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        n AS (SELECT count(*) AS n FROM documents),
        seed AS (SELECT token, count(*) AS tf FROM t
          WHERE doc_id = 42 GROUP BY 1),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM t
          WHERE token IN (SELECT token FROM seed) GROUP BY 1),
        sel AS (SELECT seed.token, df.df,
            round(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5)) * seed.tf, 4)
              AS tfidf
          FROM seed JOIN df USING (token) CROSS JOIN n
          ORDER BY tfidf DESC, token ASC LIMIT 5),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM t
          WHERE token IN (SELECT token FROM sel) AND doc_id <> 42
          GROUP BY 1, 2)
        SELECT tf.doc_id,
          round(sum(ln(1 + (n.n - sel.df + 0.5) / (sel.df + 0.5))
            * tf.tf * 2.2
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
            AS score,
          count(*) AS matched
        FROM tf JOIN sel USING (token) JOIN dl USING (doc_id)
          CROSS JOIN n CROSS JOIN s
        GROUP BY 1 ORDER BY score DESC, doc_id ASC LIMIT 10""")),

    // ---- T2/A6: significant terms — tokens over-represented in the
    // English foreground vs the rest of the corpus (df-proportion
    // ratio, +1-smoothed); one distinct-(doc, fg, token) pass.
    QueryDef("q157_significant_terms",
      (s, dir) => Search.significantTerms(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", k = 20, minDocCount = 3),
      Some("""WITH t AS (SELECT DISTINCT doc_id, fg, token FROM (
            SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS fg,
              unnest(regexp_split_to_array(lower(text), '\s+')) AS token
            FROM documents)),
        tot AS (SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              AS BIGINT) AS fg_total, count(*) AS n
          FROM documents),
        g AS (SELECT token, CAST(sum(fg) AS BIGINT) AS fg_df,
            count(*) AS df
          FROM t GROUP BY 1)
        SELECT token, fg_df, df - fg_df AS bg_df,
          round((fg_df / tot.fg_total)
            / ((df - fg_df + 1.0) / (tot.n - tot.fg_total + 1.0)), 4)
            AS score
        FROM g CROSS JOIN tot WHERE fg_df >= 3
        ORDER BY score DESC, token ASC LIMIT 20""")),

    // ---- T2: highlighting — ±3-token snippet around the first match
    // of any query term; anchors from the pre-shuffle-filtered
    // positional stream, snippets cut from the original array (slice),
    // never a second corpus explode.
    QueryDef("q158_highlight",
      (s, dir) => Search.highlight(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("merge", "window"), window = 3, k = 15),
      Some("""WITH arr AS (SELECT doc_id,
            regexp_split_to_array(lower(text), '\s+') AS a
          FROM documents),
        t AS (SELECT doc_id, unnest(a) AS token,
            unnest(range(0, len(a))) AS pos
          FROM arr),
        anch AS (SELECT doc_id, min(pos) AS anchor, count(*) AS hits
          FROM t WHERE token IN ('merge', 'window') GROUP BY 1)
        SELECT arr.doc_id, anch.anchor, anch.hits,
          array_to_string(list_slice(arr.a,
            greatest(anchor - 3, 0) + 1, anchor + 3 + 1), ' ') AS snippet
        FROM arr JOIN anch USING (doc_id)
        ORDER BY doc_id ASC LIMIT 15""")),

    // ---- T2: completion suggest — vocabulary tokens extending 's',
    // ranked by collection frequency; the prefix predicate runs on the
    // exploded stream pre-shuffle.
    QueryDef("q159_suggest_prefix",
      (s, dir) => Search.suggest(
        Tables.load(s, dir, "documents"), "doc_id", "text", "s", k = 10),
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents)
        SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS docs
        FROM t WHERE token LIKE 's%'
        GROUP BY 1 ORDER BY freq DESC, token ASC LIMIT 10""")),

    // ---- T2: percolate — four registered conjunctive queries matched
    // against the whole corpus in ONE pass (query 4 is a planted
    // no-match exercising the 0/NULL path).
    QueryDef("q161_percolate",
      (s, dir) => {
        import s.implicits._
        val qs = Seq((1L, "window merge"), (2L, "scan"),
          (3L, "window slow batch"), (4L, "dup vector customer the"))
          .toDF("query_id", "qtext")
        Search.percolate(Tables.load(s, dir, "documents"),
          "doc_id", "text", qs, "query_id", "qtext")
      },
      Some("""WITH t AS (SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token
            FROM documents)),
        q(query_id, qt) AS (VALUES
          (CAST(1 AS BIGINT), 'window merge'), (2, 'scan'),
          (3, 'window slow batch'), (4, 'dup vector customer the')),
        qtok AS (SELECT query_id,
            unnest(list_distinct(regexp_split_to_array(lower(qt), '\s+'))) AS token
          FROM q),
        qn AS (SELECT query_id, count(*) AS qn FROM qtok GROUP BY 1),
        m AS (SELECT qtok.query_id, t.doc_id, count(*) AS m
          FROM t JOIN qtok USING (token) GROUP BY 1, 2),
        ok AS (SELECT m.query_id, m.doc_id FROM m JOIN qn USING (query_id)
          WHERE m.m = qn.qn),
        agg AS (SELECT query_id, count(*) AS n_matches,
            min(doc_id) AS first_doc, max(doc_id) AS last_doc
          FROM ok GROUP BY 1)
        SELECT q.query_id, COALESCE(agg.n_matches, 0) AS n_matches,
          agg.first_doc, agg.last_doc
        FROM q LEFT JOIN agg USING (query_id)
        ORDER BY query_id ASC""")),

    // ---- T2/X3: rescore — BM25 top-50 window re-scored by embedding
    // cosine to query vector 7 (the ES rescore API / two-phase rerank:
    // the expensive signal runs on the bounded window only).
    QueryDef("q162_rescore",
      (s, dir) => Search.rescore(
        Tables.load(s, dir, "documents"), Tables.load(s, dir, "embeddings"),
        "doc_id", "text", "vec_id", "embedding",
        "window merge scan", queryVecId = 7L, windowN = 50, k = 10),
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf AS (SELECT doc_id, token, count(*) AS tf
          FROM t JOIN q USING (token) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1),
        bm AS (SELECT tf.doc_id,
            round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
              AS score
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
            CROSS JOIN n CROSS JOIN s
          GROUP BY 1 ORDER BY score DESC, doc_id ASC LIMIT 50),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        qv AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        cs AS (SELECT bm.doc_id, bm.score,
            list_dot_product(e.v, qv.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(qv.qv, qv.qv))) AS cosine
          FROM bm JOIN e ON bm.doc_id = e.vec_id CROSS JOIN qv)
        SELECT doc_id, round(score + cosine, 6) AS combined,
          score, round(cosine, 6) AS cosine
        FROM cs ORDER BY combined DESC, doc_id ASC LIMIT 10""")),

    // ---- T2: completion suggest served FROM the materialized index —
    // same oracle as the corpus-pass q159 (hash-equality proves
    // index ≡ corpus for the suggest path too); the index scan reads
    // |vocabulary| aggregated postings rows, no tokenization.
    QueryDef("q166_index_suggest",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_sg_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_sg") + "/i"
        Manifest.init(s, src,
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        SearchIndex.suggest(s, idx, "s", k = 10)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents)
        SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS docs
        FROM t WHERE token LIKE 's%'
        GROUP BY 1 ORDER BY freq DESC, token ASC LIMIT 10"""),
      kind = QueryDef.Pipeline),

    // ---- T2/R: STREAMING percolate — the ES percolator's actual
    // deployment shape (alerting): registered queries are matched
    // against an INCREMENTAL document stream, per micro-batch; because
    // a percolate match is a per-document decision, the merged
    // per-batch aggregates equal the whole-corpus percolate (q161's
    // oracle verifies exactly that).
    QueryDef("q167_stream_percolate",
      (s, dir) => {
        val root = graft.TempRoots.create("graft_spt")
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("append").parquet(s"$root/raw")
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(s"$root/raw")
        val schema = s.read.parquet(s"$root/raw").schema
        import s.implicits._
        val qs = Seq((1L, "window merge"), (2L, "scan"),
          (3L, "window slow batch"), (4L, "dup vector customer the"))
          .toDF("query_id", "qtext")
        IngestStream.rawStream(s, s"$root/raw", schema, "parquet")
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, id: Long) =>
              Search.percolate(b, "doc_id", "text",
                  qs, "query_id", "qtext")
                .write.mode("overwrite")
                .parquet(s"$root/alerts/batch_id=$id")
              ()
          }
          .start().awaitTermination()
        s.read.parquet(s"$root/alerts")
          .groupBy("query_id")
          .agg(sum("n_matches").cast("long").as("n_matches"),
            min("first_doc").as("first_doc"),
            max("last_doc").as("last_doc"))
          .orderBy("query_id")
      },
      Some("""WITH t AS (SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token
            FROM documents)),
        q(query_id, qt) AS (VALUES
          (CAST(1 AS BIGINT), 'window merge'), (2, 'scan'),
          (3, 'window slow batch'), (4, 'dup vector customer the')),
        qtok AS (SELECT query_id,
            unnest(list_distinct(regexp_split_to_array(lower(qt), '\s+'))) AS token
          FROM q),
        qn AS (SELECT query_id, count(*) AS qn FROM qtok GROUP BY 1),
        m AS (SELECT qtok.query_id, t.doc_id, count(*) AS m
          FROM t JOIN qtok USING (token) GROUP BY 1, 2),
        ok AS (SELECT m.query_id, m.doc_id FROM m JOIN qn USING (query_id)
          WHERE m.m = qn.qn),
        agg AS (SELECT query_id, count(*) AS n_matches,
            min(doc_id) AS first_doc, max(doc_id) AS last_doc
          FROM ok GROUP BY 1)
        SELECT q.query_id, COALESCE(agg.n_matches, 0) AS n_matches,
          agg.first_doc, agg.last_doc
        FROM q LEFT JOIN agg USING (query_id)
        ORDER BY query_id ASC"""),
      kind = QueryDef.Pipeline),

    // ---- X3: persisted IVF vector index — create (8 cells, clustered
    // write) + probe-ALL search for vec 7's vector. Probing every cell
    // is EXACT by construction, so DuckDB replays the result as plain
    // brute-force cosine over the corpus (q150's lossless-anchor
    // pattern); partial-probe recall and partition pruning are
    // spec-asserted (VectorIndexSpec).
    QueryDef("q168_vector_index",
      (s, dir) => {
        val idx = "file://" + graft.TempRoots.create("graft_vidx") + "/v"
        val emb = Tables.load(s, dir, "embeddings")
        VectorIndex.create(s, idx, emb, "vec_id", "embedding",
          nCells = 8)
        // bounded 1-row collect: the external query vector (an ANN
        // query's input is a vector, not a row reference)
        val qv = emb.filter(col("vec_id") === 7L)
          .select(graft.functions.Vectors.toDouble(col("embedding")))
          .collect().head.getSeq[Double](0).toArray
        VectorIndex.search(s, idx, qv, k = 10, nProbe = 8)
          .select(col("id").as("vec_id"),
            round(col("cosine"), 6).as("cosine"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT e.vec_id,
            list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
          FROM e, q
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 10)"""),
      kind = QueryDef.Pipeline),

    // ---- X3: SQ8-QUANTIZED vector index (faiss SQ8 / Lucene int8) —
    // per-dimension 256-level codes replace the stored doubles (the
    // probed scan reads ~1/8 the vector bytes at any corpus size).
    // Quantization is deterministic: exact per-dim min/max training
    // ranges (comparisons only), floor-based code assignment, midpoint
    // decode — so DuckDB REPLAYS the whole quantize→decode→rank chain
    // on the raw embeddings and the top-k must hash-match, probe-all.
    QueryDef("q194_sq8_ann",
      (s, dir) => {
        val idx = "file://" + graft.TempRoots.create("graft_sq8") + "/v"
        val emb = Tables.load(s, dir, "embeddings")
        VectorIndex.create(s, idx, emb, "vec_id", "embedding",
          nCells = 8, quantize = true)
        val qv = emb.filter(col("vec_id") === 7L)
          .select(graft.functions.Vectors.toDouble(col("embedding")))
          .collect().head.getSeq[Double](0).toArray
        VectorIndex.search(s, idx, qv, k = 10, nProbe = 8)
          .select(col("id").as("vec_id"),
            round(col("cosine"), 6).as("cosine"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        d AS (SELECT unnest(v) AS x, unnest(range(1, len(v)+1)) AS i
          FROM e),
        b AS (SELECT i, min(x) AS lo, max(x) AS hi FROM d GROUP BY i),
        r AS (SELECT list(lo ORDER BY i) AS lo,
            list(hi ORDER BY i) AS hi FROM b),
        dec AS (SELECT e.vec_id,
            list_transform(range(1, len(e.v)+1), i ->
              CASE WHEN r.hi[i] = r.lo[i] THEN r.lo[i]
              ELSE r.lo[i] + (least(255, greatest(0,
                  floor((e.v[i] - r.lo[i])
                    / (r.hi[i] - r.lo[i]) * 256))) + 0.5)
                / 256 * (r.hi[i] - r.lo[i]) END) AS dv
          FROM e, r),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT dec.vec_id,
            list_dot_product(dec.dv, q.qv)
              / (sqrt(list_dot_product(dec.dv, dec.dv))
                 * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
          FROM dec, q
          ORDER BY cosine DESC, dec.vec_id ASC LIMIT 10)"""),
      kind = QueryDef.Pipeline),

    // ---- T2: span-near (in-order sloppy phrase) — 'table scan merge'
    // within a window of 2+slop(2) = 4 extra-gap-bounded positions.
    // Span frequency is head-anchored with a GREEDY min-chain (exact
    // for the head-anchored definition); the oracle replays the same
    // greedy chain as two min-joins, so engine and oracle agree
    // bit-for-bit, scored as one-term BM25 (q148's arithmetic).
    QueryDef("q169_span_near",
      (s, dir) => Search.rankNear(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        "table scan merge", slop = 2, k = 15),
      Some("""WITH arr AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS a
          FROM documents),
        t AS (SELECT doc_id, unnest(a) AS token,
            unnest(range(0, len(a))) AS pos
          FROM arr),
        t0 AS (SELECT doc_id, pos FROM t WHERE token = 'table'),
        t1 AS (SELECT doc_id, pos FROM t WHERE token = 'scan'),
        t2 AS (SELECT doc_id, pos FROM t WHERE token = 'merge'),
        c1 AS (SELECT s.doc_id, s.pos AS p0, min(t1.pos) AS p1
          FROM t0 s JOIN t1 ON t1.doc_id = s.doc_id AND t1.pos > s.pos
          GROUP BY 1, 2),
        c2 AS (SELECT c1.doc_id, c1.p0, min(t2.pos) AS p2
          FROM c1 JOIN t2 ON t2.doc_id = c1.doc_id AND t2.pos > c1.p1
          GROUP BY 1, 2),
        ph AS (SELECT doc_id, count(*) AS span_tf FROM c2
          WHERE p2 - p0 <= 4 GROUP BY 1),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        d AS (SELECT count(*) AS df FROM ph)
        SELECT ph.doc_id,
          round(ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5))
            * ph.span_tf * 2.2
            / (ph.span_tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 4)
            AS score,
          ph.span_tf
        FROM ph JOIN dl USING (doc_id) CROSS JOIN s CROSS JOIN n
          CROSS JOIN d
        ORDER BY score DESC, doc_id ASC LIMIT 15""")),

    // ---- T2/K5: search_after — deep pagination as a keyset cursor on
    // the served index: page 1's last (score, doc_id) sort key filters
    // the NEXT page before its top-k heap, so page N costs page-1
    // work. The 1-row cursor collect is the protocol itself (the
    // client hands the cursor back). Oracle: keyset page 2 of a strict
    // total order ≡ ranks k+1..2k of the full ranking.
    QueryDef("q170_search_after",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_sa_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_sa_idx") + "/i"
        Manifest.init(s, src,
          Tables.load(s, dir, "documents")
            .select("doc_id", "lang", "text"), Seq("lang"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        val page1 = SearchIndex
          .searchBm25(s, idx, "window merge scan", k = 10)
          .collect()
        require(page1.length == 10, "page 1 underfilled; widen the query")
        val last = page1.last
        SearchIndex.searchBm25(s, idx, "window merge scan", k = 10,
          after = Some((last.getDouble(1), last.getLong(0))))
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf AS (SELECT doc_id, token, count(*) AS tf
          FROM t JOIN q USING (token) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1),
        scored AS (SELECT tf.doc_id,
            round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
              AS score,
            count(*) AS matched
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
            CROSS JOIN n CROSS JOIN s
          GROUP BY tf.doc_id),
        ranked AS (SELECT *, row_number()
            OVER (ORDER BY score DESC, doc_id ASC) AS rn FROM scored)
        SELECT doc_id, score, matched FROM ranked
        WHERE rn BETWEEN 11 AND 20
        ORDER BY score DESC, doc_id ASC"""),
      kind = QueryDef.Pipeline),

    // ---- X3: FILTERED ANN — the OpenSearch kNN `filter` / FAISS
    // IDSelector shape: the metadata field (label) is a PAYLOAD column
    // stored in the vector index, so the predicate applies inside the
    // probed cells BEFORE ranking (pre-filter: the page has k
    // surviving neighbors, no post-filter holes) and pushes into the
    // index's own parquet scan. Probe-all keeps it exact → plain
    // filtered brute-force oracle.
    QueryDef("q171_filtered_ann",
      (s, dir) => {
        val idx = "file://" + graft.TempRoots.create("graft_fvidx") + "/v"
        val emb = Tables.load(s, dir, "embeddings")
        VectorIndex.create(s, idx, emb, "vec_id", "embedding",
          nCells = 8, payloadCols = Seq("label"))
        val qv = emb.filter(col("vec_id") === 7L)
          .select(graft.functions.Vectors.toDouble(col("embedding")))
          .collect().head.getSeq[Double](0).toArray
        VectorIndex.search(s, idx, qv, k = 10, nProbe = 8,
            filter = Some(col("label") === 3))
          .select(col("id").as("vec_id"),
            round(col("cosine"), 6).as("cosine"))
      },
      Some("""WITH e AS (SELECT vec_id, label,
            CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT e.vec_id,
            list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
          FROM e, q WHERE e.label = 3
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 10)"""),
      kind = QueryDef.Pipeline),

    // ---- T2/X3: HYBRID RETRIEVAL SERVED FROM INDEXES — the q155
    // corpus-pass hybrid's deployment shape: sparse leg from the
    // materialized inverted index (pruned term buckets, header
    // N/avgdl), dense leg from the IVF vector index (probe-all =
    // exact; id ≠ 7 via the filtered-ANN predicate), fused with the
    // SAME rrfFuse. Hash-equal to q155's oracle — index ≡ corpus for
    // the whole hybrid stack.
    QueryDef("q172_indexed_hybrid",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_hy_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_hy_idx") + "/i"
        val vidx = "file://" + graft.TempRoots.create("graft_hy_vidx") + "/v"
        Manifest.init(s, src,
          Tables.load(s, dir, "documents")
            .select("doc_id", "lang", "text"), Seq("lang"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        val emb = Tables.load(s, dir, "embeddings")
        VectorIndex.create(s, vidx, emb, "vec_id", "embedding",
          nCells = 8)
        val qv = emb.filter(col("vec_id") === 7L)
          .select(graft.functions.Vectors.toDouble(col("embedding")))
          .collect().head.getSeq[Double](0).toArray
        SearchIndex.hybridRrf(s, idx, vidx, "window merge scan", qv,
          k = 10, kEach = 20, nProbe = 8,
          denseFilter = Some(col("id") =!= 7L))
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf AS (SELECT doc_id, token, count(*) AS tf
          FROM t JOIN q USING (token) GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1),
        bm AS (SELECT tf.doc_id,
            round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
              AS score
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
            CROSS JOIN n CROSS JOIN s
          GROUP BY 1 ORDER BY score DESC, doc_id ASC LIMIT 20),
        sr AS (SELECT doc_id, row_number()
            OVER (ORDER BY score DESC, doc_id ASC) AS sparse_rank
          FROM bm),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        qv AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        cos AS (SELECT e.vec_id,
            list_dot_product(e.v, qv.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(qv.qv, qv.qv))) AS cosine
          FROM e, qv WHERE e.vec_id <> 7
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 20),
        dr AS (SELECT vec_id AS doc_id, row_number()
            OVER (ORDER BY cosine DESC, vec_id ASC) AS dense_rank
          FROM cos)
        SELECT doc_id,
          round(COALESCE(1.0 / (60 + sparse_rank), 0)
            + COALESCE(1.0 / (60 + dense_rank), 0), 6) AS rrf,
          sparse_rank, dense_rank
        FROM sr FULL OUTER JOIN dr USING (doc_id)
        ORDER BY rrf DESC, doc_id ASC LIMIT 10"""),
      kind = QueryDef.Pipeline),

    // ---- T2: synonym-expanded match — 'scan merge' with
    // scan→{filter}, merge→{join, blend}: Lucene SynonymQuery
    // semantics (variants pool into ONE concept: tf summed, df =
    // docs with ANY variant), so expansion broadens recall without
    // double-counting idf. 'blend' never occurs — a zero-hit variant
    // must not perturb its concept's stats.
    QueryDef("q173_synonym_match",
      (s, dir) => Search.rankBm25Synonyms(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        "scan merge",
        Map("scan" -> Seq("filter"), "merge" -> Seq("join", "blend")),
        15),
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        v(token, concept) AS (VALUES ('scan', 'scan'),
          ('filter', 'scan'), ('merge', 'merge'), ('join', 'merge'),
          ('blend', 'merge')),
        tf AS (SELECT t.doc_id, v.concept, count(*) AS tf
          FROM t JOIN v USING (token) GROUP BY 1, 2),
        df AS (SELECT concept, count(DISTINCT doc_id) AS df
          FROM tf GROUP BY 1)
        SELECT tf.doc_id,
          round(sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
            * tf.tf * 2.2
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4)
            AS score,
          count(*) AS matched
        FROM tf JOIN df USING (concept) JOIN dl USING (doc_id)
          CROSS JOIN n CROSS JOIN s
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id ASC LIMIT 15""")),

    // ---- T2/K5: token-range partitioned SUGGEST TWIN — the at-scale
    // suggest layout the hash-bucketed index cannot give (a prefix
    // predicate can't prune hash buckets): per-token aggregates
    // re-materialized partitioned by first character, so a prefix
    // lookup prunes to ONE partition. The pipeline exercises
    // create → index refresh → twin refresh; the oracle is the same
    // whole-corpus suggest as q159/q166.
    QueryDef("q174_suggest_twin",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_tw_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_tw_idx") + "/i"
        val twin = "file://" + graft.TempRoots.create("graft_tw") + "/s"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        Manifest.init(s, src, docs.filter(col("doc_id") % 4 =!= 0))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        SearchIndex.createSuggestTwin(s, idx, twin)
        Manifest.commitAppend(s, src, docs.filter(col("doc_id") % 4 === 0))
        SearchIndex.refresh(s, src, idx)
        SearchIndex.refreshSuggestTwin(s, idx, twin)
        SearchIndex.suggestFromTwin(s, twin, "s", k = 10)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents)
        SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS docs
        FROM t WHERE token LIKE 's%'
        GROUP BY 1 ORDER BY freq DESC, token ASC LIMIT 10"""),
      kind = QueryDef.Pipeline),

    // ---- T2/K5: TIME-TRAVEL SEARCH — query an OLDER index version:
    // postings AND header stats (N, avgdl) come from that snapshot,
    // so the answer is exactly what the live query returned at that
    // version. The index advances past the create (append refresh),
    // then is queried AS OF the create-time version; the oracle
    // replays BM25 over the create-time document slice.
    QueryDef("q175_search_asof",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_tt_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_tt_idx") + "/i"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text")
        Manifest.init(s, src, docs.filter(col("doc_id") % 4 =!= 0),
          Seq("lang"))
        val v1 = SearchIndex.create(s, src, idx, "doc_id", "text",
          buckets = 16)
        Manifest.commitAppend(s, src,
          docs.filter(col("doc_id") % 4 === 0), Seq("lang"))
        SearchIndex.refresh(s, src, idx)
        SearchIndex.searchBm25(s, idx, "window merge scan", k = 15,
          asOf = Some(v1))
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents
          WHERE doc_id % 4 <> 0),
        t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM base),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM base),
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

    // ---- X3: INCREMENTAL VECTOR-INDEX REFRESH — the dense mirror of
    // q152's maintenance story: index 3/4 of the embeddings from a
    // manifest source, append the rest, refresh (append-only diff →
    // added rows assigned against FROZEN pivots, one commit), then
    // probe-all search — exact, so the brute-force oracle covers the
    // whole grown corpus and proves refresh ≡ reindex.
    QueryDef("q176_vector_refresh",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_vr_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_vr_idx") + "/v"
        val emb = Tables.load(s, dir, "embeddings")
        Manifest.init(s, src, emb.filter(col("vec_id") % 4 =!= 0))
        VectorIndex.createFromManifest(s, src, idx, "vec_id",
          "embedding", nCells = 8)
        Manifest.commitAppend(s, src, emb.filter(col("vec_id") % 4 === 0))
        VectorIndex.refresh(s, src, idx)
        val qv = emb.filter(col("vec_id") === 7L)
          .select(graft.functions.Vectors.toDouble(col("embedding")))
          .collect().head.getSeq[Double](0).toArray
        VectorIndex.search(s, idx, qv, k = 10, nProbe = 8)
          .select(col("id").as("vec_id"),
            round(col("cosine"), 6).as("cosine"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT e.vec_id,
            list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
          FROM e, q
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 10)"""),
      kind = QueryDef.Pipeline),

    // ---- T2/K5: COMPACTION PRESERVES SEARCH — the inverted index is
    // an ordinary manifest table, so generic table maintenance
    // composes with it: build with UNclustered writes (many small
    // files per bucket), Manifest.compact rewrites them (meta header
    // carries forward), and BM25 from the compacted index still
    // hash-equals corpus BM25.
    QueryDef("q177_compacted_search",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_cp_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_cp_idx") + "/i"
        Manifest.init(s, src,
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        Manifest.compact(s, idx, smallBytes = 1L << 30)
        SearchIndex.searchBm25(s, idx, "window merge scan", 15)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        ORDER BY score DESC, tf.doc_id ASC LIMIT 15"""),
      kind = QueryDef.Pipeline),

    // ---- T2/K5: POSITIONAL INDEX — per-posting position arrays
    // (Lucene positional postings) let phrase/span queries run FROM
    // the index: pruned term buckets + stored positions + the SAME
    // greedy span chain as the corpus pass, through an append refresh
    // that must preserve positional rows. Same span semantics and
    // oracle as q169 — index ≡ corpus for spans.
    QueryDef("q178_indexed_span",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_ps_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_ps_idx") + "/i"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        Manifest.init(s, src, docs.filter(col("doc_id") % 5 =!= 0))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16,
          positions = true)
        Manifest.commitAppend(s, src, docs.filter(col("doc_id") % 5 === 0))
        SearchIndex.refresh(s, src, idx)
        SearchIndex.searchNear(s, idx, "table scan merge", slop = 2,
          k = 15)
      },
      Some("""WITH arr AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS a
          FROM documents),
        t AS (SELECT doc_id, unnest(a) AS token,
            unnest(range(0, len(a))) AS pos
          FROM arr),
        t0 AS (SELECT doc_id, pos FROM t WHERE token = 'table'),
        t1 AS (SELECT doc_id, pos FROM t WHERE token = 'scan'),
        t2 AS (SELECT doc_id, pos FROM t WHERE token = 'merge'),
        c1 AS (SELECT s.doc_id, s.pos AS p0, min(t1.pos) AS p1
          FROM t0 s JOIN t1 ON t1.doc_id = s.doc_id AND t1.pos > s.pos
          GROUP BY 1, 2),
        c2 AS (SELECT c1.doc_id, c1.p0, min(t2.pos) AS p2
          FROM c1 JOIN t2 ON t2.doc_id = c1.doc_id AND t2.pos > c1.p1
          GROUP BY 1, 2),
        ph AS (SELECT doc_id, count(*) AS span_tf FROM c2
          WHERE p2 - p0 <= 4 GROUP BY 1),
        dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        s AS (SELECT avg(dl) AS avgdl FROM dl),
        n AS (SELECT count(*) AS n FROM documents),
        d AS (SELECT count(*) AS df FROM ph)
        SELECT ph.doc_id,
          round(ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5))
            * ph.span_tf * 2.2
            / (ph.span_tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 4)
            AS score,
          ph.span_tf
        FROM ph JOIN dl USING (doc_id) CROSS JOIN s CROSS JOIN n
          CROSS JOIN d
        ORDER BY score DESC, doc_id ASC LIMIT 15"""),
      kind = QueryDef.Pipeline),

    // ---- T2/K5: BOOL QUERY SERVED FROM THE INDEX — q153's compound
    // must/should/must_not semantics from pruned term buckets + header
    // stats; same oracle as q153 (index ≡ corpus for bool).
    QueryDef("q179_indexed_bool",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_bl_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_bl_idx") + "/i"
        Manifest.init(s, src,
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        SearchIndex.searchBool(s, idx, must = Seq("window", "scan"),
          should = Seq("merge"), mustNot = Seq("slow"), k = 15)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        ORDER BY score DESC, doc_id ASC LIMIT 15"""),
      kind = QueryDef.Pipeline),

    // ---- T2/K5: FUZZY MATCH SERVED FROM THE INDEX — q149's
    // edit-distance semantics over the ALREADY-AGGREGATED postings:
    // the length-window + levenshtein candidate filter scans postings
    // rows (pushed to the parquet scan), never re-tokenizes the
    // corpus. Same oracle as q149 (index ≡ corpus for fuzzy).
    QueryDef("q180_indexed_fuzzy",
      (s, dir) => {
        val src = "file://" + graft.TempRoots.create("graft_fz_src") + "/t"
        val idx = "file://" + graft.TempRoots.create("graft_fz_idx") + "/i"
        Manifest.init(s, src,
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        SearchIndex.matchFuzzy(s, idx, "sprak", k = 20)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        ORDER BY score DESC, doc_id ASC LIMIT 20"""),
      kind = QueryDef.Pipeline),

    // ---- T2/A1: top_hits sub-aggregation — the docs themselves, top-3
    // per lang bucket by BM25, through the TopKPerGroup bounded-heap
    // plan (no per-bucket sort; skewed buckets cost heap inserts).
    QueryDef("q181_facet_top_hits",
      (s, dir) => Search.facetTopHits(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        "window merge scan", "lang", kPerBucket = 3),
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
          GROUP BY 1),
        wf AS (SELECT d.lang, sc.doc_id, sc.score, sc.matched
          FROM sc JOIN documents d USING (doc_id)),
        r AS (SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY score DESC, doc_id ASC) AS rn FROM wf)
        SELECT lang, doc_id, score, matched FROM r WHERE rn <= 3
        ORDER BY lang ASC, score DESC, doc_id ASC""")),

    // ---- T2/A1: histogram aggregation — match counts and best score
    // bucketed by floor(n_chars / 100)·100 over the query's matches
    // (the ES histogram agg; date_histogram is the same arithmetic on
    // a time column).
    QueryDef("q182_histogram_facet",
      (s, dir) => Search.histogramFacet(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        "window merge scan", "n_chars", width = 100L),
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
              AS score
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
            CROSS JOIN n CROSS JOIN s
          GROUP BY 1)
        SELECT CAST(floor(d.n_chars / 100) * 100 AS BIGINT) AS bucket,
          count(*) AS n_docs, max(sc.score) AS top_score
        FROM sc JOIN documents d USING (doc_id)
        GROUP BY 1 ORDER BY bucket ASC""")),

    // ---- T2/K5: SHARDED SEARCH, GLOBAL STATS — three independently
    // built indexes (different bucket counts) over disjoint corpus
    // thirds, searched as one: N/avgdl summed from the headers, df
    // from the unioned pruned postings — hash-equal to ONE index over
    // the whole corpus (q144's oracle), the dfs_query_then_fetch
    // shape.
    QueryDef("q183_sharded_search",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        val idxs = Seq(8, 16, 4).zipWithIndex.map { case (bk, i) =>
          val src = "file://" + graft.TempRoots.create(s"graft_sh${i}_src") + "/t"
          val idx = "file://" + graft.TempRoots.create(s"graft_sh${i}_idx") + "/i"
          Manifest.init(s, src, docs.filter(col("doc_id") % 3 === i))
          SearchIndex.create(s, src, idx, "doc_id", "text",
            buckets = bk)
          idx
        }
        SearchIndex.searchBm25Sharded(s, idxs, "window merge scan",
          k = 15)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        ORDER BY score DESC, tf.doc_id ASC LIMIT 15"""),
      kind = QueryDef.Pipeline),

    // ---- R/K5: CONTINUOUS INDEXING — the ES refresh-interval analog:
    // each micro-batch lands in the source table through the
    // exactly-once streaming sink and the inverted index advances by
    // its INCREMENTAL refresh (append-only file diff → one atomic
    // index commit per batch; the corpus is re-tokenized never, the
    // batch once). After two AvailableNow rounds over one checkpoint,
    // BM25 from the continuously-maintained index hash-equals corpus
    // BM25 over everything ingested.
    QueryDef("q185_stream_indexing",
      (s, dir) => {
        val root = graft.TempRoots.create("graft_si")
        val src = "file://" + root + "/docs"
        val idx = "file://" + root + "/idx"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        val cut = docs.agg(max("doc_id")).head().getLong(0) / 2
        val schema = docs.schema
        def drain(): Unit = IngestStream
          .rawStream(s, s"$root/raw", schema, "parquet")
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger
            .AvailableNow())
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, id: Long) =>
              Manifest.commitStreamBatch(s, src, b, "ingest", id)
              if (Manifest.latestVersion(s, idx).isEmpty)
                SearchIndex.create(s, src, idx, "doc_id", "text",
                  buckets = 16)
              else SearchIndex.refresh(s, src, idx)
              ()
          }
          .start().awaitTermination()
        docs.filter(col("doc_id") <= cut)
          .write.mode("append").parquet(s"$root/raw")
        drain()
        docs.filter(col("doc_id") > cut)
          .write.mode("append").parquet(s"$root/raw")
        drain()
        SearchIndex.searchBm25(s, idx, "window merge scan", k = 15)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        ORDER BY score DESC, tf.doc_id ASC LIMIT 15"""),
      kind = QueryDef.Pipeline),

    // ---- R/X3: CONTINUOUS VECTOR INDEXING — q185's streaming shape
    // for the DENSE index: waves of embeddings drained by sequential
    // AvailableNow rounds over one checkpoint, each micro-batch
    // committed to the source table and the IVF index advanced with a
    // per-batch append-only refresh (new vectors assigned against the
    // FROZEN first-wave pivots — the IVF contract; cost ∝ the batch).
    // Probe-all search is then EXACT, so the stream-fed index must
    // equal brute-force cosine over everything ingested — the oracle.
    QueryDef("q187_stream_vector_index",
      (s, dir) => {
        val root = graft.TempRoots.create("graft_svi")
        val src = "file://" + root + "/emb"
        val idx = "file://" + root + "/vidx"
        val emb = Tables.load(s, dir, "embeddings")
        val cut = emb.agg(max("vec_id")).head().getLong(0) / 2
        val schema = emb.schema
        def drain(): Unit = IngestStream
          // one micro-batch per wave (q184's lesson: file order is not
          // id order; the refresh itself is order-safe, this just keeps
          // commit counts deterministic)
          .rawStream(s, s"$root/raw", schema, "parquet",
            maxFilesPerTrigger = 100000)
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger
            .AvailableNow())
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, id: Long) =>
              Manifest.commitStreamBatch(s, src, b, "ingest", id)
              if (Manifest.latestVersion(s, idx).isEmpty)
                VectorIndex.createFromManifest(s, src, idx, "vec_id",
                  "embedding", nCells = 8)
              else VectorIndex.refresh(s, src, idx)
              ()
          }
          .start().awaitTermination()
        emb.filter(col("vec_id") <= cut)
          .write.mode("append").parquet(s"$root/raw")
        drain()
        emb.filter(col("vec_id") > cut)
          .write.mode("append").parquet(s"$root/raw")
        drain()
        val qv = emb.filter(col("vec_id") === 7L)
          .select(graft.functions.Vectors.toDouble(col("embedding")))
          .collect().head.getSeq[Double](0).toArray
        VectorIndex.search(s, idx, qv, k = 10, nProbe = 8)
          .select(col("id").as("vec_id"),
            round(col("cosine"), 6).as("cosine"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT e.vec_id,
            list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
          FROM e, q
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 10)"""),
      kind = QueryDef.Pipeline),

    // ---- T2/K5: INDEX ALIAS / ZERO-DOWNTIME REINDEX — the ES
    // alias-swap analog: queries address a named alias; a replacement
    // index (here with a different bucket count — a create-time
    // parameter an in-place refresh can never change) is built at a
    // NEW root while the old one keeps serving, then ONE atomic
    // generation-file claim repoints the alias. Three query phases
    // prove the contract: (1) before the rebuild and (2) after the
    // rebuild but BEFORE the swap both serve the OLD corpus untouched;
    // (3) after the swap serves the new — old-then-new wholesale,
    // never a mix.
    QueryDef("q188_index_alias",
      (s, dir) => {
        val root = graft.TempRoots.create("graft_alias")
        val alias = "file://" + root + "/alias"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        val qq = "window merge scan"
        def phase(p: Int) = IndexAlias.searchBm25(s, alias, qq, 10)
          .select(lit(p).as("phase"), col("doc_id"), col("score"),
            col("matched"))
        Manifest.init(s, "file://" + root + "/srcA",
          docs.filter(col("doc_id") % 5 =!= 0))
        SearchIndex.create(s, "file://" + root + "/srcA",
          "file://" + root + "/idxA", "doc_id", "text", buckets = 16)
        IndexAlias.set(s, alias, "file://" + root + "/idxA")
        val p1 = phase(1)
        // zero-downtime reindex: the full corpus, re-bucketed, at a
        // new root — the alias (and p1's pinned plan) still serve A
        Manifest.init(s, "file://" + root + "/srcB", docs)
        SearchIndex.create(s, "file://" + root + "/srcB",
          "file://" + root + "/idxB", "doc_id", "text", buckets = 32)
        val p2 = phase(2) // resolved after the rebuild, before the swap
        IndexAlias.set(s, alias, "file://" + root + "/idxB") // THE swap
        val p3 = phase(3)
        p1.unionByName(p2).unionByName(p3)
          .orderBy(col("phase"), col("doc_id"))
      },
      Some("""WITH old0 AS (SELECT doc_id, text FROM documents
            WHERE doc_id % 5 <> 0),
        t0 AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM old0),
        dl0 AS (SELECT doc_id, count(*) AS dl FROM t0 GROUP BY 1),
        s0 AS (SELECT avg(dl) AS avgdl FROM dl0),
        n0 AS (SELECT count(*) AS n FROM old0),
        q AS (SELECT unnest(['window', 'merge', 'scan']) AS token),
        tf0 AS (SELECT doc_id, token, count(*) AS tf
          FROM t0 JOIN q USING (token) GROUP BY 1, 2),
        df0 AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf0 GROUP BY 1),
        r0 AS (SELECT tf0.doc_id,
            round(sum(ln(1 + (n0.n - df0.df + 0.5) / (df0.df + 0.5))
              * tf0.tf * 2.2
              / (tf0.tf + 1.2 * (0.25 + 0.75 * dl0.dl / s0.avgdl))), 4)
              AS score,
            count(*) AS matched
          FROM tf0 JOIN df0 USING (token) JOIN dl0 USING (doc_id)
            CROSS JOIN n0 CROSS JOIN s0
          GROUP BY tf0.doc_id
          ORDER BY score DESC, tf0.doc_id ASC LIMIT 10),
        t1 AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        dl1 AS (SELECT doc_id, count(*) AS dl FROM t1 GROUP BY 1),
        s1 AS (SELECT avg(dl) AS avgdl FROM dl1),
        n1 AS (SELECT count(*) AS n FROM documents),
        tf1 AS (SELECT doc_id, token, count(*) AS tf
          FROM t1 JOIN q USING (token) GROUP BY 1, 2),
        df1 AS (SELECT token, count(DISTINCT doc_id) AS df
          FROM tf1 GROUP BY 1),
        r1 AS (SELECT tf1.doc_id,
            round(sum(ln(1 + (n1.n - df1.df + 0.5) / (df1.df + 0.5))
              * tf1.tf * 2.2
              / (tf1.tf + 1.2 * (0.25 + 0.75 * dl1.dl / s1.avgdl))), 4)
              AS score,
            count(*) AS matched
          FROM tf1 JOIN df1 USING (token) JOIN dl1 USING (doc_id)
            CROSS JOIN n1 CROSS JOIN s1
          GROUP BY tf1.doc_id
          ORDER BY score DESC, tf1.doc_id ASC LIMIT 10)
        SELECT phase, doc_id, score, matched FROM (
          SELECT 1 AS phase, * FROM r0
          UNION ALL SELECT 2 AS phase, * FROM r0
          UNION ALL SELECT 3 AS phase, * FROM r1)
        ORDER BY phase, doc_id"""),
      kind = QueryDef.Pipeline),

    // ---- T2: FUZZY VIA THE N-GRAM TERM-DICTIONARY TWIN — q180's
    // query served with a fully pruned plan (Lucene's fuzzy design:
    // bound the candidate vocabulary first, then read only the matched
    // variants' postings): the twin scan prunes to the query's padded
    // 3-gram partitions under the shared-gram lower bound, levenshtein
    // verifies the tiny candidate set, and the postings scan prunes to
    // those variants' term buckets. maxEdits = 1 keeps the gram bound
    // binding (5 distinct grams − 3 > 0 — the pruned path, not the
    // dictionary fallback), and 'merje' has a real 1-edit vocabulary
    // neighbor ('merge'); same integer score arithmetic as q149/q180.
    QueryDef("q189_fuzzy_twin",
      (s, dir) => {
        val root = graft.TempRoots.create("graft_fzt")
        val src = "file://" + root + "/src"
        val idx = "file://" + root + "/idx"
        val twin = "file://" + root + "/twin"
        Manifest.init(s, src,
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        SearchIndex.create(s, src, idx, "doc_id", "text", buckets = 16)
        SearchIndex.createFuzzyTwin(s, idx, twin)
        SearchIndex.matchFuzzyFromTwin(s, idx, twin, "merje", k = 20,
          maxEdits = 1)
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents),
        c AS (SELECT doc_id, token FROM t
          WHERE abs(length(token) - 5) <= 1
            AND levenshtein(token, 'merje') <= 1),
        tf AS (SELECT doc_id, token, count(*) AS tf,
            levenshtein(token, 'merje') AS dist
          FROM c GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(tf * (2 - dist)) AS BIGINT) AS score,
          count(*) AS matched
        FROM tf GROUP BY 1
        ORDER BY score DESC, doc_id ASC LIMIT 20"""),
      kind = QueryDef.Pipeline),

    // ---- T2/K5: the search-index lifecycle driven ENTIRELY from SQL —
    // CREATE TABLE / INSERT build the corpus, CALL create_search_index
    // materializes the index as a catalog table, a second INSERT +
    // CALL refresh_search_index advances it incrementally, and CALL
    // search serves the BM25 page — the whole OpenSearch tier for a
    // SQL-only session (the reference's users drive indexing through
    // an API; here the API is the catalog's procedure namespace).
    QueryDef("q191_sql_search_ddl",
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graftsql",
          classOf[graft.sources.connector.ManifestCatalog].getName)
        if (s.conf.getOption("spark.sql.catalog.graftsql.root").isEmpty)
          s.conf.set("spark.sql.catalog.graftsql.root",
            "file://" + graft.TempRoots.create("graft_sqlcat"))
        Tables.load(s, dir, "documents").select("doc_id", "text")
          .createOrReplaceTempView("q191_docs")
        s.sql("DROP TABLE IF EXISTS graftsql.db.sdocs")
        s.sql("DROP TABLE IF EXISTS graftsql.db.sdocs_idx")
        s.sql("CREATE TABLE graftsql.db.sdocs (doc_id BIGINT, " +
          "text STRING)")
        s.sql("INSERT INTO graftsql.db.sdocs SELECT doc_id, text " +
          "FROM q191_docs WHERE doc_id % 3 <> 0")
        s.sql("CALL graftsql.system.create_search_index(" +
          "table => 'db.sdocs', index => 'db.sdocs_idx', " +
          "id_col => 'doc_id', text_col => 'text', buckets => 16)")
        s.sql("INSERT INTO graftsql.db.sdocs SELECT doc_id, text " +
          "FROM q191_docs WHERE doc_id % 3 = 0")
        s.sql("CALL graftsql.system.refresh_search_index(" +
          "table => 'db.sdocs', index => 'db.sdocs_idx')")
        s.sql("CALL graftsql.system.search(index => 'db.sdocs_idx', " +
            "query => 'window merge scan', k => 15)")
          .select(col("id").cast("long").as("doc_id"), col("score"),
            col("matched"))
      },
      Some("""WITH t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token
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
        ORDER BY score DESC, tf.doc_id ASC LIMIT 15"""),
      kind = QueryDef.Pipeline),

    // ---- the ERASURE path propagated through the serving tier (the
    // GDPR right-to-be-forgotten / takedown shape): deleteByKeys
    // commits the forgotten ids as a merge-on-read delete file —
    // O(keys), zero data rewrite at any corpus size — rewriteDeletes
    // materializes post-images of ONLY the files that can hold a
    // forgotten key (zone-map/bloom-narrowed planning), and the
    // index's file-diff refresh erases exactly the rewritten files'
    // docs and re-indexes their survivors: no step ever touches the
    // unaffected corpus. The oracle recomputes BM25 over the retained
    // documents — hash-equality proves no forgotten doc can surface
    // AND every survivor rescored against the post-delete N/avgdl.
    QueryDef("q197_forget_search",
      (s, dir) => {
        val base = "file://" + graft.TempRoots.create("graft_forget")
        val src = s"$base/t"; val idx = s"$base/i"
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text")
        val key = "spark.graft.manifest.write.clustered"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "true")
        try {
          Manifest.init(s, src, docs, Seq("lang"))
          SearchIndex.create(s, src, idx, "doc_id", "text",
            buckets = 16)
          Manifest.deleteByKeys(s, src,
            docs.filter(col("doc_id") % 23 === 0).select("doc_id"))
          // pure merge-on-read propagation: the refresh erases the
          // forgotten docs from the index (same-id MoR delete, stats
          // decremented in the same commit) with ZERO rewrite on
          // either side — the O(erased docs) erasure path
          SearchIndex.refresh(s, src, idx)
          // then materialize (narrowed to the keys' home files) and
          // refresh again — the rewrite path must be a semantic no-op
          Manifest.rewriteDeletes(s, src)
          SearchIndex.refresh(s, src, idx)
        } finally {
          prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        }
        SearchIndex.searchBm25(s, idx, "window merge scan", 15)
      },
      Some("""WITH src AS (SELECT doc_id, text FROM documents
          WHERE doc_id % 23 <> 0),
        t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM src),
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

    // ---- the ERASURE lifecycle from a SQL-ONLY session (the
    // OpenSearch delete-by-query analog): keyed DELETE FROM routes
    // merge-on-read (zero rewrite), CALL rewrite_deletes materializes
    // only the forgotten keys' home files, CALL refresh_search_index
    // heals the index from the file diff, CALL search serves the
    // retained corpus. Same oracle as q197 — a SQL user and a Scala
    // user must see the identical post-erasure ranking. The id list
    // arrives as an explicit IN — the shape of a real takedown/GDPR
    // request (bounded by the REQUEST, not the corpus; the collect
    // here only synthesizes that external list deterministically).
    QueryDef("q199_sql_forget",
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graftsql",
          classOf[graft.sources.connector.ManifestCatalog].getName)
        if (s.conf.getOption("spark.sql.catalog.graftsql.root").isEmpty)
          s.conf.set("spark.sql.catalog.graftsql.root",
            "file://" + graft.TempRoots.create("graft_sqlcat"))
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        docs.createOrReplaceTempView("q199_docs")
        val forget = docs.filter(col("doc_id") % 23 === 0)
          .select("doc_id").as[Long](org.apache.spark.sql.Encoders
            .scalaLong).collect().sorted
        s.sql("DROP TABLE IF EXISTS graftsql.db.fdocs")
        s.sql("DROP TABLE IF EXISTS graftsql.db.fdocs_idx")
        s.sql("CREATE TABLE graftsql.db.fdocs (doc_id BIGINT, " +
          "text STRING)")
        s.sql("INSERT INTO graftsql.db.fdocs SELECT doc_id, text " +
          "FROM q199_docs")
        s.sql("CALL graftsql.system.create_search_index(" +
          "table => 'db.fdocs', index => 'db.fdocs_idx', " +
          "id_col => 'doc_id', text_col => 'text', buckets => 16)")
        s.conf.set("spark.graft.manifest.delete.mode", "merge-on-read")
        try s.sql("DELETE FROM graftsql.db.fdocs WHERE doc_id IN (" +
          forget.mkString(", ") + ")")
        finally s.conf.unset("spark.graft.manifest.delete.mode")
        s.sql("CALL graftsql.system.rewrite_deletes(" +
          "table => 'db.fdocs')")
        s.sql("CALL graftsql.system.refresh_search_index(" +
          "table => 'db.fdocs', index => 'db.fdocs_idx')")
        s.sql("CALL graftsql.system.search(index => 'db.fdocs_idx', " +
            "query => 'window merge scan', k => 15)")
          .select(col("id").cast("long").as("doc_id"), col("score"),
            col("matched"))
      },
      Some("""WITH src AS (SELECT doc_id, text FROM documents
          WHERE doc_id % 23 <> 0),
        t AS (SELECT doc_id,
            unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM src),
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

    // ---- the same erasure propagated through the DENSE index: MoR
    // delete of the forgotten vectors → narrowed materialization →
    // VectorIndex.refresh sees a rewrite and REBUILDS (re-training is
    // how an IVF index forgets — stale pivots would keep clustering
    // around deleted mass). Probe-all search = brute-force cosine over
    // the retained vectors, which is exactly what the oracle computes.
    QueryDef("q198_forget_vector",
      (s, dir) => {
        val base = "file://" + graft.TempRoots.create("graft_forgetv")
        val src = s"$base/t"; val idx = s"$base/v"
        val emb = Tables.load(s, dir, "embeddings")
        Manifest.init(s, src, emb)
        VectorIndex.createFromManifest(s, src, idx, "vec_id",
          "embedding", nCells = 8)
        Manifest.deleteByKeys(s, src,
          emb.filter(col("vec_id") % 13 === 0).select("vec_id"))
        // pure merge-on-read propagation: the erased ids land as a
        // MoR delete on the index (zero rewrite, frozen pivots)
        VectorIndex.refresh(s, src, idx)
        // then materialize and refresh again — the rewrite path
        // rebuilds (re-trains) and must land on the same answer
        Manifest.rewriteDeletes(s, src)
        VectorIndex.refresh(s, src, idx)
        val qv = emb.filter(col("vec_id") === 7L)
          .select(graft.functions.Vectors.toDouble(col("embedding")))
          .collect().head.getSeq[Double](0).toArray
        VectorIndex.search(s, idx, qv, k = 10, nProbe = 8)
          .select(col("id").as("vec_id"),
            round(col("cosine"), 6).as("cosine"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id % 13 <> 0),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id = 7)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT e.vec_id,
            list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
          FROM e, q
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 10)"""),
      kind = QueryDef.Pipeline))
}
