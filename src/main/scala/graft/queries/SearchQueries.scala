package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.Search

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
        ORDER BY query_id ASC, score DESC, doc_id ASC""")))
}
