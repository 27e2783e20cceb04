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
        WHERE tf > 0 ORDER BY tf DESC, doc_id ASC LIMIT 20""")))
}
