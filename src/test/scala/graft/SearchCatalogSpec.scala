package graft

import org.apache.spark.sql.functions._

import graft.operators.{QueryService, Search}
import graft.sources.Catalog

class SearchCatalogSpec extends SparkSpec {

  import spark.implicits._

  test("bulkIndex assigns dense 1..N ids in order-column order, " +
    "with no global single-partition window") {
    val df = spark.range(1, 501).toDF("k")
      .withColumn("k", col("k") * 7 % 500) // scrambled order column
      .distinct()
    val n = df.count()
    val indexed = Search.bulkIndex(df, "k")
    val ids = indexed.orderBy("k").select("_id").as[Long].collect()
    assert(ids.length == n)
    assert(ids.toSeq == (1L to n).toSeq) // dense, ordered by k
  }

  test("upsert: last writer wins by key, new keys appended") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val merged = Catalog.upsert(existing, updates, "id")
      .as[(Long, String)].collect().toSet
    assert(merged == Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("mergeInto: merges touched partitions, leaves untouched " +
    "partition files byte-identical") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-merge-spec").toString + "/t"
    val base = Seq(
      (1L, "a", 10), (2L, "a", 20),
      (3L, "b", 30), (4L, "b", 40),
      (5L, "c", 50))
      .toDF("id", "part", "v")
    base.write.partitionBy("part").parquet(root)
    def files(p: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$root/part=$p")
      Option(d.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    }
    val (beforeB, beforeC) = (files("b"), files("c"))
    assert(beforeB.nonEmpty && beforeC.nonEmpty)
    // updates touch partition "a" only: update id=2, insert id=6
    val updates = Seq((2L, "a", 99), (6L, "a", 60)).toDF("id", "part", "v")
    Catalog.mergeInto(spark, root, updates, "id", "part")
    val got = spark.read.parquet(root)
      .select("id", "part", "v").as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "a", 99), (6L, "a", 60),
      (3L, "b", 30), (4L, "b", 40), (5L, "c", 50)))
    // untouched partitions: same files, same sizes, same mtimes
    assert(files("b") == beforeB, "partition b was rewritten")
    assert(files("c") == beforeC, "partition c was rewritten")
    // staging dir cleaned up
    assert(!new java.io.File(root + "__merge_staging").exists)
  }

  test("mergeInto: updates touching the NULL partition keep its " +
    "existing rows (null-safe semi join)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-merge-null").toString + "/t"
    Seq((1L, Option("a"), 10), (2L, Option.empty[String], 20),
      (3L, Option.empty[String], 30))
      .toDF("id", "part", "v")
      .write.partitionBy("part").parquet(root)
    // touch the null partition: update id=2, insert id=4
    Catalog.mergeInto(spark, root,
      Seq((2L, Option.empty[String], 99), (4L, Option.empty[String], 40))
        .toDF("id", "part", "v"),
      "id", "part")
    val got = spark.read.parquet(root)
      .select("id", "part", "v")
      .as[(Long, Option[String], Int)].collect().toSet
    // id=3 lives in the null partition but was not in the updates — a
    // plain equi-join semi join loses it when the partition rewrites
    assert(got == Set((1L, Some("a"), 10), (2L, None, 99),
      (3L, None, 30), (4L, None, 40)), got)
  }

  test("markIndexed flips only matching ids") {
    val meta = Seq(("a", false), ("b", false)).toDF("id", "indexed")
      .withColumn("indexedAt", lit(null).cast("timestamp"))
    val at = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val ids = Seq("b").toDF("id")
    val out = Catalog.markIndexed(meta, ids, "id", at)
      .select("id", "indexed").as[(String, Boolean)].collect().toMap
    assert(!out("a") && out("b"))
  }

  test("enrichWithMetadata synthesizes fallback location without a UDF") {
    val content = Seq(("1", "x"), ("2", "y")).toDF("id", "text")
    val meta = Seq(("1", "s3://real/1")).toDF("id", "s3Location")
    val out = QueryService.enrichWithMetadata(content, meta,
        id => concat(lit("stub://"), id))
      .select("id", "s3Location").as[(String, String)].collect().toMap
    assert(out("1") == "s3://real/1")
    assert(out("2") == "stub://2")
  }

  test("metadata search: conjunctive filter + recency order + limit") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val meta = Seq(
      ("a", "csv", t("2024-01-01 10:00:00")),
      ("b", "csv", t("2024-01-01 11:00:00")),
      ("c", "json", t("2024-01-01 12:00:00")),
      ("d", "csv", t("2024-01-01 13:00:00")))
      .toDF("id", "dataType", "timestamp")
    val got = Catalog.search(meta,
        Catalog.MetaFilter(dataType = Some("csv"), limit = 2))
      .select("id").as[String].collect().toSeq
    assert(got == Seq("d", "b")) // most recent first, json excluded
  }

  test("searchAfter: keyset pages stitch into the full ordering, " +
    "no overlap, ties broken by id") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val meta = Seq(
      ("a", "csv", t("2024-01-01 10:00:00")),
      ("b", "csv", t("2024-01-01 11:00:00")),
      ("b2", "csv", t("2024-01-01 11:00:00")), // tie with b on ts
      ("c", "csv", t("2024-01-01 12:00:00")),
      ("d", "csv", t("2024-01-01 13:00:00")))
      .toDF("id", "dataType", "timestamp")
    val f = Catalog.MetaFilter(dataType = Some("csv"), limit = 2)
    val page1 = Catalog.search(meta, f)
      .select("id", "timestamp")
      .as[(String, java.sql.Timestamp)].collect().toSeq
    assert(page1.map(_._1) == Seq("d", "c"))
    val (lastId, lastTs) = (page1.last._1, page1.last._2)
    val page2 = Catalog.searchAfter(meta, f, lastTs, lastId)
      .select("id").as[String].collect().toSeq
    assert(page2 == Seq("b", "b2")) // tie ordered id ASC, no overlap
    val page3 = Catalog.searchAfter(meta, f, t("2024-01-01 11:00:00"), "b2")
      .select("id").as[String].collect().toSeq
    assert(page3 == Seq("a"))
  }

  test("tags filter: AND-combined array_contains over a real " +
    "ArrayType(StringType) column (reference query-data-lambda.py:142)") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val meta = Seq(
      ("a", Seq("en", "web", "long"), t("2024-01-01 10:00:00")),
      ("b", Seq("en", "web"), t("2024-01-01 11:00:00")),
      ("c", Seq("de", "long"), t("2024-01-01 12:00:00")),
      ("d", Seq("long", "en"), t("2024-01-01 13:00:00")))
      .toDF("id", "tags", "timestamp")
    // ALL requested tags must be present (AND fold), order-independent
    val got = Catalog.search(meta,
        Catalog.MetaFilter(tags = Seq("en", "long"), limit = 10))
      .select("id").as[String].collect().toSeq
    assert(got == Seq("d", "a"))
    // single tag keeps the superset rows
    val one = Catalog.search(meta,
        Catalog.MetaFilter(tags = Seq("long"), limit = 10))
      .select("id").as[String].collect().toSet
    assert(one == Set("a", "c", "d"))
  }

  test("rankBm25: scores match a hand-computed BM25, rare terms beat " +
    "common ones, non-matching docs are absent") {
    val docs = Seq(
      (1L, "spark spark spark common common"),
      (2L, "rare common"),
      (3L, "common common common common"),
      (4L, "nothing here matches at all"))
      .toDF("doc_id", "text")
    val got = Search.rankBm25(docs, "doc_id", "text", "spark rare", 10)
      .select("doc_id", "score", "matched")
      .as[(Long, Double, Long)].collect()
      .map { case (id, s, m) => id -> ((s, m)) }.toMap
    // hand-computed: N=4, avgdl=(5+2+4+5)/4=4.0
    def bm25(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1 + (4.0 - df + 0.5) / (df + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 4.0))
    }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L)) // doc 3/4: no query term
    assert(got(1L) == ((r4(bm25(3, 1, 5)), 1L)))
    assert(got(2L) == ((r4(bm25(1, 1, 2)), 1L)))
    // a doc matching BOTH terms outranks single-term docs of equal tf
    val both = Search.rankBm25(
      docs.union(Seq((5L, "spark rare")).toDF("doc_id", "text")),
      "doc_id", "text", "spark rare", 1)
      .select("doc_id").as[Long].head()
    assert(both == 5L)
    // operator=and: only the doc containing EVERY term ranks
    val conj = Search.rankBm25(
      docs.union(Seq((5L, "spark rare")).toDF("doc_id", "text")),
      "doc_id", "text", "spark rare", 10, requireAll = true)
      .select("doc_id").as[Long].collect().toSeq
    assert(conj == Seq(5L))
  }

  test("rankBm25Batch: each query's top-k equals the single-query " +
    "rankBm25 for the same corpus") {
    val docs = Seq(
      (1L, "spark spark spark common common"),
      (2L, "rare common"),
      (3L, "common common common common"),
      (4L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "spark rare"), (20L, "common"), (30L, "beta"))
      .toDF("query_id", "qtext")
    val batch = Search.rankBm25Batch(
        docs, "doc_id", "text", qs, "query_id", "qtext", 3)
      .select("query_id", "doc_id", "score", "matched")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSeq)
      .toMap
    for ((qid, qtext) <- Seq(10L -> "spark rare", 20L -> "common",
        30L -> "beta")) {
      val single = Search.rankBm25(docs, "doc_id", "text", qtext, 3)
        .select("doc_id", "score", "matched")
        .as[(Long, Double, Long)].collect().toSeq
      assert(batch(qid) == single, s"query $qid diverged from rankBm25")
    }
  }

  test("rankBm25Batch requireAll: per-query conjunctive gate equals the " +
    "single-query requireAll result") {
    val docs = Seq(
      (1L, "spark rare common"),
      (2L, "spark common"),
      (3L, "rare common"),
      (4L, "alpha beta"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "spark rare"), (20L, "common alpha"))
      .toDF("query_id", "qtext")
    val batch = Search.rankBm25Batch(docs, "doc_id", "text",
        qs, "query_id", "qtext", 5, requireAll = true)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    // q10: only doc 1 has BOTH spark and rare; q20: no doc has both
    // common and alpha
    assert(batch == Set((10L, 1L)))
    for ((qid, qtext) <- Seq(10L -> "spark rare", 20L -> "common alpha")) {
      val single = Search.rankBm25(docs, "doc_id", "text", qtext, 5,
          requireAll = true)
        .select("doc_id").as[Long].collect().toSet
      assert(batch.collect { case (q, d) if q == qid => d } == single)
    }
  }

  test("phraseMatches: adjacency required, order required, overlapping " +
    "occurrences counted, repeated-term phrases handled") {
    val docs = Seq(
      (1L, "big window merge now"),       // exact phrase once
      (2L, "merge window"),               // both terms, wrong order
      (3L, "window x merge"),             // both terms, gap
      (4L, "window merge window merge"),  // phrase twice
      (5L, "no terms at all"))
      .toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id", "text", "window merge")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 4L -> 2L))
    // repeated-term phrase: "data data" needs two ADJACENT 'data'
    val rep = Seq(
      (1L, "x data data y"),   // one occurrence
      (2L, "data x data"),     // not adjacent
      (3L, "data data data"))  // overlapping: anchors 0 and 1
      .toDF("doc_id", "text")
    val gotRep = Search.phraseMatches(rep, "doc_id", "text", "data data")
      .as[(Long, Long)].collect().toMap
    assert(gotRep == Map(1L -> 1L, 3L -> 2L))
  }

  test("rankPhrase: only phrase-matching docs rank, scored as BM25 with " +
    "the phrase as one term (tf = phrase freq, df = phrase doc count)") {
    val docs = Seq(
      (1L, "window merge a b c"),            // tf=1, dl=5
      (2L, "window merge window merge"),     // tf=2, dl=4
      (3L, "merge window merge window x y"), // window@1 merge@2 → tf=1
      (4L, "window x merge"))                // gap: no phrase
      .toDF("doc_id", "text")
    val got = Search.rankPhrase(docs, "doc_id", "text", "window merge", 10)
      .select("doc_id", "score", "phrase_tf")
      .as[(Long, Double, Long)].collect()
      .map { case (id, s, tf) => id -> ((s, tf)) }.toMap
    val n = 4.0
    val df = 3.0 // docs 1, 2, 3 contain the phrase
    val avgdl = (5 + 4 + 6 + 3) / 4.0
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def bm25(tf: Long, dl: Long): Double = {
      val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((r4(bm25(1, 5)), 1L)))
    assert(got(2L) == ((r4(bm25(2, 4)), 2L)))
    assert(got(3L) == ((r4(bm25(1, 6)), 1L)))
  }

  test("matchFuzzy: planted typos within maxEdits retrieve, weighted by " +
    "closeness; beyond maxEdits excluded; score = sum tf*(3-dist)") {
    val docs = Seq(
      (1L, "spark spark engine"),  // exact 'spark' x2: 2*(3-0)=6
      (2L, "sprak engine"),        // dist-2 variant:   1*(3-2)=1
      (3L, "spar engine"),         // dist-1 variant:   1*(3-1)=2
      (4L, "spork spar"),          // spork d1 + spar d1: 2+2=4
      (5L, "zzzzzzzz engine"))     // nothing within 2 edits
      .toDF("doc_id", "text")
    val got = Search.matchFuzzy(docs, "doc_id", "text", "spark", 10)
      .select("doc_id", "score", "matched")
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, m) => id -> ((s, m)) }.toMap
    assert(got == Map(
      1L -> ((6L, 1L)), 2L -> ((1L, 1L)),
      3L -> ((2L, 1L)), 4L -> ((4L, 2L))))
    // ordering: score desc, id asc
    val order = Search.matchFuzzy(docs, "doc_id", "text", "spark", 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(order == Seq(1L, 4L, 3L, 2L))
  }

  test("searchBool: must gates, must_not excludes, should only boosts") {
    val docs = Seq(
      (1L, "alpha beta gamma"),   // must both, no banned → ranks
      (2L, "alpha beta bad"),     // banned term → excluded
      (3L, "alpha gamma gamma"),  // missing must 'beta' → gated out
      (4L, "alpha beta"),         // must both, no should
      (5L, "beta gamma"))         // missing must 'alpha' → gated out
      .toDF("doc_id", "text")
    val got = Search.searchBool(docs, "doc_id", "text",
      must = Seq("alpha", "beta"), should = Seq("gamma"),
      mustNot = Seq("bad"), k = 10)
      .select("doc_id", "matched").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 4L))
    assert(got(1L) == 3L && got(4L) == 2L) // should term counts when hit
    // the should term boosts: doc 1 (3 terms) outranks doc 4 (2 terms)
    val order = Search.searchBool(docs, "doc_id", "text",
      Seq("alpha", "beta"), Seq("gamma"), Seq("bad"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(order == Seq(1L, 4L))
    // guard: a term cannot be both scored and excluded
    intercept[IllegalArgumentException] {
      Search.searchBool(docs, "doc_id", "text",
        Seq("alpha"), Nil, Seq("alpha"), 5)
    }
  }

  test("facetedSearch: per-facet counts over ALL matching docs, " +
    "order-independent metrics") {
    val docs = Seq(
      (1L, "en", "alpha beta"),
      (2L, "en", "alpha alpha"),
      (3L, "de", "beta"),
      (4L, "de", "nothing relevant"),
      (5L, "fr", "gamma only"))
      .toDF("doc_id", "lang", "text")
    val got = Search.facetedSearch(docs, "doc_id", "text",
      "alpha beta", "lang")
      .select("lang", "n_docs", "matched_terms")
      .as[(String, Long, Long)].collect().toSeq
    // en: docs 1 (2 terms) + 2 (1 term); de: doc 3 (1 term); fr: none
    assert(got == Seq(("de", 1L, 1L), ("en", 2L, 3L)))
    // top_score equals the best single-doc rankBm25 score in the facet
    val best = Search.rankBm25(docs, "doc_id", "text", "alpha beta", 10)
      .filter(col("doc_id").isin(1L, 2L))
      .agg(max("score")).as[Double].head()
    val enTop = Search.facetedSearch(docs, "doc_id", "text",
      "alpha beta", "lang")
      .filter(col("lang") === "en")
      .select("top_score").as[Double].head()
    assert(enTop == best)
  }
}
