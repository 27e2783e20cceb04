package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Search}

/** Hand-computed fixtures for the round-11 retrieval family: hybrid
  * RRF fusion, more-like-this, significant terms, highlighting,
  * completion suggest, percolate, and the bigram-LM quality scorer.
  * Every expected value below is worked out by hand in the comments —
  * the DuckDB oracles (q155-q161) replay the same math at SF scale;
  * these pin the semantics on inputs small enough to eyeball. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def docs4 = Seq(
    (1L, "apple banana"),
    (2L, "apple apple cherry"),
    (3L, "durian fig"),
    (4L, "banana fig")).toDF("doc_id", "text")

  test("hybridRrf: fuses hand-computed sparse and dense ranks; a doc " +
    "missing from one leg gets that leg's contribution as 0 (NULL rank)") {
    // dense: query vec 1 → cos(2)=0.994, cos(3)=0, cos(4)=-1 → ranks 2,3,4
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    // sparse ("apple"): doc2 (tf=2) outranks doc1 (tf=1) → ranks 2,1
    val out = Search.hybridRrf(docs4, emb, "doc_id", "text",
        "vec_id", "embedding", "apple", queryVecId = 1L, k = 4,
        kEach = 3)
      .select("doc_id", "rrf", "sparse_rank", "dense_rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // rrf: doc2 = 1/61 + 1/61 = .032787; doc1 = 1/62 = .016129;
    // doc3 = 1/62 = .016129 (ties doc1 → id asc); doc4 = 1/63 = .015873
    assert(out.toSeq == Seq(
      (2L, 0.032787, 1L, 1L),
      (1L, 0.016129, 2L, -1L),
      (3L, 0.016129, -1L, 2L),
      (4L, 0.015873, -1L, 3L)))
  }

  test("moreLikeThis: selects the seed's top tf-idf terms (rare beats " +
    "common) and ranks only other docs containing them") {
    val docs = Seq(
      (1L, "rare rare common"), // seed: 'rare' tf=2 df=2, 'common' df=4
      (2L, "common stuff"),
      (3L, "rare common"),
      (4L, "common other")).toDF("doc_id", "text")
    // mTerms=1 → only 'rare' (tfidf ln(1+(4-2+.5)/2.5)*2=1.386 vs
    // 'common' ln(1+.5/4.5)*1=.105); matching non-seed docs: only 3.
    val out = Search.moreLikeThis(docs, "doc_id", "text",
      seedId = 1L, mTerms = 1, k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
    assert(out.head.getLong(2) == 1L) // matched = 1 selected term
  }

  test("significantTerms: a foreground-only token scores the smoothed " +
    "ratio, a uniform token scores 1.0") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), // foreground (id <= 2)
      (3L, "y z"), (4L, "y z")).toDF("doc_id", "text")
    val out = Search.significantTerms(docs, "doc_id", "text",
        col("doc_id") <= 2, k = 10, minDocCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // x: fg_df=2 bg_df=0 → (2/2)/((0+1)/(2+1)) = 3.0
    // y: fg_df=2 bg_df=2 → (2/2)/((2+1)/(2+1)) = 1.0
    // z: fg_df=0 < minDocCount → dropped
    assert(out.toSeq == Seq(("x", 2L, 0L, 3.0), ("y", 2L, 2L, 1.0)))
  }

  test("highlight: snippet is the ±window token context of the FIRST " +
    "match, clamped at the document start") {
    val docs = Seq(
      (1L, "a b c term d e f"),  // anchor 3 → tokens [1..5]
      (2L, "term y z"),          // anchor 0 → clamp → tokens [0..2]
      (3L, "no match here")).toDF("doc_id", "text")
    val out = Search.highlight(docs, "doc_id", "text",
        Seq("term"), window = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, "b c term d e"),
      (2L, 0L, "term y z")))
  }

  test("suggest: frequency-ranked completions of the prefix, " +
    "alphabetical tie-break") {
    val docs = Seq(
      (1L, "scan scan sort"), (2L, "scan small banana"))
      .toDF("doc_id", "text")
    val out = Search.suggest(docs, "doc_id", "text", "s", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // scan freq 3 docs 2; small freq 1 docs 1; sort freq 1 docs 1
    assert(out.toSeq == Seq(("scan", 3L, 2L),
      ("small", 1L, 1L), ("sort", 1L, 1L)))
  }

  test("percolate: conjunctive match per registered query, one row per " +
    "query with 0/NULL for a no-match query") {
    val qs = Seq((1L, "apple"), (2L, "apple cherry"), (3L, "zzz"))
      .toDF("query_id", "qtext")
    val out = Search.percolate(docs4, "doc_id", "text",
        qs, "query_id", "qtext")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // q1 'apple' → docs 1,2; q2 'apple cherry' → doc 2; q3 → none
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 2L), (2L, 1L, 2L, 2L), (3L, 0L, -1L, -1L)))
  }

  test("rescore: combined = bm25 + cosine over the candidate window " +
    "only; the secondary signal can reorder the window") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Search.rescore(docs4, emb, "doc_id", "text",
        "vec_id", "embedding", "apple", queryVecId = 1L,
        windowN = 3, k = 3).collect()
    // window = BM25 'apple' hits {2: 0.8714, 1: 0.7262}; cosines to
    // v1: doc2 = .993884, doc1 = 1.0 → doc2 1.8653 > doc1 1.7262
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byId(1L)._3 == 1.0) // own-vector cosine
    assert(byId(2L)._2 == 0.8714 && byId(1L)._2 == 0.7262) // bm25 leg
    // combined is exactly round(score + cosine, 6) of its own columns
    for ((_, (comb, sc, cosRounded)) <- byId)
      assert(math.abs(comb - (sc + cosRounded)) < 1e-5)
  }

  test("bigramLmScores: add-0.5-smoothed bigram NLL, hand-checked; " +
    "rarer continuations score worse (higher)") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    // c12: (a,b)=2, (a,c)=1; c1(a)=3; V=3; α=.5
    // P(b|a) = 2.5/4.5 → nll .5878 ; P(c|a) = 1.5/4.5 → nll 1.0986
    val out = Curation.bigramLmScores(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (3L, 1.0986, 1L), (1L, 0.5878, 1L), (2L, 0.5878, 1L)))
  }

  private def spanTf(docs: org.apache.spark.sql.DataFrame,
                     phrase: String, slop: Int): Map[Long, Long] =
    Search.spanNearMatches(docs, "doc_id", "text", phrase, slop)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("spanNearMatches: window bound, in-order enforcement, multiple " +
    "heads, and greedy 3-term chains — all hand-checked") {
    val docs = Seq(
      (1L, "a b c"),      // a@0 c@2: gap 2 → slop 1 hits, slop 0 not
      (2L, "c x a"),      // c before a: never matches in-order 'a c'
      (3L, "a a c"),      // heads a@0 (c@2, span 2) and a@1 (span 1)
      (4L, "a b x c b"),  // 3-term: greedy a@0→b@1→c@3, span 3
      (5L, "x y z")       // no phrase terms at all
    ).toDF("doc_id", "text")
    // 'a c' bound = 1+slop
    assert(spanTf(docs, "a c", 0) == Map(3L -> 1L)) // only a@1,c@2
    assert(spanTf(docs, "a c", 1) == Map(1L -> 1L, 3L -> 2L))
    // in-order: doc 2 matches at NO slop, even a huge one
    assert(!spanTf(docs, "a c", 10).contains(2L))
    // 3-term 'a b c' bound = 2+slop: doc4 span 3 needs slop ≥ 1;
    // doc1 is exact-adjacent (span 2) at slop 0
    assert(spanTf(docs, "a b c", 0) == Map(1L -> 1L))
    assert(spanTf(docs, "a b c", 1) == Map(1L -> 1L, 4L -> 1L))
  }

  test("spanNearMatches: repeated phrase term consumes DISTINCT " +
    "positions; slop 0 equals exact phraseMatches") {
    val docs = Seq(
      (1L, "a x a"),   // 'a a' head a@0 → next a@2, span 2 → slop 1
      (2L, "a a"),     // exact adjacent
      (3L, "a")        // single occurrence can't chain to itself
    ).toDF("doc_id", "text")
    assert(spanTf(docs, "a a", 0) == Map(2L -> 1L))
    assert(spanTf(docs, "a a", 1) == Map(1L -> 1L, 2L -> 1L))
    // slop-0 ≡ phraseMatches on a mixed corpus (head-anchored count =
    // anchor count when every gap must be exactly 1)
    val mixed = Seq(
      (1L, "p q p q r"), (2L, "q p"), (3L, "p p q q"),
      (4L, "p q p q p q")).toDF("doc_id", "text")
    val exact = Search.phraseMatches(mixed, "doc_id", "text", "p q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spanTf(mixed, "p q", 0) == exact)
  }

  test("facetTopHits: top-k DOCS per facet bucket by BM25, planned " +
    "through the bounded-heap TopKPerGroup operator") {
    val docs = Seq(
      (1L, "a", "apple banana"), (2L, "a", "apple apple cherry"),
      (3L, "b", "durian fig"), (4L, "b", "banana apple"))
      .toDF("doc_id", "lang", "text")
    val out = Search.facetTopHits(docs, "doc_id", "text", "apple",
      "lang", kPerBucket = 1)
    // bucket a: doc2 (tf 2, dl 3) outscores doc1 (tf 1, dl 2) —
    // 4.4/3.5 > 2.2/2.1 per unit idf; bucket b: only doc4 matches
    assert(out.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 2L), ("b", 4L)))
    assert(out.queryExecution.executedPlan.toString
      .contains("TopKPerGroup"))
    // kPerBucket past the bucket sizes returns every matching doc
    val all = Search.facetTopHits(docs, "doc_id", "text", "apple",
        "lang", kPerBucket = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(all == Seq(("a", 2L), ("a", 1L), ("b", 4L)))
  }

  test("rankBm25Synonyms: variants pool into one concept (tf summed, " +
    "df = any-variant docs), zero-hit variants are inert, empty map " +
    "degenerates to rankBm25") {
    // pooling: 'cat feline' under cat→feline scores EXACTLY like
    // 'cat cat' under plain BM25 — same tf 2, df, dl, N
    val a = Seq((1L, "cat feline"), (2L, "cat dog"), (3L, "dog"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "cat cat"), (2L, "cat dog"), (3L, "dog"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSeq
    assert(rows(Search.rankBm25Synonyms(a, "doc_id", "text", "cat",
        Map("cat" -> Seq("feline")), 10)) ==
      rows(Search.rankBm25(b, "doc_id", "text", "cat", 10)))
    // a synonym with no occurrences changes nothing
    assert(rows(Search.rankBm25Synonyms(a, "doc_id", "text", "cat",
        Map("cat" -> Seq("feline", "unicorn")), 10)) ==
      rows(Search.rankBm25Synonyms(a, "doc_id", "text", "cat",
        Map("cat" -> Seq("feline")), 10)))
    // empty synonym map = plain BM25, bit for bit
    assert(rows(Search.rankBm25Synonyms(b, "doc_id", "text", "cat dog",
        Map.empty, 10)) ==
      rows(Search.rankBm25(b, "doc_id", "text", "cat dog", 10)))
  }

  test("rankBm25Synonyms: a variant shared by two concepts counts " +
    "toward BOTH (matched = 2 from a single shared token)") {
    val docs = Seq((1L, "pet"), (2L, "cat"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = Search.rankBm25Synonyms(docs, "doc_id", "text",
        "cat dog", Map("cat" -> Seq("pet"), "dog" -> Seq("pet")), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // doc1's lone 'pet' hits both concepts; doc2 hits only 'cat'
    assert(out == Seq((1L, 2L), (2L, 1L)))
  }

  test("spanNearMatches agrees with a brute-force greedy reference on " +
    "a 60-doc randomized corpus across phrases and slops") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d")
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val df = corpus.toDF("doc_id", "text")
    def ref(text: String, terms: Seq[String], slop: Int): Long = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val bound = terms.size - 1 + slop
      def greedyEnd(p0: Int): Option[Int] =
        terms.indices.tail.foldLeft(Option(p0)) { (cur, r) =>
          cur.flatMap(c => toks.zipWithIndex.collectFirst {
            case (t, i) if i > c && t == terms(r) => i
          })
        }
      toks.zipWithIndex.count { case (t, i) =>
        t == terms.head && greedyEnd(i).exists(_ - i <= bound)
      }
    }
    for (phrase <- Seq("a b", "a b c", "b a", "a a", "d c b a");
         slop <- Seq(0, 1, 3)) {
      val terms = phrase.split(" ").toSeq
      val want = corpus.map { case (i, t) => i -> ref(t, terms, slop) }
        .filter(_._2 > 0).toMap
      assert(spanTf(df, phrase, slop) == want,
        s"phrase=$phrase slop=$slop")
    }
  }

  test("rankNear: slop-0 scores equal rankPhrase scores (shared " +
    "one-term BM25 arithmetic)") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b a b"), (3L, "c d e f"),
      (4L, "b a")).toDF("doc_id", "text")
    val near = Search.rankNear(docs, "doc_id", "text", "a b", 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val phrase = Search.rankPhrase(docs, "doc_id", "text", "a b", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(near.toSeq == phrase.toSeq)
  }
}
