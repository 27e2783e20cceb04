package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE train/encode/accounting against the classic hand-computed
  * example (Sennrich et al. 2016's low/lower/newest/widest corpus):
  * every merge decision, the tie-break order, the greedy fold, and
  * the join-back accounting are pinned by hand here; the registered
  * q221/q222/q223 DuckDB oracles replay the same chain at data scale. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // word frequencies: low×5, lower×2, newest×6, widest×3 — one doc
  // per occurrence keeps wordVocab honest about weighting
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("train learns the hand-computed merge sequence with Sennrich's " +
    "end-of-word marker, ties broken by (count DESC, pair ASC)") {
    val merges = Bpe.train(corpus, "text", 4)
    // symbols: low = l o w</w>; lower = l o w e r</w>;
    //   newest = n e w e s t</w>; widest = w i d e s t</w>
    // round 1: (e,s)=9 ties (s,t</w>)=9 → pair-ascending picks (e,s)
    // round 2: (es,t</w>)=9; round 3: (l,o)=7
    // round 4: THE MARKER'S POINT — without it (lo,w) pools low's
    // word-final w with lower's internal w at 7 and wins; with it they
    // split 5/2, so the 6-count tie (e,w)/(n,e)/(w,est</w>) resolves
    // pair-ascending to (e,w)
    assert(merges.map(m => (m.rank, m.left, m.right)) ==
      Seq((1, "e", "s"), (2, "es", "t</w>"), (3, "l", "o"),
        (4, "e", "w")))
    assert(merges.map(_.merged) == Seq("es", "est</w>", "lo", "ew"))
  }

  test("encode applies merges in rank order with the greedy " +
    "left-to-right fold; word-final pieces carry the marker") {
    val merges = Bpe.train(corpus, "text", 4)
    val enc = Bpe.encode(
        Seq("lowest", "newest", "low", "wider").toDF("word"),
        "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("lowest") == Seq("lo", "w", "est</w>"))
    assert(enc("newest") == Seq("n", "ew", "est</w>"))
    assert(enc("low") == Seq("lo", "w</w>"))
    // unseen word: only applicable merges fire
    assert(enc("wider") == Seq("w", "i", "d", "e", "r</w>"))
  }

  test("applyMerge reproduces greedy non-overlapping merging on " +
    "self-overlapping runs (aaa + (a,a) → [aa, a</w>])") {
    val out = Seq(("aaa")).toDF("word")
      .select(Bpe.applyMerge(Bpe.charSyms(col("word")), "a", "a"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("aa", "a</w>"))
  }

  test("tokenCounts is document-spine-aligned and counts subword " +
    "pieces per occurrence (null text → 0s)") {
    val merges = Bpe.train(corpus, "text", 4)
    val docs = Seq(
      (1L, "low lowest"),     // 2 + 3 pieces
      (2L, "newest  newest"), // double space → empty token filtered
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 2L, 5L),  // low = lo,w</w> = 2; lowest = lo,w,est</w> = 3
      (2L, 2L, 6L),  // newest = n,ew,est</w> = 3 pieces ×2
      (3L, 0L, 0L),
      (4L, 0L, 0L)))
  }

  test("word-final and word-internal character runs learn SEPARATE " +
    "statistics — the divergence the marker exists to preserve") {
    // 'ab' word-final ×3, 'abc' (ab internal) ×2: without the marker
    // (a,b) would count 5; with it (a,b</w>)=3 and (a,b)=2 split, so
    // the first merge is the word-final pair
    val c = (Seq.fill(3)("ab") ++ Seq.fill(2)("abc"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val m = Bpe.train(c, "text", 1)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b</w>")))
  }

  test("fertilityAudit: hand-computed per-stratum fertility, " +
    "compression, whole-word rate and piece inventory") {
    val merges = Bpe.train(corpus, "text", 4)
    // lang x: low×5 (lo,w</w> = 2 pieces), lower×2 (lo,w,e,r</w> = 4)
    // lang y: newest×6 (n,ew,est</w> = 3), widest×3 (w,i,d,est</w> = 4)
    // lang z: a×2 (a</w> = 1 piece — the whole-word hit); single-char
    //   words contribute no pairs, so training is unchanged
    val docs = (
      Seq.fill(5)(("x", "low")) ++ Seq.fill(2)(("x", "lower")) ++
        Seq.fill(6)(("y", "newest")) ++ Seq.fill(3)(("y", "widest")) ++
        Seq.fill(2)(("z", "a")))
      .zipWithIndex.map { case ((l, w), i) => (i.toLong, l, w) }
      .toDF("doc_id", "lang", "text")
    val got = Bpe.fertilityAudit(docs, "lang", "text", merges)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    CacheScope.releaseAll()
    assert(got.toSeq == Seq(
      // x: 7 occ, 5·2+2·4=18 bpe, 5·3+2·5=25 chars, 0 whole,
      //    pieces {lo, w</w>, w, e, r</w>} = 5
      ("x", 7L, 18L, 25L, 0L, 5L, 2.571429, 1.388889, 0.0),
      // y: 9 occ, 6·3+3·4=30 bpe, 6·6+3·6=54 chars, 0 whole,
      //    pieces {n, ew, est</w>, w, i, d} = 6
      ("y", 9L, 30L, 54L, 0L, 6L, 3.333333, 1.8, 0.0),
      // z: every occurrence is one piece — fertility floor
      ("z", 2L, 2L, 2L, 2L, 1L, 1.0, 1.0, 1.0)))
  }

  test("train stops early when no adjacent pair remains and " +
    "registers nothing with CacheScope (round state is checkpointed, " +
    "ContextCleaner-managed)") {
    CacheScope.releaseAll() // isolate from other suites' leftovers
    val merges = Bpe.train(Seq((1L, "ab ab")).toDF("doc_id", "text"),
      "text", 10)
    // 'ab' exhausts after one merge
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b</w>")))
    assert(CacheScope.pending == 0)
  }

  test("decodePieces inverts encode on the Sennrich corpus: " +
    "decode(encode(x)) == whitespace-normalized x") {
    val merges = Bpe.train(corpus, "text", 4)
    // multi-word docs with whitespace RUNS: decode must normalize the
    // runs to single spaces and nothing else
    val docs = Seq(
      (1L, "low lower  newest"),
      (2L, "widest\tnewest\n\nlow"),
      (3L, "  low  "),
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
    val got = Bpe.decodeAudit(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    // pieces: low = [lo, w</w>] (2), lower = [lo, w, e, r</w>] (4),
    // newest = [n, ew, est</w>] (3) → 9
    assert(got(0) == ((1L, 9L, "low lower newest", "low lower newest")))
    assert(got(1)._3 == "widest newest low" && got(1)._3 == got(1)._4)
    assert(got(2)._3 == "low" && got(2)._4 == "low")
    // NULL and empty text: zero tokens, empty round-trip both sides
    assert(got(3) == ((4L, 0L, "", "")))
    assert(got(4) == ((5L, 0L, "", "")))
  }

  test("decodePieces handles raw piece streams: markers become " +
    "spaces, word-internal pieces concatenate byte-for-byte") {
    val df = Seq((1L, Seq("lo", "w</w>", "n", "e", "w", "est</w>")),
      (2L, Seq.empty[String]))
      .toDF("id", "pieces")
      .select(col("id"), Bpe.decodePieces(col("pieces")).as("t"))
      .orderBy("id").collect().map(_.getString(1))
    assert(df.toSeq == Seq("low newest", ""))
  }
}
