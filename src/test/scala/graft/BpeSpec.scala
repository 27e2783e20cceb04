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

  test("train learns the hand-computed merge sequence, ties broken " +
    "by (count DESC, pair ASC)") {
    val merges = Bpe.train(corpus, "text", 4)
    // round 1: (e,s)=9 ties (s,t)=9 → pair-ascending picks (e,s)
    // round 2: (es,t)=9; round 3: (l,o)=7 ties (o,w)=7 → (l,o)
    // round 4: (lo,w)=7
    assert(merges.map(m => (m.rank, m.left, m.right)) ==
      Seq((1, "e", "s"), (2, "es", "t"), (3, "l", "o"), (4, "lo", "w")))
    assert(merges.map(_.merged) == Seq("es", "est", "lo", "low"))
  }

  test("encode applies merges in rank order with the greedy " +
    "left-to-right fold — the classic lowest → [low, est]") {
    val merges = Bpe.train(corpus, "text", 4)
    val enc = Bpe.encode(
        Seq("lowest", "newest", "low", "wider").toDF("word"),
        "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("lowest") == Seq("low", "est"))
    assert(enc("newest") == Seq("n", "e", "w", "est"))
    assert(enc("low") == Seq("low"))
    // unseen word: only applicable merges fire
    assert(enc("wider") == Seq("w", "i", "d", "e", "r"))
  }

  test("applyMerge reproduces greedy non-overlapping merging on " +
    "self-overlapping runs (aaa + (a,a) → [aa, a])") {
    val out = Seq(("aaa")).toDF("word")
      .select(Bpe.applyMerge(Bpe.charSyms(col("word")), "a", "a"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("tokenCounts is document-spine-aligned and counts subword " +
    "pieces per occurrence (null text → 0s)") {
    val merges = Bpe.train(corpus, "text", 4)
    val docs = Seq(
      (1L, "low lowest"),     // 1 + 2 pieces
      (2L, "newest  newest"), // double space → empty token filtered
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 2L, 3L),  // low=1, lowest=2
      (2L, 2L, 8L),  // newest = n,e,w,est = 4 pieces ×2
      (3L, 0L, 0L),
      (4L, 0L, 0L)))
  }

  test("train stops early when no adjacent pair remains and " +
    "registers nothing with CacheScope (round state is checkpointed, " +
    "ContextCleaner-managed)") {
    CacheScope.releaseAll() // isolate from other suites' leftovers
    val merges = Bpe.train(Seq((1L, "ab ab")).toDF("doc_id", "text"),
      "text", 10)
    // 'ab' exhausts after one merge
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
    assert(CacheScope.pending == 0)
  }
}
