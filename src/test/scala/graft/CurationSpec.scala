package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("clean: dedups, drops short/repetitive/unknown-lang docs") {
    val good = "the quick brown fox jumps over a lazy dog of the north " +
      "while many other animals watch from the quiet hills nearby today"
    val docs = Seq(
      (1L, good),                               // keep
      (2L, good),                               // exact dup → dropped
      (3L, "too short"),                        // < 5 tokens → dropped
      (4L, Seq.fill(50)("word").mkString(" ")), // repetitive → dropped
      (5L, "xyzzy plugh abcde fghij klmno pqrst uvwxy zabcd efghi " +
        "jklmn opqrs tuvwx")                    // no lang markers → und
      ).toDF("doc_id", "text")
    val cleaned = Curation.clean(docs, "doc_id", "text")
    assert(cleaned.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val row = cleaned.head()
    assert(row.getAs[String]("lang_id") == "en")
    assert(Seq("ok", "high").contains(row.getAs[String]("quality")))
  }

  test("gate config is honored") {
    val docs = Seq((1L, "the a of " + Seq.tabulate(30)("w" + _)
      .mkString(" "))).toDF("doc_id", "text")
    val strict = Curation.clean(docs, "doc_id", "text",
      Curation.Config(minTokens = 100))
    assert(strict.count() == 0)
    val loose = Curation.clean(docs, "doc_id", "text",
      Curation.Config(minTokens = 5))
    assert(loose.count() == 1)
  }

  test("repetitionStats: exact counts on a known doc") {
    val docs = Seq(
      (1L, "aa bb aa cc aa"),      // 5 words, 3 distinct, top=3, chars=10
      (2L, "xx yy")                // 2 words, 2 distinct, top=1, chars=4
    ).toDF("doc_id", "text")
    val got = Curation.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("words") == 5L)
    assert(r1.getAs[Double]("mean_word_len") == 2.0)
    assert(r1.getAs[Double]("top_word_frac") == 3.0 / 5)
    assert(r1.getAs[Double]("distinct_frac") == 3.0 / 5)
    val r2 = got(1)
    assert(r2.getAs[Long]("words") == 2L)
    assert(r2.getAs[Double]("top_word_frac") == 0.5)
    assert(r2.getAs[Double]("distinct_frac") == 1.0)
  }

  test("repetitionSignals: exact fractions on hand-built docs") {
    // d1: "a b c" twice + "d e" → 3 lines, 1 dup (frac 1/3), dup line
    //     chars 5/13; under the \s+ convention \n IS a token boundary,
    //     so tokens are [a b c a b c d e] and the top 2-gram "a b"
    //     (count 2, 3 chars) covers 6 of 15 chars
    val d1 = "a b c\na b c\nd e"
    // d2: looping phrase → "p q r s t" 5-gram twice (18 of 19 chars);
    //     top 2-gram "p q" (and 3 others) at c=2 → 6 of 19
    val d2 = "p q r s t p q r s t"
    // d3: 20 distinct tokens, no repetition anywhere → keeps
    val d3 = (0 until 20).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val sig = Curation.repetitionSignals(df, "doc_id", "text")
      .withColumn("keep", Curation.repetitionGate())
      .orderBy("doc_id").collect()
    val r1 = sig(0)
    assert(r1.getAs[Long]("lines") == 3L)
    assert(r1.getAs[Double]("dup_line_frac") == 1.0 / 3.0)
    assert(r1.getAs[Double]("dup_line_char_frac") == 5.0 / 13.0)
    assert(r1.getAs[Double]("top_gram_char_frac") == 6.0 / 15.0)
    assert(r1.getAs[Double]("dup_gram_char_frac") == 0.0)
    assert(!r1.getAs[Boolean]("keep")) // dup_line_frac 0.33 > 0.30
    val r2 = sig(1)
    assert(r2.getAs[Long]("lines") == 1L)
    assert(r2.getAs[Double]("dup_line_frac") == 0.0)
    assert(r2.getAs[Double]("top_gram_char_frac") == 6.0 / 19.0)
    assert(r2.getAs[Double]("dup_gram_char_frac") == 18.0 / 19.0)
    assert(!r2.getAs[Boolean]("keep")) // looping phrase caught
    val r3 = sig(2)
    assert(r3.getAs[Double]("dup_line_frac") == 0.0)
    assert(r3.getAs[Double]("top_gram_char_frac") == 11.0 / 109.0)
    assert(r3.getAs[Double]("dup_gram_char_frac") == 0.0)
    assert(r3.getAs[Boolean]("keep"))
  }

  test("gopherGate drops repetitive and out-of-range docs") {
    val long = Seq.tabulate(60)(i => s"word$i").mkString(" ")   // healthy
    val repetitive = Seq.fill(60)("spam").mkString(" ")          // top frac 1
    val short = "tiny doc"                                       // < 50 words
    val docs = Seq((1L, long), (2L, repetitive), (3L, short))
      .toDF("doc_id", "text")
    val kept = Curation.repetitionStats(docs, "doc_id", "text")
      .filter(Curation.gopherGate())
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("fuzzyContamination finds the lightly-edited leak, not the " +
    "unrelated doc, and never self-pairs within a corpus") {
    val benchDoc = Seq.tabulate(40)(i => s"tok$i").mkString(" ")
    // one word changed → shingle jaccard just below 1, far above 0.7
    val leaked = benchDoc.replace("tok20", "edited")
    val unrelated = Seq.tabulate(40)(i => s"other$i").mkString(" ")
    val train = Seq((100L, leaked), (101L, unrelated)).toDF("doc_id", "text")
    val bench = Seq((1L, benchDoc), (2L, "short unmatched thing here"))
      .toDF("doc_id", "text")
    val got = Curation.fuzzyContamination(train, bench, "doc_id", "text",
      threshold = 0.7).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("eval_id") == 1L)
    assert(got(0).getAs[Long]("train_id") == 100L)
    assert(got(0).getAs[Double]("jaccard") > 0.7)
  }

  test("fuzzyContamination: empty bench side and too-short docs yield " +
    "no pairs instead of failing") {
    val train = Seq((1L, "some training document with enough words here"))
      .toDF("doc_id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.fuzzyContamination(train, emptyBench, "doc_id",
      "text", 0.7).count() == 0)
    val shortBench = Seq((2L, "too short")).toDF("doc_id", "text")
    assert(Curation.fuzzyContamination(train, shortBench, "doc_id",
      "text", 0.7).count() == 0)
  }

  test("curate: each stage drops exactly the docs it should, shards " +
    "are deterministic") {
    // 60 good words — passes every Gopher bound
    val good = (1 to 60).map(i => s"word$i").mkString(" ")
    val repetitive = Seq.fill(60)("spam").mkString(" ") // top_word_frac 1.0
    val contaminated = good + " the leaked benchmark answer key right here ok"
    val benchText = "the leaked benchmark answer key right here ok yes"
    val docs = Seq(
      (1L, good),               // survives everything
      (2L, good),               // exact dup of 1 → dropped (min-id wins)
      (3L, repetitive),         // gated by top-word fraction
      (4L, contaminated),       // shares an 8-gram with bench → dropped
      (5L, good + " unique tail marker avoids the dup digest entirely"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = Curation.curate(docs, bench, "doc_id", "text",
      contamN = 8, salt = "s1", buckets = 4)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
    // shards are a pure function of (id, salt): rerun = same assignment
    val a = out.select("doc_id", "bucket").as[(Long, Long)].collect().toSet
    val b = Curation.curate(docs, bench, "doc_id", "text",
        contamN = 8, salt = "s1", buckets = 4)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("dropBoilerplate: a chunk repeated across > maxDocFreq docs is " +
    "stripped and the doc is rebuilt in order; all-boilerplate docs " +
    "survive as empty text") {
    val docs = Seq(
      (1L, "h1 h2 x1 x2"), // header chunk + unique tail
      (2L, "h1 h2 y1 y2"),
      (3L, "h1 h2 z1 z2"),
      (4L, "a1 a2 b1 b2"), // no boilerplate at all
      (5L, "h1 h2"))       // nothing but the header
      .toDF("doc_id", "text")
    val out = Curation.dropBoilerplate(docs, "doc_id", "text",
        chunkTokens = 2, maxDocFreq = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // "h1 h2" df=4 > 2 → boilerplate; every other chunk df=1
    assert(out == Seq(
      (1L, 2L, 1L, "x1 x2"),
      (2L, 2L, 1L, "y1 y2"),
      (3L, 2L, 1L, "z1 z2"),
      (4L, 2L, 2L, "a1 a2 b1 b2"),
      (5L, 1L, 0L, "")))
  }

  test("streaming-curation survivor rule: incremental dedup across " +
    "ordered waves + exactly-once commits keep the GLOBAL min id per " +
    "text") {
    import graft.operators.Dedup
    import graft.sources.Manifest
    val root = "file://" + java.nio.file.Files
      .createTempDirectory("graft-sc-spec").toString + "/t"
    val w1 = Seq((1L, "alpha beta gamma"), (2L, "unique one"))
      .toDF("doc_id", "text")
    val w2 = Seq((10L, "alpha beta gamma"), (11L, "unique two"),
      (12L, "unique two")).toDF("doc_id", "text")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], w1.schema)
    Manifest.commitStreamBatch(spark, root,
      Dedup.incrementalNew(w1, empty, "doc_id", "text"), "curate", 0L)
    Manifest.commitStreamBatch(spark, root,
      Dedup.incrementalNew(w2, Manifest.read(spark, root), "doc_id",
        "text"), "curate", 1L)
    // 10 dropped (cross-wave dup of 1), 12 dropped (in-batch dup of 11)
    assert(Manifest.read(spark, root).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 11L))
    // replayed batch (the foreachBatch at-least-once case) is a no-op
    val v = Manifest.latestVersion(spark, root).get
    Manifest.commitStreamBatch(spark, root,
      Dedup.incrementalNew(w2, Manifest.read(spark, root), "doc_id",
        "text"), "curate", 1L)
    assert(Manifest.latestVersion(spark, root).get == v)
  }

  test("nbQualityScores: hand-computed add-1 multinomial NB log-odds " +
    "(2-doc fixture), label polarity, and length normalization") {
    // corpus: doc 1 = "a a b" (positive), doc 2 = "a c" (negative)
    // counts  a: 2+/1-, b: 1+/0-, c: 0+/1-; T+=3, T-=2, V=3
    // w(a)=ln(3/6)-ln(2/5)=ln 1.25   w(b)=ln(2/6)-ln(1/5)=ln(5/3)
    // w(c)=ln(1/6)-ln(2/5)=ln(5/12)
    // doc1 llr = 2w(a)+w(b) = .9571127 → .9571, avg = /3 → .3190
    // doc2 llr = w(a)+w(c) = -.6523252 → -.6523, avg = /2 → -.3262
    val docs = Seq((1L, "a a b", true), (2L, "a c", false))
      .toDF("doc_id", "text", "good")
    val got = Curation.nbQualityScores(docs, "doc_id", "text",
        col("good"))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 0.9571, 0.3190), (2L, 2L, -0.6523,
      -0.3262)))
    // per-token averaging keeps the axis length-free: two docs with
    // the SAME token mix at different lengths (one model, one corpus)
    // get the same avg_llr
    val mixed = Seq((1L, "a a b", true), (2L, "a c", false),
      (3L, "a a b a a b a a b", true)).toDF("doc_id", "text", "good")
    val avgs = Curation.nbQualityScores(mixed, "doc_id", "text",
        col("good"))
      .filter(col("doc_id").isin(1L, 3L))
      .select("avg_llr").as[Double].collect().toSet
    assert(avgs.size == 1)
  }

  test("dsirWeights: target-typical docs outrank off-target docs, " +
    "the weight is length-free, and labels don't leak (only tokens)") {
    val docs = Seq(
      (1L, "en", "alpha alpha beta"),
      (2L, "en", "alpha beta beta"),
      (3L, "xx", "gamma delta gamma"),
      // target-typical TOKENS under an off-target label: must score
      // like the target docs — the weight reads token distributions,
      // never the label
      (4L, "xx", "alpha beta alpha"),
      // doc 3's text doubled: length-normalized weight is identical
      (5L, "xx", "gamma delta gamma gamma delta gamma"))
      .toDF("doc_id", "lang", "text")
    val w = Curation.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = 256)
      .as[(Long, Double)].collect().toMap
    assert(w(4L) > w(3L),
      s"target-typical tokens must outscore off-target tokens: $w")
    assert(w(5L) == w(3L),
      s"doubling the text must not change the weight: $w")
    assert(w(1L) > w(3L) && w(2L) > w(3L))
    assert(w(1L) == w(4L),
      "same token bag ⇒ same weight, labels must not leak")
  }

  test("nbLangId separates a separable corpus: held-out docs classify " +
    "by their class's vocabulary, OOV-only docs fall back to the " +
    "prior argmax, margins are non-negative") {
    // vocabularies barely overlap; train = even ids, score all
    val docs = Seq(
      (0L, "en", "the cat sat on the mat with the dog"),
      (2L, "en", "the dog and the cat ran to the house"),
      (4L, "en", "a cat a dog a house the mat"),
      (1L, "en", "the cat and the dog sat on a mat"),      // held-out
      (10L, "de", "der hund und die katze im haus"),
      (12L, "de", "die katze und der hund am haus"),
      (14L, "de", "der die und das haus katze hund"),
      (11L, "de", "die katze der hund und das haus"),      // held-out
      (21L, "en", "zzz qqq www"))  // OOV-only → prior argmax
      .toDF("doc_id", "lang", "text")
    val pred = Curation.nbLangId(docs, "doc_id", "text", "lang",
        col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2))).toMap
    assert(pred.keySet == docs.select("doc_id").as[Long].collect().toSet)
    // held-out docs classify correctly on a separable corpus
    assert(pred(1L)._1 == "en" && pred(11L)._1 == "de",
      s"held-out misclassified: $pred")
    Seq(0L, 2L, 4L).foreach(i => assert(pred(i)._1 == "en"))
    Seq(10L, 12L, 14L).foreach(i => assert(pred(i)._1 == "de"))
    // no vocab overlap → the prior decides (both classes have 3 train
    // docs → exact rounded tie → lexicographic tie-break picks "de")
    assert(pred(21L)._1 == "de", s"OOV fallback: ${pred(21L)}")
    assert(pred(21L)._2 == 0.0)
    pred.values.foreach { case (_, m) => assert(m >= 0.0) }
  }

  test("charNgrams yields sliding lowercased n-grams with spaces, " +
    "empty below n and for null") {
    val got = Seq(("AbC d", ""), (null.asInstanceOf[String], ""))
      .toDF("t", "pad")
      .select(graft.functions.Text.charNgrams(col("t"), 3))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("abc", "bc ", "c d"))
    assert(got(1) == Seq.empty)
    val short = Seq(Tuple1("ab")).toDF("t")
      .select(graft.functions.Text.charNgrams(col("t"), 3))
      .collect()(0).getSeq[String](0)
    assert(short == Seq.empty)
  }

  test("nbLangId with char-3-gram features separates a corpus whose " +
    "classes differ at the character level (the fastText-style " +
    "variant; q225's collapse on the synthetic corpus is a data " +
    "property, not the featurizer's)") {
    // same words would even overlap at the WORD level ('haus'/'house'
    // share no trigram though) — classes differ in character shapes
    val docs = Seq(
      (0L, "en", "the cat sat on the mat with the dog"),
      (2L, "en", "the dog and the cat ran to the house"),
      (4L, "en", "a cat a dog a house the mat"),
      (1L, "en", "the cat and the dog sat on a mat"),      // held-out
      (10L, "de", "der hund und die katze im haus"),
      (12L, "de", "die katze und der hund am haus"),
      (14L, "de", "der die und das haus katze hund"),
      (11L, "de", "die katze der hund und das haus"))      // held-out
      .toDF("doc_id", "lang", "text")
    val pred = Curation.nbLangId(docs, "doc_id", "text", "lang",
        col("doc_id") % 2 === 0,
        graft.functions.Text.charNgrams(_, 3))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(1L) == "en" && pred(11L) == "de", s"held-out: $pred")
    Seq(0L, 2L, 4L).foreach(i => assert(pred(i) == "en"))
    Seq(10L, 12L, 14L).foreach(i => assert(pred(i) == "de"))
  }

  test("removeBenchSpans cuts a quoted benchmark passage wherever it " +
    "lands (shift-robust), never cuts host-only content, and leaves " +
    "unrelated documents intact") {
    val passage = (1 to 40).map(i => s"p$i").mkString(" ")
    val bench = Seq((100L, passage)).toDF("doc_id", "text")
    // the same quote at two different offsets; distinct host vocab
    val host1 = (1 to 7).map(i => s"a$i").mkString(" ") + " " +
      passage + " " + (1 to 5).map(i => s"b$i").mkString(" ")
    val host2 = (1 to 13).map(i => s"c$i").mkString(" ") + " " +
      passage + " " + (1 to 9).map(i => s"d$i").mkString(" ")
    val unrelated = (1 to 30).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, host1), (2L, host2), (3L, unrelated))
      .toDF("doc_id", "text")
    val out = Curation.removeBenchSpans(docs, bench, "doc_id", "text",
        m = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (c1, c2, c3) = (out(1L), out(2L), out(3L))
    // the quote's INTERIOR chunks are cut in both hosts — and because
    // CDC boundaries are content-defined, the SAME chunks are cut
    // regardless of the quote's offset
    assert(c1._3 > 0, s"host1 cut nothing: $c1")
    assert(c1._3 == c2._3,
      s"shift changed the cut count: ${c1._3} vs ${c2._3}")
    // host-only content always survives (cuts are digest-verified
    // against the benchmark, never positional)
    assert((1 to 7).forall(i => c1._1.contains(s"a$i")))
    assert((1 to 5).forall(i => c1._1.contains(s"b$i")))
    assert((1 to 13).forall(i => c2._1.contains(s"c$i")))
    // a doc sharing nothing with the benchmark is untouched
    assert(c3._3 == 0 && c3._1 == unrelated)
  }

  test("packBestFit: every doc packed exactly once, no bin over budget " +
    "(except a single oversized doc), and bin count beats or equals the " +
    "arrival-order next-fit baseline (the fill-rate claim)") {
    val budget = 100L
    // sizes chosen so decreasing best-fit genuinely repacks: next-fit
    // in id order wastes tails; includes one oversized doc (140)
    val sizes = Seq(60L, 55L, 45L, 40L, 35L, 30L, 25L, 20L, 15L, 10L,
      140L, 5L)
    val docs = sizes.zipWithIndex
      .map { case (u, i) => (i.toLong, "g", u) }
      .toDF("doc_id", "grp", "units")
    val asg = Curation.packBestFit(docs, "grp", "doc_id", "units",
        budget, numSegs = 1, salt = "t")
      .collect().map(r => (r.getLong(2), r.getInt(3), r.getLong(4)))
    // exactly once
    assert(asg.map(_._1).sorted.toSeq == sizes.indices.map(_.toLong))
    // bin loads: only the oversized doc's bin may exceed budget, alone
    val loads = asg.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    for ((bin, load) <- loads if load > budget)
      assert(asg.filter(_._2 == bin).map(_._3).toSeq == Seq(140L),
        s"over-budget bin $bin not a lone oversized doc")
    // arrival-order next-fit baseline (close the bin when the next doc
    // doesn't fit): BFD must use no more bins ⇒ fill ≥ baseline
    val nextFit = sizes.foldLeft((0, 0L)) { case ((bins, rem), u) =>
      if (u <= rem) (bins, rem - u)
      else (bins + 1, (budget - u).max(0L))
    }._1
    assert(loads.size <= nextFit,
      s"BFD ${loads.size} bins vs next-fit $nextFit")
    // and on this corpus it strictly improves
    assert(loads.size < nextFit)
    // deterministic: a second run packs identically
    val again = Curation.packBestFit(docs, "grp", "doc_id", "units",
        budget, numSegs = 1, salt = "t")
      .collect().map(r => (r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq == asg.sortBy(_._1).toSeq)
  }

  test("qualityPercentileGate: per-stratum cutoff at the k-th " +
    "largest score, boundary ties kept inclusively, keepFrac=1 keeps " +
    "all") {
    val scored = Seq(
      ("a", 1L, 9.0), ("a", 2L, 8.0), ("a", 3L, 8.0), ("a", 4L, 1.0),
      ("b", 5L, 5.0), ("b", 6L, 4.0))
      .toDF("lang", "doc_id", "qscore")
    // a: n=4, k=2 → cutoff 8.0 → the 8.0 TIE inflates kept to 3
    // b: n=2, k=1 → cutoff 5.0 → 1 kept
    val kept = Curation.qualityPercentileGate(scored, "lang",
        "qscore", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L))
    val all = Curation.qualityPercentileGate(scored, "lang",
      "qscore", 1.0).count()
    assert(all == 6L)
    // determinism: rerun identical
    val again = Curation.qualityPercentileGate(scored, "lang",
        "qscore", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == kept)
  }

  test("qualityPercentileGate invariants over seeded random frames: " +
    "kept >= ceil(frac*n) per stratum, min kept >= max dropped, " +
    "PSI of random snapshot pairs >= 0") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 6) {
      val frac = Seq(0.1, 0.3, 0.5, 0.8)(trial % 4)
      val rows = (1 to (20 + rnd.nextInt(60))).map { i =>
        (s"s${rnd.nextInt(3)}", i.toLong,
          math.rint(rnd.nextGaussian() * 1e4) / 1e4) // 4-dp scores
      }
      val df = rows.toDF("lang", "doc_id", "qscore")
      val kept = Curation.qualityPercentileGate(df, "lang", "qscore",
        frac).collect().map(r => (r.getString(0), r.getLong(1)))
      val keptIds = kept.map(_._2).toSet
      rows.groupBy(_._1).foreach { case (s, g) =>
        val k = math.ceil(g.size * frac).toLong
        val keptScores = g.filter(r => keptIds(r._2)).map(_._3)
        val dropped = g.filterNot(r => keptIds(r._2)).map(_._3)
        assert(keptScores.size >= k,
          s"trial $trial stratum $s kept ${keptScores.size} < $k")
        if (dropped.nonEmpty)
          assert(keptScores.min >= dropped.max,
            s"trial $trial stratum $s kept a worse score than it dropped")
      }
      // PSI non-negativity: each term (q-p)ln(q/p) has matching signs
      val v1 = rows.map(r => (r._1, rnd.nextInt(1000).toLong))
        .toDF("source", "n_chars")
      val v2 = rows.map(r => (r._1, rnd.nextInt(1000).toLong))
        .toDF("source", "n_chars")
      Curation.distributionDrift(v1, v2, "source", "n_chars", 100L, 8)
        .collect().foreach(r =>
          assert(r.getDouble(3) >= 0.0, s"trial $trial negative PSI"))
    }
  }

  test("distributionDrift: identical snapshots score PSI exactly 0; " +
    "the tie-break lands on the lowest bucket") {
    val v = Seq(("a", 10L), ("a", 150L), ("a", 310L), ("b", 50L))
      .toDF("source", "n_chars")
    val got = Curation.distributionDrift(v, v, "source", "n_chars",
        bucketWidth = 100L, numBuckets = 4)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // p == q bucket-for-bucket → every term is exactly 0.0, every
    // shift ties at 0.0 → lowest bucket wins
    assert(got.toSeq == Seq(("a", 3L, 3L, 0.0, 0),
      ("b", 1L, 1L, 0.0, 0)))
  }

  test("distributionDrift: a planted wholesale shift scores the " +
    "hand-computed PSI and names a maximally-shifted bucket") {
    // v1: 6 rows in bucket 0; v2: the same 6 rows moved to bucket 3
    // p = (6+1)/10, (0+1)/10 …; shift .6 ties between buckets 0 and 3
    // → lowest (0); PSI = 2 · 0.6 · ln 7
    val v1 = (1 to 6).map(i => ("a", 10L + i)).toDF("source", "n_chars")
    val v2 = (1 to 6).map(i => ("a", 350L + i)).toDF("source", "n_chars")
    val Array(r) = Curation.distributionDrift(v1, v2, "source",
      "n_chars", bucketWidth = 100L, numBuckets = 4).collect()
    assert(r.getLong(1) == 6L && r.getLong(2) == 6L)
    assert(r.getDouble(3) ==
      BigDecimal(2.0 * 0.6 * math.log(7.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getInt(4) == 0)
  }

  test("distributionDrift: smoothing keeps a stratum present in only " +
    "one snapshot finite, and out-of-range values clamp to the edge " +
    "buckets") {
    val v1 = Seq(("a", 0L)).toDF("source", "n_chars")
    val v2 = Seq(("a", -5L), ("a", 99999L), ("new", 10L))
      .toDF("source", "n_chars")
    val got = Curation.distributionDrift(v1, v2, "source", "n_chars",
        bucketWidth = 100L, numBuckets = 4)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    val a = got(0); val nw = got(1)
    // 'a' v2 splits between clamped bucket 0 (negative) and bucket 3
    // (overflow) — finite drift, no NaN
    assert(a._1 == "a" && a._2 == 1L && a._3 == 2L && !a._4.isNaN)
    // 'new' exists only in v2: n_v1 = 0, smoothed p is uniform 1/4 —
    // PSI finite and positive
    assert(nw._1 == "new" && nw._2 == 0L && nw._3 == 1L &&
      nw._4 > 0.0 && !nw._4.isNaN)
  }

  test("distributionDrift: NULL values are excluded, not folded into " +
    "the overflow bucket") {
    val v1 = Seq(("a", Some(10L)), ("a", Some(150L)), ("a", Some(310L)))
      .toDF("source", "n_chars")
    // v2 = v1 plus a NULL-valued row: the distribution evidence is
    // identical, so PSI must stay exactly 0 and n_v2 must count only
    // the non-null rows (pre-fix, the NULL landed in bucket
    // numBuckets-1 and read as tail drift)
    val v2 = (Seq(("a", Some(10L)), ("a", Some(150L)), ("a", Some(310L)),
      ("a", Option.empty[Long]))).toDF("source", "n_chars")
    val Array(r) = Curation.distributionDrift(v1, v2, "source",
      "n_chars", bucketWidth = 100L, numBuckets = 4).collect()
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.0,
      s"NULL row must not register as drift, got PSI ${r.getDouble(3)}")
  }

  test("distributionDriftHists: an all-NULL-valued stratum keeps its " +
    "membership when the histograms carry NULL-bucket rows — hists " +
    "path ≡ raw path row-for-row") {
    // 'ghost' has only NULL n_chars: the raw path derives strata from
    // the raw frames and emits its smoothing-only psi=0 row; the
    // maintained-view path must reproduce it when the view buckets
    // WITHOUT a non-null predicate (NULL value → NULL bucket row —
    // membership, zero mass — the q233 MaterializedAgg convention)
    val v1 = Seq(("a", Some(10L)), ("a", Some(350L)),
      ("ghost", Option.empty[Long])).toDF("source", "n_chars")
    val v2 = Seq(("a", Some(10L)), ("a", Some(10L)),
      ("ghost", Option.empty[Long])).toDF("source", "n_chars")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect().map(r => (r.getString(0),
        r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSeq
    val raw = key(Curation.distributionDrift(v1, v2, "source",
      "n_chars", bucketWidth = 100L, numBuckets = 4))
    // the maintained shape: grouped counts with NULL values bucketed
    // NULL (what the view maintains with no where-predicate)
    def hist(df: org.apache.spark.sql.DataFrame) = df.select(
        col("source"),
        when(col("n_chars").isNotNull,
          greatest(lit(0L), least(floor(col("n_chars") / 100.0),
            lit(3L))).cast("int")).as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
    val hists = key(Curation.distributionDriftHists(hist(v1), hist(v2),
      "source", numBuckets = 4))
    assert(hists == raw, s"hists path $hists != raw path $raw")
    assert(raw.exists(r => r._1 == "ghost" && r._2 == 0L &&
      r._3 == 0L && r._4 == 0.0 && r._5 == 0),
      s"ghost stratum must surface as the smoothing-only row: $raw")
  }
}
