package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  import spark.implicits._

  // Planted corpus: 1↔2 exact dups; 3↔4 near-dups (one word changed);
  // 5 unrelated; 6 too short to shingle.
  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the sun sets slowly behind the quiet green hills of the north"
  private def docs = Seq(
    (1L, base),
    (2L, base),
    (3L, base + " tonight"),
    (4L, base + " today"),
    (5L, "completely different text about spark catalyst expression " +
      "trees and whole stage codegen pipelines in distributed engines"),
    (6L, "too short")).toDF("doc_id", "text")

  test("memoized near-dup pair stage recomputes after cached-block " +
    "loss (persist keeps lineage; a truncated checkpoint would throw)") {
    val dir = "/root/testdata/sf0.001"
    val q90 = SparkEntry.defs("q90_dedup_clusters").fn
    val q103 = SparkEntry.defs("q103_dedup_survivor_stats").fn
    val before90 = q90(spark, dir).collect().toSeq
    val before103 = q103(spark, dir).collect().toSeq
    // simulate executor/block loss: drop EVERY persisted block
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // both consumers must transparently recompute, not fail
    assert(q90(spark, dir).collect().toSeq == before90)
    assert(q103(spark, dir).collect().toSeq == before103)
    graft.queries.PipelineQueries.clearPairCache()
    assert(q90(spark, dir).collect().toSeq == before90)
  }

  test("exact dedup groups identical content, keeps min id") {
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.count() == 5) // 1+2 collapse
    val dup = d.filter(col("copies") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 1L)
    assert(Dedup.dropExactDups(docs, "doc_id", "text").count() == 5)
  }

  test("minhash near-dup finds planted pairs, no false positives") {
    val pairs = Dedup
      .nearDupPairsMinhash(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact pair and both near variants of it must surface
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    // unrelated doc never pairs
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // verify step is sound: every returned pair really has jaccard >= thr
    val jac = Dedup
      .nearDupPairsMinhash(docs, "doc_id", "text", threshold = 0.5)
      .select("jaccard").as[Double].collect()
    assert(jac.forall(_ >= 0.5))
  }

  test("simhash: identical docs at hamming 0; unrelated never pair") {
    val pairs = Dedup.nearDupPairsSimhash(docs, "doc_id", "text", 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("blocked jaccard respects blocks") {
    val blocked = Seq(
      (1L, base, "en"), (2L, base, "en"), (3L, base, "de"))
      .toDF("doc_id", "text", "lang")
    val pairs = Dedup
      .blockedJaccardPairs(blocked, "doc_id", "text", Seq("lang"), 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical docs in different blocks are never compared
    assert(pairs == Set((1L, 2L)))
  }

  test("clusterPairs merges chains transitively (A~B, B~C → one " +
    "cluster), leaves disjoint pairs apart") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain: all → cluster 1
      (10L, 11L),                             // disjoint pair
      (20L, 21L), (21L, 22L))                 // triangle-ish chain
      .toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(got(_) == 20L))
  }

  test("clusterPairs converges on a long chain (diameter >> rounds) " +
    "via pointer doubling instead of returning under-merged labels") {
    // 60-link chain: naive one-hop min propagation needs 60 rounds;
    // doubling needs ~6. Worst case for the old silent-exit bug —
    // it would have returned node 60 labeled ~50, not 1.
    val chain = (1L until 61L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(chain, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 61)
    assert((1L to 61L).forall(got(_) == 1L))
  }

  test("band join is skew-resilient: a stop-word shingle in 30% of " +
    "docs does not inflate candidates beyond true signature collisions") {
    // 300 distinct docs of deterministic pseudo-random tokens; 30% also
    // carry an identical hot phrase (= hot shingles shared by 90 docs).
    // A candidate generator keyed on shingle postings would emit
    // ~90·89/2 ≈ 4000 pairs from the hot phrase alone. The band join is
    // keyed on whole-band signature hashes, so two docs collide only if
    // an entire 4-hash band agrees — a 3-shingle overlap among ~30
    // shingles cannot do that dependably. Planted exact dups (identical
    // text → identical signature → all bands collide) must all surface.
    val hotPhrase = "zzz yyy xxx www "
    val docs = (0 until 300).map { i =>
      val body = (0 until 30)
        .map(j => s"w${(i * 31 + j * 7) % 5000}").mkString(" ")
      val text = if (i % 10 < 3) hotPhrase + body else body
      (i.toLong, text)
    }
    val planted = (0 until 10).map { k =>
      (1000L + k, docs(k * 7)._2) // exact dup of an existing doc
    }
    val corpus = (docs ++ planted).toDF("doc_id", "text")
    val cands = Dedup
      .minhashCandidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // every planted exact dup is a candidate (identical signatures)
    for (k <- 0 until 10)
      assert(cands.contains((k * 7L, 1000L + k)), s"planted dup $k lost")
    // candidates stay ∝ true collisions: nowhere near the ~4005 pairs
    // a hot-shingle-keyed join would produce from the 90 hot docs
    val hotDocAllPairs = 90 * 89 / 2
    assert(cands.size < hotDocAllPairs / 10,
      s"${cands.size} candidates — hot shingle leaked into the join key?")
  }

  test("clusterPairs reliable-checkpoint branch: same labels, " +
    "checkpoint files written to the given dir") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup
      .clusterPairs(pairs, "id_a", "id_b", checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L))
    // Reliable checkpoints persist as files under the dir (the
    // property localCheckpoint lacks: durability across executor loss).
    def countFiles(p: java.io.File): Int =
      if (p.isFile) 1 else Option(p.listFiles).map(_.map(countFiles).sum)
        .getOrElse(0)
    assert(countFiles(new java.io.File(dir)) > 0,
      s"no reliable checkpoint files under $dir")
  }

  test("incrementalNew keeps only batch-first, corpus-unseen docs") {
    val corpus = Seq((1L, "already ingested doc"), (2L, "another old doc"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "already ingested doc"),   // dup of corpus → dropped
      (11L, "genuinely new content"),  // new → kept
      (12L, "genuinely new content"),  // in-batch dup of 11 → dropped
      (13L, "second new doc"))         // new → kept
      .toDF("doc_id", "text")
    val fresh = Dedup.incrementalNew(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(fresh == Set(11L, 13L))
  }

  test("cdcChunkDigests: boundaries are content-defined — a prefix " +
    "insertion leaves every chunk after the first boundary intact; " +
    "chunk sizes partition the token stream") {
    val text = (1 to 200).map(i => s"w${i}x${i % 7}").mkString(" ")
    val df = Seq((1L, text), (2L, "pre amble " + text))
      .toDF("doc_id", "text")
    val ch = Dedup.cdcChunkDigests(df, "doc_id", "text", m = 8)
    val d1 = ch.filter($"doc_id" === 1)
      .select("digest").as[String].collect().toSet
    val d2 = ch.filter($"doc_id" === 2)
      .select("digest").as[String].collect().toSet
    // only the HEAD chunks (before/at the first boundary) can differ:
    // the shift never reaches later chunks — the CDC property
    assert(d1.size > 5, s"fixture produced too few chunks: ${d1.size}")
    assert((d1 -- d2).size <= 1, "original lost more than its head chunk")
    assert((d2 -- d1).size <= 2, "shifted copy gained beyond its head")
    // chunks partition the stream: token counts sum to the doc length
    val total = ch.filter($"doc_id" === 1)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(total == 200L)
    // deterministic: same input, same digests
    val again = Dedup.cdcChunkDigests(df, "doc_id", "text", m = 8)
      .filter($"doc_id" === 1).select("digest").as[String].collect().toSet
    assert(again == d1)
  }

  test("incrementalNewNearDup admits only batch docs with no corpus " +
    "near-dup and no lower-id batch near-dup; the chain rule is " +
    "conservative (blocked blockers still block)") {
    val c = (1 to 14).map(i => s"c$i").mkString(" ")  // 12 shingles
    val d = (1 to 14).map(i => s"d$i").mkString(" ")
    val corpus = Seq((1L, c), (2L, d)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, c),                       // exact dup of corpus → blocked
      (11L, s"$d z1 z2"),             // j vs d = 12/14 ≈ .857 → blocked
      // j vs d = 12/16 = .75 < .8 (NOT blocked by corpus) but j vs 11
      // = 14/16 = .875 — blocked via the lower-id doc 11 even though
      // 11 itself is blocked: the conservative non-recursive rule
      (12L, s"$d z1 z2 z3 z4"),
      (13L, (1 to 14).map(i => s"n$i").mkString(" ")), // fresh → kept
      // near-dup of the ADMITTED 13 → blocked by a lower batch id
      (14L, (1 to 14).map(i => s"n$i").mkString(" ") + " z9 z10"),
      (15L, "too short"))             // no shingle evidence → admitted
      .toDF("doc_id", "text")
    val admitted = Dedup.incrementalNewNearDup(batch, corpus,
        "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(13L, 15L))
    // blocks bound the candidate space: the same near-dup in another
    // block is not compared, hence admitted
    val corpusB = Seq((1L, c, "en")).toDF("doc_id", "text", "lang")
    val batchB = Seq((10L, c, "de"), (11L, c, "en"))
      .toDF("doc_id", "text", "lang")
    val adB = Dedup.incrementalNewNearDup(batchB, corpusB,
        "doc_id", "text", blockCols = Seq("lang"), threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(adB == Set(10L))
  }

  test("removeDupChunks keepOne: exactly one copy of every over-limit " +
    "digest survives — cut delta vs cut-all equals the over-digest " +
    "count, and keep never loses unique content") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val all = Dedup.removeDupChunks(docs, "doc_id", "text", m = 8)
      .agg(sum("cut_chunks"), sum("kept_chunks")).head()
    val one = Dedup.removeDupChunks(docs, "doc_id", "text", m = 8,
        keepOne = true)
      .agg(sum("cut_chunks"), sum("kept_chunks")).head()
    val overDigests = Dedup.cdcChunkDigests(docs, "doc_id", "text", m = 8)
      .groupBy("digest").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(overDigests > 0, "corpus must carry real duplication")
    // cut-all cuts every occurrence; keep-one spares exactly one per
    // over-limit digest
    assert(all.getLong(0) - one.getLong(0) == overDigests)
    assert(one.getLong(1) - all.getLong(1) == overDigests)
  }

  test("banded incremental admission matches the exact twin on planted " +
    "near-dups, via the persisted signature table, and never falsely " +
    "blocks (exact-admitted ⊆ banded-admitted)") {
    val c = (1 to 14).map(i => s"c$i").mkString(" ")
    val d = (1 to 14).map(i => s"d$i").mkString(" ")
    val corpus = Seq((1L, c), (2L, d)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, c),                                        // exact corpus dup
      (11L, s"$d z1 z2"),                              // j≈.857 vs corpus
      (12L, s"$d z1 z2 z3 z4"),          // blocked via lower-id 11 only
      (13L, (1 to 14).map(i => s"n$i").mkString(" ")), // fresh
      (14L, (1 to 14).map(i => s"n$i").mkString(" ") + " z9 z10"),
      (15L, "too short"))                // no shingle evidence → admitted
      .toDF("doc_id", "text")
    val exact = Dedup.incrementalNewNearDup(batch, corpus,
        "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    val banded = Dedup.incrementalNewNearDupBanded(batch, corpus,
        "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    // high-sim planted pairs: 16-band candidate probability ≈ 1, so
    // the banded admission reproduces the exact one outright
    assert(banded == exact && banded == Set(13L, 15L))
    // the direction that holds at ANY recall
    assert(exact.subsetOf(banded))
    // production shape: admission against the PERSISTED signature
    // table is the same plan (corpus text touched only for candidates)
    val sigs = Dedup.bandSignatureTable(corpus, "doc_id", "text")
    val viaTable = Dedup.incrementalNewNearDupBanded(batch, corpus,
        "doc_id", "text", threshold = 0.8, corpusSigs = Some(sigs))
      .select("doc_id").as[Long].collect().toSet
    assert(viaTable == banded)
    CacheScope.releaseAll()
  }

  test("concurrent-admission contract: two writers admitting against " +
    "the same corpus snapshot both admit mutual near-dups (the manifest " +
    "CAS serializes commits, not the admission predicate); the " +
    "single-writer schedule excludes the later one") {
    import graft.sources.Manifest
    val x = (1 to 14).map(i => s"x$i").mkString(" ")
    val y = x + " z1" // 12∩13 shingles → jaccard ≈ .92 ≥ .8 vs x
    def fresh(): String = {
      val tbl = "file://" + java.nio.file.Files
        .createTempDirectory("graft-adm").toString + "/curated"
      Manifest.init(spark, tbl, Seq((1L,
        "completely unrelated corpus text about catalyst plans and " +
        "shuffles")).toDF("doc_id", "text"))
      tbl
    }
    def admit(tbl: String, id: Long, text: String) =
      Dedup.incrementalNewNearDup(Seq((id, text)).toDF("doc_id", "text"),
          Manifest.read(spark, tbl), "doc_id", "text", threshold = 0.8)
        .as[(Long, String)].collect().toSeq
    // CONCURRENT shape: both writers compute admission against the
    // pre-both snapshot (materialized BEFORE either commit), then the
    // CAS layer serializes the two commits — both land
    val t1 = fresh()
    val admA = admit(t1, 100L, x)
    val admB = admit(t1, 200L, y)
    assert(admA.map(_._1) == Seq(100L) && admB.map(_._1) == Seq(200L))
    Manifest.commitStreamBatch(spark, t1, admA.toDF("doc_id", "text"),
      "s1", 0L)
    Manifest.commitStreamBatch(spark, t1, admB.toDF("doc_id", "text"),
      "s2", 0L)
    val ids = Manifest.read(spark, t1)
      .select("doc_id").as[Long].collect().toSet
    // the pinned caveat: mutual near-dups BOTH admitted under
    // concurrent writers — hence the documented single-writer contract
    assert(ids == Set(1L, 100L, 200L))
    // SINGLE-WRITER schedule: the second admission reads the first's
    // commit and excludes the near-dup
    val t2 = fresh()
    Manifest.commitStreamBatch(spark, t2,
      admit(t2, 100L, x).toDF("doc_id", "text"), "s1", 0L)
    assert(admit(t2, 200L, y).isEmpty)
    CacheScope.releaseAll()
  }

  test("admitNearDupAndCommit re-validates admission on a lost commit " +
    "race: two racing admitters of mutual near-dups converge to the " +
    "single-writer result (the loser re-admits against the winner's " +
    "snapshot and commits nothing)") {
    import graft.sources.Manifest
    val x = (1 to 14).map(i => s"x$i").mkString(" ")
    val y = x + " z1" // jaccard(x, y) ≈ .92 ≥ .8 — mutual near-dups
    val tbl = "file://" + java.nio.file.Files
      .createTempDirectory("graft-cas-adm").toString + "/curated"
    Manifest.init(spark, tbl, Seq((1L,
      "completely unrelated corpus text about catalyst plans and " +
      "shuffles")).toDF("doc_id", "text"))
    // inject writer A's full admit-and-commit into EXACTLY writer B's
    // race window: B computes admission against the pre-A snapshot,
    // then A lands before B's claim → B must lose the CAS, re-read,
    // re-admit against A's rows, and exclude its near-dup
    var injected = false
    Manifest.appendRaceFence = () => {
      if (!injected) {
        injected = true // A's own commitAppendIf re-enters the fence
        Dedup.admitNearDupAndCommit(spark, tbl,
          Seq((100L, x)).toDF("doc_id", "text"),
          "doc_id", "text", threshold = 0.8)
      }
    }
    try {
      val v = Dedup.admitNearDupAndCommit(spark, tbl,
        Seq((200L, y)).toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.8)
      val ids = Manifest.read(spark, tbl)
        .select("doc_id").as[Long].collect().toSet
      // the serial-schedule outcome: A's doc in, B's mutual dup OUT
      assert(ids == Set(1L, 100L), s"expected single-writer result, got $ids")
      // B's losing attempt re-validated and committed nothing: the
      // head is A's version (2), not a third commit
      assert(v == 2L, s"expected head 2 after converged race, got $v")
      assert(injected)
    } finally {
      Manifest.appendRaceFence = () => ()
      CacheScope.releaseAll()
    }
  }

  test("blocked jaccard two-level size buckets do not lose " +
    "cross-bucket pairs") {
    // A ⊂ B with |A|=12, |B|=22 shingles: jaccard 12/22 ≈ 0.545 ≥ 0.5
    // but ⌊log₂⌋ buckets differ (3 vs 4) — the neighbor-bucket join must
    // still surface the pair
    val aText = (1 to 14).map(i => s"w$i").mkString(" ")
    val bText = aText + " " + (15 to 24).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, aText, "en"), (2L, bText, "en"))
      .toDF("doc_id", "text", "lang")
    val pairs = Dedup
      .blockedJaccardPairs(df, "doc_id", "text", Seq("lang"), 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("blocked jaccard is fenced: refuses inputs past maxRows instead " +
    "of planning an unbounded in-block self-join") {
    val big = spark.range(0, 50).toDF("doc_id")
      .withColumn("text", concat(lit("doc words here number "),
        col("doc_id")))
      .withColumn("lang", lit("en"))
    val e = intercept[IllegalArgumentException] {
      Dedup.blockedJaccardPairs(big, "doc_id", "text", Seq("lang"), 3,
        0.9, maxRows = 10).count()
    }
    assert(e.getMessage.contains("fenced"), e.getMessage)
    assert(e.getMessage.contains("nearDupPairsMinhash"), e.getMessage)
    // within the fence it still runs
    assert(Dedup.blockedJaccardPairs(big.limit(5), "doc_id", "text",
      Seq("lang"), 3, 0.9, maxRows = 10).count() == 0L)
  }

  test("embedding near-dup pairs identical vectors, skips orthogonal") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: NaN guard
      .toDF("vec_id", "embedding")
    val pairs = Dedup
      .nearDupPairsEmbedding(emb, "vec_id", "embedding", 0.99, nPlanes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // zero-norm vectors must never match anything (cosine = NULL)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("dupSpanCoverage counts exactly the n-grams shared across " +
    "docs; short docs carry zero totals and a NULL ratio") {
    // docs 1 and 2 share the 5-token run "the quick brown fox jumps"
    // → 3 shared 3-grams; doc 3 is disjoint; doc 4 is below width
    val docs = Seq(
      (1L, "the quick brown fox jumps over x"),
      (2L, "intro the quick brown fox jumps"),
      (3L, "completely different words here entirely"),
      (4L, "too short")).toDF("doc_id", "text")
    val out = Dedup.dupSpanCoverage(docs, "doc_id", "text", shingleN = 3)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((5L, 3L, Some(3.0 / 5.0))))
    assert(out(2L) == ((4L, 3L, Some(3.0 / 4.0))))
    assert(out(3L) == ((3L, 0L, Some(0.0))))
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("keepBestPerCluster keeps the highest-quality doc per cluster " +
    "and passes singletons through") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 20L), // cluster {1,2,3}
      (7L, "d", 5L),                                   // singleton
      (8L, "e", 9L), (9L, "f", 9L))                    // cluster {8,9}: tie
      .toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestPerCluster(docs, "doc_id", pairs,
        "id_a", "id_b", "quality")
      .select("doc_id").as[Long].collect().toSet
    // best of {1,2,3} is 2 (quality 30); tie in {8,9} breaks to min id 8
    assert(kept == Set(2L, 7L, 8L))
  }

  test("removeDupChunks cuts every copy of a cross-doc duplicated " +
    "span, keeps unique docs verbatim, and reassembles in order") {
    val common = (1 to 100).map(i => s"q${i}z${i % 5}").mkString(" ")
    val unique = (1 to 60).map(i => s"solo$i").mkString(" ")
    val docs = Seq(
      (1L, unique),                                   // no dup anywhere
      (2L, (1 to 20).map(i => s"b$i").mkString(" ") + " " + common),
      (3L, common + " " + (1 to 20).map(i => s"e$i").mkString(" ")),
      (4L, common),                                   // 4≡5: all chunks dup
      (5L, common)).toDF("doc_id", "text")
    val out = Dedup.removeDupChunks(docs, "doc_id", "text", m = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // row-aligned with the input corpus
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // the unique doc survives verbatim (normalized token stream)
    assert(out(1L)._1 == unique && out(1L)._3 == 0L)
    // the shared paragraph's interior chunks are identical in 2 and 3
    // (CDC shift robustness) and occur >1× corpus-wide → cut from BOTH
    assert(out(2L)._3 > 0L && out(3L)._3 > 0L)
    val mid = common.split(" ").slice(30, 60).mkString(" ")
    assert(!out(2L)._1.contains(mid) && !out(3L)._1.contains(mid))
    // survivors keep their own unique spans, in original order
    assert(out(2L)._1.startsWith("b1 b2 "))
    assert(out(3L)._1.contains("e1") &&
      out(3L)._1.indexOf("e1") > out(3L)._1.indexOf(
        out(3L)._1.trim.split(" ").head))
    // fully-duplicated docs survive as rows with empty text
    assert(out(4L)._1 == "" && out(4L)._2 == 0L && out(4L)._4 == 0L)
    // kept+cut partitions the chunk relation exactly
    val totalChunks = Dedup.cdcChunkDigests(docs, "doc_id", "text", m = 8)
      .count()
    assert(out.values.map(v => v._2 + v._3).sum == totalChunks)
    // raising the occurrence budget to the planted multiplicity keeps
    // everything: no chunk occurs more than 4 times (common in 2,3,4,5)
    val lax = Dedup.removeDupChunks(docs, "doc_id", "text", m = 8,
        maxOccurrences = 4)
      .agg(sum("cut_chunks")).head().getLong(0)
    assert(lax == 0L)
  }

  test("removeDupChunksVsCorpus: id-ordered waves reproduce the static " +
    "keep-one span dedup exactly, and the stamped digest ledger equals " +
    "a re-chunk of the committed clean text") {
    val phrases = Seq(
      "the quick brown fox jumps over the lazy dog tonight",
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
      "pack my box with five dozen liquor jugs right now")
    // 20 docs; shared phrases recur within AND across the wave cut
    val docs = (0 until 20).map { i =>
      (i.toLong, s"${phrases(i % 3)} unique$i filler$i ${phrases((i + 1) % 3)}")
    }.toDF("doc_id", "text")
    val static = Dedup.removeDupChunks(docs, "doc_id", "text", m = 2,
        keepOne = true)
      .select("doc_id", "clean_text", "kept_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    // wave 1 (ids < 10) against an empty ledger
    val w1 = Dedup.removeDupChunksVsCorpus(
      docs.filter(col("doc_id") < 10), "doc_id", "text", m = 2,
      Seq.empty[String].toDF("digest"))
    // wave 2 against wave 1's STAMPED ledger column (never re-chunking
    // wave 1 — the columnar shape)
    val ledger = w1.select(explode(col("chunk_digests")).as("digest"))
    val w2 = Dedup.removeDupChunksVsCorpus(
      docs.filter(col("doc_id") >= 10), "doc_id", "text", m = 2, ledger)
    val streamed = w1.unionByName(w2)
      .select("doc_id", "clean_text", "kept_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == static,
      "two id-ordered waves must equal the static keep-one dedup")
    // ledger property: re-chunking committed clean text reproduces the
    // stamped kept digests (cutting a chunk moves no other boundary)
    val rechunked = Dedup.cdcChunkDigests(
        w1.filter(col("kept_tokens") > 0), "doc_id", "clean_text", m = 2)
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(
        struct(col("chunk_idx"), col("digest")))),
        s => s.getField("digest")).as("re"))
    val cmp = w1.filter(col("kept_tokens") > 0)
      .select(col("doc_id"), col("chunk_digests"))
      .join(rechunked, Seq("doc_id"))
      .filter(not(col("chunk_digests") === col("re")))
      .count()
    assert(cmp == 0L, "stamped ledger must equal a re-chunk of clean text")
    CacheScope.releaseAll()
  }
}
