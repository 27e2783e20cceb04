package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.{Curation, Dedup, Multimodal, Similarity, Skew}
import graft.functions.Text

/** The LLM-training-data-pipeline surface (SURVEY.md §2.11 X1-X6) as
  * oracle-checked queries over `documents` / `embeddings`.
  *
  * Oracle policy: everything deterministic-and-engine-portable carries a
  * DuckDB mirror (exact dedup, blocked Jaccard, brute-force cosine,
  * multimodal metadata, text stats, fingerprints). Seeded-hash operators
  * (MinHash/SimHash/LSH buckets — xxhash64 has no DuckDB twin) and HLL
  * sketches register as rows-only checks, shaped as single-row aggregates
  * so the row count is stable even when the pair set is empty.
  */
object PipelineQueries {

  val entries: Seq[QueryDef] = Seq(

    // ---- X1: exact dedup — digest groups --------------------------------
    QueryDef("q41_exact_dedup",
      (s, dir) => Dedup
        .exact(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("digest"),
      Some("""SELECT md5(text) AS digest, min(doc_id) AS keep_id,
          count(*) AS copies
        FROM documents GROUP BY 1 ORDER BY digest""")),

    // ---- X1 applied: the surviving relation -----------------------------
    QueryDef("q42_dedup_survivors",
      (s, dir) => Dedup
        .dropExactDups(Tables.load(s, dir, "documents"), "doc_id", "text")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy("lang", "source"),
      Some("""SELECT lang, source, count(*) AS n,
          CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        GROUP BY lang, source ORDER BY lang, source""")),

    // ---- X2: MinHash/LSH near-dup (seeded hash → rows-only) -------------
    QueryDef("q43_minhash_neardup",
      (s, dir) => Dedup
        .nearDupPairsMinhash(Tables.load(s, dir, "documents"),
          "doc_id", "text", threshold = 0.5)
        .agg(count(lit(1)).as("pairs"),
          coalesce(round(avg("jaccard"), 4), lit(0.0)).as("avg_jaccard")),
      None),

    // ---- X2: blocked exact-Jaccard near-dup (oracle-exact) --------------
    QueryDef("q44_jaccard_blocked",
      (s, dir) => Dedup
        .blockedJaccardPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", Seq("lang", "source"), shingleN = 3,
          threshold = 0.4)
        .orderBy("lang", "source", "id_a", "id_b"),
      Some("""WITH sh AS (
          SELECT doc_id, lang, source,
            CASE WHEN len(toks) >= 3 THEN list_distinct(
              [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)])
            ELSE [] END AS s
          FROM (SELECT doc_id, lang, source,
              string_split(lower(text), ' ') AS toks FROM documents))
        SELECT a.lang, a.source, a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
            AS jaccard
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.4
        ORDER BY a.lang, a.source, id_a, id_b""")),

    // ---- X2: SimHash near-dup (seeded hash → rows-only) -----------------
    QueryDef("q45_simhash_neardup",
      (s, dir) => Dedup
        .nearDupPairsSimhash(Tables.load(s, dir, "documents"),
          "doc_id", "text", maxHamming = 3)
        .agg(count(lit(1)).as("pairs"),
          coalesce(round(avg("hamming"), 4), lit(0.0)).as("avg_hamming")),
      None),

    // ---- X2/X3: embedding near-dup via LSH buckets (rows-only) ----------
    QueryDef("q46_embedding_neardup",
      (s, dir) => Dedup
        .nearDupPairsEmbedding(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.9, nPlanes = 8)
        .agg(count(lit(1)).as("pairs"),
          coalesce(round(avg("cosine"), 4), lit(0.0)).as("avg_cosine")),
      None),

    // ---- X3: brute-force cosine top-k (oracle-exact to 6dp) -------------
    QueryDef("q47_ann_bruteforce",
      (s, dir) => Similarity
        .bruteForceTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", queryId = 7L, k = 10)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine")),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT e.vec_id,
            list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
          FROM e, q WHERE e.vec_id <> 7
          ORDER BY cosine DESC, e.vec_id ASC LIMIT 10)""")),

    // ---- X3: LSH-bucketed ANN, multi-probe (seeded hash → rows-only) ----
    QueryDef("q48_ann_lsh",
      (s, dir) => Similarity
        .lshTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", queryId = 7L, k = 10,
          nPlanes = 6, probes = 4)
        .agg(count(lit(1)).as("hits"),
          coalesce(round(max("cosine"), 4), lit(0.0)).as("best_cosine")),
      None),

    // ---- X3: IVF ANN — hash-sampled pivots (seeded → rows-only) ---------
    QueryDef("q63_ann_ivf",
      (s, dir) => Similarity
        .ivfTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", queryId = 7L, k = 10,
          nCentroids = 16, nProbe = 4)
        .agg(count(lit(1)).as("hits"),
          coalesce(round(max("cosine"), 4), lit(0.0)).as("best_cosine")),
      None),

    // ---- X2/X3: blocked exact embedding similarity (oracle-exact) -------
    // Label is the blocking key (the shuffle key at scale); cosine is
    // verified bit-for-bit against DuckDB's list arithmetic to 6dp.
    // FENCED like blockedJaccardPairs: coarse label blocks make the
    // in-block self-join quadratic — this is the oracle twin; the scale
    // path is nearDupPairsEmbedding (LSH buckets).
    QueryDef("q64_embedding_blocked",
      (s, dir) => {
        val e = graft.scaleOut(
          graft.fenceQuadratic(Tables.load(s, dir, "embeddings"),
            maxRows = 100000, "q64 blocked cosine on coarse label blocks",
            "use nearDupPairsEmbedding (LSH buckets)"),
          col("label"))
        val a = e.select(col("label"), col("vec_id").as("id_a"),
          graft.functions.Vectors.toDouble(col("embedding")).as("v_a"))
        val b = e.select(col("label"), col("vec_id").as("id_b"),
          graft.functions.Vectors.toDouble(col("embedding")).as("v_b"))
        a.join(b, Seq("label"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("cos",
            graft.functions.Vectors.cosine(col("v_a"), col("v_b")))
          .filter(col("cos") >= 0.35)
          .select(col("label"), col("id_a"), col("id_b"),
            round(col("cos"), 6).as("cosine"))
          .orderBy("label", "id_a", "id_b")
      },
      Some("""WITH e AS (SELECT label, vec_id,
          CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT label, id_a, id_b, round(cos, 6) AS cosine FROM (
          SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
            list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) AS cos
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        WHERE cos >= 0.35 ORDER BY label, id_a, id_b""")),

    // ---- K2-K4 curated zone: processed → curated rollup pipeline --------
    QueryDef("q65_curated_rollup",
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft_curated").toString
        val l = Tables.load(s, dir, "lineitem")
        graft.sources.Lake.writeZone(
          l.select("l_returnflag", "l_quantity", "l_extendedprice"),
          root, graft.sources.Lake.Processed, "lineitem_slim", "parquet")
        val processed = graft.sources.Lake.read(s,
          graft.sources.Lake.zonePath(root,
            graft.sources.Lake.Processed, "lineitem_slim"), "parquet")
        val rolled = processed.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            graft.functions.Num.moneySum(col("l_extendedprice"), 0)
              .as("total"))
        graft.sources.Lake.writeZone(rolled, root,
          graft.sources.Lake.Curated, "flag_rollup", "parquet")
        graft.sources.Lake.read(s,
            graft.sources.Lake.zonePath(root,
              graft.sources.Lake.Curated, "flag_rollup"), "parquet")
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))),0)
            AS DOUBLE) AS total
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- X3 storage path: int8 quantization + reconstruction error ------
    QueryDef("q68_quantize_embeddings",
      (s, dir) => {
        val q = graft.functions.Quantize.quantized(
          graft.scaleOut(Tables.load(s, dir, "embeddings")), "embedding")
        val v = graft.functions.Vectors.toDouble(col("embedding"))
        val err = zip_with(v,
          graft.functions.Quantize
            .dequantizeWith(col("q_vec"), col("q_scale")),
          (x, y) => abs(x - y))
        q.select(col("label"),
            (aggregate(err, lit(0.0), (acc, x) => acc + x) / size(err))
              .as("vec_avg_err"),
            array_max(err).as("vec_max_err"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            round(avg("vec_avg_err"), 8).as("avg_err"),
            round(max("vec_max_err"), 8).as("max_err"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT label,
          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (SELECT label, v,
          greatest(list_max(list_transform(v, x -> abs(x))) / 127.0,
            1e-12) AS sc FROM e),
        err AS (SELECT label,
          list_transform(range(1, len(v) + 1),
            i -> abs(v[i] - round(v[i] / sc, 0) * sc)) AS es
          FROM s)
        SELECT label, count(*) AS n,
          round(avg(list_sum(es) / len(es)), 8) AS avg_err,
          round(max(list_max(es)), 8) AS max_err
        FROM err GROUP BY label ORDER BY label""")),

    // ---- X5: mergeable sketches — Bloom membership + HLL union ----------
    // Sketch binaries are engine-specific → rows-only, but the row
    // encodes two invariants: a Bloom filter NEVER yields false
    // negatives (probe hits >= true semi-join count), and per-group HLL
    // sketches UNION to the global estimate (the mergeability that makes
    // sketches work across 1000 executors).
    QueryDef("q71_sketches",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        // Build the membership sketch once and inline it as a constant —
        // the same shape Spark's own runtime filters use (the ~60 KB
        // binary rides the plan, not a shuffle).
        val bf = c.agg(expr("bloom_filter_agg(c_custkey, 50000, 500000)"))
          .head().getAs[Array[Byte]](0)
        val probed = o.agg(
          sum(when(graft.functions.Native.mightContain(bf,
            col("o_custkey")), 1L).otherwise(0L)).as("bloom_hits"),
          count(lit(1)).as("orders_total"))
        val exact = o.join(c, o("o_custkey") === c("c_custkey"),
            "left_semi")
          .agg(count(lit(1)).as("true_hits"))
        val unioned = c.groupBy("c_nationkey")
          .agg(expr("hll_sketch_agg(c_custkey) AS hll"))
          .agg(expr(
            "cast(hll_sketch_estimate(hll_union_agg(hll)) as long) AS est"))
        probed.crossJoin(broadcast(exact)).crossJoin(broadcast(unioned))
          .select(col("bloom_hits"), col("orders_total"),
            col("true_hits"),
            (col("bloom_hits") >= col("true_hits"))
              .as("no_false_negatives"),
            col("est").as("hll_union_estimate"))
      },
      None),

    // ---- X5: approximate distinct (HLL — impl-specific → rows-only) -----
    QueryDef("q49_approx_distinct",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        l.agg(
          approx_count_distinct("l_partkey").as("approx_parts"),
          approx_count_distinct("l_suppkey").as("approx_supps"),
          approx_count_distinct("l_orderkey", 0.02).as("approx_orders"),
          count(lit(1)).as("rows"))
      },
      None),

    // ---- X6: multimodal metadata aggregation ----------------------------
    QueryDef("q50_media_meta",
      (s, dir) => Multimodal
        .fromDocuments(Tables.load(s, dir, "documents"))
        .groupBy("modality")
        .agg(count(lit(1)).as("n"),
          sum(col("meta.size_bytes")).as("bytes"),
          max(col("meta.duration_ms")).as("max_duration_ms"),
          min(col("meta.mime")).as("mime"))
        .orderBy("modality"),
      Some("""SELECT (['image','audio','video'])[(doc_id % 3) + 1] AS modality,
          count(*) AS n,
          CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes,
          CAST(max(octet_length(encode(text)) * 10) AS BIGINT) AS max_duration_ms,
          min('application/x-fake-' ||
            (['image','audio','video'])[(doc_id % 3) + 1]) AS mime
        FROM documents GROUP BY 1 ORDER BY modality""")),

    // ---- X6: binary "resize" (byte-budget truncate) ---------------------
    QueryDef("q51_media_resize",
      (s, dir) => Multimodal
        .resizeStub(
          Multimodal.fromDocuments(Tables.load(s, dir, "documents")),
          maxBytes = 120)
        .groupBy("modality")
        .agg(count(lit(1)).as("n"),
          sum(col("meta.size_bytes")).as("bytes"),
          sum(octet_length(col("payload")).cast("long")).as("payload_bytes"))
        .orderBy("modality"),
      Some("""SELECT (['image','audio','video'])[(doc_id % 3) + 1] AS modality,
          count(*) AS n,
          CAST(sum(least(octet_length(encode(text)), 120)) AS BIGINT) AS bytes,
          CAST(sum(least(octet_length(encode(text)), 120)) AS BIGINT) AS payload_bytes
        FROM documents GROUP BY 1 ORDER BY modality""")),

    // ---- X4: language-ID + quality gating -------------------------------
    QueryDef("q52_text_stats",
      (s, dir) => {
        val d = graft.scaleOut(Tables.load(s, dir, "documents"))
        val nTok = Text.tokenCount(col("text"))
        val uniqRatio = Text.distinctTokenCount(col("text")).cast("double") /
          nTok.cast("double")
        d.select(Text.langId(col("text")).as("lang_id"),
            Text.qualityBucket(nTok, uniqRatio).as("quality"))
          .groupBy("lang_id", "quality")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang_id", "quality")
      },
      Some("""WITH t AS (
          SELECT len(string_split(lower(text), ' ')) AS n_tok,
            len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
            CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' of ', ''))) / 4 AS BIGINT)
              AS sc_en,
            CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' el ', ''))) / 4 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' la ', ''))) / 4 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' de ', ''))) / 4 AS BIGINT)
              AS sc_es,
            CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' der ', ''))) / 5 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' die ', ''))) / 5 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' und ', ''))) / 5 AS BIGINT)
              AS sc_de
          FROM documents)
        SELECT CASE
            WHEN sc_en >= greatest(sc_es, sc_de) AND sc_en > 0 THEN 'en'
            WHEN sc_es >= sc_de AND sc_es > 0 THEN 'es'
            WHEN sc_de > 0 THEN 'de'
            ELSE 'und' END AS lang_id,
          CASE WHEN n_tok < 10 THEN 'too_short'
            WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) < 0.3
              THEN 'repetitive'
            WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) > 0.95
              THEN 'high'
            ELSE 'ok' END AS quality,
          count(*) AS n
        FROM t GROUP BY 1, 2 ORDER BY lang_id, quality""")),

    // ---- X6: stubbed media decode via typed Dataset mapPartitions -------
    QueryDef("q59_media_decode",
      (s, dir) => Multimodal
        .decodeFeatures(s,
          Multimodal.fromDocuments(Tables.load(s, dir, "documents")))
        .groupBy("modality")
        .agg(count(lit(1)).as("n"),
          sum("n_frames").as("frames"),
          sum("size_bytes").as("bytes"))
        .orderBy("modality"),
      Some("""SELECT (['image','audio','video'])[(doc_id % 3) + 1] AS modality,
          count(*) AS n,
          CAST(sum((octet_length(encode(text)) + 99) // 100) AS BIGINT) AS frames,
          CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes
        FROM documents GROUP BY 1 ORDER BY modality""")),

    // ---- X6: frame sampling over binary payloads ------------------------
    QueryDef("q60_frame_sample",
      (s, dir) => Multimodal
        .frameSample(
          Multimodal.fromDocuments(Tables.load(s, dir, "documents")),
          frameBytes = 64, stride = 4)
        .groupBy("modality")
        .agg(count(lit(1)).as("frames"),
          sum(octet_length(col("frame")).cast("long")).as("frame_bytes"))
        .orderBy("modality"),
      Some("""SELECT modality, CAST(sum(nf) AS BIGINT) AS frames,
          CAST(sum(fb) AS BIGINT) AS frame_bytes
        FROM (
          SELECT (['image','audio','video'])[(doc_id % 3) + 1] AS modality,
            len([i for i in range(0, (octet_length(encode(text)) - 1) // 64 + 1)
                 if i % 4 = 0]) AS nf,
            list_sum([least(64, octet_length(encode(text)) - i * 64)
                 for i in range(0, (octet_length(encode(text)) - 1) // 64 + 1)
                 if i % 4 = 0]) AS fb
          FROM documents)
        GROUP BY modality ORDER BY modality""")),

    // ---- skew: two-stage salted aggregation (oracle = plain GROUP BY) ----
    QueryDef("q62_salted_agg",
      (s, dir) => {
        val e = Tables.events(s, dir)
        Skew.saltedAgg(e,
            keyCols = Seq("event_type"),
            saltCol = col("event_id"),
            saltBuckets = 8,
            partialAggs = Seq(count(lit(1)).as("pc"),
              sum(col("value").cast("decimal(25,6)")).as("pv"),
              max("user_id").as("pm")),
            finalAggs = Seq(sum("pc").cast("long").as("n"),
              round(sum("pv"), 2).cast("double").as("total"),
              max("pm").as("max_user")))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
          CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE)
            AS total,
          max(user_id) AS max_user
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- X1+X4 composed: full corpus-curation pass ----------------------
    QueryDef("q67_corpus_curation",
      (s, dir) => Curation
        .clean(graft.scaleOut(Tables.load(s, dir, "documents")),
          "doc_id", "text")
        .groupBy("lang_id")
        .agg(count(lit(1)).as("n"), sum("n_tokens").as("tokens"),
          round(avg("uniq_ratio"), 4).as("avg_uniq"))
        .orderBy("lang_id"),
      Some("""WITH dedup AS (
          SELECT * FROM documents WHERE doc_id IN
            (SELECT min(doc_id) FROM documents GROUP BY md5(text))),
        t AS (
          SELECT doc_id,
            len(string_split(lower(text), ' ')) AS n_tok,
            len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
            CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' of ', ''))) / 4 AS BIGINT)
              AS sc_en,
            CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' el ', ''))) / 4 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' la ', ''))) / 4 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' de ', ''))) / 4 AS BIGINT)
              AS sc_es,
            CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' der ', ''))) / 5 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' die ', ''))) / 5 AS BIGINT)
            + CAST((length(' ' || text || ' ')
              - length(replace(' ' || text || ' ', ' und ', ''))) / 5 AS BIGINT)
              AS sc_de
          FROM dedup),
        q AS (SELECT doc_id, n_tok, n_uniq,
            CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS uniq_ratio,
            CASE
              WHEN sc_en >= greatest(sc_es, sc_de) AND sc_en > 0 THEN 'en'
              WHEN sc_es >= sc_de AND sc_es > 0 THEN 'es'
              WHEN sc_de > 0 THEN 'de'
              ELSE 'und' END AS lang_id,
            CASE WHEN n_tok < 10 THEN 'too_short'
              WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) < 0.3
                THEN 'repetitive'
              WHEN CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) > 0.95
                THEN 'high'
              ELSE 'ok' END AS quality
          FROM t)
        SELECT lang_id, count(*) AS n, CAST(sum(n_tok) AS BIGINT) AS tokens,
          round(avg(uniq_ratio), 4) AS avg_uniq
        FROM q
        WHERE n_tok BETWEEN 5 AND 100000
          AND quality IN ('ok', 'high') AND lang_id <> 'und'
        GROUP BY lang_id ORDER BY lang_id""")),

    // ---- X4: rolling token fingerprint ----------------------------------
    // Oracle trick: list_reduce has no explicit init, but the fold
    // (acc*1000003 + x) mod p starting at acc=0 equals a first-element
    // seed because every x < p — so the init-free DuckDB fold matches.
    QueryDef("q53_fingerprint",
      (s, dir) => graft.scaleOut(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 40))
        .select(col("doc_id"), Text.tokenFingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          list_reduce(
            list_transform(string_split(lower(text), ' '),
              t -> CAST(ascii(t) AS BIGINT) * 31 + length(t)),
            (acc, x) -> (acc * 1000003 + x) % 1000000007) AS fp
        FROM documents WHERE doc_id < 40 ORDER BY doc_id""")))
}
