package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.{Sampling, Similarity}
import graft.plans.TopK

/** PERSISTED IVF-PQ SERVING ARTIFACT — the production ANN index shape
  * at 100 TB, promoted from q244's inline build to a first-class
  * source so single-query AND batched serving share one artifact and
  * one plan. Reference scope: the OpenSearch tier's maintained k-NN
  * index concept (README.md:26), re-expressed as versioned Manifest
  * tables; the IVF-PQ + refine composition follows the public FAISS
  * design (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; faiss `IndexIVFPQ` + `IndexRefineFlat`).
  *
  * LAYOUT — three Manifest tables under one root:
  *   `root/codes`  (id, m, code, centroid_id) PARTITIONED BY
  *                 centroid_id — the probe's partition pruning works on
  *                 real files: unprobed cells' parquet never enters the
  *                 plan. Header carries (dim, m, pqK, nCells).
  *   `root/books`  (m, cid, cv) — the PQ codebooks, m·pqK rows.
  *   `root/pivots` (pid, pv) — the IVF cell representatives, selected
  *                 by [[Similarity.ivfPivots]] (the ONE shared rule, so
  *                 probe selection can never desynchronize from the
  *                 stored assignment).
  *
  * BUILD (once, amortized over every query): codebooks train on a
  * bounded `trainSample` hash-ordered sample (the FAISS discipline —
  * train cost stops growing with the corpus), the corpus is encoded
  * once, assigned to cells once, and committed clustered by cell.
  *
  * SERVE (per query set): probe selection is |Q|·nCells pivot
  * arithmetic (stats-sized); the codes read partition-prunes to the
  * UNION of all queries' probed cells and is read ONCE for the whole
  * batch; each query ADCs only ITS probed cells' codes (a broadcast
  * (qid, cell) pair join); per-query shortlists run through the
  * bounded-heap [[graft.plans.TopK.perGroup]] plan (no corpus sort);
  * the exact re-rank joins only shortlist rows back to the vector
  * store. Per query the output is IDENTICAL to
  * [[Similarity.pqTopKRefinedBatch]] at the same settings whenever the
  * probed cells contain the true top-k (validate-then-pin, the q229
  * discipline) — the artifact is an amortization + pruning, never an
  * approximation change. */
object IvfPqIndex {

  /** Build the artifact under `root` (a URI, e.g. "file:///tmp/x").
    * One bounded codebook train, one corpus encode, one map-only cell
    * assignment, three commits.
    *
    * `storeVectors` additionally commits the FULL vectors cell-
    * partitioned (`root/vecs`) — the FAISS inverted-list-with-raw-
    * vectors layout: the exact re-rank then reads vectors from the
    * PROBED CELLS ONLY (shortlist ids live there by construction), so
    * serving never touches an external vector store at all and the
    * whole serve is partition-pruned end to end. Costs ~dim·8 bytes/
    * row of index storage — the standard space-for-IO trade. */
  def create(spark: SparkSession, root: String, emb: DataFrame,
             idCol: String, vecCol: String, dim: Int, nCells: Int,
             m: Int, pqK: Int, iters: Int, trainSample: Int,
             storeVectors: Boolean = false): Unit = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val trainSet =
      if (trainSample > 0)
        emb.orderBy(Sampling.portableHash(col(idCol), "pqtrain").asc,
          col(idCol).asc).limit(trainSample)
      else emb
    val books = Similarity.pqCodebooks(trainSet, idCol, vecCol,
      dim, m, pqK, iters)
    val codes = Similarity.pqEncode(emb, idCol, vecCol, books, dim, m)
    val assign = Similarity.ivfIndex(emb, idCol, vecCol, nCells)
      .select(col(idCol).as("id"), col("centroid_id"))
    // commit ORDER is the crash-safety contract: books/pivots/vecs
    // land first, the codes header — the discovery flag meta() keys
    // on — LAST. A crash mid-create then leaves a root meta()
    // REFUSES (no pq.dim header yet) instead of a half-artifact
    // whose serve would fail late or, worse, partially answer.
    // meta() additionally re-verifies the component tables resolve.
    Manifest.init(spark, s"$root/books", books)
    Manifest.init(spark, s"$root/pivots",
      Similarity.ivfPivots(emb, idCol, vecCol, nCells))
    if (storeVectors)
      Manifest.init(spark, s"$root/vecs",
        emb.select(col(idCol).as("id"),
            Vectors.toDouble(col(vecCol)).as("v"))
          .join(assign, Seq("id")),
        partitionCols = Seq("centroid_id"))
    Manifest.init(spark, s"$root/codes", codes.join(assign, Seq("id")),
      partitionCols = Seq("centroid_id"),
      extraMeta = Map("pq.dim" -> dim.toString, "pq.m" -> m.toString,
        "pq.k" -> pqK.toString, "pq.cells" -> nCells.toString) ++
        (if (storeVectors) Map("pq.vecs" -> "1") else Map.empty))
  }

  private def meta(spark: SparkSession, root: String)
      : Map[String, String] = {
    val head = Manifest.latestVersion(spark, s"$root/codes").getOrElse(
      throw new IllegalStateException(s"$root/codes not initialized"))
    val m = Manifest.snapshotMeta(spark, s"$root/codes", head).meta
    require(m.contains("pq.dim"),
      s"$root/codes is not an IVF-PQ artifact (no pq.dim header)")
    // component tables must resolve before the artifact serves —
    // guards a root whose create crashed mid-way (or was partially
    // copied): cheap manifest-head reads, no data IO
    val parts = Seq("books", "pivots") ++
      (if (m.contains("pq.vecs")) Seq("vecs") else Nil)
    parts.foreach { t =>
      require(Manifest.latestVersion(spark, s"$root/$t").isDefined,
        s"$root is an incomplete IVF-PQ artifact: $root/$t missing " +
          "(create crashed mid-way?) — rebuild before serving")
    }
    m
  }

  /** BATCHED serve from the persisted artifact — the composition the
    * round-17 verdict named: q244's partition-pruned single-query plan
    * × q245's batch amortization.
    *
    * `queries` is `(queryIdCol, vecCol)`; `vectorStore` supplies the
    * full vectors for the exact re-rank (at 100 TB: the id-keyed
    * embedding table — the re-rank semi-joins refineFactor·topK rows
    * per query into it, never a corpus pass). Pass `None` for an
    * index built with `storeVectors`: the re-rank then reads vectors
    * from the probed cells' own files (partition-pruned — serving is
    * index-resident end to end). Rows with `id == qid` are excluded
    * per query (self-match). Returns `(query_id, <idCol>, l2_dist)` —
    * per-query the EXACT L2 top-k whenever each query's probed cells
    * contain it (6-dp round-before-rank keys, the registry
    * discipline). */
  def searchBatch(spark: SparkSession, root: String,
                  vectorStore: Option[DataFrame], queries: DataFrame,
                  idCol: String, vecCol: String, queryIdCol: String,
                  topK: Int, nProbe: Int, refineFactor: Int): DataFrame = {
    require(topK >= 1 && nProbe >= 1 && refineFactor >= 1,
      "topK, nProbe, refineFactor must all be >= 1")
    val mt = meta(spark, root)
    require(vectorStore.isDefined || mt.contains("pq.vecs"),
      s"$root stores no vectors (created without storeVectors) — " +
        "pass the vector store for the exact re-rank")
    val dim = mt("pq.dim").toInt
    val m = mt("pq.m").toInt
    val subDim = dim / m
    val qset = broadcast(queries.select(
      col(queryIdCol).as("qid"),
      Vectors.toDouble(col(vecCol)).as("qvec")))
    // probe selection: |Q|·nCells pivot cosines, nProbe cells per
    // query via the bounded-heap plan; the collect is ≤ |Q|·nProbe
    // rows by construction — the train-loop argmax class
    val scoredPivots = Manifest.read(spark, s"$root/pivots")
      .crossJoin(qset)
      .select(col("qid"), col("pid"),
        coalesce(Vectors.cosine(col("qvec"), col("pv")), lit(-2.0))
          .as("pc"))
    val probePairs = TopK.perGroup(scoredPivots, Seq("qid"),
        Seq(TopK.desc("pc"), TopK.asc("pid")), nProbe)
      .select(col("qid"), col("pid").as("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val unionCells = probePairs.map(_._2).distinct
    import spark.implicits._
    val probeDf = broadcast(
      probePairs.toDF("qid", "centroid_id"))
    // per-query ADC lookup table: |Q|·m·pqK rows, one broadcast
    val qsub = qset.select(col("qid"),
        posexplode(Similarity.subspaces(col("qvec"), m, subDim)))
      .toDF("qid", "m", "qsv")
    val lut = broadcast(Manifest.read(spark, s"$root/books")
      .join(qsub, Seq("m"))
      .select(col("qid"), col("m"), col("cid").as("code"),
        Similarity.l2sq(col("cv"), col("qsv")).as("pd")))
    // THE PRUNED READ — once for the whole batch: the isin over the
    // UNION of probed cells is a partition filter (unprobed cells'
    // files never enter the plan); the broadcast pair join then
    // restricts each query's ADC to ITS OWN probed cells
    val scored = Manifest.read(spark, s"$root/codes")
      .filter(col("centroid_id").isin(unionCells: _*))
      .join(probeDf, Seq("centroid_id"))
      .filter(col("id") =!= col("qid"))
      .join(lut, Seq("qid", "m", "code"))
      .groupBy("qid", "id").agg(sum("pd").as("ad"))
    val short = TopK.perGroup(scored, Seq("qid"),
      Seq(TopK.asc("ad"), TopK.asc("id")), refineFactor * topK)
    // exact re-rank: shortlist-sized join into the vector store — the
    // external id-keyed table, or (index-resident) the probed cells'
    // own vector files, pruned by the same union filter
    val vmap = vectorStore match {
      case Some(vs) => vs.select(col(idCol).as("id"),
        Vectors.toDouble(col(vecCol)).as("v"))
      case None => Manifest.read(spark, s"$root/vecs")
        .filter(col("centroid_id").isin(unionCells: _*))
        .select(col("id"), col("v"))
    }
    TopK.perGroup(
      short.select("qid", "id")
        .join(vmap, Seq("id"))
        .join(qset, Seq("qid"))
        .select(col("qid"), col("id"),
          round(Similarity.l2sq(col("v"), col("qvec")), 6)
            .as("l2_dist")),
      Seq("qid"), Seq(TopK.asc("l2_dist"), TopK.asc("id")), topK)
      .select(col("qid").as("query_id"), col("id").as(idCol),
        col("l2_dist"))
  }

  /** Single-query serve — [[searchBatch]] with a one-row query set
    * (q244's plan shape), returning `(<idCol>, l2_dist)` ascending. */
  def search(spark: SparkSession, root: String,
             vectorStore: Option[DataFrame],
             queries: DataFrame, idCol: String, vecCol: String,
             queryIdCol: String, topK: Int, nProbe: Int,
             refineFactor: Int): DataFrame =
    searchBatch(spark, root, vectorStore, queries, idCol, vecCol,
      queryIdCol, topK, nProbe, refineFactor)
      .select(col(idCol), col("l2_dist"))
      .orderBy(col("l2_dist").asc, col(idCol).asc)
}
