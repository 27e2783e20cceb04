package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Catalog, Lake}

/** The reference's ingest flow (SURVEY.md §3.1): `POST /data` body →
  * raw-zone JSON keyed `{dataType}/{date}/{id}.json` + metadata record
  * put — composed Spark-first: one partitioned write (hive layout =
  * partition pruning on read) and one catalog append.
  *
  * Reference: /root/reference/python-data-ingestions/ingest-data-lambda.py
  * (defaults :54-56, id/time :58-60, raw put :62-75, record :79-94,
  * catalog put :97).
  */
object Ingest {

  /** Add `name` as a typed null column when the batch schema lacks it
    * entirely — the reference defaults per RECORD
    * (`body.get('dataType','unknown')`), so a JSON batch where no
    * record carries the field must still default instead of failing
    * analysis on the missing attribute. */
  private def ensureColumn(df: DataFrame, name: String,
                           dataType: String): DataFrame =
    if (df.columns.contains(name)) df
    else df.withColumn(name, lit(null).cast(dataType))

  /** Normalize an ingest batch: defaulted projection (P4), identity,
    * event date, size metric (A3). `at` is explicit (determinism). */
  def prepare(records: DataFrame, at: java.sql.Timestamp): DataFrame = {
    val withAll = Seq("dataType" -> "string", "source" -> "string",
      "owner" -> "string", "data" -> "string")
      .foldLeft(records) { case (df, (n, t)) => ensureColumn(df, n, t) }
    withAll
      .withColumn("dataType",
        coalesce(col("dataType"), lit("unknown")))
      .withColumn("source", coalesce(col("source"), lit("api")))
      .withColumn("owner", coalesce(col("owner"), lit("system")))
      .withColumn("timestamp", lit(at))
      .withColumn("ingest_date", to_date(lit(at)))
      .withColumn("sizeBytes",
        octet_length(to_json(struct(col("data")))).cast("long"))
  }

  /** The metadata record derived from a prepared batch — the
    * reference's DynamoDB item (ingest-data-lambda.py:79-94). */
  def metadataRecords(prepared: DataFrame, rawRoot: String): DataFrame =
    prepared.select(
      col("id"), col("timestamp"), col("dataType"), col("source"),
      col("owner"),
      concat(lit(s"$rawRoot/raw/"), col("dataType"), lit("/"),
        col("ingest_date"), lit("/"), col("id"), lit(".json"))
        .as("s3Location"),
      col("sizeBytes"),
      lit("ingested").as("status"))

  /** Full §3.1 flow: write the raw zone partitioned by
    * (dataType, ingest_date) — the reference's key layout become real
    * partition pruning — and append the metadata records to the
    * catalog table. Returns the metadata written. */
  def run(spark: SparkSession, records: DataFrame, rawRoot: String,
          metaPath: String, at: java.sql.Timestamp): DataFrame = {
    val prepared = prepare(records, at)
    Lake.writeZone(prepared, rawRoot, Lake.Raw, "ingest", "json",
      partitionCols = Seq("dataType", "ingest_date"))
    val meta = metadataRecords(prepared, rawRoot)
    Catalog.append(meta, metaPath)
    meta
  }

  /** EXPECTATION-style ingest (the pipeline "expect or quarantine" /
    * dead-letter-queue pattern on top of table CHECK constraints):
    * rows satisfying `root`'s constraints commit to it; violators land
    * in `quarantineRoot` stamped with a `violations` column naming the
    * constraints they broke — ingest keeps flowing under bad data
    * while nothing bad ever becomes visible in the curated table (the
    * softer sibling of the hard refusal
    * [[graft.sources.Manifest.addConstraint]] enforces by default).
    *
    * One pass evaluates every constraint into per-row flags (the frame
    * persists across the two writes), so cost stays ∝ the batch, and
    * the good-side commit still runs the table's own enforcement — a
    * race with a concurrently-added constraint fails loudly rather
    * than leaking. Returns (table version, quarantine version). */
  def appendWithQuarantine(spark: SparkSession, root: String,
                           df: DataFrame, quarantineRoot: String,
                           partitionCols: Seq[String] = Nil)
      : (Long, Long) =
    splitAndCommit(spark, root, df) { (good, bad) =>
      val v = graft.sources.Manifest.commitAppend(spark, root, good,
        partitionCols)
      val qv = graft.sources.Manifest.latestVersion(spark,
          quarantineRoot) match {
        case None => graft.sources.Manifest.init(spark, quarantineRoot,
          bad, partitionCols)
        case Some(_) => graft.sources.Manifest.commitAppend(spark,
          quarantineRoot, bad, partitionCols)
      }
      (v, qv)
    }

  /** STREAMING twin of [[appendWithQuarantine]] — the expectation
    * split for `foreachBatch`, so a poisoned micro-batch quarantines
    * its violators instead of failing the whole query (the reference's
    * ingest is event-driven, lambda-function.py:253-264; a DLQ'd
    * record there must not stall the stream). Exactly-once on BOTH
    * sides: good rows and violators each commit through
    * [[graft.sources.Manifest.commitStreamBatch]], whose per-table
    * `(queryId, batchId)` high-water mark makes a replayed epoch a
    * no-op — and because each table carries its OWN mark, a crash
    * BETWEEN the two commits heals on replay (the table-side commit
    * no-ops, the quarantine-side commit lands). An all-clean batch
    * still commits an empty violator frame so the quarantine table's
    * mark advances — otherwise a later replay would re-quarantine.
    * Usage:
    * {{{
    *   stream.writeStream.foreachBatch { (b, id) =>
    *     Ingest.streamBatchWithQuarantine(spark, t, b, q, "ingest", id)
    *     ()
    *   }
    * }}}
    * Returns (table version, quarantine version).
    *
    * Single-writer contract: exactly-once replay healing assumes ONE
    * stream owns each (table, queryId) mark — same contract as the
    * near-dup admission shape ([[graft.operators.Dedup
    * .incrementalNewNearDup]]): content-dependent admission predicates
    * evaluate against the snapshot read BEFORE the commit, and the
    * manifest CAS serializes commits without re-validating them. */
  def streamBatchWithQuarantine(spark: SparkSession, root: String,
                                df: DataFrame, quarantineRoot: String,
                                queryId: String, batchId: Long,
                                partitionCols: Seq[String] = Nil)
      : (Long, Long) =
    splitAndCommit(spark, root, df) { (good, bad) =>
      (graft.sources.Manifest.commitStreamBatch(spark, root, good,
        queryId, batchId, partitionCols),
       graft.sources.Manifest.commitStreamBatch(spark, quarantineRoot,
        bad, queryId, batchId, partitionCols))
    }

  /** One-pass expectation split against `root`'s CHECK constraints:
    * evaluates every constraint into per-row flags (the frame persists
    * across the two writes, so cost stays ∝ the batch), hands
    * (good, bad-with-`violations`) to `commit`. The good-side commit
    * still runs the table's own enforcement — a race with a
    * concurrently-added constraint fails loudly rather than leaking. */
  private def splitAndCommit(spark: SparkSession, root: String,
                             df: DataFrame)
      (commit: (DataFrame, DataFrame) => (Long, Long)): (Long, Long) = {
    val cs = graft.sources.Manifest.constraintsOf(spark, root)
      .toSeq.sortBy(_._1)
    require(cs.nonEmpty,
      s"$root has no CHECK constraints — use commitAppend directly")
    val violCol = array(cs.map { case (n, e) =>
      when(!coalesce(expr(e), lit(true)), lit(n))
    }: _*)
    val flagged = df.withColumn("__viol",
      filter(violCol, v => v.isNotNull)).persist()
    try {
      val good = flagged.filter(size(col("__viol")) === 0)
        .drop("__viol")
      val bad = flagged.filter(size(col("__viol")) > 0)
        .withColumn("violations",
          concat_ws(",", col("__viol"))).drop("__viol")
      commit(good, bad)
    } finally flagged.unpersist()
  }
}
