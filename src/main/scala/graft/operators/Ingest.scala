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
}
