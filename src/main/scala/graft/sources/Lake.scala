package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Lake IO: three-zone directory layout, extension-sniffed reads, and
  * zone writers.
  *
  * Reference semantics reproduced (see SURVEY.md §2.1/§2.2):
  *  - zones `raw/ processed/ curated/` (reference deploy-script.sh:22-24)
  *  - file-type sniffing by extension, unknown skipped
  *    (reference lambda-function.py:64-73)
  *  - CSV read with header + inference (lambda-function.py:83-86)
  *  - dual-mode JSON: array-of-objects vs NDJSON sniffed from the first
  *    non-space byte (lambda-function.py:87-95)
  *  - NaN→NULL normalization before indexing (lambda-function.py:146-152)
  *  - processed-zone writes mirror the raw key with the same format
  *    (lambda-function.py:209-232)
  *
  * Scale notes: reads/writes are plain Spark file sources — partition
  * discovery, predicate pushdown and vectorized parquet scans apply
  * unchanged on an object store. Writers accept `partitionBy` columns so
  * the hive-style `{dataType}/{date}/` layout of the reference's raw zone
  * (ingest-data-lambda.py:68) becomes real partition pruning.
  */
object Lake {

  sealed abstract class Zone(val name: String)
  case object Raw extends Zone("raw")
  case object Processed extends Zone("processed")
  case object Curated extends Zone("curated")

  def zonePath(root: String, zone: Zone, dataset: String): String =
    s"$root/${zone.name}/$dataset"

  /** S1: extension dispatch; None = unknown (caller skips, as the
    * reference logs-and-skips). */
  def detectFileType(key: String): Option[String] = {
    val k = key.toLowerCase
    if (k.endsWith(".csv")) Some("csv")
    else if (k.endsWith(".json")) Some("json")
    else if (k.endsWith(".parquet")) Some("parquet")
    else if (k.endsWith(".orc")) Some("orc")
    else None
  }

  /** S3: true when the first non-whitespace byte of the first .json file
    * under `path` is '[' (array-of-objects → Spark multiLine mode). Reads
    * at most 256 bytes of one object — cheap even against an object
    * store. Goes through the Hadoop FileSystem API (never java.io/nio),
    * so the same sniff runs against file://, hdfs:// or s3a:// paths —
    * the S3-backed lake is the reference deployment. */
  def sniffJsonMultiline(path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    if (!fs.exists(p)) return false
    val candidate: Option[Path] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .filter(_.getName.toLowerCase.endsWith(".json"))
          .sortBy(_.toString).headOption
      else Some(p)
    candidate.exists { f =>
      val in = fs.open(f)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        (0 until math.max(n, 0)).iterator
          .map(buf(_).toChar).find(!_.isWhitespace).contains('[')
      } finally in.close()
    }
  }

  /** S2/S3/S4: format-directed read with the reference's inference
    * semantics. */
  def read(spark: SparkSession, path: String, fmt: String): DataFrame =
    fmt match {
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(path)
      case "json" =>
        spark.read.option("multiLine", sniffJsonMultiline(path).toString)
          .json(path)
      case "parquet" => spark.read.parquet(path)
      case "orc"     => spark.read.orc(path)
      case other =>
        throw new IllegalArgumentException(s"unsupported format: $other")
    }

  /** S1+S2-4 composed: sniff the extension, then read. */
  def readAuto(spark: SparkSession, path: String): Option[DataFrame] =
    detectFileType(path).map(read(spark, path, _))

  /** K1-K4/K10: zone write in the given format; optional hive-style
    * partition columns (→ partition pruning on read). */
  def writeZone(df: DataFrame, root: String, zone: Zone, dataset: String,
                fmt: String, partitionCols: Seq[String] = Nil,
                mode: SaveMode = SaveMode.Overwrite): String = {
    val path = zonePath(root, zone, dataset)
    val w0 = df.write.mode(mode)
    val w = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*)
            else w0
    fmt match {
      case "csv"     => w.option("header", "true").csv(path)
      case "json"    => w.json(path)
      case "parquet" => w.parquet(path)
      case "orc"     => w.orc(path)
      case other =>
        throw new IllegalArgumentException(s"unsupported format: $other")
    }
    path
  }

  /** P3: NaN→NULL for every floating-point column (reference normalizes
    * all NaN before indexing; OpenSearch rejects NaN). Stays inside
    * whole-stage codegen — `when(isnan)` is a plain expression. */
  def nanToNull(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          when(isnan(col(f.name)), lit(null)).otherwise(col(f.name))
            .as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** P2: append the processing-time stamp column. Deterministic variant
    * takes an explicit timestamp (verified queries must not use
    * current_timestamp). */
  def withProcessedTimestamp(df: DataFrame,
                             at: Option[java.sql.Timestamp]): DataFrame =
    df.withColumn("processed_timestamp",
      at.map(lit(_)).getOrElse(current_timestamp()))

  /** S10: per-record JSON micro-ingest (API body → DataFrame). */
  def ingestJson(spark: SparkSession, records: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(records.toDS())
  }

  /** S5/P14: raw JSON document fetch as TEXT + explicit `from_json`
    * parse — the reference's get_object-then-json.loads path
    * (lambda-function.py:90-95) kept as two visible stages: the raw
    * line survives as `raw` for audit/debug, the parse is an explicit
    * schema'd expression (malformed rows → null struct, not a crash).
    * Scale: text scan splits like any file source; from_json is
    * codegen'd per row. */
  /** Retention: delete hive-style partition directories whose
    * `partCol=value` fails `keep` — the lake's TTL/vacuum pass (e.g.
    * drop `date=` partitions older than the retention window). Deletes
    * whole partition directories only, never individual files, so
    * concurrent readers of surviving partitions are unaffected.
    * Returns the dropped partition values. */
  def expirePartitions(root: String, zone: Zone, dataset: String,
                       partCol: String,
                       keep: String => Boolean): Seq[String] = {
    val base = new Path(zonePath(root, zone, dataset))
    val fs = base.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    if (!fs.exists(base) || !fs.getFileStatus(base).isDirectory) return Nil
    val prefix = partCol + "="
    val dropped = fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(s => (s.getPath, s.getPath.getName.stripPrefix(prefix)))
      .filterNot { case (_, v) => keep(v) }
      .toSeq
    dropped.foreach { case (p, _) => fs.delete(p, true) }
    dropped.map(_._2)
  }

  /** Schema evolution: parquet read that unions the schemas of every
    * file in the dataset (columns added by later writers come back
    * NULL for older files) — `mergeSchema` is off by default in Spark
    * because it costs a footer read per file; a lake whose datasets
    * evolve needs it explicit and deliberate. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def readJsonText(spark: SparkSession, path: String,
                   schema: types.StructType): DataFrame =
    spark.read.text(path)
      .select(col("value").as("raw"),
        from_json(col("value"), schema).as("doc"))

  /** S3 robustness: NDJSON read with corrupt-record quarantine. The
    * reference try/except-logs-and-skips malformed payloads
    * (lambda-function.py); losing them silently is wrong for a
    * pipeline, so the parse splits into (good rows, quarantined raw
    * lines) — route the latter to a quarantine zone. Built on the text
    * scan + from_json (filtering Spark's internal _corrupt_record
    * column directly is disallowed on raw file scans), so both halves
    * ride ONE text scan, map-only. */
  def readJsonQuarantine(spark: SparkSession, path: String,
                         schema: types.StructType)
      : (DataFrame, DataFrame) = {
    // PERMISSIVE from_json yields an all-null struct for broken input,
    // indistinguishable from a legitimately-null record — the explicit
    // corrupt-record column disambiguates: null ⇔ the line parsed.
    val pSchema = schema.add("_corrupt_record", types.StringType)
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw"),
        from_json(col("value"), pSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("doc"))
    val good = parsed.filter(col("doc._corrupt_record").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"doc.$f")): _*)
    val bad = parsed.filter(col("doc._corrupt_record").isNotNull)
      .select(col("raw").as("corrupt_record"))
    (good, bad)
  }
}
