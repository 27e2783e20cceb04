package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata catalog: the DynamoDB-table-of-ingest-records analog
  * (reference ingest-data-lambda.py:79-94) plus the Glue-catalog role
  * (table registration, terraform main.tf:199-214).
  *
  * The metadata table is an ordinary DataFrame with the fixed core
  * schema below; catalog mutations (the reference's `update_item`) are
  * expressed as recompute-and-rewrite column updates — idiomatic for an
  * immutable lake without a transactional table format (divergence
  * documented in SURVEY.md §7 "hard parts").
  */
object Catalog {

  /** Core metadata record (reference ingest-data-lambda.py:79-94 +
    * index-data-lambda.py:164-172's indexed/indexedAt mutation). */
  case class IngestRecord(
      id: String,
      timestamp: java.sql.Timestamp,
      dataType: String,
      source: String,
      owner: String,
      s3Location: String,
      sizeBytes: Long,
      status: String,
      tags: Seq[String],
      description: Option[String],
      indexed: Boolean,
      indexedAt: Option[java.sql.Timestamp])

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("timestamp", TimestampType),
    StructField("dataType", StringType),
    StructField("source", StringType),
    StructField("owner", StringType),
    StructField("s3Location", StringType),
    StructField("sizeBytes", LongType),
    StructField("status", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("description", StringType),
    StructField("indexed", BooleanType),
    StructField("indexedAt", TimestampType)))

  /** Conjunctive metadata filter — mirrors the reference's AND-folded
    * DynamoDB FilterExpression (query-data-lambda.py:124-145): optional
    * equality on dataType/owner/source, inclusive timestamp range,
    * all-of tags containment, default page limit 20. */
  case class MetaFilter(
      dataType: Option[String] = None,
      owner: Option[String] = None,
      source: Option[String] = None,
      dateFrom: Option[java.sql.Timestamp] = None,
      dateTo: Option[java.sql.Timestamp] = None,
      tags: Seq[String] = Nil,
      limit: Int = 20)

  /** P5-P8 composed: build the conjunctive predicate. */
  def predicate(f: MetaFilter): Option[Column] = {
    val preds: Seq[Column] =
      f.dataType.map(col("dataType") === _).toSeq ++
      f.owner.map(col("owner") === _).toSeq ++
      f.source.map(col("source") === _).toSeq ++
      ((f.dateFrom, f.dateTo) match {
        case (Some(a), Some(b)) => Seq(col("timestamp").between(a, b))
        case (Some(a), None)    => Seq(col("timestamp") >= a)
        case (None, Some(b))    => Seq(col("timestamp") <= b)
        case _                  => Nil
      }) ++
      f.tags.map(t => array_contains(col("tags"), t))
    preds.reduceOption(_ && _)
  }

  /** S7+W1: filtered metadata scan, most-recent-first, limited — the
    * reference's "limited set of most recent items" intent
    * (query-data-lambda.py:151-152) made explicit with a total order
    * (timestamp desc, id asc tiebreak). TakeOrderedAndProject: no full
    * sort materializes at scale. */
  def search(meta: DataFrame, f: MetaFilter): DataFrame = {
    val filtered = predicate(f).map(meta.filter).getOrElse(meta)
    filtered.orderBy(col("timestamp").desc, col("id").asc).limit(f.limit)
  }

  /** S7 pagination: keyset continuation for [[search]] — the DynamoDB
    * LastEvaluatedKey / ExclusiveStartKey analog. The cursor is the
    * (timestamp, id) of the LAST row of the previous page; the next
    * page is the recency-ordered rows strictly after it. Keyset, not
    * OFFSET: the cursor predicate pushes into the scan so page N costs
    * the same as page 1, where OFFSET would read and discard N·limit
    * rows — the only pagination that survives 100 TB. */
  def searchAfter(meta: DataFrame, f: MetaFilter,
                  afterTs: java.sql.Timestamp,
                  afterId: String): DataFrame = {
    val filtered = predicate(f).map(meta.filter).getOrElse(meta)
    filtered
      .filter(col("timestamp") < lit(afterTs) ||
        (col("timestamp") === lit(afterTs) && col("id") > lit(afterId)))
      .orderBy(col("timestamp").desc, col("id").asc)
      .limit(f.limit)
  }

  /** S6: point lookup by key — predicate-pushdown point scan. */
  def pointLookup(meta: DataFrame, id: String): DataFrame =
    meta.filter(col("id") === lit(id))

  /** K8: column update on the keys present in `ids` (semi-join driven
    * update, reference index-data-lambda.py:164-172). Pure recompute:
    * rows whose id matches get indexed=true/indexedAt=at. */
  def markIndexed(meta: DataFrame, ids: DataFrame, idCol: String,
                  at: java.sql.Timestamp): DataFrame = {
    val hit = broadcast(ids.select(col(idCol).as("__upd_id")).distinct())
    meta.join(hit, meta("id") === hit("__upd_id"), "left_outer")
      .withColumn("indexed",
        when(col("__upd_id").isNotNull, lit(true)).otherwise(col("indexed")))
      .withColumn("indexedAt",
        when(col("__upd_id").isNotNull, lit(at)).otherwise(col("indexedAt")))
      .drop("__upd_id")
  }

  /** J6/K6: last-writer-wins upsert by key — anti-join the stale rows
    * away, then union the updates (ES `PUT _doc/{id}` semantics,
    * reference index-data-lambda.py:390-411). */
  def upsert(existing: DataFrame, updates: DataFrame,
             key: String): DataFrame =
    existing.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** J6/K6 closed at the FILE level: copy-on-write partition merge —
    * the transactional-table-format "MERGE INTO" pattern without the
    * format dependency. Partitions touched by the updates are merged
    * (last-writer-wins [[upsert]] by `key`) and rewritten; every other
    * partition's files are left byte-identical, so the write cost is
    * O(touched partitions), not O(table), and readers of untouched
    * partitions never see a rewrite.
    *
    * Mechanics: the updates' partition values select the touched slice
    * of the target via a broadcast semi-join (dynamic partition pruning
    * keeps the scan to those directories); merged rows are staged to a
    * sibling dir first, then swapped in with dynamic partition
    * overwrite — the swap never reads the path it is writing, and the
    * staging dir is managed through the Hadoop FileSystem API so the
    * same code runs against file:// or s3a:// roots. Updates must keep
    * each row's partition value (a key changing partitions is a
    * delete+insert, not a merge). Caveat vs a real table format: the
    * per-partition swap is atomic per partition, not across partitions
    * — a reader racing the swap can see partition A new + partition B
    * old; snapshot isolation needs a manifest layer (SURVEY §7). */
  def mergeInto(spark: SparkSession, path: String, updates: DataFrame,
                key: String, partitionCol: String): Unit = {
    val target = spark.read.parquet(path)
    // null-safe semi join (<=>): a NULL partition value is a real,
    // touchable partition (__HIVE_DEFAULT_PARTITION__ on disk); a
    // plain equi-join would drop its existing target rows and the
    // dynamic overwrite would then replace that partition with only
    // the updates' rows — silent data loss.
    val touched = updates.select(col(partitionCol).as("__touched_pv"))
      .distinct()
    val merged = upsert(
      target.join(broadcast(touched),
        target(partitionCol) <=> touched("__touched_pv"), "left_semi"),
      updates, key)
    val staging =
      new org.apache.hadoop.fs.Path(path + "__merge_staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    merged.write.partitionBy(partitionCol).parquet(staging.toString)
    val prev =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // explicit schema bypasses partition-value INFERENCE entirely:
      // inference would type a numeric-looking string partition ('01')
      // as int and rewrite it ('1'), and an all-null touched slice as
      // VOID — with the schema given, the staged values read back
      // exactly as written
      spark.read.schema(merged.schema).parquet(staging.toString)
        .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    } finally {
      prev.fold(
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        v => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))
      fs.delete(staging, true)
    }
  }

  /** S11: register a parquet directory as a session-scoped view (the
    * quick path). */
  def register(spark: SparkSession, name: String, path: String): Unit =
    spark.read.parquet(path).createOrReplaceTempView(name)

  /** S11: register a parquet directory as a PERSISTENT catalog table —
    * the Glue-crawler role, on demand instead of a 12 h cron. The table
    * is an external (unmanaged) entry in the session catalog /
    * metastore: dropping it never deletes data, and with a Hive
    * metastore configured it survives the session, exactly like a
    * crawled Glue table. Schema comes from the parquet footers at
    * registration; re-running refreshes it. */
  def registerPersistent(spark: SparkSession, name: String,
                         path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` USING PARQUET LOCATION '$path'")
  }

  /** K7: metadata catalog put — append new ingest records to the
    * catalog table directory. */
  def append(records: DataFrame, path: String): Unit =
    records.write.mode("append").parquet(path)
}
