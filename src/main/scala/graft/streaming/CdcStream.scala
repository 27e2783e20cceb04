package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** S9/R5: CDC over the metadata catalog — the DynamoDB-streams analog
  * (reference index-data-lambda.py:60-65: each stream record carries the
  * NewImage of a metadata row; the handler re-derives and re-PUTs the
  * search document).
  *
  * Spark-native shape: the metadata table is an append-only parquet
  * directory where every appended file is a change event (the full new
  * image of the record — insert and modify look identical, like a
  * DynamoDB NewImage). A file-source stream discovers appends
  * incrementally; `foreachBatch` re-derives index documents and writes
  * them idempotently (per-batch partition overwrite, same contract as
  * IngestStream). Reading the CURRENT index = last-writer-wins over all
  * batches, resolved by (version, batch) — a per-key window, never a
  * global one.
  *
  * Scale notes: discovery cost is per-new-file, not per-table; the
  * re-derive is map-only; the LWW read is one shuffle on the id — at
  * 100 TB the index table would be partitioned by id bucket so the
  * window stays within partitions.
  */
object CdcStream {

  /** R5: the change stream itself — every appended metadata file
    * becomes rows in a micro-batch. */
  def changes(spark: SparkSession, metaDir: String, schema: StructType,
              maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(metaDir)

  /** S9/R5: stream metadata changes → re-derived index documents.
    * `deriveDoc` maps the new metadata image to the index document
    * (defaults to identity). Within a batch the latest version of each
    * id wins; across batches the reader resolves by (versionCol,
    * batch_id). `Trigger.AvailableNow` drains and stops — call again on
    * the same checkpoint to pick up later appends. */
  def startReindex(spark: SparkSession, metaDir: String, schema: StructType,
                   indexDir: String, checkpointDir: String,
                   idCol: String, versionCol: String,
                   deriveDoc: DataFrame => DataFrame = identity)
      : StreamingQuery =
    changes(spark, metaDir, schema).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val lww = Window.partitionBy(col(idCol))
          .orderBy(col(versionCol).desc)
        val latest = batch
          .withColumn("__rn", row_number().over(lww))
          .filter(col("__rn") === 1).drop("__rn")
        deriveDoc(latest).write.mode("overwrite")
          .parquet(s"$indexDir/batch_id=$batchId")
        ()
      }
      .start()

  /** The materialized CURRENT index: last writer wins per id across all
    * batches, ties broken by the later batch. */
  def currentIndex(spark: SparkSession, indexDir: String,
                   idCol: String, versionCol: String): DataFrame = {
    val all = spark.read.parquet(indexDir)
    val lww = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col("batch_id").desc)
    all.withColumn("__rn", row_number().over(lww))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
