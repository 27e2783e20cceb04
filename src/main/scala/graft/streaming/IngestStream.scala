package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sources.Lake

/** Structured-Streaming ingest pipeline (SURVEY.md §2.9, R1-R5).
  *
  * Reference behavior: each S3 `ObjectCreated` under `raw/` fires a
  * Lambda that (a) bulk-indexes the file into search and (b) rewrites it
  * to `processed/` (lambda-function.py:199-275). The Spark-native analog
  * is a file-source stream on the raw directory with a `foreachBatch`
  * two-sink fan-out; checkpointing + idempotent file sinks give the same
  * at-least-once-with-idempotent-sink contract the reference gets from
  * ES `PUT _doc/{id}` (R4).
  *
  * Scale notes: the file source discovers new objects incrementally
  * (maxFilesPerTrigger bounds a micro-batch); the pipeline itself is
  * map-only — no shuffle until the optional windowed aggregation, whose
  * state is bounded by the watermark.
  */
object IngestStream {

  /** R1: file-source stream on a raw-zone dataset directory. */
  def rawStream(spark: SparkSession, rawDir: String, schema: StructType,
                fmt: String, maxFilesPerTrigger: Int = 100): DataFrame = {
    val r = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    fmt match {
      case "csv"     => r.option("header", "true").csv(rawDir)
      case "json"    => r.json(rawDir)
      case "parquet" => r.parquet(rawDir)
      case other =>
        throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** R2+R3: per-batch transform (processing-time stamp + NaN→NULL) and
    * two-sink fan-out: processed zone (same format) + search-index
    * table (parquet append). `Trigger.AvailableNow` drains everything
    * discoverable, then stops — the batch-driven smoke-test mode. */
  def startPipeline(spark: SparkSession, rawDir: String, schema: StructType,
                    fmt: String, processedDir: String, indexDir: String,
                    checkpointDir: String): StreamingQuery =
    rawStream(spark, rawDir, schema, fmt).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val transformed = Lake.nanToNull(batch)
          .withColumn("processed_timestamp", current_timestamp())
        // Idempotent replay: each sink writes into a batch_id=<n>
        // partition directory with overwrite — if the index write fails
        // after the processed write succeeded, the replayed batch
        // overwrites the same partition instead of duplicating rows
        // (at-least-once delivery × idempotent sink = effectively-once).
        val processed = transformed.persist()
        try {
          val pDir = s"$processedDir/batch_id=$batchId"
          // Sink 1: processed zone, mirroring the raw format (K2-K4).
          (fmt match {
            case "csv" => processed.write.option("header", "true")
              .mode("overwrite").csv(pDir)
            case "json" => processed.write.mode("overwrite").json(pDir)
            case _ => processed.write.mode("overwrite").parquet(pDir)
          })
          // Sink 2: the search-index table (K5).
          processed.write.mode("overwrite")
            .parquet(s"$indexDir/batch_id=$batchId")
        } finally processed.unpersist()
        ()
      }
      .start()

  /** W2/R6: tumbling event-time window aggregation with a watermark —
    * the dashboard's 300 s buckets as a streaming query. State size is
    * bounded: windows older than watermark are evicted. */
  def windowedCounts(events: DataFrame, tsCol: String, windowLen: String,
                     watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** R6: sliding event-time windows (length > slide ⇒ overlapping
    * buckets; each event lands in length/slide windows). */
  def slidingWindowCounts(events: DataFrame, tsCol: String,
                          windowLen: String, slide: String,
                          watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** R6: session windows — a session extends while events arrive within
    * `gap` of each other; state closes (and emits) once the watermark
    * passes the gap. Works identically in batch mode (used by the
    * oracle-checked q58). */
  def sessionWindowCounts(events: DataFrame, tsCol: String, keyCol: String,
                          gap: String,
                          watermark: Option[String]): DataFrame = {
    val src = watermark.map(events.withWatermark(tsCol, _)).getOrElse(events)
    src.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n"))
  }

  /** R-surface extension: stream-stream equi-join with bounded state.
    * Both sides are watermarked and the time-range predicate bounds how
    * long either side's state is retained (without it Spark would have
    * to keep every row forever). Right-side events join when they occur
    * within [left ts, left ts + within]. */
  def joinStreams(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTsCol: String, rightTsCol: String,
                  watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermark).alias("l")
    val r = right.withWatermark(rightTsCol, watermark).alias("r")
    l.join(r, expr(
      s"""l.$keyCol = r.$keyCol AND
          r.$rightTsCol >= l.$leftTsCol AND
          r.$rightTsCol <= l.$leftTsCol + INTERVAL $within"""))
  }

  /** R-surface extension: stream-STATIC enrichment — the streaming
    * analog of the left-outer metadata enrich (J3): every micro-batch
    * joins against the (small) static dimension, broadcast so the
    * stream side never shuffles. The dimension is re-read per batch by
    * Spark's incremental planner, so a refreshed dimension table is
    * picked up without restarting the query — the standard
    * slowly-changing-dimension pattern. */
  def enrichWithDimension(stream: DataFrame, dim: DataFrame,
                          keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left_outer")

  /** R-surface extension (Spark 4 API): per-key running totals via
    * `transformWithState` — the modern arbitrary-state operator
    * (typed per-state handles, optional TTL, RocksDB-backed) that
    * supersedes mapGroupsWithState for new pipelines. Same semantics as
    * [[runningCounts]] but summing `valCol`, with state declared
    * through a [[StatefulTotal]] processor. Requires the RocksDB state
    * store provider (set
    * `spark.sql.streaming.stateStore.providerClass`); run with
    * OutputMode.Update. */
  def runningTotalsTws(events: DataFrame, keyCol: String,
                       valCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("string"), col(valCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new StatefulTotal(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
      .toDF(keyCol, "total")
  }

  /** R-surface extension: arbitrary keyed state via mapGroupsWithState —
    * the primitive for stateful logic no built-in window expresses.
    * Running per-key totals that persist ACROSS micro-batches (state =
    * one Long per key, stored in the state store, checkpointed with the
    * query). Emits the updated total for every key seen in a batch —
    * run with OutputMode.Update. */
  def runningCounts(events: DataFrame, keyCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("string")).as[String]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (String, Long)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (key, total)
      }
      .toDF(keyCol, "total")
  }

  /** R-surface extension: event-time inactivity detection via
    * flatMapGroupsWithState + EventTimeTimeout — emits an alert row
    * (key, last_seen) once a key has been quiet for `gapMs` of EVENT
    * time. State is one timestamp per live key; the timeout fires when
    * the WATERMARK passes last-seen + gap, so alerts are correct under
    * reordering and the state store stays bounded (fired keys are
    * removed). The built-in session_window emits per-session
    * aggregates — it cannot express ABSENCE; this can. Run with
    * OutputMode.Append. */
  def inactivityAlerts(events: DataFrame, keyCol: String, tsCol: String,
                       watermark: String, gapMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, java.sql.Timestamp)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator((key, new java.sql.Timestamp(last)))
          } else {
            val batchMax = rows.map(_._2.getTime).max
            val last = math.max(state.getOption.getOrElse(0L), batchMax)
            state.update(last)
            // Clamp: a late-but-admitted event can put last+gap AT or
            // BEHIND the current watermark, and Spark throws (killing
            // the query) on a timeout ≤ watermark. Clamping to wm+1
            // fires the alert on the next batch — the correct semantics
            // for "already quiet longer than gap".
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(wm + 1, last + gapMs))
            Iterator.empty
          }
      }
      .toDF(keyCol, "last_seen")
  }

  /** R4: explicit streaming dedup by id within the watermark horizon —
    * the same id re-arriving with a different event timestamp is still a
    * duplicate and is dropped (state for an id expires once the
    * watermark passes its first arrival). */
  def dedupStream(events: DataFrame, tsCol: String, idCol: String,
                  watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)
}

/** StatefulProcessor for [[IngestStream.runningTotalsTws]]: one
  * ValueState[Long] per key, no TTL (pass a TTLConfig to expire idle
  * keys), emitting the updated total for each key seen in a batch. */
class StatefulTotal extends org.apache.spark.sql.streaming.StatefulProcessor[
    String, (String, Long), (String, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                               timers: TimerValues)
      : Iterator[(String, Long)] = {
    val t = (if (total.exists()) total.get() else 0L) +
      rows.map(_._2).sum
    total.update(t)
    Iterator((key, t))
  }
}
