package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet under `sfDir`. The only special case is
  * `events`, whose `ts` column is parquet TIMESTAMP(NANOS) — Spark's
  * vectorized reader rejects nanosecond timestamps, so we read the raw
  * int64 via `spark.sql.legacy.parquet.nanosAsLong` and derive a
  * microsecond `event_time` column explicitly.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions reading `events` must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at build time (done in
    * Verify/Bench/test sessions) — TIMESTAMP(NANOS) then arrives as
    * LongType. Kept out of this loader: a read helper silently mutating
    * session config is a surprise that outlives the call. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as raw epoch-nanos long (exact, no precision loss). */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")

  /** events with a derived microsecond `event_time` TimestampType column
    * (nanos truncated) — for window()/watermark operators. */
  def eventsWithTime(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
}
