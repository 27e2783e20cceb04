package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet under `sfDir`. The only special case is
  * `events`, whose `ts` column encoding has varied across testdata
  * generations: parquet TIMESTAMP(NANOS) (reads as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`) vs plain TIMESTAMP micros
  * (reads as TimestampType or TIMESTAMP_NTZ). `events` normalizes both
  * to one contract — epoch-nanos LongType — so every downstream query
  * sees a single dtype regardless of which generator wrote the file.
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

  /** events with `ts` normalized to epoch-nanos LongType, whatever the
    * parquet encoding. NTZ wall-clock is interpreted as UTC — sessions
    * here pin `spark.sql.session.timeZone=UTC`, matching how the DuckDB
    * oracle treats naive timestamps, so the cast is value-exact. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) via nanosAsLong: already epoch-nanos
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported encoding $other (expected long nanos or timestamp)")
    }
  }

  /** events with a derived microsecond `event_time` TimestampType column
    * (nanos truncated) — for window()/watermark operators. */
  def eventsWithTime(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
}
