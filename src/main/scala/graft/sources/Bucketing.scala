package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join path (builder mandate:
  * "repartition/bucketing for co-located joins").
  *
  * A table bucketed by its join key is pre-shuffled ON DISK: every
  * bucket file holds one hash slice of the key space, so a join between
  * two tables bucketed the same way needs NO exchange at query time —
  * at 100 TB that's the difference between re-shuffling the fact table
  * on every query and shuffling it once at write time. Sort-within-
  * buckets additionally removes the join's Sort (sort-merge reads
  * pre-sorted bucket files).
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero Exchange when bucketing is enabled. */
  def cogroupedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
