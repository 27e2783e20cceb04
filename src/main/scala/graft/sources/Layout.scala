package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving.
  *
  * A table sorted by ONE column gives min/max file skipping on that
  * column only; queries filtering the second column scan everything.
  * Interleaving the bits of both columns into one sort key keeps rows
  * close in BOTH dimensions inside each file, so every file's min/max
  * envelope is tight on every interleaved column — the layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain
  * integer arithmetic (shift/mask/or), codegen-friendly and
  * bit-identical in any engine.
  *
  * Scale shape: computing the key is map-only; laying out by it is the
  * ordinary range-partitioned sort a bulk rewrite already pays. Nothing
  * here is driver-side.
  */
object Layout {

  /** Bits per dimension (two dims interleave into 2×`bits` ≤ 62). */
  val DefaultBits = 16

  /** Morton (Z-order) code of two non-negative ints using the low
    * `bits` of each: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. Pure shift/mask/or fold — no UDF, no lookup table.
    * Uses `%` (not pmod) so the arithmetic is bit-identical to the
    * [[morton2Sql]] mirror in every engine, including the (degenerate,
    * documented-unsupported) negative-input case. */
  def morton2(x: Column, y: Column, bits: Int = DefaultBits): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xm = x.cast("long") % lit(1L << bits)
    val ym = y.cast("long") % lit(1L << bits)
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_.bitwiseOR(_))
  }

  /** K-dimensional Morton code: bit `i` of column `j` lands at
    * position `i*k + j` — the 2-d [[morton2]] layout generalized (for
    * k=2 the bit placement is identical). All dims get `bits` bits;
    * `bits*k` must fit a positive long (≤ 62). Same pure
    * shift/mask/or fold, codegen-friendly, no UDF. */
  def mortonN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"mortonN needs at least 2 columns, got $k")
    require(bits > 0 && bits * k <= 62,
      s"bits*dims must be in [1,62], got $bits*$k")
    cols.zipWithIndex.map { case (c, j) =>
      val m = c.cast("long") % lit(1L << bits)
      (0 until bits).map(i =>
        shiftleft(shiftright(m, i).bitwiseAND(lit(1L)), i * k + j))
        .reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** The same morton2 as engine-portable SQL text (for oracle mirrors
    * and pushdown into other engines): identical shift/mask arithmetic,
    * generated term by term. */
  def morton2Sql(x: String, y: String, bits: Int = DefaultBits): String = {
    val xm = s"(($x) % ${1L << bits})"
    val ym = s"(($y) % ${1L << bits})"
    (0 until bits).flatMap { i =>
      Seq(s"((($xm >> $i) & 1) << ${2 * i})",
        s"((($ym >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Annotate with the z-value and a coarse `tile` (the z-value's high
    * bits): rows sharing a tile are neighbors in both dimensions, so a
    * file-per-tile layout has tight min/max envelopes on both columns.
    * `tileBits` = number of low bits dropped; 2·bits−tileBits bits of
    * tile remain. */
  def zorder(df: DataFrame, xCol: String, yCol: String,
             bits: Int = DefaultBits, tileBits: Int = 8): DataFrame =
    df.withColumn("zval", morton2(col(xCol), col(yCol), bits))
      .withColumn("tile", shiftright(col("zval"), tileBits))

  /** Zone-mapped write: range-bucket `df` on `keyCol` (one output file
    * per bucket) and persist a per-file min/max stats table alongside —
    * the file-skipping index every lakehouse format (Delta/Iceberg/
    * Hudi) maintains, built from plain parquet. The stats scan rides
    * the files just written; the zone map itself is |files| rows. */
  def writeZoneMapped(df: DataFrame, dir: String, keyCol: String,
                      nBuckets: Int): Unit = {
    df.repartitionByRange(nBuckets, col(keyCol))
      .write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(keyCol).as("key_min"), max(keyCol).as("key_max"),
        count(lit(1)).as("rows"))
      .coalesce(1) // |files| rows — single output file is correct
      .write.mode("overwrite").parquet(dir + "__zonemap")
  }

  /** Files whose [key_min, key_max] envelope intersects [lo, hi] — the
    * planning decision a zone-map pruner makes. Driver-side by design:
    * this is query PLANNING metadata (|files| rows), the same listing
    * work Spark's own FileIndex does on the driver. */
  def overlappingFiles(spark: org.apache.spark.sql.SparkSession,
                       dir: String, lo: Long, hi: Long): Seq[String] =
    spark.read.parquet(dir + "__zonemap")
      .filter(col("key_min") <= hi && col("key_max") >= lo)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Pruned range read: open ONLY the files the zone map admits, then
    * apply the exact predicate (files overlap the range; rows inside
    * may not). Equivalent to a full-scan filter, reading a fraction of
    * the files — at 100 TB the difference between touching 3 files and
    * 30 000. */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, dir: String,
                 keyCol: String, lo: Long, hi: Long): DataFrame = {
    val files = overlappingFiles(spark, dir, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(keyCol).between(lo, hi))
  }

  /** Per-tile skipping-effectiveness report: row count and the min/max
    * envelope WIDTH of each dimension inside every tile — the numbers a
    * zone-map pruner would consult. Small spans on BOTH columns are the
    * point of z-ordering (a single-column sort gives small spans on one
    * column and full-range spans on the other). */
  def tileStats(df: DataFrame, xCol: String, yCol: String,
                bits: Int = DefaultBits, tileBits: Int = 8): DataFrame =
    zorder(df, xCol, yCol, bits, tileBits)
      .groupBy("tile")
      .agg(count(lit(1)).as("n"),
        (max(xCol) - min(xCol)).as("x_span"),
        (max(yCol) - min(yCol)).as("y_span"))
}
