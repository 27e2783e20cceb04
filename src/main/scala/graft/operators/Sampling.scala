package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for reproducible corpus
  * construction (SURVEY.md §2.11 pipeline scope).
  *
  * Unlike `rand()`/`df.sample`, the keep/drop decision here is a pure
  * function of (id, salt): task retries, full re-runs, and other
  * engines make the SAME per-row decision — the property a 100 TB
  * corpus build needs to be resumable and auditable (and what makes
  * these queries DuckDB-oracle-checkable at all). The hash is the
  * first 8 hex chars of md5("id|salt"), uniform in [0, 2^32); md5 is
  * slower than xxhash64 but exists with identical output in every
  * engine, which is the point — sampling decisions outlive any one
  * execution engine.
  *
  * Scale: the filter is map-only and codegen'd (md5/conv are native
  * expressions); `balanceStrata` adds one tiny counts aggregate that
  * broadcasts — no shuffle of the data itself.
  */
object Sampling {

  /** Portable per-row hash in [0, 2^32): numeric value of the first 8
    * hex chars of md5("&lt;id&gt;|&lt;salt&gt;"). Oracle mirror:
    * `CAST(('0x' || substr(md5(id || '|salt'), 1, 8)) AS UBIGINT)`.
    * Computed by the NATIVE one-pass expression (functions.Md5Prefix32,
    * codegen'd, thread-local digest) — identical values to the
    * md5→substring→conv chain without its three per-row string
    * allocations; GraftProperties asserts the equivalence. */
  def portableHash(id: Column, salt: String): Column =
    graft.functions.Native.md5Prefix32(
      concat(id.cast("string"), lit("|" + salt)))

  /** Keep ~`frac` of rows, decided per row by the portable hash. */
  def deterministicSample(df: DataFrame, idCol: String, frac: Double,
                          salt: String): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    df.filter(portableHash(col(idCol), salt) <
      lit((frac * 4294967296.0).toLong))
  }

  /** Deterministic k-per-stratum sample — the reproducible "inspect a
    * few docs from every domain" query. Rank within each stratum by
    * (portable hash, id) and keep the first k; the same (salt, k)
    * always returns the same rows. One partitioned window — no global
    * sort, no collect. */
  def sampleKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                        k: Int, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(portableHash(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic global shuffle for training-data export: every row
    * gets a portable pseudorandom `shuffle_key` (pure function of (id,
    * salt)) and a `bucket` = key mod `buckets` for output-file
    * assignment. Ordering by (shuffle_key, id) is the reproducible
    * permutation a 100 TB corpus export needs — task retries, re-runs,
    * and other engines produce the identical order, unlike
    * `orderBy(rand())`.
    *
    * Scale: the key is map-only; a downstream `orderBy` executes as a
    * range-partitioned sort (sampled boundaries — no single-partition
    * funnel), and hash-mod buckets are uniform by construction, so
    * `write.partitionBy("bucket")` yields evenly sized shards. */
  def deterministicShuffle(df: DataFrame, idCol: String, salt: String,
                           buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.withColumn("shuffle_key", portableHash(col(idCol), salt))
      .withColumn("bucket", col("shuffle_key") % buckets)
  }

  /** Balanced domain mixture: deterministically downsample every
    * stratum (e.g. source/domain) to approximately the smallest
    * stratum's size — the "uniform mixture" corpus build. Keep-rate per
    * stratum = min_n / n, applied via the portable hash so the result
    * is exactly reproducible. Costs one extra scan for the stratum
    * counts; both count frames broadcast (|strata| rows). */
  def balanceStrata(df: DataFrame, stratumCol: String, idCol: String,
                    salt: String): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
    val minN = counts.agg(min(col("_n")).as("_min_n"))
    df.join(broadcast(counts), Seq(stratumCol))
      .crossJoin(broadcast(minN))
      .filter(portableHash(col(idCol), salt).cast("double") /
        lit(4294967296.0) <
        col("_min_n").cast("double") / col("_n").cast("double"))
      .drop("_n", "_min_n")
  }
}
