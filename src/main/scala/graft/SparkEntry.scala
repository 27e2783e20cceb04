package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{RelationalQueries, LakeQueries, SearchQueries, PipelineQueries, TokenizerQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All registered queries live as `QueryDef`s in `graft.queries.*`; this
  * object just folds them into the two driver-facing maps. Adding an
  * operator = adding one `QueryDef` (Spark fn + optional DuckDB oracle
  * SQL) to the appropriate `entries` Seq.
  */
object SparkEntry {

  /** Every registered operator query, name-keyed. Names must be unique
    * across all entry files — enforced eagerly so a collision fails the
    * build's first use, not the driver's compare. */
  val defs: Map[String, QueryDef] = {
    val all = RelationalQueries.entries ++ LakeQueries.entries ++
      SearchQueries.entries ++ PipelineQueries.entries ++
      TokenizerQueries.entries
    val dup = all.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    all.map(d => d.name -> d).toMap
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q01 is the TPC-H-Q1-shaped pricing summary (SURVEY.md §7). */
  def entry(spark: SparkSession): DataFrame =
    defs("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, d) => n -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (n, d) if d.oracle.isDefined => n -> d.oracle.get }
}
