package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Catalog
import graft.sources.Catalog.MetaFilter

/** The reference's four query-dispatch kinds (query-data-lambda.py:51-70)
  * as library functions over (metadata, content) DataFrames.
  *
  *  - ById       → point metadata lookup (query-data-lambda.py:101-117)
  *  - ByMetadata → conjunctive filtered scan, recent-first, limit
  *                 (query-data-lambda.py:119-158)
  *  - ContentById→ metadata ⋈ content by id (query-data-lambda.py:160-193);
  *                 the reference's get_item + S3 get_object pair becomes a
  *                 broadcast hash join — the point-filtered metadata side
  *                 is tiny by construction
  *  - Sql        → full ANSI surface, delegated to Catalyst exactly as the
  *                 reference delegates to Athena (query-data-lambda.py:195-218)
  */
object QueryService {

  sealed trait LakeQuery
  final case class ById(id: String) extends LakeQuery
  final case class ByMetadata(filter: MetaFilter) extends LakeQuery
  final case class ContentById(id: String) extends LakeQuery
  final case class Sql(query: String) extends LakeQuery

  /** `content` must carry an `id` column; remaining columns are the
    * document payload. */
  def run(spark: SparkSession, meta: DataFrame, content: DataFrame,
          q: LakeQuery): DataFrame = q match {
    case ById(id)        => Catalog.pointLookup(meta, id)
    case ByMetadata(f)   => Catalog.search(meta, f)
    case ContentById(id) =>
      // J1: point lookup join. Broadcast the single-row metadata side.
      broadcast(Catalog.pointLookup(meta, id)).join(content, Seq("id"))
    case Sql(sql)        => spark.sql(sql)
  }

  /** J2: the reference's filtered scan + per-row content fetch loop
    * (index-data-lambda.py:252-315) — one join instead of N+1 GETs. */
  def contentForType(meta: DataFrame, content: DataFrame,
                     dataType: String): DataFrame =
    meta.filter(col("dataType") === dataType).join(content, Seq("id"))

  /** J3: left-outer enrich with metadata-miss fallback stub
    * (index-data-lambda.py:138-155): content rows keep flowing when the
    * catalog has no record; the stub synthesizes the location column.
    * `locationFor` is a Column transform (e.g.
    * `id => concat(lit("lake://raw/"), id)`) so the fallback stays a
    * codegen'd expression — no UDF in the projection. */
  def enrichWithMetadata(content: DataFrame, meta: DataFrame,
                         locationFor: Column => Column): DataFrame =
    content.join(meta, Seq("id"), "left_outer")
      .withColumn("s3Location",
        coalesce(col("s3Location"), locationFor(col("id"))))
}
