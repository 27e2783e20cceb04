package graft.queries

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.{QueryService, Search}
import graft.sources.{Catalog, Lake}

/** Lake IO + catalog + query-service lifecycle, exercised end-to-end and
  * oracle-checked against the parquet originals (SURVEY.md §2.1/§2.2/§3).
  *
  * Roundtrip queries write to a JVM temp dir inside the query body — the
  * driver only sees the final DataFrame, and the oracle runs directly on
  * the source parquet, so a roundtrip mismatch (schema drift, format
  * loss) fails the differential check. That IS the test.
  */
object LakeQueries {

  /** Deterministic metadata table derived from `documents` — the
    * catalog fixture used by the metadata/content query-service checks.
    * Mirrored verbatim in the oracle SQL (keep in sync!). */
  private def metaFromDocs(s: org.apache.spark.sql.SparkSession,
                           dir: String) =
    Tables.load(s, dir, "documents").select(
      lpad(col("doc_id").cast("string"), 6, "0").as("id"),
      timestamp_micros((lit(1704067200L) + (col("doc_id") % 90) * 60)
        * 1000000L).as("meta_ts"),
      col("lang").as("data_type"),
      col("source"),
      lit("system").as("owner"),
      concat(lit("lake://raw/docs/"), col("doc_id")).as("s3Location"),
      col("n_chars").as("size_bytes"),
      lit("ingested").as("status"))

  private val metaSql =
    """SELECT lpad(CAST(doc_id AS VARCHAR), 6, '0') AS id,
       make_timestamp((1704067200 + (doc_id % 90) * 60) * 1000000) AS meta_ts,
       lang AS data_type, source, 'system' AS owner,
       'lake://raw/docs/' || doc_id AS s3Location,
       n_chars AS size_bytes, 'ingested' AS status
       FROM documents"""

  val entries: Seq[QueryDef] = Seq(

    // ---- S2/K2: CSV write → sniffed read → aggregate --------------------
    QueryDef("q31_csv_roundtrip",
      (s, dir) => {
        val root = Files.createTempDirectory("graft_csv").toString
        val nation = Tables.load(s, dir, "nation")
        Lake.writeZone(nation, root, Lake.Processed, "nation", "csv")
        Lake.read(s, Lake.zonePath(root, Lake.Processed, "nation"), "csv")
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n"), min("n_name").as("first_nation"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey, count(*) AS n, min(n_name) AS first_nation
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- S3/K3: JSON write → schema'd read → aggregate -------------------
    QueryDef("q32_json_roundtrip",
      (s, dir) => {
        val root = Files.createTempDirectory("graft_json").toString
        val orders = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") < 1000)
        Lake.writeZone(orders, root, Lake.Raw, "orders", "json")
        s.read.schema(orders.schema)
          .json(Lake.zonePath(root, Lake.Raw, "orders"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 0).as("total"),
            max("o_orderdate").as("last_date"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
        round(sum(o_totalprice),0) AS total, max(o_orderdate) AS last_date
        FROM orders WHERE o_orderkey < 1000
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- S1: extension sniffing over a mixed-format raw zone ---------------
    QueryDef("q33_format_sniff",
      (s, dir) => {
        val root = Files.createTempDirectory("graft_sniff").toString
        // coalesce(1): the sniffer below reads a single part file, so the
        // whole table must land in one file per format.
        val nation = Tables.load(s, dir, "nation").coalesce(1)
        Seq("csv", "json", "parquet").foreach { fmt =>
          Lake.writeZone(nation, root, Lake.Raw, s"nation_$fmt", fmt)
        }
        val perFormat = Seq("csv", "json", "parquet").map { fmt =>
          val dirPath = java.nio.file.Paths
            .get(Lake.zonePath(root, Lake.Raw, s"nation_$fmt"))
          val dataFile = Files.list(dirPath).iterator().asScala
            .filter(p => Lake.detectFileType(p.toString).isDefined)
            .toSeq.sortBy(_.toString).head
          // json part files need the schema: NDJSON single part, no header
          val df = Lake.readAuto(s, dataFile.toString).get
          df.select(lit(fmt).as("fmt")).groupBy("fmt")
            .agg(count(lit(1)).as("n"))
        }
        perFormat.reduce(_ unionByName _).orderBy("fmt")
      },
      Some("""SELECT 'csv' AS fmt, count(*) AS n FROM nation
        UNION ALL SELECT 'json', count(*) FROM nation
        UNION ALL SELECT 'parquet', count(*) FROM nation
        ORDER BY fmt""")),

    // ---- S7/W1/P5-P8: conjunctive metadata search, recent-first, limit ------
    QueryDef("q34_metadata_search",
      (s, dir) => {
        val meta = metaFromDocs(s, dir)
          .withColumnRenamed("meta_ts", "timestamp")
        val f = Catalog.MetaFilter(
          dataType = Some("en"),
          source = Some("src3"),
          dateFrom = Some(java.sql.Timestamp.valueOf("2024-01-01 00:10:00")),
          dateTo = Some(java.sql.Timestamp.valueOf("2024-01-01 01:20:00")),
          limit = 20)
        Catalog.search(meta, f)
          .select(col("id"), col("data_type"), col("source"),
            col("size_bytes"), col("timestamp").as("meta_ts"))
      },
      Some(s"""WITH meta AS ($metaSql)
        SELECT id, data_type, source, size_bytes, meta_ts FROM meta
        WHERE data_type = 'en' AND source = 'src3'
          AND meta_ts BETWEEN TIMESTAMP '2024-01-01 00:10:00'
                          AND TIMESTAMP '2024-01-01 01:20:00'
        ORDER BY meta_ts DESC, id ASC LIMIT 20""")),

    // ---- J1/S6: point lookup + metadata⋈content join ------------------------
    QueryDef("q35_content_join",
      (s, dir) => {
        val meta = metaFromDocs(s, dir)
        val content = Tables.load(s, dir, "documents")
          .select(lpad(col("doc_id").cast("string"), 6, "0").as("id"),
            col("text"))
        QueryService.run(s, meta, content, QueryService.ContentById("000042"))
          .select(col("id"), col("data_type"), col("size_bytes"),
            length(col("text")).cast("long").as("text_len"))
          .orderBy("id")
      },
      Some(s"""WITH meta AS ($metaSql)
        SELECT id, data_type, size_bytes,
          CAST(length(text) AS BIGINT) AS text_len
        FROM meta JOIN (SELECT lpad(CAST(doc_id AS VARCHAR), 6, '0') AS id,
          text FROM documents) c USING (id)
        WHERE id = '000042' ORDER BY id""")),

    // ---- K5/T4: bulk index build with positional _id --------------------------
    QueryDef("q36_bulk_index",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Search.bulkIndex(docs, "doc_id")
          .select(col("_id"), col("doc_id"),
            Search.normalizeIndexName(
              concat_ws("-", col("source"), col("lang"), lit("DEV")))
              .as("idx"))
          .orderBy("_id")
      },
      Some("""SELECT row_number() OVER (ORDER BY doc_id) AS _id, doc_id,
        lower(replace(source || '-' || lang || '-DEV', '-', '_')) AS idx
        FROM documents ORDER BY _id""")),

    // ---- K8/J4: semi-join-driven catalog update --------------------------------
    QueryDef("q37_catalog_update",
      (s, dir) => {
        val meta = metaFromDocs(s, dir)
          .withColumn("indexed", lit(false))
          .withColumn("indexedAt", lit(null).cast("timestamp"))
          .withColumnRenamed("meta_ts", "timestamp")
        val toMark = Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
          .select(lpad(col("doc_id").cast("string"), 6, "0").as("id"))
        Catalog.markIndexed(meta, toMark, "id",
            java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
          .groupBy("indexed")
          .agg(count(lit(1)).as("n"), min("indexedAt").as("min_indexed_at"))
          .orderBy("indexed")
      },
      Some("""SELECT (doc_id % 5 = 0) AS indexed, count(*) AS n,
        min(CASE WHEN doc_id % 5 = 0 THEN TIMESTAMP '2024-06-01 00:00:00'
            END) AS min_indexed_at
        FROM documents GROUP BY 1 ORDER BY indexed""")))
}
