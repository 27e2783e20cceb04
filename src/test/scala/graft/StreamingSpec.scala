package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{CdcStream, IngestStream}

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  test("R1-R4 ingest smoke: raw json drop → processed + index fan-out") {
    val root = Files.createTempDirectory("graft_stream").toString
    val raw = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(raw))
    Files.writeString(java.nio.file.Paths.get(s"$raw/a.json"),
      "{\"id\":1,\"v\":\"x\"}\n{\"id\":2,\"v\":\"y\"}\n")
    Files.writeString(java.nio.file.Paths.get(s"$raw/b.json"),
      "{\"id\":3,\"v\":\"z\"}\n")

    val q = IngestStream.startPipeline(spark, raw, schema, "json",
      s"$root/processed", s"$root/index", s"$root/ckpt")
    q.awaitTermination()

    val processed = spark.read.schema(
      schema.add("processed_timestamp", TimestampType)).json(s"$root/processed")
    assert(processed.count() == 3)
    assert(processed.columns.contains("processed_timestamp"))
    val index = spark.read.parquet(s"$root/index")
    assert(index.count() == 3)

    // restart on the same checkpoint with no new files → no duplicates
    val q2 = IngestStream.startPipeline(spark, raw, schema, "json",
      s"$root/processed", s"$root/index", s"$root/ckpt")
    q2.awaitTermination()
    assert(spark.read.parquet(s"$root/index").count() == 3)

    // drop one more file → incremental pickup only
    Files.writeString(java.nio.file.Paths.get(s"$raw/c.json"),
      "{\"id\":4,\"v\":\"w\"}\n")
    val q3 = IngestStream.startPipeline(spark, raw, schema, "json",
      s"$root/processed", s"$root/index", s"$root/ckpt")
    q3.awaitTermination()
    assert(spark.read.parquet(s"$root/index").count() == 4)
  }

  test("R2 idempotent replay: index-sink failure after processed-sink " +
    "commit → checkpoint restart rewrites the batch without duplicates") {
    val root = Files.createTempDirectory("graft_replay").toString
    val raw = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(raw))
    Files.writeString(java.nio.file.Paths.get(s"$raw/a.json"),
      "{\"id\":1,\"v\":\"x\"}\n{\"id\":2,\"v\":\"y\"}\n")
    Files.writeString(java.nio.file.Paths.get(s"$raw/b.json"),
      "{\"id\":3,\"v\":\"z\"}\n")
    // Fault injection: occupy the index path with a plain FILE so sink 2
    // cannot mkdir its batch partition — failing the batch AFTER sink 1
    // (processed zone) has already committed its files.
    Files.writeString(java.nio.file.Paths.get(s"$root/index"), "fault")

    val q = IngestStream.startPipeline(spark, raw, schema, "json",
      s"$root/processed", s"$root/index", s"$root/ckpt")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    val pSchema = schema.add("processed_timestamp", TimestampType)
    // sink 1 landed the batch before sink 2 failed — the at-least-once
    // half of the contract: data exists despite the failed batch
    assert(spark.read.schema(pSchema).json(s"$root/processed").count() == 3)

    // clear the fault and restart on the SAME checkpoint: the uncommitted
    // batch replays with the same batch_id, overwriting sink 1's
    // partition in place (idempotent) and landing sink 2's
    Files.delete(java.nio.file.Paths.get(s"$root/index"))
    val q2 = IngestStream.startPipeline(spark, raw, schema, "json",
      s"$root/processed", s"$root/index", s"$root/ckpt")
    q2.awaitTermination()

    val processed = spark.read.schema(pSchema).json(s"$root/processed")
    assert(processed.count() == 3) // replay overwrote, did not duplicate
    assert(processed.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(spark.read.parquet(s"$root/index").count() == 3)
  }

  test("S9/R5 CDC: metadata appends re-derive the index, LWW by version") {
    val root = Files.createTempDirectory("graft_cdc").toString
    val metaDir = s"$root/meta"
    val metaSchema = StructType(Seq(
      StructField("id", StringType),
      StructField("version", LongType),
      StructField("status", StringType)))

    // initial image
    Seq(("a", 1L, "ingested"), ("b", 1L, "ingested"))
      .toDF("id", "version", "status")
      .write.mode("append").parquet(metaDir)
    val q1 = CdcStream.startReindex(spark, metaDir, metaSchema,
      s"$root/index", s"$root/ckpt", "id", "version")
    q1.awaitTermination()
    val v1 = CdcStream.currentIndex(spark, s"$root/index", "id", "version")
    assert(v1.count() == 2)

    // change event: a → indexed (higher version), plus new record c
    Seq(("a", 2L, "indexed"), ("c", 1L, "ingested"))
      .toDF("id", "version", "status")
      .write.mode("append").parquet(metaDir)
    val q2 = CdcStream.startReindex(spark, metaDir, metaSchema,
      s"$root/index", s"$root/ckpt", "id", "version")
    q2.awaitTermination()

    val idx = CdcStream.currentIndex(spark, s"$root/index", "id", "version")
    assert(idx.count() == 3)
    val a = idx.filter(col("id") === "a").head()
    assert(a.getAs[String]("status") == "indexed")
    assert(a.getAs[Long]("version") == 2L)
  }

  test("S9/R5 CDC over the full metadata schema: tags/description " +
    "survive re-index and the index mutation is applied") {
    import graft.operators.Search
    import graft.sources.Catalog
    import org.apache.spark.sql.DataFrame
    val root = Files.createTempDirectory("graft_cdc_full").toString
    val metaDir = s"$root/meta"
    def rec(id: String, ts: String, tags: Seq[String], desc: Option[String],
            status: String) =
      Catalog.IngestRecord(id, java.sql.Timestamp.valueOf(ts), "sales",
        "api", "system", s"raw/sales/$id.json", 100L, status, tags, desc,
        indexed = false, indexedAt = None)
    // reference index-data-lambda.py:164-172: the re-index marks the
    // metadata row indexed/indexedAt and routes to data-{dataType}
    val derive: DataFrame => DataFrame = df => df
      .withColumn("indexed", lit(true))
      .withColumn("indexedAt",
        lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .withColumn("search_index", Search.indexNameFor(col("dataType")))

    Seq(rec("a", "2024-01-01 00:00:00", Seq("prod", "eu"), Some("first"),
          "ingested"),
        rec("b", "2024-01-01 00:00:00", Seq("test"), None, "ingested"))
      .toDF().write.mode("append").parquet(metaDir)
    CdcStream.startReindex(spark, metaDir, Catalog.schema, s"$root/index",
      s"$root/ckpt", "id", "timestamp", derive).awaitTermination()

    // modify event: full new image of a — more tags, new description
    Seq(rec("a", "2024-01-02 00:00:00", Seq("prod", "eu", "hot"),
        Some("updated"), "indexed"))
      .toDF().write.mode("append").parquet(metaDir)
    CdcStream.startReindex(spark, metaDir, Catalog.schema, s"$root/index",
      s"$root/ckpt", "id", "timestamp", derive).awaitTermination()

    val idx = CdcStream.currentIndex(spark, s"$root/index", "id", "timestamp")
    assert(idx.count() == 2)
    val a = idx.filter(col("id") === "a").head()
    assert(a.getAs[scala.collection.Seq[String]]("tags").toList ==
      List("prod", "eu", "hot"))
    assert(a.getAs[String]("description") == "updated")
    assert(a.getAs[Boolean]("indexed"))
    assert(a.getAs[java.sql.Timestamp]("indexedAt") != null)
    assert(a.getAs[String]("search_index") == "data-sales")
    val b = idx.filter(col("id") === "b").head()
    assert(b.getAs[scala.collection.Seq[String]]("tags").toList ==
      List("test"))
    assert(b.getAs[String]("description") == null)
  }

  test("R4: dedupStream drops same-id re-arrivals within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = IngestStream.dedupStream(
      mem.toDF().toDF("id", "ts"), "ts", "id", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(("k1", t("2024-01-01 00:00:00")),
      ("k1", t("2024-01-01 00:00:01")), // same id, different ts → dropped
      ("k2", t("2024-01-01 00:00:02")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select("id").as[String]
      .collect().sorted.toSeq
    assert(got == Seq("k1", "k2"))
  }

  test("stream-static enrichment: every micro-batch joins the broadcast " +
    "dimension; unmatched keys pass through null-padded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("k1", "alpha"), ("k2", "beta")).toDF("id", "segment")
    val mem = MemoryStream[String]
    val enriched = IngestStream.enrichWithDimension(
      mem.toDF().toDF("id"), dim, "id")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    mem.addData("k1", "k3")
    q.processAllAvailable()
    mem.addData("k2")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out")
      .select("id", "segment").as[(String, Option[String])]
      .collect().toSet
    assert(got == Set(("k1", Some("alpha")), ("k3", None),
      ("k2", Some("beta"))))
  }
}
