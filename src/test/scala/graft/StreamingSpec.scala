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
}
