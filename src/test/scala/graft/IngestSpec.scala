package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Ingest
import graft.sources.Lake

class IngestSpec extends SparkSpec {

  import spark.implicits._

  test("prepare defaults fields absent from the batch SCHEMA entirely " +
    "(per-record defaulting, reference ingest-data-lambda.py:54-56)") {
    val at = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    // a JSON batch where NO record carried dataType/source/owner —
    // the columns don't exist at all, not just hold nulls
    val bare = Seq(("id-1", "{\"v\":1}")).toDF("id", "data")
    val out = Ingest.prepare(bare, at).collect()(0)
    assert(out.getAs[String]("dataType") == "unknown")
    assert(out.getAs[String]("source") == "api")
    assert(out.getAs[String]("owner") == "system")
    assert(out.getAs[Long]("sizeBytes") > 0)
    // even `data` may be absent (empty body) — size falls back to the
    // empty-struct JSON, not an AnalysisException
    val empty = Seq(Tuple1("id-2")).toDF("id")
    val out2 = Ingest.prepare(empty, at).collect()(0)
    assert(out2.getAs[String]("dataType") == "unknown")
    assert(out2.getAs[Long]("sizeBytes") > 0)
  }

  test("§3.1 ingest flow: raw zone partitioned put + catalog append") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val metaPath = s"$root/meta"
    val at = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val body = Seq(
      ("id-1", "sales", "web", "{\"v\":1}"),
      ("id-2", null, null, "{\"v\":2}"))
      .toDF("id", "dataType", "source", "data")
      .withColumn("owner", lit(null).cast("string"))

    val meta = Ingest.run(spark, body, root, metaPath, at)

    // defaults applied (P4)
    val m = meta.orderBy("id").collect()
    assert(m(0).getAs[String]("dataType") == "sales")
    assert(m(1).getAs[String]("dataType") == "unknown")
    assert(m(1).getAs[String]("source") == "api")
    assert(m(1).getAs[String]("owner") == "system")
    assert(m.forall(_.getAs[Long]("sizeBytes") > 0)) // A3 size metric
    assert(m.forall(_.getAs[String]("s3Location")
      .contains("/raw/")), "s3Location points at the raw zone")

    // raw zone is hive-partitioned by dataType/ingest_date → pruning
    val rawPath = Lake.zonePath(root, Lake.Raw, "ingest")
    val raw = spark.read.json(rawPath)
    assert(raw.count() == 2)
    assert(raw.columns.contains("dataType")) // partition col round-trips
    val pruned = spark.read.json(rawPath)
      .filter(col("dataType") === "sales")
    assert(pruned.count() == 1)

    // catalog append is cumulative (K7)
    Ingest.run(spark,
      Seq(("id-3", "sales", "web", "{\"v\":3}"))
        .toDF("id", "dataType", "source", "data")
        .withColumn("owner", lit(null).cast("string")),
      root, metaPath, at)
    assert(spark.read.parquet(metaPath).count() == 3)
  }

  test("appendWithQuarantine: exact split by CHECK constraints, " +
    "violation names stamped (both broken → both, name-sorted), " +
    "clean batches leave an empty quarantine") {
    import graft.sources.Manifest
    val base = "file://" + java.nio.file.Files
      .createTempDirectory("graft-quar").toString
    val t = s"$base/t"; val q = s"$base/q"
    Manifest.init(spark, t, Seq((1L, "a", 10L)).toDF("id", "lab", "v"))
    Manifest.addConstraint(spark, t, "lab_set", "lab IS NOT NULL")
    Manifest.addConstraint(spark, t, "v_pos", "v >= 0")
    val batch = Seq(
      (2L, Option("b"), 20L),            // clean
      (3L, Option("c"), -3L),            // v_pos only
      (4L, Option.empty[String], 4L),    // lab_set only
      (5L, Option.empty[String], -5L))   // both
      .toDF("id", "lab", "v")
    val (_, _) = graft.operators.Ingest
      .appendWithQuarantine(spark, t, batch, q)
    assert(Manifest.read(spark, t).select("id").as[Long]
      .collect().toSet == Set(1L, 2L))
    val quar = Manifest.read(spark, q)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(quar == Map(3L -> "v_pos", 4L -> "lab_set",
      5L -> "lab_set,v_pos"))
    // a clean follow-up batch quarantines nothing
    graft.operators.Ingest.appendWithQuarantine(spark, t,
      Seq((6L, Option("d"), 6L)).toDF("id", "lab", "v"), q)
    assert(Manifest.read(spark, q).count() == 3L)
    // no constraints → refuse (use commitAppend directly)
    val bare = s"$base/bare"
    Manifest.init(spark, bare, Seq((1L, 1L)).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      graft.operators.Ingest.appendWithQuarantine(spark, bare,
        Seq((2L, 2L)).toDF("id", "v"), s"$base/bq")
    }
  }

  test("streamBatchWithQuarantine: exactly-once on both sides — " +
    "replayed epoch no-ops, crash between the two commits heals on " +
    "replay (table no-ops, quarantine lands)") {
    import graft.sources.Manifest
    val base = "file://" + java.nio.file.Files
      .createTempDirectory("graft-squar").toString
    val t = s"$base/t"; val q = s"$base/q"
    Manifest.init(spark, t, Seq((1L, 10L)).toDF("id", "v"))
    Manifest.addConstraint(spark, t, "v_pos", "v >= 0")
    val b0 = Seq((2L, 20L), (3L, -3L)).toDF("id", "v")
    val (v1, qv1) = graft.operators.Ingest
      .streamBatchWithQuarantine(spark, t, b0, q, "ing", 0L)
    assert(Manifest.read(spark, t).select("id").as[Long]
      .collect().toSet == Set(1L, 2L))
    assert(Manifest.read(spark, q).select("id", "violations")
      .as[(Long, String)].collect().toSeq == Seq(3L -> "v_pos"))
    // replay the SAME epoch: both commits no-op, versions unchanged
    val (v2, qv2) = graft.operators.Ingest
      .streamBatchWithQuarantine(spark, t, b0, q, "ing", 0L)
    assert(v2 == v1 && qv2 == qv1)
    assert(Manifest.read(spark, t).count() == 2L)
    assert(Manifest.read(spark, q).count() == 1L)
    // crash between the two commits: simulate by committing epoch 1's
    // good side directly (the table mark advances, quarantine's does
    // not), then replaying the full epoch — table no-ops, quarantine
    // catches up, nothing duplicates
    val b1 = Seq((4L, 40L), (5L, -5L)).toDF("id", "v")
    val tv = Manifest.commitStreamBatch(spark, t,
      b1.filter($"v" >= 0), "ing", 1L)
    val (v3, qv3) = graft.operators.Ingest
      .streamBatchWithQuarantine(spark, t, b1, q, "ing", 1L)
    assert(v3 == tv, "table side must no-op on the healed replay")
    assert(qv3 > qv1, "quarantine side must land on the healed replay")
    assert(Manifest.read(spark, t).select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L))
    assert(Manifest.read(spark, q).select("id").as[Long]
      .collect().toSet == Set(3L, 5L))
    // an all-clean epoch still advances the quarantine mark: a later
    // replay of it must not re-quarantine
    graft.operators.Ingest.streamBatchWithQuarantine(spark, t,
      Seq((6L, 60L)).toDF("id", "v"), q, "ing", 2L)
    val qHead = Manifest.latestVersion(spark, q).get
    graft.operators.Ingest.streamBatchWithQuarantine(spark, t,
      Seq((6L, 60L)).toDF("id", "v"), q, "ing", 2L)
    assert(Manifest.latestVersion(spark, q).get == qHead)
    assert(Manifest.read(spark, q).count() == 2L)
  }
}
