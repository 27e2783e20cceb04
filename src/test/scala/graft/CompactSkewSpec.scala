package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Compact

class CompactSkewSpec extends SparkSpec {

  import spark.implicits._

  test("compactPath merges small files, preserves data") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // 20 tiny files
    spark.range(0, 2000).toDF("id").repartition(20)
      .write.parquet(dir)
    val before = Compact.dataFileCount(dir)
    assert(before >= 20)
    val (b, a) = Compact.compactPath(spark, dir, targetBytes = 512L * 1024)
    assert(b == before && a < before)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    assert(back.agg(sum("id")).head().getLong(0) == 1999L * 2000 / 2)
    // crash-safe swap leaves no staging/backup residue
    assert(!Files.exists(java.nio.file.Paths.get(dir + "__compacting")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + "__backup")))
  }

  test("compactPath recovers when a stale backup from a prior crash " +
    "is present") {
    val dir = Files.createTempDirectory("graft_compact2").toString + "/t"
    spark.range(0, 500).toDF("id").repartition(8).write.parquet(dir)
    // simulate a crash that left a backup dir behind
    val stale = java.nio.file.Paths.get(dir + "__backup")
    Files.createDirectories(stale)
    Files.write(stale.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    val (_, after) = Compact.compactPath(spark, dir, 512L * 1024)
    assert(after >= 1)
    assert(spark.read.parquet(dir).count() == 500)
    assert(!Files.exists(stale))
  }

  test("compactPath self-heals when a crash between the two swap moves " +
    "left only the backup dir (no live dir)") {
    val dir = Files.createTempDirectory("graft_compact3").toString + "/t"
    spark.range(0, 300).toDF("id").repartition(4).write.parquet(dir)
    val live = java.nio.file.Paths.get(dir)
    val bak = java.nio.file.Paths.get(dir + "__backup")
    val staging = java.nio.file.Paths.get(dir + "__compacting")
    // simulate the exact crash window: live moved aside, staging not
    // yet promoted (and left behind, complete-but-untrusted)
    Files.createDirectories(staging)
    Files.write(staging.resolve("junk.parquet"), Array[Byte](9))
    Files.move(live, bak)
    val (_, after) = Compact.compactPath(spark, dir, 512L * 1024)
    assert(after >= 1)
    assert(spark.read.parquet(dir).count() == 300)
    assert(!Files.exists(bak) && !Files.exists(staging))
  }

  test("compactPartitions compacts each hive partition independently") {
    val root = Files.createTempDirectory("graft_compactp").toString + "/t"
    spark.range(0, 1000).toDF("id")
      .withColumn("part", col("id") % 2)
      .repartition(10)
      .write.partitionBy("part").parquet(root)
    val results = Compact.compactPartitions(spark, root, 512L * 1024)
    assert(results.size == 2)
    assert(results.forall { case (_, b, a) => a <= b })
    val back = spark.read.parquet(root)
    assert(back.count() == 1000)
    assert(back.select(countDistinct("part")).head().getLong(0) == 2)
  }

  test("saltedAgg equals the direct aggregation") {
    val df = spark.range(0, 10000).toDF("id")
      // heavy skew: 80% of rows share one key
      .withColumn("k", when(col("id") % 5 < 4, "hot").otherwise(
        concat(lit("cold"), col("id") % 7)))
      .withColumn("v", col("id").cast("double"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(df, Seq("k"), col("id"), 16,
        partialAggs = Seq(count(lit(1)).as("pc"), sum("v").as("pv")),
        finalAggs = Seq(sum("pc").cast("long").as("n"),
          sum("pv").as("total")))
      .orderBy("k").collect()
    assert(direct.map(_.getString(0)).toSeq ==
      salted.map(_.getString(0)).toSeq)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getLong(1) == s.getLong(1))
      assert(math.abs(d.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }

  test("saltedJoin equals the direct join") {
    val big = spark.range(0, 5000).toDF("id")
      .withColumn("k", when(col("id") % 10 < 9, 0L).otherwise(col("id") % 3))
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b")).toDF("k", "label")
    val direct = big.join(dim, Seq("k")).groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label").collect()
    val salted = Skew.saltedJoin(big, dim, "k", col("id"), 8)
      .groupBy("label").agg(count(lit(1)).as("n")).orderBy("label").collect()
    assert(direct.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      salted.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
