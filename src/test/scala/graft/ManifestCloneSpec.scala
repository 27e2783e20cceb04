package graft

import org.apache.spark.sql.functions._

import graft.sources.Manifest

/** CLONE ([[graft.sources.Manifest.cloneTable]]): shallow = zero-copy
  * manifest references pinned on the source; deep = owned bytes.
  * Covers: snapshot equality, independence of subsequent writes in
  * both directions, the vacuum pin (source retention can NOT break a
  * shallow clone), deep-clone survival of source deletion, cloning a
  * non-head version, MoR deletes riding along, clone-of-clone, and
  * the SQL procedure. */
class ManifestCloneSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(tag: String) = "file://" + java.nio.file.Files
    .createTempDirectory(s"graft-$tag").toString + "/t"

  private def mkSrc(): String = {
    val root = newRoot("clone-src")
    val df = (1L to 300L).map(i => (i, s"p${i % 3}", i * 2))
      .toDF("id", "part", "v")
    Manifest.init(spark, root, df.filter($"id" <= 200), Seq("part"))
    Manifest.commitAppend(spark, root, df.filter($"id" > 200),
      Seq("part"))
    root
  }

  private def ids(root: String): Set[Long] =
    Manifest.read(spark, root).select("id").as[Long].collect().toSet

  test("shallow clone ≡ source snapshot, zero data files copied, " +
    "and writes to either side never touch the other") {
    val src = mkSrc()
    val dst = newRoot("clone-dst")
    // the clone's first version = the SOURCE version (seq preservation)
    assert(Manifest.cloneTable(spark, src, dst) == 2L)
    assert(ids(dst) == (1L to 300L).toSet)
    // zero-copy: nothing under the clone's data dir
    val (fs, _) = Manifest.fsOf(spark, dst)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/data")))
    // partition pruning works through foreign entries
    assert(Manifest.read(spark, dst).filter($"part" === "p1")
      .count() == 100)

    // divergence: append to the source — clone must not see it
    Manifest.commitAppend(spark, src,
      Seq((301L, "p1", 602L)).toDF("id", "part", "v"), Seq("part"))
    assert(ids(dst) == (1L to 300L).toSet)
    // append to the clone — source must not see it
    Manifest.commitAppend(spark, dst,
      Seq((9001L, "p2", 1L)).toDF("id", "part", "v"), Seq("part"))
    assert(ids(dst) == (1L to 300L).toSet + 9001L)
    assert(ids(src) == (1L to 301L).toSet)
    // connector read agrees
    assert(spark.read.format("graft-manifest").load(dst)
      .select("id").as[Long].collect().toSet ==
      (1L to 300L).toSet + 9001L)
  }

  test("source vacuum cannot break a shallow clone (the pin tag), and " +
    "releaseClone hands the snapshot back to normal retention") {
    val src = mkSrc()
    val dst = newRoot("clone-pin")
    Manifest.cloneTable(spark, src, dst)
    // rewrite the source wholesale, then vacuum to 1 version: without
    // the pin this would reclaim every cloned file
    Manifest.commitReplace(spark, src,
      Seq((1L, "p0", 0L)).toDF("id", "part", "v"), Seq("part"))
    Manifest.vacuum(spark, src, keepVersions = 1)
    assert(ids(dst) == (1L to 300L).toSet, "clone must survive source " +
      "vacuum — the cloned snapshot is tagged")
    assert(Manifest.tags(spark, src).keys.exists(_.startsWith("clone-")))

    // releasing the pin lets the NEXT vacuum reclaim the snapshot
    assert(Manifest.releaseClone(spark, dst))
    Manifest.vacuum(spark, src, keepVersions = 1)
    assert(Manifest.tags(spark, src).isEmpty)
    assert(ids(src) == Set(1L))
  }

  test("vacuum after releaseClone reclaims EXACTLY the previously-" +
    "pinned files; a deep clone of the same snapshot is unaffected " +
    "and the released shallow clone fails loudly, not partially") {
    val src = mkSrc() // v2 = ids 1..300
    val sh = newRoot("rel-sh"); val dp = newRoot("rel-dp")
    Manifest.cloneTable(spark, src, sh)
    Manifest.cloneTable(spark, src, dp, deep = true)
    val pinned = Manifest.snapshotMeta(spark, src, 2L).files
      .map(p => Manifest.absEntryPath(src, p)).toSet
    assert(pinned.nonEmpty)
    // supersede the snapshot; the pin holds every v2 file through
    // vacuum (re-asserted here at FILE level, not just read level)
    Manifest.commitReplace(spark, src,
      Seq((1L, "p0", 0L)).toDF("id", "part", "v"), Seq("part"))
    Manifest.vacuum(spark, src, keepVersions = 1)
    val (fs, _) = Manifest.fsOf(spark, src)
    def onDisk(paths: Set[String]): Set[String] =
      paths.filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    assert(onDisk(pinned) == pinned,
      "the pin must hold every snapshot file on disk")
    // release, then vacuum: exactly the previously-pinned files are
    // reclaimed — every non-live pinned file gone, every live file kept
    assert(Manifest.releaseClone(spark, sh))
    val live = Manifest.snapshotMeta(spark, src,
        Manifest.latestVersion(spark, src).get).files
      .map(p => Manifest.absEntryPath(src, p)).toSet
    Manifest.vacuum(spark, src, keepVersions = 1)
    assert(onDisk(pinned -- live).isEmpty,
      "released snapshot files must be reclaimed by the next vacuum")
    assert(onDisk(live) == live,
      "the live version's files must survive the reclaim")
    // the deep clone owns its bytes: the reclaim is invisible to it
    assert(ids(dp) == (1L to 300L).toSet)
    // the released shallow clone is torn by design — it must fail
    // LOUDLY on read (missing foreign files), never silently shrink
    intercept[Exception] { ids(sh) }
  }

  test("the clone's own vacuum never deletes the source's bytes") {
    val src = mkSrc()
    val dst = newRoot("clone-vac")
    Manifest.cloneTable(spark, src, dst)
    // clone rewrites itself (now owns local files), then vacuums: the
    // superseded version's FOREIGN entries must be skipped
    Manifest.commitReplace(spark, dst,
      Manifest.read(spark, dst).filter($"id" <= 10), Seq("part"))
    Manifest.vacuum(spark, dst, keepVersions = 1)
    assert(ids(src) == (1L to 300L).toSet,
      "source must be untouched by the clone's vacuum")
    assert(ids(dst) == (1L to 10L).toSet)
  }

  test("deep clone owns its bytes and survives source deletion; " +
    "cloning a non-head version restores history") {
    val src = mkSrc() // v1 = ids 1..200, v2 = ids 1..300
    val dst = newRoot("clone-deep")
    Manifest.cloneTable(spark, src, dst, version = Some(1L),
      deep = true)
    assert(ids(dst) == (1L to 200L).toSet)
    // no pin needed for deep clones
    assert(!Manifest.tags(spark, src).keys.exists(_.startsWith("clone-")))
    // obliterate the source entirely
    val (fs, p) = Manifest.fsOf(spark, src)
    fs.delete(p, true)
    assert(ids(dst) == (1L to 200L).toSet)
  }

  test("MoR deletes ride along; clone-of-clone deep-copies through " +
    "to the original bytes") {
    val src = mkSrc()
    Manifest.deleteByKeys(spark, src, Seq(5L, 6L, 250L).toDF("id"))
    val sh = newRoot("clone-mor")
    Manifest.cloneTable(spark, src, sh)
    assert(ids(sh) == (1L to 300L).toSet -- Set(5L, 6L, 250L))
    // a deep clone OF the shallow clone resolves foreign entries to
    // the original bytes and re-bases them locally
    val dp = newRoot("clone-deep2")
    Manifest.cloneTable(spark, sh, dp, deep = true)
    val (fs, p) = Manifest.fsOf(spark, src)
    fs.delete(p, true)
    assert(ids(dp) == (1L to 300L).toSet -- Set(5L, 6L, 250L))
  }

  test("a NEW delete on the clone applies to carried files from the " +
    "source's LATEST commit (the seq-preservation contract)") {
    val src = mkSrc() // v1: ids 1..200 (seq 1), v2: ids 201..300 (seq 2)
    val dst = newRoot("clone-seq")
    val v = Manifest.cloneTable(spark, src, dst)
    assert(v == 2L)
    // id 250 lives in a carried file whose seq (2) equals the clone's
    // starting version — a clone published at v1 would stamp this
    // delete seq 2 and silently skip that file
    Manifest.deleteByKeys(spark, dst, Seq(250L, 10L).toDF("id"))
    assert(ids(dst) == (1L to 300L).toSet -- Set(250L, 10L))
    assert(ids(src) == (1L to 300L).toSet)
  }

  test("SQL surface: CALL system.clone produces a queryable table") {
    spark.conf.set("spark.sql.catalog.clonecat",
      classOf[graft.sources.connector.ManifestCatalog].getName)
    spark.conf.set("spark.sql.catalog.clonecat.root",
      "file://" + java.nio.file.Files
        .createTempDirectory("graft-clonecat").toString)
    spark.sql("CREATE TABLE clonecat.db.src (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO clonecat.db.src " +
      "SELECT id, id * 3 FROM range(100)")
    val v = spark.sql("CALL clonecat.system.clone(" +
        "table => 'db.src', target => 'db.snap')")
      .as[Long].head
    assert(v == 2L) // CREATE (v1) + INSERT (v2) → clone starts at 2
    spark.sql("INSERT INTO clonecat.db.src SELECT 1000, 3000")
    assert(spark.sql("SELECT count(*) FROM clonecat.db.snap")
      .as[Long].head == 100L)
    assert(spark.sql("SELECT count(*) FROM clonecat.db.src")
      .as[Long].head == 101L)
    assert(spark.sql("SELECT sum(v) FROM clonecat.db.snap")
      .as[Long].head == (0L until 100L).map(_ * 3).sum)
    // SQL release of the pin tag (true once, then a no-op)
    assert(spark.sql("CALL clonecat.system.release_clone(" +
      "table => 'db.snap')").as[Boolean].head)
    assert(!spark.sql("CALL clonecat.system.release_clone(" +
      "table => 'db.snap')").as[Boolean].head)
  }
}
