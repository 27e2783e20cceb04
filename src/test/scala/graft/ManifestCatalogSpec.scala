package graft

import org.apache.spark.sql.functions._

import graft.sources.Manifest
import graft.sources.connector.ManifestCatalog

/** The SQL surface of manifest tables: a `TableCatalog` plugin so
  * `CREATE TABLE` / `INSERT INTO` / `INSERT OVERWRITE` /
  * `spark.table` / `VERSION AS OF` hit manifest snapshots, and the
  * catalog directory IS the catalog (no driver state). */
class ManifestCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = "file://" + java.nio.file.Files
    .createTempDirectory("graft-cat").toString

  spark.conf.set("spark.sql.catalog.graftcat",
    classOf[ManifestCatalog].getName)
  spark.conf.set("spark.sql.catalog.graftcat.root", warehouse)

  test("CREATE TABLE → INSERT INTO → SELECT → VERSION AS OF → " +
    "INSERT OVERWRITE round-trips through pure SQL") {
    spark.sql("CREATE TABLE graftcat.db.events " +
      "(id BIGINT, lang STRING, v BIGINT) PARTITIONED BY (lang)")
    // v1 = empty snapshot with the declared schema
    assert(spark.table("graftcat.db.events").count() == 0)
    assert(spark.table("graftcat.db.events").schema.fieldNames.toSeq ==
      Seq("id", "lang", "v"))

    spark.sql("INSERT INTO graftcat.db.events VALUES " +
      "(1, 'de', 10), (2, 'en', 20)")
    spark.sql("INSERT INTO graftcat.db.events VALUES (3, 'de', 30)")
    def all = spark.sql("SELECT id, lang, v FROM graftcat.db.events")
      .as[(Long, String, Long)].collect().toSet
    assert(all == Set((1L, "de", 10L), (2L, "en", 20L), (3L, "de", 30L)))

    // time travel: v2 = first insert only
    assert(spark.sql(
      "SELECT id FROM graftcat.db.events VERSION AS OF 2")
      .as[Long].collect().toSet == Set(1L, 2L))

    // the catalog and the Scala API see the SAME table
    val direct = Manifest.read(spark, s"$warehouse/db/events", None)
      .select("id").as[Long].collect().toSet
    assert(direct == Set(1L, 2L, 3L))

    // INSERT OVERWRITE = replace commit; old snapshots keep reading
    spark.sql("INSERT OVERWRITE graftcat.db.events VALUES (9, 'fr', 90)")
    assert(all == Set((9L, "fr", 90L)))
    assert(spark.sql(
      "SELECT id FROM graftcat.db.events VERSION AS OF 3")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("partition pruning survives the catalog read path") {
    spark.sql("CREATE TABLE graftcat.db.pruned " +
      "(id BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.pruned VALUES " +
      "(1, 'a'), (2, 'b'), (3, 'c')")
    val df = spark.table("graftcat.db.pruned").filter($"part" === "b")
    assert(df.select("id").as[Long].collect().toSeq == Seq(2L))
    // the scan planned only partition b's file
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.scan
      }.get.asInstanceOf[graft.sources.connector.ManifestScan]
    assert(scan.plannedFiles.length == 1, scan.description())
    assert(scan.plannedFiles.head.absPath.contains("part=b/"))
  }

  test("CTAS, typed partition columns, DROP TABLE, existence") {
    spark.sql("CREATE TABLE graftcat.db.byday PARTITIONED BY (day) AS " +
      "SELECT id, id % 3 AS day FROM range(9)")
    val t = spark.table("graftcat.db.byday")
    // partition column keeps its declared LONG type through the
    // connector (not a path string)
    assert(t.schema("day").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t.filter($"day" === 1L).count() == 3)
    spark.sql("DROP TABLE graftcat.db.byday")
    val e = intercept[Exception](spark.table("graftcat.db.byday").count())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("namespaces: CREATE/SHOW/DROP map to warehouse directories; " +
    "table dirs never masquerade as namespaces") {
    spark.sql("CREATE NAMESPACE graftcat.ns1")
    def namespaces = spark.sql("SHOW NAMESPACES IN graftcat")
      .select("namespace").as[String].collect().toSet
    assert(namespaces.contains("ns1"), namespaces)
    spark.sql("CREATE TABLE graftcat.ns1.t1 (id BIGINT)")
    assert(spark.sql("SHOW TABLES IN graftcat.ns1")
      .select("tableName").as[String].collect().toSet == Set("t1"))
    // a table dir is not a namespace
    assert(!spark.sql("SHOW NAMESPACES IN graftcat.ns1")
      .select("namespace").as[String].collect().contains("t1"))
    // non-empty namespace refuses a plain drop; CASCADE removes it
    intercept[Exception](spark.sql("DROP NAMESPACE graftcat.ns1"))
    spark.sql("DROP NAMESPACE graftcat.ns1 CASCADE")
    assert(!namespaces.contains("ns1"))
  }

  test("catalog refuses what it cannot make safe: duplicate create, " +
    "non-identity partitioning, in-place type changes, RENAME") {
    spark.sql("CREATE TABLE graftcat.db.once (id BIGINT)")
    intercept[Exception](
      spark.sql("CREATE TABLE graftcat.db.once (id BIGINT)"))
    intercept[Exception](spark.sql(
      "CREATE TABLE graftcat.db.bucketed (id BIGINT, b STRING) " +
        "PARTITIONED BY (bucket(4, id))"))
    // ADD COLUMN is supported (metadata-only commit); everything that
    // would need an in-place rewrite under snapshot readers is not
    intercept[Exception](spark.sql(
      "ALTER TABLE graftcat.db.once ALTER COLUMN id TYPE STRING"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graftcat.db.once RENAME TO graftcat.db.twice"))
  }

  test("SQL DELETE FROM: copy-on-write commit, partition drop, " +
    "time travel keeps pre-delete rows") {
    spark.sql("CREATE TABLE graftcat.db.del " +
      "(id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.del VALUES " +
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'c', 40)")
    // data-column predicate: CoW rewrite of the partitions holding
    // matches; untouched partitions' files carry by reference
    val before = Manifest.snapshot(spark, s"$warehouse/db/del", 2L)
    spark.sql("DELETE FROM graftcat.db.del WHERE id = 2")
    val after = Manifest.snapshot(spark, s"$warehouse/db/del", 3L)
    assert(before.files.filter(_.contains("part=b/"))
      .toSet.subsetOf(after.files.toSet),
      "untouched partition must carry files by reference")
    // partition-column predicate: whole-partition drop
    spark.sql("DELETE FROM graftcat.db.del WHERE part = 'c'")
    assert(spark.sql("SELECT id FROM graftcat.db.del")
      .as[Long].collect().toSet == Set(1L, 3L))
    // pre-delete snapshot intact (erase with audit window)
    assert(spark.sql(
      "SELECT id FROM graftcat.db.del VERSION AS OF 2")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // unconditional DELETE empties the table but keeps the schema
    spark.sql("DELETE FROM graftcat.db.del")
    assert(spark.table("graftcat.db.del").count() == 0)
    // TRUNCATE TABLE rides the same path; history stays intact
    spark.sql("INSERT INTO graftcat.db.del VALUES (9, 'z', 90)")
    spark.sql("TRUNCATE TABLE graftcat.db.del")
    assert(spark.table("graftcat.db.del").count() == 0)
    assert(spark.sql("SELECT id FROM graftcat.db.del VERSION AS OF 2")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("SQL DELETE FROM handles hive-escaped and NULL partition values") {
    spark.sql("CREATE TABLE graftcat.db.del_esc " +
      "(id BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.del_esc VALUES " +
      "(1, 'a:b'), (2, 'a:b'), (3, NULL), (4, 'plain')")
    // delete inside the escaped partition (path has a%3Ab): the old
    // file must be dropped from the manifest, not substring-missed
    spark.sql("DELETE FROM graftcat.db.del_esc WHERE id = 1")
    assert(spark.sql("SELECT id FROM graftcat.db.del_esc")
      .as[Long].collect().toSet == Set(2L, 3L, 4L))
    // delete the NULL partition via IS NULL
    spark.sql("DELETE FROM graftcat.db.del_esc WHERE part IS NULL")
    assert(spark.sql("SELECT id FROM graftcat.db.del_esc")
      .as[Long].collect().toSet == Set(2L, 4L))
    // 3-valued DELETE: `part = 'x'` is NULL for null-partition rows —
    // they must SURVIVE a not-equals-style delete
    spark.sql("INSERT INTO graftcat.db.del_esc VALUES (5, NULL)")
    spark.sql("DELETE FROM graftcat.db.del_esc WHERE part = 'plain'")
    assert(spark.sql("SELECT id FROM graftcat.db.del_esc")
      .as[Long].collect().toSet == Set(2L, 5L))
  }

  test("SQL UPDATE: group-based copy-on-write rewrite; untouched " +
    "partitions carry files by reference; time travel intact") {
    spark.sql("CREATE TABLE graftcat.db.upd " +
      "(id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.upd VALUES " +
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'c', 40)")
    val root = s"$warehouse/db/upd"
    val before = Manifest.snapshot(spark, root, 2L)
    // static group pruning: the condition names the partition column,
    // so only part='a' files are rewritten
    spark.sql("UPDATE graftcat.db.upd SET v = v + 100 " +
      "WHERE part = 'a' AND id % 2 = 0")
    val after = Manifest.snapshot(spark, root, 3L)
    assert(before.files.filterNot(_.contains("part=a/"))
      .toSet.subsetOf(after.files.toSet),
      "untouched partitions must carry files by reference")
    assert(spark.sql("SELECT id, v FROM graftcat.db.upd ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 120L), (3L, 30L), (4L, 40L)))
    // arbitrary-expression UPDATE (no partition hint): still correct
    spark.sql("UPDATE graftcat.db.upd SET v = v * 10 " +
      "WHERE length(part) + id = 4")
    assert(spark.sql("SELECT id, v FROM graftcat.db.upd ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 120L), (3L, 300L), (4L, 40L)))
    // pre-update snapshot intact
    assert(spark.sql(
      "SELECT v FROM graftcat.db.upd VERSION AS OF 2 ORDER BY v")
      .as[Long].collect().toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("SQL MERGE INTO: upsert through the row-level rewrite; runtime " +
    "group filtering keeps unmatched partitions untouched") {
    spark.sql("CREATE TABLE graftcat.db.mrg " +
      "(id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.mrg VALUES " +
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'c', 40)")
    Seq((2L, "a", 999L), (5L, "a", 50L))
      .toDF("id", "part", "v").createOrReplaceTempView("mrg_src")
    val root = s"$warehouse/db/mrg"
    val before = Manifest.snapshot(spark, root, 2L)
    spark.sql("""MERGE INTO graftcat.db.mrg t USING mrg_src s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT id, part, v FROM graftcat.db.mrg ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "a", 999L), (3L, "b", 30L),
        (4L, "c", 40L), (5L, "a", 50L)))
    // MERGE with delete action
    spark.sql("""MERGE INTO graftcat.db.mrg t USING mrg_src s
      ON t.id = s.id
      WHEN MATCHED AND s.v > 100 THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = s.v""")
    assert(spark.sql("SELECT id, v FROM graftcat.db.mrg ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (3L, 30L), (4L, 40L), (5L, 50L)))
    // pre-merge snapshot intact (time travel over DML history)
    assert(spark.sql(
      "SELECT id FROM graftcat.db.mrg VERSION AS OF 2 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L))
    // the merges touched only part='a': b and c files of v2 must
    // still be referenced by the LATEST manifest (runtime group
    // filtering / static pruning kept them out of the rewrite)
    val latest = Manifest.latestVersion(spark, root).get
    val cur = Manifest.snapshot(spark, root, latest)
    assert(before.files.filterNot(_.contains("part=a/"))
      .toSet.subsetOf(cur.files.toSet),
      s"untouched partitions were rewritten:\n  v2: ${before.files}\n" +
        s"  v$latest: ${cur.files}")
  }

  test("CALL system.compact / system.vacuum: table maintenance through " +
    "pure SQL") {
    spark.sql("CREATE TABLE graftcat.db.maint " +
      "(id BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.maint VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graftcat.db.maint VALUES (3, 'a')")
    spark.sql("INSERT INTO graftcat.db.maint VALUES (4, 'b')")
    val root = s"$warehouse/db/maint"
    val filesBefore = Manifest.snapshot(spark, root, 4L).files.size
    // everything is tiny → every file is a compaction victim
    val res = spark.sql("CALL graftcat.system.compact(" +
      "table => 'db.maint', target_bytes => 1073741824)")
      .as[(Long, Long)].collect().toSeq
    assert(res.size == 1)
    val (v, files) = res.head
    assert(v == 5L && files < filesBefore, s"v=$v files=$files")
    assert(spark.sql("SELECT id FROM graftcat.db.maint")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // vacuum with retention 1: only the compacted snapshot's files
    // survive; the pre-compaction originals are reclaimed
    val removed = spark.sql("CALL graftcat.system.vacuum(" +
      "table => 'db.maint', keep_versions => 1)")
      .as[Long].collect().head
    assert(removed >= filesBefore.toLong,
      s"expected >= $filesBefore reclaimed, got $removed")
    assert(spark.sql("SELECT id FROM graftcat.db.maint")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // age-based retention through SQL: keep_last floors the drop, so
    // an expire-everything cutoff on a 1-version table removes nothing
    assert(spark.sql("CALL graftcat.system.expire_snapshots(" +
      s"table => 'db.maint', older_than_ms => ${Long.MaxValue})")
      .as[Long].collect().head == 0L)
    assert(spark.sql("SELECT id FROM graftcat.db.maint")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // unknown procedure fails loudly
    intercept[Exception](spark.sql("CALL graftcat.system.nope()"))
  }

  test("ALTER TABLE ADD COLUMN: metadata-only schema widening; old " +
    "files read NULL; pinned versions keep the narrower schema") {
    spark.sql("CREATE TABLE graftcat.db.evolve (id BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.evolve VALUES (1, 'a'), (2, 'b')")
    val root = s"$warehouse/db/evolve"
    val filesBefore = Manifest.snapshot(spark, root, 2L).files
    spark.sql("ALTER TABLE graftcat.db.evolve ADD COLUMN score BIGINT")
    // v3: SAME files, wider header — zero data IO
    assert(Manifest.snapshot(spark, root, 3L).files == filesBefore)
    assert(spark.table("graftcat.db.evolve").schema.fieldNames.toSeq ==
      Seq("id", "part", "score"))
    assert(spark.sql("SELECT id, score FROM graftcat.db.evolve")
      .as[(Long, Option[Long])].collect().toSet ==
      Set((1L, None), (2L, None)))
    // new writes fill the column; old files still read NULL
    spark.sql("INSERT INTO graftcat.db.evolve VALUES (3, 'a', 30)")
    assert(spark.sql(
      "SELECT sum(score) FROM graftcat.db.evolve").as[Long].head == 30L)
    // pinned pre-ALTER snapshot keeps the narrower schema
    assert(spark.sql(
      "SELECT * FROM graftcat.db.evolve VERSION AS OF 2")
      .schema.fieldNames.toSeq == Seq("id", "part"))
    // duplicates and unsupported alterations fail loudly
    intercept[Exception](spark.sql(
      "ALTER TABLE graftcat.db.evolve ADD COLUMN id BIGINT"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graftcat.db.evolve RENAME COLUMN score TO s2"))
  }

  test("ALTER TABLE DROP COLUMN: metadata-only; pinned versions keep " +
    "the column; re-add refused until a rewrite") {
    spark.sql("CREATE TABLE graftcat.db.shrink (id BIGINT, " +
      "part STRING, score BIGINT) PARTITIONED BY (part)")
    spark.sql(
      "INSERT INTO graftcat.db.shrink VALUES (1, 'a', 10), (2, 'b', 20)")
    val root = s"$warehouse/db/shrink"
    val filesBefore = Manifest.snapshot(spark, root, 2L).files
    spark.sql("ALTER TABLE graftcat.db.shrink DROP COLUMN score")
    // v3: SAME files, narrower header — zero data IO
    assert(Manifest.snapshot(spark, root, 3L).files == filesBefore)
    assert(spark.table("graftcat.db.shrink").schema.fieldNames.toSeq ==
      Seq("id", "part"))
    // pinned pre-DROP snapshot still reads the values
    assert(spark.sql(
      "SELECT score FROM graftcat.db.shrink VERSION AS OF 2")
      .as[Long].collect().toSet == Set(10L, 20L))
    // the partition column cannot go; the dropped name cannot come back
    intercept[Exception](spark.sql(
      "ALTER TABLE graftcat.db.shrink DROP COLUMN part"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graftcat.db.shrink ADD COLUMN score BIGINT"))
    // INSERT OVERWRITE rewrites every file → tombstone releases
    spark.sql("INSERT OVERWRITE graftcat.db.shrink VALUES (3, 'c')")
    spark.sql("ALTER TABLE graftcat.db.shrink ADD COLUMN score BIGINT")
    assert(spark.sql("SELECT id, score FROM graftcat.db.shrink")
      .as[(Long, Option[Long])].collect().toSeq == Seq((3L, None)))
  }

  test("CALL system.history lists every snapshot with its footprint; " +
    "table properties surface snapshot facts") {
    spark.sql("CREATE TABLE graftcat.db.hist (id BIGINT)")
    spark.sql("INSERT INTO graftcat.db.hist VALUES (1)")
    spark.sql("INSERT INTO graftcat.db.hist VALUES (2)")
    val hist = spark.sql("CALL graftcat.system.history(table => 'db.hist')")
      .as[(Long, java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(hist.map(_._1) == Seq(1L, 2L, 3L), hist)
    assert(hist.last._3 > hist(1)._3 && hist.last._4 > hist(1)._4,
      s"footprint must grow across appends: $hist")
    // commit timestamps are present and non-decreasing across versions
    assert(hist.forall(_._2 != null) &&
      hist.sliding(2).forall(p => !p(0)._2.after(p(1)._2)), hist)
    val props = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[ManifestCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "hist")).properties()
    assert(props.get("version") == "3")
    // CREATE's zero-row init writes one empty file, each INSERT one more;
    // properties must agree with what history reports for the same version
    assert(props.get("files") == hist.last._3.toString)
    assert(props.get("size-bytes") == hist.last._4.toString)
  }

  test("TIMESTAMP AS OF resolves the newest snapshot committed at or " +
    "before the given time, through SQL and the reader option") {
    spark.sql("CREATE TABLE graftcat.db.tt (id BIGINT)")
    spark.sql("INSERT INTO graftcat.db.tt VALUES (1)") // v2
    val root = s"$warehouse/db/tt"
    val ts2 = Manifest.snapshotMeta(spark, root, 2L).ts.get
    // commit clocks must strictly advance past v2 for a deterministic test
    while (System.currentTimeMillis() <= ts2) Thread.sleep(1)
    spark.sql("INSERT INTO graftcat.db.tt VALUES (2)") // v3
    assert(Manifest.versionAt(spark, root, ts2) == 2L)
    assert(Manifest.versionAt(spark, root, System.currentTimeMillis()) == 3L)
    // SQL: timestamp_millis is exact and timezone-independent
    assert(spark.sql(
      s"SELECT count(*) FROM graftcat.db.tt " +
        s"TIMESTAMP AS OF timestamp_millis($ts2)")
      .as[Long].head == 1L)
    // DataFrame reader option (epoch millis)
    assert(spark.read.format("graft-manifest")
      .option("timestampAsOf", ts2).load(root).count() == 1L)
    intercept[Exception](spark.read.format("graft-manifest")
      .option("timestampAsOf", ts2).option("version", 2).load(root))
    // a timestamp before the first commit fails loudly
    intercept[Exception](spark.sql(
      "SELECT * FROM graftcat.db.tt " +
        "TIMESTAMP AS OF CAST(0.0 AS TIMESTAMP)").collect())
  }

  test("SQL UPDATE over pending merge-on-read deletes never " +
    "resurrects; CALL system.rewrite_deletes materializes") {
    spark.sql("CREATE TABLE graftcat.db.mor " +
      "(id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.mor VALUES " +
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', 40)")
    val root = s"$warehouse/db/mor"
    Manifest.deleteByKeys(spark, root, Seq(2L, 4L).toDF("id"))
    // the row-level rewrite reads deletes-applied: id=2 must NOT come
    // back when partition a is rewritten by the UPDATE
    spark.sql("UPDATE graftcat.db.mor SET v = v + 1 WHERE part = 'a'")
    assert(spark.table("graftcat.db.mor")
      .as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 11L), (3L, "b", 30L)))
    // materialize through SQL; content unchanged, deletes gone
    spark.sql("CALL graftcat.system.rewrite_deletes(table => 'db.mor')")
    assert(Manifest.snapshotMeta(spark, root,
      Manifest.latestVersion(spark, root).get).deletes.isEmpty)
    assert(spark.table("graftcat.db.mor")
      .as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 11L), (3L, "b", 30L)))
  }

  test("delete.mode=merge-on-read: a keyed SQL DELETE commits a " +
    "delete file with ZERO data rewrite; other shapes stay CoW") {
    spark.sql("CREATE TABLE graftcat.db.morsql " +
      "(id BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graftcat.db.morsql VALUES " +
      "(1, 'a'), (2, 'a'), (3, 'b'), (4, 'b'), (5, 'b')")
    val root = s"$warehouse/db/morsql"
    val before = Manifest.snapshot(spark, root, 2L).files.toSet
    spark.conf.set("spark.graft.manifest.delete.mode", "merge-on-read")
    try {
      spark.sql("DELETE FROM graftcat.db.morsql WHERE id IN (2, 4)")
      // metadata-only: same data files, one delete entry
      assert(Manifest.snapshot(spark, root, 3L).files.toSet == before)
      assert(Manifest.snapshotMeta(spark, root, 3L).deletes.size == 1)
      assert(spark.table("graftcat.db.morsql").as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (3L, "b"), (5L, "b")))
      // composite key shape: id = 5 AND part = 'b' → one tuple
      spark.sql(
        "DELETE FROM graftcat.db.morsql WHERE id = 5 AND part = 'b'")
      assert(Manifest.snapshot(spark, root, 4L).files.toSet == before)
      assert(spark.table("graftcat.db.morsql").as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (3L, "b")))
      // non-key shape (arithmetic) falls back to copy-on-write:
      // partition a's files are rewritten, not carried
      spark.sql("DELETE FROM graftcat.db.morsql WHERE id % 2 = 1")
      assert(spark.table("graftcat.db.morsql").count() == 0L)
      assert(Manifest.snapshot(spark, root, 5L).files.toSet != before)
    } finally
      spark.conf.unset("spark.graft.manifest.delete.mode")
  }

  test("tags through SQL: CALL system.tag pins a ref, VERSION AS OF " +
    "'name' reads it, retention respects it, drop_tag releases") {
    spark.sql("CREATE TABLE graftcat.db.tagged (id BIGINT)")
    spark.sql("INSERT INTO graftcat.db.tagged VALUES (1)") // v2
    spark.sql("INSERT INTO graftcat.db.tagged VALUES (2)") // v3
    spark.sql(
      "CALL graftcat.system.tag(table => 'db.tagged', name => 'audit', " +
        "version => 2)")
    assert(spark.sql(
      "SELECT sum(id) FROM graftcat.db.tagged VERSION AS OF 'audit'")
      .as[Long].head == 1L)
    assert(spark.sql("CALL graftcat.system.tags(table => 'db.tagged')")
      .as[(String, Long)].collect().toSeq == Seq(("audit", 2L)))
    // vacuum to latest-only: the tagged v2 survives
    spark.sql("CALL graftcat.system.vacuum(" +
      "table => 'db.tagged', keep_versions => 1)")
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.db.tagged VERSION AS OF 'audit'")
      .as[Long].head == 1L)
    // default version = latest
    spark.sql("CALL graftcat.system.tag(" +
      "table => 'db.tagged', name => 'latest_run')")
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.db.tagged " +
        "VERSION AS OF 'latest_run'").as[Long].head == 2L)
    assert(spark.sql("CALL graftcat.system.drop_tag(" +
      "table => 'db.tagged', name => 'audit')").as[Boolean].head)
    intercept[Exception](spark.sql(
      "SELECT * FROM graftcat.db.tagged VERSION AS OF 'audit'").collect())
  }

  test("CALL system.rollback: restores an earlier version or tag as " +
    "a NEW commit; history stays time-travelable") {
    spark.sql("CREATE TABLE graftcat.db.rolled (id BIGINT)")
    spark.sql("INSERT INTO graftcat.db.rolled VALUES (1), (2)") // v2
    spark.sql("CALL graftcat.system.tag(" +
      "table => 'db.rolled', name => 'good')")
    spark.sql("INSERT OVERWRITE graftcat.db.rolled VALUES (99)") // v3
    assert(spark.table("graftcat.db.rolled")
      .as[Long].collect().toSet == Set(99L))
    // roll back by tag name → v4 restores the tagged content
    assert(spark.sql("CALL graftcat.system.rollback(" +
      "table => 'db.rolled', version => 'good')").as[Long].head == 4L)
    assert(spark.table("graftcat.db.rolled")
      .as[Long].collect().toSet == Set(1L, 2L))
    // the abandoned overwrite stays readable; numeric refs work too
    assert(spark.sql(
      "SELECT id FROM graftcat.db.rolled VERSION AS OF 3")
      .as[Long].collect().toSet == Set(99L))
    spark.sql("CALL graftcat.system.rollback(" +
      "table => 'db.rolled', version => '3')")
    assert(spark.table("graftcat.db.rolled")
      .as[Long].collect().toSet == Set(99L))
  }

  test("CALL system.analyze: column stats land in the header and " +
    "feed CBO attribute stats through the catalog read") {
    spark.sql("CREATE TABLE graftcat.db.anl (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graftcat.db.anl " +
      "SELECT id, concat('s', id) FROM range(1, 51)")
    assert(spark.sql("CALL graftcat.system.analyze(" +
      "table => 'db.anl')").as[Long].head == 3L)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("graftcat.db.anl")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(50)))
      val idStat = stats.attributeStats.toSeq
        .collectFirst { case (a, st) if a.name == "id" => st }.get
      assert(idStat.min.contains(1L) && idStat.max.contains(50L))
      assert(idStat.distinctCount.exists(n => n > 40 && n <= 55))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("CALL system.zorder rewrites the layout through SQL; reads " +
    "stay identical and history keeps the pre-rewrite snapshot") {
    spark.sql("CREATE TABLE graftcat.db.zt (x BIGINT, y BIGINT)")
    spark.sql("INSERT INTO graftcat.db.zt " +
      "SELECT id AS x, 4095 - id AS y FROM range(0, 4096)")
    val before = spark.sql(
      "SELECT sum(x) AS sx, sum(y) AS sy FROM graftcat.db.zt")
      .as[(Long, Long)].head
    val out = spark.sql("CALL graftcat.system.zorder(" +
      "table => 'db.zt', columns => 'x,y', target_bytes => 65536)")
      .as[(Long, Long)].head
    assert(out._2 >= 1L)
    assert(spark.sql(
      "SELECT sum(x) AS sx, sum(y) AS sy FROM graftcat.db.zt")
      .as[(Long, Long)].head == before)
    // the rewrite is a commit like any other: time travel still works
    assert(spark.sql(
      s"SELECT count(*) FROM graftcat.db.zt VERSION AS OF ${out._1 - 1}")
      .as[Long].head == 4096L)
    // scoped to one partition through SQL
    spark.sql("CREATE TABLE graftcat.db.ztp (x BIGINT, y BIGINT, " +
      "p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graftcat.db.ztp SELECT id, 4095 - id, " +
      "CAST(id % 2 AS STRING) FROM range(0, 4096)")
    val root = s"$warehouse/db/ztp"
    val keep = Manifest.snapshot(spark, root, 2L).files
      .filter(_.contains("p=1/")).toSet
    spark.sql("CALL graftcat.system.zorder(table => 'db.ztp', " +
      "columns => 'x,y', partition => 'p=0')")
    assert(Manifest.snapshot(spark, root, 3L).files
      .filter(_.contains("p=1/")).toSet == keep)
    assert(spark.sql("SELECT count(*) FROM graftcat.db.ztp")
      .as[Long].head == 4096L)
  }

  test("write-audit-publish through SQL: stages list, publish " +
    "fast-forwards, discard reclaims") {
    spark.sql("CREATE TABLE graftcat.db.wap (id BIGINT)") // v1
    spark.sql("INSERT INTO graftcat.db.wap VALUES (1)")   // v2
    val root = s"$warehouse/db/wap"
    // staging is pure SQL too: CALL system.stage reads a view
    Seq(2L).toDF("id").createOrReplaceTempView("wap_drop1")
    assert(spark.sql("CALL graftcat.system.stage(table => 'db.wap', " +
      "id => 'drop1', source => 'wap_drop1')").as[Boolean].head)
    assert(spark.sql("SELECT count(*) FROM graftcat.db.wap")
      .as[Long].head == 1L)
    assert(spark.sql("CALL graftcat.system.stages(table => 'db.wap')")
      .as[String].collect().toSeq == Seq("drop1"))
    assert(spark.sql("CALL graftcat.system.publish_stage(" +
      "table => 'db.wap', id => 'drop1')").as[Long].head == 3L)
    assert(spark.sql("SELECT count(*) FROM graftcat.db.wap")
      .as[Long].head == 2L)
    Manifest.stageAppend(spark, root, Seq(9L).toDF("id"), "bad")
    assert(spark.sql("CALL graftcat.system.discard_stage(" +
      "table => 'db.wap', id => 'bad')").as[Long].head >= 1L)
    assert(spark.sql("SELECT count(*) FROM graftcat.db.wap")
      .as[Long].head == 2L)
    // orphan cleanup through SQL: nothing referenced is reclaimable
    assert(spark.sql("CALL graftcat.system.remove_orphans(" +
      "table => 'db.wap', grace_ms => 0)").as[Long].head == 0L)
    assert(spark.sql("SELECT count(*) FROM graftcat.db.wap")
      .as[Long].head == 2L)
    // staged REPLACE through SQL: audit, then the swap
    Seq(8L, 9L).toDF("id").createOrReplaceTempView("wap_redrop")
    spark.sql("CALL graftcat.system.stage(table => 'db.wap', " +
      "id => 'redrop', source => 'wap_redrop', mode => 'replace')")
    assert(spark.sql("SELECT count(*) FROM graftcat.db.wap")
      .as[Long].head == 2L)
    assert(spark.read.format("graft-manifest")
      .option("stage", "redrop").load(root).count() == 2L)
    spark.sql("CALL graftcat.system.publish_stage(" +
      "table => 'db.wap', id => 'redrop')")
    assert(spark.sql("SELECT sum(id) FROM graftcat.db.wap")
      .as[Long].head == 17L)
  }

  test("identifier segments cannot traverse outside the warehouse") {
    // a backtick-quoted name carrying '..' or '/' would otherwise
    // resolve (and DROP TABLE would recursively delete) outside the
    // warehouse root
    intercept[Exception](spark.sql(
      "CREATE TABLE graftcat.db.`../evil` (id BIGINT)"))
    intercept[Exception](spark.sql(
      "CREATE TABLE graftcat.db.`a/b` (id BIGINT)"))
    intercept[Exception](spark.sql(
      "DROP TABLE graftcat.`..`.`..`"))
    intercept[Exception](spark.sql(
      "CREATE NAMESPACE graftcat.`../outside`"))
  }

  test("native batch INSERT clusters by partition columns: a " +
    "multi-task insert writes O(partition values) files, not O(T×P)") {
    spark.sql("CREATE TABLE graftcat.db.clustered " +
      "(id BIGINT, lang STRING) PARTITIONED BY (lang)")
    spark.range(0, 400, 1, 8) // 8 upstream tasks
      .selectExpr("id", "CASE CAST(id % 4 AS INT) WHEN 0 THEN 'de' " +
        "WHEN 1 THEN 'en' WHEN 2 THEN 'fr' ELSE 'zh' END AS lang")
      .createOrReplaceTempView("clustered_src")
    spark.sql("INSERT INTO graftcat.db.clustered " +
      "SELECT id, lang FROM clustered_src")
    assert(spark.table("graftcat.db.clustered").count() == 400L)
    // 8 tasks × 4 values would be 32 files unclustered; the declared
    // write distribution co-locates each value into one task
    val files = Manifest
      .snapshot(spark, s"$warehouse/db/clustered",
        Manifest.latestVersion(spark, s"$warehouse/db/clustered").get)
      .files
    assert(files.size <= 4, s"expected ≤4 clustered files, got " +
      s"${files.size}:\n${files.mkString("\n")}")
    // and the rows round-trip exactly
    assert(spark.sql("SELECT lang, count(*) FROM graftcat.db.clustered " +
      "GROUP BY lang ORDER BY lang").as[(String, Long)].collect().toSeq ==
      Seq(("de", 100L), ("en", 100L), ("fr", 100L), ("zh", 100L)))
  }

  test("branches through SQL: create_branch / branch_append / " +
    "fast_forward / branches / drop_branch") {
    spark.sql("CREATE TABLE graftcat.db.br (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graftcat.db.br VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("CALL graftcat.system.create_branch(" +
      "table => 'db.br', name => 'exp')")
      .as[Long].head == 2L)
    Seq((3L, "c"), (4L, "d")).toDF("id", "s")
      .createOrReplaceTempView("br_delta")
    assert(spark.sql("CALL graftcat.system.branch_append(" +
      "table => 'db.br', name => 'exp', source => 'br_delta')")
      .as[Long].head == 3L)
    // main untouched; branch readable via the connector option
    assert(spark.table("graftcat.db.br").count() == 2L)
    assert(spark.read.format("graft-manifest").option("branch", "exp")
      .load(warehouse.stripPrefix("file://") + "/db/br").count() == 4L)
    assert(spark.sql("CALL graftcat.system.branches(table => 'db.br')")
      .as[(String, Long)].collect().toSeq == Seq(("exp", 3L)))
    // pure-SQL branch read: the version slot carries the branch ref
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.db.br VERSION AS OF 'branch:exp'")
      .as[Long].head == 4L)
    assert(spark.sql("CALL graftcat.system.fast_forward(" +
      "table => 'db.br', name => 'exp')").as[Long].head == 3L)
    assert(spark.table("graftcat.db.br").count() == 4L)
    assert(spark.sql("CALL graftcat.system.drop_branch(" +
      "table => 'db.br', name => 'exp')").as[Long].head == 0L)
    assert(spark.sql("CALL graftcat.system.branches(table => 'db.br')")
      .count() == 0L)
  }

  test("materialized views through SQL: create_mv aggregates into a " +
    "catalog table, refresh_mv advances it incrementally") {
    spark.sql("CREATE TABLE graftcat.db.corpus " +
      "(id BIGINT, lang STRING, n BIGINT) PARTITIONED BY (lang)")
    spark.sql("INSERT INTO graftcat.db.corpus VALUES " +
      "(1, 'en', 10), (2, 'en', 20), (3, 'de', 5)")
    spark.sql("CALL graftcat.system.create_mv(table => 'db.corpus', " +
      "view => 'db.corpus_by_lang', group_cols => 'lang', " +
      "sum_cols => 'n', buckets => 8)")
    // the view IS a catalog table (tombstones + internal cols visible
    // on a raw read; the maintained columns are correct)
    def mv = spark.sql("SELECT lang, mv_count, sum_n FROM " +
      "graftcat.db.corpus_by_lang WHERE mv_count > 0")
      .as[(String, Long, Long)].collect().toSet
    assert(mv == Set(("en", 2L, 30L), ("de", 1L, 5L)))
    spark.sql("INSERT INTO graftcat.db.corpus VALUES (4, 'fr', 7)")
    val r = spark.sql("CALL graftcat.system.refresh_mv(" +
      "table => 'db.corpus', view => 'db.corpus_by_lang')")
      .as[(Long, Long)].head
    assert(r._2 == 3L, s"mv base should be the source head, got $r")
    assert(mv == Set(("en", 2L, 30L), ("de", 1L, 5L), ("fr", 1L, 7L)))
  }

  test("metadata tables: db.t.files / .partitions / .history are " +
    "queryable relations; VERSION AS OF pins files/partitions") {
    spark.sql("CREATE TABLE graftcat.db.meta " +
      "(id BIGINT, lang STRING, v BIGINT) PARTITIONED BY (lang)")
    spark.sql("INSERT INTO graftcat.db.meta VALUES " +
      "(1, 'de', 10), (2, 'en', 20), (3, 'de', 30)")
    spark.sql("INSERT INTO graftcat.db.meta VALUES (4, 'fr', 40)")

    // partitions: per-partition physical row counts from file stats
    val parts = spark.sql("SELECT partition, row_count FROM " +
      "graftcat.db.meta.partitions ORDER BY partition")
      .as[(String, Long)].collect().toSeq
    assert(parts == Seq(("lang=de", 2L), ("lang=en", 1L),
      ("lang=fr", 1L)))

    // files: one row per data file; rollup matches partitions; paths
    // carry their hive dirs and commit seqs
    val files = spark.sql("SELECT partition, row_count, seq FROM " +
      "graftcat.db.meta.files").as[(String, Long, Long)].collect()
    assert(files.map(_._2).sum == 4L)
    assert(files.filter(_._1 == "lang=fr").forall(_._3 == 3L),
      "fr was added by commit 3")

    // history: full snapshot log (v1 create, v2 + v3 inserts)
    val hist = spark.sql("SELECT version, files FROM " +
      "graftcat.db.meta.history ORDER BY version")
      .as[(Long, Long)].collect().toSeq
    assert(hist.map(_._1) == Seq(1L, 2L, 3L))
    assert(hist.last._2 == files.length.toLong)

    // VERSION AS OF pins the snapshot files/partitions describe
    val p2 = spark.sql("SELECT partition FROM " +
      "graftcat.db.meta.partitions VERSION AS OF 2")
      .as[String].collect().toSet
    assert(p2 == Set("lang=de", "lang=en"))

    // metadata relations compose like any other: join files → history
    val joined = spark.sql("""SELECT h.version, count(*)
        FROM graftcat.db.meta.files f
        JOIN graftcat.db.meta.history h ON f.seq = h.version
        GROUP BY h.version ORDER BY h.version""")
      .as[(Long, Long)].collect()
    assert(joined.map(_._2).sum == files.length.toLong)

    // a real table still shadows: no metadata suffix hijacks names
    intercept[Exception] {
      spark.table("graftcat.db.meta.nosuch").collect()
    }
  }

  test("metadata tables: tags, branches, delete_files reflect refs " +
    "and pending MoR deletes") {
    import graft.sources.Manifest
    spark.sql("CREATE TABLE graftcat.db.meta2 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftcat.db.meta2 VALUES (1, 10), (2, 20)")
    val root = s"$warehouse/db/meta2"
    assert(spark.table("graftcat.db.meta2.tags").count() == 0)
    assert(spark.table("graftcat.db.meta2.branches").count() == 0)
    assert(spark.table("graftcat.db.meta2.delete_files").count() == 0)
    Manifest.tag(spark, root, "published", 2L)
    Manifest.createBranch(spark, root, "dev")
    Manifest.deleteByKeys(spark, root, Seq(1L).toDF("id"))
    assert(spark.table("graftcat.db.meta2.tags")
      .as[(String, Long)].collect().toSeq == Seq(("published", 2L)))
    assert(spark.table("graftcat.db.meta2.branches")
      .as[(String, Long)].collect().toSeq == Seq(("dev", 2L)))
    val dels = spark.sql("SELECT seq, key_columns FROM " +
      "graftcat.db.meta2.delete_files").as[(Long, String)].collect()
    assert(dels.toSeq == Seq((3L, "id")))
    // the pre-delete snapshot has no pending delete files
    assert(spark.sql("SELECT * FROM graftcat.db.meta2.delete_files " +
      "VERSION AS OF 2").count() == 0)
  }

  test("metadata tables: distributed batch scan above the LocalScan " +
    "threshold, same rows either way; TIMESTAMP AS OF resolves " +
    "against the base table's commit log") {
    import graft.sources.Manifest
    val thresholdKey = "spark.graft.metadataTables.localScanThreshold"
    spark.sql("CREATE TABLE graftcat.db.meta3 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftcat.db.meta3 VALUES (1, 10), (2, 20)")
    val root = s"$warehouse/db/meta3"
    val ts2 = Manifest.snapshotMeta(spark, root, 2L).ts.get
    while (System.currentTimeMillis() <= ts2) Thread.sleep(1)
    spark.sql("INSERT INTO graftcat.db.meta3 VALUES (3, 30)") // v3
    def files = spark.table("graftcat.db.meta3.files")
    val localPlan = files.queryExecution.executedPlan.toString
    assert(localPlan.contains("LocalTableScan"), localPlan.take(1000))
    val localRows = files.select("path").as[String].collect().toSet
    spark.conf.set(thresholdKey, "1")
    try {
      val p = files.queryExecution.executedPlan.toString
      assert(!p.contains("LocalTableScan"), p.take(1000))
      assert(p.contains("BatchScan"), p.take(1000))
      assert(files.select("path").as[String].collect().toSet == localRows)
    } finally spark.conf.unset(thresholdKey)
    // TIMESTAMP AS OF on the suffix relation: pins the file list of the
    // newest base-table snapshot at or before the timestamp (v2), while
    // VERSION AS OF and the unpinned read agree on the head
    val pinned = spark.sql("SELECT path FROM graftcat.db.meta3.files " +
      s"TIMESTAMP AS OF timestamp_millis($ts2)")
      .as[String].collect().toSet
    val v2 = spark.sql("SELECT path FROM graftcat.db.meta3.files " +
      "VERSION AS OF 2").as[String].collect().toSet
    assert(pinned == v2)
    assert(pinned.subsetOf(localRows) && pinned.size < localRows.size)
    // history.bytes: non-null when every entry carries a size, and it
    // matches the files rollup for the head snapshot
    val (bytes, headVer) = spark.sql("SELECT bytes, version FROM " +
      "graftcat.db.meta3.history ORDER BY version DESC LIMIT 1")
      .as[(Option[Long], Long)].head
    val sumFiles = files.selectExpr("sum(size_bytes)").as[Long].head
    assert(headVer == 3L && bytes.contains(sumFiles))
  }

  test("CALL system.optimize folds MoR deletes then bin-packs; " +
    "no-op on an already-clean table") {
    import graft.sources.Manifest
    spark.sql("CREATE TABLE graftcat.db.opt (id BIGINT, v BIGINT)")
    for (i <- 0 until 3) // several tiny-file commits + a MoR delete
      spark.sql(s"INSERT INTO graftcat.db.opt VALUES ($i, ${i * 10})")
    Manifest.deleteByKeys(spark, s"$warehouse/db/opt", Seq(1L).toDF("id"))
    val r = spark.sql("CALL graftcat.system.optimize(table => 'db.opt')")
      .as[(Long, Boolean, Boolean, Long)].head
    assert(r._2, "should have rewritten the pending delete")
    assert(r._3, "should have compacted the small files")
    assert(spark.table("graftcat.db.opt.delete_files").count() == 0)
    assert(spark.sql("SELECT id FROM graftcat.db.opt")
      .as[Long].collect().toSet == Set(0L, 2L))
    // clean table → both steps report no-op, version unchanged
    val r2 = spark.sql("CALL graftcat.system.optimize(table => 'db.opt')")
      .as[(Long, Boolean, Boolean, Long)].head
    assert(r2._1 == r._1 && !r2._2 && !r2._3)
  }

  test("search index through SQL: create_search_index builds a catalog " +
    "table, search serves BM25, refresh_search_index tracks inserts, " +
    "and the vector index mirrors the lifecycle") {
    spark.sql("CREATE TABLE graftcat.db.docs (id BIGINT, text STRING)")
    spark.sql("INSERT INTO graftcat.db.docs VALUES " +
      "(1, 'red fish'), (2, 'blue fish'), (3, 'blue whale blue')")
    spark.sql("CALL graftcat.system.create_search_index(" +
      "table => 'db.docs', index => 'db.docs_idx', id_col => 'id', " +
      "text_col => 'text', buckets => 8)")
    // the index IS a catalog table: postings are SELECT-able
    assert(spark.sql("SELECT count(*) FROM graftcat.db.docs_idx")
      .as[Long].head > 0)
    def hits() = spark.sql("CALL graftcat.system.search(" +
        "index => 'db.docs_idx', query => 'blue', k => 5)")
      .as[(String, Double, Long)].collect().toSeq
    val direct = graft.sources.SearchIndex.searchBm25(spark,
        s"$warehouse/db/docs_idx", "blue", 5)
      .collect().map(r => (r.getLong(0).toString, r.getDouble(1),
        r.getLong(2))).toSeq
    assert(hits() == direct && hits().nonEmpty)
    spark.sql("INSERT INTO graftcat.db.docs VALUES (4, 'blue moon')")
    val r = spark.sql("CALL graftcat.system.refresh_search_index(" +
      "table => 'db.docs', index => 'db.docs_idx')")
      .as[(Long, Long)].head
    assert(r._2 == 3L, s"index base should be the source head, got $r")
    assert(hits().map(_._1).contains("4"))
    // dense mirror — the SOURCE embeddings table carries an array
    // column, which the V2 connector's SQL DDL refuses (flat
    // primitives only), so it is built with the Scala Manifest API at
    // its warehouse path; the PROCEDURES still drive the index
    // lifecycle from SQL (they resolve roots, not connector tables)
    Manifest.init(spark, s"$warehouse/db/emb",
      Seq((1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.3)),
        (3L, Array(0.0, 1.0))).toDF("id", "v"))
    spark.sql("CALL graftcat.system.create_vector_index(" +
      "table => 'db.emb', index => 'db.emb_idx', id_col => 'id', " +
      "vec_col => 'v', cells => 2)")
    Manifest.commitAppend(spark, s"$warehouse/db/emb",
      Seq((4L, Array(1.0, 0.1))).toDF("id", "v"))
    spark.sql("CALL graftcat.system.refresh_vector_index(" +
      "table => 'db.emb', index => 'db.emb_idx')")
    val ann = graft.sources.VectorIndex.search(spark,
        s"$warehouse/db/emb_idx", Array(1.0, 0.0), k = 2, nProbe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(ann.map(_._1) == Seq(1L, 4L)) // probe-all exact, 4 indexed
  }

  test("CHECK constraints through SQL: add_constraint gates the " +
    "native INSERT and UPDATE paths; constraints lists; drop lifts") {
    def causesOf(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    spark.sql("CREATE TABLE graftcat.db.cons (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftcat.db.cons SELECT id, id FROM range(5)")
    spark.sql("CALL graftcat.system.add_constraint(" +
      "table => 'db.cons', name => 'v_pos', expr => 'v >= 0')")
    // violating INSERT refused (executor-staged V2 commit face)
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO graftcat.db.cons VALUES (9, -1)") }
    assert(causesOf(e1).exists(c =>
      Option(c.getMessage).exists(_.contains("CHECK constraint"))), e1)
    assert(spark.sql("SELECT count(*) FROM graftcat.db.cons")
      .as[Long].head == 5L)
    // violating UPDATE refused (row-level rewrite commit face)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE graftcat.db.cons SET v = -5 WHERE id = 2") }
    assert(causesOf(e2).exists(c =>
      Option(c.getMessage).exists(_.contains("CHECK constraint"))), e2)
    assert(spark.sql("SELECT sum(v) FROM graftcat.db.cons")
      .as[Long].head == 10L)
    assert(spark.sql("CALL graftcat.system.constraints(" +
        "table => 'db.cons')")
      .as[(String, String)].collect().toSeq == Seq(("v_pos", "v >= 0")))
    // the queryable metadata-table face shows the same facts
    assert(spark.sql("SELECT name, expr FROM graftcat.db.cons.constraints")
      .as[(String, String)].collect().toSeq == Seq(("v_pos", "v >= 0")))
    assert(spark.sql("CALL graftcat.system.drop_constraint(" +
      "table => 'db.cons', name => 'v_pos')").as[Boolean].head)
    spark.sql("INSERT INTO graftcat.db.cons VALUES (9, -1)")
    assert(spark.sql("SELECT count(*) FROM graftcat.db.cons")
      .as[Long].head == 6L)
  }

  test("join MV through SQL: create_join_mv materializes, " +
    "refresh_join_mv advances incrementally, the view is SELECT-able") {
    spark.sql("CREATE TABLE graftcat.db.jf (k BIGINT, fv BIGINT)")
    spark.sql("CREATE TABLE graftcat.db.jd (k BIGINT, dv STRING)")
    spark.sql("INSERT INTO graftcat.db.jf SELECT id, id * 2 " +
      "FROM range(20)")
    spark.sql("INSERT INTO graftcat.db.jd " +
      "SELECT id, concat('d', id) FROM range(15)")
    spark.sql("CALL graftcat.system.create_join_mv(" +
      "left => 'db.jf', right => 'db.jd', view => 'db.jmv', " +
      "keys => 'k', buckets => 2)")
    assert(spark.sql("SELECT count(*) FROM graftcat.db.jmv")
      .as[Long].head == 15L)
    spark.sql("INSERT INTO graftcat.db.jd SELECT 17, 'd17'")
    val r = spark.sql("CALL graftcat.system.refresh_join_mv(" +
      "view => 'db.jmv')").as[(Long, Long, Long)].head
    assert(r._3 == 3L, s"right base should advance to head, got $r")
    assert(spark.sql("SELECT fv FROM graftcat.db.jmv WHERE k = 17")
      .as[Long].collect().toSeq == Seq(34L))
    assert(spark.sql("SELECT count(*) FROM graftcat.db.jmv")
      .as[Long].head == 16L)
  }
}
