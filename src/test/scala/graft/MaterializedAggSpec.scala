package graft

import org.apache.spark.sql.functions._

import graft.sources.{Manifest, MaterializedAgg}

/** Incrementally-maintained grouped aggregates: refresh ∝ changes,
  * atomic base advancement, fallback to full recompute when the
  * file-diff contract breaks. */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(tag: String) = "file://" + java.nio.file.Files
    .createTempDirectory(s"graft-mv-$tag").toString + "/t"

  private def recompute(src: String) =
    Manifest.read(spark, src).groupBy("lang")
      .agg(count(lit(1)).as("mv_count"), sum("n").as("sum_n"))
      .as[(String, Long, Long)].collect().toSet

  private def mvContents(mv: String) =
    MaterializedAgg.read(spark, mv).select("lang", "mv_count", "sum_n")
      .as[(String, Long, Long)].collect().toSet

  test("create + incremental refresh track the recompute across " +
    "append, copy-on-write merge and group disappearance") {
    val src = newRoot("src")
    val mv = newRoot("mv")
    Manifest.init(spark, src,
      Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 5L))
        .toDF("id", "lang", "n"), Seq("lang"))
    MaterializedAgg.create(spark, src, mv, Seq("lang"), Seq("n"),
      buckets = 8)
    assert(mvContents(mv) == Set(("en", 2L, 30L), ("de", 1L, 5L)))
    assert(MaterializedAgg.baseVersion(spark, mv) == 1L)

    // append: new group appears, existing group grows
    Manifest.commitAppend(spark, src,
      Seq((4L, "en", 40L), (5L, "fr", 7L)).toDF("id", "lang", "n"),
      Seq("lang"))
    MaterializedAgg.refresh(spark, src, mv)
    assert(MaterializedAgg.baseVersion(spark, mv) == 2L)
    assert(mvContents(mv) == recompute(src))
    // the refresh was a MERGE, not a replace: untouched buckets'
    // files carry forward by reference
    val v1Files = Manifest.snapshot(spark, mv, 1L).files.toSet
    val v2Files = Manifest.snapshot(spark, mv, 2L).files.toSet
    assert(v1Files.intersect(v2Files).nonEmpty,
      "incremental refresh rewrote every bucket (looks like a replace)")

    // copy-on-write merge rewrites a partition: removed + added files
    // must cancel for untouched rows
    Manifest.mergeInto(spark, src,
      Seq((1L, "en", 100L)).toDF("id", "lang", "n"), "id", "lang")
    MaterializedAgg.refresh(spark, src, mv)
    assert(mvContents(mv) == recompute(src))
    assert(mvContents(mv).contains(("en", 3L, 160L)))

    // a group losing its last row tombstones out of the view
    Manifest.deleteWhere(spark, src, col("lang") === "de", "lang")
    MaterializedAgg.refresh(spark, src, mv)
    assert(mvContents(mv) == recompute(src))
    assert(!mvContents(mv).exists(_._1 == "de"))

    // no-op refresh: source unchanged → same version back
    val before = Manifest.latestVersion(spark, mv).get
    assert(MaterializedAgg.refresh(spark, src, mv) == before)
  }

  test("merge-on-read deletes retract INCREMENTALLY: per-commit " +
    "replay reads only the pre-delete snapshot's matching rows") {
    val src = newRoot("src2")
    val mv = newRoot("mv2")
    Manifest.init(spark, src,
      Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "de", 30L))
        .toDF("id", "lang", "n"))
    MaterializedAgg.create(spark, src, mv, Seq("lang"), Seq("n"),
      buckets = 4)
    val v1Files = Manifest.snapshot(spark, mv, 1L).files.toSet
    // MoR delete: retracts group de's row 2 through the replay tier
    Manifest.deleteByKeys(spark, src, Seq(2L).toDF("id"))
    MaterializedAgg.refresh(spark, src, mv)
    assert(mvContents(mv) == recompute(src))
    assert(mvContents(mv) == Set(("en", 1L, 10L), ("de", 1L, 30L)))
    assert(MaterializedAgg.baseVersion(spark, mv) == 2L)
    // the retraction was a MERGE of changed buckets, not a replace
    val now = Manifest.snapshot(spark, mv,
      Manifest.latestVersion(spark, mv).get).files.toSet
    assert(v1Files.intersect(now).nonEmpty,
      "a keyed retraction must not rewrite the whole view")

    // a delete AND an append land before one refresh: replay in order
    Manifest.deleteByKeys(spark, src, Seq(3L).toDF("id"))
    Manifest.commitAppend(spark, src,
      Seq((5L, "de", 50L), (6L, "it", 6L)).toDF("id", "lang", "n"))
    MaterializedAgg.refresh(spark, src, mv)
    assert(mvContents(mv) == recompute(src))
    assert(mvContents(mv) == Set(("en", 1L, 10L), ("de", 1L, 50L),
      ("it", 1L, 6L)))
    assert(MaterializedAgg.baseVersion(spark, mv) ==
      Manifest.latestVersion(spark, src).get)
  }

  test("deleting a group's LAST row through replay tombstones it, " +
    "and vacuumed history still falls back to a full recompute") {
    val src = newRoot("src2b")
    val mv = newRoot("mv2b")
    Manifest.init(spark, src,
      Seq((1L, "en", 10L), (2L, "de", 20L)).toDF("id", "lang", "n"))
    MaterializedAgg.create(spark, src, mv, Seq("lang"), Seq("n"),
      buckets = 4)
    Manifest.deleteByKeys(spark, src, Seq(2L).toDF("id"))
    MaterializedAgg.refresh(spark, src, mv)
    assert(mvContents(mv) == Set(("en", 1L, 10L)),
      "an emptied group must disappear from the view")

    // vacuum away the view's base snapshot → fallback, still correct
    Manifest.rewriteDeletes(spark, src)
    Manifest.commitAppend(spark, src, Seq((4L, "fr", 1L))
      .toDF("id", "lang", "n"))
    Manifest.vacuum(spark, src, keepVersions = 1)
    MaterializedAgg.refresh(spark, src, mv)
    assert(mvContents(mv) == recompute(src))
  }

  test("NULL-sum fidelity: removing a group's last non-null value " +
    "yields NULL, not 0 — the non-null counter decides like a recompute") {
    val src = newRoot("src3")
    val mv = newRoot("mv3")
    Manifest.init(spark, src,
      Seq((1L, "a", Some(5L)), (2L, "a", None), (3L, "b", Some(7L)))
        .toDF("id", "lang", "n"))
    MaterializedAgg.create(spark, src, mv, Seq("lang"), Seq("n"),
      buckets = 4)
    // CoW delete of the only non-null 'a' row; the null row survives
    Manifest.deleteWhere(spark, src, col("id") === 1L, Nil)
    MaterializedAgg.refresh(spark, src, mv)
    val rows = MaterializedAgg.read(spark, mv)
      .select("lang", "mv_count", "sum_n")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("a") == ((1L, None)),
      s"sum over an all-null group must be NULL, got ${rows("a")}")
    assert(rows("b") == ((1L, Some(7L))))
    // and a new value arriving later resumes from zero, not from null
    Manifest.commitAppend(spark, src,
      Seq((4L, "a", Some(9L))).toDF("id", "lang", "n"))
    MaterializedAgg.refresh(spark, src, mv)
    assert(MaterializedAgg.read(spark, mv)
      .filter(col("lang") === "a").select("sum_n")
      .as[Option[Long]].head.contains(9L))
  }

  test("guard rails: wrong source root refuses, colliding column " +
    "names fail at create") {
    val src = newRoot("src4")
    val other = newRoot("src5")
    val mv = newRoot("mv4")
    Manifest.init(spark, src, Seq((1L, "a", 1L)).toDF("id", "lang", "n"))
    Manifest.init(spark, other,
      Seq((1L, "a", 1L)).toDF("id", "lang", "n"))
    MaterializedAgg.create(spark, src, mv, Seq("lang"), Seq("n"))
    val e = intercept[IllegalArgumentException](
      MaterializedAgg.refresh(spark, other, mv))
    assert(e.getMessage.contains("materializes"), e.getMessage)
    // internal-namespace collisions are caught at CREATE, not on the
    // first refresh
    for (bad <- Seq("count", "mv_key", "sum_x", "nn_y", "d_z", "__old_w"))
      intercept[IllegalArgumentException] {
        val r = newRoot("bad")
        Manifest.init(spark, r,
          Seq((1L, "a")).toDF(bad, "lang"))
        MaterializedAgg.create(spark, r, newRoot("badmv"),
          Seq("lang"), Seq(bad))
      }
  }

  test("derived group expressions + where predicate persist in the " +
    "header and maintain across append, file-diff delta and MoR " +
    "delete replay (the q233/q246 histogram shape)") {
    val src = newRoot("src6")
    val mv = newRoot("mv6")
    def histRecompute() = Manifest.read(spark, src)
      .filter(col("n").isNotNull)
      .withColumn("bucket",
        expr("cast(greatest(0, least(floor(n / 10.0), 3)) as int)"))
      .groupBy("lang", "bucket").agg(count(lit(1)).as("mv_count"))
      .as[(String, Int, Long)].collect().toSet
    def histMv() = MaterializedAgg.read(spark, mv)
      .select("lang", "bucket", "mv_count")
      .as[(String, Int, Long)].collect().toSet
    Manifest.init(spark, src,
      Seq((1L, "en", Some(5L)), (2L, "en", Some(15L)),
        (3L, "de", Some(99L)), (4L, "de", None))
        .toDF("id", "lang", "n"))
    MaterializedAgg.create(spark, src, mv,
      groupCols = Seq("lang", "bucket"), sumCols = Nil, buckets = 4,
      derived = Seq("bucket" ->
        "cast(greatest(0, least(floor(n / 10.0), 3)) as int)"),
      where = Some("n is not null"))
    assert(histMv() == histRecompute())
    assert(histMv() == Set(("en", 0, 1L), ("en", 1, 1L), ("de", 3, 1L)))

    // append (file-diff path): new buckets appear, filtered rows don't
    Manifest.commitAppend(spark, src,
      Seq((5L, "en", Some(25L)), (6L, "fr", None))
        .toDF("id", "lang", "n"))
    MaterializedAgg.refresh(spark, src, mv)
    assert(histMv() == histRecompute())
    assert(!histMv().exists(_._1 == "fr"),
      "an all-null-filtered stratum must not appear")

    // MoR delete (replay path): the retraction routes through the
    // same projection, so the derived bucket retracts exactly
    Manifest.deleteByKeys(spark, src, Seq(2L).toDF("id"))
    MaterializedAgg.refresh(spark, src, mv)
    assert(histMv() == histRecompute())
    assert(histMv() == Set(("en", 0, 1L), ("en", 2, 1L), ("de", 3, 1L)))
  }
}
