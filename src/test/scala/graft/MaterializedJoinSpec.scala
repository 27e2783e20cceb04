package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Manifest, MaterializedJoin}

/** Incrementally-maintained join views ([[MaterializedJoin]]): the
  * delta algebra `(L+ΔL)⋈(R+ΔR) = L⋈R + ΔL⋈R_head + L_base⋈ΔR` under
  * appends on either or both sides (duplicate keys included — bag
  * semantics), full-rebuild fallbacks on rewrites and merge-on-read
  * deletes, atomic base advancement, and guard rails. */
class MaterializedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(tag: String) = "file://" + java.nio.file.Files
    .createTempDirectory(s"graft-mvj-$tag").toString + "/t"

  private def recompute(l: String, r: String): Set[(Long, Long, String)] =
    Manifest.read(spark, l).join(Manifest.read(spark, r), Seq("k"))
      .select($"k", $"lv", $"rv")
      .as[(Long, Long, String)].collect().toSet

  private def view(mv: String): Set[(Long, Long, String)] =
    MaterializedJoin.read(spark, mv).select($"k", $"lv", $"rv")
      .as[(Long, Long, String)].collect().toSet

  private def fixture(): (String, String, String) = {
    val l = newRoot("l"); val r = newRoot("r"); val mv = newRoot("mv")
    Manifest.init(spark, l,
      (1L to 50L).map(i => (i, i * 10)).toDF("k", "lv"))
    Manifest.init(spark, r,
      (1L to 40L).map(i => (i, s"r$i")).toDF("k", "rv"))
    MaterializedJoin.create(spark, l, r, mv, Seq("k"), buckets = 4)
    (l, r, mv)
  }

  test("create materializes the join; refresh after appends on " +
    "either and BOTH sides stays equal to a recompute") {
    val (l, r, mv) = fixture()
    assert(view(mv) == recompute(l, r) && view(mv).size == 40)

    // left-only append (new keys + keys already matched)
    Manifest.commitAppend(spark, l,
      Seq((30L, 999L), (60L, 600L)).toDF("k", "lv"))
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r))

    // right-only append — must join against the BASE left too
    Manifest.commitAppend(spark, r,
      Seq((45L, "r45"), (60L, "r60")).toDF("k", "rv"))
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r))

    // both sides advance before ONE refresh — the ΔL⋈ΔR cross term
    Manifest.commitAppend(spark, l, Seq((70L, 700L)).toDF("k", "lv"))
    Manifest.commitAppend(spark, r, Seq((70L, "r70")).toDF("k", "rv"))
    val v = MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r))
    assert(view(mv).contains((70L, 700L, "r70")))
    // bases advanced atomically with the delta commit
    assert(MaterializedJoin.bases(spark, mv) ==
      (Manifest.latestVersion(spark, l).get,
        Manifest.latestVersion(spark, r).get))
    // no-op refresh: version unchanged
    assert(MaterializedJoin.refresh(spark, mv) == v)
  }

  test("duplicate join keys follow bag semantics through the delta " +
    "path (a 2x2 key appends to 4 rows, incremental ≡ recompute)") {
    val l = newRoot("dl"); val r = newRoot("dr"); val mv = newRoot("dmv")
    Manifest.init(spark, l,
      Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "lv"))
    Manifest.init(spark, r,
      Seq((1L, "a"), (2L, "b")).toDF("k", "rv"))
    MaterializedJoin.create(spark, l, r, mv, Seq("k"), buckets = 2)
    assert(MaterializedJoin.read(spark, mv).count() == 3)
    // second right-side row for key 1: joins BOTH left rows
    Manifest.commitAppend(spark, r, Seq((1L, "a2")).toDF("k", "rv"))
    // and another left row for key 1: joins both right rows
    Manifest.commitAppend(spark, l, Seq((1L, 12L)).toDF("k", "lv"))
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r))
    assert(MaterializedJoin.read(spark, mv).count() == 7) // 3*2 + 1
  }

  test("merge-on-read deletes keyed on the join keys propagate " +
    "INCREMENTALLY: the view gains a delete entry, no data rewrite") {
    val (l, r, mv) = fixture()
    val beforeFiles = Manifest.snapshotMeta(spark, mv,
      Manifest.latestVersion(spark, mv).get).files.toSet
    Manifest.deleteByKeys(spark, r, Seq(3L, 4L).toDF("k"))
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r) && view(mv).size == 38)
    val m = Manifest.snapshotMeta(spark, mv,
      Manifest.latestVersion(spark, mv).get)
    assert(m.deletes.nonEmpty,
      "the erasure must land as a merge-on-read delete on the view")
    assert(beforeFiles.subsetOf(m.files.toSet),
      "no view data file may be rewritten by a propagated delete")
    assert(MaterializedJoin.bases(spark, mv) ==
      (Manifest.latestVersion(spark, l).get,
        Manifest.latestVersion(spark, r).get))
  }

  test("appends interleaved with join-key deletes on BOTH sides " +
    "replay per commit and equal a recompute (incremental, resumable)") {
    val (l, r, mv) = fixture()
    val beforeFiles = Manifest.snapshotMeta(spark, mv,
      Manifest.latestVersion(spark, mv).get).files.toSet
    // left: delete keys 1-2, then append a new row for key 1 (the
    // re-append must survive — replay order matters)
    Manifest.deleteByKeys(spark, l, Seq(1L, 2L).toDF("k"))
    Manifest.commitAppend(spark, l, Seq((1L, 111L)).toDF("k", "lv"))
    // right: append a second row for key 10, delete keys 5-6
    Manifest.commitAppend(spark, r, Seq((10L, "r10b")).toDF("k", "rv"))
    Manifest.deleteByKeys(spark, r, Seq(5L, 6L).toDF("k"))
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r))
    assert(view(mv).contains((1L, 111L, "r1")),
      "a key re-appended after its delete must re-join")
    assert(!view(mv).exists(t => t._1 == 5L || t._1 == 6L))
    val m = Manifest.snapshotMeta(spark, mv,
      Manifest.latestVersion(spark, mv).get)
    assert(beforeFiles.subsetOf(m.files.toSet),
      "replay must never rewrite existing view files")
    // a second refresh is a no-op (bases settled at both heads)
    val v = Manifest.latestVersion(spark, mv).get
    assert(MaterializedJoin.refresh(spark, mv) == v)
  }

  test("consecutive same-kind source commits merge: an append run " +
    "and a delete run replay as ONE view commit each") {
    val (l, r, mv) = fixture()
    val v0 = Manifest.latestVersion(spark, mv).get
    Manifest.commitAppend(spark, l, Seq((35L, 777L)).toDF("k", "lv"))
    Manifest.commitAppend(spark, l, Seq((36L, 778L)).toDF("k", "lv"))
    Manifest.commitAppend(spark, l, Seq((37L, 779L)).toDF("k", "lv"))
    Manifest.deleteByKeys(spark, l, Seq(1L).toDF("k"))
    Manifest.deleteByKeys(spark, l, Seq(2L, 3L).toDF("k"))
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r))
    val vN = Manifest.latestVersion(spark, mv).get
    assert(vN - v0 == 2,
      s"3 appends + 2 deletes must replay as 2 view commits, " +
        s"got ${vN - v0}")
  }

  test("rewrites and deletes on NON-join keys fall back to a full " +
    "rebuild — never silently wrong") {
    val (l, r, mv) = fixture()
    // copy-on-write rewrite of the left: file diff is not append-only
    Manifest.commitReplace(spark, l,
      Manifest.read(spark, l).filter($"k" <= 10))
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r) && view(mv).size == 10)
    // MoR delete keyed on a NON-join column: not propagatable by key
    Manifest.deleteByKeys(spark, l, Seq(30L).toDF("lv")) // k=3's lv
    MaterializedJoin.refresh(spark, mv)
    assert(view(mv) == recompute(l, r) && view(mv).size == 9)
    // the rebuild left a clean (delete-free) view snapshot
    assert(Manifest.snapshotMeta(spark, mv,
      Manifest.latestVersion(spark, mv).get).deletes.isEmpty)
  }

  test("guard rails: colliding non-key columns and missing keys " +
    "refuse at create") {
    val l = newRoot("gl"); val r = newRoot("gr")
    Manifest.init(spark, l, Seq((1L, 1L)).toDF("k", "v"))
    Manifest.init(spark, r, Seq((1L, 2L)).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      MaterializedJoin.create(spark, l, r, newRoot("gmv"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      MaterializedJoin.create(spark, l, r, newRoot("gmv2"), Seq("nope"))
    }
  }
}
