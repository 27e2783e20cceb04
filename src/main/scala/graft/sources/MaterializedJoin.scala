package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained INNER EQUI-JOIN view over two manifest
  * tables — the second classic "never recompute at 100 TB" shape next
  * to [[MaterializedAgg]]: `fact ⋈ dim` kept fresh after each ingest
  * without re-joining the full tables.
  *
  * ALGEBRA — for append-only advances on either side, the join delta
  * is exact bag arithmetic:
  *
  * {{{ (L+ΔL) ⋈ (R+ΔR) = L⋈R  +  ΔL ⋈ (R+ΔR)  +  L ⋈ ΔR }}}
  *
  * so a refresh appends `ΔL ⋈ R_head` plus `L_base ⋈ ΔR` — the ΔL⋈ΔR
  * cross term rides the first join (which uses the head right side)
  * and the second join uses the BASE left side, so nothing is counted
  * twice, duplicate keys and all. Cost: each term scans one side's
  * DELTA against the other side ONCE (column-pruned, and the big side
  * is read through the V2 connector so a selective delta triggers
  * runtime file pruning — zone maps AND bloom sidecars — on the join
  * key); never the old join output, never both full tables.
  *
  * The view is itself a manifest table (time travel, atomic commits,
  * snapshot isolation), partitioned by a hash bucket of the join key;
  * its commit header carries BOTH reflected source versions, so the
  * refresh bases advance atomically with the delta append — no gap in
  * which a crash double-applies.
  *
  * Falls back to a FULL recompute ([[Manifest.commitReplace]]) when
  * the incremental contract breaks on either side: rewritten/removed
  * files, pending merge-on-read deletes (row-level retractions are
  * invisible to a file diff), or a vacuumed-away base. Never silently
  * wrong. */
object MaterializedJoin {

  private val BucketCol = "mvj_bucket"

  private def withBucket(df: DataFrame, keys: Seq[String],
                         buckets: Int): DataFrame =
    df.withColumn(BucketCol,
      pmod(xxhash64(keys.map(col): _*), lit(buckets)).cast("int"))

  /** Version-pinned read of a source, preferring the V2 connector
    * (runtime file pruning on the join key — a selective delta prunes
    * the big side's files via zone maps and bloom sidecars); falls
    * back to the Scala reader for schemas outside the connector's
    * flat-primitive scope. */
  private def readPinned(spark: SparkSession, root: String,
                         v: Long): DataFrame =
    try spark.read.format("graft-manifest")
      .option("version", v.toString).load(root)
    catch { case NonFatal(_) => Manifest.read(spark, root, Some(v)) }

  private def joined(spark: SparkSession, left: DataFrame,
                     right: DataFrame, keys: Seq[String],
                     buckets: Int): DataFrame =
    withBucket(left.join(right, keys), keys, buckets)

  private def stateMeta(leftRoot: String, rightRoot: String,
                        keys: Seq[String], buckets: Int,
                        lBase: Long, rBase: Long): Map[String, String] =
    Map("mvj.left" -> leftRoot, "mvj.right" -> rightRoot,
      "mvj.keys" -> keys.mkString(","),
      "mvj.buckets" -> buckets.toString,
      "mvj.lbase" -> lBase.toString, "mvj.rbase" -> rBase.toString)

  /** Materialize `left ⋈ right` on `keys` (same column names on both
    * sides; non-key column names must not collide — qualify upstream).
    * The create pays the one full join this view exists to avoid
    * re-paying. */
  def create(spark: SparkSession, leftRoot: String, rightRoot: String,
             mvRoot: String, keys: Seq[String],
             buckets: Int = 64): Long = {
    require(keys.nonEmpty, "need at least one join key")
    require(buckets >= 1, "buckets must be >= 1")
    val lHead = Manifest.latestVersion(spark, leftRoot).getOrElse(
      throw new IllegalStateException(s"$leftRoot not initialized"))
    val rHead = Manifest.latestVersion(spark, rightRoot).getOrElse(
      throw new IllegalStateException(s"$rightRoot not initialized"))
    val l = readPinned(spark, leftRoot, lHead)
    val r = readPinned(spark, rightRoot, rHead)
    keys.foreach { k =>
      require(l.columns.contains(k) && r.columns.contains(k),
        s"join key '$k' must exist on both sides")
    }
    val overlap = (l.columns.toSet & r.columns.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"non-key columns collide across sides: $overlap — alias them " +
        "apart before materializing")
    Manifest.init(spark, mvRoot,
      joined(spark, l, r, keys, buckets), Seq(BucketCol),
      extraMeta = stateMeta(leftRoot, rightRoot, keys, buckets,
        lHead, rHead))
  }

  private def state(spark: SparkSession, mvRoot: String)
      : (Map[String, String], Long) = {
    val mvHead = Manifest.latestVersion(spark, mvRoot).getOrElse(
      throw new IllegalStateException(s"$mvRoot not initialized"))
    val meta = Manifest.snapshotMeta(spark, mvRoot, mvHead).meta
    require(meta.contains("mvj.left"),
      s"$mvRoot is not a materialized join (no mvj.left header)")
    (meta, mvHead)
  }

  /** (left version, right version) the view currently reflects. */
  def bases(spark: SparkSession, mvRoot: String): (Long, Long) = {
    val (meta, _) = state(spark, mvRoot)
    (meta("mvj.lbase").toLong, meta("mvj.rbase").toLong)
  }

  /** The view's contents (internal bucket column dropped). */
  def read(spark: SparkSession, mvRoot: String): DataFrame =
    Manifest.read(spark, mvRoot).drop(BucketCol)

  /** Is the advance `base → head` of `root` a pure append (and both
    * snapshots still resolvable)? Returns the added file set. */
  private def appendDiff(spark: SparkSession, root: String,
                         base: Long, head: Long): Option[Set[String]] =
    if (head == base) Some(Set.empty)
    else if (head < base ||
      !Manifest.versions(spark, root).contains(base)) None
    else {
      val baseSnap = Manifest.snapshotMeta(spark, root, base)
      val headSnap = Manifest.snapshotMeta(spark, root, head)
      if (baseSnap.deletes.nonEmpty || headSnap.deletes.nonEmpty) None
      else {
        val ch = Manifest.changedFiles(spark, root, base, head)
        if (ch.removed.isEmpty) Some(ch.added.toSet) else None
      }
    }

  /** Advance the view to both sources' heads. Incremental (two
    * delta-vs-other-side joins, appended in one commit) when both
    * advances are pure appends; full recompute otherwise. Returns the
    * view's new version (unchanged when neither source moved). */
  def refresh(spark: SparkSession, mvRoot: String): Long = {
    val (meta, mvHead) = state(spark, mvRoot)
    val leftRoot = meta("mvj.left"); val rightRoot = meta("mvj.right")
    val keys = meta("mvj.keys").split(',').toSeq
    val buckets = meta("mvj.buckets").toInt
    val lBase = meta("mvj.lbase").toLong
    val rBase = meta("mvj.rbase").toLong
    val lHead = Manifest.latestVersion(spark, leftRoot).getOrElse(
      throw new IllegalStateException(s"$leftRoot not initialized"))
    val rHead = Manifest.latestVersion(spark, rightRoot).getOrElse(
      throw new IllegalStateException(s"$rightRoot not initialized"))
    if (lHead == lBase && rHead == rBase) return mvHead

    def full(): Long =
      Manifest.commitReplace(spark, mvRoot,
        joined(spark, readPinned(spark, leftRoot, lHead),
          readPinned(spark, rightRoot, rHead), keys, buckets),
        Seq(BucketCol),
        extraMeta = stateMeta(leftRoot, rightRoot, keys, buckets,
          lHead, rHead))

    (appendDiff(spark, leftRoot, lBase, lHead),
      appendDiff(spark, rightRoot, rBase, rHead)) match {
      case (Some(lAdded), Some(rAdded)) =>
        val terms = Seq(
          // ΔL ⋈ R_head — carries the ΔL⋈ΔR cross term
          if (lAdded.isEmpty) None
          else Some(Manifest.readSubset(spark, leftRoot, lHead, lAdded)
            .join(readPinned(spark, rightRoot, rHead), keys)),
          // L_base ⋈ ΔR — the base left, so nothing counts twice
          if (rAdded.isEmpty) None
          else Some(readPinned(spark, leftRoot, lBase)
            .join(Manifest.readSubset(spark, rightRoot, rHead, rAdded),
              keys))
        ).flatten
        val delta = terms.reduce(_.unionByName(_))
        Manifest.commitAppend(spark, mvRoot,
          withBucket(delta, keys, buckets), Seq(BucketCol),
          extraMeta = Map("mvj.lbase" -> lHead.toString,
            "mvj.rbase" -> rHead.toString))
      case _ => full()
    }
  }
}
