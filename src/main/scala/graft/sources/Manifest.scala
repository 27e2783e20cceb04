package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}

/** Versioned manifest commit layer: the missing cross-partition
  * atomicity for the lake's upsert/compaction story (SURVEY §7 — the
  * last divergence `Catalog.mergeInto` left open).
  *
  * A table = a `data/` area of immutable parquet files + a
  * `_manifests/` directory of version files, each listing exactly the
  * data files that make up that snapshot:
  *
  * {{{
  *   <root>/data/c00000001/part-*.parquet     (files of commit 1)
  *   <root>/data/c00000002/part-*.parquet     (files of commit 2)
  *   <root>/_manifests/v00000001.txt          (file list of snapshot 1)
  *   <root>/_manifests/v00000002.txt
  * }}}
  *
  * Commit protocol (optimistic): write the new commit's data files
  * under a fresh `data/cN` dir, then CREATE `vN.txt` with
  * create-if-absent (O_EXCL) — one atomic create makes the whole
  * snapshot (spanning any number of partitions) visible at once, which
  * is precisely what dynamic partition overwrite cannot give. A racing
  * committer that created `vN.txt` first wins; the loser throws
  * (stale-version conflict) without having touched any live state —
  * its orphan data dir is cleaned by [[vacuum]]. A reader racing the
  * manifest write itself is fenced by the `#count` header: a torn read
  * (header present, fewer lines than promised) fails loudly instead of
  * silently scanning a partial snapshot.
  *
  * Readers resolve `latest` (max version present) or pin an explicit
  * version: time travel, and isolation from concurrent rewrites — a
  * merge or compaction only ADDS files and a new manifest; the files
  * a pinned snapshot references are immutable until a vacuum drops
  * snapshots older than the retention floor.
  *
  * All control-plane IO is Hadoop FileSystem (file://, hdfs://,
  * s3a://). The claim primitive is create-if-absent: POSIX O_EXCL on
  * file:// (NIO `CREATE_NEW` — `FileSystem.rename` on the local FS
  * silently OVERWRITES, so rename-based claims lose commits there),
  * `create(path, overwrite = false)` on HDFS. Plain S3 needs a
  * conditional put or a lock table for the same guarantee — the
  * protocol is unchanged, only the atomicity primitive moves.
  *
  * Scale: a manifest is O(files) text, read once per query on the
  * driver (the same metadata-scale read every table format does);
  * data-file IO is the ordinary distributed parquet scan over exactly
  * the listed files.
  */
object Manifest {

  final case class Snapshot(version: Long, files: Seq[String])

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestDir(root: String) = s"$root/_manifests"
  private def vName(v: Long) = f"v$v%08d.txt"

  /** Hive path-escaping inverse (%3A etc.) — partition values land in
    * paths escaped; surface the original string. */
  def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `data/c00000001-ab12/lang=de/part-0.parquet` → Seq(lang -> de).
    * Null partitions (`__HIVE_DEFAULT_PARTITION__`) map to null. */
  def partValuesOf(relPath: String): Seq[(String, String)] =
    relPath.split('/').drop(2).dropRight(1).toSeq.flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) =>
          val uv = unescapePathName(v)
          Some(k -> (if (uv == "__HIVE_DEFAULT_PARTITION__") null else uv))
        case _ => None
      }
    }

  /** Does `relPath` belong to one of the `touched` partitions? Matches
    * on PARSED partition values (hive-unescaped, null-aware), never on
    * raw path substrings: a value like `a:b` lands in the path as
    * `a%3Ab` and a null as `__HIVE_DEFAULT_PARTITION__`, so substring
    * matching against the raw value would silently carry the old files
    * forward (duplicates after MERGE, survivors after DELETE). */
  private def inTouchedPartition(relPath: String, partitionCol: String,
                                 touched: Set[Option[String]]): Boolean =
    partValuesOf(relPath)
      .collectFirst { case (k, v) if k == partitionCol => Option(v) }
      .exists(touched.contains)

  /** List a commit dir's parquet files as root-relative paths. */
  private def commitFiles(fs: FileSystem, root: Path,
                          commitDir: Path): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val it = fs.listFiles(commitDir, true)
    val rootUri = root.toUri.getPath
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet"))
        out += f.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
    }
    out.toSeq.sorted
  }

  /** Highest committed version, or None for an uninitialized root. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, _) = fsOf(spark, root)
    val md = new Path(manifestDir(root))
    if (!fs.exists(md)) None
    else fs.listStatus(md).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong }
      .maxOption
  }

  /** `#key=value` header lines carry commit metadata (e.g. the
    * streaming batch id); everything else is one data-file path per
    * line. */
  final case class SnapshotMeta(version: Long, files: Seq[String],
                                meta: Map[String, String])

  private def readManifest(spark: SparkSession, root: String,
                           version: Long): SnapshotMeta = {
    val (fs, _) = fsOf(spark, root)
    val p = new Path(manifestDir(root), vName(version))
    require(fs.exists(p), s"no manifest for version $version under $root")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    val (hdr, files) = lines.partition(_.startsWith("#"))
    val meta = hdr.map(_.stripPrefix("#").split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    // torn-read fence: the manifest is created-if-absent and then
    // written; a reader that opens it mid-write sees fewer file lines
    // than the #count header promises and must fail loudly (transient —
    // retrying re-reads the completed file), never scan a partial
    // snapshot. Manifests without the header (older format) skip the
    // check.
    meta.get("count").foreach { c =>
      require(c.toLong == files.size,
        s"torn manifest read: version $version of $root promises $c " +
          s"files, read ${files.size} — concurrent commit in flight, retry")
    }
    SnapshotMeta(version, files, meta)
  }

  def snapshot(spark: SparkSession, root: String,
               version: Long): Snapshot = {
    val m = readManifest(spark, root, version)
    Snapshot(m.version, m.files)
  }

  /** Read the table at `version` (default: latest). The scan is over
    * exactly the snapshot's files — concurrent commits are invisible. */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root))
      .getOrElse(throw new IllegalStateException(
        s"$root has no committed version"))
    val snap = snapshot(spark, root, v)
    require(snap.files.nonEmpty, s"version $v of $root lists no files")
    // One parquet relation PER COMMIT DIR, unioned: each commit dir is
    // an internally-consistent hive layout (basePath = the commit dir
    // keeps partition columns visible), while a single basePath over
    // data/ would trip CONFLICTING_DIRECTORY_STRUCTURES on the cN
    // segment. Snapshot file counts per commit are unbounded but the
    // number of live commits is small (vacuum bounds it); a format
    // tracking file-level partition tuples in the manifest would fuse
    // this into one relation — noted as the next refinement.
    snap.files.groupBy(_.split("/")(1)).toSeq.sortBy(_._1)
      .map { case (cdir, files) =>
        spark.read.option("basePath", s"$root/data/$cdir")
          .parquet(files.map(f => s"$root/$f"): _*)
      }
      // allowMissingColumns = schema evolution across commits: columns
      // added by later commits read back NULL from older files, the
      // same contract as parquet mergeSchema but resolved per commit.
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Create-if-absent: the commit claim primitive. On file:// Hadoop's
    * own `create(path, overwrite = false)` is exists-then-open (TOCTOU
    * window) and `rename` silently overwrites, so the local path goes
    * through NIO `CREATE_NEW` — a true POSIX O_EXCL. On HDFS `create`
    * with overwrite=false is atomic natively. */
  private def createExclusive(fs: FileSystem,
                              dst: Path): java.io.OutputStream = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
    case _ => fs.create(dst, false)
  }

  /** Atomically publish `files` as version `expected+1`. Throws on a
    * lost race (someone else committed that version first) — the
    * winner's manifest is never clobbered. `private[graft]` so the
    * race spec can drive two committers off the SAME expected
    * version. */
  private[graft] def publish(spark: SparkSession, root: String,
                      expected: Long, files: Seq[String],
                      meta: Map[String, String] = Map.empty): Long = {
    val (fs, _) = fsOf(spark, root)
    val next = expected + 1
    val md = new Path(manifestDir(root))
    fs.mkdirs(md)
    val dst = new Path(md, vName(next))
    // #count fences readers racing the write (see readManifest);
    // carried-forward metas are overridden with THIS snapshot's count.
    val hdr = (meta + ("count" -> files.size.toString)).toSeq.sorted
      .map { case (k, v) => s"#$k=$v" }
    val body = (hdr ++ files).mkString("\n") + "\n"
    val out =
      try createExclusive(fs, dst)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"commit conflict: version $next of $root already exists " +
              "(concurrent committer won); re-read latest and retry")
      }
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    next
  }

  /** Write `df`'s rows as the next commit's data files (hive-partition
    * layout when `partitionCols` given) and return the file list. The
    * commit dir carries a random suffix so two racing committers of
    * the same version can never clobber each other's staged files —
    * the loser's dir simply orphans (never referenced by a manifest). */
  private def writeCommit(spark: SparkSession, root: String, next: Long,
                          df: DataFrame,
                          partitionCols: Seq[String]): Seq[String] = {
    val salt = java.util.UUID.randomUUID().toString.take(8)
    val dir = f"$root/data/c$next%08d-$salt"
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir)
    val (fs, rootP) = fsOf(spark, root)
    commitFiles(fs, rootP, new Path(dir))
  }

  /** Initialize the table: version 1 = `df`. */
  def init(spark: SparkSession, root: String, df: DataFrame,
           partitionCols: Seq[String] = Nil): Long = {
    require(latestVersion(spark, root).isEmpty,
      s"$root is already a manifest table")
    publish(spark, root, 0L, writeCommit(spark, root, 1L, df, partitionCols))
  }

  /** Append-commit: next snapshot = previous files + `df`'s files.
    * Header metadata (streaming high-water marks) carries forward. */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame,
                   partitionCols: Seq[String] = Nil): Long = {
    val cur = latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root not initialized"))
    val prev = readManifest(spark, root, cur)
    val fresh = writeCommit(spark, root, cur + 1, df, partitionCols)
    publish(spark, root, cur, prev.files ++ fresh, prev.meta)
  }

  /** EXACTLY-ONCE streaming sink commit: an append-commit that records
    * `(queryId, batchId)` in the manifest header and becomes a NO-OP
    * when that batch is already the last one committed for the query —
    * the transactional half that `foreachBatch`'s at-least-once replay
    * contract needs. On restart-and-replay the duplicate batch is
    * skipped instead of appended twice; distinct queries (different
    * `queryId`) interleave freely. Batch ids from one query arrive in
    * order (Structured Streaming replays from the failed batch
    * forward), so "last committed ≥ this one" is the full dedup
    * predicate. Usage:
    * {{{
    *   stream.writeStream.foreachBatch { (df, id) =>
    *     Manifest.commitStreamBatch(spark, root, df, "ingest", id); ()
    *   }
    * }}} */
  def commitStreamBatch(spark: SparkSession, root: String, df: DataFrame,
                        queryId: String, batchId: Long,
                        partitionCols: Seq[String] = Nil): Long = {
    val metaKey = s"batch.$queryId"
    latestVersion(spark, root) match {
      case None =>
        require(latestVersion(spark, root).isEmpty, "race on init")
        publish(spark, root, 0L,
          writeCommit(spark, root, 1L, df, partitionCols),
          Map(metaKey -> batchId.toString))
      case Some(cur) =>
        val prev = readManifest(spark, root, cur)
        val already = prev.meta.get(metaKey).map(_.toLong)
        if (already.exists(_ >= batchId)) cur // replayed batch: no-op
        else {
          val fresh = writeCommit(spark, root, cur + 1, df, partitionCols)
          // carry other queries' high-water marks forward
          publish(spark, root, cur, prev.files ++ fresh,
            prev.meta + (metaKey -> batchId.toString))
        }
    }
  }

  /** Replace-commit (compaction shape): next snapshot = `df` alone.
    * Old snapshots keep reading their own files until vacuumed. */
  def commitReplace(spark: SparkSession, root: String, df: DataFrame,
                    partitionCols: Seq[String] = Nil): Long = {
    val cur = latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root not initialized"))
    val prev = readManifest(spark, root, cur)
    publish(spark, root, cur,
      writeCommit(spark, root, cur + 1, df, partitionCols), prev.meta)
  }

  /** Copy-on-write MERGE with cross-partition atomicity — the
    * [[Catalog.mergeInto]] semantics under a single-rename commit.
    * Touched partitions' rows are merged (LWW by `key`) into the new
    * commit's files; untouched partitions' FILES carry over into the
    * new manifest untouched. One rename publishes all partitions at
    * once; pinned readers keep the pre-merge snapshot. */
  def mergeInto(spark: SparkSession, root: String, updates: DataFrame,
                key: String, partitionCol: String): Long = {
    val cur = latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root not initialized"))
    val prev = readManifest(spark, root, cur)
    val table = read(spark, root, Some(cur))
    // null-safe semi join (<=>): a null partition value is a real,
    // touchable partition (__HIVE_DEFAULT_PARTITION__ on disk); a plain
    // equi-join would drop its existing rows from the rewrite and the
    // commit would lose them.
    val touched = updates.select(col(partitionCol).as("__touched_pv"))
      .distinct()
    val merged = Catalog.upsert(
      table.join(broadcast(touched),
        table(partitionCol) <=> touched("__touched_pv"), "left_semi"),
      updates, key)
    val fresh = writeCommit(spark, root, cur + 1, merged, Seq(partitionCol))
    // Carry over files of partitions the updates did not touch — the
    // touched set is matched against each file's PARSED partition value
    // (hive-unescaped, null-aware) on the driver: metadata-scale, no
    // data IO.
    val touchedVals = touched.collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.get(0).toString)).toSet
    val keep = prev.files.filterNot(
      inTouchedPartition(_, partitionCol, touchedVals))
    publish(spark, root, cur, keep ++ fresh, prev.meta)
  }

  /** DML DELETE as a copy-on-write commit: rows of `partitionCol`
    * partitions containing matches are rewritten without the matching
    * rows; partitions with no match carry their files forward BY
    * REFERENCE (zero IO — the touched set is discovered with one
    * aggregate over the predicate). Same atomicity/time-travel story
    * as [[mergeInto]]: one rename publishes, old snapshots still
    * contain the deleted rows until vacuumed. */
  def deleteWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  partitionCol: String): Long = {
    val cur = latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"$root not initialized"))
    val prev = readManifest(spark, root, cur)
    val table = read(spark, root, Some(cur))
    // native-typed touched values for the rewrite filter; stringified
    // (null-aware) for the driver-side manifest match
    val touchedRaw = table.filter(predicate)
      .select(partitionCol).distinct().collect().map(_.get(0))
    if (touchedRaw.isEmpty) return cur // nothing matches: no-op commit
    val touchedVals = touchedRaw
      .map(v => Option(v).map(_.toString)).toSet
    val nonNull = touchedRaw.filter(_ != null).toSeq
    val inTouched = {
      val base = if (nonNull.isEmpty) lit(false)
        else col(partitionCol).isin(nonNull: _*)
      if (touchedVals.contains(None)) base || col(partitionCol).isNull
      else base
    }
    // SQL DELETE semantics: drop rows where the predicate is TRUE;
    // rows where it evaluates NULL survive (`!predicate` alone would
    // filter them out — three-valued logic).
    val remain = table.filter(inTouched)
      .filter(!coalesce(predicate, lit(false)))
    val fresh = writeCommit(spark, root, cur + 1, remain, Seq(partitionCol))
    val keep = prev.files.filterNot(
      inTouchedPartition(_, partitionCol, touchedVals))
    publish(spark, root, cur, keep ++ fresh, prev.meta)
  }

  /** Drop snapshots older than the newest `keepVersions` and delete
    * data files no surviving snapshot references. The retention floor
    * is the reader contract: pin only snapshots inside it. */
  def vacuum(spark: SparkSession, root: String,
             keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val (fs, rootP) = fsOf(spark, root)
    val cur = latestVersion(spark, root).getOrElse(return Nil)
    val all = {
      val md = fs.listStatus(new Path(manifestDir(root)))
      md.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
          n.stripPrefix("v").stripSuffix(".txt").toLong }
        .sorted.toSeq
    }
    val (drop, keep) = all.partition(_ <= cur - keepVersions)
    val live = keep.flatMap(v => snapshot(spark, root, v).files).toSet
    val dead = drop.flatMap(v => snapshot(spark, root, v).files)
      .distinct.filterNot(live)
    dead.foreach(f => fs.delete(new Path(s"$root/$f"), false))
    drop.foreach(v =>
      fs.delete(new Path(manifestDir(root), vName(v)), false))
    // remove now-empty commit dirs (cosmetic; harmless if it fails)
    fs.listStatus(new Path(s"$root/data")).foreach { d =>
      if (d.isDirectory && !fs.listFiles(d.getPath, true).hasNext)
        fs.delete(d.getPath, true)
    }
    dead
  }

  /** File-level diff between two snapshots: which data files `to`
    * references that `from` did not (added), and vice versa (removed).
    * Pure manifest arithmetic — O(files) driver text, no data IO. */
  final case class ChangeSet(added: Seq[String], removed: Seq[String])

  def changedFiles(spark: SparkSession, root: String,
                   from: Long, to: Long): ChangeSet = {
    require(from <= to, s"from=$from must be <= to=$to")
    val a = snapshot(spark, root, from).files.toSet
    val b = snapshot(spark, root, to).files.toSet
    ChangeSet((b -- a).toSeq.sorted, (a -- b).toSeq.sorted)
  }

  /** Incremental read: the rows of files ADDED between `from`
    * (exclusive) and `to` (inclusive, default latest) — the change
    * feed that lets a downstream pipeline recompute only what a commit
    * touched instead of rescanning the table. Semantics are
    * FILE-level, matching the copy-on-write layout: an append commit
    * yields exactly the appended rows; a merge/delete commit yields
    * the full post-image of every REWRITTEN partition (untouched
    * partitions carry their files by reference, so they never appear).
    * At 100 TB this is the difference between an incremental
    * consumer scanning one commit's files and scanning the table.
    * Row-level deletes are visible as the removed side of
    * [[changedFiles]]; a consumer needing row-level retractions diffs
    * the removed files' keys against the added ones. */
  def readChanges(spark: SparkSession, root: String, from: Long,
                  to: Option[Long] = None): DataFrame = {
    val hi = to.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"$root has no committed version"))
    val added = changedFiles(spark, root, from, hi).added
    require(added.nonEmpty,
      s"no files added between v$from and v$hi of $root")
    // same per-commit-dir relation shape as read(): each commit dir is
    // an internally-consistent hive layout
    added.groupBy(_.split("/")(1)).toSeq.sortBy(_._1)
      .map { case (cdir, files) =>
        spark.read.option("basePath", s"$root/data/$cdir")
          .parquet(files.map(f => s"$root/$f"): _*)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
