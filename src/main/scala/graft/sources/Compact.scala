package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-maintenance compaction (north-star mandate: "batch ETL,
  * queries, and compaction"). Event-driven ingest — one object per
  * `POST /data`, one file per micro-batch — accretes small files until
  * listing and task-scheduling overhead dominates scans. Compaction
  * rewrites a dataset directory into ~`targetBytes` files.
  *
  * Shape: one read + one `repartition(n)` (round-robin exchange — the
  * only way to get even output sizes from skewed inputs) + one
  * overwrite into a staging dir, then an atomic-ish directory swap.
  * At 100 TB you compact per PARTITION directory (dataType/date), not
  * the whole table — `compactPartitions` drives that loop so each
  * partition's rewrite is independent and restartable.
  *
  * Every control-plane file op goes through the Hadoop FileSystem API
  * (never java.io/java.nio), so the identical code runs against
  * file://, hdfs:// or s3a:// roots — the reference lake is S3-backed.
  * Note for object stores: `rename` is O(1) on HDFS/local but
  * copy+delete on plain S3A, so the swap window is wider there; a real
  * S3 deployment pairs this with a manifest commit (SURVEY §7).
  */
object Compact {

  private def fsOf(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(SparkSession.active.sessionState.newHadoopConf()), p)
  }

  /** Recursive file listing (empty when the path is absent). */
  private def walkFiles(fs: FileSystem, p: Path) = {
    val out = ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) out += it.next()
    }
    out.toSeq
  }

  private def deleteRecursively(fs: FileSystem, p: Path): Unit =
    if (fs.exists(p)) fs.delete(p, true)

  private def mustRename(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst), s"rename $src -> $dst failed")

  private def dirBytes(fs: FileSystem, p: Path): Long =
    walkFiles(fs, p).map(_.getLen).sum

  def dataFileCount(dir: String): Int = {
    val (fs, p) = fsOf(dir)
    walkFiles(fs, p).count { f =>
      val n = f.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc")
    }
  }

  /** Compact one parquet dataset directory to ~targetBytes per file.
    * Returns (filesBefore, filesAfter). */
  def compactPath(spark: SparkSession, dir: String,
                  targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    // Self-heal from a crash mid-swap: the swap below guarantees a
    // complete copy always exists on disk, but a crash between the two
    // moves leaves it under __backup with no live dir — restore it
    // before compacting instead of failing the read. A stale staging
    // dir from any crash is dead weight either way; clear it.
    val (fs, live) = fsOf(dir)
    val bak = new Path(dir + "__backup")
    if (!fs.exists(live) && fs.exists(bak)) mustRename(fs, bak, live)
    deleteRecursively(fs, new Path(dir + "__compacting"))
    val before = dataFileCount(dir)
    val bytes = dirBytes(fs, live)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val staging = dir + "__compacting"
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(staging)
    // Crash-safe swap: every intermediate state keeps a COMPLETE copy
    // on disk. Rename the live dir aside as a backup, rename staging
    // into place, only then delete the backup — a crash between any
    // two steps leaves either the original (under dir or __backup) or
    // the compacted output fully intact, never a half-empty directory.
    deleteRecursively(fs, bak) // stale backup from a prior crash
    mustRename(fs, live, bak)
    mustRename(fs, new Path(staging), live)
    deleteRecursively(fs, bak)
    (before, dataFileCount(dir))
  }

  /** Compact every leaf partition directory of a hive-layout table
    * independently (the 100 TB path: per-partition jobs, restartable,
    * no global rewrite). A leaf = a directory containing data files. */
  def compactPartitions(spark: SparkSession, root: String,
                        targetBytes: Long = 128L * 1024 * 1024)
      : Seq[(String, Int, Int)] = {
    val (fs, rootP) = fsOf(root)
    val leaves = ArrayBuffer.empty[Path]
    def walk(d: Path): Unit = {
      val children = fs.listStatus(d)
      if (children.exists(c =>
          c.isFile && c.getPath.getName.endsWith(".parquet")))
        leaves += d
      children.filter(_.isDirectory).foreach(c => walk(c.getPath))
    }
    walk(rootP)
    val rootUri = rootP.toUri.getPath
    leaves.toSeq.map { d =>
      val (b, a) = compactPath(spark, d.toString, targetBytes)
      val rel = d.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      (rel, b, a)
    }
  }
}
