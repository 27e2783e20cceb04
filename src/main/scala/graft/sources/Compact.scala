package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

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
  * partition's rewrite is independent and restartable. */
object Compact {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  private def dirBytes(p: Path): Long =
    Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  def dataFileCount(dir: String): Int = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0
    else Files.walk(p).iterator().asScala.count { f =>
      val n = f.getFileName.toString
      Files.isRegularFile(f) && !n.startsWith("_") && !n.startsWith(".") &&
        !n.endsWith(".crc")
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
    val live = Paths.get(dir)
    val bak = Paths.get(dir + "__backup")
    if (!Files.exists(live) && Files.exists(bak)) Files.move(bak, live)
    deleteRecursively(Paths.get(dir + "__compacting"))
    val before = dataFileCount(dir)
    val bytes = dirBytes(Paths.get(dir))
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val staging = dir + "__compacting"
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(staging)
    // Crash-safe swap: every intermediate state keeps a COMPLETE copy
    // on disk. Rename the live dir aside as a backup, rename staging
    // into place, only then delete the backup — a crash between any
    // two steps leaves either the original (under dir or __backup) or
    // the compacted output fully intact, never a half-empty directory.
    val target = Paths.get(dir)
    val backup = Paths.get(dir + "__backup")
    deleteRecursively(backup) // stale backup from a prior crash
    Files.move(target, backup)
    Files.move(Paths.get(staging), target)
    deleteRecursively(backup)
    (before, dataFileCount(dir))
  }

  /** Compact every leaf partition directory of a hive-layout table
    * independently (the 100 TB path: per-partition jobs, restartable,
    * no global rewrite). A leaf = a directory containing data files. */
  def compactPartitions(spark: SparkSession, root: String,
                        targetBytes: Long = 128L * 1024 * 1024)
      : Seq[(String, Int, Int)] = {
    val rootP = Paths.get(root)
    val leaves = Files.walk(rootP).iterator().asScala
      .filter(Files.isDirectory(_))
      .filter { d =>
        Files.list(d).iterator().asScala.exists(f =>
          Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))
      }
      .toSeq
    leaves.map { d =>
      val (b, a) = compactPath(spark, d.toString, targetBytes)
      (rootP.relativize(d).toString, b, a)
    }
  }
}
