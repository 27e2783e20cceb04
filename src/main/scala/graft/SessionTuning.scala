package graft

import org.apache.spark.sql.SparkSession

/** Session-level performance settings shared by the [[Bench]] and
  * [[Verify]] mains (round-19 optimization pass; measured evidence in
  * OPTIMIZATION_r19.md).
  *
  * All three knobs are HOST knobs, not plan knobs: they change where
  * scratch bytes land and how much generated code the JVM may cache /
  * share, never what any query computes — and each is overridable so a
  * different deployment sizes them to its own hardware and tenancy.
  *
  *  - `spark.sql.codegen.cache.maxEntries` (default 100): a session
  *    that executes hundreds of distinct physical plans — this bench's
  *    256 queries, the multi-wave streaming pipelines whose per-wave
  *    literals (batch ids, gate scalars) produce fresh generated
  *    source every wave — blows through a 100-entry LRU and re-runs
  *    Janino constantly. Stack-sampling q246 showed ~37% of active
  *    executor samples inside `CodeGenerator.compile`. 8192 entries
  *    (~a few KB of bytecode each, bounded tens of MB) keeps every
  *    warm plan cached; measured q246 median 21.8 → 16.6 s combined
  *    with the scratch move below. Production serving sessions have
  *    the same many-plans profile, so the setting is not a local-mode
  *    trick; it IS JVM-memory-sized, hence the env override.
  *  - `spark.local.dir`: shuffle blocks, block-manager spill and
  *    broadcast scratch. The bench host's /tmp is the same spinning
  *    device the lake fixtures hammer; RAM-backed /dev/shm removes
  *    that contention for the (tiny, bounded) shuffle scratch of a
  *    local run. On a production cluster this is the standard
  *    "shuffle on the fast local device" placement (NVMe/ramdisk) —
  *    set SPARK_GRAFT_LOCAL_DIR to size it to the deployment; unset
  *    AND no usable /dev/shm falls back to Spark's default.
  *
  * Explicit `-Dspark.*` system properties win over both defaults (the
  * SparkConf load order already honors them; we only fill gaps).
  */
object SessionTuning {

  /** Apply the tuned defaults to `b`, skipping any key the caller
    * already pinned via system property (spark-submit --conf / -D). */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = {
    var out = b
    if (!sys.props.contains("spark.sql.codegen.cache.maxEntries"))
      out = out.config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
    // Spark 4's codegen cache is keyed by (weak classloader, source):
    // every StreamingQuery run executes on a CLONED session whose
    // artifact manager gets a fresh isolated classloader, so each
    // stream start() re-Janino-compiles every plan it runs — measured
    // 96-211 recompiles PER REP on the multi-wave streaming queries
    // (q218/q230/q246), none on batch queries. This JVM is
    // single-tenant (no session-scoped artifacts are ever added), so
    // isolation buys nothing here; disabling it makes the cloned
    // sessions share the base classloader and the compile counts drop
    // to zero (q218 median 10.4 → 8.9 s). A multi-tenant Connect
    // server should leave it on — hence the sys-prop escape hatch.
    if (!sys.props.contains("spark.sql.artifact.isolation.enabled"))
      out = out.config("spark.sql.artifact.isolation.enabled", "false")
    // Local `file://` IO without per-file chmod forks or `.crc` shadow
    // files (see NoForkLocalFileSystem's scaladoc for the measured
    // fork counts). Scheme-scoped: only local-FS fixtures/scratch are
    // affected; HDFS/S3 deployments never resolve these classes.
    if (!sys.props.contains("spark.hadoop.fs.file.impl"))
      out = out.config("spark.hadoop.fs.file.impl",
        "graft.hadoop.NoForkLocalFileSystem")
    if (!sys.props.contains("spark.hadoop.fs.AbstractFileSystem.file.impl"))
      out = out.config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.hadoop.NoForkLocalFs")
    if (!sys.props.contains("spark.local.dir")) {
      // Size-guarded (round-19 advice): tmpfs scratch is only selected
      // when /dev/shm has comfortable headroom for a LOCAL bench's
      // bounded shuffle/spill footprint (default 8 GiB, env-tunable).
      // A host whose tmpfs is small — or a real workload whose spill
      // exceeds RAM — falls back to Spark's default /tmp placement
      // instead of filling RAM-backed storage until ENOSPC/OOM.
      val minBytes = sys.env.get("SPARK_GRAFT_SHM_MIN_GB")
        .flatMap(g => scala.util.Try(g.toDouble).toOption)
        .getOrElse(8.0) * (1L << 30)
      val dir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite &&
            shm.getUsableSpace >= minBytes)
          Some("/dev/shm/graft-spark-scratch")
        else None
      }
      dir.foreach { d =>
        val f = new java.io.File(d)
        // sweep stale scratch from crash-killed runs: those spark-*/
        // blockmgr-* trees hold RAM on tmpfs until removed (only our
        // own scratch root is touched, and only when no other live
        // Spark process could own it — best effort, ignore races)
        if (f.isDirectory && d.endsWith("graft-spark-scratch"))
          sweepStale(f)
        f.mkdirs()
        out = out.config("spark.local.dir", d)
      }
    }
    out
  }

  /** Remove scratch subtrees older than one hour (modification time of
    * the top-level entry) — a live run touches its dirs constantly,
    * while a crash-killed run's tree goes stale immediately. */
  private def sweepStale(root: java.io.File): Unit = try {
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.lastModified() < cutoff) deleteRec(f)
    }
  } catch { case _: Throwable => () }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
    ()
  }
}
