package graft

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap

/** Session-scoped temp fixture roots for the registered queries.
  *
  * Lifecycle queries (manifest tables, streaming checkpoints, lake
  * zones) stage corpus-sized fixtures under `java.io.tmpdir`. A bare
  * `Files.createTempDirectory` leaks them past the JVM: a median-of-5
  * bench across three scale factors left O(corpus-size) parquet trees
  * in /tmp per run. Every query-side temp root goes through [[create]]
  * instead, which registers ONE recursive-delete shutdown hook — the
  * roots live exactly as long as the session that built them.
  *
  * [[memoized]] additionally keys a root by (prefix, key) so a
  * deterministic fixture (e.g. q233's two-snapshot drift table, keyed
  * by the data dir) is built ONCE per session and re-read by later
  * invocations — the artifact-serving convention the tokenizer's
  * mergeCache already follows.
  */
object TempRoots {

  private val created = ConcurrentHashMap.newKeySet[Path]()
  private val memo = new ConcurrentHashMap[(String, String), String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.forEach { p =>
        try {
          if (Files.exists(p))
            Files.walk(p).sorted(Comparator.reverseOrder[Path]())
              .forEach(f => { try Files.delete(f) catch { case _: Exception => () } })
        } catch { case _: Exception => () }
      }, "graft-temp-roots-cleanup"))
  }

  /** A fresh temp directory, recursively deleted at JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Build-once-per-session root: the first caller for (prefix, key)
    * runs `build` against a fresh [[create]] root; later callers get
    * the same path back and just re-read what it holds. */
  def memoized(prefix: String, key: String)(build: String => Unit): String =
    memo.computeIfAbsent((prefix, key), { _ =>
      val root = create(prefix)
      build(root)
      root
    })
}
