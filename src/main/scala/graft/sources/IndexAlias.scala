package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** INDEX ALIAS — the Elasticsearch alias-swap analog (reference scope:
  * the OpenSearch tier, lambda-function.py:108-172; ES reindexes behind
  * an alias so clients never address a physical index): a NAMED REF
  * that resolves to an index table's root path and is repointed
  * ATOMICALLY, enabling zero-downtime reindex — build the replacement
  * index at a NEW root while the old one keeps serving, then swap.
  *
  * Within one table, [[Manifest.commitReplace]] is already an atomic
  * in-place rebuild; the alias is the cross-TABLE generation of that
  * move — what you need when the rebuild changes parameters the table
  * pins at create time (bucket count, positions, analyzer) or must be
  * validated before any query sees it.
  *
  * MECHANICS — the manifest layer's own claim primitive: the alias is
  * a directory of numbered generation files (`a00000001.txt` → target
  * path), each written with the O_EXCL exclusive-create every manifest
  * commit goes through, so two concurrent swaps can never both claim a
  * generation (loser fails loudly, exactly like a lost commit race);
  * the CURRENT target is the highest generation — one directory
  * listing, and the full history stays auditable. A reader resolves
  * once per query and the serving path then pins BOTH the index root
  * and its version ([[SearchIndex]]'s `Serving`), so a query sees the
  * old index or the new one in their entirety — never a mix, even
  * mid-swap.
  *
  * Scale: resolution is one metadata listing (no data IO); the swap is
  * one ~100-byte file create. Generations are never rewritten. */
object IndexAlias {

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) =
    Manifest.fsOf(spark, dir) // one FS-resolution helper for sources/

  private def genName(g: Long) = f"a$g%08d.txt"

  // The O_EXCL create makes the CLAIM atomic but the file is visible
  // (empty) before its content lands, and a crash can leave it that
  // way forever. So a generation only COMMITS once its content ends
  // with this fence line (the manifest layer's #count-fence idiom):
  // readers skip unfenced generations — they keep serving the previous
  // target through the swap window, and a crashed swap is simply a
  // dead number the next set() skips past, never a bricked alias.
  private val Fence = "#ok"

  private def generations(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).iterator.map(_.getPath.getName)
      .collect { case n if n.matches("a\\d{8}\\.txt") =>
        n.substring(1, 9).toLong
      }.toSeq.sorted

  /** The generation's target if its fence landed; None for a torn or
    * in-flight write. */
  private def readGen(fs: FileSystem, root: Path,
                      g: Long): Option[String] = {
    val in = fs.open(new Path(root, genName(g)))
    val txt =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val lines = txt.split("\n", -1)
    if (lines.length >= 2 && lines(1) == Fence) Some(lines(0)) else None
  }

  /** Point the alias at `target` (an index table root). The first call
    * creates the alias; later calls are the atomic swap. Returns the
    * claimed generation. Fails loudly if a concurrent swap claimed the
    * same generation (re-read and retry — same contract as a lost
    * manifest-commit race) or if `target` is not an initialized
    * manifest table. */
  def set(spark: SparkSession, aliasRoot: String, target: String): Long = {
    require(!target.contains("\n"), "target path must be one line")
    require(Manifest.latestVersion(spark, target).nonEmpty,
      s"alias target $target is not an initialized table")
    val (fs, root) = fsOf(spark, aliasRoot)
    fs.mkdirs(root)
    val next = generations(fs, root).lastOption.getOrElse(0L) + 1
    val out =
      try Manifest.createExclusive(fs, new Path(root, genName(next)))
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"alias swap conflict: generation $next of $aliasRoot was " +
              "claimed concurrently; re-resolve and retry")
      }
    try out.write((target + "\n" + Fence + "\n").getBytes("UTF-8"))
    finally out.close()
    next
  }

  /** The index root the alias currently points at: the highest FENCED
    * generation — an in-flight or crashed swap's unfenced file is
    * invisible, so readers stay on the previous target until the new
    * one fully lands. */
  def resolve(spark: SparkSession, aliasRoot: String): String = {
    val (fs, root) = fsOf(spark, aliasRoot)
    val gens = generations(fs, root)
    if (gens.isEmpty)
      throw new IllegalStateException(s"$aliasRoot is not an alias " +
        "(no generations) — IndexAlias.set it first")
    gens.reverseIterator.flatMap(readGen(fs, root, _))
      .nextOption().getOrElse(
        throw new IllegalStateException(s"$aliasRoot has no committed " +
          "generation (every swap crashed before its fence landed) — " +
          "run IndexAlias.set to repoint it"))
  }

  /** Full audit trail: (generation, target), ascending; torn
    * generations are skipped. */
  def history(spark: SparkSession, aliasRoot: String)
      : Seq[(Long, String)] = {
    val (fs, root) = fsOf(spark, aliasRoot)
    generations(fs, root).flatMap(g =>
      readGen(fs, root, g).map((g, _)))
  }

  /** BM25 through the alias — resolve once, then the standard pinned
    * serving path. One resolution per query: a swap between two
    * queries flips them from old to new wholesale. */
  def searchBm25(spark: SparkSession, aliasRoot: String, query: String,
                 k: Int, k1: Double = 1.2, b: Double = 0.75,
                 requireAll: Boolean = false): DataFrame =
    SearchIndex.searchBm25(spark, resolve(spark, aliasRoot), query, k,
      k1, b, requireAll)

  /** ANN through the alias — the target machinery is generic (an
    * alias resolves to a ROOT; nothing text-specific), so the dense
    * index gets the same zero-downtime re-train-and-swap story:
    * rebuild a [[VectorIndex]] with fresh pivots / different nCells at
    * a new root, validate, swap. */
  def searchVector(spark: SparkSession, aliasRoot: String,
                   queryVec: Array[Double], k: Int, nProbe: Int,
                   filter: Option[org.apache.spark.sql.Column] = None)
      : DataFrame =
    VectorIndex.search(spark, resolve(spark, aliasRoot), queryVec, k,
      nProbe, filter)
}
