package graft.sources.connector

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expressions, GeneralScalarExpression, Literal => V2Literal, NamedReference, Expression => V2Expression}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.sources.{Filter => SFilter}
import org.apache.spark.sql.types.StructType

import graft.sources.Manifest

/** SQL `UPDATE` / `MERGE INTO` / rewrite-shaped `DELETE` on manifest
  * tables, riding Spark's own GROUP-BASED row-level operation
  * machinery (`SupportsRowLevelOperations` → `RewriteUpdateTable` /
  * `RewriteMergeIntoTable` / `RewriteDeleteFromTable` → `ReplaceData`):
  * Spark plans the full post-image of every AFFECTED group as an
  * ordinary query over this operation's scan, writes it through the
  * connector's executor-side parquet writer, and the commit atomically
  * replaces exactly the files the scan planned — untouched files carry
  * forward by reference, history stays time-travelable.
  *
  * The group currency here is the FILE (the finest unit a manifest
  * tracks). Three pruning layers keep "affected" small:
  *
  *  1. STATIC: the command's condition conjuncts are pushed into the
  *     scan builder; a file is skipped when a partition conjunct
  *     evaluates definite-FALSE for its partition tuple, or a zone-map
  *     conjunct cannot match its min/max envelope. (Note the polarity:
  *     group pruning keeps a file on UNKNOWN — the opposite of normal
  *     WHERE pruning — because a kept group is rewritten verbatim,
  *     while a dropped one must provably contain no matching row.)
  *  2. RUNTIME: `SupportsRuntimeV2Filtering` on partition columns —
  *     for MERGE, where the static condition says nothing, Spark runs
  *     the source-side subquery and hands back IN-filters over the
  *     partition columns, so only partitions with matching source rows
  *     are rewritten (the SQL twin of [[Manifest.mergeInto]]'s
  *     touched-tuple discovery).
  *  3. The scan NEVER forwards data filters to the readers: replaced
  *     groups must re-emit every surviving row, so row-group skipping
  *     on the rewrite read would be data loss, not an optimization.
  *
  * Commit-time conflict detection pins the version the rewrite read
  * (`Manifest.commitRewrite`): a concurrent commit fails the operation
  * loudly instead of silently dropping its files.
  *
  * Metadata-only DELETEs never reach this path —
  * `OptimizeMetadataOnlyDeleteFromTable` routes translatable
  * predicates to [[ManifestTable.deleteWhere]] first. */
final class ManifestRowLevelOperation(res: ManifestConnector.Resolved,
                                      cmd: Command)
    extends RowLevelOperation {

  /** The one scan Spark builds for this operation (group discovery and
    * rewrite read share it); its post-runtime-filter file list is what
    * the commit replaces. */
  @volatile private[connector] var builtScan: ManifestCowScan = _

  override def command(): Command = cmd

  override def newScanBuilder(options: org.apache.spark.sql.util
      .CaseInsensitiveStringMap): ScanBuilder =
    new ManifestCowScanBuilder(this, res)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new ManifestReplaceDataWrite(ManifestRowLevelOperation.this,
          res, info.schema())
    }

  override def description(): String =
    s"graft-manifest $cmd copy-on-write ${res.root} v${res.version}"
}

final class ManifestCowScanBuilder(op: ManifestRowLevelOperation,
                                   res: ManifestConnector.Resolved)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = res.fullSchema
  private var groupFilters: Array[SFilter] = Array.empty

  /** The command condition, used ONLY to prune groups — every filter
    * stays residual (returned unchanged, claimed un-pushed), because
    * the rewrite query must see every row of every kept file. */
  override def pushFilters(filters: Array[SFilter]): Array[SFilter] = {
    groupFilters = filters
    filters
  }

  override def pushedFilters(): Array[SFilter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val partCols = res.partCols.toSet
    val surviving = res.files.filter { f =>
      groupFilters.forall { flt =>
        if (ManifestConnector.isPartitionFilter(flt, partCols))
          // keep on TRUE and UNKNOWN; drop only on definite FALSE
          !ManifestConnector.evalPartitionFilter(flt, f.partValues.toMap)
            .contains(false)
        else
          // zone-map: drop only when no row can match (conservative)
          f.stats.forall(st => ManifestConnector.mayMatch(flt, st))
      }
    }
    val scan = new ManifestCowScan(res, surviving, required)
    op.builtScan = scan
    scan
  }
}

/** The copy-on-write rewrite scan: like the ordinary batch scan but
  * (a) it remembers which files it planned, (b) readers get NO pushed
  * filters and no limit (full fidelity — see class doc above), and
  * (c) runtime IN-filters over partition columns shrink the group set
  * before planning. */
final class ManifestCowScan(res: ManifestConnector.Resolved,
                            initial: Seq[ManifestConnector.FileInfo],
                            required: StructType)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var files: Seq[ManifestConnector.FileInfo] = initial

  /** Root-relative paths of the planned (= to-be-replaced) files. */
  private[connector] def plannedRelPaths: Set[String] =
    files.map(_.absPath.stripPrefix(res.root).stripPrefix("/")).toSet

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    res.partCols.map(Expressions.column).toArray

  override def filter(predicates: Array[org.apache.spark.sql.connector
      .expressions.filter.Predicate]): Unit =
    files = files.filter { f =>
      val pv = f.partValues.toMap
      predicates.forall(p => !evalV2(p, pv).contains(false))
    }

  /** Kleene evaluation of the runtime predicates against one file's
    * (string) partition values; None = unknown = keep the file. */
  private def evalV2(e: V2Expression,
                     pv: Map[String, String]): Option[Boolean] = {
    def nameOf(x: V2Expression): Option[String] = x match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }
    def litStr(x: V2Expression): Option[String] = x match {
      case l: V2Literal[_] if l.value != null => Some(l.value.toString)
      case _ => None
    }
    e match {
      case g: GeneralScalarExpression => (g.name, g.children.toSeq) match {
        case ("AND", Seq(l, r)) =>
          (evalV2(l, pv), evalV2(r, pv)) match {
            case (Some(false), _) | (_, Some(false)) => Some(false)
            case (Some(true), Some(true))            => Some(true)
            case _                                   => None
          }
        case ("OR", Seq(l, r)) =>
          (evalV2(l, pv), evalV2(r, pv)) match {
            case (Some(true), _) | (_, Some(true)) => Some(true)
            case (Some(false), Some(false))        => Some(false)
            case _                                 => None
          }
        case ("NOT", Seq(c)) => evalV2(c, pv).map(!_)
        case ("=", Seq(l, r)) =>
          for {
            c <- nameOf(l); v <- litStr(r); x <- pv.get(c)
            if x != null
          } yield x == v
        case ("IN", ref +: lits) if lits.nonEmpty =>
          for {
            c <- nameOf(ref); x <- pv.get(c)
            if x != null
            vs <- Some(lits.map(litStr))
            if vs.forall(_.isDefined)
          } yield vs.flatten.contains(x)
        case ("IS_NULL", Seq(c)) =>
          nameOf(c).flatMap(pv.get).map(_ == null)
        case ("IS_NOT_NULL", Seq(c)) =>
          nameOf(c).flatMap(pv.get).map(_ != null)
        case _ => None
      }
      case _ => None
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    // applicable merge-on-read deletes ride along: a rewrite that
    // re-emitted deleted rows would resurrect them in the replacement
    files.map(f => ManifestInputPartition(f.absPath, f.size,
      f.partValues.toArray, res.deleteSpecsFor(f)): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val entries = conf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    // NO data filters, NO limit: the rewrite read is full-fidelity
    ManifestReaderFactory(entries, required, res.partCols.toArray,
      Array.empty, -1, res.fullSchema,
      files.exists(f => res.deleteSpecsFor(f).nonEmpty))
  }

  override def description(): String =
    s"graft-manifest CoW ${res.root} v${res.version} " +
      s"groups=${files.length}/${res.files.length}"
}

/** The replacement write: executor-staged parquet files, one atomic
  * commit swapping the scanned files for the written ones. */
final class ManifestReplaceDataWrite(op: ManifestRowLevelOperation,
                                     res: ManifestConnector.Resolved,
                                     writeSchema: StructType)
    extends Write {

  override def toBatch: BatchWrite = new BatchWrite {
    private val salt = java.util.UUID.randomUUID().toString.take(8)

    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : DataWriterFactory = {
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val entries = conf.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
      ManifestWriterFactory(entries, res.root, s"rw-$salt", writeSchema,
        res.partCols)
    }

    private def entriesOf(messages: Array[WriterCommitMessage]) =
      messages.toSeq.collect { case m: ManifestWriteMessage => m.entries }
        .flatten.map { case (p, sz) => Manifest.FileEntry(p, Some(sz)) }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val scan = op.builtScan
      require(scan != null,
        "row-level write committed without a planned scan")
      Manifest.commitRewrite(SparkSession.active, res.root, res.version,
        scan.plannedRelPaths, entriesOf(messages), res.partCols)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      val fs = new org.apache.hadoop.fs.Path(res.root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      entriesOf(messages).foreach { e =>
        try fs.delete(
          new org.apache.hadoop.fs.Path(s"${res.root}/${e.path}"), false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  override def description(): String =
    s"graft-manifest replace-data ${res.root} v${res.version}"
}
