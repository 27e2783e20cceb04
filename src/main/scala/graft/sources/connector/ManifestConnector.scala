package graft.sources.connector

import java.util.OptionalLong

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type => PType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, Write, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.sources.{Filter => SFilter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Manifest

/** DataSourceV2 connector over [[graft.sources.Manifest]] tables:
  *
  * {{{
  *   spark.read.format("graft-manifest")
  *     .option("version", 2)          // optional time travel; default latest
  *     .load(root)
  * }}}
  *
  * This is the idiomatic Spark surface for the manifest layer — the
  * reference exposes its lake through a Glue-registered table that
  * Athena queries by name (reference:
  * terraform-Infrastructure-provisioning/aws-data-lake-terraform-main.tf,
  * Glue catalog + crawler blocks); here the table format itself is ours,
  * so the connector implements the full V2 read contract instead of
  * delegating to a crawler:
  *
  *  - '''Manifest-level partition pruning''': filters over hive
  *    partition columns (parsed from the snapshot's file paths) are
  *    consumed on the driver — pruned files are never planned, so a
  *    `lang = 'de'` scan of a 100 TB table plans only `lang=de` files.
  *    This is metadata-only work, O(|files|) strings.
  *  - '''Column pruning''' (`SupportsPushDownRequiredColumns`): the
  *    per-file parquet projection contains exactly the requested
  *    columns — unread columns cost zero IO (columnar format).
  *  - '''Filter pushdown''' (`SupportsPushDownFilters`): data-column
  *    predicates translate to parquet `FilterPredicate`s evaluated by
  *    the parquet library against row-group statistics (skips whole
  *    row groups) and at record level. They are ALSO returned as
  *    residuals so Spark re-evaluates them — the pushdown is a pure
  *    IO-skip optimization and can never change results.
  *  - '''Limit pushdown''' (`SupportsPushDownLimit`): per-reader row
  *    cap; Spark still applies the global limit.
  *  - '''Statistics''' (`SupportsReportStatistics`): `sizeInBytes` is
  *    the byte sum of the files that SURVIVE pruning, so a pruned
  *    manifest scan under a join becomes broadcast-eligible exactly
  *    when its surviving bytes fit the threshold.
  *  - '''Snapshot isolation / time travel''': the planned file set is
  *    frozen from one manifest version at `inferSchema` time;
  *    concurrent commits are invisible to a running query.
  *
  * Scope (declared, not silently wrong): data columns are limited to
  * parquet primitives (boolean/int32/int64/float/double/UTF8
  * string/binary) — nested and repeated groups throw at schema
  * inference. Partition columns surface as strings, exactly as they
  * appear in the path (hive-unescaped); cast in the query when a
  * numeric partition key is wanted. Schema = the NEWEST commit's file
  * schema (the manifest layer's evolution contract, q112): columns
  * absent from older commits' files read back as NULL.
  *
  * 100 TB posture: planning reads one manifest (O(files) driver text,
  * schema from its header); each task reads exactly one data file. No
  * shuffle, no driver data IO. Scans with data columns decode through
  * Spark's own vectorized parquet reader as `ColumnarBatch`es
  * ([[ManifestColumnarReader]]); the row-oriented `Group` path remains
  * only for the footer-count fast path and pushed limits.
  */
class ManifestDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  // inferSchema + getTable are called back-to-back with the same
  // options; cache the (driver-side, metadata-only) resolution.
  @volatile private var cached: Option[(Map[String, String],
    ManifestConnector.Resolved)] = None

  private def resolved(opts: Map[String, String])
      : ManifestConnector.Resolved = cached match {
    case Some((k, r)) if k == opts => r
    case _ =>
      val r = ManifestConnector.resolve(SparkSession.active, opts)
      cached = Some((opts, r))
      r
  }

  private def optMap(o: CaseInsensitiveStringMap): Map[String, String] =
    o.asCaseSensitiveMap().asScala.toMap.map { case (k, v) =>
      k.toLowerCase -> v }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = optMap(options)
    val base = resolved(opts).fullSchema
    if (opts.get("cdc").contains("true"))
      ManifestConnector.cdcSchema(base)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = properties.asScala.toMap.map { case (k, v) =>
      k.toLowerCase -> v }
    ManifestTable(resolved(opts), cdc = opts.get("cdc").contains("true"))
  }
}

/** Driver-side resolution + shared helpers (path parsing, parquet⇄Spark
  * schema bridging, filter translation). */
object ManifestConnector {

  /** Columns a CDC stream appends to the table schema: what happened
    * and at which commit. Values are injected per input partition
    * through the constant-column machinery — never read from files. */
  val cdcMetaFields: Array[org.apache.spark.sql.types.StructField] =
    Array(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = true))

  /** A CDC read's schema: every table column forced NULLABLE (delete
    * rows carry NULL for everything but the key columns — a
    * non-nullable declaration would silently decode those NULLs as
    * zero/empty) plus the meta columns. */
  def cdcSchema(base: StructType): StructType =
    StructType(base.fields.map(_.copy(nullable = true)) ++ cdcMetaFields)

  /** Metadata columns a batch read can select (`SELECT _file,
    * _commit_version FROM t`): row-level lineage, injected per input
    * partition through the constant-column machinery. Hidden unless
    * referenced; not advertised in CDC mode (whose schema already
    * owns `_commit_version` as a REAL column). */
  val metadataColumnFields: Array[org.apache.spark.sql.types.StructField] =
    Array(
      org.apache.spark.sql.types.StructField("_file",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = true))

  final case class FileInfo(absPath: String, size: Long,
                            partValues: Seq[(String, String)],
                            stats: Option[graft.sources.ManifestStats
                              .FileStats] = None,
                            seq: Long = 0L)

  /** `declared` = the manifest's schema header (present for every
    * table the current writer produced): column order and partition
    * column TYPES come from it. Legacy manifests without the header
    * fall back to footer-derived data schema + string partition
    * columns appended last. */
  final case class Resolved(root: String, version: Long,
                            files: Seq[FileInfo], partCols: Seq[String],
                            dataSchema: StructType,
                            declared: Option[StructType] = None,
                            deletes: Seq[Manifest.DeleteEntry] = Nil,
                            branch: Option[String] = None,
                            tableMeta: Map[String, String] = Map.empty) {
    /** Merge-on-read delete files applying to `f` (strictly newer than
      * the file's data sequence), as executor-shippable specs. */
    def deleteSpecsFor(f: FileInfo): Array[DeleteFileSpec] =
      deletes.filter(_.seq > f.seq).map(d =>
        DeleteFileSpec(graft.sources.Manifest.absEntryPath(root, d.path),
          d.keyCols.toArray)).toArray
    val fullSchema: StructType = declared.getOrElse(
      StructType(dataSchema.fields ++
        partCols.map(c => StructField(c, StringType, nullable = true))))
  }

  /** Partition path string → typed value for the declared partition
    * column type (executor-side; the connector's partition-type
    * scope). */
  def castPartitionValue(v: String, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType  => UTF8String.fromString(v)
      case IntegerType => v.toInt
      case LongType    => v.toLong
      case DoubleType  => v.toDouble
      case FloatType   => v.toFloat
      case BooleanType => v.toBoolean
      case other => throw new IllegalArgumentException(
        s"graft-manifest does not support partition column type " +
          s"${other.catalogString}")
    }

  /** Hive path-escaping inverse — shared with the manifest DML layer
    * ([[graft.sources.Manifest.unescapePathName]]). */
  def unescapePathName(s: String): String = Manifest.unescapePathName(s)

  /** `data/c00000001-ab12/lang=de/part-0.parquet` → Seq(lang -> de).
    * Null partitions (`__HIVE_DEFAULT_PARTITION__`) map to null.
    * Shared with the manifest DML layer. */
  def partValuesOf(relPath: String): Seq[(String, String)] =
    Manifest.partValuesOf(relPath)

  /** Parquet primitive → Spark type; throws on anything the connector
    * does not cover (declared scope, not silent misreads). */
  def sparkTypeOf(t: PType): DataType = {
    require(t.isPrimitive && !t.isRepetition(PType.Repetition.REPEATED),
      s"graft-manifest supports flat primitive columns only, got $t")
    val p = t.asPrimitiveType()
    p.getPrimitiveTypeName match {
      case BOOLEAN => BooleanType
      case INT32
        if p.getLogicalTypeAnnotation ==
          LogicalTypeAnnotation.dateType() => DateType
      case INT32   => IntegerType
      case INT64
        if p.getLogicalTypeAnnotation ==
          LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS) => TimestampType
      case INT64   => LongType
      case INT96   => TimestampType // Spark's default timestamp encoding
      case FLOAT   => FloatType
      case DOUBLE  => DoubleType
      case BINARY
        if p.getLogicalTypeAnnotation ==
          LogicalTypeAnnotation.stringType() => StringType
      case BINARY  => BinaryType
      case other => throw new IllegalArgumentException(
        s"graft-manifest does not support parquet type $other " +
          s"(column ${t.getName})")
    }
  }

  /** Resolve root+version → frozen file list, partition layout and the
    * newest commit's data schema. Metadata-only: one manifest read, one
    * recursive listing per live commit dir, one parquet footer. */
  private def supportedDataType(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BinaryType | TimestampType |
         DateType => true
    case _ => false
  }

  def resolve(spark: SparkSession, opts: Map[String, String]): Resolved = {
    val root = opts.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest needs a load(path) pointing at a manifest table root"))
    // option keys arrive lowercased (CaseInsensitiveStringMap)
    require(Seq("version", "timestampasof", "stage", "branch")
        .count(opts.contains) <= 1,
      "give at most one of version, timestampAsOf, stage, branch")
    // `VERSION AS OF 'branch:name'` reads a branch head through SQL —
    // the version slot is the only channel SQL time travel carries
    val branchOpt: Option[String] = opts.get("branch").orElse(
      opts.get("version").collect {
        case v if v.startsWith("branch:") => v.stripPrefix("branch:") })
    // the CDC feed resolves MAIN-CHAIN manifests by version number; a
    // branch's version numbers live on its own chain, so combining the
    // two would silently serve main's changes as the branch's
    require(!(branchOpt.isDefined && opts.contains("cdc")),
      "option(branch) cannot combine with cdc: the change feed is " +
        "defined over the main version chain")
    val snap = (opts.get("stage"), branchOpt) match {
      case (Some(id), _) => // audit read of an unpublished staged commit
        Manifest.stageMeta(spark, root, id)
      case (_, Some(name)) => // branch head (writable fork)
        Manifest.branchMeta(spark, root, name)
      case _ =>
        val version = opts.get("version")
          .map(Manifest.resolveVersion(spark, root, _)) // number or tag
          .orElse(opts.get("timestampasof").map(ts =>
            Manifest.versionAt(spark, root, ts.toLong)))
          .orElse(Manifest.latestVersion(spark, root))
          .getOrElse(throw new IllegalStateException(
            s"$root has no committed manifest version"))
        Manifest.snapshotMeta(spark, root, version)
    }
    val version = snap.version

    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val rootUri = fs.makeQualified(rootPath).toUri.getPath

    // sizes come straight from the manifest (files are immutable, so
    // the commit-time length is exact) — zero filesystem calls. Only
    // pre-size-format manifests fall back to one recursive listing per
    // commit dir.
    val sizes: Map[String, Long] =
      if (snap.entries.forall(_.size.isDefined))
        snap.entries.map(e => e.path -> e.size.get).toMap
      else snap.files.map(_.split("/")(1)).distinct.flatMap { cdir =>
        val wanted = snap.files.toSet
        val it = fs.listFiles(new Path(s"$root/data/$cdir"), true)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long)]
        while (it.hasNext) {
          val st = it.next()
          val rel = st.getPath.toUri.getPath
            .stripPrefix(rootUri).stripPrefix("/")
          if (wanted.contains(rel)) buf += rel -> st.getLen
        }
        buf
      }.toMap

    val files = snap.entries.map { e =>
      FileInfo(graft.sources.Manifest.absEntryPath(root, e.path),
        sizes.getOrElse(e.path, 0L),
        partValuesOf(e.path), e.fileStats, e.dataSeq)
    }
    // partition layout must be UNIFORM across the snapshot's files: a
    // single odd file would otherwise silently miss every partition
    // filter (dropped rows, no error). Heterogeneous layouts fail
    // loudly at resolve time; rewrite (commitReplace) to converge.
    val layouts = files.map(_.partValues.map(_._1)).distinct
    require(layouts.size <= 1,
      s"graft-manifest: mixed partition layouts across commits of " +
        s"$root v$version: " +
        layouts.map(_.mkString("[", ",", "]")).mkString(" vs ") +
        " — rewrite older commits (commitReplace) before reading " +
        "through the connector")

    snap.schema match {
      case Some(full) =>
        // schema header = zero parquet footer reads at planning time;
        // validate the connector's declared scope (flat primitives)
        full.fields.foreach { f =>
          require(supportedDataType(f.dataType),
            s"graft-manifest supports flat primitive columns only; " +
              s"column ${f.name} is ${f.dataType.catalogString}")
        }
        val partCols = snap.partCols.getOrElse(Nil)
        partCols.foreach { c =>
          val dt = full(c).dataType
          require(dt match {
            case StringType | IntegerType | LongType | DoubleType |
                 FloatType | BooleanType => true
            case _ => false
          }, s"graft-manifest does not support partition column type " +
            s"${dt.catalogString} (column $c)")
        }
        require(layouts.isEmpty || layouts == Seq(partCols),
          s"graft-manifest: mixed partition layouts — files of $root " +
            s"v$version are laid out as " +
            layouts.map(_.mkString("[", ",", "]")).mkString(" vs ") +
            s" but the manifest declares ${partCols.mkString("[", ",", "]")}")
        val dataSchema = StructType(
          full.filterNot(f => partCols.contains(f.name)))
        Resolved(root, version, files, partCols, dataSchema, Some(full),
          snap.deletes, branchOpt, snap.meta)

      case None =>
        // legacy manifest: derive the layout from paths and the data
        // schema from the newest commit's first footer
        require(snap.files.nonEmpty,
          s"version $version of $root lists no files")
        val partCols = layouts.headOption.getOrElse(Nil)
        val newestCommit = snap.files.map(_.split("/")(1)).max
        val schemaFile = snap.files.filter(_.split("/")(1) == newestCommit)
          .min
        val in = HadoopInputFile.fromPath(
          new Path(s"$root/$schemaFile"), conf)
        val reader = ParquetFileReader.open(in)
        val msg = try reader.getFileMetaData.getSchema finally reader.close()
        val dataSchema = StructType(msg.getFields.asScala.toSeq.map { f =>
          StructField(f.getName, sparkTypeOf(f),
            nullable = !f.isRepetition(PType.Repetition.REQUIRED))
        })
        Resolved(root, version, files, partCols, dataSchema,
          branch = branchOpt, tableMeta = snap.meta)
    }
  }

  /** Can this filter be decided from partition values alone (and is it
    * a shape we evaluate)? Strict: unknown shapes are NOT consumed. */
  def isPartitionFilter(f: SFilter, partCols: Set[String]): Boolean =
    f.references.nonEmpty && f.references.forall(partCols.contains) &&
      partitionEvaluable(f)

  private def partitionEvaluable(f: SFilter): Boolean = f match {
    case EqualTo(_, v)       => v != null
    case EqualNullSafe(_, _) => true
    case In(_, vs)           => vs != null
    case IsNotNull(_)        => true
    case IsNull(_)           => true
    case And(l, r) => partitionEvaluable(l) && partitionEvaluable(r)
    case Or(l, r)  => partitionEvaluable(l) && partitionEvaluable(r)
    case Not(c)    => partitionEvaluable(c)
    case _ => false
  }

  /** Kleene three-valued evaluation of a partition filter against one
    * file's partition values: `Some(true/false)` when decided, `None`
    * when the comparison is NULL (unknown). Partition filters are fully
    * CONSUMED by the pushdown (never re-evaluated by Spark), so pruning
    * must implement exact WHERE semantics: a file survives only on
    * `Some(true)` — unknown drops it, exactly as a WHERE clause drops
    * NULL rows. Two-valued evaluation here would keep a
    * `__HIVE_DEFAULT_PARTITION__` file under `Not(EqualTo)` (NOT of
    * "false") where SQL's NULL != v is unknown → row dropped. */
  def evalPartitionFilter(f: SFilter,
                          pv: Map[String, String]): Option[Boolean] =
    f match {
      case EqualTo(c, v) => pv.get(c).flatMap(x =>
        if (x == null) None else Some(x == v.toString))
      case EqualNullSafe(c, v) => pv.get(c).map(x =>
        if (v == null) x == null else x != null && x == v.toString)
      case In(c, vs) => pv.get(c).flatMap { x =>
        if (x == null) None
        else if (vs.exists(v => v != null && x == v.toString)) Some(true)
        else if (vs.contains(null)) None // x IN (..., NULL) miss = unknown
        else Some(false)
      }
      case IsNotNull(c) => pv.get(c).map(_ != null)
      case IsNull(c)    => pv.get(c).map(_ == null)
      case And(l, r) =>
        (evalPartitionFilter(l, pv), evalPartitionFilter(r, pv)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true))            => Some(true)
          case _                                   => None
        }
      case Or(l, r) =>
        (evalPartitionFilter(l, pv), evalPartitionFilter(r, pv)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false))        => Some(false)
          case _                                 => None
        }
      case Not(c) => evalPartitionFilter(c, pv).map(!_)
      case _ => None // unreachable: gated by partitionEvaluable
    }

  /** Conservative "can any row of a file with these stats satisfy this
    * pushed data filter?" — the manifest zone-map skip
    * ([[graft.sources.ManifestStats]]). Files it rejects are never
    * planned; unknown shapes answer true, and pushed filters are
    * residual-re-evaluated by Spark, so this is purely an IO skip. */
  def mayMatch(f: SFilter,
               st: graft.sources.ManifestStats.FileStats): Boolean = {
    import graft.sources.ManifestStats._
    f match {
      case EqualTo(c, v) if v != null       => mayEqual(st, c, v)
      case EqualNullSafe(c, null)           => mayBeNull(st, c)
      case EqualNullSafe(c, v)              => mayEqual(st, c, v)
      case GreaterThan(c, v) if v != null   => mayCompare(st, c, "gt", v)
      case GreaterThanOrEqual(c, v) if v != null =>
        mayCompare(st, c, "ge", v)
      case LessThan(c, v) if v != null      => mayCompare(st, c, "lt", v)
      case LessThanOrEqual(c, v) if v != null =>
        mayCompare(st, c, "le", v)
      case In(c, vs) if vs != null =>
        vs.exists(v => v != null && mayEqual(st, c, v))
      case IsNull(c)    => mayBeNull(st, c)
      case IsNotNull(c) => mayBeNonNull(st, c)
      case And(l, r)    => mayMatch(l, st) && mayMatch(r, st)
      case Or(l, r)     => mayMatch(l, st) || mayMatch(r, st)
      case _ => true
    }
  }

  /** V2 connector `Expression` → `Column`, for routing SQL DML
    * (`DELETE FROM ... WHERE`) into the manifest layer's copy-on-write
    * [[graft.sources.Manifest.deleteWhere]]. V2 predicates carry
    * general scalar shapes (arithmetic, casts) that the V1 `Filter`
    * algebra cannot — `doc_id % 7 = 0` arrives as a nested
    * `GeneralScalarExpression` and rebuilds here as the equivalent
    * Column tree. `None` for anything unknown — `canDeleteWhere` then
    * refuses and Spark reports the DELETE untranslatable. Semantics
    * are exact (the Column IS the predicate, three-valued logic and
    * all), not conservative like the skipping paths above. */
  def v2ExprToColumn(e: org.apache.spark.sql.connector.expressions
      .Expression): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.Column
    // the Scala case classes (FieldReference, LiteralValue) are
    // private[sql]; their Java interfaces are the public surface
    import org.apache.spark.sql.connector.expressions.{Cast => V2Cast, GeneralScalarExpression, Literal => V2Literal, NamedReference}
    import org.apache.spark.sql.functions.{col, lit, not}

    def all(es: Array[org.apache.spark.sql.connector.expressions
        .Expression]): Option[Seq[Column]] = {
      val cs = es.toSeq.map(v2ExprToColumn)
      if (cs.exists(_.isEmpty)) None else Some(cs.flatten)
    }

    e match {
      case f: NamedReference =>
        // top-level columns only (the connector's flat-primitive scope)
        if (f.fieldNames.length == 1) Some(col(f.fieldNames.head)) else None
      case l: V2Literal[_] => literalColumn(l)
      case c: V2Cast =>
        v2ExprToColumn(c.expression()).map(_.cast(c.dataType()))
      case g: GeneralScalarExpression =>
        val kids = g.children()
        (g.name(), kids.length) match {
          case ("ALWAYS_TRUE", 0)  => Some(lit(true))
          case ("ALWAYS_FALSE", 0) => Some(lit(false))
          case ("AND", 2) => all(kids).map(c => c(0) && c(1))
          case ("OR", 2)  => all(kids).map(c => c(0) || c(1))
          case ("NOT", 1) => all(kids).map(c => not(c(0)))
          case ("IS_NULL", 1)     => all(kids).map(_.head.isNull)
          case ("IS_NOT_NULL", 1) => all(kids).map(_.head.isNotNull)
          case ("=", 2)   => all(kids).map(c => c(0) === c(1))
          case ("<>", 2)  => all(kids).map(c => c(0) =!= c(1))
          case ("<=>", 2) => all(kids).map(c => c(0) <=> c(1))
          case ("<", 2)   => all(kids).map(c => c(0) < c(1))
          case ("<=", 2)  => all(kids).map(c => c(0) <= c(1))
          case (">", 2)   => all(kids).map(c => c(0) > c(1))
          case (">=", 2)  => all(kids).map(c => c(0) >= c(1))
          case ("+", 2)   => all(kids).map(c => c(0) + c(1))
          case ("-", 2)   => all(kids).map(c => c(0) - c(1))
          case ("-", 1)   => all(kids).map(c => -c(0))
          case ("*", 2)   => all(kids).map(c => c(0) * c(1))
          case ("/", 2)   => all(kids).map(c => c(0) / c(1))
          case ("%", 2)   => all(kids).map(c => c(0) % c(1))
          case ("IN", n) if n >= 2 =>
            all(kids).map(c => c.head.isin(c.tail: _*))
          case ("STARTS_WITH", 2) =>
            all(kids).map(c => c(0).startsWith(c(1)))
          case ("ENDS_WITH", 2) => all(kids).map(c => c(0).endsWith(c(1)))
          case ("CONTAINS", 2)  => all(kids).map(c => c(0).contains(c(1)))
          case _ => None
        }
      case _ => None
    }
  }

  /** A V2 literal (catalyst-internal value) as a Column, for the
    * connector's supported scalar types. */
  /** DELETE predicates of pure key shape — a conjunction of
    * `col = lit` / `col IN (lits)` over DISTINCT columns — as the
    * cross-product key-tuple set they denote. This is what lets
    * `DELETE FROM t WHERE id IN (...)` run as a merge-on-read
    * metadata commit: the keys come straight off the predicate, no
    * scan. `None` for any other shape (ranges, arithmetic, NULLs,
    * repeated columns), or when the cross product exceeds 10k tuples
    * — those keep the copy-on-write path. Only eligible when each
    * literal's type equals the table column's type exactly (Spark
    * would otherwise have wrapped the column in a cast, which already
    * disqualifies the shape). */
  def predicatesToKeys(predicates: Array[org.apache.spark.sql.connector
        .expressions.filter.Predicate], table: StructType)
      : Option[(Seq[String], Seq[Seq[Any]])] = {
    import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, GeneralScalarExpression, Literal => V2Literal, NamedReference}
    def flat(e: V2Expr): Seq[V2Expr] = e match {
      case g: GeneralScalarExpression
          if g.name == "AND" && g.children.length == 2 =>
        g.children().toSeq.flatMap(flat)
      case x => Seq(x)
    }
    // a key literal: non-null, simple external value, and typed
    // EXACTLY like the table column (else createDataFrame would lie)
    def simpleValue(c: String, l: V2Literal[_]): Option[Any] = {
      val v = l.value
      if (v == null) return None // `= NULL` never matches; leave to CoW
      if (!table.fieldNames.contains(c) ||
          table(c).dataType != l.dataType) return None
      l.dataType match {
        case StringType => Some(v.toString)
        case BooleanType | IntegerType | LongType | DoubleType |
             FloatType | ShortType | ByteType => Some(v)
        case _ => None
      }
    }
    def colValues(e: V2Expr): Option[(String, Seq[Any])] = e match {
      case g: GeneralScalarExpression =>
        (g.name, g.children().toSeq) match {
          case ("=", Seq(r: NamedReference, l: V2Literal[_]))
              if r.fieldNames.length == 1 =>
            simpleValue(r.fieldNames.head, l)
              .map(v => r.fieldNames.head -> Seq(v))
          case ("=", Seq(l: V2Literal[_], r: NamedReference))
              if r.fieldNames.length == 1 =>
            simpleValue(r.fieldNames.head, l)
              .map(v => r.fieldNames.head -> Seq(v))
          case ("IN", (r: NamedReference) +: lits)
              if r.fieldNames.length == 1 && lits.nonEmpty =>
            val vs = lits.map {
              case l: V2Literal[_] => simpleValue(r.fieldNames.head, l)
              case _               => None
            }
            if (vs.exists(_.isEmpty)) None
            else Some(r.fieldNames.head -> vs.flatten)
          case _ => None
        }
      case _ => None
    }
    val conjuncts = predicates.toSeq.flatMap(flat)
    if (conjuncts.isEmpty) return None // unconditional DELETE = truncate
    val extracted = conjuncts.map(colValues)
    if (extracted.exists(_.isEmpty)) return None
    val byCol = extracted.flatten
    val cols = byCol.map(_._1)
    if (cols.distinct.size != cols.size) return None
    // running bound with early exit: a plain product of many large
    // IN lists can overflow Long to a negative value and slip past
    // the cap, then OOM the driver materializing the cross product
    var bound = 1L
    byCol.foreach { case (_, vs) =>
      bound *= vs.size.toLong
      if (bound > 10000L) return None
    }
    val tuples = byCol.foldLeft(Seq(Seq.empty[Any])) {
      case (acc, (_, vs)) => acc.flatMap(t => vs.map(t :+ _))
    }
    Some((cols, tuples))
  }

  private def literalColumn(l: org.apache.spark.sql.connector
      .expressions.Literal[_])
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.lit
    val v = l.value
    if (v == null)
      return Some(lit(null).cast(l.dataType))
    l.dataType match {
      case StringType => Some(lit(v.toString))
      case BooleanType | IntegerType | LongType | DoubleType |
           FloatType | ShortType | ByteType | BinaryType => Some(lit(v))
      case _: org.apache.spark.sql.types.DecimalType =>
        Some(lit(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal))
      case DateType => v match {
        case d: Integer => Some(lit(java.time.LocalDate.ofEpochDay(
          d.longValue())))
        case _ => None
      }
      case TimestampType => v match {
        case t: java.lang.Long => Some(lit(
          java.time.Instant.EPOCH.plus(t, java.time.temporal.ChronoUnit
            .MICROS)))
        case _ => None
      }
      case _ => None
    }
  }

  /** Is this a data filter we can hand to parquet? (column set checked
    * by the caller; here just the shape + value types) */
  def parquetTranslatable(f: SFilter): Boolean = f match {
    case EqualTo(_, v)            => simpleValue(v)
    case GreaterThan(_, v)        => simpleValue(v)
    case GreaterThanOrEqual(_, v) => simpleValue(v)
    case LessThan(_, v)           => simpleValue(v)
    case LessThanOrEqual(_, v)    => simpleValue(v)
    case In(_, vs) => vs != null && vs.length <= 32 && vs.forall(simpleValue)
    case IsNull(_) | IsNotNull(_) => true
    case And(l, r) => parquetTranslatable(l) && parquetTranslatable(r)
    case Or(l, r)  => parquetTranslatable(l) && parquetTranslatable(r)
    case Not(c)    => parquetTranslatable(c)
    case _ => false
  }

  private def simpleValue(v: Any): Boolean = v match {
    case null => false
    case _: Boolean | _: Int | _: Long | _: Short | _: Byte |
         _: Float | _: Double | _: String => true
    case _ => false
  }

  /** Translate one Spark filter into a parquet predicate against THIS
    * file's schema. Strict: None when any referenced column is missing
    * from the file or a value/type combination is unsupported — the
    * caller drops the conjunct (safe: pushed filters are re-evaluated
    * by Spark as residuals). */
  def toParquetPredicate(f: SFilter, mt: MessageType)
      : Option[FilterPredicate] = {
    def prim(c: String): Option[PrimitiveType] =
      if (!mt.containsField(c)) None
      else mt.getType(mt.getFieldIndex(c)) match {
        case p: PrimitiveType => Some(p)
        case _ => None
      }

    def cmp(c: String, v: Any, op: String): Option[FilterPredicate] =
      prim(c).flatMap { p =>
        (p.getPrimitiveTypeName, v) match {
          case (INT64, _: Int | _: Long | _: Short | _: Byte) =>
            val col = FilterApi.longColumn(c)
            val x = java.lang.Long.valueOf(v.toString.toLong)
            Some(op match {
              case "eq" => FilterApi.eq(col, x)
              case "gt" => FilterApi.gt(col, x)
              case "ge" => FilterApi.gtEq(col, x)
              case "lt" => FilterApi.lt(col, x)
              case "le" => FilterApi.ltEq(col, x)
            })
          case (INT32, _: Int | _: Short | _: Byte) =>
            val col = FilterApi.intColumn(c)
            val x = java.lang.Integer.valueOf(v.toString.toInt)
            Some(op match {
              case "eq" => FilterApi.eq(col, x)
              case "gt" => FilterApi.gt(col, x)
              case "ge" => FilterApi.gtEq(col, x)
              case "lt" => FilterApi.lt(col, x)
              case "le" => FilterApi.ltEq(col, x)
            })
          case (DOUBLE, _: Double) =>
            val col = FilterApi.doubleColumn(c)
            val x = java.lang.Double.valueOf(v.asInstanceOf[Double])
            Some(op match {
              case "eq" => FilterApi.eq(col, x)
              case "gt" => FilterApi.gt(col, x)
              case "ge" => FilterApi.gtEq(col, x)
              case "lt" => FilterApi.lt(col, x)
              case "le" => FilterApi.ltEq(col, x)
            })
          case (FLOAT, _: Float) =>
            val col = FilterApi.floatColumn(c)
            val x = java.lang.Float.valueOf(v.asInstanceOf[Float])
            Some(op match {
              case "eq" => FilterApi.eq(col, x)
              case "gt" => FilterApi.gt(col, x)
              case "ge" => FilterApi.gtEq(col, x)
              case "lt" => FilterApi.lt(col, x)
              case "le" => FilterApi.ltEq(col, x)
            })
          case (BINARY, s: String)
            if p.getLogicalTypeAnnotation ==
              LogicalTypeAnnotation.stringType() =>
            val col = FilterApi.binaryColumn(c)
            val x = Binary.fromString(s)
            Some(op match {
              case "eq" => FilterApi.eq(col, x)
              case "gt" => FilterApi.gt(col, x)
              case "ge" => FilterApi.gtEq(col, x)
              case "lt" => FilterApi.lt(col, x)
              case "le" => FilterApi.ltEq(col, x)
            })
          case (BOOLEAN, b: Boolean) if op == "eq" =>
            Some(FilterApi.eq(FilterApi.booleanColumn(c),
              java.lang.Boolean.valueOf(b)))
          case _ => None
        }
      }

    def nullCheck(c: String, isNull: Boolean): Option[FilterPredicate] =
      prim(c).flatMap { p =>
        val pred: Option[FilterPredicate] = p.getPrimitiveTypeName match {
          case INT64 => Some(FilterApi.eq(FilterApi.longColumn(c),
            null.asInstanceOf[java.lang.Long]))
          case INT32 => Some(FilterApi.eq(FilterApi.intColumn(c),
            null.asInstanceOf[java.lang.Integer]))
          case DOUBLE => Some(FilterApi.eq(FilterApi.doubleColumn(c),
            null.asInstanceOf[java.lang.Double]))
          case FLOAT => Some(FilterApi.eq(FilterApi.floatColumn(c),
            null.asInstanceOf[java.lang.Float]))
          case BOOLEAN => Some(FilterApi.eq(FilterApi.booleanColumn(c),
            null.asInstanceOf[java.lang.Boolean]))
          case BINARY => Some(FilterApi.eq(FilterApi.binaryColumn(c),
            null.asInstanceOf[Binary]))
          case _ => None
        }
        pred.map(x => if (isNull) x else FilterApi.not(x))
      }

    f match {
      case EqualTo(c, v)            => cmp(c, v, "eq")
      case GreaterThan(c, v)        => cmp(c, v, "gt")
      case GreaterThanOrEqual(c, v) => cmp(c, v, "ge")
      case LessThan(c, v)           => cmp(c, v, "lt")
      case LessThanOrEqual(c, v)    => cmp(c, v, "le")
      case In(c, vs) =>
        val parts = vs.toSeq.filter(_ != null).map(v => cmp(c, v, "eq"))
        if (parts.isEmpty || parts.exists(_.isEmpty)) None
        else Some(parts.flatten.reduce(FilterApi.or))
      case IsNull(c)    => nullCheck(c, isNull = true)
      case IsNotNull(c) => nullCheck(c, isNull = false)
      case And(l, r) => for {
        a <- toParquetPredicate(l, mt); b <- toParquetPredicate(r, mt)
      } yield FilterApi.and(a, b)
      case Or(l, r) => for {
        a <- toParquetPredicate(l, mt); b <- toParquetPredicate(r, mt)
      } yield FilterApi.or(a, b)
      case Not(c) => toParquetPredicate(c, mt).map(FilterApi.not)
      case _ => None
    }
  }
}

/** Reads plan against the frozen `res` snapshot; writes commit through
  * the manifest protocol via the NATIVE V2 batch write — executors
  * stage the parquet files themselves (the driver sees only
  * (path, size) reports) and the commit is the same atomic
  * create-if-absent publish every other writer uses (exactly-once,
  * snapshot-isolated, time-travelable). INSERT INTO = append commit;
  * INSERT OVERWRITE/truncate = replace commit; partitioned tables
  * declare a clustered write distribution so inserts write O(values)
  * files.
  *
  * SQL DML rides the standard V2 mix-ins: `SupportsDelete` routes
  * `DELETE FROM t WHERE ...` with translatable predicates straight
  * into the copy-on-write [[Manifest.deleteWhere]] commit (untouched
  * partitions carry files by reference; history stays time-travelable)
  * — the SQL-level parity for the reference's item update/delete
  * surface (reference: python-data-ingestions/index-data-lambda.py:
  * 164-172; Athena SQL, query-data-lambda.py:195-218). */
final case class ManifestTable(res: ManifestConnector.Resolved,
                               cdc: Boolean = false)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** `SELECT _file, _commit_version FROM t` — row-level lineage from
    * the manifest's own per-file facts, zero extra IO. Not advertised
    * in CDC mode, whose schema owns `_commit_version` outright. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (cdc) Array.empty
    else ManifestConnector.metadataColumnFields.map { f =>
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = f.name
        override def dataType(): org.apache.spark.sql.types.DataType =
          f.dataType
        override def isNullable: Boolean = true
      }
    }
  override def name(): String = s"graft-manifest ${res.root} v${res.version}"
  override def schema(): StructType =
    if (cdc) ManifestConnector.cdcSchema(res.fullSchema)
    else res.fullSchema

  /** Surface snapshot facts to DESCRIBE EXTENDED / SHOW TBLPROPERTIES:
    * pinned version, layout, and the planned file/byte footprint. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("format", "graft-manifest")
    m.put("version", res.version.toString)
    m.put("partition-columns", res.partCols.mkString(","))
    m.put("files", res.files.length.toString)
    m.put("size-bytes", res.files.map(_.size).sum.toString)
    m
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def canDeleteWhere(predicates: Array[org.apache.spark.sql
      .connector.expressions.filter.Predicate]): Boolean =
    predicates.forall(ManifestConnector.v2ExprToColumn(_).isDefined)

  /** All conjuncts AND-ed (an empty array = unconditional DELETE =
    * rewrite to empty). Applies to the CURRENT snapshot — DML never
    * targets a pinned version.
    *
    * With `spark.graft.manifest.delete.mode=merge-on-read`, a DELETE
    * whose predicate is a pure key shape (`col = lit` / `col IN
    * (...)` conjunctions) commits the keys as a delete file instead
    * of rewriting data — O(keys) regardless of table size
    * ([[graft.sources.Manifest.deleteByKeys]]). Every other
    * predicate, and the default mode, takes the copy-on-write path. */
  override def deleteWhere(predicates: Array[org.apache.spark.sql
      .connector.expressions.filter.Predicate]): Unit = {
    val spark = SparkSession.active
    val mor = spark.conf
      .getOption("spark.graft.manifest.delete.mode")
      .contains("merge-on-read")
    val keyed = if (mor)
      ManifestConnector.predicatesToKeys(predicates, res.fullSchema)
    else None
    keyed match {
      case Some((cols, tuples)) =>
        val schema = StructType(
          cols.map(c => res.fullSchema(c).copy(nullable = false)))
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(tuples.map(t =>
            org.apache.spark.sql.Row.fromSeq(t)): _*)
        Manifest.deleteByKeys(spark, res.root,
          spark.createDataFrame(rows, schema))
      case None =>
        val cond = predicates.toSeq.map(p =>
          ManifestConnector.v2ExprToColumn(p).getOrElse(
            throw new IllegalArgumentException(
              s"untranslatable DELETE predicate $p — canDeleteWhere " +
                "should have refused this")))
          .reduceOption(_ && _)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        Manifest.deleteWhere(spark, res.root, cond, res.partCols)
    }
  }

  /** SQL UPDATE / MERGE INTO (and DELETEs whose predicates the
    * metadata path cannot translate) — group-based copy-on-write via
    * Spark's ReplaceData rewrite; see [[ManifestRowLevelOperation]]. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new ManifestRowLevelOperation(res, info.command())
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    require(!(options.containsKey("startingVersion") &&
        options.containsKey("startingTimestamp")),
      "give either startingVersion or startingTimestamp, not both")
    new ManifestScanBuilder(res,
      Option(options.get("maxVersionsPerTrigger")).map(_.toLong), cdc,
      Option(options.get("startingVersion")),
      Option(options.get("startingTimestamp")).map(_.toLong),
      Option(options.get("changesFrom")).map(_.toLong))
  }

  /** NATIVE V2 batch write (INSERT INTO / INSERT OVERWRITE): executors
    * stream rows straight into staged parquet files (same data plane
    * as the streaming sink and row-level rewrites — the driver never
    * holds a DataFrame) and the driver publishes their (path, size)
    * reports as one atomic commit. Declares
    * `RequiresDistributionAndOrdering`: a PARTITIONED table asks Spark
    * to cluster incoming rows by the partition columns, so an INSERT
    * with T tasks over P partition values writes O(P) files instead of
    * the O(T×P) small-files explosion — the SQL-path twin of the Scala
    * API's `write.clustered` opt-in, on by default where Spark can
    * plan the exchange (the same default Delta/Iceberg chose). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write
          with org.apache.spark.sql.connector.write
            .RequiresDistributionAndOrdering {
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (res.partCols.isEmpty)
            org.apache.spark.sql.connector.distributions.Distributions
              .unspecified()
          else
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(res.partCols.map(c =>
                org.apache.spark.sql.connector.expressions.Expressions
                  .identity(c)).toArray[
                org.apache.spark.sql.connector.expressions.Expression])
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        // clustering is an optimization, not a correctness need: let
        // AQE skip/shrink the exchange for tiny inserts
        override def distributionStrictlyRequired(): Boolean = false

        override def toBatch: org.apache.spark.sql.connector.write
            .BatchWrite =
          new ManifestBatchWrite(res, info.schema(), replace)

        // the streaming plane of the SAME builder: executor-staged
        // files, exactly-once epoch commits (see ManifestStreamingWrite)
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite =
          new ManifestStreamingWrite(res, info.queryId(), info.schema(),
            Option(info.options.get("autocompactevery")).map { s =>
              val n = try s.toLong catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"autoCompactEvery must be a positive integer " +
                      s"(got '$s')")
              }
              require(n > 0,
                s"autoCompactEvery must be positive (got $n)")
              n
            })
      }
    }
}

/** Driver half of the native batch INSERT: collect the executors'
  * staged (path, size) entries and publish ONE atomic append/replace
  * commit. Commit conflicts with concurrent writers retry (the staged
  * files are already on disk — a retry is one manifest re-read, no
  * data rewrite); aborts delete whatever the failed tasks staged. */
final class ManifestBatchWrite(res: ManifestConnector.Resolved,
    schema: StructType, replace: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  import org.apache.spark.sql.connector.write.{DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}

  private def spark = SparkSession.active
  private val salt = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val confEntries = spark.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    ManifestWriterFactory(confEntries, res.root, s"b$salt", schema,
      res.partCols)
  }

  private def entriesOf(messages: Array[WriterCommitMessage]) =
    messages.toSeq.collect { case m: ManifestWriteMessage => m.entries }
      .flatten.map { case (p, sz) => Manifest.FileEntry(p, Some(sz)) }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = entriesOf(messages)
    var attempt = 0
    var done = false
    while (!done) {
      try {
        Manifest.commitStagedEntries(spark, res.root, entries, schema,
          res.partCols, replace)
        done = true
      } catch {
        // both faces of the concurrent-writer race (see the streaming
        // sink's identical loop): the staged data is safe, retry the
        // metadata claim a bounded number of times
        case e: IllegalStateException
            if Option(e.getMessage).exists(_.contains("commit conflict")) && attempt < 3 =>
          attempt += 1; Manifest.raceBackoff(attempt)
        case e: IllegalArgumentException
            if Option(e.getMessage).exists(_.contains("torn manifest read")) && attempt < 3 =>
          attempt += 1; Manifest.raceBackoff(attempt)
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(res.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    entriesOf(messages).foreach { e =>
      try fs.delete(new Path(s"${res.root}/${e.path}"), false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

final class ManifestScanBuilder(res: ManifestConnector.Resolved,
                                maxVersionsPerTrigger: Option[Long] = None,
                                cdc: Boolean = false,
                                startingVersion: Option[String] = None,
                                startingTimestamp: Option[Long] = None,
                                changesFrom: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var required: StructType =
    if (cdc) ManifestConnector.cdcSchema(res.fullSchema)
    else res.fullSchema
  private var partitionFilters: Array[SFilter] = Array.empty
  private var dataFilters: Array[SFilter] = Array.empty
  private var limit: Int = -1
  private var aggPlan: Option[(StructType, Array[Array[Any]])] = None

  override def pushFilters(filters: Array[SFilter]): Array[SFilter] = {
    // CDC mode consumes NOTHING: retraction rows carry NULL partition
    // values (a delete-key file belongs to no partition), so a
    // consumed partition filter would silently re-admit or drop them —
    // Spark evaluates every filter on the emitted rows instead
    if (cdc) return filters
    val partCols = res.partCols.toSet
    val (part, rest) = filters.partition(
      ManifestConnector.isPartitionFilter(_, partCols))
    partitionFilters = part
    // record-skippable conjuncts: data columns only, supported shape —
    // handed to parquet per-file AND kept as residuals (IO skip only)
    dataFilters = rest.filter(f => f.references.nonEmpty &&
      !f.references.exists(partCols.contains) &&
      ManifestConnector.parquetTranslatable(f))
    rest // partition filters are fully consumed here; rest are residual
  }

  override def pushedFilters(): Array[SFilter] =
    partitionFilters ++ dataFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def isPartiallyPushed: Boolean = true

  // computed after pushFilters (Spark pushes filters before aggregates
  // and before build), consumed up to three times — memoize
  private lazy val survivingFilesCached = survivingFiles()

  private def survivingFiles(): Seq[ManifestConnector.FileInfo] = {
    // bloom-sidecar skip (point lookups on unclustered high-cardinality
    // columns, where zone-map envelopes prune nothing): None unless the
    // table advertises blooms AND a pushed filter is bloom-decidable,
    // so the common case costs zero FS round trips
    val bloomPruner = graft.sources.ManifestBlooms.prunerFor(
      res.root, res.dataSchema, res.tableMeta, dataFilters)
    val relPrefix = s"${res.root}/"
    res.files.filter { f =>
      val pv = f.partValues.toMap
      // survive only on definite TRUE — unknown (NULL) drops the file,
      // matching WHERE semantics (these filters are consumed, not
      // residual)
      partitionFilters.forall(
        ManifestConnector.evalPartitionFilter(_, pv).contains(true)) &&
        // zone-map skip: a file whose min/max envelope cannot satisfy a
        // pushed data filter is never planned (pure IO skip — data
        // filters stay residual)
        f.stats.forall(st =>
          dataFilters.forall(ManifestConnector.mayMatch(_, st))) &&
        bloomPruner.forall(_.mayMatch(f.absPath.stripPrefix(relPrefix)))
    }
  }

  /** COMPLETE aggregate pushdown answered from the manifest zone maps
    * alone: `count(*)` / `count(col)` / `min(col)` / `max(col)`,
    * ungrouped or GROUPED BY PARTITION COLUMNS, become driver-computed
    * rows (one per partition tuple) — zero data IO, zero tasks per
    * file, at any table size. `SELECT lang, count(*) FROM corpus
    * GROUP BY lang` — the composition query every training pipeline
    * runs — never touches a data page. Partition filters compose
    * (they prune whole files before the stats are summed).
    *
    * Everything here is REFUSE-BY-DEFAULT: residual data filters
    * (stats can't evaluate them), pending merge-on-read deletes
    * (footer counts overestimate), any file without stats, any column
    * without an entry in every file, bounds absent on a not-provably-
    * all-NULL file, distinct counts, grouping by anything but
    * partition columns, or a column type whose bound string does not
    * round-trip EXACTLY to the Spark internal value
    * (int/long/float/double/date only — strings are excluded until
    * footer truncation is ruled out, timestamps until the unit is
    * pinned) — all fall back to the ordinary scan. */
  // Spark calls supportCompletePushDown then pushAggregation with the
  // SAME Aggregation — memoize the driver-side stats fold
  private var aggMemo: Option[(org.apache.spark.sql.connector
    .expressions.aggregate.Aggregation,
    Option[(StructType, Array[Array[Any]])])] = None

  private def planAggregateMemo(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Array[Array[Any]])] =
    aggMemo match {
      case Some((a, r)) if a eq agg => r
      case _ =>
        val r = planAggregate(agg)
        aggMemo = Some((agg, r))
        r
    }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    planAggregateMemo(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    aggPlan = planAggregateMemo(agg)
    aggPlan.isDefined
  }

  private def planAggregate(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Array[Array[Any]])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    if (cdc) return None // CDC scans are streaming-only row feeds
    if (dataFilters.nonEmpty || limit >= 0) return None
    val files = survivingFilesCached
    if (files.exists(f => res.deleteSpecsFor(f).nonEmpty)) return None
    if (files.exists(_.stats.isEmpty)) return None
    val partSet = res.partCols.toSet

    def colName(e: org.apache.spark.sql.connector.expressions
        .Expression): Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }
    // Float/double are deliberately absent: parquet footer min/max may
    // omit NaN from the envelope while Spark's max() ranks NaN above
    // every value, so [1.0, NaN] would answer max = 1.0 from stats.
    // Without a NaN count in the stats (Iceberg's nan_value_counts)
    // the bounds are not authoritative — refuse and let the scan run.
    def boundValue(dt: DataType, s: String): Option[Any] = dt match {
      case IntegerType => s.toIntOption
      case LongType    => s.toLongOption
      case DateType    => s.toIntOption // days since epoch = internal
      case _           => None
    }
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Int, y: Int)       => x < y
      case (x: Long, y: Long)     => x < y
      case (x: Float, y: Float)   => x < y
      case (x: Double, y: Double) => x < y
      case _                      => false
    }

    // GROUP BY is supported over partition columns only: the groups
    // are the distinct partition tuples, and every group aggregates
    // its own files' stats
    val groupCols = agg.groupByExpressions.toSeq.map(e =>
      colName(e).filter(partSet).getOrElse(return None))
    val groupFields = groupCols.map(c =>
      res.fullSchema.find(_.name == c).getOrElse(return None))

    // the output field list (validated against schema/part layout) is
    // group-independent; per-group VALUES are computed below
    sealed trait AggSpec
    case object CountStarSpec extends AggSpec
    case class CountColSpec(name: String) extends AggSpec
    case class MinMaxSpec(field: StructField, isMin: Boolean)
        extends AggSpec
    val specs: Seq[(StructField, AggSpec)] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          StructField("count_star", LongType, false) -> CountStarSpec
        case c: Count if !c.isDistinct =>
          val name = colName(c.column).getOrElse(return None)
          if (partSet(name)) return None // part cols carry no stats
          if (!res.fullSchema.fieldNames.contains(name)) return None
          StructField(s"count_$name", LongType, false) ->
            CountColSpec(name)
        case m: Min =>
          val name = colName(m.column).getOrElse(return None)
          if (partSet(name)) return None
          val f = res.fullSchema.find(_.name == name).getOrElse(
            return None)
          StructField(s"min_$name", f.dataType, nullable = true) ->
            MinMaxSpec(f, isMin = true)
        case m: Max =>
          val name = colName(m.column).getOrElse(return None)
          if (partSet(name)) return None
          val f = res.fullSchema.find(_.name == name).getOrElse(
            return None)
          StructField(s"max_$name", f.dataType, nullable = true) ->
            MinMaxSpec(f, isMin = false)
        case _ => return None
      }

    /** Aggregate values over one file group's stats; None refuses the
      * whole pushdown (a missing entry is indistinguishable from
      * failed stats collection). */
    def valuesOf(group: Seq[ManifestConnector.FileInfo])
        : Option[Array[Any]] = {
      val sts = group.flatMap(_.stats)
      val totalRows = sts.map(_.rows).sum
      def eachCol(name: String)
          : Option[Seq[(graft.sources.ManifestStats.FileStats,
                        graft.sources.ManifestStats.ColStats)]] = {
        val per = sts.map(fs => fs.cols.get(name).map((fs, _)))
        if (per.forall(_.isDefined)) Some(per.flatten) else None
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      specs.foreach {
        case (_, CountStarSpec) => out += totalRows
        case (_, CountColSpec(name)) =>
          val pairs = eachCol(name).getOrElse(return None)
          if (pairs.exists(_._2.nulls.isEmpty)) return None
          out += totalRows - pairs.map(_._2.nulls.get).sum
        case (_, MinMaxSpec(field, isMin)) =>
          val pairs = eachCol(field.name).getOrElse(return None)
          val bounds = scala.collection.mutable.ArrayBuffer.empty[Any]
          pairs.foreach { case (fs, cs) =>
            (if (isMin) cs.min else cs.max) match {
              case Some(s) => bounds +=
                boundValue(field.dataType, s).getOrElse(return None)
              case None if cs.nulls.contains(fs.rows) => () // all-NULL
              case None => return None // bound genuinely unknown
            }
          }
          out += (if (bounds.isEmpty) null
            else bounds.reduce((a, b) => if (lt(a, b) == isMin) a else b))
      }
      Some(out.toArray)
    }

    val schema = StructType(groupFields ++ specs.map(_._1))
    val rows: Array[Array[Any]] =
      if (groupCols.isEmpty) Array(valuesOf(files).getOrElse(return None))
      else files.groupBy(f => groupCols.map(f.partValues.toMap.apply))
        .toSeq.map { case (tuple, group) =>
          val keyVals = tuple.zip(groupFields).map { case (v, f) =>
            ManifestConnector.castPartitionValue(v, f.dataType)
          }
          (keyVals ++ valuesOf(group).getOrElse(return None)).toArray
        }.toArray
    Some((schema, rows))
  }

  /** Top-N file pruning (`SupportsPushDownTopN`, PARTIAL): for
    * `ORDER BY col [ASC|DESC] LIMIT n` over a single int/long/date
    * key, the zone maps alone identify a file subset guaranteed to
    * contain a complete top-n — plan only those files; Spark still
    * runs the real sort+limit on what they hold. The argument: sort
    * files by their WORST guaranteed bound (max for ASC) best-first
    * and accumulate row counts until ≥ n — that bound B provably has
    * ≥ n rows at-or-before it, so any file whose BEST value (min for
    * ASC) lies beyond B cannot contribute and is dropped. NULL rows
    * ride the null counts: NULLS FIRST they pre-fill the budget
    * (n nulls → only null-bearing files), NULLS LAST they never rank
    * while ≥ n non-nulls exist. `ORDER BY ts DESC LIMIT 100` on an
    * append-mostly 100 TB table reads the newest few files instead of
    * every file.
    *
    * Refuse-by-default, same discipline as the aggregate path:
    * residual data filters and MoR deletes make footer counts
    * overestimates of contributing rows (the accumulation argument
    * collapses), multi-key sorts need row-level comparison, missing
    * stats/bounds/null counts are indistinguishable from failed
    * collection, and float/double bounds are NaN-unsound. */
  private var topNFiles: Option[Seq[ManifestConnector.FileInfo]] = None

  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference,
      NullOrdering, SortDirection}
    if (cdc || aggPlan.isDefined || n <= 0 || orders.length != 1)
      return false
    if (dataFilters.nonEmpty) return false
    val o = orders.head
    val name = o.expression() match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        nr.fieldNames.head
      case _ => return false
    }
    if (res.partCols.contains(name)) return false
    val dt = res.fullSchema.find(_.name == name)
      .map(_.dataType).getOrElse(return false)
    def parse(s: String): Option[Long] = dt match {
      case IntegerType => s.toIntOption.map(_.toLong)
      case LongType    => s.toLongOption
      case DateType    => s.toIntOption.map(_.toLong)
      case _           => None // float/double NaN-unsound; strings truncate
    }
    val files = survivingFilesCached
    if (files.exists(f => res.deleteSpecsFor(f).nonEmpty)) return false
    val asc = o.direction() == SortDirection.ASCENDING
    val nullsFirst = o.nullOrdering() == NullOrdering.NULLS_FIRST
    // per file: non-null count + directional bounds (lo = best value
    // in sort order, hi = worst bound its non-nulls are guaranteed at)
    case class F(fi: ManifestConnector.FileInfo, nonNull: Long,
                 nulls: Long, lo: Option[Long], hi: Option[Long])
    val parsed: Seq[F] = files.map { fi =>
      val st = fi.stats.getOrElse(return false)
      val cs = st.cols.get(name).getOrElse(return false)
      val nulls = cs.nulls.getOrElse(return false)
      val nonNull = st.rows - nulls
      if (nonNull == 0L) F(fi, 0L, nulls, None, None)
      else {
        val mn = cs.min.flatMap(parse).getOrElse(return false)
        val mx = cs.max.flatMap(parse).getOrElse(return false)
        if (asc) F(fi, nonNull, nulls, Some(mn), Some(mx))
        else F(fi, nonNull, nulls, Some(mx), Some(mn))
      }
    }
    def leq(a: Long, b: Long): Boolean = if (asc) a <= b else a >= b
    val totalNulls = parsed.map(_.nulls).sum
    if (nullsFirst && totalNulls >= n) {
      // the top-n is n NULL rows — any null-bearing file subset with
      // ≥ n nulls is a complete answer; keep them all (conservative)
      topNFiles = Some(parsed.filter(_.nulls > 0).map(_.fi))
      return true
    }
    var cum = if (nullsFirst) totalNulls else 0L
    var bound: Option[Long] = None
    val it = parsed.filter(_.nonNull > 0)
      .sortBy(_.hi.get)(if (asc) Ordering.Long else Ordering.Long.reverse)
      .iterator
    while (bound.isEmpty && it.hasNext) {
      val f = it.next()
      cum += f.nonNull
      if (cum >= n) bound = Some(f.hi.get)
    }
    topNFiles = bound match {
      case None => Some(files) // fewer than n rows total: keep all
      case Some(b) => Some(parsed.filter(f =>
        (nullsFirst && f.nulls > 0) || f.lo.exists(leq(_, b))).map(_.fi))
    }
    true
  }

  override def build(): Scan =
    new ManifestScan(res, topNFiles.getOrElse(survivingFilesCached),
      required, dataFilters,
      limit, partitionFilters, maxVersionsPerTrigger, aggPlan, cdc,
      startingVersion, startingTimestamp, changesFrom,
      topNPushed = topNFiles.isDefined)
}

final class ManifestScan(res: ManifestConnector.Resolved,
                         val plannedFiles: Seq[ManifestConnector.FileInfo],
                         required: StructType,
                         dataFilters: Array[SFilter],
                         limit: Int,
                         partitionFilters: Array[SFilter] = Array.empty,
                         maxVersionsPerTrigger: Option[Long] = None,
                         aggPlan: Option[(StructType, Array[Array[Any]])] = None,
                         cdc: Boolean = false,
                         startingVersion: Option[String] = None,
                         startingTimestamp: Option[Long] = None,
                         changesFrom: Option[Long] = None,
                         topNPushed: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType =
    aggPlan.map(_._1).getOrElse(required)

  /** Runtime (dynamic) file pruning — the DSv2 face of dynamic
    * partition pruning, extended to zone maps. A join whose build side
    * is selective hands this scan an `IN (join-key values…)` filter at
    * EXECUTION time; files whose partition value or min/max envelope
    * cannot match are dropped before any task launches. At 100 TB a
    * fact⋈dim join with a filtered dim typically names a handful of
    * partition values — this turns the probe-side scan from "all
    * files" into "those partitions' files" with zero user hints.
    * Narrowing only: `mayMatch` is conservative (a file that MIGHT
    * hold a matching row survives), and the join itself still
    * evaluates the real condition — dropped files are provably
    * rowless for the filter, so results are unchanged. */
  @volatile private var runtimeFiles: Seq[ManifestConnector.FileInfo] =
    plannedFiles

  /** Post-runtime-filter file count (= planned when no filter fired). */
  def runtimeFileCount: Int = runtimeFiles.length

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (aggPlan.isDefined || cdc) Array.empty
    // only columns in the scan OUTPUT: Spark resolves these against
    // the (column-pruned) relation and throws on anything absent
    else required.fieldNames.filter(res.fullSchema.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[SFilter]): Unit = {
    val partCols = res.partCols.toSet
    // a runtime IN over a bloom-covered join key consults the sidecars
    // too — dynamic FILE pruning on unclustered keys, where min/max
    // envelopes (the zone-map leg below) cannot narrow anything
    val bloomPruner = graft.sources.ManifestBlooms.prunerFor(
      res.root, res.dataSchema, res.tableMeta, filters.filter(flt =>
        flt.references.nonEmpty &&
          !flt.references.exists(partCols.contains)))
    val relPrefix = s"${res.root}/"
    runtimeFiles = runtimeFiles.filter { f =>
      val pv = f.partValues.toMap
      filters.forall { flt =>
        if (ManifestConnector.isPartitionFilter(flt, partCols))
          ManifestConnector.evalPartitionFilter(flt, pv).contains(true)
        else if (flt.references.nonEmpty &&
            !flt.references.exists(partCols.contains))
          f.stats.forall(st => ManifestConnector.mayMatch(flt, st))
        else true // mixed/unknown shape: keep the file
      } && bloomPruner.forall(
        _.mayMatch(f.absPath.stripPrefix(relPrefix)))
    }
  }

  /** The scan's rows arrive pre-clustered by the hive partition tuple
    * — report it ([[KeyGroupedPartitioning]] over identity transforms)
    * so that with `spark.sql.sources.v2.bucketing.enabled` a join or
    * aggregation keyed on the partition columns skips its shuffle
    * entirely (storage-partitioned join). Spark groups the per-file
    * input partitions by [[HasPartitionKey]] itself; with the conf off
    * nothing changes. At 100 TB a co-partitioned fact-fact join
    * shuffling neither side is the single largest cost this table
    * format can delete. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val partCols = res.partCols
    val tuples =
      if (aggPlan.isEmpty && !cdc && partCols.nonEmpty)
        plannedFiles
          .map(f => partCols.map(f.partValues.toMap.apply)).distinct.size
      else 0
    if (tuples > 0) { // a 0-partition report would be malformed
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          partCols.map(c => org.apache.spark.sql.connector.expressions
            .Expressions.identity(c)).toArray[
            org.apache.spark.sql.connector.expressions.Expression],
          tuples)
    } else new org.apache.spark.sql.connector.read.partitioning
      .UnknownPartitioning(0)
  }
  override def toBatch: Batch = this

  /** Streaming read: manifest VERSIONS are the offsets, each
    * micro-batch is the file-level change feed between two snapshots
    * (same semantics as [[graft.sources.Manifest.readChanges]] — an
    * append yields the appended rows, a merge/delete re-emits the
    * rewritten partitions' post-image). Pruning (partition, zone-map,
    * projection) applies per batch through the same paths as the batch
    * scan. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // stream offsets are MAIN-CHAIN versions; a branch has its own
    // numbering, so streaming a branch would replay main's commits
    require(res.branch.isEmpty,
      "option(branch) cannot combine with readStream: stream offsets " +
        "are main-chain versions")
    new ManifestMicroBatchStream(res, required, partitionFilters,
      dataFilters, mkReaderFactory(), maxVersionsPerTrigger, cdc,
      startingVersion, startingTimestamp)
  }

  private[connector] def mkReaderFactory(): PartitionReaderFactory = {
    // Hadoop Configuration is not serializable; ship the entries and
    // rebuild on the executor (local/hdfs/s3a credentials all ride it).
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val entries = conf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    // CDC meta and selected metadata columns ride the constant-column
    // (partition value) machinery — each input partition carries
    // their values, typed from the required schema
    val constCols =
      (if (cdc) res.partCols ++
        ManifestConnector.cdcMetaFields.map(_.name)
      else res.partCols ++ ManifestConnector.metadataColumnFields
        .map(_.name).filter(required.fieldNames.contains)).toArray
    ManifestReaderFactory(entries, required, constCols,
      dataFilters, limit, res.fullSchema,
      plannedFiles.exists(f => res.deleteSpecsFor(f).nonEmpty) || cdc)
  }

  override def description(): String =
    s"graft-manifest ${res.root} v${res.version} " +
      s"files=${plannedFiles.length}/${res.files.length} " +
      s"pushed=[${dataFilters.mkString(", ")}]" +
      (if (limit >= 0) s" limit=$limit" else "") +
      (if (topNPushed) " pushedTopN" else "") +
      aggPlan.map(a =>
        s" pushedAggregates=[${a._1.fieldNames.mkString(", ")}]")
        .getOrElse("")

  override def planInputPartitions(): Array[InputPartition] =
    aggPlan match {
      // fully-pushed aggregate: the row is already computed from the
      // manifest zone maps — one partition, zero file IO
      case Some((_, rows)) => Array(AggRowInputPartition(rows))
      case None if cdc => changesFrom match {
        // batch CDC: the row-level change feed (from, pinned version]
        // through the connector — readChangesCdc as a DataFrame read
        case Some(from) =>
          val spark = SparkSession.active
          require(from >= 0 && from <= res.version,
            s"changesFrom $from is outside [0, ${res.version}] of " +
              res.root)
          val prev: Set[String] =
            if (from == 0L) Set.empty
            else graft.sources.Manifest
              .snapshot(spark, res.root, from).files.toSet
          val cur = graft.sources.Manifest
            .snapshotMeta(spark, res.root, res.version)
          val crossing = cur.deletes.filter(d =>
            d.seq > from && d.seq <= res.version)
          ManifestStreamHelpers.cdcInputPartitions(res, prev, cur,
            crossing)
        case None => throw new UnsupportedOperationException(
          "option(\"cdc\", \"true\") needs changesFrom for a batch " +
            "read (the feed is a version range), or spark.readStream " +
            "for the streaming feed")
      }
      case None =>
        // typed partition-key values (layout order) back the
        // HasPartitionKey grouping when KeyGroupedPartitioning is on.
        // runtimeFiles ⊆ plannedFiles: re-planned after a runtime
        // filter narrowed the set (Spark re-invokes this post-filter)
        val keyTypes = res.partCols.map(c =>
          res.fullSchema.find(_.name == c)
            .map(_.dataType).getOrElse(StringType))
        runtimeFiles.map { f =>
          val pv = f.partValues.toMap
          val keys = res.partCols.zip(keyTypes).map { case (c, dt) =>
            ManifestConnector.castPartitionValue(pv(c), dt)
          }.toArray
          ManifestInputPartition(
            f.absPath, f.size, f.partValues.toArray ++
              // lineage constants, emitted only when selected
              Array("_file" -> f.absPath,
                "_commit_version" -> f.seq.toString),
            res.deleteSpecsFor(f), keys): InputPartition
        }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    mkReaderFactory()

  override def estimateStatistics(): Statistics = new Statistics {
    // post-pruning bytes: a pruned scan becomes broadcast-eligible
    // exactly when its surviving files fit the threshold (a pushed
    // aggregate is one tiny row)
    override def sizeInBytes(): OptionalLong =
      if (aggPlan.isDefined)
        OptionalLong.of(64L * aggPlan.get._2.length max 64L)
      else OptionalLong.of(plannedFiles.map(_.size).sum max 1L)
    // exact post-pruning row count from the manifest zone maps (files
    // are immutable, so the commit-time footer count is exact) — AQE
    // and join-strategy costing see real cardinalities, not a guess
    // derived from bytes. Absent when a pre-stats file survives
    // pruning, or when pending merge-on-read deletes make footer
    // counts an overestimate (bytes stay: still an upper bound).
    override def numRows(): OptionalLong = {
      if (aggPlan.isDefined)
        return OptionalLong.of(aggPlan.get._2.length.toLong)
      val rs = plannedFiles.map(_.stats.map(_.rows))
      if (rs.forall(_.isDefined) &&
          plannedFiles.forall(f => res.deleteSpecsFor(f).isEmpty))
        OptionalLong.of(rs.flatMap(_.toSeq).sum)
      else OptionalLong.empty()
    }

    /** Per-column statistics for the CBO (`transformV2Stats` folds
      * them into catalyst attribute stats): min/max and null counts
      * aggregated from the PLANNED files' zone maps (so a pruned scan
      * reports its pruned ranges, not the table's), NDV and byte
      * lengths from the last `analyzeTable` header. All advisory —
      * estimates steer join order and selectivity guesses, never
      * results — and all conservative: any file missing a bound drops
      * that statistic rather than narrowing it. */
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val out = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (aggPlan.isDefined || cdc ||
          plannedFiles.exists(f => res.deleteSpecsFor(f).nonEmpty))
        return out
      val analyzed = res.tableMeta.get("colstats")
        .map(Manifest.decodeColStats)
        .getOrElse(Map.empty[String, Manifest.AnalyzedCol])
      val rowsKnown = plannedFiles.forall(_.stats.isDefined)
      val totalRows =
        if (rowsKnown) Some(plannedFiles.map(_.stats.get.rows).sum)
        else None
      val partCols = res.partCols.toSet
      val metaNames = ManifestConnector.metadataColumnFields
        .map(_.name).toSet
      required.fields
        .filterNot(f => metaNames(f.name))
        .foreach { f =>
        val (mn, mx, nulls, ndvExact) =
          if (partCols(f.name)) {
            // partition columns: exact values per file from the path
            val vs = plannedFiles.map(_.partValues.toMap.apply(f.name))
            val nonNull = vs.filter(_ != null).distinct
            val typed = f.dataType match {
              case IntegerType | LongType | DoubleType | FloatType =>
                scala.util.Try(nonNull
                  .map(v => ManifestConnector
                    .castPartitionValue(v, f.dataType))).toOption
              case _ => None
            }
            val bounds = typed.filter(_.nonEmpty).map { tv =>
              def d(a: Any) = a match {
                case x: Int => x.toDouble; case x: Long => x.toDouble
                case x: Float => x.toDouble; case x: Double => x
              }
              (tv.minBy(d), tv.maxBy(d))
            }
            val nullRows =
              if (rowsKnown)
                Some(plannedFiles.filter(
                  _.partValues.toMap.apply(f.name) == null)
                  .map(_.stats.get.rows).sum)
              else None
            (bounds.map(_._1), bounds.map(_._2), nullRows,
              Some(nonNull.size.toLong +
                (if (vs.contains(null)) 1L else 0L)))
          } else {
            // zero-row files (CREATE TABLE's empty init commit) carry
            // no bounds and no rows — their envelope is vacuous, so
            // they must not poison the fold
            val nonEmpty =
              plannedFiles.filterNot(_.stats.exists(_.rows == 0L))
            val perFile = nonEmpty.map(
              _.stats.flatMap(_.cols.get(f.name)))
            val bounds: Option[(Any, Any)] =
              if (perFile.isEmpty || perFile.exists(s =>
                  s.isEmpty || s.get.min.isEmpty || s.get.max.isEmpty))
                None
              else ManifestScan.foldBounds(f.dataType,
                perFile.map(s => (s.get.min.get, s.get.max.get)))
            val nulls =
              if (perFile.forall(s =>
                  s.isDefined && s.get.nulls.isDefined))
                Some(perFile.flatMap(s => s.get.nulls).sum)
              else None
            (bounds.map(_._1), bounds.map(_._2), nulls, None)
          }
        val an = analyzed.get(f.name)
        val ndv = ndvExact.orElse(an.map(_.ndv))
          .map(n => totalRows.fold(n)(r => math.min(n, r)))
        if (mn.isDefined || mx.isDefined || nulls.isDefined ||
            ndv.isDefined || an.exists(_.avgLen.isDefined)) {
          out.put(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(f.name),
            new org.apache.spark.sql.connector.read.colstats
                .ColumnStatistics {
              override def distinctCount(): OptionalLong =
                ndv.fold(OptionalLong.empty())(OptionalLong.of)
              override def min(): java.util.Optional[Object] =
                mn.fold(java.util.Optional.empty[Object]())(v =>
                  java.util.Optional.of(v.asInstanceOf[Object]))
              override def max(): java.util.Optional[Object] =
                mx.fold(java.util.Optional.empty[Object]())(v =>
                  java.util.Optional.of(v.asInstanceOf[Object]))
              override def nullCount(): OptionalLong =
                nulls.fold(OptionalLong.empty())(OptionalLong.of)
              override def avgLen(): OptionalLong =
                an.flatMap(_.avgLen)
                  .fold(OptionalLong.empty())(OptionalLong.of)
              override def maxLen(): OptionalLong =
                an.flatMap(_.maxLen)
                  .fold(OptionalLong.empty())(OptionalLong.of)
            })
        }
      }
      out
    }
  }
}

object ManifestScan {
  /** Fold per-file zone-map `(min, max)` bound strings into one typed
    * envelope of CATALYST values for `dt` (Int days for dates, Long
    * micros for timestamps — what the estimators expect). None for
    * types the CBO doesn't range over (strings/binary), for
    * unparsable bounds, and for float/double envelopes touching NaN
    * (parquet stats may omit NaNs; the range would be misleading even
    * as an estimate). */
  private[connector] def foldBounds(dt: DataType,
      perFile: Seq[(String, String)]): Option[(Any, Any)] =
    try dt match {
      case IntegerType | DateType =>
        Some((perFile.map(_._1.toLong).min.toInt,
          perFile.map(_._2.toLong).max.toInt))
      case LongType | TimestampType =>
        Some((perFile.map(_._1.toLong).min,
          perFile.map(_._2.toLong).max))
      case DoubleType =>
        val (mins, maxs) =
          (perFile.map(_._1.toDouble), perFile.map(_._2.toDouble))
        if ((mins ++ maxs).exists(_.isNaN)) None
        else Some((mins.min, maxs.max))
      case FloatType =>
        val (mins, maxs) =
          (perFile.map(_._1.toFloat), perFile.map(_._2.toFloat))
        if ((mins ++ maxs).exists(_.isNaN)) None
        else Some((mins.min, maxs.max))
      case BooleanType =>
        Some((perFile.map(_._1.toBoolean).min,
          perFile.map(_._2.toBoolean).max))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** One merge-on-read delete file applying to a task's data file: the
  * task loads its DISTINCT key tuples into a hash set once and drops
  * matching rows as it reads — the executor half of [[graft.sources
  * .Manifest.deleteByKeys]]. */
final case class DeleteFileSpec(absPath: String, keyCols: Array[String])

/** JVM-wide (per-executor) cache of loaded delete-key sets. A scan
  * over N data files would otherwise read every applicable delete
  * file N times — once per task. Delete files are IMMUTABLE (new
  * commits write new paths), so a path is a complete cache key.
  * Crudely bounded: maintenance cycles (rewriteDeletes → vacuum)
  * retire paths, so on overflow the cache just resets. */
private[connector] object DeleteSetCache {
  private val MaxEntries = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.HashSet[List[Any]]]()
  def getOrLoad(path: String,
                load: () => java.util.HashSet[List[Any]])
      : java.util.HashSet[List[Any]] = {
    val hit = cache.get(path)
    if (hit != null) return hit
    val v = load()
    if (cache.size >= MaxEntries) cache.clear()
    cache.putIfAbsent(path, v)
    v
  }
}

final case class ManifestInputPartition(path: String, size: Long,
    partValues: Array[(String, String)],
    deletes: Array[DeleteFileSpec] = Array.empty,
    keyValues: Array[Any] = Array.empty)
    extends InputPartition with HasPartitionKey {
  // consulted only when the scan reports KeyGroupedPartitioning (the
  // batch path populates keyValues with typed values in layout order)
  override def partitionKey(): InternalRow =
    new GenericInternalRow(keyValues)
}

/** The single partition of a fully-pushed-down aggregate scan: the
  * result rows (one, or one per partition-tuple group) were computed
  * on the DRIVER from manifest zone maps; the executor just emits
  * them (values are Spark internal representations — primitives,
  * UTF8String or null). */
final case class AggRowInputPartition(rows: Array[Array[Any]])
    extends InputPartition

final case class ManifestReaderFactory(confEntries: Array[(String, String)],
    required: StructType, partCols: Array[String],
    dataFilters: Array[SFilter], limit: Int,
    tableSchema: StructType = new StructType(),
    forceRowPath: Boolean = false)
    extends PartitionReaderFactory {

  // Columnar (vectorized) reading whenever data columns are requested
  // and no limit is pushed: Spark's own vectorized parquet decoder +
  // a ColumnarToRow boundary beats row-by-row Group assembly by the
  // same margin it does in the native file source. The row path stays
  // for the footer-count fast path (no data columns), pushed limits,
  // and scans with applicable merge-on-read deletes (row-level
  // filtering needs row emission, and Spark requires one mode for the
  // WHOLE scan — rewriteDeletes restores vectorized reads).
  private val dataFieldCount =
    required.fields.count(f => !partCols.contains(f.name))
  override def supportColumnarReads(partition: InputPartition): Boolean =
    !partition.isInstanceOf[AggRowInputPartition] &&
      dataFieldCount > 0 && limit < 0 && !forceRowPath

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = partition match {
    case AggRowInputPartition(rows) =>
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = new GenericInternalRow(rows(i))
        override def close(): Unit = ()
      }
    case p: ManifestInputPartition =>
      new ManifestPartitionReader(p,
        confEntries, required, partCols.toSet, dataFilters, limit,
        tableSchema)
  }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new ManifestColumnarReader(
      partition.asInstanceOf[ManifestInputPartition],
      confEntries, required, partCols.toSet, dataFilters)
}

/** One task = one data file. Opens the footer once (schema + row
  * count), then either streams projected/filtered records through the
  * parquet example reader, or — when the query needs no data columns
  * (count(*), partition-only projections) — emits footer-counted rows
  * without touching a data page. */
final class ManifestPartitionReader(part: ManifestInputPartition,
    confEntries: Array[(String, String)], required: StructType,
    partCols: Set[String], dataFilters: Array[SFilter], limit: Int,
    tableSchema: StructType = new StructType())
    extends PartitionReader[InternalRow] {

  private val conf = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val partValues: Map[String, String] = part.partValues.toMap

  private sealed trait ColPlan
  // value pre-cast to the declared partition type (string for legacy)
  private case class PartCol(value: Any) extends ColPlan
  private case class DataCol(projIdx: Int, dt: DataType) extends ColPlan
  private case object MissingCol extends ColPlan

  private val path = new Path(part.path)
  private val (fileSchema: MessageType, fileRows: Long) = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try (r.getFileMetaData.getSchema, r.getRecordCount)
    finally r.close()
  }

  // a const-designated column (partition / CDC meta) falls back to
  // being READ FROM THE FILE when this partition carries no value for
  // it but the file does — the CDC delete-key case: a delete file
  // keyed on a PARTITION column stores the key values as an ordinary
  // data column, and emitting the constant NULL instead would hand the
  // consumer an unreplayable retraction. Hive scans are unaffected
  // (their partitions always carry every partition value).
  private def constFallsToFile(name: String): Boolean =
    partCols.contains(name) && !partValues.contains(name) &&
      fileSchema.containsField(name)

  private val dataFields = required.fields.filterNot(f =>
    partCols.contains(f.name))
  // merge-on-read delete keys must be read even when pruned from the
  // projection — extraction needs them, emission does not
  private val delKeyCols: Array[String] =
    part.deletes.flatMap(_.keyCols).distinct
  // projection keeps file order for stable Group field indexes
  private val presentNames =
    (dataFields.map(_.name) ++
      required.fields.map(_.name).filter(constFallsToFile) ++
      delKeyCols.filterNot(partCols.contains))
      .filter(fileSchema.containsField).toSet
  private val projection: Option[MessageType] =
    if (presentNames.isEmpty) None
    else Some(new MessageType(fileSchema.getName,
      fileSchema.getFields.asScala.filter(f =>
        presentNames.contains(f.getName)).asJava))

  // the row path decodes TimestampType as INT64 micros only — an INT96
  // file would misdecode silently, so EVERY row-path projection (MoR
  // deletes, pushed LIMIT, CDC feeds) refuses it loudly. Files written
  // by this library are pinned to TIMESTAMP_MICROS; INT96 can only
  // arrive via externally-written parquet adopted into a commit.
  projection.foreach(_.getFields.asScala.foreach { f =>
    require(!(f.isPrimitive && f.asPrimitiveType().getPrimitiveTypeName
        == org.apache.parquet.schema.PrimitiveType
          .PrimitiveTypeName.INT96),
      s"row-path read over INT96-timestamp files is unsupported " +
        s"(${part.path}); rewrite the table (Manifest.compact / " +
        s"rewriteDeletes) to INT64-micros files")
  })

  private val plans: Array[ColPlan] = required.fields.map { f =>
    if (partCols.contains(f.name) && !constFallsToFile(f.name)) {
      val v = partValues.getOrElse(f.name, null)
      PartCol(ManifestConnector.castPartitionValue(v, f.dataType))
    } else projection match {
      case Some(p) if p.containsField(f.name) =>
        DataCol(p.getFieldIndex(f.name), f.dataType)
      case _ => MissingCol
    }
  }

  private def typeOf(c: String): DataType =
    if (tableSchema.fieldNames.contains(c)) tableSchema(c).dataType
    else required(c).dataType

  private def keyPlan(c: String): ColPlan =
    if (partCols.contains(c))
      PartCol(ManifestConnector.castPartitionValue(
        partValues.getOrElse(c, null), typeOf(c)))
    else projection match {
      case Some(p) if p.containsField(c) =>
        DataCol(p.getFieldIndex(c), typeOf(c))
      case _ => MissingCol // schema evolution: rows read NULL here
    }

  // byte arrays compare by identity; key tuples normalize them
  private def normKey(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case x              => x
  }

  /** One entry per distinct key-column tuple among the applicable
    * delete files: the extraction plan for this data file's rows plus
    * the loaded key set (all delete files of that tuple, unioned). A
    * row is deleted when ANY set contains its tuple — null-safe (a
    * NULL key value matches NULL), matching the read path's `<=>`
    * anti-join. Loading happens once per task, before the data reader
    * touches the shared Configuration. */
  private val deleteSets
      : Array[(Array[ColPlan], Array[java.util.HashSet[List[Any]]])] =
    part.deletes.groupBy(_.keyCols.toSeq).map { case (kc, specs) =>
      val types = kc.map(typeOf)
      val sets = specs.map(_.absPath).distinct.map { dp =>
        DeleteSetCache.getOrLoad(dp, () => {
          val set = new java.util.HashSet[List[Any]]()
          val dPath = new Path(dp)
          val dSchema = {
            val r = ParquetFileReader.open(
              HadoopInputFile.fromPath(dPath, conf))
            try r.getFileMetaData.getSchema finally r.close()
          }
          val idx = kc.map(dSchema.getFieldIndex).toArray
          // fresh conf: must not inherit the data file's read projection
          val dConf = new Configuration(conf)
          val dr = ParquetReader.builder(new GroupReadSupport(), dPath)
            .withConf(dConf).build()
          try {
            var g = dr.read()
            while (g != null) {
              set.add(kc.indices.map(i =>
                if (g.getFieldRepetitionCount(idx(i)) == 0) null
                else normKey(decodeGroupValue(g, idx(i), types(i)))).toList)
              g = dr.read()
            }
          } finally dr.close()
          set
        })
      }
      (kc.map(keyPlan).toArray, sets.toArray)
    }.toArray

  private var emitted = 0L
  private def capped(n: Long): Long = if (limit >= 0) n min limit else n

  // fast path: no data columns requested → no data filters exist either
  // (Spark keeps residual-filter columns in the required schema), so the
  // footer row count is exact. With applicable deletes the key columns
  // are in the projection unless they are ALL partition/missing — then
  // the whole file shares one constant key tuple and is either fully
  // deleted or untouched.
  private val rowsOnly = projection.isEmpty
  private val constDeleted = rowsOnly && deleteSets.exists {
    case (kps, sets) =>
      val key = kps.map {
        case PartCol(v) => normKey(v)
        case _          => null
      }.toList
      sets.exists(_.contains(key))
  }
  private val rowsOnlyTotal =
    if (!rowsOnly || constDeleted) 0L else capped(fileRows)

  private val reader: ParquetReader[Group] = if (rowsOnly) null else {
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projection.get.toString)
    val predicate = dataFilters.toSeq
      .flatMap(ManifestConnector.toParquetPredicate(_, projection.get))
      .reduceOption(FilterApi.and)
    val b = ParquetReader.builder(new GroupReadSupport(), path)
      .withConf(conf)
    predicate.fold(b)(p => b.withFilter(FilterCompat.get(p))).build()
  }

  /** Is this row erased by a pending merge-on-read delete? */
  private def deleted(g: Group): Boolean = {
    var i = 0
    while (i < deleteSets.length) {
      val (kps, sets) = deleteSets(i)
      val key = kps.map {
        case PartCol(v) => normKey(v)
        case MissingCol => null
        case DataCol(idx, dt) =>
          if (g.getFieldRepetitionCount(idx) == 0) null
          else normKey(decodeGroupValue(g, idx, dt))
      }.toList
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(key)) return true
        j += 1
      }
      i += 1
    }
    false
  }

  private def decodeGroupValue(g: Group, idx: Int, dt: DataType): Any =
    dt match {
      case LongType    => g.getLong(idx, 0)
      case IntegerType => g.getInteger(idx, 0)
      case DoubleType  => g.getDouble(idx, 0)
      case FloatType   => g.getFloat(idx, 0)
      case BooleanType => g.getBoolean(idx, 0)
      case TimestampType => g.getLong(idx, 0)
      case DateType      => g.getInteger(idx, 0)
      case StringType  =>
        UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
      case BinaryType  => g.getBinary(idx, 0).getBytes
      case other => throw new IllegalStateException(
        s"unreachable: unsupported type $other")
    }

  private var current: InternalRow = _

  // row path decodes INT64-micros timestamps only (the connector's
  // own write encoding); INT96 files take the vectorized path, which
  // Spark decodes natively
  private def rowOf(g: Group): InternalRow = {
    val vals = new Array[Any](plans.length)
    var i = 0
    while (i < plans.length) {
      vals(i) = plans(i) match {
        case PartCol(v) => v
        case MissingCol => null
        case DataCol(idx, dt) =>
          if (g.getFieldRepetitionCount(idx) == 0) null
          else decodeGroupValue(g, idx, dt)
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private val partOnlyRow: InternalRow = {
    val vals: Array[Any] = plans.map {
      case PartCol(v) => v: Any
      case _          => null: Any
    }
    new GenericInternalRow(vals)
  }

  override def next(): Boolean = {
    if (rowsOnly) {
      if (emitted >= rowsOnlyTotal) false
      else { current = partOnlyRow; emitted += 1; true }
    } else if (limit >= 0 && emitted >= limit) false
    else {
      var g = reader.read()
      // skip rows erased by pending merge-on-read deletes
      while (g != null && deleteSets.nonEmpty && deleted(g))
        g = reader.read()
      if (g == null) false
      else { current = rowOf(g); emitted += 1; true }
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}
