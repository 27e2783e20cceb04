package graft.sources.connector

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types, Type => PType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
import org.apache.spark.sql.types._

/** EXECUTOR-side parquet writing for the manifest connector — the data
  * plane of the native streaming sink and of SQL row-level operations
  * (UPDATE / MERGE / rewrite-shaped DELETE), where the V1 driver
  * bridge used by INSERT cannot apply (Spark hands each task's rows to
  * a [[DataWriter]], never a whole DataFrame to the driver).
  *
  * Each task writes its rows into the commit's shared staging dir
  * under `data/`, one file per hive partition directory it encounters
  * (`data/<commitDir>/k1=v1/k2=v2/part-<pid>-<uuid>.parquet`), and
  * reports the written `(relPath, size)` entries as its commit
  * message. The DRIVER then publishes exactly the committed tasks'
  * files as one atomic manifest version — a failed/speculative task's
  * files are never referenced (orphans, reclaimed by the commit-dir
  * sweep in [[graft.sources.Manifest.vacuum]]'s empty-dir pass once
  * vacuumed snapshots stop referencing the dir — or simply inert).
  *
  * Scope matches the connector: flat primitive columns
  * (boolean/int/long/float/double/string/binary). File names carry a
  * per-writer UUID, so epoch replays and task retries can never
  * clobber a committed file.
  *
  * 100 TB posture: rows stream straight from the task to its parquet
  * files (O(1) memory per open partition writer); the driver sees only
  * (path, size) tuples — metadata-scale, same as every commit. */
object ManifestWriter {

  /** Hive path escaping (inverse of
    * [[graft.sources.Manifest.unescapePathName]]): the characters Hive
    * escapes in partition path segments, as `%XX` uppercase hex. */
  def escapePathName(s: String): String = {
    val needs = (c: Char) => c < 0x20 || c == 0x7F ||
      "\"#%'*/:=?\\{[]^".indexOf(c) >= 0
    if (!s.exists(needs)) s
    else {
      val sb = new StringBuilder(s.length + 8)
      s.foreach { c =>
        if (needs(c)) sb.append(f"%%${c.toInt}%02X") else sb.append(c)
      }
      sb.toString
    }
  }

  /** One row's hive partition sub-path (`k1=v1/k2=v2`), null →
    * `__HIVE_DEFAULT_PARTITION__`. Values are formatted exactly as the
    * read side parses them back ([[ManifestConnector.castPartitionValue]]). */
  def partitionPath(partCols: Seq[String], values: Seq[Any]): String =
    partCols.zip(values).map { case (c, v) =>
      val s = if (v == null) "__HIVE_DEFAULT_PARTITION__"
        else escapePathName(v.toString)
      s"${escapePathName(c)}=$s"
    }.mkString("/")

  /** Spark schema → parquet message type, connector scope only. All
    * fields optional (Spark nullability is advisory at file level). */
  def messageTypeOf(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: PType = f.dataType match {
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
          .named(f.name)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
          .named(f.name)
        case LongType => Types.optional(PrimitiveTypeName.INT64)
          .named(f.name)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
          .named(f.name)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
          .named(f.name)
        // catalyst-internal encodings map 1:1 to the annotated
        // primitives: micros-since-epoch (UTC) and days-since-epoch
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
          .named(f.name)
        case other => throw new IllegalArgumentException(
          s"graft-manifest writes flat primitive columns only; " +
            s"column ${f.name} is ${other.catalogString}")
      }
      b.addField(t)
    }
    b.named("graft")
  }
}

/** The `(relPath, size)` entries one committed task contributed. */
final case class ManifestWriteMessage(entries: Seq[(String, Long)])
    extends WriterCommitMessage

/** One factory serves both write planes: batch (row-level operations)
  * and streaming (per-epoch micro-batch commits). `commitDir` is the
  * staging dir name under `data/` for batch; streaming derives a
  * per-epoch dir from it. */
final case class ManifestWriterFactory(confEntries: Array[(String, String)],
    root: String, commitDir: String, schema: StructType,
    partCols: Seq[String])
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(confEntries, root, commitDir, schema,
      partCols, partitionId)

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(confEntries, root, f"$commitDir-e$epochId%08d",
      schema, partCols, partitionId)
}

/** Streams one task's rows into per-partition parquet files via the
  * parquet example (Group) writer — the write-side sibling of the
  * connector's row reader, kept to the same flat-primitive scope. */
final class ManifestDataWriter(confEntries: Array[(String, String)],
    root: String, commitDir: String, schema: StructType,
    partCols: Seq[String], partitionId: Int)
    extends DataWriter[InternalRow] {

  private val conf = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val uuid = java.util.UUID.randomUUID().toString.take(8)
  private val partIdx = partCols.map(schema.fieldIndex)

  /** Ordinal base for incoming rows. Group-based ReplaceData rewrites
    * (SQL UPDATE/MERGE/DELETE) prepend Spark's `__row_operation` int
    * marker to every replacement row, and `ReplaceDataExec` only
    * strips it when the operation declares metadata attributes (the
    * no-metadata path falls back to the non-projecting writing task) —
    * so the row may be `[op, <schema fields...>]` or exactly the
    * schema. Detected once from arity; anything else fails loudly. */
  private var base = -1
  private def baseOf(row: InternalRow): Int = {
    if (base < 0) {
      base = row.numFields - schema.length
      require(base == 0 || base == 1,
        s"row arity ${row.numFields} does not match write schema " +
          s"${schema.length} (+ optional operation column)")
    }
    base
  }
  private val dataFields = schema.fields.zipWithIndex
    .filterNot { case (f, _) => partCols.contains(f.name) }
  private val dataSchema = StructType(dataFields.map(_._1))
  private val msgType = ManifestWriter.messageTypeOf(dataSchema)
  private val groupFactory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)

  private val writers =
    mutable.LinkedHashMap.empty[String, ParquetWriter[
      org.apache.parquet.example.data.Group]]
  private var seq = 0

  private def relDirOf(row: InternalRow): String = {
    val b = baseOf(row)
    val vals = partIdx.zip(partCols).map { case (i0, c) =>
      val i = i0 + b
      if (row.isNullAt(i)) null
      else schema(c).dataType match {
        case StringType  => row.getUTF8String(i).toString
        case IntegerType => row.getInt(i)
        case LongType    => row.getLong(i)
        case DoubleType  => row.getDouble(i)
        case FloatType   => row.getFloat(i)
        case BooleanType => row.getBoolean(i)
        case other => throw new IllegalArgumentException(
          s"unsupported partition column type ${other.catalogString}")
      }
    }
    val sub = ManifestWriter.partitionPath(partCols, vals)
    if (sub.isEmpty) s"data/$commitDir" else s"data/$commitDir/$sub"
  }

  private def writerFor(relDir: String) =
    writers.getOrElseUpdate(relDir, {
      seq += 1
      val file = f"part-$partitionId%05d-$uuid-$seq%03d.parquet"
      GroupWriteSupport.setSchema(msgType, conf)
      ExampleParquetWriter.builder(new Path(s"$root/$relDir/$file"))
        .withConf(conf)
        .withType(msgType)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    })

  override def write(row: InternalRow): Unit = {
    val b = baseOf(row)
    val g = groupFactory.newGroup()
    dataFields.foreach { case (f, i0) =>
      val i = i0 + b
      if (!row.isNullAt(i)) f.dataType match {
        case BooleanType => g.add(f.name, row.getBoolean(i))
        case IntegerType => g.add(f.name, row.getInt(i))
        case LongType    => g.add(f.name, row.getLong(i))
        case FloatType   => g.add(f.name, row.getFloat(i))
        case DoubleType  => g.add(f.name, row.getDouble(i))
        case TimestampType => g.add(f.name, row.getLong(i))
        case DateType      => g.add(f.name, row.getInt(i))
        case StringType  => g.add(f.name,
          Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
        case BinaryType  => g.add(f.name,
          Binary.fromConstantByteArray(row.getBinary(i)))
        case other => throw new IllegalStateException(
          s"unreachable: $other passed messageTypeOf")
      }
    }
    writerFor(relDirOf(row)).write(g)
  }

  private var finished = false
  private def closeAll(): Unit = if (!finished) {
    finished = true
    writers.values.foreach(_.close())
  }

  /** Close all files, then report their exact (path, size) — sizes via
    * one listing per written dir, the commit-time cost the manifest's
    * size column exists to amortize forever after. */
  override def commit(): WriterCommitMessage = {
    closeAll()
    // list only what THIS writer created (its uuid is in every name)
    val fs = new Path(root).getFileSystem(conf)
    ManifestWriteMessage(writers.keys.toSeq.flatMap { relDir =>
      fs.listStatus(new Path(s"$root/$relDir")).toSeq
        .filter(_.getPath.getName.contains(s"-$uuid-"))
        .map(st => s"$relDir/${st.getPath.getName}" -> st.getLen)
    })
  }

  override def abort(): Unit = {
    try closeAll() catch { case scala.util.control.NonFatal(_) => () }
    val fs = new Path(root).getFileSystem(conf)
    writers.keys.foreach { relDir =>
      try fs.listStatus(new Path(s"$root/$relDir")).toSeq
        .filter(_.getPath.getName.contains(s"-$uuid-"))
        .foreach(st => fs.delete(st.getPath, false))
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  override def close(): Unit =
    try closeAll() catch { case scala.util.control.NonFatal(_) => () }
}
