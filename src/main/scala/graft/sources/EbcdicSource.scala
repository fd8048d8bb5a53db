package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A REAL DataSourceV2 connector for mainframe RECFM=F EBCDIC
  * datasets — `spark.read.format("graft-ebcdic")` — the connector-API
  * counterpart of the custom-operator ladder (the reference IS a
  * connector product; this is what its file bindings look like done
  * Spark-native instead of through helper functions):
  *
  *   - **schema from the positional field spec** (option `fields` =
  *     `name:start:width,...`, 1-based starts — SortCL's POSITION
  *     grammar), every column surfaced as string (typing happens in
  *     the plan, where Catalyst can see it);
  *   - **splittable scan**: each file splits into record-aligned byte
  *     ranges (option `splitBytes`, default 1 MiB) — RECFM=F's fixed
  *     stride makes EVERY multiple of recordLen a valid split point,
  *     so a 100 TB dataset scans with full parallelism and no
  *     record-boundary scanning;
  *   - **column pruning pushdown** ([[SupportsPushDownRequiredColumns]]):
  *     a 2-column projection decodes 2 substrings per record, not the
  *     whole layout — visible in the scan's ReadSchema (asserted in
  *     BinaryFormatsSpec).
  *
  * Options: `fields` (required), `recordLen` (required), `codePage`
  * (default IBM037), `splitBytes`. */
final class EbcdicSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-ebcdic"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EbcdicSource.schemaFor(EbcdicSource.fieldSpecs(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EbcdicTable(schema, new CaseInsensitiveStringMap(properties))
}

object EbcdicSource {
  final case class FieldSpec(name: String, start: Int, width: Int)

  def fieldSpecs(options: CaseInsensitiveStringMap): Seq[FieldSpec] = {
    val spec = Option(options.get("fields")).getOrElse(
      throw new IllegalArgumentException(
        "graft-ebcdic requires option fields=name:start:width,..."))
    spec.split(",").toSeq.map { f =>
      val Array(n, s, w) = f.trim.split(":")
      FieldSpec(n, s.toInt, w.toInt)
    }
  }

  def schemaFor(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(f => StructField(f.name, StringType)))
}

private final class EbcdicTable(tableSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-ebcdic:${options.get("path")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table properties with per-read options (read options win)
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
    new EbcdicScanBuilder(tableSchema, merged)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ info.options().asScala).asJava)
    new EbcdicWriteBuilder(info.schema(), merged)
  }
}

/** DSv2 WRITE path: each task writes one temp part file of exact-L
  * EBCDIC records and reports it in its commit message; commit renames
  * the temp files into place (write-then-publish — a failed/speculated
  * task's temp file is simply never published, and abort deletes
  * them), so the target directory only ever holds complete files. */
private final class EbcdicWriteBuilder(writeSchema: StructType,
    options: CaseInsensitiveStringMap) extends WriteBuilder {
  override def build(): Write = {
    // fail at plan time, not mid-write on an executor: every incoming
    // column must be a string (the writer calls getUTF8String), and
    // the field spec must cover exactly the schema
    val nonString = writeSchema.fields.filterNot(_.dataType == StringType)
    require(nonString.isEmpty,
      "graft-ebcdic writes string columns only; cast before writing: " +
        nonString.map(f => s"${f.name}: ${f.dataType.simpleString}")
          .mkString(", "))
    new Write {
      override def toBatch: BatchWrite = new EbcdicBatchWrite(
        writeSchema, options)
    }
  }
}

private final case class EbcdicCommit(tempFile: String)
    extends WriterCommitMessage

private final class EbcdicBatchWrite(writeSchema: StructType,
    options: CaseInsensitiveStringMap) extends BatchWrite {
  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-ebcdic requires a save path"))
  private val recordLen = options.get("recordLen").toInt
  private val codePage = Option(options.get("codePage")).getOrElse("IBM037")
  private val allowTruncate =
    Option(options.get("allowTruncate")).exists(_.toBoolean)
  private val specs = EbcdicSource.fieldSpecs(options)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // field order of the incoming rows
    val order = writeSchema.fieldNames.toSeq
    val ordered = specs.sortBy(_.start)
    require(ordered.map(_.name).toSet == order.toSet,
      s"fields option ${ordered.map(_.name)} must cover schema $order")
    new EbcdicWriterFactory(path, recordLen, codePage, allowTruncate,
      ordered, ordered.map(f => order.indexOf(f.name)),
      HadoopFs.serializable())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = HadoopFs.fs(path, HadoopFs.sessionConf())
    fs.mkdirs(new Path(path))
    messages.foreach { case EbcdicCommit(tmp) =>
      val src = new Path(tmp)
      fs.rename(src, new Path(path, src.getName.stripPrefix("_tmp_")))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = HadoopFs.fs(path, HadoopFs.sessionConf())
    messages.foreach {
      case EbcdicCommit(tmp) => fs.delete(new Path(tmp), false)
      case _ => ()
    }
  }
}

private final class EbcdicWriterFactory(path: String, recordLen: Int,
    codePage: String, allowTruncate: Boolean,
    specs: Seq[EbcdicSource.FieldSpec], fieldIdx: Seq[Int],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val cs = java.nio.charset.Charset.forName(codePage)
    private val fs = HadoopFs.fs(path, conf.value)
    private val tmp = new Path(path,
      s"_tmp_part-$partitionId-$taskId.bin")
    private val out = {
      fs.mkdirs(new Path(path))
      fs.create(tmp, true)
    }
    override def write(row: InternalRow): Unit = {
      val sb = new java.lang.StringBuilder(recordLen)
      specs.indices.foreach { i =>
        val v = if (row.isNullAt(fieldIdx(i))) ""
          else row.getUTF8String(fieldIdx(i)).toString
        val w = specs(i).width
        // a mainframe target must not silently lose data: over-width
        // values fail the task unless truncation is opted into
        if (v.length > w && !allowTruncate)
          throw new IllegalArgumentException(
            s"value of ${specs(i).name} is ${v.length} chars, field " +
              s"width is $w (set allowTruncate=true to truncate)")
        val padded =
          if (v.length >= w) v.substring(0, w)
          else v + " " * (w - v.length)
        sb.append(padded)
      }
      val b = sb.toString.getBytes(cs)
      require(b.length == recordLen,
        s"record is ${b.length} bytes, expected $recordLen")
      out.write(b)
    }
    override def commit(): WriterCommitMessage = {
      out.close()
      EbcdicCommit(tmp.toString)
    }
    override def abort(): Unit = {
      // failed/speculated attempts never reach BatchWrite.abort's
      // commit-message sweep — delete the temp file here
      out.close()
      fs.delete(tmp, false)
    }
    override def close(): Unit = ()
  }
}

private final class EbcdicScanBuilder(fullSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's field order; accept empty projections
    // (count(*) pushes an empty schema)
    required = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new EbcdicScan(required, options)
}

/** One partition = one record-aligned byte range of one file. */
private final case class EbcdicPartition(file: String, offset: Long,
    length: Long) extends InputPartition

private final class EbcdicScan(readSchema: StructType,
    options: CaseInsensitiveStringMap) extends Scan with Batch {

  private val recordLen = Option(options.get("recordLen")).map(_.toInt)
    .getOrElse(throw new IllegalArgumentException(
      "graft-ebcdic requires option recordLen"))
  private val codePage = Option(options.get("codePage")).getOrElse("IBM037")
  private val splitBytes = Option(options.get("splitBytes")).map(_.toLong)
    .getOrElse(1L << 20)
  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-ebcdic requires a load path"))
  // the pruned fields' positional specs, in source order
  private val specs = EbcdicSource.fieldSpecs(options)
    .filter(s => readSchema.fieldNames.contains(s.name))

  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ebcdic $path recordLen=$recordLen fields=" +
      specs.map(_.name).mkString(",")

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = HadoopFs.fs(path, HadoopFs.sessionConf())
    val files = fs.listStatus(new Path(path)).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
    // split stride aligned DOWN to a record multiple (min one record)
    val stride = math.max(recordLen.toLong,
      splitBytes / recordLen * recordLen)
    files.flatMap { f =>
      require(f.getLen % recordLen == 0,
        s"${f.getPath}: ${f.getLen} bytes is not a record multiple")
      (0L until f.getLen by stride).map { off =>
        EbcdicPartition(f.getPath.toString, off,
          math.min(stride, f.getLen - off))
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EbcdicReaderFactory(recordLen, codePage, specs,
      HadoopFs.serializable())
}

private final class EbcdicReaderFactory(recordLen: Int, codePage: String,
    specs: Seq[EbcdicSource.FieldSpec],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[EbcdicPartition]
    new PartitionReader[InternalRow] {
      private val cs = java.nio.charset.Charset.forName(codePage)
      private val in = {
        val s = HadoopFs.fs(part.file, conf.value)
          .open(new Path(part.file))
        s.seek(part.offset)
        s
      }
      private val buf = new Array[Byte](recordLen)
      private var remaining = part.length
      private var row: InternalRow = _

      override def next(): Boolean =
        if (remaining < recordLen) false
        else {
          in.readFully(buf, 0, recordLen)
          remaining -= recordLen
          val line = new String(buf, cs)
          row = InternalRow.fromSeq(specs.map { f =>
            UTF8String.fromString(
              line.substring(f.start - 1,
                math.min(f.start - 1 + f.width, line.length)).trim)
          })
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
