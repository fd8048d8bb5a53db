package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Binary wire formats the reference's world speaks natively:
  *
  *   - **Avro object-container files** — the Kafka/Debezium
  *     interchange format (the reference's CDC wire is Debezium; its
  *     schema-registry deployments serialize envelopes as Avro).
  *     Written executor-side through the Hadoop FileSystem API (one
  *     container per partition), read back through
  *     [[org.apache.avro.mapreduce.AvroKeyInputFormat]] — which splits
  *     on Avro sync markers, so a 100 TB container set scans with full
  *     parallelism and never materializes a whole file in memory.
  *
  *   - **EBCDIC fixed-length records** — the mainframe shape the
  *     reference's SortCL heritage is built around (IRI's tooling is
  *     explicitly EBCDIC/COBOL-aware): RECFM=F datasets, every record
  *     exactly L bytes, text in a single-byte EBCDIC code page
  *     (IBM037). Encode is a per-partition charset pass; decode reads
  *     through [[SparkSession.sparkContext.binaryRecords]]
  *     (FixedLengthBinaryInputFormat — splittable at any multiple of
  *     the record length, the same property that makes RECFM=F the
  *     mainframe's bulk-transfer format).
  *
  * Neither path ever collects data to the driver; both write and read
  * with executor parallelism against whatever FileSystem the Hadoop
  * conf resolves (local here, HDFS/S3A on a cluster).
  */
object BinaryFormats {

  // ------------------------------------------------------------ Avro
  /** Write `df` (schema must match `schemaJson` field-for-field, in
    * order, types long/string/double) as one Avro object-container
    * file per partition under `dir`. */
  def writeAvro(df: DataFrame, dir: String, schemaJson: String): Unit = {
    val fields = df.schema.fields.map(_.name)
    val conf = HadoopFs.serializable()
    df.foreachPartition { (it: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val schema = new Schema.Parser().parse(schemaJson)
      val fs = HadoopFs.fs(dir, conf.value)
      val out = fs.create(new Path(s"$dir/part-$pid.avro"), true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        .create(schema, out)
      try it.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fields.length) { rec.put(fields(i), row.get(i)); i += 1 }
        w.append(rec)
      } finally w.close()
    }
  }

  /** Read Avro container files under `dir` as (key-datum) records via
    * the splittable sync-marker-aware input format; `extract` must
    * copy values OUT of the reused datum before returning. */
  def readAvro[T: org.apache.spark.sql.Encoder: scala.reflect.ClassTag](
      spark: SparkSession, dir: String, schemaJson: String)(
      extract: GenericRecord => T): org.apache.spark.sql.Dataset[T] = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val rdd = spark.sparkContext.newAPIHadoopFile(
      dir,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
      .map { case (k, _) => extract(k.datum()) }
    spark.createDataset(rdd)
  }

  // ---------------------------------------------------------- EBCDIC
  /** Write fixed-width text lines (single column `value`, every value
    * exactly `recordLen` chars) as concatenated EBCDIC (IBM037)
    * fixed-length records, one binary part file per partition. */
  def writeEbcdic(lines: DataFrame, dir: String, recordLen: Int,
      codePage: String = "IBM037"): Unit = {
    val conf = HadoopFs.serializable()
    lines.foreachPartition { (it: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val cs = java.nio.charset.Charset.forName(codePage)
      val fs = HadoopFs.fs(dir, conf.value)
      val out = fs.create(new Path(s"$dir/part-$pid.bin"), true)
      try it.foreach { row =>
        val b = row.getString(0).getBytes(cs)
        require(b.length == recordLen,
          s"record is ${b.length} bytes, expected $recordLen " +
            "(non-single-byte chars in a single-byte code page?)")
        out.write(b)
      } finally out.close()
    }
  }

  /** Read RECFM=F EBCDIC records of `recordLen` bytes under `dir`,
    * decode to a one-column (`value`) DataFrame of text lines. */
  def readEbcdic(spark: SparkSession, dir: String, recordLen: Int,
      codePage: String = "IBM037"): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryRecords(dir, recordLen)
      .mapPartitions { it =>
        val cs = java.nio.charset.Charset.forName(codePage)
        it.map(b => new String(b, cs))
      }
      .toDF("value")
  }

  // ------------------------------------------------- EBCDIC RECFM=V
  /** Write variable-length EBCDIC records (mainframe RECFM=V): each
    * record is a 4-byte RDW — 2-byte big-endian length INCLUSIVE of
    * the RDW itself, then 2 reserved zero bytes (z/OS DFSMS record
    * format) — followed by the payload bytes. One part file per
    * partition, so read parallelism equals write parallelism. */
  def writeEbcdicVariable(lines: DataFrame, dir: String,
      codePage: String = "IBM037"): Unit = {
    val conf = HadoopFs.serializable()
    lines.foreachPartition { (it: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val cs = java.nio.charset.Charset.forName(codePage)
      val fs = HadoopFs.fs(dir, conf.value)
      val out = fs.create(new Path(s"$dir/part-$pid.bin"), true)
      try it.foreach { row =>
        val b = row.getString(0).getBytes(cs)
        val len = b.length + 4
        // RDW length is a signed 15-bit field on the mainframe
        require(len <= 0x7FFF,
          s"record is ${b.length} bytes; RECFM=V caps payloads at " +
            s"${0x7FFF - 4}")
        out.write((len >> 8) & 0xFF)
        out.write(len & 0xFF)
        out.write(0)
        out.write(0)
        out.write(b)
      } finally out.close()
    }
  }

  /** Read RECFM=V EBCDIC datasets under `dir` by walking RDWs.
    *
    * Unlike RECFM=F, variable records have NO computable split points —
    * a byte offset is only known to be a record boundary by walking
    * every RDW before it — so the parallel unit is the FILE (exactly
    * the constraint mainframe tooling lives with; the standard scale
    * path is many moderate files, which the per-partition writer
    * produces, or a one-pass record-index sidecar that turns the next
    * read into offset-aligned splits). Each file streams through a
    * bounded buffer — a file is never materialized in memory. */
  def readEbcdicVariable(spark: SparkSession, dir: String,
      codePage: String = "IBM037"): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(dir)
      .flatMap { case (name, pds) =>
        val cs = java.nio.charset.Charset.forName(codePage)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(pds.open(), 1 << 16))
        new Iterator[String] {
          private var nextRec: String = advance()
          private def advance(): String = {
            val b0 = in.read()
            if (b0 < 0) { in.close(); null }
            else {
              val b1 = in.read()
              require(b1 >= 0, s"$name: truncated RDW")
              val len = (b0 << 8) | b1
              require(len >= 4, s"$name: RDW length $len < 4")
              val r2 = in.read(); val r3 = in.read()
              require(r2 == 0 && r3 == 0,
                s"$name: nonzero RDW reserved bytes (not RECFM=V?)")
              val payload = new Array[Byte](len - 4)
              in.readFully(payload)
              new String(payload, cs)
            }
          }
          override def hasNext: Boolean = nextRec != null
          override def next(): String = {
            val r = nextRec; nextRec = advance(); r
          }
        }
      }
      .toDF("value")
  }
}
