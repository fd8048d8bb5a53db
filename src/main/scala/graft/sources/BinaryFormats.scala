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
}
