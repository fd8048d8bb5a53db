package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}
import graft.{QueryModule, Tables}
import graft.Syntax._

/** §2.10 file source/sink round-trips, driver-verified: data written
  * through the sink and read back must aggregate identically to the
  * original table (the oracle never sees the intermediate file). */
object SourceQueries extends QueryModule {

  /** Staging root for the round-trip intermediates. On a cluster the
    * driver's local temp dir is NOT visible to executors, so set
    * `spark.graft.stagingDir` to a shared location (HDFS/S3A path);
    * unset, it falls back to a driver-local temp dir — correct only
    * where driver and executors share a filesystem (local mode, where
    * the verify gate runs). */
  private def stagingDir(spark: SparkSession, prefix: String): String =
    spark.conf.getOption("spark.graft.stagingDir") match {
      case Some(root) =>
        s"${root.stripSuffix("/")}/$prefix-${java.util.UUID.randomUUID()}"
      case None => Files.createTempDirectory(prefix).toString
    }

  // -------------------------------------- src_delimited_roundtrip
  /** TSV sink → source round-trip (the reference's delimited file
    * target, dataTargetSeparator='\t'), then aggregate. */
  def delimitedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val tmp = stagingDir(spark, "graft-tsv")
    Delimited.write(src, tmp, sep = "\t")
    val schema = StructType(src.schema.fields)
    Delimited.read(spark, tmp, schema, sep = "\t")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("total"))
      .reportSort("o_orderstatus")
  }

  val delimitedRoundtripSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------- src_fixedwidth_roundtrip
  /** Fixed-width (positional) format → parse round-trip, the SortCL
    * POSITION-field shape, done entirely with codegen'd substrings. */
  def fixedWidthRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val fields = Seq(
      Delimited.FixedField("n_nationkey", 1, 5),
      Delimited.FixedField("n_name", 6, 20),
      Delimited.FixedField("n_regionkey", 26, 5))
    val lines = Delimited.formatFixedWidth(
      Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey"),
      fields)
    Delimited.parseFixedWidth(lines, fields)
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"))
      .reportSort("n_nationkey")
  }

  val fixedWidthRoundtripSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  // ------------------------------------- src_multiline_csv
  /** Quoted-CSV round-trip with EMBEDDED newlines, quotes and
    * delimiters inside a field — the corner every naive line-splitting
    * reader corrupts (a quoted field may span physical lines; Spark's
    * `multiLine` parser handles it, and the written quoting must agree
    * with the read escaping). The comment field is synthesized to
    * contain all three hazards; the verified output carries each
    * field's md5, proving the BYTES survived the sink→source trip —
    * the oracle rebuilds the same field from the base table and never
    * sees the intermediate file. */
  def multilineCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val comment = concat(col("n_name"), lit(",\"li\nne1\n"),
      lit("line2 of "), col("n_name"))
    val src = Tables.nation(spark, dir)
      .select(col("n_nationkey"), comment.as("comment"))
    val tmp = stagingDir(spark, "graft-mlcsv")
    src.write.option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").mode("overwrite").csv(tmp)
    spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .schema(StructType(src.schema.fields)).csv(tmp)
      .select(col("n_nationkey"),
        length(col("comment")).as("clen"),
        md5(col("comment")).as("cmd5"))
      .reportSort("n_nationkey")
  }

  val multilineCsvRoundtripSql: String =
    """WITH c AS (
      |  SELECT n_nationkey,
      |    n_name || ',"li' || chr(10) || 'ne1' || chr(10) ||
      |      'line2 of ' || n_name AS comment
      |  FROM nation)
      |SELECT n_nationkey, CAST(length(comment) AS INTEGER) AS clen,
      |  md5(comment) AS cmd5
      |FROM c ORDER BY n_nationkey""".stripMargin

  // ------------------------------------------ src_gzip_text
  /** Compressed text round-trip: the sink writes gzip (the standard
    * interchange codec for line-oriented dumps), the source
    * decompresses transparently by extension — the "my extracts are
    * .gz" reality of every warehouse hand-off. Codec work happens in
    * the JVM's Deflater on write and per-split decompress on read
    * (gzip is NOT splittable — at 100 TB write MANY files so read
    * parallelism = file count, which the partitioned write gives for
    * free; a splittable codec or parquet is the preferred lake
    * format, this op covers the interchange reality). R7OpsSpec pins
    * that the staged bytes really are gzip. */
  def gzipTextRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.nation(spark, dir)
      .select(concat_ws("|", col("n_nationkey"), col("n_name"))
        .as("value"))
    val tmp = stagingDir(spark, "graft-gz")
    src.write.option("compression", "gzip").mode("overwrite").text(tmp)
    spark.read.text(tmp)
      .select(split(col("value"), "\\|").as("p"))
      .select(col("p").getItem(0).cast("int").as("n_nationkey"),
        col("p").getItem(1).as("n_name"))
      .reportSort("n_nationkey")
  }

  val gzipTextRoundtripSql: String =
    """SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"""

  // ---------------------------------------- src_jsonl_changelog
  /** JSONL change-stream interchange: serialize a Debezium-style
    * envelope stream to a JSON-lines file (the wire format the
    * reference consumes), read it back as text, parse, and compact to
    * current state — the full file-based CDC hand-off. */
  def jsonlChangelog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val ev = Tables.events(spark, dir)
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d").otherwise("u")
    val json = graft.cdc.Envelope.wrap(
      lit(null).cast(rowSchema),
      struct(col("event_id"), col("user_id"), col("value")),
      "graft", "events", op,
      expr("unix_micros(cast(ts as timestamp)) div 1000"))
    val tmp = stagingDir(spark, "graft-jsonl")
    ev.select(json.as("value")).write.mode("overwrite").text(tmp)
    val parsed = graft.cdc.Envelope.parse(
      spark.read.text(tmp), col("value"), rowSchema)
    val w = Window.partitionBy("after.user_id")
      .orderBy(desc("ts_ms"), desc("after.event_id"))
    parsed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).filter(col("op") =!= "d")
      .select(col("after.user_id").as("user_id"),
        col("after.value").as("value"),
        col("after.event_id").as("last_event_id"))
      .orderBy("user_id")
  }

  val jsonlChangelogSql: String =
    """WITH log AS (
      |  SELECT event_id, epoch_us(ts) // 1000 AS ts_ms, user_id, value,
      |    CASE WHEN event_type = 'signup' THEN 'c'
      |         WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
      |  FROM events),
      |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY ts_ms DESC, event_id DESC) AS rn FROM log)
      |SELECT user_id, value, event_id AS last_event_id
      |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin

  // -------------------------------------------- src_ldif_roundtrip
  /** LDIF (RFC 2849) sink → source round-trip — the reference's LDIF
    * data-info binding (`FileDataInfo type="LDIF"` in its data-class
    * library). Write: each row becomes a `dn:` + attribute block,
    * blank-line separated, with one attribute carried as `attr::
    * base64` to exercise the encoded-value rule. Read: the text
    * source splits on the blank-line record separator (`lineSep` =
    * "\n\n" — records stay splittable at file granularity), and
    * per-attribute extraction is a codegen multiline regex. The
    * oracle never sees the file: round-tripped rows must equal the
    * source table exactly. */
  def ldifRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val tmp = stagingDir(spark, "graft-ldif")
    val rec = concat(
      lit("dn: nationkey="), col("n_nationkey"),
      lit(",ou=nations,dc=graft\n"),
      lit("objectClass: nation\n"),
      lit("nationkey: "), col("n_nationkey"), lit("\n"),
      lit("name:: "), base64(col("n_name").cast("binary")), lit("\n"),
      lit("regionkey: "), col("n_regionkey"), lit("\n"))
    n.select(rec.as("value")).write.mode("overwrite").text(tmp)
    spark.read.option("lineSep", "\n\n").text(tmp)
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "(?m)^nationkey: (.*)$", 1)
          .cast("int").as("n_nationkey"),
        unbase64(regexp_extract(col("value"), "(?m)^name:: (.*)$", 1))
          .cast("string").as("n_name"),
        regexp_extract(col("value"), "(?m)^regionkey: (.*)$", 1)
          .cast("int").as("n_regionkey"))
      .reportSort("n_nationkey")
  }

  val ldifRoundtripSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  // --------------------------------------------- src_mbox_ingest
  /** MBOX (mboxrd) sink → source round-trip — the mail-archive
    * container format every large text-corpus pipeline eventually
    * ingests (mailing-list dumps are a classic pretraining source).
    * Write: each document becomes one message — a `From ` envelope
    * line, `Message-ID`/`Content-Language` headers, a blank line,
    * then the body with REAL mboxrd From-munging (`^(>*From )` →
    * `>$1`), the quirk that makes mbox non-trivial: body lines that
    * start with `From ` must be quoted or they'd be read as message
    * boundaries. Every record carries an injected `From `-leading
    * probe first line so the munge/unmunge pair executes on every
    * message, not just pathological data. Read: the text source
    * splits records on the `"\nFrom "` envelope separator (files
    * stay splittable — Hadoop's line reader handles multi-byte
    * delimiters), headers parse with codegen multiline regexes, the
    * body un-munges (`^>(>*From )` → `$1`), drops the probe line and
    * the writer's final trailing newline (document bodies are
    * newline-free — asserted by the oracle equality itself). The
    * oracle never sees a file: per-language message count, id sum,
    * and recovered body length must equal the source table. */
  def mboxIngest(spark: SparkSession, dir: String): DataFrame = {
    val tmp = stagingDir(spark, "graft-mbox")
    val body = regexp_replace(
      concat(lit("From mbox-munge-probe\n"), col("text")),
      "(?m)^(>*From )", ">$1")
    Tables.documents(spark, dir)
      .select(concat(
        lit("From graft@local Thu Jan  1 00:00:00 1970\n"),
        lit("Message-ID: <"), col("doc_id"), lit("@graft>\n"),
        lit("Content-Language: "), col("lang"), lit("\n\n"),
        body).as("value"))
      .write.mode("overwrite").text(tmp)
    spark.read.option("lineSep", "\nFrom ").text(tmp)
      .select(regexp_replace(col("value"), "^From ", "").as("v"))
      .select(
        regexp_extract(col("v"), "(?m)^Message-ID: <(\\d+)@graft>$", 1)
          .cast("long").as("doc_id"),
        regexp_extract(col("v"), "(?m)^Content-Language: (\\S+)$", 1)
          .as("lang"),
        regexp_replace(regexp_replace(regexp_replace(
          regexp_extract(col("v"), "(?s)\n\n(.*)$", 1),
          "(?m)^>(>*From )", "$1"),
          "^From mbox-munge-probe\n", ""),
          "\n$", "").as("body"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_msgs"),
        sum(col("doc_id")).as("sum_doc_id"),
        sum(length(col("body"))).as("sum_body_chars"))
      .reportSort("lang")
  }

  val mboxIngestSql: String =
    """SELECT lang, COUNT(*) AS n_msgs,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_body_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------- src_syslog_ingest
  /** SYSLOG (RFC 5424) sink → source round-trip — the log-transport
    * line format an observability pipeline ingests by the terabyte.
    * Write: each event becomes one frame
    * `<PRI>1 TIMESTAMP HOSTNAME APP-NAME PROCID MSGID - MSG` with the
    * RFC's one genuinely lossy encoding exercised for real: PRI packs
    * facility and severity as `facility·8 + severity` (here facility =
    * user_id mod 24, severity = event_id mod 8 — both arithmetic, so
    * the oracle can recompute them without seeing a file), and the
    * timestamp serializes at full microsecond precision. Read: plain
    * splittable text lines, PRI decomposed back by `div`/`%`, the
    * timestamp re-parsed, every field regex-extracted by codegen
    * expressions. The audit rolls up per severity: frame count,
    * distinct facilities, id sum, and the earliest parsed timestamp
    * (epoch seconds) — equality with the table-side recompute proves
    * the encode/decode pair is lossless including the PRI packing. */
  def syslogIngest(spark: SparkSession, dir: String): DataFrame = {
    val tmp = stagingDir(spark, "graft-syslog")
    Tables.events(spark, dir)
      .select(concat(
        lit("<"),
        pmod(col("user_id"), lit(24L)) * 8 + pmod(col("event_id"), lit(8L)),
        lit(">1 "),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        lit(" host"), pmod(col("user_id"), lit(16L)),
        lit(" "), col("event_type"),
        lit(" "), col("event_id"),
        lit(" evt - user="), col("user_id")).as("value"))
      .write.mode("overwrite").text(tmp)
    spark.read.text(tmp)
      .select(
        regexp_extract(col("value"), "^<(\\d+)>1 ", 1).cast("long")
          .as("pri"),
        to_timestamp(
          regexp_extract(col("value"), "^<\\d+>1 (\\S+) ", 1),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("ts"),
        regexp_extract(col("value"), "^<\\d+>1 \\S+ (\\S+) ", 1)
          .as("host"),
        regexp_extract(col("value"),
          "^<\\d+>1 \\S+ \\S+ \\S+ (\\d+) evt", 1).cast("long")
          .as("procid"))
      .select(expr("pri % 8").as("severity"),
        expr("pri div 8").as("facility"),
        col("host"), col("procid"), col("ts"))
      .groupBy("severity")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("facility")).as("n_facilities"),
        sum(col("procid")).as("sum_event_id"),
        expr("min(unix_micros(cast(ts as timestamp))) div 1000000")
          .as("first_ts_s"))
      .reportSort("severity")
  }

  val syslogIngestSql: String =
    """SELECT event_id % 8 AS severity, COUNT(*) AS n_frames,
      |  CAST(COUNT(DISTINCT user_id % 24) AS BIGINT) AS n_facilities,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
      |  CAST(MIN(epoch_us(ts)) // 1000000 AS BIGINT) AS first_ts_s
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------- src_xml_roundtrip
  /** XML sink → source round-trip on Spark 4's BUILT-IN xml data
    * source (rowTag framing) — the reference's `type="XML"` data-info
    * binding. Values survive as text and are restored by the explicit
    * read schema (Double.toString ↔ parse is an exact round-trip);
    * the aggregation then must match the original table. */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val tmp = stagingDir(spark, "graft-xml")
    src.write.mode("overwrite").option("rowTag", "order")
      .format("xml").save(tmp)
    spark.read.option("rowTag", "order")
      .schema(StructType(src.schema.fields))
      .format("xml").load(tmp)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("total"))
      .reportSort("o_orderstatus")
  }

  val xmlRoundtripSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------- src_orc_roundtrip
  /** Columnar ORC sink → source round-trip (Spark's second built-in
    * columnar format beside parquet — types survive natively, no
    * parse step), then the same aggregation as the delimited check. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val tmp = stagingDir(spark, "graft-orc")
    src.write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("total"))
      .reportSort("o_orderstatus")
  }

  val orcRoundtripSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------ src_partitioned_prune
  /** Hive-style partitioned layout + partition pruning: documents are
    * written `partitionBy(lang)`, and a lang-filtered read touches ONLY
    * the matching directories — the scan's PartitionFilters prune
    * before any file IO (PlanSpec asserts the plan property; the
    * oracle proves result identity). At 100 TB this is the first-line
    * data-skipping layout: a 5-language filter on a lang-partitioned
    * corpus reads 1/5th of the bytes no matter the corpus size. */
  def partitionedPrune(spark: SparkSession, dir: String): DataFrame = {
    partitionedDocs(spark, dir)
      .filter(col("lang").isin("en", "zh"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy("lang", "source")
  }

  /** The partitioned write is a one-time layout (like q26's buckets):
    * keyed by a content fingerprint of the source ([[Tables.layoutTag]]),
    * written once per session, re-read thereafter; regenerated source
    * data gets a fresh layout. Session-scoped, never cross-run (see
    * [[Tables.sessionLayoutRoot]]). */
  def partitionedDocs(spark: SparkSession, dir: String): DataFrame = {
    val tag = Tables.layoutTag(dir)
    val loc = new java.io.File(s"${Tables.sessionLayoutRoot}/graft_part_$tag")
    if (!new java.io.File(loc, "_SUCCESS").exists())
      Tables.documents(spark, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(loc.toString)
    spark.read.parquet(loc.toString)
  }

  val partitionedPruneSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM documents WHERE lang IN ('en', 'zh')
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ------------------------------------------------ src_sheet_range
  /** Spreadsheet range source, the reference's XLSX data-info binding
    * (reference: iriLibrary.dataclass `FileDataInfo` fileName grammar
    * `'Sheet1'!A1:C7,HEADER;path.xlsx`): nation is written ONCE as a
    * real XLSX workbook ([[SheetRange.write]]), and a SUB-range is
    * read back distributed ([[SheetRange.read]]) — rows 2-10 of
    * columns A-B under the header row must select exactly nations 0-8,
    * which the oracle pins with an equivalent key-range predicate. */
  def sheetRange(spark: SparkSession, dir: String): DataFrame = {
    val tag = Tables.layoutTag(dir)
    val f =
      new java.io.File(s"${Tables.sessionLayoutRoot}/graft_sheet_$tag.xlsx")
    if (!f.exists()) {
      // temp + move: a concurrent reader never sees a partial zip.
      // Files.move (not File.renameTo, whose false return is easy to
      // drop) raises if the publish fails — except when a concurrent
      // writer already published the identical content-keyed file.
      val tmp = java.io.File.createTempFile("graft_sheet", ".xlsx")
      SheetRange.write(
        Tables.nation(spark, dir)
          .select("n_nationkey", "n_name", "n_regionkey")
          .orderBy("n_nationkey"), tmp.toString)
      try java.nio.file.Files.move(tmp.toPath, f.toPath)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => tmp.delete()
      }
    }
    SheetRange.read(spark, s"'Sheet1'!A1:B10,HEADER;$f")
      .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"))
      .reportSort("n_nationkey")
  }

  val sheetRangeSql: String =
    """SELECT n_nationkey, n_name FROM nation
      |WHERE n_nationkey BETWEEN 0 AND 8 ORDER BY n_nationkey""".stripMargin

  // -------------------------------------------- src_avro_roundtrip
  /** Avro object-container sink → source round-trip — the CDC-world
    * interchange format (Debezium + schema registry serialize change
    * envelopes as Avro; the reference's Kafka deployments consume
    * exactly this wire shape). Write: one container per partition,
    * executor-side, through the Hadoop FileSystem API. Read: the
    * sync-marker-splittable [[org.apache.avro.mapreduce.AvroKeyInputFormat]]
    * — at 100 TB each 128 MB split decodes independently; no file is
    * ever whole in memory. The oracle never sees the files: the
    * round-tripped aggregation must equal the original table's. */
  def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"Order","fields":[
        |{"name":"o_orderkey","type":"long"},
        |{"name":"o_orderstatus","type":"string"},
        |{"name":"o_totalprice","type":"double"}]}""".stripMargin
    val src = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val tmp = stagingDir(spark, "graft-avro")
    BinaryFormats.writeAvro(src, tmp, schemaJson)
    BinaryFormats.readAvro(spark, tmp, schemaJson) { r =>
      (r.get("o_orderkey").asInstanceOf[Long],
        r.get("o_orderstatus").toString,
        r.get("o_totalprice").asInstanceOf[Double])
    }.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("total"))
      .reportSort("o_orderstatus")
  }

  val avroRoundtripSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------ src_ebcdic_fixedwidth
  /** Mainframe round-trip: RECFM=F fixed-length records in EBCDIC
    * (code page IBM037) — the SortCL-heritage surface the reference's
    * product family is explicitly built for (COBOL datasets moving off
    * z/OS). Encode: the fixed-width formatter then a per-partition
    * charset pass writing exact-L-byte records. Decode:
    * `binaryRecords` (FixedLengthBinaryInputFormat — splittable at any
    * record multiple, RECFM=F's defining property) then IBM037→UTF-16
    * and positional parse. The oracle pins the round-trip against the
    * original table. */
  def ebcdicFixedwidth(spark: SparkSession, dir: String): DataFrame = {
    val fields = Seq(
      Delimited.FixedField("n_nationkey", 1, 5),
      Delimited.FixedField("n_name", 6, 20),
      Delimited.FixedField("n_regionkey", 26, 5))
    val recordLen = fields.map(_.width).sum
    val lines = Delimited.formatFixedWidth(
      Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey"),
      fields)
    val tmp = stagingDir(spark, "graft-ebcdic")
    BinaryFormats.writeEbcdic(lines, tmp, recordLen)
    // read back through the REAL DataSourceV2 connector
    // ([[EbcdicSource]] — record-aligned splits, pruning pushdown),
    // not the helper: the driver gate covers the connector path.
    // Short name first (exercises the META-INF/services registration);
    // FQCN fallback because ServiceLoader scans have been observed to
    // fail transiently under a cold classpath — the connector itself
    // is identical either way.
    def readVia(fmt: String) = spark.read.format(fmt)
      .option("fields",
        fields.map(f => s"${f.name}:${f.start}:${f.width}").mkString(","))
      .option("recordLen", recordLen.toString)
      .load(tmp)
    (try readVia("graft-ebcdic")
     catch { case _: Throwable => readVia(classOf[EbcdicSource].getName) })
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"))
      .reportSort("n_nationkey")
  }

  val ebcdicFixedwidthSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  // ------------------------------------------- src_cobol_occurs
  /** COBOL OCCURS (repeating group) decode — the copybook shape beside
    * COMP-3 ([[cobolComp3]]): a RECFM=F record whose layout is
    * `ORDER-KEY PIC 9(9)` followed by `AMOUNT PIC 9(11) OCCURS 4
    * TIMES` (four 11-digit display-format cent amounts inline). Encode
    * derives the occurrences arithmetically from the order
    * (occurrence q = cents·q mod 10^11 — oracle-recomputable), writes
    * REAL EBCDIC fixed-length records, reads them back through the
    * splittable binaryRecords path, and the decode slices each
    * occurrence positionally and UNROLLS it with posexplode — the
    * row-per-occurrence normalization every COBOL migration performs.
    * Per-occurrence audit: count + exact cent total. */
  def cobolOccurs(spark: SparkSession, dir: String): DataFrame = {
    val occurs = 4
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val amounts = (1 to occurs).map(q =>
      lpad(((cents * q) % 100000000000L).cast("string"), 11, "0"))
    val line = concat(
      (lpad(col("o_orderkey").cast("string"), 9, "0") +: amounts): _*)
    val recordLen = 9 + 11 * occurs
    val tmp = stagingDir(spark, "graft-occurs")
    BinaryFormats.writeEbcdic(
      Tables.orders(spark, dir).select(line.as("value")), tmp, recordLen)
    val back = BinaryFormats.readEbcdic(spark, tmp, recordLen)
    val occ = array((1 to occurs).map(q =>
      substring(col("value"), 10 + (q - 1) * 11, 11).cast("long")): _*)
    back.select(posexplode(occ).as(Seq("occ0", "amount_cents")))
      .select((col("occ0") + 1).cast("long").as("occurrence"),
        col("amount_cents"))
      .groupBy("occurrence")
      .agg(count(lit(1)).as("n"), sum(col("amount_cents")).as("total_cents"))
      .reportSort("occurrence")
  }

  val cobolOccursSql: String =
    """WITH c AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    AS cents
      |  FROM orders),
      |o AS (
      |  SELECT q.occurrence, (c.cents * q.occurrence) % 100000000000
      |    AS amount_cents
      |  FROM c CROSS JOIN
      |    (SELECT unnest([1, 2, 3, 4]) AS occurrence) q)
      |SELECT CAST(occurrence AS BIGINT) AS occurrence, COUNT(*) AS n,
      |  CAST(SUM(amount_cents) AS BIGINT) AS total_cents
      |FROM o GROUP BY occurrence ORDER BY occurrence""".stripMargin

  // ------------------------------------------- src_avro_changelog
  /** The Avro CDC wire end-to-end in BATCH: the same change-stream
    * hand-off as [[jsonlChangelog]], but the envelopes travel as Avro
    * object containers (Debezium + schema registry) instead of JSONL —
    * serialize each change as an envelope-shaped Avro record
    * (executor-side container writes), read the containers back
    * through the splittable input format, print each record to
    * canonical JSON (GenericData's toString), and compact through the
    * SAME [[graft.cdc.Envelope.parse]] plan. Oracle identical to the
    * JSONL form: the wire format must be invisible to the result. */
  def avroChangelog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    import spark.implicits._
    val envSchema =
      """{"type":"record","name":"Env","fields":[{"name":"payload","type":
        |{"type":"record","name":"P","fields":[
        |{"name":"after","type":{"type":"record","name":"R","fields":[
        |  {"name":"event_id","type":"long"},{"name":"user_id","type":"long"},
        |  {"name":"value","type":["null","double"],"default":null}]}},
        |{"name":"source","type":{"type":"record","name":"S","fields":[
        |  {"name":"db","type":"string"},{"name":"table","type":"string"}]}},
        |{"name":"op","type":"string"},{"name":"ts_ms","type":"long"}]}}]}"""
        .stripMargin
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        when(col("event_type") === "signup", "c")
          .when(col("event_type") === "error", "d").otherwise("u").as("op"),
        expr("unix_micros(cast(ts as timestamp)) div 1000").as("ts_ms"))
      // width-pin the container write: the per-record Avro serialization
      // otherwise runs in the scan's single task at bench SF; width
      // follows the cluster, the splittable read-back parallelizes the
      // same way, and the compaction window downstream is unaffected by
      // file layout
      .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
    val tmp = stagingDir(spark, "graft-avro-cdc")
    ev.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val schema = new org.apache.avro.Schema.Parser().parse(envSchema)
      val pS = schema.getField("payload").schema()
      val rS = pS.getField("after").schema()
      val sS = pS.getField("source").schema()
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new org.apache.hadoop.conf.Configuration())
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$tmp/p$pid.avro"), true)
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema)).create(schema, out)
      try it.foreach { r =>
        val row = new org.apache.avro.generic.GenericData.Record(rS)
        row.put("event_id", r.getLong(0)); row.put("user_id", r.getLong(1))
        row.put("value", if (r.isNullAt(2)) null else Double.box(r.getDouble(2)))
        val src = new org.apache.avro.generic.GenericData.Record(sS)
        src.put("db", "graft"); src.put("table", "events")
        val p = new org.apache.avro.generic.GenericData.Record(pS)
        p.put("after", row); p.put("source", src)
        p.put("op", r.getString(3)); p.put("ts_ms", r.getLong(4))
        val env = new org.apache.avro.generic.GenericData.Record(schema)
        env.put("payload", p)
        w.append(env)
      } finally w.close()
    }
    val json = BinaryFormats.readAvro(spark, tmp, envSchema)(_.toString)
      .toDF("value")
    val parsed = graft.cdc.Envelope.parse(json, col("value"), rowSchema)
    val w = Window.partitionBy("after.user_id")
      .orderBy(desc("ts_ms"), desc("after.event_id"))
    parsed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).filter(col("op") =!= "d")
      .select(col("after.user_id").as("user_id"),
        col("after.value").as("value"),
        col("after.event_id").as("last_event_id"))
      .orderBy("user_id")
  }

  val avroChangelogSql: String = jsonlChangelogSql

  // ------------------------------------------------ src_cobol_comp3
  /** COBOL COMP-3 (packed decimal) round-trip — the other half of the
    * mainframe story beside RECFM=F/EBCDIC: amounts live as BCD
    * nibbles (two digits per byte, sign in the final nibble: C=+,
    * D=−). Encode: integer cents → odd-length digit string → packed
    * bytes (`unhex` — the hex text IS the nibble layout). The bytes
    * round-trip a binary parquet column (what a COMP-3 field looks
    * like after a 1:1 mainframe pull), and decode reverses it with
    * builtins only: `hex` → sign nibble switch → digits → DECIMAL.
    * The oracle pins decoded values AND sign handling against pure
    * arithmetic on the source; negatives are exercised by balancing
    * each order against the mean. */
  def cobolComp3(spark: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast("long") - lit(15000000L) // force a negative population
    val sign = when(cents < 0, "D").otherwise("C")
    val digits = lpad(abs(cents).cast("string"), 11, "0")
    val packed = unhex(concat(digits, sign))
    val tmp = stagingDir(spark, "graft-comp3")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), packed.as("amount_comp3"))
      .write.mode("overwrite").parquet(tmp)
    val h = upper(hex(col("amount_comp3")))
    val mag = substring(h, 1, 11).cast("long")
    val decodedCents = when(substring(h, 12, 1) === "D", -mag).otherwise(mag)
    // aggregate exact integer CENTS; one double division at the end
    // (decimal division detours through double in the oracle engine)
    spark.read.parquet(tmp)
      .select(decodedCents.as("cents"))
      .groupBy()
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") < 0, 1L).otherwise(0L)).as("n_negative"),
        (sum(col("cents")).cast("double") / 100).as("total"),
        (min(col("cents")).cast("double") / 100).as("min_amount"),
        (max(col("cents")).cast("double") / 100).as("max_amount"))
  }

  val cobolComp3Sql: String =
    """WITH c AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    - 15000000 AS cents
      |  FROM orders)
      |SELECT COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_negative,
      |  CAST(SUM(cents) AS DOUBLE) / 100 AS total,
      |  CAST(MIN(cents) AS DOUBLE) / 100 AS min_amount,
      |  CAST(MAX(cents) AS DOUBLE) / 100 AS max_amount
      |FROM c""".stripMargin

  // ------------------------------------------------- src_recfm_vb
  /** Mainframe RECFM=V round-trip — variable-length EBCDIC records
    * behind 4-byte RDWs ([[BinaryFormats.writeEbcdicVariable]]), the
    * OTHER record format a z/OS migration meets beside RECFM=F.
    * Layout: 9-digit doc id + 8-char padded language + the raw
    * variable-length document text (what makes the record variable).
    * Decode slices the fixed prefix positionally and takes the
    * remainder as the payload — record length itself carries
    * information, so the audit sums the recovered text lengths per
    * language. RECFM=V has no computable split points (see
    * [[BinaryFormats.readEbcdicVariable]]); parallelism is per file,
    * which the per-partition writer supplies. */
  def recfmVb(spark: SparkSession, dir: String): DataFrame = {
    val line = concat(
      lpad(col("doc_id").cast("string"), 9, "0"),
      rpad(col("lang"), 8, " "),
      col("text"))
    val tmp = stagingDir(spark, "graft-recfmv")
    BinaryFormats.writeEbcdicVariable(
      Tables.documents(spark, dir).select(line.as("value")), tmp)
    BinaryFormats.readEbcdicVariable(spark, tmp)
      .select(
        substring(col("value"), 1, 9).cast("long").as("doc_id"),
        trim(substring(col("value"), 10, 8)).as("lang"),
        (length(col("value")) - 17).cast("long").as("text_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("id_total"),
        sum(col("text_chars")).as("text_total"))
      .reportSort("lang")
  }

  val recfmVbSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_total,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS text_total
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------- src_schema_evolution
  /** Parquet schema evolution across historical batches — the lake
    * reality every long-lived pipeline meets: batch 1 was written
    * before a column existed, batch 2 carries it, and readers must see
    * ONE schema with nulls where history is silent. Batches split
    * deterministically (even/odd order key), batch 2 adds
    * `price_cents`; the read goes through `mergeSchema` (parquet
    * footer union — at scale set `spark.sql.parquet.mergeSchema` off
    * and a metastore holds the merged schema instead; the NULL
    * semantics this key verifies are identical). Audit: per batch the
    * row count, missing-column count, and exact cent total. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val tmp = stagingDir(spark, "graft-evolve")
    val orders = Tables.orders(spark, dir)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$tmp/batch=1")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("price_cents"))
      .write.mode("overwrite").parquet(s"$tmp/batch=2")
    spark.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy("batch")
      .agg(count(lit(1)).as("n"),
        sum(when(col("price_cents").isNull, 1L).otherwise(0L))
          .as("n_missing"),
        sum(coalesce(col("price_cents"), lit(0L))).as("total_cents"))
      .select(col("batch").cast("long").as("batch"), col("n"),
        col("n_missing"), col("total_cents"))
      .reportSort("batch")
  }

  val schemaEvolutionSql: String =
    """SELECT CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
      |    AS batch,
      |  COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing,
      |  CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS total_cents
      |FROM orders GROUP BY 1 ORDER BY batch""".stripMargin

  // ------------------------------------------------ src_report_sink
  /** SortCL-heritage REPORT target: the reference's product line began
    * as a report generator (sort → group → subtotal → formatted text),
    * and its script language still carries the report surface. Here:
    * group subtotal lines plus a grand-total trailer, formatted as
    * fixed-width text, written, READ BACK, positionally parsed, and
    * verified — every subtotal AND the grand total must survive the
    * text round-trip exactly (decimals as exact strings, no float
    * formatting). The oracle recomputes both levels from the table. */
  def reportSink(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"))
    val detail = g.select(concat(
      lit("G "), rpad(col("o_orderstatus"), 4, " "),
      lpad(col("n").cast("string"), 12, " "),
      lpad(col("total").cast("string"), 24, " ")).as("value"))
    val trailer = g.agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
      .select(concat(lit("T "), rpad(lit("*"), 4, " "),
        lpad(col("n").cast("string"), 12, " "),
        lpad(col("total").cast("string"), 24, " ")).as("value"))
    val tmp = stagingDir(spark, "graft-report")
    detail.union(trailer).write.mode("overwrite").text(tmp)
    val back = spark.read.text(tmp).select(
      substring(col("value"), 1, 1).as("tag"),
      trim(substring(col("value"), 3, 4)).as("o_orderstatus"),
      trim(substring(col("value"), 7, 12)).cast("long").as("n"),
      trim(substring(col("value"), 19, 24)).cast(DecimalType(28, 2))
        .as("total"))
    val groups = back.filter(col("tag") === "G")
      .select(col("o_orderstatus"), col("n"),
        col("total").cast("double").as("total"))
    val grand = back.filter(col("tag") === "T")
      .select(col("n").as("grand_n"),
        col("total").cast("double").as("grand_total"))
    groups.crossJoin(broadcast(grand)).reportSort("o_orderstatus")
  }

  val reportSinkSql: String =
    """WITH g AS (
      |  SELECT o_orderstatus, COUNT(*) AS n,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, n, CAST(total AS DOUBLE) AS total,
      |  CAST((SELECT SUM(n) FROM g) AS BIGINT) AS grand_n,
      |  CAST((SELECT SUM(total) FROM g) AS DOUBLE) AS grand_total
      |FROM g ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------- src_warc_ingest
  /** WARC ingest round-trip — the Common Crawl shape ([[WarcSource]]):
    * documents leave as `response` records (URL synthesized from
    * source+doc_id, language in the Common Crawl header field,
    * payload length-delimited UTF-8) and come back through the
    * streaming per-file parser. The verification is strict: the
    * payload-hash SUM proves every text round-tripped bit-exact (a
    * single flipped byte moves the sum), `total_bytes` pins the
    * Content-Length accounting, and `first_url` pins the URI header —
    * while the oracle computes all three straight from the documents
    * table, never seeing a WARC byte. */
  def warcIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      concat(lit("https://"), col("source"), lit(".example.com/doc/"),
        col("doc_id").cast("string")).as("url"),
      col("lang"), col("text"))
    val tmp = stagingDir(spark, "graft-warc")
    WarcSource.write(docs, tmp)
    WarcSource.read(spark, tmp)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("content_length")).as("total_bytes"),
        sum(graft.mask.MaskFunctions.portableHash(col("text")))
          .as("payload_hash"),
        min(col("url")).as("first_url"))
      .reportSort("lang")
  }

  val warcIngestSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
      |  CAST(SUM(('0x'||substr(md5(text),1,8))::BIGINT) AS BIGINT)
      |    AS payload_hash,
      |  MIN('https://'||source||'.example.com/doc/'||
      |    CAST(doc_id AS VARCHAR)) AS first_url
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------ gen_rowgen
  /** Deterministic synthetic data generation — the reference family's
    * RowGen surface (IRI ships a test-data generator alongside the
    * masker; same engine, generation instead of transformation).
    * `spark.range` is the distributed generator (no data read, N
    * splits), every field derives from a portable md5 hash of the row
    * id — so any engine regenerates bit-identical rows (the oracle
    * regenerates them in DuckDB from `range()` and must match
    * exactly) — and set-valued fields draw from a real dimension
    * table (nation) via hash-mod pick, broadcast-joined. */
  def rowGen(spark: SparkSession, dir: String): DataFrame = {
    val n = 1000
    val names = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val h = graft.mask.MaskFunctions.portableHash(
      concat(lit("rowgen:"), col("id").cast("string")))
    spark.range(n).select(col("id"), h.as("_h"))
      .select(col("id"),
        (col("_h") % 25).as("_nk"),
        expr("(_h div 25) % 10000").as("amount_cents"),
        date_add(lit(java.sql.Date.valueOf("1995-01-01")),
          (col("_h") % 365).cast("int")).as("gen_date"))
      .join(broadcast(names), col("_nk") === col("n_nationkey"))
      .select(col("id"), col("n_name").as("name"),
        col("amount_cents"), col("gen_date"))
      .reportSort("id")
  }

  val rowGenSql: String =
    """WITH g AS (
      |  SELECT r.range AS id,
      |    ('0x'||substr(md5('rowgen:'||CAST(r.range AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM range(0, 1000) r)
      |SELECT g.id, n.n_name AS name,
      |  (g.h // 25) % 10000 AS amount_cents,
      |  DATE '1995-01-01' + CAST(g.h % 365 AS INTEGER) AS gen_date
      |FROM g JOIN nation n ON g.h % 25 = n.n_nationkey
      |ORDER BY g.id""".stripMargin

  // -------------------------------------------- src_malformed_audit
  /** Permissive ingest with corrupt-record routing — the first thing a
    * 100 TB file drop needs: rows that fail the schema are captured
    * (Spark PERMISSIVE mode + `columnNameOfCorruptRecord`), counted
    * into a per-group DLQ tally, and EXCLUDED from the numeric
    * aggregate, all in the one scan that processes the good rows. A
    * FAILFAST read would abort the whole job on the first bad byte; a
    * DROPMALFORMED read would silently lose data — this keeps both the
    * rows and the evidence. Corruption here is synthesized
    * deterministically (every `o_orderkey % 7 == 3` row gets a
    * non-numeric price token), so the oracle reproduces the audit from
    * the clean table without ever seeing the staged file. */
  def malformedAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val src = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(pmod(col("o_orderkey"), lit(7)) === 3, lit("N/A"))
          .otherwise(col("o_totalprice").cast("string")).as("price_raw"))
    val tmp = stagingDir(spark, "graft-badrec")
    src.select(concat_ws("\t", col("o_orderkey"), col("o_orderstatus"),
        col("price_raw")).as("value"))
      .write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("_bad", StringType)))
    spark.read.schema(schema)
      .option("sep", "\t").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(tmp)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("_bad").isNull,
          col("o_totalprice").cast(DecimalType(18, 2)))).cast("double")
          .as("total_good"))
      .reportSort("o_orderstatus")
  }

  val malformedAuditSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o_orderkey % 7 = 3 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_bad,
      |  CAST(SUM(CASE WHEN o_orderkey % 7 <> 3
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
      |    AS total_good
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------ src_json_flatten
  /** Semi-structured JSON flatten + validity audit — the step that
    * turns an embedded JSON payload column (`events.props`) into typed
    * relational columns: a REAL schema-driven `from_json` parse (not a
    * substring hack) extracts `k` as BIGINT, rows whose payload fails
    * to parse (deterministically mangled digits stand in for wire
    * corruption) flatten to NULL under PERMISSIVE mode, and the audit
    * reports per event_type the row count, parse-valid count, and
    * exact min/sum/max of the extracted value. Row-local codegen parse
    * until the |event_types|-row agg — no shuffle carries the JSON
    * text. The oracle re-derives the same values with regex (DuckDB's
    * JSON extension is not assumed), so the parse semantics are
    * gate-checked across engines. */
  def srcJsonFlatten(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField}
    val p = when(col("event_id") % 97 === 0,
        regexp_replace(col("props"), "[0-9]", "x"))
      .otherwise(col("props"))
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(p, StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_valid"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .reportSort("event_type")
  }

  val srcJsonFlattenSql: String =
    """WITH m AS (
      |  SELECT event_type,
      |    CASE WHEN event_id % 97 = 0
      |         THEN regexp_replace(props, '[0-9]', 'x', 'g')
      |         ELSE props END AS p
      |  FROM events),
      |x AS (
      |  SELECT event_type,
      |    CASE WHEN regexp_matches(p, '"k":\s*-?[0-9]+')
      |         THEN CAST(regexp_extract(p, '"k":\s*(-?[0-9]+)', 1)
      |           AS BIGINT)
      |         ELSE NULL END AS k
      |  FROM m)
      |SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_valid,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(MIN(k) AS BIGINT) AS min_k,
      |  CAST(MAX(k) AS BIGINT) AS max_k
      |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------- src_dialect_sniff
  /** CSV dialect detection — the ingest-hardening step for files that
    * arrive without a spec: three dialect variants of the nation dim
    * are STAGED as real text files (pipe / semicolon / tab), then the
    * sniffer reads each back and votes among candidate delimiters by
    * the consistency rule every CSV sniffer uses: the winning
    * delimiter yields the SAME field count (> 1) on every line. The
    * vote is one aggregation over (file, candidate) — per line the
    * candidate's occurrence count, per candidate min = max ≠ 0 across
    * lines — no row ever leaves the executor unsplit. The oracle
    * knows each variant's dialect by construction and re-derives the
    * field counts arithmetically. */
  def srcDialectSniff(spark: SparkSession, dir: String): DataFrame = {
    val dialects = Seq(("pipe", "|"), ("semicolon", ";"), ("tab", "\t"))
    val candidates = Seq(("|", "[|]"), (";", ";"), ("\t", "\t"), (",", ","))
    val staged = dialects.map { case (name, sep) =>
      val tmp = stagingDir(spark, s"graft-sniff-$name")
      Tables.nation(spark, dir)
        .select(concat_ws(sep, col("n_nationkey"), col("n_name"),
          col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(tmp)
      (name, tmp)
    }
    val perFile = staged.map { case (name, tmp) =>
      spark.read.text(tmp).select(lit(name).as("dialect_id"), col("value"))
    }.reduce(_ union _)
    val counted = perFile.select(col("dialect_id"),
      array(candidates.map { case (c, rx) =>
        struct(lit(c).as("cand"),
          (size(split(col("value"), rx, -1)) - 1).as("nsep"))
      }: _*).as("cs"))
      .select(col("dialect_id"), explode(col("cs")).as("c"))
      .select(col("dialect_id"), col("c.cand").as("cand"),
        col("c.nsep").as("nsep"))
      .groupBy("dialect_id", "cand")
      .agg(count(lit(1)).as("n_lines"), min(col("nsep")).as("mn"),
        max(col("nsep")).as("mx"))
    counted
      .filter(col("mn") === col("mx") && col("mn") > 0)
      .select(col("dialect_id"), col("cand").as("detected_delim"),
        col("n_lines"), (col("mn") + 1).cast("long").as("fields_per_line"))
      .reportSort("dialect_id")
  }

  val srcDialectSniffSql: String =
    """SELECT * FROM (VALUES
      |  ('pipe', '|', (SELECT COUNT(*) FROM nation), CAST(3 AS BIGINT)),
      |  ('semicolon', ';', (SELECT COUNT(*) FROM nation),
      |    CAST(3 AS BIGINT)),
      |  ('tab', chr(9), (SELECT COUNT(*) FROM nation), CAST(3 AS BIGINT)))
      |  AS t(dialect_id, detected_delim, n_lines, fields_per_line)
      |ORDER BY dialect_id""".stripMargin

  // -------------------------------------------- src_header_reorder
  /** Header-driven column alignment — the ingest reality that files
    * from the same feed arrive with columns REORDERED or MISSING
    * (exporters change, versions drift): three CSV variants of the
    * nation dim are staged with headers (canonical order, shuffled
    * order, and one with the region column dropped), each is read
    * back header-first, and `unionByName(allowMissingColumns)` aligns
    * them BY NAME — the dropped column materializes as nulls, never
    * as silently transposed data. The audit sums the key column per
    * file: a by-position union would shear the reordered variant's
    * columns and the hash check would catch it. The oracle re-derives
    * each variant's totals from the dim arithmetically. */
  def srcHeaderReorder(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val variants = Seq(
      ("v1_canonical", Seq("n_nationkey", "n_name", "n_regionkey")),
      ("v2_reordered", Seq("n_regionkey", "n_name", "n_nationkey")),
      ("v3_missing", Seq("n_name", "n_nationkey")))
    val staged = variants.map { case (name, cols) =>
      val tmp = stagingDir(spark, s"graft-hdr-$name")
      n.select(cols.map(col): _*)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      (name, tmp)
    }
    staged.map { case (name, tmp) =>
      spark.read.option("header", "true").csv(tmp)
        .withColumn("file_id", lit(name))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_nationkey").cast("long")).as("key_sum"),
        sum(when(col("n_regionkey").isNull, 1L).otherwise(0L))
          .as("n_null_region"))
      .reportSort("file_id")
  }

  val srcHeaderReorderSql: String =
    """SELECT * FROM (VALUES
      |  ('v1_canonical', (SELECT COUNT(*) FROM nation),
      |    (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation),
      |    CAST(0 AS BIGINT)),
      |  ('v2_reordered', (SELECT COUNT(*) FROM nation),
      |    (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation),
      |    CAST(0 AS BIGINT)),
      |  ('v3_missing', (SELECT COUNT(*) FROM nation),
      |    (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation),
      |    (SELECT COUNT(*) FROM nation)))
      |  AS t(file_id, n_rows, key_sum, n_null_region)
      |ORDER BY file_id""".stripMargin

  // ---------------------------------------------- src_zip_archive
  /** ZIP container walk — the archive interchange format batch drops
    * actually arrive in: per document a deterministic multi-entry
    * archive is built with the JDK's real Deflater
    * (ZipOutputStream), then parsed back ENTRY BY ENTRY with
    * ZipInputStream — central-directory order, entry names, and every
    * decompressed byte come out of the actual codec, and the emitted
    * counts are bytes READ from the stream, not recomputation. The
    * oracle re-derives entry count and payload sizes arithmetically,
    * so a hash match proves a real compress→decompress round-trip.
    * Map-only (mapPartitions); archives never cross a shuffle — at
    * scale each task walks its own archives, parallelism = archive
    * count. */
  def srcZipArchive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (2 + id % 4).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val zos = new java.util.zip.ZipOutputStream(bos)
        (0 until n).foreach { k =>
          zos.putNextEntry(new java.util.zip.ZipEntry(s"part-$k.txt"))
          val body = s"doc-$id-part-$k:" + "x" * (10 + ((id + k) % 50)).toInt
          zos.write(body.getBytes("UTF-8"))
          zos.closeEntry()
        }
        zos.close()
        val zis = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        var entries = 0L
        var bytes = 0L
        var e = zis.getNextEntry
        while (e != null) {
          require(e.getName == s"part-$entries.txt",
            s"zip walk out of order at ${e.getName}")
          val buf = new Array[Byte](256)
          var r = zis.read(buf)
          while (r > 0) { bytes += r; r = zis.read(buf) }
          entries += 1
          e = zis.getNextEntry
        }
        zis.close()
        (id, entries, bytes)
      })
      .toDF("doc_id", "n_entries", "total_bytes")
      .orderBy("doc_id")
  }

  val srcZipArchiveSql: String =
    """WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS n FROM documents),
      |e AS (SELECT doc_id, n, unnest(range(n)) AS k FROM d)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_entries,
      |  CAST(SUM(22 + length(CAST(doc_id AS VARCHAR))
      |    + (doc_id + k) % 50) AS BIGINT) AS total_bytes
      |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- src_tar_archive
  /** TAR (POSIX ustar) container round-trip — the OTHER archive
    * format batch drops arrive in, and unlike [[srcZipArchive]] the
    * JDK has no reader for it, so the 512-byte block framing is
    * implemented against the spec: writer emits real ustar headers
    * (octal size/mtime fields, the space-seeded header CHECKSUM,
    * `ustar` magic, zero-padded payload blocks, two terminator
    * blocks); the reader walks blocks back, REFUSES any header whose
    * recomputed checksum or magic disagrees, parses the octal size
    * and consumes exactly ceil(size/512) blocks. Entry sizes
    * deliberately straddle the 512 boundary so both 1- and 2-block
    * payloads are exercised. The oracle re-derives entry count,
    * payload bytes, and the FULL archive size (header + padded
    * payload + terminator arithmetic) — a hash match proves the
    * framing math and the parse agree to the byte. Map-only;
    * archives never cross a shuffle. */
  def srcTarArchive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (2 + id % 3).toInt
        def body(k: Int): Array[Byte] =
          (s"doc-$id-entry-$k:" + "y" * (300 + ((id + k) % 400)).toInt)
            .getBytes("UTF-8")
        def header(name: String, size: Long): Array[Byte] = {
          val h = new Array[Byte](512)
          def put(off: Int, s: String): Unit = {
            val b = s.getBytes("UTF-8"); System.arraycopy(b, 0, h, off, b.length)
          }
          put(0, name)
          put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
          put(124, f"$size%011o"); put(136, f"${0L}%011o")
          java.util.Arrays.fill(h, 148, 156, ' '.toByte)
          h(156) = '0'
          put(257, "ustar"); put(263, "00")
          val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
          put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
          h
        }
        val out = new java.io.ByteArrayOutputStream()
        (0 until n).foreach { k =>
          val b = body(k)
          out.write(header(s"entry-$k.txt", b.length.toLong))
          out.write(b)
          val pad = (512 - b.length % 512) % 512
          out.write(new Array[Byte](pad))
        }
        out.write(new Array[Byte](1024))
        val bytes = out.toByteArray
        // hand-rolled reader with checksum/magic validation
        var off = 0
        var entries = 0L
        var payload = 0L
        var done = false
        while (!done && off + 512 <= bytes.length) {
          val blk = java.util.Arrays.copyOfRange(bytes, off, off + 512)
          if (blk.forall(_ == 0)) done = true
          else {
            require(new String(blk, 257, 5, "UTF-8") == "ustar",
              s"bad magic at block $off")
            val stored = java.lang.Long.parseLong(
              new String(blk, 148, 6, "UTF-8"), 8)
            val spaced = blk.clone()
            java.util.Arrays.fill(spaced, 148, 156, ' '.toByte)
            val recomputed = spaced.foldLeft(0L)((a, b) => a + (b & 0xff))
            require(stored == recomputed, s"checksum mismatch at $off")
            val sz = java.lang.Long.parseLong(
              new String(blk, 124, 11, "UTF-8"), 8)
            payload += sz
            entries += 1
            off += 512 + (((sz + 511) / 512) * 512).toInt
          }
        }
        (id, entries, payload, bytes.length.toLong)
      })
      .toDF("doc_id", "n_entries", "payload_bytes", "archive_bytes")
      .orderBy("doc_id")
  }

  val srcTarArchiveSql: String =
    """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS n FROM documents),
      |e AS (
      |  SELECT doc_id, n, unnest(range(n)) AS k FROM d),
      |s AS (
      |  SELECT doc_id, n, k,
      |    CAST(12 + length(CAST(doc_id AS VARCHAR))
      |      + length(CAST(k AS VARCHAR))
      |      + 300 + (doc_id + k) % 400 AS BIGINT) AS sz
      |  FROM e)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_entries,
      |  CAST(SUM(sz) AS BIGINT) AS payload_bytes,
      |  CAST(SUM(512 + ((sz + 511) // 512) * 512) + 1024 AS BIGINT)
      |    AS archive_bytes
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ src_zorder_layout
  /** Z-order (Morton) layout audit — the lakehouse data-layout
    * primitive behind Delta's Z-ORDER / Iceberg's sort-order: both
    * dimensions scale to a 16-bit grid, their bits INTERLEAVE into
    * one sort key (a static 32-term codegen expression — exact
    * integer shifts, no UDF), and rows bucket on the z-key's top 8
    * bits. The audit is the point: per bucket, the bounding box of
    * BOTH dimensions — z-bucketing keeps every bucket's box tiny
    * (~1/256 of the plane instead of a full-width stripe), which is
    * exactly what makes file-level min/max statistics prune
    * multi-dimensional predicates. One scan + a 1-row bounds probe
    * broadcast back; output is ≤ 256 rows at any corpus size. */
  private val zTerms: String = (0 until 16).map { i =>
    s"(shiftright(x16, $i) & 1) * ${1L << (2 * i)}L + " +
      s"(shiftright(y16, $i) & 1) * ${1L << (2 * i + 1)}L"
  }.mkString(" + ")

  def srcZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val bounds = li.agg(min(col("x")).as("_xmn"), max(col("x")).as("_xmx"),
      min(col("y")).as("_ymn"), max(col("y")).as("_ymx"))
    li.crossJoin(broadcast(bounds))
      .withColumn("x16",
        expr("(x - _xmn) * 65535 div greatest(_xmx - _xmn, 1)"))
      .withColumn("y16",
        expr("(y - _ymn) * 65535 div greatest(_ymx - _ymn, 1)"))
      .withColumn("z", expr(zTerms))
      .withColumn("bucket", expr("z div 16777216"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("x16")).as("x_min"), max(col("x16")).as("x_max"),
        min(col("y16")).as("y_min"), max(col("y16")).as("y_max"))
      .withColumn("bbox_area",
        expr("(x_max - x_min + 1) * (y_max - y_min + 1)"))
      .reportSort("bucket")
  }

  private val zTermsSql: String = (0 until 16).map { i =>
    s"((x16 >> $i) & 1) * CAST(${1L << (2 * i)} AS BIGINT) + " +
      s"((y16 >> $i) & 1) * CAST(${1L << (2 * i + 1)} AS BIGINT)"
  }.mkString(" + ")

  val srcZorderLayoutSql: String =
    s"""WITH b AS (
       |  SELECT MIN(l_partkey) AS xmn, MAX(l_partkey) AS xmx,
       |    MIN(l_suppkey) AS ymn, MAX(l_suppkey) AS ymx
       |  FROM lineitem),
       |s AS (
       |  SELECT
       |    (l_partkey - xmn) * 65535 // GREATEST(xmx - xmn, 1) AS x16,
       |    (l_suppkey - ymn) * 65535 // GREATEST(ymx - ymn, 1) AS y16
       |  FROM lineitem CROSS JOIN b),
       |z AS (SELECT x16, y16, $zTermsSql AS z FROM s)
       |SELECT z // 16777216 AS bucket, COUNT(*) AS n,
       |  CAST(MIN(x16) AS BIGINT) AS x_min,
       |  CAST(MAX(x16) AS BIGINT) AS x_max,
       |  CAST(MIN(y16) AS BIGINT) AS y_min,
       |  CAST(MAX(y16) AS BIGINT) AS y_max,
       |  CAST((MAX(x16) - MIN(x16) + 1) * (MAX(y16) - MIN(y16) + 1)
       |    AS BIGINT) AS bbox_area
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin

  // --------------------------------------- src_sidecar_checksum
  /** TRANSFER-VALIDATION manifest — the distcp/hand-off audit every
    * file-based exchange needs: before writing, compute a per-shard
    * sidecar (row count + order-insensitive sum of per-line portable
    * hashes) from the TABLE; stage the shards as partitioned text
    * (one directory per priority — the multi-file layout a 100 TB
    * extract ships as); read the FILES back cold and recompute the
    * manifest from bytes actually on disk; join and flag. A flipped
    * byte, dropped line, or duplicated shard shows as a checksum or
    * count mismatch on exactly the damaged shard. The hash-sum is
    * commutative so shard-internal ordering (which a parallel write
    * does not preserve) cannot false-alarm. Oracle replays the
    * manifest arithmetic from the table — both sides of the join
    * derive from the same rows, so every flag must come back 1. */
  def srcSidecarChecksum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val lines = Tables.orders(spark, dir).select(
      col("o_orderpriority"),
      concat_ws("|", col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("value"))
    val expected = lines.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_expected"),
        sum(graft.mask.MaskFunctions.portableHash(col("value")))
          .as("sum_expected"))
    val tmp = stagingDir(spark, "graft-sidecar")
    lines.write.partitionBy("o_orderpriority").mode("overwrite").text(tmp)
    val readBack = spark.read.text(tmp)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_read"),
        sum(graft.mask.MaskFunctions.portableHash(col("value")))
          .as("sum_read"))
    expected.join(readBack, Seq("o_orderpriority"), "full")
      .select(col("o_orderpriority"), col("n_expected"), col("n_read"),
        col("sum_expected"),
        when(col("n_expected") <=> col("n_read"), 1L).otherwise(0L)
          .as("count_ok"),
        when(col("sum_expected") <=> col("sum_read"), 1L).otherwise(0L)
          .as("checksum_ok"))
      .reportSort("o_orderpriority")
  }

  val srcSidecarChecksumSql: String =
    """WITH l AS (
      |  SELECT o_orderpriority,
      |    CAST(o_orderkey AS VARCHAR) || '|' ||
      |      CAST(o_custkey AS VARCHAR) || '|' ||
      |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |        AS BIGINT) AS VARCHAR) AS value
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n_expected,
      |  COUNT(*) AS n_read,
      |  CAST(SUM(('0x'||substr(md5(value),1,8))::BIGINT) AS BIGINT)
      |    AS sum_expected,
      |  CAST(1 AS BIGINT) AS count_ok,
      |  CAST(1 AS BIGINT) AS checksum_ok
      |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ src_bitmap_index
  /** BITMAP INDEX — the OLAP indexing structure for low-cardinality
    * dimensions (Oracle bitmap indexes, Druid/Pinot segment bitmaps,
    * roaring bitmaps in ClickHouse): each market segment's customer
    * set compresses to one 64-bit word per 64-key block
    * (`bit_or(1 << (key mod 64))` — a combiner-friendly hash-agg, the
    * natural distributed bitmap build), and queries then run as
    * BITWISE algebra: cardinality = Σ bit_count(word), and the
    * conjunctive "segment ∧ high-balance" count = Σ bit_count(seg &
    * high) over a word-keyed join of the two indexes — never touching
    * a row. The oracle computes the same numbers DIRECTLY from rows
    * (COUNT + COUNT FILTER), so the green hash IS the proof the
    * bitmap algebra is lossless. Index size: |keyspace|/64 words per
    * distinct dimension value — at 100 TB the whole index for a
    * 25-value dimension over 10¹⁰ keys is ~31 GB, shardable by word
    * range, and the AND/count runs map-side on co-partitioned words. */
  def srcBitmapIndex(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_mktsegment").as("segment"),
      expr("c_custkey div 64").as("word"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(c_custkey % 64 AS INT))")
        .as("bit"),
      ((col("c_acctbal").cast(DecimalType(18, 2)) * 100)
        .cast("long") > 500000L).as("high"))
    val segIdx = c.groupBy("segment", "word")
      .agg(expr("bit_or(bit)").as("bits"))
    val highIdx = c.filter(col("high")).groupBy("word")
      .agg(expr("bit_or(bit)").as("hbits"))
    segIdx.join(highIdx, Seq("word"), "left")
      .groupBy("segment")
      .agg(count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).as("card"),
        sum(expr("bit_count(bits & coalesce(hbits, CAST(0 AS BIGINT)))"))
          .as("card_high"))
      .reportSort("segment")
  }

  val srcBitmapIndexSql: String =
    """SELECT c_mktsegment AS segment,
      |  COUNT(DISTINCT c_custkey // 64) AS n_words,
      |  COUNT(*) AS card,
      |  CAST(COUNT(*) FILTER (
      |    WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      > 500000) AS BIGINT) AS card_high
      |FROM customer
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ src_rle_roundtrip
  /** RUN-LENGTH ENCODING round-trip — the storage-layout primitive
    * behind parquet's RLE/dictionary pages, done shard-local the way
    * a columnar writer actually does it (runs never span a row
    * group): orders split into 4096-key shards, the status column
    * encodes to (shard, run_start, value, run_len) via one
    * gaps-and-islands window PER SHARD (bounded state — no global
    * sort anywhere), decodes back by exploding each run, and the
    * decoded stream joins the original on (shard, position) to prove
    * value-exact reconstruction. The report is the compression
    * panel a layout tuner reads: rows vs runs (the compression
    * ratio), the longest run, and a mismatch count the round-trip
    * pins to zero. */
  def srcRleRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus").as("v"),
        expr("o_orderkey div 4096").as("shard"))
    val w = Window.partitionBy("shard").orderBy("o_orderkey")
    val marked = base
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("chg",
        when(lag(col("v"), 1).over(w).isNull ||
          lag(col("v"), 1).over(w) =!= col("v"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = marked.groupBy("shard", "run_id", "v")
      .agg(min(col("pos")).as("start"), count(lit(1)).as("len"))
    val decoded = runs.select(col("shard"), col("v").as("dv"),
      explode(expr("sequence(start, start + len - 1)")).as("pos"))
    val checked = marked.select(col("shard"), col("pos"), col("v"))
      .join(decoded, Seq("shard", "pos"), "left")
    val perRun = runs.groupBy("v")
      .agg(count(lit(1)).as("n_runs"), max(col("len")).as("max_run"))
    checked.groupBy("v")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("dv").isNull || col("dv") =!= col("v"), 1L)
          .otherwise(0L)).as("n_mismatch"))
      .join(perRun, "v")
      .select(col("v").as("status"), col("n_rows"), col("n_runs"),
        col("max_run"),
        expr("n_runs * 1000 div n_rows").as("runs_pm"),
        col("n_mismatch"))
      .reportSort("status")
  }

  val srcRleRoundtripSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus AS v,
      |    o_orderkey // 4096 AS shard
      |  FROM orders),
      |marked AS (
      |  SELECT shard, v,
      |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY o_orderkey)
      |      AS pos,
      |    CASE WHEN LAG(v) OVER (PARTITION BY shard
      |        ORDER BY o_orderkey) IS DISTINCT FROM v
      |      THEN 1 ELSE 0 END AS chg
      |  FROM base),
      |runsrc AS (
      |  SELECT shard, v, pos,
      |    SUM(chg) OVER (PARTITION BY shard ORDER BY pos) AS run_id
      |  FROM marked),
      |runs AS (
      |  SELECT shard, run_id, v, MIN(pos) AS start, COUNT(*) AS len
      |  FROM runsrc GROUP BY 1, 2, 3),
      |decoded AS (
      |  SELECT shard, v AS dv,
      |    unnest(generate_series(start, start + len - 1)) AS pos
      |  FROM runs),
      |checked AS (
      |  SELECT m.v, d.dv FROM runsrc m
      |  LEFT JOIN decoded d ON m.shard = d.shard AND m.pos = d.pos),
      |perrun AS (
      |  SELECT v, COUNT(*) AS n_runs, CAST(MAX(len) AS BIGINT)
      |    AS max_run
      |  FROM runs GROUP BY v)
      |SELECT c.v AS status, COUNT(*) AS n_rows, p.n_runs, p.max_run,
      |  CAST(p.n_runs * 1000 // COUNT(*) AS BIGINT) AS runs_pm,
      |  CAST(SUM(CASE WHEN c.dv IS NULL OR c.dv <> c.v
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
      |FROM checked c JOIN perrun p ON c.v = p.v
      |GROUP BY c.v, p.n_runs, p.max_run ORDER BY status""".stripMargin

  // ------------------------------------------------ src_parquet_footer
  /** PARQUET FOOTER AUDIT — reads the real row-group metadata (counts
    * and column min/max statistics) straight from the footers with
    * the parquet-hadoop reader, the machinery zone-map pruning and
    * table-stats collection stand on. The layout is made
    * deterministic first (partitionBy on l_orderkey mod 4 → exactly
    * four single-row-group files at test SFs), then the audit proves
    * footer-metadata ≡ data: Σ row-group rows = COUNT(*), footer
    * min/max of l_orderkey = the table's true min/max — the oracle
    * recomputes all of it from the rows alone, so a hash match means
    * the footers genuinely describe the data. Footer reads are
    * metadata-only (no row pages touched) and fan out one file per
    * task — the 100 TB shape for stats collection over a lake. */
  def srcParquetFooter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = stagingDir(spark, "graft-footer")
    // repartition ON the partition value first: one file per part value
    // regardless of how many tasks the upstream scan used — without it
    // the writer emits (upstream tasks × part values) files and the
    // n_files pin breaks on any parallelism/SF change.
    Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .withColumn("part", pmod(col("l_orderkey"), lit(4)))
      .repartition(4, col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(tmp)
    val files = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(tmp)).map(_.getAbsolutePath)
    }
    val per = spark.createDataset(files).mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      it.map { p =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks.asScala
          var rows = 0L
          var mn = Long.MaxValue
          var mx = Long.MinValue
          blocks.foreach { b =>
            rows += b.getRowCount
            b.getColumns.asScala
              .find(_.getPath.toDotString == "l_orderkey")
              .foreach { c =>
                val st = c.getStatistics
                mn = math.min(mn,
                  st.genericGetMin.asInstanceOf[java.lang.Long])
                mx = math.max(mx,
                  st.genericGetMax.asInstanceOf[java.lang.Long])
              }
          }
          (blocks.size.toLong, rows, mn, mx)
        } finally r.close()
      }
    }.toDF("rgs", "rows", "mn", "mx")
    per.agg(count(lit(1)).as("n_files"),
      sum(col("rgs")).as("n_rowgroups"),
      sum(col("rows")).as("rows_total"),
      min(col("mn")).as("stats_min_orderkey"),
      max(col("mx")).as("stats_max_orderkey"))
  }

  val srcParquetFooterSql: String =
    """SELECT COUNT(DISTINCT l_orderkey % 4) AS n_files,
      |  COUNT(DISTINCT l_orderkey % 4) AS n_rowgroups,
      |  COUNT(*) AS rows_total,
      |  MIN(l_orderkey) AS stats_min_orderkey,
      |  MAX(l_orderkey) AS stats_max_orderkey
      |FROM lineitem""".stripMargin

  // ------------------------------------------- src_rowgroup_prune
  /** STATS-BASED SCAN-PRUNING audit — how much I/O the parquet footer
    * min/max statistics save for a point-in-range predicate (the
    * question every table-format optimizer answers before issuing
    * reads; [[srcParquetFooter]] proves the stats are THERE, this one
    * proves they PRUNE): lineitem is laid out in 4 files by a
    * VALUE-DERIVED orderkey bucket (bucket = key·4 / (max+1) — unlike
    * `repartitionByRange`'s sampled boundaries, the layout is a pure
    * function of the data, so the oracle replays it exactly), each
    * file's REAL footer stats are read back via ParquetFileReader,
    * and the audit reports per bucket the stats envelope plus whether
    * the fixed mid-range predicate (keys in the 3rd quarter of the
    * domain) can skip the file without opening it. Per-bucket rows
    * aggregate across row groups, so the report shape is independent
    * of the writer's row-group split at any SF. */
  def srcRowgroupPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = stagingDir(spark, "graft-rgprune")
    val bounds = Tables.lineitem(spark, dir)
      .agg(max(col("l_orderkey")).as("mx")).head.getLong(0)
    Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .withColumn("bucket",
        expr(s"l_orderkey * 4 div (${bounds} + 1)"))
      .repartition(4, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val files = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(tmp))
        .map(f => (f.getAbsolutePath,
          f.getParentFile.getName.stripPrefix("bucket=").toLong))
    }
    val per = spark.createDataset(files).mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      it.map { case (p, bucket) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks.asScala
          var rows = 0L
          var mn = Long.MaxValue
          var mx = Long.MinValue
          blocks.foreach { b =>
            rows += b.getRowCount
            b.getColumns.asScala
              .find(_.getPath.toDotString == "l_orderkey")
              .foreach { c =>
                val st = c.getStatistics
                mn = math.min(mn,
                  st.genericGetMin.asInstanceOf[java.lang.Long])
                mx = math.max(mx,
                  st.genericGetMax.asInstanceOf[java.lang.Long])
              }
          }
          (bucket, rows, mn, mx)
        } finally r.close()
      }
    }.toDF("bucket", "rows", "stats_min", "stats_max")
    // fixed predicate: the 3rd quarter of the key domain
    val lo = (bounds + 1) / 2
    val hi = (bounds + 1) * 3 / 4 - 1
    per.groupBy("bucket")
      .agg(sum(col("rows")).as("rows"),
        min(col("stats_min")).as("stats_min"),
        max(col("stats_max")).as("stats_max"))
      .withColumn("pruned",
        col("stats_max") < lit(lo) || col("stats_min") > lit(hi))
      .reportSort("bucket")
  }

  val srcRowgroupPruneSql: String =
    """WITH b AS (SELECT MAX(l_orderkey) AS mx FROM lineitem),
      |f AS (
      |  SELECT l_orderkey * 4 // (mx + 1) AS bucket, l_orderkey
      |  FROM lineitem, b)
      |SELECT bucket, COUNT(*) AS rows,
      |  MIN(l_orderkey) AS stats_min, MAX(l_orderkey) AS stats_max,
      |  MAX(l_orderkey) < (SELECT (mx + 1) // 2 FROM b)
      |    OR MIN(l_orderkey) > (SELECT (mx + 1) * 3 // 4 - 1 FROM b)
      |    AS pruned
      |FROM f GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------------------------------ src_line_index
  /** SEEKABLE LINE-OFFSET INDEX over a MULTI-SHARD text corpus — the
    * random-access primitive a data-serving layer builds once per
    * shard so a trainer can fetch record k without scanning k−1
    * predecessors. The corpus is staged with its natural multi-file
    * partitioning (4 shards here; any number at scale), each shard
    * internally sorted — a plain `.text` write after
    * `repartition + sortWithinPartitions`, which no writer-side
    * re-sort can disturb. The index is then built FROM the staged
    * files themselves: `input_file_name()` supplies the shard
    * identity, and offsets are the exclusive prefix sum of
    * (line octet length + 1) in a window PARTITIONED BY FILE — every
    * shard's prefix sum is an independent partition, so the plan has
    * no unpartitioned window and no single-task stage at any shard
    * count. The audit PROVES the index by actually SEEKING: a
    * deterministic probe set re-reads its lines through a per-(task,
    * file) RandomAccessFile cache at the indexed offsets and
    * byte-compares. Offsets are OCTET lengths (byte seeks); the
    * line content is ASCII by construction, which is what makes the
    * char-counting DuckDB oracle equivalent — non-ASCII corpora are
    * covered because the Spark side already counts bytes. The oracle
    * never sees the files: a hash match means offset arithmetic ≡
    * physical bytes. */
  def srcLineIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val nShards = 4
    val tmp = stagingDir(spark, "graft-lineidx")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        concat(col("o_orderkey"), lit("|"), col("o_orderstatus"),
          lit("|"), col("o_orderpriority")).as("line"))
      .repartition(nShards, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .select("line")
      .write.mode("overwrite").text(tmp)
    // rebuild the index from the staged corpus: shard = physical file,
    // in-file order recovered from the key each line carries (shards
    // were written key-sorted, so orderBy(key) ≡ physical line order)
    val staged = spark.read.text(tmp)
      .select(input_file_name().as("shard"), col("value").as("line"))
      .withColumn("o_orderkey",
        split(col("line"), "\\|").getItem(0).cast("long"))
      .withColumn("len", octet_length(col("line")).cast("long"))
    val idx = staged.withColumn("off", coalesce(
      sum(col("len") + 1).over(
        Window.partitionBy("shard").orderBy("o_orderkey")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val probeOk = idx
      .filter(pmod(col("o_orderkey"), lit(150L)) === 0)
      .select(col("shard"), col("off"), col("len"), col("line"))
      .as[(String, Long, Long, String)]
      .mapPartitions { it =>
        // one handle per file per task, opened lazily: a task may probe
        // several shards, a shard is never opened twice in a task
        val handles =
          scala.collection.mutable.Map.empty[String, java.io.RandomAccessFile]
        val out = try it.map { case (shard, off, len, line) =>
          val path = new java.net.URI(shard).getPath
          val raf = handles.getOrElseUpdate(path,
            new java.io.RandomAccessFile(path, "r"))
          raf.seek(off)
          val buf = new Array[Byte](len.toInt)
          raf.readFully(buf)
          if (new String(buf, "UTF-8") == line) 1L else 0L
        }.toList finally handles.values.foreach(_.close())
        out.iterator
      }.toDF("ok")
    idx.agg(count(lit(1)).as("n_lines"),
        sum(col("len") + 1).as("total_bytes"))
      .crossJoin(probeOk.agg(count(lit(1)).as("n_probed"),
        sum(col("ok")).as("n_probe_ok")))
  }

  val srcLineIndexSql: String =
    """WITH l AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus ||
      |    '|' || o_orderpriority AS line, o_orderkey
      |  FROM orders)
      |SELECT COUNT(*) AS n_lines,
      |  CAST(SUM(length(line) + 1) AS BIGINT) AS total_bytes,
      |  CAST(SUM(CASE WHEN o_orderkey % 150 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_probed,
      |  CAST(SUM(CASE WHEN o_orderkey % 150 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_probe_ok
      |FROM l""".stripMargin

  // ---------------------------------------------- src_csv_quotes
  /** CSV QUOTING TORTURE round-trip — the escaping edge cases that
    * silently corrupt exports: every row carries embedded double
    * quotes, field separators, newlines, AND backslashes in one
    * value. Written RFC-4180 style (quote-all, quotes doubled via
    * escape='"'), read back with multiLine — and the proof of
    * losslessness is that the aggregate over the ROUND-TRIPPED frame
    * hash-matches an oracle that never saw the file: row count,
    * total value length, distinct values, and the quote/newline
    * counts inside the recovered values. */
  def srcCsvQuotes(spark: SparkSession, dir: String): DataFrame = {
    val tricky = concat(lit("a\"b,"), col("o_orderpriority"),
      lit("\nx\\y\""), col("o_orderstatus"))
    val src = Tables.orders(spark, dir)
      .select(col("o_orderkey"), tricky.as("v"))
    val tmp = stagingDir(spark, "graft-csvq")
    src.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .csv(tmp)
    spark.read
      .schema("o_orderkey LONG, v STRING")
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(tmp)
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("v"))).cast("long").as("total_len"),
        countDistinct(col("v")).as("n_distinct"),
        sum(size(split(col("v"), "\"", -1)) - 1).cast("long")
          .as("n_quotes"),
        sum(size(split(col("v"), "\n", -1)) - 1).cast("long")
          .as("n_newlines"))
  }

  val srcCsvQuotesSql: String =
    """WITH s AS (
      |  SELECT 'a"b,' || o_orderpriority || chr(10) || 'x\y"' ||
      |    o_orderstatus AS v
      |  FROM orders)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(length(v)) AS BIGINT) AS total_len,
      |  COUNT(DISTINCT v) AS n_distinct,
      |  CAST(SUM(length(v) - length(replace(v, '"', ''))) AS BIGINT)
      |    AS n_quotes,
      |  CAST(SUM(length(v) - length(replace(v, chr(10), ''))) AS BIGINT)
      |    AS n_newlines
      |FROM s""".stripMargin

  // ------------------------------------------- src_commit_log_snapshot
  /** TRANSACTION-LOG SNAPSHOT REPLAY — the lakehouse-table primitive
    * (Delta/Iceberg-style): table state is not a directory listing
    * but the REPLAY of an ordered action log (add-file / remove-file
    * per version), so readers get atomic versioned snapshots and
    * compaction is just remove+add in one version. Six "files" derive
    * from orders (o_orderkey mod 6, row counts real), the log round-
    * trips through an actual JSON file (versions 1..3, file 1
    * compacted away at v2), and the snapshot is latest-action-wins
    * per file keeping only adds — the oracle recomputes the live
    * manifest from the raw rows. Replay is one per-file window over
    * the |actions| frame; at 100 TB the log is checkpointed but the
    * replay shape is identical. */
  def srcCommitLogSnapshot(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.orders(spark, dir)
      .groupBy((col("o_orderkey") % 6).as("file_id"))
      .agg(count(lit(1)).as("n_rows"))
    val adds = files.select(col("file_id"), col("n_rows"),
      expr("file_id div 2 + 1").as("version"), lit("add").as("action"))
    val removes = files.filter(col("file_id") === 1)
      .select(col("file_id"), col("n_rows"), lit(2L).as("version"),
        lit("remove").as("action"))
    val tmp = stagingDir(spark, "graft-commitlog")
    adds.unionByName(removes).write.mode("overwrite").json(tmp)
    val log = spark.read
      .schema("file_id LONG, n_rows LONG, version LONG, action STRING")
      .json(tmp)
    val w = Window.partitionBy("file_id").orderBy(desc("version"))
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("action") === "add")
      .select(col("file_id"), col("version").as("added_version"),
        col("n_rows"))
      .reportSort("file_id")
  }

  val srcCommitLogSnapshotSql: String =
    """WITH f AS (
      |  SELECT o_orderkey % 6 AS file_id, COUNT(*) AS n_rows
      |  FROM orders GROUP BY 1)
      |SELECT file_id, CAST(file_id // 2 + 1 AS BIGINT) AS added_version,
      |  n_rows
      |FROM f WHERE file_id <> 1 ORDER BY file_id""".stripMargin

  // ------------------------------------------------ src_delta_vacuum
  /** VACUUM CANDIDATE AUDIT over the transaction log — the second
    * half of the lakehouse-table contract ([[srcCommitLogSnapshot]]
    * replays state; this decides what's SAFE TO DELETE): a data file
    * is reclaimable when the log removed it at least the retention
    * horizon ago (time travel inside the horizon must still resolve
    * it), or when it sits on disk with NO log reference at all (a
    * crashed writer's orphan). The log (adds v1..v3, file 1 removed
    * @v2, file 3 removed @v4) round-trips through a real JSON file;
    * the disk listing carries one orphan. Replay is a per-file
    * window over the |actions| frame joined to the listing — at
    * 100 TB both sides are manifests, never data. Deleting a
    * recent_remove would break readers pinned to an old snapshot;
    * the audit proves the horizon logic holds it. */
  def srcDeltaVacuum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.orders(spark, dir)
      .groupBy((col("o_orderkey") % 6).as("file_id"))
      .agg(count(lit(1)).as("n_rows"))
    val adds = files.select(col("file_id"), col("n_rows"),
      expr("file_id div 2 + 1").as("version"), lit("add").as("action"))
    val removes = files
      .filter(col("file_id") === 1 || col("file_id") === 3)
      .select(col("file_id"), col("n_rows"),
        when(col("file_id") === 1, 2L).otherwise(4L).as("version"),
        lit("remove").as("action"))
    val tmp = stagingDir(spark, "graft-vacuumlog")
    adds.unionByName(removes).write.mode("overwrite").json(tmp)
    val log = spark.read
      .schema("file_id LONG, n_rows LONG, version LONG, action STRING")
      .json(tmp)
    val w = Window.partitionBy("file_id").orderBy(desc("version"))
    val latest = log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("file_id"), col("version").as("last_version"),
        col("action").as("last_action"))
    val horizon = log.agg(max(col("version")).as("vmax"))
    val disk = files.select(col("file_id"), col("n_rows"))
      .unionByName(spark.range(1)
        .select(lit(6L).as("file_id"), lit(0L).as("n_rows")))
    disk.join(latest, Seq("file_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(col("file_id"), col("n_rows"),
        when(col("last_action").isNull, "orphan")
          .when(col("last_action") === "add", "live")
          .when(col("last_version") <= col("vmax") - 2,
            "expired_remove")
          .otherwise("recent_remove").as("state"))
      .withColumn("vacuum",
        col("state").isin("orphan", "expired_remove"))
      .reportSort("file_id")
  }

  val srcDeltaVacuumSql: String =
    """WITH f AS (
      |  SELECT o_orderkey % 6 AS file_id, COUNT(*) AS n_rows
      |  FROM orders GROUP BY 1),
      |d AS (
      |  SELECT file_id, n_rows FROM f
      |  UNION ALL SELECT 6, 0)
      |SELECT file_id, CAST(n_rows AS BIGINT) AS n_rows,
      |  CASE WHEN file_id = 6 THEN 'orphan'
      |       WHEN file_id = 1 THEN 'expired_remove'
      |       WHEN file_id = 3 THEN 'recent_remove'
      |       ELSE 'live' END AS state,
      |  file_id IN (1, 6) AS vacuum
      |FROM d ORDER BY file_id""".stripMargin

  // ------------------------------------------- src_dict_efficiency
  /** DICTIONARY-ENCODING ADVISOR — the storage-layout question a
    * 100 TB parquet estate asks per column (writers pick PLAIN vs
    * RLE_DICTIONARY per chunk; a wrong default is read amplification
    * forever): for five representative lineitem columns, exact
    * distinct count, plain-encoded byte volume (decimal-string
    * rendering of the integer-quantized value — a deterministic,
    * engine-portable stand-in for PLAIN), dictionary volume (distinct
    * values once + one ceil(log2 nd)-bit index per row, the
    * bin-length identity) and the resulting SIGNED saving per mille
    * (key-like columns go NEGATIVE — a dictionary there is pure
    * overhead, exactly what the advisor must say). One melt scan →
    * (col, value)-keyed hash-agg (the distinct shuffle is the honest
    * cost of exact NDV — partitioned, mergeable, never driver-side)
    * → 5-row panel. Saving uses the non-negative-shift floor idiom:
    * dict_b ≤ 9·plain_b, so (Δ·1000 + 16000·plain) stays positive
    * and `div` is an exact floor in both engines. */
  def srcDictEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val melted = li.select(explode(array(
        struct(lit("l_orderkey").as("c"),
          col("l_orderkey").cast("string").as("v")),
        struct(lit("l_partkey").as("c"),
          col("l_partkey").cast("string").as("v")),
        struct(lit("l_quantity_int").as("c"),
          floor(col("l_quantity")).cast("long").cast("string").as("v")),
        struct(lit("l_returnflag").as("c"), col("l_returnflag").as("v")),
        struct(lit("l_linestatus").as("c"),
          col("l_linestatus").as("v")))).as("m"))
      .select(col("m.c").as("c"), col("m.v").as("v"))
    melted.groupBy("c", "v").agg(count(lit(1)).as("n"))
      .groupBy("c")
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_distinct"),
        sum(length(col("v")) * col("n")).as("plain_b"),
        sum(length(col("v"))).as("dict_value_b"))
      .select(col("c").as("col_name"), col("n_rows"), col("n_distinct"),
        col("plain_b"),
        (col("dict_value_b") +
          expr("(n_rows * length(bin(n_distinct - 1)) + 7) div 8"))
          .as("dict_b"))
      .withColumn("saving_pm",
        expr("((plain_b - dict_b) * 1000 + 16000 * plain_b)" +
          " div plain_b - 16000"))
      .withColumn("use_dict", col("saving_pm") > 0)
      .reportSort("col_name")
  }

  val srcDictEfficiencySql: String =
    """WITH m AS (
      |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS VARCHAR) AS v
      |  FROM lineitem
      |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL SELECT 'l_quantity_int',
      |    CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
      |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem),
      |h AS (SELECT c, v, COUNT(*) AS n FROM m GROUP BY c, v),
      |g AS (
      |  SELECT c AS col_name, CAST(SUM(n) AS BIGINT) AS n_rows,
      |    COUNT(*) AS n_distinct,
      |    CAST(SUM(LENGTH(v) * n) AS BIGINT) AS plain_b,
      |    CAST(SUM(LENGTH(v)) AS BIGINT) AS dict_value_b
      |  FROM h GROUP BY c),
      |e AS (
      |  SELECT col_name, n_rows, n_distinct, plain_b,
      |    dict_value_b +
      |      (n_rows * LENGTH(bin(n_distinct - 1)) + 7) // 8 AS dict_b
      |  FROM g)
      |SELECT col_name, n_rows, n_distinct, plain_b,
      |  CAST(dict_b AS BIGINT) AS dict_b,
      |  CAST(((plain_b - dict_b) * 1000 + 16000 * plain_b) // plain_b
      |    - 16000 AS BIGINT) AS saving_pm,
      |  ((plain_b - dict_b) * 1000 + 16000 * plain_b) // plain_b
      |    - 16000 > 0 AS use_dict
      |FROM e ORDER BY col_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_dict_efficiency" -> (srcDictEfficiency _),
    "src_delta_vacuum" -> (srcDeltaVacuum _),
    "src_parquet_footer" -> (srcParquetFooter _),
    "src_rowgroup_prune" -> (srcRowgroupPrune _),
    "src_csv_quotes" -> (srcCsvQuotes _),
    "src_line_index" -> (srcLineIndex _),
    "src_commit_log_snapshot" -> (srcCommitLogSnapshot _),
    "src_rle_roundtrip" -> (srcRleRoundtrip _),
    "src_bitmap_index" -> (srcBitmapIndex _),
    "src_sidecar_checksum" -> (srcSidecarChecksum _),
    "src_tar_archive" -> (srcTarArchive _),
    "src_zip_archive" -> (srcZipArchive _),
    "src_header_reorder" -> (srcHeaderReorder _),
    "src_zorder_layout" -> (srcZorderLayout _),
    "src_dialect_sniff" -> (srcDialectSniff _),
    "src_json_flatten" -> (srcJsonFlatten _),
    "src_malformed_audit" -> (malformedAudit _),
    "src_delimited_roundtrip" -> (delimitedRoundtrip _),
    "src_multiline_csv" -> (multilineCsvRoundtrip _),
    "src_gzip_text" -> (gzipTextRoundtrip _),
    "src_fixedwidth_roundtrip" -> (fixedWidthRoundtrip _),
    "src_jsonl_changelog" -> (jsonlChangelog _),
    "src_orc_roundtrip" -> (orcRoundtrip _),
    "src_partitioned_prune" -> (partitionedPrune _),
    "src_sheet_range" -> (sheetRange _),
    "src_ldif_roundtrip" -> (ldifRoundtrip _),
    "src_syslog_ingest" -> (syslogIngest _),
    "src_mbox_ingest" -> (mboxIngest _),
    "src_xml_roundtrip" -> (xmlRoundtrip _),
    "src_avro_roundtrip" -> (avroRoundtrip _),
    "src_avro_changelog" -> (avroChangelog _),
    "src_report_sink" -> (reportSink _),
    "src_cobol_comp3" -> (cobolComp3 _),
    "src_cobol_occurs" -> (cobolOccurs _),
    "src_ebcdic_fixedwidth" -> (ebcdicFixedwidth _),
    "src_recfm_vb" -> (recfmVb _),
    "src_schema_evolution" -> (schemaEvolution _),
    "src_warc_ingest" -> (warcIngest _),
    "gen_rowgen" -> (rowGen _))

  val oracles: Map[String, String] = Map(
    "src_dict_efficiency" -> srcDictEfficiencySql,
    "src_delta_vacuum" -> srcDeltaVacuumSql,
    "src_parquet_footer" -> srcParquetFooterSql,
    "src_rowgroup_prune" -> srcRowgroupPruneSql,
    "src_csv_quotes" -> srcCsvQuotesSql,
    "src_line_index" -> srcLineIndexSql,
    "src_commit_log_snapshot" -> srcCommitLogSnapshotSql,
    "src_rle_roundtrip" -> srcRleRoundtripSql,
    "src_bitmap_index" -> srcBitmapIndexSql,
    "src_sidecar_checksum" -> srcSidecarChecksumSql,
    "src_tar_archive" -> srcTarArchiveSql,
    "src_json_flatten" -> srcJsonFlattenSql,
    "src_malformed_audit" -> malformedAuditSql,
    "src_delimited_roundtrip" -> delimitedRoundtripSql,
    "src_multiline_csv" -> multilineCsvRoundtripSql,
    "src_gzip_text" -> gzipTextRoundtripSql,
    "src_zip_archive" -> srcZipArchiveSql,
    "src_header_reorder" -> srcHeaderReorderSql,
    "src_zorder_layout" -> srcZorderLayoutSql,
    "src_dialect_sniff" -> srcDialectSniffSql,
    "src_fixedwidth_roundtrip" -> fixedWidthRoundtripSql,
    "src_jsonl_changelog" -> jsonlChangelogSql,
    "src_orc_roundtrip" -> orcRoundtripSql,
    "src_partitioned_prune" -> partitionedPruneSql,
    "src_sheet_range" -> sheetRangeSql,
    "src_ldif_roundtrip" -> ldifRoundtripSql,
    "src_syslog_ingest" -> syslogIngestSql,
    "src_mbox_ingest" -> mboxIngestSql,
    "src_xml_roundtrip" -> xmlRoundtripSql,
    "src_avro_roundtrip" -> avroRoundtripSql,
    "src_avro_changelog" -> avroChangelogSql,
    "src_report_sink" -> reportSinkSql,
    "src_cobol_comp3" -> cobolComp3Sql,
    "src_cobol_occurs" -> cobolOccursSql,
    "src_ebcdic_fixedwidth" -> ebcdicFixedwidthSql,
    "src_recfm_vb" -> recfmVbSql,
    "src_schema_evolution" -> schemaEvolutionSql,
    "src_warc_ingest" -> warcIngestSql,
    "gen_rowgen" -> rowGenSql)
}
