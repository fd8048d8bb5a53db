package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{BinaryFormats, Delimited}

/** Binary wire formats: Avro container round-trip (including the
  * multi-container layout and value fidelity) and EBCDIC RECFM=F
  * fixed-length records (code-page fidelity, record framing). */
class BinaryFormatsSpec extends SparkSpec {
  import spark.implicits._

  private val avroSchema =
    """{"type":"record","name":"T","fields":[
      |{"name":"k","type":"long"},
      |{"name":"s","type":"string"},
      |{"name":"v","type":"double"}]}""".stripMargin

  test("avro container round-trip preserves rows across partitions") {
    val dir = Files.createTempDirectory("graft-avro-spec").toString
    val src = (1L to 100L).map(i => (i, s"s$i", i * 0.5)).toDF("k", "s", "v")
      .repartition(4)
    BinaryFormats.writeAvro(src, dir, avroSchema)
    // one container per partition, all non-empty of header size at least
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length == 4)
    val back = BinaryFormats.readAvro(spark, dir, avroSchema) { r =>
      (r.get("k").asInstanceOf[Long], r.get("s").toString,
        r.get("v").asInstanceOf[Double])
    }.toDF("k", "s", "v")
    assert(back.count() == 100)
    // exact value fidelity, including doubles
    assert(back.orderBy("k").collect().toSeq ==
      src.orderBy("k").collect().toSeq)
  }

  test("avro read maps one task per container (sync-marker format)") {
    val dir = Files.createTempDirectory("graft-avro-split").toString
    val src = (1L to 50L).map(i => (i, "x", 1.0)).toDF("k", "s", "v")
      .repartition(5)
    BinaryFormats.writeAvro(src, dir, avroSchema)
    val ds = BinaryFormats.readAvro(spark, dir, avroSchema)(r =>
      r.get("k").asInstanceOf[Long])
    assert(ds.rdd.getNumPartitions >= 5)
    assert(ds.collect().sorted.toSeq == (1L to 50L))
  }

  test("ebcdic RECFM=F round-trip: framing, code page, padding") {
    val fields = Seq(
      Delimited.FixedField("id", 1, 4),
      Delimited.FixedField("name", 5, 10))
    val recordLen = 14
    val src = Seq((7, "ALPHA"), (42, "BETA-2"), (999, "G")).toDF("id", "name")
    val lines = Delimited.formatFixedWidth(src, fields).repartition(2)
    val dir = Files.createTempDirectory("graft-ebcdic-spec").toString
    BinaryFormats.writeEbcdic(lines, dir, recordLen)
    // the on-disk bytes are NOT ASCII (EBCDIC 'A' = 0xC1)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bin")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(bytes.length % recordLen == 0)
    assert(!bytes.take(recordLen).forall(b => b >= 0x20 && b < 0x7f))
    val back = Delimited.parseFixedWidth(
      BinaryFormats.readEbcdic(spark, dir, recordLen), fields)
      .select(col("id").cast("int").as("id"), col("name"))
    assert(back.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq == Seq((7, "ALPHA"), (42, "BETA-2"), (999, "G")))
  }

  test("ebcdic RECFM=V round-trip: RDW framing, empty and long payloads") {
    val vals = Seq("A", "", "VARIABLE-LENGTH RECORD", "x" * 300)
    val src = vals.toDF("value").repartition(2)
    val dir = Files.createTempDirectory("graft-recfmv-spec").toString
    BinaryFormats.writeEbcdicVariable(src, dir)
    // on-disk framing: total bytes = sum of (payload + 4-byte RDW)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bin"))
    assert(files.map(_.length).sum == vals.map(_.length + 4).sum)
    val back = BinaryFormats.readEbcdicVariable(spark, dir)
      .as[String].collect().toSeq
    assert(back.sorted == vals.sorted)
    // a nonzero RDW reserved byte must fail decode, not corrupt rows
    val bad = Files.createTempDirectory("graft-recfmv-bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(bad, "part-0.bin"),
      Array[Byte](0, 5, 9, 0, 0x40))
    assertThrows[Exception] {
      BinaryFormats.readEbcdicVariable(spark, bad).collect()
    }
  }

  test("DSv2 connector: splits align to records and pruning reaches the scan") {
    val fields = Seq(
      Delimited.FixedField("id", 1, 4),
      Delimited.FixedField("name", 5, 10),
      Delimited.FixedField("tag", 15, 6))
    val recordLen = 20
    val src = (1 to 500).map(i => (i, s"name$i", s"t${i % 7}"))
      .toDF("id", "name", "tag")
    val lines = Delimited.formatFixedWidth(src, fields).repartition(3)
    val dir = Files.createTempDirectory("graft-ebcdic-dsv2").toString
    BinaryFormats.writeEbcdic(lines, dir, recordLen)
    def read() = spark.read.format("graft-ebcdic")
      .option("fields", "id:1:4,name:5:10,tag:15:6")
      .option("recordLen", recordLen.toString)
      // force multiple splits per file: 60 bytes = 3 records
      .option("splitBytes", "60")
      .load(dir)
    // full read round-trips all rows
    val all = read().select(col("id").cast("int"), col("name"))
      .orderBy("id").collect()
    assert(all.length == 500 && all.head.getString(1) == "name1")
    // splits: each file carved into record-aligned ranges
    val parts = read().rdd.getNumPartitions
    assert(parts > 3, s"expected record-aligned sub-file splits, got $parts")
    // pruning: a 1-column projection reaches the scan's readSchema
    val pruned = read().select("tag")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("fields=tag"),
      s"expected pruned scan (fields=tag) in:\n$scanDesc")
    assert(pruned.distinct().count() == 7)
  }

  test("DSv2 connector: write path round-trips through commit/rename") {
    val dir = Files.createTempDirectory("graft-ebcdic-w").toString + "/out"
    val src = (1 to 200).map(i => (s"$i", s"n$i")).toDF("id", "name")
      .repartition(3)
    // columns deliberately NOT in fields order: writer maps by name
    src.select("name", "id").write.format("graft-ebcdic")
      .option("fields", "id:1:6,name:7:10")
      .option("recordLen", "16")
      .mode("append").save(dir)
    // no temp files survive the commit
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.nonEmpty && !names.exists(_.startsWith("_tmp_")), names.toSeq)
    val back = spark.read.format("graft-ebcdic")
      .option("fields", "id:1:6,name:7:10")
      .option("recordLen", "16")
      .load(dir)
      .select(col("id").cast("int").as("id"), col("name"))
      .orderBy("id").collect()
    assert(back.length == 200)
    assert(back.head.getInt(0) == 1 && back.head.getString(1) == "n1")
    assert(back.last.getInt(0) == 200 && back.last.getString(1) == "n200")
  }

  test("DSv2 connector: non-string columns fail at plan time") {
    val dir = Files.createTempDirectory("graft-ebcdic-t").toString + "/out"
    val e = intercept[IllegalArgumentException] {
      Seq((1L, "a")).toDF("id", "name")
        .write.format("graft-ebcdic")
        .option("fields", "id:1:6,name:7:10")
        .option("recordLen", "16")
        .mode("append").save(dir)
    }
    assert(e.getMessage.contains("string columns only"), e.getMessage)
  }

  test("DSv2 connector: over-width values fail unless truncation is opted in") {
    val dir1 = Files.createTempDirectory("graft-ebcdic-o1").toString + "/out"
    val wide = Seq(("1", "this-name-is-way-too-long")).toDF("id", "name")
    val e = intercept[org.apache.spark.SparkException] {
      wide.write.format("graft-ebcdic")
        .option("fields", "id:1:6,name:7:10")
        .option("recordLen", "16")
        .mode("append").save(dir1)
    }
    assert(e.getMessage.contains("allowTruncate")
      || Option(e.getCause).exists(_.getMessage.contains("allowTruncate")),
      e.getMessage)
    // the failed attempt must not leave _tmp_ garbage behind
    val leftovers = Option(new java.io.File(dir1).listFiles())
      .map(_.map(_.getName).toSeq).getOrElse(Seq.empty)
    assert(!leftovers.exists(_.startsWith("_tmp_")), leftovers)
    val dir2 = Files.createTempDirectory("graft-ebcdic-o2").toString + "/out"
    wide.write.format("graft-ebcdic")
      .option("fields", "id:1:6,name:7:10")
      .option("recordLen", "16")
      .option("allowTruncate", "true")
      .mode("append").save(dir2)
    val back = spark.read.format("graft-ebcdic")
      .option("fields", "id:1:6,name:7:10")
      .option("recordLen", "16")
      .load(dir2).collect()
    assert(back.length == 1 && back.head.getString(1) == "this-name-")
  }

  test("ebcdic writer rejects records that don't fit the code page") {
    val dir = Files.createTempDirectory("graft-ebcdic-bad").toString
    val lines = Seq("日本語padpadpad!").toDF("value")
    val e = intercept[org.apache.spark.SparkException] {
      BinaryFormats.writeEbcdic(lines, dir, 14)
    }
    assert(e.getMessage != null)
  }

  test("warc round-trip: length-delimited payloads survive embedded magic") {
    val dir = Files.createTempDirectory("graft-warc-spec").toString
    // payloads chosen to break any scan-for-next-magic parser: a record
    // whose BODY contains a full WARC record header, CRLFs, an empty
    // payload, and multi-byte UTF-8
    val rows = Seq(
      ("https://a.example.com/1", "en",
        "WARC/1.0\r\nWARC-Type: response\r\n\r\nfake inner record"),
      ("https://a.example.com/2", "de", ""),
      ("https://b.example.com/3", "ja", "日本語のテキスト\r\nzeile zwei"),
      ("https://b.example.com/4", "en", "plain"))
      .toDF("url", "lang", "text").repartition(2)
    graft.sources.WarcSource.write(rows, dir)
    // one WARC member per input partition on disk (binaryFiles may
    // batch tiny files into one task; GB-scale members map 1:1)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".warc")) == 2)
    val back = graft.sources.WarcSource.read(spark, dir)
    val got = back.select("url", "lang", "text").as[(String, String, String)]
      .collect().sortBy(_._1)
    assert(got.toSeq == rows.select("url", "lang", "text")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq)
    // content_length is the UTF-8 byte length, not the char count
    val ja = back.filter(col("url").endsWith("/3"))
      .select("content_length").as[Long].head()
    assert(ja == "日本語のテキスト\r\nzeile zwei".getBytes("UTF-8").length)
  }

  test("warc reader rejects truncated records instead of emitting junk") {
    val dir = Files.createTempDirectory("graft-warc-bad").toString
    val f = new java.io.FileOutputStream(s"$dir/bad.warc")
    f.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://x\r\nContent-Length: 999\r\n\r\nshort")
      .getBytes("UTF-8"))
    f.close()
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.WarcSource.read(spark, dir).collect()
    }
    assert(e.getMessage != null)
  }
}
