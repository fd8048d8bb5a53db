package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** WARC (Web ARChive, ISO 28500) writer + streaming reader — the
  * format web-scale training corpora actually arrive in. Common Crawl
  * publishes each crawl as ~90k WARC files of ~1 GB; a 100 TB text
  * pipeline's FIRST operator is this parse, so the engine treats it
  * as a first-class source rather than assuming someone else already
  * made parquet.
  *
  * Write: one WARC file per partition, executor-side through
  * [[HadoopFs]] (local here, HDFS/S3A on a cluster): a leading
  * `warcinfo` record, then one `response` record per row carrying the
  * standard header set — `WARC-Target-URI`, `WARC-Date`,
  * `WARC-Record-ID`, and `WARC-Identified-Content-Language` (the
  * field Common Crawl publishes language ID in) — and a payload
  * delimited by an exact `Content-Length`.
  *
  * Read: the parallel unit is the FILE — exactly the Common Crawl
  * deployment shape (many moderate files ⇒ parallelism = file count).
  * Each file STREAMS through a bounded buffer: headers are parsed
  * up to the blank line, the payload is consumed by `Content-Length`
  * (never by scanning for the next record magic, which a hostile or
  * merely unlucky payload can contain), and the inter-record CRLF
  * pair is enforced. No file is ever materialized in memory, so a
  * 1 GB member costs a 64 KB buffer. Non-`response` records
  * (warcinfo, request, metadata) are skipped by length without
  * decoding their payloads.
  */
object WarcSource {

  private val Crlf = "\r\n"

  /** Write `df` — columns `(url, lang, text)` — as one WARC file per
    * partition under `dir`. The record date is fixed (the corpus
    * snapshot instant); the record id is derived from the URL so the
    * output is deterministic partition-for-partition. */
  def write(df: DataFrame, dir: String): Unit = {
    val conf = HadoopFs.serializable()
    df.select("url", "lang", "text").foreachPartition { (it: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val fs = HadoopFs.fs(dir, conf.value)
      val out = fs.create(new Path(s"$dir/part-$pid.warc"), true)
      def record(headers: Seq[(String, String)], payload: Array[Byte]): Unit = {
        val head = new StringBuilder("WARC/1.0").append(Crlf)
        headers.foreach { case (k, v) => head.append(s"$k: $v").append(Crlf) }
        head.append(s"Content-Length: ${payload.length}").append(Crlf)
          .append(Crlf)
        out.write(head.toString.getBytes(UTF_8))
        out.write(payload)
        out.write((Crlf + Crlf).getBytes(UTF_8))
      }
      try {
        val info = s"software: graft$Crlf".getBytes(UTF_8)
        record(Seq(
          "WARC-Type" -> "warcinfo",
          "WARC-Date" -> "2026-01-01T00:00:00Z",
          "WARC-Record-ID" -> s"<urn:graft:warcinfo:$pid>",
          "Content-Type" -> "application/warc-fields"), info)
        it.foreach { row =>
          val url = row.getString(0)
          val payload = row.getString(2).getBytes(UTF_8)
          record(Seq(
            "WARC-Type" -> "response",
            "WARC-Date" -> "2026-01-01T00:00:00Z",
            "WARC-Record-ID" ->
              s"<urn:graft:${java.util.UUID.nameUUIDFromBytes(url.getBytes(UTF_8))}>",
            "WARC-Target-URI" -> url,
            "WARC-Identified-Content-Language" -> row.getString(1),
            "Content-Type" -> "text/plain; charset=utf-8"), payload)
        }
      } finally out.close()
    }
  }

  /** Stream-parse every `*.warc` under `dir` into
    * `(url, lang, content_length, text)` rows, one task per file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(s"$dir/*.warc")
      .flatMap { case (name, pds) =>
        val in = new DataInputStream(
          new BufferedInputStream(pds.open(), 1 << 16))
        // CRLF-terminated header line; null at clean EOF
        def readLine(): String = {
          val sb = new java.lang.StringBuilder(96)
          var b = in.read()
          if (b < 0) null
          else {
            while (b >= 0 && b != '\r') { sb.append(b.toChar); b = in.read() }
            require(b == '\r' && in.read() == '\n',
              s"$name: header line not CRLF-terminated")
            sb.toString
          }
        }
        new Iterator[(String, String, Long, String)] {
          private var nextRec: (String, String, Long, String) = advance()
          @scala.annotation.tailrec
          private def advance(): (String, String, Long, String) = {
            val version = readLine()
            if (version == null) { in.close(); null }
            else {
              require(version == "WARC/1.0", s"$name: bad record magic '$version'")
              val headers = Iterator.continually(readLine())
                .takeWhile(l => l != null && l.nonEmpty)
                .map { l =>
                  val i = l.indexOf(':')
                  require(i > 0, s"$name: malformed header '$l'")
                  l.substring(0, i).trim -> l.substring(i + 1).trim
                }.toMap
              val len = headers.getOrElse("Content-Length",
                sys.error(s"$name: record without Content-Length")).toInt
              val payload = new Array[Byte](len)
              try in.readFully(payload)
              catch { case _: EOFException =>
                sys.error(s"$name: truncated payload (wanted $len bytes)") }
              val sep1 = readLine(); val sep2 = readLine()
              require(sep1 == "" && sep2 == "",
                s"$name: missing inter-record CRLF pair")
              if (headers.get("WARC-Type").contains("response"))
                (headers("WARC-Target-URI"),
                  headers.getOrElse("WARC-Identified-Content-Language", ""),
                  len.toLong, new String(payload, UTF_8))
              else advance()
            }
          }
          override def hasNext: Boolean = nextRec != null
          override def next(): (String, String, Long, String) = {
            val r = nextRec; nextRec = advance(); r
          }
        }
      }
      .toDF("url", "lang", "content_length", "text")
  }
}
