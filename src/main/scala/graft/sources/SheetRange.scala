package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Spreadsheet range source — the reference's Excel data-info binding
  * (reference: iriLibrary.dataclass `dataInfos xsi:type="flow:
  * FileDataInfo" fileName="&quot;'Sheet1'!A1:C7,HEADER;path.xlsx&quot;"
  * type="XLSX"`): a `'Sheet'!A1:C7,HEADER;path` address selects a
  * rectangular cell range of one worksheet, with the first row
  * optionally naming the columns.
  *
  * No spreadsheet library exists in this sandbox, and none is needed:
  * XLSX is a zip of SpreadsheetML XML, so the JDK's ZipInputStream +
  * the same hardened DOM parsing the XML libraries use reads REAL
  * workbook bytes — both shared-string and inline-string cell
  * encodings. The writer emits the minimal standard package
  * ([Content_Types], relationships, workbook, one sheet, inline
  * strings), which Excel-family tools and this reader both open.
  *
  * Scale shape: the per-FILE parse is the distribution unit
  * (`binaryFile` scan → flatMap), matching the data: spreadsheets are
  * many small dim/config files, never a 100 TB fact store. The write
  * side is a driver-side single-file emit for the same reason (a
  * bounded frame; the reference's Excel targets are small sheets).
  */
object SheetRange {

  final case class Address(sheet: String, c1: Int, r1: Int, c2: Int, r2: Int,
      header: Boolean, path: String)

  /** `'Sheet1'!A1:C7,HEADER;/path/a.xlsx` (surrounding quotes from the
    * XML attribute tolerated, HEADER optional). */
  def parseAddress(spec: String): Address = {
    val Re = """'([^']+)'!([A-Z]+)([0-9]+):([A-Z]+)([0-9]+)(,HEADER)?;(.+)""".r
    spec.trim.stripPrefix("\"").stripSuffix("\"") match {
      case Re(sheet, ca, ra, cb, rb, hdr, path) =>
        Address(sheet, colIndex(ca), ra.toInt, colIndex(cb), rb.toInt,
          hdr != null, path)
      case other => throw new IllegalArgumentException(
        s"spreadsheet address '$other' is not 'Sheet'!A1:C7[,HEADER];path")
    }
  }

  /** A→1, Z→26, AA→27 … (1-based). */
  def colIndex(letters: String): Int =
    letters.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1))

  def colLetters(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  // ------------------------------------------------------------ reader

  private def entries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.toMap
  }

  /** Hardened like XmlCompat: DOCTYPE (XXE) rejected — workbook files
    * are untrusted input. */
  private def parseXml(bytes: Array[Byte]): org.w3c.dom.Element = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false); f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(bytes)).getDocumentElement
  }

  private def children(parent: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  /** Resolve a sheet NAME to its worksheet entry via workbook.xml
    * order (the standard `xl/worksheets/sheetN.xml` layout the writer
    * emits and Excel's defaults produce). */
  private def sheetEntry(parts: Map[String, Array[Byte]], name: String): Array[Byte] = {
    val wb = parseXml(parts("xl/workbook.xml"))
    val idx = children(wb, "sheet").indexWhere(_.getAttribute("name") == name)
    require(idx >= 0, s"sheet '$name' not in workbook")
    parts(s"xl/worksheets/sheet${idx + 1}.xml")
  }

  /** Cell grid of the addressed range (row-major, None = empty cell).
    * Handles shared-string (`t="s"`), inline-string (`t="inlineStr"`)
    * and plain numeric cells. */
  def readSheet(bytes: Array[Byte], addr: Address): Seq[Seq[Option[String]]] = {
    val parts = entries(bytes)
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml") match {
      case Some(ss) => children(parseXml(ss), "si").map(_.getTextContent).toIndexedSeq
      case None => IndexedSeq.empty
    }
    val sheet = parseXml(sheetEntry(parts, addr.sheet))
    val CellRef = """([A-Z]+)([0-9]+)""".r
    val cells = mutable.Map.empty[(Int, Int), String]
    for (c <- children(sheet, "c")) c.getAttribute("r") match {
      case CellRef(cl, rw) =>
        val v = c.getAttribute("t") match {
          case "inlineStr" => children(c, "t").headOption.map(_.getTextContent)
          case "s" => children(c, "v").headOption
            .map(e => shared(e.getTextContent.trim.toInt))
          case _ => children(c, "v").headOption.map(_.getTextContent)
        }
        v.foreach(cells((rw.toInt, colIndex(cl))) = _)
      case _ => ()
    }
    (addr.r1 to addr.r2).map(r => (addr.c1 to addr.c2).map(c => cells.get((r, c))))
  }

  /** Range read as a DataFrame of strings. With HEADER the first range
    * row names the columns (read once, driver-side, from the file
    * itself); without, columns are c1..cN. The bulk parse runs in
    * executors over a `binaryFile` scan — one task per workbook file,
    * the natural parallelism for many-small-sheet sources. */
  def read(spark: SparkSession, spec: String): DataFrame = {
    val addr = parseAddress(spec)
    val width = addr.c2 - addr.c1 + 1
    val names: Seq[String] =
      if (!addr.header) (1 to width).map(i => s"c$i")
      else {
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Path.of(addr.path))
        readSheet(bytes, addr.copy(r2 = addr.r1)).head
          .zipWithIndex.map { case (v, i) => v.getOrElse(s"c${i + 1}") }
      }
    val schema = StructType(names.map(StructField(_, StringType)))
    val dataAddr = if (addr.header) addr.copy(r1 = addr.r1 + 1) else addr
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(addr.path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap(bytes => readSheet(bytes, dataAddr)
      .map(r => Row.fromSeq(r.map(_.orNull))))(Encoders.row(schema))
  }

  // ------------------------------------------------------------ writer

  // includes the quote forms: escaped values are interpolated into
  // XML ATTRIBUTES (sheet name) as well as element text
  private def xmlEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;").replace("'", "&apos;")

  /** Hard cap on rows the XLSX writer will materialize on the driver:
    * a spreadsheet target is a bounded dim/config sheet by nature, and
    * without a cap a misdirected fact table OOMs the driver. XLSX
    * itself caps a sheet at 1,048,576 rows; we fail far earlier. */
  val MaxRows = 100000

  /** Emit a minimal standard XLSX package (inline strings). Driver
    * side, single file — spreadsheet targets are bounded dim/config
    * sheets by nature; a fact table belongs in parquet/ORC. Fails
    * fast over [[MaxRows]] rows rather than collecting them. */
  def write(df: DataFrame, path: String, sheet: String = "Sheet1"): Unit = {
    val header = df.columns.toSeq
    // limit(MaxRows+1) bounds the collect itself: the driver never
    // holds more than the cap plus the one row that proves overflow
    val collected = df.limit(MaxRows + 1).collect().toSeq
    require(collected.length <= MaxRows,
      s"XLSX writer is for bounded sheets: input exceeds $MaxRows " +
        "rows; write a parquet/ORC target instead")
    val rows = header +: collected.map(r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString).getOrElse("")))
    val sheetXml = {
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      for ((r, ri) <- rows.zipWithIndex) {
        sb ++= s"""<row r="${ri + 1}">"""
        for ((v, ci) <- r.zipWithIndex)
          sb ++= s"""<c r="${colLetters(ci + 1)}${ri + 1}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          s"""<sheets><sheet name="${xmlEscape(sheet)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheetXml)
    val zout = new ZipOutputStream(new java.io.FileOutputStream(path))
    try for ((name, content) <- parts) {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    } finally zout.close()
  }
}
