package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.SheetRange

/** Spreadsheet-range source: address grammar, real-XLSX round trip,
  * sub-range selection, and the shared-strings cell encoding real
  * Excel files use (the writer emits inline strings). */
class SheetSpec extends SparkSpec {
  import spark.implicits._

  test("address grammar parses the reference's FileDataInfo spec") {
    val a = SheetRange.parseAddress("\"'Sheet1'!A1:C7,HEADER;/tmp/a.xlsx\"")
    assert(a == SheetRange.Address("Sheet1", 1, 1, 3, 7, header = true, "/tmp/a.xlsx"))
    val b = SheetRange.parseAddress("'My Data'!B2:AK5;/x/y.xlsx")
    assert(b.sheet == "My Data" && b.c1 == 2 && b.c2 == SheetRange.colIndex("AK"))
    assert(!b.header && b.r1 == 2 && b.r2 == 5)
    assert(SheetRange.colIndex("AA") == 27 && SheetRange.colLetters(27) == "AA")
    intercept[IllegalArgumentException](SheetRange.parseAddress("Sheet1!A1;x"))
  }

  test("xlsx write/read round trip with ranges and escaping") {
    val dir = Files.createTempDirectory("graft-sheet").toString
    val path = s"$dir/t.xlsx"
    val df = Seq((1L, "a&b", "x"), (2L, "c<d", "y"), (3L, "e", "z"))
      .toDF("id", "note", "tag")
    SheetRange.write(df, path)
    // full range (header + 3 rows, 3 cols)
    val full = SheetRange.read(spark, s"'Sheet1'!A1:C4,HEADER;$path")
      .orderBy("id").collect()
    assert(full.map(_.getString(0)).toSeq == Seq("1", "2", "3"))
    assert(full.map(_.getString(1)).toSeq == Seq("a&b", "c<d", "e"))
    // sub-range: rows 2-3, columns A-B only — outside cells invisible
    val sub = SheetRange.read(spark, s"'Sheet1'!A2:B3;$path")
      .orderBy("c1").collect()
    assert(sub.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "a&b"), ("2", "c<d")))
  }

  test("reader resolves shared-string cells (Excel's default encoding)") {
    // hand-built workbook: sharedStrings + t="s" cells + a numeric
    // cell + a missing cell (B2 absent -> null)
    val dir = Files.createTempDirectory("graft-sheet-ss")
    val path = dir.resolve("ss.xlsx").toString
    val zout = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(body.getBytes("UTF-8")); zout.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<sheets><sheet name="S" sheetId="1"/></sheets></workbook>""")
    put("xl/sharedStrings.xml",
      """<sst><si><t>hello</t></si><si><t>world</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2"><v>42</v></c></row>""" +
        """</sheetData></worksheet>""")
    zout.close()
    val bytes = Files.readAllBytes(java.nio.file.Path.of(path))
    val grid = SheetRange.readSheet(bytes,
      SheetRange.Address("S", 1, 1, 2, 2, header = false, path))
    assert(grid == Seq(
      Seq(Some("hello"), Some("world")),
      Seq(Some("42"), None)))
  }

  test("sheet names with quotes survive attribute escaping") {
    val dir = Files.createTempDirectory("graft-sheet-q").toString
    val path = s"$dir/q.xlsx"
    val name = """My "Q1" & <data>"""
    SheetRange.write(Seq((1L, "x")).toDF("id", "v"), path, sheet = name)
    val bytes = Files.readAllBytes(java.nio.file.Path.of(path))
    val grid = SheetRange.readSheet(bytes,
      SheetRange.Address(name, 1, 2, 2, 2, header = false, path))
    assert(grid == Seq(Seq(Some("1"), Some("x"))))
  }

  test("XLSX writer fails fast over the row cap instead of collecting") {
    val dir = Files.createTempDirectory("graft-sheet-cap").toString
    val big = spark.range(SheetRange.MaxRows + 1L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      SheetRange.write(big, s"$dir/big.xlsx")
    }
    assert(e.getMessage.contains("bounded sheets"), e.getMessage)
  }

  test("driver key selects the addressed nation sub-range") {
    import graft.sources.SourceQueries
    val rows = SourceQueries.sheetRange(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.length == 9 && rows.map(_._1).toSeq == (0 to 8))
  }
}
