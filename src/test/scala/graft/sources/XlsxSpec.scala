package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class XlsxSpec extends SparkSpec {

  /** Build a minimal real .xlsx (zip of XML parts). */
  private def syntheticXlsx(): Array[Byte] = {
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |<si><t>name</t></si><si><t>B&amp;W</t></si></sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="C2"><v>3.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("[Content_Types].xml", "<Types/>")
    put("xl/sharedStrings.xml", shared)
    put("xl/worksheets/sheet1.xml", sheet)
    z.close()
    out.toByteArray
  }

  test("parseFirstSheet resolves shared strings, positions, and escapes") {
    val rows = Xlsx.parseFirstSheet(syntheticXlsx())
    assert(rows == Seq(
      Seq("name", "42"),
      Seq("B&W", "", "3.5"))) // C2 leaves B2 empty
  }

  test("read produces positional string columns over a directory") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toFile
    val f = new java.io.File(dir, "objects.xlsx")
    val fos = new FileOutputStream(f)
    fos.write(syntheticXlsx()); fos.close()
    val df = Xlsx.read(spark, dir.getAbsolutePath)
    val got = df.orderBy("row_idx").collect().map(r =>
      (r.getLong(1), r.getString(2), Option(r.getString(3)).getOrElse("")))
    assert(got.toSeq == Seq((0L, "name", "42"), (1L, "B&W", "")))
  }
}
