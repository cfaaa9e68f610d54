package graft.ingest

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.util.Using

import graft.SparkSpec

class ExcelSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built minimal xlsx: the zip parts [[Excel]] reads, exercising
    * shared strings (with a rich-text run), inline strings, numbers,
    * booleans, a gap cell, and a header-mismatched sheet. */
  private def writeXlsx(dir: Path): String = {
    val p = dir.resolve("orders.xlsx")
    def entry(z: ZipOutputStream, name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    Using.resource(new ZipOutputStream(Files.newOutputStream(p))) { z =>
      entry(z, "xl/workbook.xml",
        """<?xml version="1.0"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets>
          |    <sheet name="Jan" sheetId="1" r:id="rId1"/>
          |    <sheet name="Feb" sheetId="2" r:id="rId2"/>
          |    <sheet name="Notes" sheetId="3" r:id="rId3"/>
          |  </sheets>
          |</workbook>""".stripMargin)
      entry(z, "xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
          |  <Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>
          |  <Relationship Id="rId3" Type="w" Target="worksheets/sheet3.xml"/>
          |</Relationships>""".stripMargin)
      // index 0 "order_id", 1 "amount", 2 "note", 3 "al" + "pha" (rich run)
      entry(z, "xl/sharedStrings.xml",
        """<?xml version="1.0"?>
          |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
          |  <si><t>order_id</t></si>
          |  <si><t>amount</t></si>
          |  <si><t>note</t></si>
          |  <si><r><t>al</t></r><r><t>pha</t></r></si>
          |</sst>""".stripMargin)
      entry(z, "xl/worksheets/sheet1.xml",
        """<?xml version="1.0"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row r="1">
          |      <c r="A1" t="s"><v>0</v></c>
          |      <c r="B1" t="s"><v>1</v></c>
          |      <c r="C1" t="s"><v>2</v></c>
          |    </row>
          |    <row r="2">
          |      <c r="A2"><v>1</v></c>
          |      <c r="B2"><v>10.5</v></c>
          |      <c r="C2" t="s"><v>3</v></c>
          |    </row>
          |    <row r="3">
          |      <c r="A3"><v>2</v></c>
          |      <c r="C3" t="inlineStr"><is><t>gap row</t></is></c>
          |    </row>
          |  </sheetData>
          |</worksheet>""".stripMargin)
      entry(z, "xl/worksheets/sheet2.xml",
        """<?xml version="1.0"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row r="1">
          |      <c r="A1" t="s"><v>0</v></c>
          |      <c r="B1" t="s"><v>1</v></c>
          |      <c r="C1" t="s"><v>2</v></c>
          |    </row>
          |    <row r="2">
          |      <c r="A2"><v>3</v></c>
          |      <c r="B2"><v>7</v></c>
          |      <c r="C2" t="b"><v>1</v></c>
          |    </row>
          |  </sheetData>
          |</worksheet>""".stripMargin)
      // header does not match → the reference's try/except-skip case
      entry(z, "xl/worksheets/sheet3.xml",
        """<?xml version="1.0"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row r="1"><c r="A1" t="inlineStr"><is><t>scratch</t></is></c></row>
          |    <row r="2"><c r="A2"><v>99</v></c></row>
          |  </sheetData>
          |</worksheet>""".stripMargin)
    }
    p.toString
  }

  test("column ref codecs round-trip (reader vs independent builder)") {
    // Excel.colIndex (reader) and XlsxTestData.colRef (test builder) are
    // independent implementations of the base-26 bijection — agreement
    // across a wide range guards both against off-by-one at the Z/AA/AZ
    // boundaries.
    (0 until 10000).foreach { i =>
      assert(Excel.colIndex(XlsxTestData.colRef(i) + "1") === i, s"col $i")
    }
    assert(XlsxTestData.colRef(Excel.colIndex("BC7")) === "BC")
  }

  test("readXlsx converts date-styled numeric serials to ISO timestamps") {
    val p = tmpDir("xlsxd").resolve("dated.xlsx")
    def entry(z: ZipOutputStream, name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    Using.resource(new ZipOutputStream(Files.newOutputStream(p))) { z =>
      entry(z, "xl/workbook.xml",
        """<?xml version="1.0"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      entry(z, "xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      // style 0: General; style 1: builtin datetime 22; style 2: custom
      // date format; style 3: custom NON-date format (thousands)
      entry(z, "xl/styles.xml",
        """<?xml version="1.0"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <numFmts count="2">
          |    <numFmt numFmtId="164" formatCode="yyyy-mm-dd"/>
          |    <numFmt numFmtId="165" formatCode="#,##0.00"/>
          |  </numFmts>
          |  <cellXfs count="4">
          |    <xf numFmtId="0"/><xf numFmtId="22"/>
          |    <xf numFmtId="164"/><xf numFmtId="165"/>
          |  </cellXfs>
          |</styleSheet>""".stripMargin)
      entry(z, "xl/worksheets/sheet1.xml",
        """<?xml version="1.0"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row r="1">
          |      <c r="A1" t="inlineStr"><is><t>ts</t></is></c>
          |      <c r="B1" t="inlineStr"><is><t>d</t></is></c>
          |      <c r="C1" t="inlineStr"><is><t>amount</t></is></c>
          |    </row>
          |    <row r="2">
          |      <c r="A2" s="1"><v>45292.4375</v></c>
          |      <c r="B2" s="2"><v>45292</v></c>
          |      <c r="C2" s="3"><v>1234.5</v></c>
          |    </row>
          |  </sheetData>
          |</worksheet>""".stripMargin)
    }
    val df = Excel.readXlsx(spark, p.toString).df
    val row = df.select("ts", "d", "amount")
      .as[(String, String, String)].head()
    assert(row === ("2024-01-01 10:30:00", "2024-01-01 00:00:00", "1234.5"),
      "date-styled serials convert; non-date numerics stay lexical")
  }

  test("readXlsx unions matching sheets, resolves cell kinds, skips bad ones") {
    val path = writeXlsx(tmpDir("xlsx"))
    val res = Excel.readXlsx(spark, path)
    assert(res.skippedSheets === Seq("Notes"),
      "header-mismatched sheet must be skipped, not fatal")
    assert(res.df.columns.toSeq ===
      Seq("order_id", "amount", "note", "_sheet"))
    val rows = res.df
      .as[(String, Option[String], String, String)].collect().toSet
    assert(rows === Set(
      ("1", Some("10.5"), "alpha", "Jan"),   // shared string w/ rich run
      ("2", None, "gap row", "Jan"),         // missing B cell → null
      ("3", Some("7"), "true", "Feb")))      // boolean cell
    // downstream is a normal distributed plan: typed cast like post-CSV
    val typed = res.df.selectExpr(
      "cast(order_id as bigint) AS order_id", "cast(amount as double) AS amount")
    assert(typed.where("amount > 8").count() === 1)
  }

  test("readXlsx skips a sheet whose XML fails to parse, keeps the rest") {
    val p = tmpDir("xlsxbroken").resolve("broken.xlsx")
    XlsxTestData.writeRawParts(p, Seq(
      "Good" -> XlsxTestData.sheetXml(
        Seq(Seq("id", "v"), Seq("1", "a"))),
      // truncated markup: StAX throws mid-sheet
      "Mangled" -> """<?xml version="1.0"?><worksheet><sheetData><row""",
      // well-formed XML but a non-integer shared-string index
      "BadRef" -> """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData><row r="1">
        |    <c r="A1" t="s"><v>notanint</v></c>
        |  </row></sheetData>
        |</worksheet>""".stripMargin,
      "Good2" -> XlsxTestData.sheetXml(Seq(Seq("id", "v"), Seq("2", "b")))))
    val res = Excel.readXlsx(spark, p.toString)
    assert(res.skippedSheets.toSet === Set("Mangled", "BadRef"),
      "each failing sheet skips alone; the workbook survives")
    assert(res.df.select("id", "v", "_sheet").as[(String, String, String)]
      .collect().toSet === Set(("1", "a", "Good"), ("2", "b", "Good2")))
  }

  test("readXlsx aligns reordered/extra columns by name, skips missing") {
    val p = tmpDir("xlsxalign").resolve("align.xlsx")
    XlsxTestData.write(p, Seq(
      "Base"    -> Seq(Seq("order_id", "amount"), Seq("1", "10")),
      // same columns, different order, plus an extra one → aligned
      "Shuffled" -> Seq(Seq("extra", "amount", "order_id"),
        Seq("x", "20", "2")),
      // missing a required column → skipped
      "Partial" -> Seq(Seq("order_id"), Seq("3"))))
    val res = Excel.readXlsx(spark, p.toString)
    assert(res.skippedSheets === Seq("Partial"))
    assert(res.df.columns.toSeq === Seq("order_id", "amount", "_sheet"),
      "schema is the first sheet's header; extra columns dropped")
    assert(res.df.as[(String, String, String)].collect().toSet ===
      Set(("1", "10", "Base"), ("2", "20", "Shuffled")))
  }
}
