package graft.ingest

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.util.Using

/** Test helper: build a minimal real `.xlsx` (zip of XML parts) from
  * (sheetName, rows) with every cell as an inline string — enough for any
  * spec that needs workbook INPUT (ExcelSpec's own file additionally
  * exercises shared strings/booleans/numbers). */
object XlsxTestData {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Null cells are omitted (read back as null). Returns the file path. */
  def write(path: Path, sheets: Seq[(String, Seq[Seq[String]])]): String =
    writeRawParts(path, sheets.map { case (n, rows) => n -> sheetXml(rows) })

  /** Like [[write]], but each sheet's part body is RAW bytes — for specs
    * that need a malformed worksheet among good ones. */
  def writeRawParts(path: Path, sheets: Seq[(String, String)]): String = {
    def entry(z: ZipOutputStream, name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    Using.resource(new ZipOutputStream(Files.newOutputStream(path))) { z =>
      val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      entry(z, "xl/workbook.xml",
        s"""<?xml version="1.0"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
           |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |  <sheets>$sheetDecls</sheets>
           |</workbook>""".stripMargin)
      val rels = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="w" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      entry(z, "xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
           |  $rels
           |</Relationships>""".stripMargin)
      sheets.zipWithIndex.foreach { case ((_, body), i) =>
        entry(z, s"xl/worksheets/sheet${i + 1}.xml", body)
      }
    }
    path.toString
  }

  /** A well-formed inline-string worksheet body for [[writeRawParts]]. */
  def sheetXml(rows: Seq[Seq[String]]): String = {
    val body = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.collect {
        case (v, c) if v != null =>
          val ref = s"${colRef(c)}${r + 1}"
          s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString("\n")
    s"""<?xml version="1.0"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |  <sheetData>
       |$body
       |  </sheetData>
       |</worksheet>""".stripMargin
  }

  private[ingest] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }
}
