package graft.ingest

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try, Using}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S2 for REAL — multi-sheet `.xlsx` ingestion with zero external
  * dependencies (ref: `orders_etl.py:41-64`, boto3 bytes → `pd.ExcelFile`
  * → iterate `sheet_names`, skip sheets that fail to parse).
  *
  * An xlsx file is a zip of XML parts; the JDK ships both the zip reader
  * (`java.util.zip`) and a streaming XML parser (StAX), so no Excel
  * library is needed. Parsing runs on the DRIVER by design: spreadsheets
  * are an inherently small, human-authored format (the reference parses
  * them driver-side in pandas too) — they are the entry point of a
  * pipeline, not its bulk data, which arrives as CSV/Parquet and scans
  * distributed ([[Sources]]). The parsed rows feed `createDataFrame`, and
  * everything downstream is a normal distributed plan.
  *
  * Reference semantics preserved:
  *   - every sheet is read, first row = header (`pd.read_excel` default);
  *   - a sheet that FAILS TO PARSE (malformed XML, bad shared-string
  *     index, unparseable cell) or whose header lacks a column of the
  *     first successful sheet's is SKIPPED and reported, never fatal —
  *     the per-sheet try/except at `orders_etl.py:57-64`;
  *   - columns are aligned BY NAME to the first successful sheet's
  *     header (extra columns dropped, any order accepted — `pd.concat`
  *     tolerates reordered/extra columns the same way);
  *   - surviving sheets are concatenated (`pd.concat`), here with a
  *     `_sheet` provenance column appended.
  *
  * All cells surface as strings (numbers as their stored lexical form,
  * booleans as true/false, shared/inline strings resolved, and numeric
  * cells carrying a DATE STYLE — how Excel actually stores timestamps —
  * as "yyyy-MM-dd HH:mm:ss" via the styles.xml number-format mapping);
  * the caller applies the typed schema cast exactly as it does after a
  * CSV scan.
  */
object Excel {

  final case class XlsxResult(df: DataFrame, skippedSheets: Seq[String])

  /** Read every sheet of `path`; union (aligned by column name) the ones
    * that parse AND carry every column of the first parseable sheet's
    * header. Parse failures and header mismatches alike only skip the one
    * sheet. */
  def readXlsx(spark: SparkSession, path: String): XlsxResult = {
    val sheets = parseWorkbook(path) // (sheetName, Try(rows)) in order
    val parsed = sheets.collect { case (n, Success(rows)) => n -> rows }
    val unparseable = sheets.collect { case (n, Failure(_)) => n }
    val header = parsed.collectFirst {
      case (_, rows) if rows.nonEmpty => rows.head
    }.getOrElse(throw new IllegalArgumentException(
      s"xlsx at $path has no parseable non-empty sheet"))
    val (good, mismatched) = parsed.partition { case (_, rows) =>
      rows.headOption.exists(h => header.forall(h.contains))
    }
    val data = good.flatMap { case (name, rows) =>
      val colOf = header.map(rows.head.indexOf(_)) // by-name alignment
      rows.drop(1).map { r =>
        Row.fromSeq(colOf.map(i => if (i < r.length) r(i) else null) :+ name)
      }
    }
    val schema = StructType(
      header.map(c => StructField(c, StringType, nullable = true)) :+
        StructField("_sheet", StringType, nullable = false))
    XlsxResult(
      spark.createDataFrame(data.asJava, schema),
      unparseable ++ mismatched.map(_._1))
  }

  /** (sheetName, Try(rows-of-cells)) for every sheet, in workbook order.
    * Cells are resolved to strings; rows are padded only as far as their
    * last populated cell (caller pads to header width). A sheet whose XML
    * fails to parse (malformed markup, out-of-range shared-string index,
    * non-numeric text in a typed cell) surfaces as a `Failure` for THAT
    * sheet only — the workbook-level parts (shared strings, styles, rels)
    * stay fatal, since without them no sheet is interpretable. */
  private def parseWorkbook(
      path: String): Seq[(String, Try[Vector[Vector[String]]])] =
    Using.resource(new ZipFile(path)) { zip =>
      def open(name: String): Option[InputStream] =
        Option(zip.getEntry(name)).map(zip.getInputStream)

      val shared = open("xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(Vector.empty)
      val dateStyles = open("xl/styles.xml")
        .map(parseDateStyles).getOrElse(Set.empty)
      val rels = open("xl/_rels/workbook.xml.rels")
        .map(parseRels).getOrElse(Map.empty)
      val wb = open("xl/workbook.xml")
        .map(parseWorkbookSheets).getOrElse(Seq.empty)
      wb.flatMap { case (name, rid) =>
        val target = rels.get(rid)
          .map(t => if (t.startsWith("/")) t.drop(1) else s"xl/$t")
        target.flatMap(open)
          .map(in => name -> Try(parseSheet(in, shared, dateStyles)))
      }
    }

  private def xmlReader(in: InputStream) = {
    val f = XMLInputFactory.newInstance()
    // No DTDs/external entities in spreadsheet parts — disable resolution
    // outright (XXE hygiene for untrusted uploads, the raw-zone case).
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** `<sst><si>…</si></sst>`: one entry per `<si>`, concatenating every
    * `<t>` within it (plain and rich-text runs). */
  private def parseSharedStrings(in: InputStream): Vector[String] =
    Using.resource(in) { s =>
      val r = xmlReader(s)
      val out = Vector.newBuilder[String]
      var cur: StringBuilder = null
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => cur = new StringBuilder
              case "t"  => inT = cur != null
              case _    =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t"  => inT = false
              case "si" => out += cur.toString; cur = null
              case _    =>
            }
          case _ =>
        }
      }
      out.result()
    }

  /** Excel's builtin date/time number formats (ECMA-376 §18.8.30). */
  private val BuiltinDateFmts: Set[Int] = ((14 to 22) ++ (45 to 47)).toSet

  /** styles.xml → the set of cellXfs style INDICES (what a cell's `s`
    * attribute references) whose number format renders a date/time.
    * Custom formats count as dates when, after stripping quoted/bracketed
    * sections and color codes, they contain a date token (the classic
    * heuristic POI uses). Excel-authored workbooks store timestamps as
    * NUMERIC SERIALS + a date style — without this mapping they would
    * surface as raw numbers like "45292.4375". */
  private def parseDateStyles(in: InputStream): Set[Int] =
    Using.resource(in) { s =>
      val r = xmlReader(s)
      val custom = Map.newBuilder[Int, String]
      val xfFmtIds = Vector.newBuilder[Int]
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "numFmt" =>
                (Option(r.getAttributeValue(null, "numFmtId")),
                  Option(r.getAttributeValue(null, "formatCode"))) match {
                  case (Some(id), Some(code)) => custom += id.toInt -> code
                  case _                      =>
                }
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                xfFmtIds += Option(r.getAttributeValue(null, "numFmtId"))
                  .map(_.toInt).getOrElse(0)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT
              if r.getLocalName == "cellXfs" => inCellXfs = false
          case _ =>
        }
      }
      val customMap = custom.result()
      def isDateFmt(id: Int): Boolean =
        BuiltinDateFmts(id) || customMap.get(id).exists { code =>
          code.replaceAll("\"[^\"]*\"|\\[[^\\]]*\\]", "")
            .exists("ymdhs".contains(_))
        }
      xfFmtIds.result().zipWithIndex.collect {
        case (fmtId, i) if isDateFmt(fmtId) => i
      }.toSet
    }

  /** Serial date (days since 1899-12-30, fraction = time of day) →
    * "yyyy-MM-dd HH:mm:ss". The 1899-12-30 epoch absorbs Excel's
    * 1900-leap-year bug for all post-Feb-1900 dates. */
  private def serialToTimestamp(raw: String): String = {
    val d = raw.toDouble
    var days = math.floor(d).toLong
    var secs = math.round((d - days) * 86400.0)
    if (secs >= 86400) { days += 1; secs -= 86400 }
    java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
      .plusDays(days).plusSeconds(secs)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  /** workbook.xml.rels: Relationship Id → Target. */
  private def parseRels(in: InputStream): Map[String, String] =
    Using.resource(in) { s =>
      val r = xmlReader(s)
      val out = Map.newBuilder[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null) out += id -> target
        }
      }
      out.result()
    }

  /** workbook.xml: sheet name → relationship id, in declaration order. */
  private def parseWorkbookSheets(in: InputStream): Seq[(String, String)] =
    Using.resource(in) { s =>
      val r = xmlReader(s)
      val out = Seq.newBuilder[(String, String)]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // the r:id attribute lives in the officeDocument relationships
          // namespace; match by local name to stay prefix-agnostic
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          (Option(name), rid) match {
            case (Some(n), Some(i)) => out += n -> i
            case _                  =>
          }
        }
      }
      out.result()
    }

  /** One worksheet's `<sheetData>`: rows of cells resolved to strings.
    * Cell refs ("B3") place values in their column; gaps read null. */
  private def parseSheet(in: InputStream, shared: Vector[String],
      dateStyles: Set[Int]): Vector[Vector[String]] =
    Using.resource(in) { s =>
      val r = xmlReader(s)
      val rows = Vector.newBuilder[Vector[String]]
      var row: mutable.ArrayBuffer[String] = null
      var cellCol = -1
      var cellType = ""
      var cellStyle = -1
      var inV = false
      var inT = false
      var text: StringBuilder = null
      def endCell(): Unit = if (row != null && cellCol >= 0 && text != null) {
        val raw = text.toString
        val v = cellType match {
          case "s" => shared.lift(raw.trim.toInt).orNull
          case "b" => if (raw.trim == "1") "true" else "false"
          // numeric cell carrying a date style: an Excel-authored
          // timestamp, stored as a day serial — convert to ISO text
          case "" | "n" if dateStyles(cellStyle) && raw.trim.nonEmpty =>
            serialToTimestamp(raw.trim)
          case _ => raw // n (default), str, inlineStr: lexical form
        }
        while (row.length <= cellCol) row += null
        row(cellCol) = v
        text = null
      }
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = mutable.ArrayBuffer.empty[String]
              case "c" if row != null =>
                val ref = Option(r.getAttributeValue(null, "r"))
                cellCol = ref.map(colIndex).getOrElse(row.length)
                cellType =
                  Option(r.getAttributeValue(null, "t")).getOrElse("")
                cellStyle = Option(r.getAttributeValue(null, "s"))
                  .map(_.toInt).getOrElse(-1)
                text = null
              case "v" => inV = true; text = new StringBuilder
              case "t" => inT = true
                if (text == null) text = new StringBuilder
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if ((inV || inT) && text != null) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v"   => inV = false
              case "t"   => inT = false
              case "c"   => endCell(); cellCol = -1
              case "row" =>
                if (row != null) rows += row.toVector
                row = null
              case _ =>
            }
          case _ =>
        }
      }
      rows.result()
    }

  /** "BC7" → zero-based column index 54. */
  private[ingest] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) =>
      a * 26 + (c.toUpper - 'A' + 1)) - 1
}
