package graft.operators

import org.apache.spark.sql.DataFrame
import graft.config._
import graft.core._

/** Native .xlsx support with zero external dependencies — an XLSX file is a
  * ZIP of OOXML parts, all readable/writable with java.util.zip + the JDK
  * XML stack, so the excel.read / excel.write slots (reference
  * plugins-wasm/conveyor-plugin-excel-wasm/src/lib.rs:62-320) need no POI
  * or spark-excel jar.
  *
  * Reference semantics preserved:
  *  - read: `path`, optional `sheet` (name, else numeric index), and
  *    `has_headers` (default true; header cells that aren't strings fall
  *    back to `column_{i}`, extra cells beyond the header width too).
  *    Cell types map to data: shared/inline strings → string, `t="b"` →
  *    boolean, numbers → long when integral else double, empty → null.
  *  - write: `sheet` (default Sheet1), `write_headers` (default true),
  *    columns emitted in SORTED name order (lib.rs:318 sorts for
  *    deterministic output).
  *
  * Driver-side by design — a spreadsheet is a small, single-file exchange
  * format. The write path is bounded by `driver_limit` (default 1M rows,
  * same loud-failure contract as json.write format=records); .xls (the
  * legacy binary format) is not supported, only .xlsx.
  *
  * Limitations (documented, not silent): numeric cells with date styles
  * come back as raw serial numbers (style-table date detection is omitted);
  * formulas yield their cached value.
  */
private[operators] object ExcelXml {
  def esc(s: String): String = s.flatMap {
    case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
    case '"' => "&quot;"; case c => c.toString
  }

  /** "BC12" → 0-based column index 54. */
  def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  /** 0-based column index → letters ("A", "AA", ...). */
  def colName(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  def parseXml(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
  }

  def elems(parent: org.w3c.dom.Node, local: String): Seq[org.w3c.dom.Element] = {
    val out = Vector.newBuilder[org.w3c.dom.Element]
    var c = parent.getFirstChild
    while (c != null) {
      c match {
        case e: org.w3c.dom.Element if e.getLocalName == local => out += e
        case _ =>
      }
      c = c.getNextSibling
    }
    out.result()
  }

  /** All descendant <t> text concatenated (plain and rich-run strings). */
  def textOf(e: org.w3c.dom.Element): String = {
    val ts = e.getElementsByTagNameNS("*", "t")
    (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
  }
}

object ExcelReadSource extends Stage {
  val name = "excel.read"
  val kind = StageKind.Source

  def apply(ctx: StageContext): DataFrame = {
    import ExcelXml._
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val sheetSel = cfg.strOpt("sheet")
    val hasHeaders = cfg.boolOr("has_headers", true)

    val zf = new java.util.zip.ZipFile(path)
    try {
      def part(name: String): Option[Array[Byte]] =
        Option(zf.getEntry(name)).map(e => zf.getInputStream(e).readAllBytes())
      def required(name: String): Array[Byte] =
        part(name).getOrElse(throw new GraftPlanError(s"excel.read: '$path' has no $name — not an .xlsx file"))

      // workbook: ordered (sheetName, rId)
      val wb = parseXml(required("xl/workbook.xml"))
      val sheetEls = {
        val ns = wb.getElementsByTagNameNS("*", "sheet")
        (0 until ns.getLength).map(ns.item(_).asInstanceOf[org.w3c.dom.Element])
      }
      if (sheetEls.isEmpty) throw new GraftPlanError(s"excel.read: '$path' has no sheets")
      val sheets = sheetEls.map { e =>
        val rid = Option(e.getAttributeNS(
          "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id"))
          .filter(_.nonEmpty).getOrElse(e.getAttribute("r:id"))
        (e.getAttribute("name"), rid)
      }
      val chosen = sheetSel match {
        case None => sheets.head
        case Some(sel) => sheets.find(_._1 == sel).orElse(
          sel.toIntOption.filter(i => i >= 0 && i < sheets.size).map(sheets(_))
        ).getOrElse(throw new GraftConfigError(
          s"excel.read: sheet '$sel' not found (have: ${sheets.map(_._1).mkString(", ")})"))
      }

      // workbook rels: rId → worksheet part path
      val rels = parseXml(required("xl/_rels/workbook.xml.rels"))
      val relMap = {
        val ns = rels.getElementsByTagNameNS("*", "Relationship")
        (0 until ns.getLength).map(ns.item(_).asInstanceOf[org.w3c.dom.Element])
          .map(e => e.getAttribute("Id") -> e.getAttribute("Target")).toMap
      }
      val target = relMap.getOrElse(chosen._2,
        throw new GraftPlanError(s"excel.read: no relationship for sheet '${chosen._1}'"))
      val sheetPath = if (target.startsWith("/")) target.drop(1) else s"xl/$target"

      val shared: IndexedSeq[String] = part("xl/sharedStrings.xml").map { b =>
        val d = parseXml(b)
        val ns = d.getElementsByTagNameNS("*", "si")
        (0 until ns.getLength).map(i => textOf(ns.item(i).asInstanceOf[org.w3c.dom.Element]))
      }.getOrElse(IndexedSeq.empty)

      // sheet rows → (colIdx → typed value)
      sealed trait Cell
      case class SCell(v: String) extends Cell
      case class NCell(v: String) extends Cell
      case class BCell(v: Boolean) extends Cell
      val sheetDoc = parseXml(required(sheetPath))
      val rowNodes = sheetDoc.getElementsByTagNameNS("*", "row")
      val rows: Seq[Map[Int, Cell]] = (0 until rowNodes.getLength).map { ri =>
        val rowEl = rowNodes.item(ri).asInstanceOf[org.w3c.dom.Element]
        var next = 0
        elems(rowEl, "c").flatMap { c =>
          val idx = Option(c.getAttribute("r")).filter(_.nonEmpty)
            .map(colIndex).getOrElse(next)
          next = idx + 1
          val t = c.getAttribute("t")
          val v = elems(c, "v").headOption.map(_.getTextContent)
          val cell: Option[Cell] = t match {
            case "s"         => v.flatMap(_.toIntOption).flatMap(shared.lift).map(SCell)
            case "inlineStr" => elems(c, "is").headOption.map(is => SCell(textOf(is)))
            case "str"       => v.map(SCell)
            case "b"         => v.map(x => BCell(x.trim == "1" || x.trim.equalsIgnoreCase("true")))
            case "e"         => v.map(x => SCell(s"ERROR: $x"))
            case _           => v.map(NCell)
          }
          cell.map(idx -> _)
        }.toMap
      }

      val spark = ctx.spark
      import spark.implicits._
      if (rows.isEmpty) return spark.emptyDataFrame

      val width = rows.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
      val (headers, dataRows) =
        if (hasHeaders) {
          val h = (0 until width).map { i =>
            rows.head.get(i) match {
              case Some(SCell(s)) if s.nonEmpty => s
              case _ => s"column_$i"
            }
          }
          (h, rows.tail)
        } else ((0 until width).map(i => s"column_$i"), rows)

      // typed cells → JSON lines → Spark's JSON schema inference (same
      // inference json.read uses; integral numbers stay longs)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val jsonLines = dataRows.map { m =>
        val o = mapper.createObjectNode()
        m.foreach { case (i, cell) =>
          val key = if (i < headers.size) headers(i) else s"column_$i"
          cell match {
            case SCell(s) => o.put(key, s)
            case BCell(b) => o.put(key, b)
            case NCell(n) =>
              val asLong = n.toLongOption
              if (asLong.isDefined && !n.contains(".") && !n.toLowerCase.contains("e"))
                o.put(key, asLong.get)
              else o.put(key, n.toDouble)
          }
        }
        mapper.writeValueAsString(o)
      }
      val reader = graft.sources.SchemaOpt.resolve(cfg) match {
        case Some(s) => spark.read.schema(s)
        case None    => spark.read
      }
      reader.json(jsonLines.toDS)
    } finally zf.close()
  }
}

object ExcelWriteSink extends Stage {
  val name = "excel.write"
  val kind = StageKind.Sink

  def apply(ctx: StageContext): DataFrame = {
    import ExcelXml._
    val df = ctx.primary
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val sheetName = cfg.strOr("sheet", "Sheet1")
    val writeHeaders = cfg.boolOr("write_headers", true)
    val limit = cfg.longOr("driver_limit", 1000000L)

    val columns = df.columns.sorted.toIndexedSeq   // reference sorts (lib.rs:318)
    val rows = df.select(columns.map(org.apache.spark.sql.functions.col): _*)
      .limit(limit.toInt + 1).collect()
    if (rows.length > limit)
      throw new GraftPlanError(s"excel.write materializes on the driver; input exceeds " +
        s"driver_limit=$limit rows — a spreadsheet is not a big-data sink")

    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    var r = 1
    def cellXml(ci: Int, v: Any): String = {
      val ref = s"${colName(ci)}$r"
      v match {
        case null => ""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        // NaN/Infinity have no OOXML numeric representation — emitting
        // <v>NaN</v> produces a file Excel refuses to open. Blank cell
        // (= null), matching the reference's serde NaN→null behavior.
        case d: Double if d.isNaN || d.isInfinite => ""
        case f: Float if f.isNaN || f.isInfinite => ""
        case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
          s"""<c r="$ref"><v>$n</v></c>"""
        case d: java.math.BigDecimal => s"""<c r="$ref"><v>${d.toPlainString}</v></c>"""
        case s => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s.toString)}</t></is></c>"""
      }
    }
    if (writeHeaders) {
      sb ++= s"""<row r="$r">"""
      columns.zipWithIndex.foreach { case (c, i) => sb ++= cellXml(i, c) }
      sb ++= "</row>"; r += 1
    }
    rows.foreach { row =>
      sb ++= s"""<row r="$r">"""
      columns.indices.foreach(i => sb ++= cellXml(i, row.get(i)))
      sb ++= "</row>"; r += 1
    }
    sb ++= "</sheetData></worksheet>"

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
         s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
         """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sb.toString)

    // through the GraftFs seam, so `excel.write` accepts hdfs:/s3a:
    // destinations like every other registered sink
    val out = new java.util.zip.ZipOutputStream(graft.core.GraftFs.createStream(path))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
    df
  }
}
