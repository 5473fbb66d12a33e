package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.GraftPlanError
import graft.core.StageContext
import graft.operators.{ExcelReadSource, ExcelWriteSink}

/** Native .xlsx read/write (no POI): round-trip typing, header fallbacks,
  * sheet selection, sharedStrings, and the driver_limit guard. */
class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempFile("graft_excel", suffix).toString

  private def read(cfg: (String, Any)*) =
    ExcelReadSource(StageContext(spark, Seq.empty, Cfg.of(cfg: _*)))

  test("write → read round-trips strings, longs, doubles, booleans, nulls") {
    val path = tmp(".xlsx")
    val df = Seq(
      (1L, "alpha <&> \"q\"", 2.5, true),
      (2L, "beta", -0.125, false)
    ).toDF("id", "name", "score", "flag")
      .withColumn("opt", F.when(F.col("id") === 1, F.lit("x")))
    ExcelWriteSink(StageContext.one(spark, df, Cfg.of("path" -> path)))

    val back = read("path" -> path)
    // columns come back sorted (write sorts; JSON inference sorts too)
    assert(back.columns.toSeq === Seq("flag", "id", "name", "opt", "score"))
    val rows = back.orderBy("id")
      .select("id", "name", "score", "flag", "opt")
      .as[(Long, String, Double, Boolean, Option[String])].collect()
    assert(rows === Array(
      (1L, "alpha <&> \"q\"", 2.5, true, Some("x")),
      (2L, "beta", -0.125, false, None)))
  }

  test("has_headers=false yields column_{i}; numeric headers fall back too") {
    val path = tmp(".xlsx")
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    ExcelWriteSink(StageContext.one(spark, df, Cfg.of(
      "path" -> path, "write_headers" -> false)))
    val back = read("path" -> path, "has_headers" -> false)
    assert(back.columns.toSeq === Seq("column_0", "column_1"))
    assert(back.count() === 2)
  }

  test("sheet selection by name and by index; unknown sheet fails loud") {
    val path = tmp(".xlsx")
    ExcelWriteSink(StageContext.one(spark, Seq(Tuple1(7L)).toDF("n"),
      Cfg.of("path" -> path, "sheet" -> "metrics")))
    assert(read("path" -> path, "sheet" -> "metrics").columns.toSeq === Seq("n"))
    assert(read("path" -> path, "sheet" -> "0").count() === 1)
    intercept[GraftConfigError](read("path" -> path, "sheet" -> "nope"))
  }

  test("reads sharedStrings-based files (the form real producers emit)") {
    // hand-build an xlsx whose strings go through xl/sharedStrings.xml
    val path = tmp(".xlsx")
    def entry(name: String, body: String) = name -> body
    val parts = Seq(
      entry("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        """</Types>"""),
      entry("_rels/.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      entry("xl/workbook.xml",
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""),
      entry("xl/sharedStrings.xml",
        """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">""" +
        """<si><t>city</t></si><si><t>Oslo</t></si><si><r><t>Rey</t></r><r><t>kjavik</t></r></si></sst>"""),
      entry("xl/worksheets/sheet1.xml",
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>1</v></c></row>""" +
        """<row r="3"><c r="A3" t="s"><v>2</v></c></row>""" +
        """</sheetData></worksheet>"""))
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    parts.foreach { case (n, b) =>
      out.putNextEntry(new java.util.zip.ZipEntry(n))
      out.write(b.getBytes("UTF-8")); out.closeEntry()
    }
    out.close()
    val back = read("path" -> path)
    assert(back.columns.toSeq === Seq("city"))
    assert(back.as[String].collect().sorted === Array("Oslo", "Reykjavik"))
  }

  test("driver_limit fails loud instead of collecting the world") {
    val path = tmp(".xlsx")
    val e = intercept[GraftPlanError](ExcelWriteSink(StageContext.one(spark,
      (1 to 100).toDF("n"), Cfg.of("path" -> path, "driver_limit" -> 10))))
    assert(e.getMessage.contains("driver_limit"))
  }
}
