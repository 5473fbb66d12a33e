package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config._

class TomlSpec extends AnyFunSuite {

  test("scalars, arrays, inline tables, comments") {
    val t = Toml.parse(
      """# top comment
        |title = "hello \"world\""
        |count = 42
        |ratio = 3.5
        |neg = -7
        |flag = true
        |off = false
        |tags = ["a", "b", "c"]   # trailing comment
        |nums = [1, 2, 3]
        |mixed = { x = 1, y = "two", z = [true, false] }
        |lit = 'no \escape'
        |""".stripMargin)
    val c = Cfg(t.v)
    assert(c.str("title") == "hello \"world\"")
    assert(c.long("count") == 42L)
    assert(c.doubleOr("ratio", 0) == 3.5)
    assert(c.long("neg") == -7L)
    assert(c.boolOr("flag", false))
    assert(!c.boolOr("off", true))
    assert(c.strList("tags") == Vector("a", "b", "c"))
    assert(c.arrOpt("nums").get == Vector(CLong(1), CLong(2), CLong(3)))
    val m = c.tblOpt("mixed").get
    assert(m.long("x") == 1L && m.str("y") == "two")
    assert(c.str("lit") == "no \\escape")
  }

  test("tables, nested tables, array-of-tables with subtables") {
    val t = Toml.parse(
      """[pipeline]
        |name = "p"
        |
        |[global]
        |log_level = "info"
        |
        |[global.variables]
        |env = "prod"
        |
        |[[stages]]
        |id = "s1"
        |function = "csv.read"
        |[stages.config]
        |path = "/tmp/in.csv"
        |headers = true
        |
        |[[stages]]
        |id = "s2"
        |function = "filter.apply"
        |inputs = ["s1"]
        |[stages.config]
        |value = 30
        |""".stripMargin)
    val c = Cfg(t.v)
    assert(c.tblOpt("pipeline").get.str("name") == "p")
    assert(c.tblOpt("global").get.tblOpt("variables").get.str("env") == "prod")
    val stages = c.tblArr("stages")
    assert(stages.size == 2)
    assert(stages(0).str("id") == "s1")
    assert(stages(0).tblOpt("config").get.str("path") == "/tmp/in.csv")
    assert(stages(1).tblOpt("config").get.long("value") == 30L)
    assert(stages(1).strList("inputs") == Vector("s1"))
  }

  test("multiline strings (basic and literal)") {
    val t = Toml.parse(
      "a = \"\"\"\nline1\nline2\"\"\"\nb = '''\nraw \\n ${x}\n'''\n")
    val c = Cfg(t.v)
    assert(c.str("a") == "line1\nline2")
    assert(c.str("b") == "raw \\n ${x}\n")
  }

  test("multiline arrays") {
    val t = Toml.parse(
      """aggs = [
        |  { column = "a", operation = "sum" },
        |  { column = "b", operation = "count" },
        |]
        |""".stripMargin)
    val aggs = Cfg(t.v).tblArr("aggs")
    assert(aggs.map(_.str("column")) == Vector("a", "b"))
  }

  test("parse errors carry line numbers") {
    val e = intercept[Toml.TomlError](Toml.parse("[oops\nx = 1"))
    assert(e.getMessage.contains("line 1"))
    val e2 = intercept[Toml.TomlError](Toml.parse("x = 1\ny = @bad"))
    assert(e2.getMessage.contains("line 2"))
  }

  test("duplicate keys rejected") {
    intercept[Toml.TomlError](Toml.parse("x = 1\nx = 2"))
  }
}

class PipelineConfigSpec extends AnyFunSuite {

  test("variable resolution and interpolation") {
    val pc = PipelineConfig.fromString(
      """[pipeline]
        |name = "t"
        |[global.variables]
        |base = "/data"
        |[[stages]]
        |id = "s"
        |function = "csv.read"
        |config = { path = "{{base}}/in.csv" }
        |""".stripMargin)
    assert(pc.stages(0).config.str("path") == "/data/in.csv")
  }

  test("env var resolution via ${}") {
    // PATH always exists
    val s = PipelineConfig.resolveEnv("x=${PATH}!")
    assert(s.startsWith("x=") && s.endsWith("!") && s.length > 3)
    assert(PipelineConfig.resolveEnv("${DEFINITELY_NOT_SET_12345}") == "")
  }

  test("unknown {{var}} left as-is") {
    assert(PipelineConfig.substitute("a {{nope}} b", Map.empty) == "a {{nope}} b")
  }

  test("[global.spark] flattens nested TOML keys to dotted conf names") {
    val pc = PipelineConfig.fromString(
      """[pipeline]
        |name = "t"
        |[global.spark]
        |sql.adaptive.enabled = true
        |sql.autoBroadcastJoinThreshold = "64MB"
        |[[stages]]
        |id = "s"
        |function = "csv.read"
        |config = { path = "/x.csv" }
        |""".stripMargin)
    assert(pc.global.sparkConf == Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "64MB"))
  }

  test("validation: duplicate ids and dangling inputs") {
    def mk(body: String) = PipelineConfig.fromString(
      s"""[pipeline]
         |name = "t"
         |$body""".stripMargin)
    intercept[GraftConfigError](mk(
      """[[stages]]
        |id = "a"
        |function = "csv.read"
        |[[stages]]
        |id = "a"
        |function = "csv.read"
        |""".stripMargin))
    intercept[GraftConfigError](mk(
      """[[stages]]
        |id = "a"
        |function = "filter.apply"
        |inputs = ["ghost"]
        |""".stripMargin))
    intercept[GraftConfigError](mk(""))
  }

  test("error strategy parsing") {
    def strat(s: String) = PipelineConfig.fromString(
      s"""[pipeline]
         |name = "t"
         |[error_handling]
         |$s
         |[[stages]]
         |id = "a"
         |function = "csv.read"
         |""".stripMargin).errorHandling.strategy
    assert(strat("strategy = \"stop\"") == ErrorStrategy.Stop)
    assert(strat("strategy = \"continue\"") == ErrorStrategy.Continue)
    assert(strat("strategy = \"retry\"\nmax_retries = 2\nretry_delay_seconds = 0") ==
      ErrorStrategy.Retry(2, 0))
  }
}
