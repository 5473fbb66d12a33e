package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI surfaces that don't need a SparkSession: stage describe, stage add
  * (non-interactive append with pre-write validation), list provenance
  * formatting. Error paths call sys.exit and are deliberately not driven
  * here (tests share one forked JVM); the happy paths capture stdout. */
class CliSpec extends AnyFunSuite {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(body)
    bos.toString("UTF-8")
  }

  test("stage describe prints kind, summary, and config keys") {
    val out = captureOut(graft.cli.Main.main(Array("stage", "describe", "filter.apply")))
    assert(out.contains("filter.apply"))
    assert(out.contains("kind:    transform"))
    assert(out.contains("summary: row filter"))
    assert(out.contains("config:"))
    val src = captureOut(graft.cli.Main.main(Array("stage", "describe", "csv.read")))
    assert(src.contains("kind:    source"))
  }

  test("stage add appends a validated stage block") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli")
    val toml = dir.resolve("p.toml")
    java.nio.file.Files.writeString(toml,
      """[pipeline]
        |name = "p"
        |[[stages]]
        |id = "src"
        |function = "inline.data"
        |config = { jsonl = "{\"v\": 1}" }
        |""".stripMargin)
    val out = captureOut(graft.cli.Main.main(Array(
      "stage", "add", toml.toString,
      "--id", "keep", "--function", "filter.apply", "--inputs", "src",
      "--config", "column=v", "--config", "operator=>=", "--config", "value=1")))
    assert(out.contains("added stage 'keep'"))
    assert(out.contains("2 stages total"))
    val written = java.nio.file.Files.readString(toml)
    assert(written.contains("""id = "keep""""))
    assert(written.contains("""inputs = ["src"]"""))
    // typed TOML rendering: bare number for value, quoted strings otherwise
    assert(written.contains("""value = 1"""))
    assert(written.contains("""operator = ">=""""))
    // the appended file parses and validates as a whole
    val pc = graft.config.PipelineConfig.fromString(written)
    assert(pc.stages.map(_.id) === Vector("src", "keep"))
    assert(pc.stages.last.config.str("column") === "v")
  }

  test("stage edit rewrites fields in place and revalidates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_edit")
    val toml = dir.resolve("p.toml")
    java.nio.file.Files.writeString(toml,
      """# top comment survives edits
        |[pipeline]
        |name = "p"
        |[[stages]]
        |id = "src"
        |function = "inline.data"
        |config = { jsonl = "{\"v\": 1}" }
        |[[stages]]
        |id = "keep"
        |function = "filter.apply"
        |inputs = ["src"]
        |config = { column = "v", operator = ">=", value = 1, junk = "x" }
        |""".stripMargin)
    val out = captureOut(graft.cli.Main.main(Array(
      "stage", "edit", toml.toString, "keep",
      "--set", "value=5", "--set", "operator=<", "--remove", "junk")))
    assert(out.contains("edited stage 'keep'"))
    val written = java.nio.file.Files.readString(toml)
    assert(written.contains("# top comment survives edits"))
    val pc = graft.config.PipelineConfig.fromString(written)
    assert(pc.stages.map(_.id) === Vector("src", "keep"))
    val keep = pc.stageById("keep").get
    assert(keep.config.long("value") === 5L)
    assert(keep.config.str("operator") === "<")
    assert(keep.config.str("column") === "v", "unedited keys must survive")
    assert(!keep.config.has("junk"))
    assert(keep.inputs === Vector("src"), "inputs survive when not edited")
    // --set-inputs and --set-function rewrite the other fields
    captureOut(graft.cli.Main.main(Array(
      "stage", "edit", toml.toString, "keep",
      "--set-function", "select.apply", "--remove", "operator",
      "--remove", "value", "--set", "columns=v")))
    val pc2 = graft.config.PipelineConfig.fromString(java.nio.file.Files.readString(toml))
    assert(pc2.stageById("keep").get.function === "select.apply")
    // the edited pipeline still validates end-to-end
    val reg = graft.core.Registry.withDefaults
    assert(pc2.stages.forall(s => reg.contains(s.function)))
  }

  test("scaffold template itself validates; stage new is an alias") {
    val pc = graft.config.PipelineConfig.fromString(graft.cli.Main.scaffoldTemplate)
    assert(pc.stages.size === 3)
    val reg = graft.core.Registry.withDefaults
    assert(pc.stages.forall(s => reg.contains(s.function)))
  }

  test("build assembles a whole validated pipeline from --stage groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft_build")
    val toml = dir.resolve("built.toml")
    val out = captureOut(graft.cli.Main.main(Array(
      "build", toml.toString, "--name", "built_pipe",
      "--stage", "id=src", "function=inline.data", "config.jsonl={\"v\": 1}",
      "--stage", "id=keep", "function=filter.apply", "inputs=src",
      "config.column=v", "config.operator=gte", "config.value=1",
      "--stage", "id=out", "function=noop.sink", "inputs=keep")))
    assert(out.contains("3 stages"))
    val pc = graft.config.PipelineConfig.fromString(
      java.nio.file.Files.readString(toml))
    assert(pc.name === "built_pipe")
    assert(pc.stages.map(_.id) === Seq("src", "keep", "out"))
    assert(pc.stages(1).inputs === Seq("src"))
    // typed config values survive the TOML round-trip
    assert(pc.stages(1).config.longOpt("value").contains(1L))
    assert(pc.stages(1).config.strOpt("operator").contains("gte"))
    // --dry-run prints the TOML and writes nothing
    val dry = captureOut(graft.cli.Main.main(Array(
      "build", dir.resolve("x.toml").toString, "--dry-run",
      "--stage", "id=s", "function=inline.data", "config.jsonl={}")))
    assert(dry.contains("[pipeline]") && dry.contains("function = \"inline.data\""))
    assert(!java.nio.file.Files.exists(dir.resolve("x.toml")))
  }
}
