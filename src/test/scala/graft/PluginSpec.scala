package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config.{Cfg, GraftConfigError, PipelineConfig}
import graft.core._

/** FQCN-mode fixture: a plugin bundle (object) contributing one stage. */
object TestReversePlugin extends GraftPlugin {
  def stages: java.util.List[Stage] = java.util.Arrays.asList(TestReverseStage)
}
object TestReverseStage extends PluginStage {
  def name = "test.reverse"
  def apply(ctx: StageContext): DataFrame =
    ctx.primary.withColumn("rev", F.reverse(F.col("name")))
}
/** Collision fixture: tries to shadow a builtin. */
object TestShadowPlugin extends PluginStage {
  def name = "filter.apply"
  def apply(ctx: StageContext): DataFrame = ctx.primary
}

/** Runtime extensibility (ServiceLoader SPI over `global.plugins`): an
  * EXTERNAL plugin — Java source compiled at test time into a jar with a
  * META-INF/services entry, never on sbt's compile classpath — loads by
  * config and runs inside a TOML pipeline; FQCN mode, provenance, and the
  * fail-loud error surface are pinned alongside. */
class PluginSpec extends SparkSpec {
  import spark.implicits._

  private lazy val demoJar: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_plugin")
    val src = tmp.resolve("DemoPlugin.java")
    java.nio.file.Files.writeString(src,
      """package graftdemo;
        |import org.apache.spark.sql.Dataset;
        |import org.apache.spark.sql.Row;
        |public class DemoPlugin implements graft.core.GraftPlugin {
        |  public java.util.List<graft.core.Stage> stages() {
        |    return java.util.Collections.singletonList((graft.core.Stage) new DoubleStage());
        |  }
        |  public static class DoubleStage extends graft.core.PluginStage {
        |    public String name() { return "demo.double"; }
        |    public Dataset<Row> apply(graft.core.StageContext ctx) {
        |      return ctx.primary().withColumn("doubled",
        |        org.apache.spark.sql.functions.expr("value * 2"));
        |    }
        |  }
        |}
        |""".stripMargin)
    val classes = tmp.resolve("classes")
    java.nio.file.Files.createDirectories(classes)
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    val rc = javac.run(null, null, null,
      "-classpath", System.getProperty("java.class.path"),
      "-d", classes.toString, src.toString)
    assert(rc === 0, "javac failed for the demo plugin")

    val jar = tmp.resolve("demo-plugin.jar")
    val jos = new java.util.jar.JarOutputStream(java.nio.file.Files.newOutputStream(jar))
    try {
      jos.putNextEntry(new java.util.zip.ZipEntry("META-INF/services/graft.core.GraftPlugin"))
      jos.write("graftdemo.DemoPlugin\n".getBytes("UTF-8"))
      jos.closeEntry()
      java.nio.file.Files.walk(classes).filter(java.nio.file.Files.isRegularFile(_))
        .forEach { f =>
          jos.putNextEntry(new java.util.zip.ZipEntry(classes.relativize(f).toString.replace('\\', '/')))
          jos.write(java.nio.file.Files.readAllBytes(f))
          jos.closeEntry()
        }
    } finally jos.close()
    jar.toString
  }

  test("external jar plugin: ServiceLoader discovery + TOML pipeline end-to-end") {
    val toml =
      s"""[pipeline]
         |name = "p"
         |[global]
         |plugins = ["$demoJar"]
         |[[stages]]
         |id = "src"
         |function = "inline.data"
         |config = { jsonl = "{\\"value\\": 2}\\n{\\"value\\": 5}" }
         |[[stages]]
         |id = "doubled"
         |function = "demo.double"
         |inputs = ["src"]
         |""".stripMargin
    val pc = PipelineConfig.fromString(toml)
    val reg = Registry.forPipeline(pc)
    val out = new DagCompiler(reg).run(spark, pc)("doubled")
      .orderBy("value").select("doubled").as[Long].collect()
    assert(out.toSeq === Seq(4L, 10L))
    // provenance names the jar and the provider class
    assert(reg.provenance("demo.double").contains("demo-plugin.jar"))
    assert(reg.provenance("demo.double").contains("graftdemo.DemoPlugin"))
    assert(reg.provenance("filter.apply") === "builtin")
  }

  test("FQCN plugin (Scala object bundle) loads without a jar") {
    val pc = PipelineConfig.fromString(
      """[pipeline]
        |name = "p"
        |[global]
        |plugins = ["graft.TestReversePlugin"]
        |[[stages]]
        |id = "src"
        |function = "inline.data"
        |config = { jsonl = "{\"name\": \"abc\"}" }
        |[[stages]]
        |id = "rev"
        |function = "test.reverse"
        |inputs = ["src"]
        |""".stripMargin)
    val out = new DagCompiler(Registry.forPipeline(pc)).run(spark, pc)("rev")
    assert(out.select("rev").as[String].head() === "cba")
    // a bare Stage FQCN (no bundle) also registers
    val reg2 = Registry.withDefaults.withPlugins(Seq("graft.TestReverseStage"))
    assert(reg2.contains("test.reverse"))
  }

  test("sub-pipelines load their own plugins") {
    val inner =
      """[pipeline]
        |name = "inner"
        |[global]
        |plugins = ["graft.TestReversePlugin"]
        |[[stages]]
        |id = "s"
        |function = "inline.data"
        |config = { jsonl = "{\"name\": \"xyz\"}" }
        |[[stages]]
        |id = "r"
        |function = "test.reverse"
        |inputs = ["s"]
        |""".stripMargin
    val out = graft.operators.SubPipelineOp(StageContext.one(spark, salesDf,
      Cfg.of("inline" -> inner)))
    assert(out.select("rev").as[String].head() === "zyx")
  }

  test("fail-loud surface: missing jar, empty jar, bad class, collisions, hint") {
    val e1 = intercept[GraftConfigError](
      Registry.withDefaults.withPlugins(Seq("/nope/missing.jar")))
    assert(e1.getMessage.contains("not found"))

    val empty = java.nio.file.Files.createTempFile("graft_empty", ".jar")
    val jos = new java.util.jar.JarOutputStream(java.nio.file.Files.newOutputStream(empty))
    jos.close()
    val e2 = intercept[GraftConfigError](
      Registry.withDefaults.withPlugins(Seq(empty.toString)))
    assert(e2.getMessage.contains("META-INF/services"))

    val e3 = intercept[GraftConfigError](
      Registry.withDefaults.withPlugins(Seq("com.example.DoesNotExist")))
    assert(e3.getMessage.contains("not found on the classpath"))

    val e4 = intercept[GraftConfigError](
      Registry.withDefaults.withPlugins(Seq("java.lang.String")))
    assert(e4.getMessage.contains("implements neither"))

    val e5 = intercept[GraftConfigError](
      Registry.withDefaults.withPlugins(Seq("graft.TestShadowPlugin")))
    assert(e5.getMessage.contains("collides"))

    // unknown-function error points at the plugin mechanism
    val e6 = intercept[GraftConfigError](Registry.withDefaults.resolve("no.such"))
    assert(e6.getMessage.contains("plugins = "))
  }
}
