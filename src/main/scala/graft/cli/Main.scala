package graft.cli

import org.apache.spark.sql.SparkSession
import graft.config.PipelineConfig
import graft.core.{DagCompiler, Registry}

/** CLI — run/validate/list/info, mirroring the reference's commands
  * (src/main.rs:112-138). `run` executes a TOML pipeline on local[*];
  * on a cluster the same jar submits through spark-submit unchanged.
  */
object Main {
  def main(args: Array[String]): Unit = args.toList match {
    // reference: `conveyor run --dry-run` validates without executing
    case "run" :: path :: rest if rest.contains("--dry-run") =>
      main(Array("validate", path))

    case "run" :: path :: rest =>
      val pc = PipelineConfig.fromFile(path)
      val spark = session(rest)
      try {
        val t0 = System.nanoTime()
        new DagCompiler(Registry.forPipeline(pc)).run(spark, pc)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[graft] pipeline '${pc.name}' completed in $dt%.2f s")
      } finally spark.stop()

    case "explain" :: path :: rest =>
      // compile the whole DAG WITHOUT running sink side effects and print
      // each sink input's physical plan — the tool for checking that
      // filters reached the scan (PushedFilters), projections pruned
      // (ReadSchema), dims broadcast, and codegen spans are wide, before
      // a pipeline ships to a real cluster
      val pc = PipelineConfig.fromFile(path)
      val spark = session(rest)
      try {
        val reg = Registry.forPipeline(pc)
        val plans = new DagCompiler(reg).compilePlans(spark, pc, explainOnly = true)
        val sinks = pc.stages.filter(s =>
          reg.contains(s.function) &&
            reg.resolve(s.function).kind == graft.core.StageKind.Sink)
        val targets = if (sinks.nonEmpty) sinks.flatMap(_.inputs.headOption)
                      else pc.stages.lastOption.map(_.id).toSeq
        targets.distinct.foreach { id =>
          println(s"== stage '$id' ==")
          println(plans(id).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
      } finally spark.stop()

    case "validate" :: path :: _ =>
      val pc = PipelineConfig.fromFile(path)
      val reg = Registry.forPipeline(pc) // also fails loud on broken plugins
      val unknown = pc.stages.filterNot(s => reg.contains(s.function))
      if (unknown.nonEmpty) {
        System.err.println(s"unknown functions: ${unknown.map(_.function).mkString(", ")}")
        sys.exit(1)
      }
      DagCompiler.default.toposortCheck(pc) // cycle check, throws GraftPlanError
      println(s"pipeline '${pc.name}': ${pc.stages.size} stages, OK")

    // `list [pipeline.toml]` — with a pipeline, includes its plugins and
    // shows per-stage provenance (reference `plugin list`, main.rs:176-183)
    case "list" :: rest =>
      val reg = rest.headOption.filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        .map(p => Registry.forPipeline(PipelineConfig.fromFile(p)))
        .getOrElse(Registry.withDefaults)
      reg.names.foreach { n =>
        val from = reg.provenance.getOrElse(n, "builtin")
        println(if (from == "builtin") n else s"$n\t[plugin: $from]")
      }

    case "info" :: fn :: _ =>
      val reg = Registry.withDefaults
      if (reg.contains(fn)) {
        val st = reg.resolve(fn)
        println(s"$fn [${st.kind}] - ${Docs.describe(fn)}")
      } else { System.err.println(s"unknown function '$fn'"); sys.exit(1) }

    // reference: `conveyor stage new` scaffolds a starter pipeline
    // (src/cli/scaffold.rs:5-120, non-interactive defaults)
    case "scaffold" :: rest =>
      val out = java.nio.file.Paths.get(rest.headOption.getOrElse("pipeline.toml"))
      if (java.nio.file.Files.exists(out)) {
        System.err.println(s"refusing to overwrite existing $out")
        sys.exit(1)
      }
      java.nio.file.Files.write(out, scaffoldTemplate.getBytes("UTF-8"))
      println(s"wrote $out — edit it, then: graft run $out")

    case _ =>
      System.err.println(
        """usage: graft <command>
          |  run <pipeline.toml>      execute a pipeline (--dry-run = validate only)
          |  explain <pipeline.toml>  print each sink's physical plan (no execution)
          |  validate <pipeline.toml> parse + validate config
          |  list [pipeline.toml]     list registered functions (with a pipeline: its plugins + provenance)
          |  info <function>          show function info
          |  scaffold [out.toml]      write a starter pipeline""".stripMargin)
      sys.exit(2)
  }

  /** Starter pipeline (reference scaffold.rs template, graft spellings). */
  private[cli] val scaffoldTemplate: String =
    """# graft pipeline (conveyor-compatible TOML)
      |[pipeline]
      |name = "my_pipeline"
      |version = "1.0.0"
      |description = "A data processing pipeline"
      |
      |[global]
      |log_level = "info"
      |
      |[[stages]]
      |id = "source"
      |function = "csv.read"
      |config = { path = "input.csv", headers = true }
      |
      |[[stages]]
      |id = "filtered"
      |function = "filter.apply"
      |inputs = ["source"]
      |config = { column = "status", operator = "==", value = "active" }
      |
      |[[stages]]
      |id = "out"
      |function = "stdout.write"
      |inputs = ["filtered"]
      |config = { format = "table", limit = 20 }
      |""".stripMargin

  private def session(rest: List[String]): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
