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
      val reg = rest.headOption match {
        case Some(p) if !java.nio.file.Files.exists(java.nio.file.Paths.get(p)) =>
          // fail loud: a typo'd pipeline path must not silently degrade to
          // a builtin-only listing that hides the user's plugins
          System.err.println(s"pipeline file not found: $p")
          sys.exit(1); null
        case Some(p) => Registry.forPipeline(PipelineConfig.fromFile(p))
        case None    => Registry.withDefaults
      }
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

    // reference: `conveyor stage describe <fn>` (src/main.rs:162-186) —
    // like `info`, plus the config-key summary line-broken for reading
    case "stage" :: "describe" :: fn :: _ =>
      val reg = Registry.withDefaults
      if (!reg.contains(fn)) {
        System.err.println(s"unknown function '$fn' — see `graft list`")
        sys.exit(1)
      }
      val st = reg.resolve(fn)
      val (summary, keys) = Docs.describe(fn).split(" - ", 2) match {
        case Array(s, k) => (s, Some(k))
        case _           => (Docs.describe(fn), None)
      }
      println(s"$fn")
      println(s"  kind:    ${st.kind.toString.toLowerCase}")
      println(s"  summary: $summary")
      keys.foreach(k => println(s"  config:  $k"))

    // reference: `conveyor stage add` appends a stage to a pipeline TOML —
    // non-interactive flags here (the TUI editing loop is out of scope
    // offline): graft stage add p.toml --id x --function filter.apply
    //   [--inputs a,b] [--config k=v ...]
    case "stage" :: "add" :: path :: rest =>
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) {
        System.err.println(s"pipeline file not found: $path")
        sys.exit(1)
      }
      def flag(name: String): Option[String] =
        rest.dropWhile(_ != s"--$name").drop(1).headOption.filterNot(_.startsWith("--"))
      val id = flag("id").getOrElse { System.err.println("--id required"); sys.exit(1); "" }
      val fn = flag("function").getOrElse { System.err.println("--function required"); sys.exit(1); "" }
      val inputs = flag("inputs").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
      // every `--config k=v` occurrence; v renders as TOML number/bool/string
      val configs = rest.sliding(2).collect {
        case List("--config", kv) if kv.contains("=") =>
          val Array(k, v) = kv.split("=", 2)
          (k, v)
      }.toSeq
      val block = new StringBuilder("\n[[stages]]\n")
      block ++= s"""id = "$id"\n"""
      block ++= s"""function = "$fn"\n"""
      if (inputs.nonEmpty) block ++= inputs.map(i => s""""$i"""").mkString("inputs = [", ", ", "]\n")
      if (configs.nonEmpty)
        block ++= configs.map { case (k, v) => s"$k = ${tomlValue(v)}" }
          .mkString("config = { ", ", ", " }\n")
      val before = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val after = before + block
      // validate the appended pipeline BEFORE writing anything
      val pc = try PipelineConfig.fromString(after) catch {
        case e: Exception =>
          System.err.println(s"stage add would break the pipeline: ${e.getMessage}")
          sys.exit(1); null
      }
      val reg = Registry.forPipeline(pc)
      if (!reg.contains(fn)) {
        System.err.println(s"unknown function '$fn' — see `graft list`")
        sys.exit(1)
      }
      java.nio.file.Files.write(p, after.getBytes("UTF-8"))
      println(s"added stage '$id' ($fn) to $path — ${pc.stages.size} stages total")

    // reference: `conveyor stage edit` opens an interactive field-editing
    // loop (src/cli/edit.rs) — non-interactive flags here, same policy as
    // `stage add`: graft stage edit p.toml <stage-id>
    //   [--set k=v ...] [--remove k ...] [--set-inputs a,b] [--set-function fn]
    // The stage's [[stages]] block is regenerated in place (comments
    // INSIDE that one block are not preserved; the rest of the file is
    // untouched) and the whole pipeline re-validates before writing.
    case "stage" :: "edit" :: path :: stageId :: rest =>
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) {
        System.err.println(s"pipeline file not found: $path")
        sys.exit(1)
      }
      val before = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val pc0 = PipelineConfig.fromString(before)
      val st = pc0.stageById(stageId).getOrElse {
        System.err.println(s"no stage '$stageId' in $path " +
          s"(stages: ${pc0.stages.map(_.id).mkString(", ")})")
        sys.exit(1); null
      }
      def flag(name: String): Option[String] =
        rest.dropWhile(_ != s"--$name").drop(1).headOption.filterNot(_.startsWith("--"))
      val sets = rest.sliding(2).collect {
        case List("--set", kv) if kv.contains("=") =>
          val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq
      val removes = rest.sliding(2).collect { case List("--remove", k) => k }.toSeq
      if (sets.isEmpty && removes.isEmpty &&
          flag("set-inputs").isEmpty && flag("set-function").isEmpty) {
        System.err.println("nothing to edit — pass --set k=v / --remove k " +
          "/ --set-inputs a,b / --set-function fn")
        sys.exit(1)
      }
      def toToml(v: graft.config.CVal): String = v match {
        case graft.config.CStr(s) =>
          "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        case graft.config.CLong(l)   => l.toString
        case graft.config.CDouble(d) => d.toString
        case graft.config.CBool(b)   => b.toString
        case graft.config.CArr(xs)   => xs.map(toToml).mkString("[", ", ", "]")
        case graft.config.CTbl(m)    =>
          m.toSeq.sortBy(_._1).map { case (k, x) => s"$k = ${toToml(x)}" }
            .mkString("{ ", ", ", " }")
      }
      val newFn = flag("set-function").getOrElse(st.function)
      val newInputs = flag("set-inputs")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toVector).getOrElse(st.inputs)
      val keptCfg = (st.config.table -- removes -- sets.map(_._1))
        .toSeq.sortBy(_._1).map { case (k, v) => s"$k = ${toToml(v)}" }
      val setCfg = sets.map { case (k, v) => s"$k = ${tomlValue(v)}" }
      val cfgEntries = keptCfg ++ setCfg
      val block = new StringBuilder("[[stages]]\n")
      block ++= s"""id = "$stageId"\n"""
      block ++= s"""function = "$newFn"\n"""
      if (newInputs.nonEmpty)
        block ++= newInputs.map(i => s""""$i"""").mkString("inputs = [", ", ", "]\n")
      if (cfgEntries.nonEmpty)
        block ++= cfgEntries.mkString("config = { ", ", ", " }\n")
      // locate this stage's [[stages]] block in the file text: from its
      // header line to the next section header (or EOF)
      val lines = before.split("\n", -1)
      val headers = lines.indices.filter(i => lines(i).trim == "[[stages]]")
      val idRe = ("""^\s*id\s*=\s*["']""" + java.util.regex.Pattern.quote(stageId) + """["']\s*(#.*)?$""").r
      val blockRange = headers.flatMap { h =>
        val end = lines.indices.drop(h + 1)
          .find(i => lines(i).trim.startsWith("[")).getOrElse(lines.length)
        if ((h + 1 until end).exists(i => idRe.matches(lines(i)))) Some((h, end)) else None
      }.headOption.getOrElse {
        System.err.println(s"could not locate the [[stages]] block for '$stageId' in $path")
        sys.exit(1); (0, 0)
      }
      val after = (lines.take(blockRange._1) ++ block.toString.split("\n") ++
        lines.drop(blockRange._2)).mkString("\n")
      // validate the edited pipeline BEFORE writing anything
      val pc = try PipelineConfig.fromString(after) catch {
        case e: Exception =>
          System.err.println(s"stage edit would break the pipeline: ${e.getMessage}")
          sys.exit(1); null
      }
      val reg = Registry.forPipeline(pc)
      if (!reg.contains(newFn)) {
        System.err.println(s"unknown function '$newFn' — see `graft list`")
        sys.exit(1)
      }
      DagCompiler.default.toposortCheck(pc)
      java.nio.file.Files.write(p, after.getBytes("UTF-8"))
      println(s"edited stage '$stageId' ($newFn) in $path — " +
        s"${sets.size} set, ${removes.size} removed")

    // reference: `conveyor stage new` scaffolds a starter pipeline
    // (src/cli/scaffold.rs:5-120, non-interactive defaults)
    case "stage" :: "new" :: rest =>
      main(("scaffold" :: rest).toArray)

    // reference: `conveyor plugin list` / `plugin install` (main.rs:176-183)
    case "plugin" :: "list" :: rest =>
      main(("list" :: rest).toArray)
    case "plugin" :: "install" :: _ =>
      System.err.println("plugins are not installed globally — add them per pipeline: " +
        "[global] plugins = [\"/path/to/plugin.jar\"|\"com.example.PluginClass\"] " +
        "(ServiceLoader discovery of graft.core.GraftPlugin; see README)")
      sys.exit(1)

    // reference: `conveyor update` (self-update from GitHub releases,
    // src/main.rs:188-191) — meaningless for a library jar in an offline
    // build; fail loud with the actual upgrade path instead of silence
    case "update" :: _ =>
      System.err.println("graft is a library jar — self-update is not available " +
        "(rebuild with `sbt package`, or replace the jar on your spark-submit classpath)")
      sys.exit(1)

    case "scaffold" :: rest =>
      val out = java.nio.file.Paths.get(rest.headOption.getOrElse("pipeline.toml"))
      if (java.nio.file.Files.exists(out)) {
        System.err.println(s"refusing to overwrite existing $out")
        sys.exit(1)
      }
      java.nio.file.Files.write(out, scaffoldTemplate.getBytes("UTF-8"))
      println(s"wrote $out — edit it, then: graft run $out")

    // reference: `conveyor build` — an interactive TUI loop that walks
    // function choice → stage id → inputs → per-param config per stage and
    // saves the assembled pipeline (src/cli/interactive_builder.rs). Same
    // capability, scriptable (no TTY in this environment): the whole
    // pipeline arrives as repeated --stage groups and is VALIDATED (parse,
    // function registry, DAG shape) before anything is written.
    //   graft build out.toml --name my_pipe \
    //     --stage id=src function=csv.read config.path=/data/in.csv \
    //     --stage id=keep function=filter.apply inputs=src \
    //             config.column=age config.operator=gt config.value=30 \
    //     --stage id=out function=json.write inputs=keep config.path=/out
    // `--dry-run` prints the TOML instead of writing; `--force` overwrites.
    case "build" :: path :: rest =>
      val dryRun = rest.contains("--dry-run")
      val out = java.nio.file.Paths.get(path)
      if (!dryRun && !rest.contains("--force") && java.nio.file.Files.exists(out)) {
        System.err.println(s"refusing to overwrite existing $path (use --force)")
        sys.exit(1)
      }
      val name = rest.dropWhile(_ != "--name").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse(
          out.getFileName.toString.stripSuffix(".toml"))
      // split into --stage groups; every token must be accounted for — a
      // stray token (typo'd k=v, misplaced flag value) must fail loud, not
      // silently drop config from a pipeline that then "validates"
      val groups = {
        val b = scala.collection.mutable.Buffer[scala.collection.mutable.Buffer[String]]()
        var cur: scala.collection.mutable.Buffer[String] = null
        var skipNext = false
        rest.zipWithIndex.foreach { case (t, i) =>
          if (skipNext) skipNext = false
          else t match {
            case "--stage" => cur = scala.collection.mutable.Buffer(); b += cur
            case "--name" => cur = null; skipNext = true
            case "--dry-run" | "--force" => cur = null
            case kv if cur != null && kv.contains("=") && !kv.startsWith("--") => cur += kv
            case other =>
              System.err.println(s"build: unexpected token '$other' at position $i — " +
                "stage fields must be k=v (id=…, function=…, inputs=a,b, config.k=v) " +
                "inside a --stage group; flags are --name <n>, --dry-run, --force")
              sys.exit(1)
          }
        }
        b.toList.map(_.toList).filter(_.nonEmpty)
      }
      if (groups.isEmpty) {
        System.err.println("build needs at least one --stage id=... function=... group")
        sys.exit(1)
      }
      val sb = new StringBuilder
      sb ++= s"""[pipeline]\nname = "$name"\n"""
      groups.foreach { g =>
        val kvs = g.map { t => val Array(k, v) = t.split("=", 2); (k, v) }
        val m = kvs.toMap
        val id = m.getOrElse("id", { System.err.println(s"--stage group missing id= (${g.mkString(" ")})"); sys.exit(1); "" })
        val fn = m.getOrElse("function", { System.err.println(s"stage '$id' missing function="); sys.exit(1); "" })
        sb ++= s"""\n[[stages]]\nid = "$id"\nfunction = "$fn"\n"""
        m.get("inputs").map(_.split(",").map(_.trim).filter(_.nonEmpty)).filter(_.nonEmpty)
          .foreach(is => sb ++= is.map(i => s""""$i"""").mkString("inputs = [", ", ", "]\n"))
        val cfg = kvs.collect { case (k, v) if k.startsWith("config.") => (k.drop(7), v) }
        if (cfg.nonEmpty)
          sb ++= cfg.map { case (k, v) => s"$k = ${tomlValue(v)}" }
            .mkString("config = { ", ", ", " }\n")
      }
      val toml = sb.toString
      val pc = try PipelineConfig.fromString(toml) catch {
        case e: Exception =>
          System.err.println(s"built pipeline does not validate: ${e.getMessage}")
          sys.exit(1); null
      }
      val reg = Registry.forPipeline(pc)
      pc.stages.map(_.function).distinct.filterNot(reg.contains).foreach { fn =>
        System.err.println(s"unknown function '$fn' — see `graft list`")
        sys.exit(1)
      }
      if (dryRun) print(toml)
      else {
        java.nio.file.Files.write(out, toml.getBytes("UTF-8"))
        println(s"built $path — ${pc.stages.size} stages, validated; run: graft run $path")
      }

    case _ =>
      System.err.println(
        """usage: graft <command>
          |  run <pipeline.toml>      execute a pipeline (--dry-run = validate only)
          |  explain <pipeline.toml>  print each sink's physical plan (no execution)
          |  validate <pipeline.toml> parse + validate config
          |  list [pipeline.toml]     list registered functions (with a pipeline: its plugins + provenance)
          |  info <function>          show function info
          |  stage describe <fn>      function kind + summary + config keys
          |  stage add <toml> --id X --function F [--inputs a,b] [--config k=v]...
          |                           append a stage (validated before write)
          |  stage edit <toml> <id> [--set k=v]... [--remove k]... [--set-inputs a,b] [--set-function F]
          |                           rewrite a stage's fields (validated before write)
          |  stage new [out.toml]     alias of scaffold
          |  build <out.toml> [--name N] [--dry-run|--force] --stage id=X function=F [inputs=a,b] [config.k=v]... [--stage ...]...
          |                           assemble a whole validated pipeline from flags
          |  plugin list [toml]       alias of list (provenance per function)
          |  scaffold [out.toml]      write a starter pipeline""".stripMargin)
      sys.exit(2)
  }

  /** render a CLI string value as a TOML scalar: bools and numbers pass
    * through (a bare leading-dot float is normalized — ".5" is invalid
    * TOML), everything else renders as an escaped string. Shared by
    * `stage add`, `stage edit`, and `build`. */
  private def tomlValue(v: String): String = v match {
    case "true" | "false" => v
    case n if n.matches("-?\\d+") => n
    case n if n.matches("-?\\d+\\.\\d+") => n
    case n if n.matches("-?\\.\\d+") =>
      (if (n.startsWith("-")) "-0" + n.drop(1) else "0" + n)
    case s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  /** Starter pipeline (reference scaffold.rs template, graft spellings). */
  private[graft] val scaffoldTemplate: String =
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
