package graft.config

/** Pipeline config model — config-file-compatible with the reference
  * (src/core/config.rs:189-201 `DagPipelineConfig`, :171-186 `StageConfig`,
  * :55-149 global knobs, :103-116 DLQ, src/core/strategy.rs:10-20).
  *
  * Executor-selection knobs (executor/channel_buffer_size/concurrency/
  * max_parallel_tasks) are accepted and recorded but are no-ops: Catalyst +
  * the Spark DAGScheduler subsume all three reference executors (SURVEY §3).
  */
final case class PipelineConfig(
    name: String,
    description: String,
    global: GlobalConfig,
    stages: Vector[StageDef],
    errorHandling: ErrorHandling) {

  def stageById(id: String): Option[StageDef] = stages.find(_.id == id)

  /** Unique ids, inputs reference existing ids, >=1 stage
    * (reference config.rs:223-261). Cycle check lives in DagCompiler. */
  def validate(): Unit = {
    if (stages.isEmpty) throw new GraftConfigError("pipeline must declare at least one stage")
    val ids = stages.map(_.id)
    val dup = ids.diff(ids.distinct).distinct
    if (dup.nonEmpty) throw new GraftConfigError(s"duplicate stage ids: ${dup.mkString(", ")}")
    for (s <- stages; in <- s.inputs)
      if (!ids.contains(in))
        throw new GraftConfigError(s"stage '${s.id}' references unknown input '$in'")
  }
}

final case class StageDef(id: String, function: String, inputs: Vector[String], config: Cfg)

final case class GlobalConfig(
    logLevel: String,
    executionMode: String,        // batch | streaming
    streamBatchSize: Long,
    variables: Map[String, String],
    shufflePartitions: Option[Int], // our extension: spark.sql.shuffle.partitions
    sparkConf: Map[String, String], // our extension: [global.spark] → spark.conf.set
    plugins: Vector[String],        // jar paths / FQCNs of third-party stages (SPI: graft.core.GraftPlugin)
    raw: Cfg)

sealed trait ErrorStrategy
object ErrorStrategy {
  case object Stop extends ErrorStrategy
  case object Continue extends ErrorStrategy
  final case class Retry(maxRetries: Int, retryDelaySeconds: Int) extends ErrorStrategy
}
final case class ErrorHandling(strategy: ErrorStrategy, deadLetterQueue: Option[String])

object PipelineConfig {

  def fromFile(path: String): PipelineConfig =
    fromString(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  def fromString(toml: String): PipelineConfig = {
    val rootTbl = Toml.parse(toml)
    val root = Cfg(rootTbl.v)
    val pipeline = root.tblOpt("pipeline").getOrElse(Cfg.empty)
    val globalRaw = root.tblOpt("global").getOrElse(Cfg.empty)

    // ${ENV_VAR} resolution into global.variables (reference config.rs:265-293)
    val variables: Map[String, String] =
      globalRaw.tblOpt("variables").map(_.table.map {
        case (k, CStr(s)) => k -> resolveEnv(s)
        case (k, v)       => k -> v.render
      }).getOrElse(Map.empty)

    val global = GlobalConfig(
      logLevel = globalRaw.strOr("log_level", "info"),
      executionMode = globalRaw.strOr("execution_mode", "batch"),
      streamBatchSize = globalRaw.longOr("stream_batch_size", 1000L),
      variables = variables,
      shufflePartitions = globalRaw.longOpt("shuffle_partitions").map(_.toInt),
      // [global.spark] — runtime SQL confs per pipeline (AQE knobs,
      // broadcast threshold, partition sizing). TOML nests dotted keys
      // (sql.adaptive.enabled → {sql:{adaptive:{enabled}}}), so flatten
      // back to dotted conf names; values render as strings.
      sparkConf = globalRaw.tblOpt("spark")
        .map(c => flattenConf("spark.", c.table)).getOrElse(Map.empty),
      plugins = globalRaw.strListOr("plugins", Vector.empty).map(resolveEnv),
      raw = globalRaw)

    val stages = root.tblArr("stages").map { st =>
      val inputs = st.strListOr("inputs", Vector.empty)
      val cfg = Cfg(interpolate(st.tblOpt("config").getOrElse(Cfg.empty).table, variables))
      val raw = st.strOpt("function").orElse(st.strOpt("type")).getOrElse(
        throw new GraftConfigError(s"stage '${st.strOr("id", "?")}': missing 'function'"))
      StageDef(
        id = st.str("id"),
        function = normalizeFunction(raw, inputs, cfg),
        inputs = inputs,
        config = cfg)
    }

    val ehCfg = root.tblOpt("error_handling").getOrElse(Cfg.empty)
    val strategy = ehCfg.strOr("strategy", "stop") match {
      case "stop"     => ErrorStrategy.Stop
      case "continue" => ErrorStrategy.Continue
      case "retry"    => ErrorStrategy.Retry(
        ehCfg.longOr("max_retries", 3L).toInt,
        ehCfg.longOr("retry_delay_seconds", 5L).toInt)
      case other => throw new GraftConfigError(s"unknown error strategy '$other'")
    }
    val dlq = ehCfg.tblOpt("dead_letter_queue").flatMap(_.strOpt("path"))
      .orElse(ehCfg.strOpt("dead_letter_queue"))

    val pc = PipelineConfig(
      name = pipeline.strOr("name", "unnamed"),
      description = pipeline.strOr("description", ""),
      global = global,
      stages = stages,
      errorHandling = ErrorHandling(strategy, dlq))
    pc.validate()
    pc
  }

  /** Accept every function spelling the reference's configs use:
    *  - canonical dotted names ("csv.read") pass through;
    *  - FFI/WASM plugin capability names ("mongodb-find", "http-get",
    *    bare "kafka"/"http") map to our dotted registrations — bare kafka
    *    is consume as a source / produce as a sink, bare http picks its
    *    verb from config.method;
    *  - the legacy `type = "source.stdin_stream"` shape (still present in
    *    reference examples although its CURRENT parser rejects it) strips
    *    the category prefix and maps the module name.
    */
  def normalizeFunction(raw: String, inputs: Vector[String], cfg: Cfg): String = {
    val mongo = Map(
      "find" -> "find", "findone" -> "findOne", "aggregate" -> "aggregate",
      "insertone" -> "insertOne", "insertmany" -> "insertMany",
      "createone" -> "insertOne", "createmany" -> "insertMany",
      "updateone" -> "updateOne", "updatemany" -> "updateMany",
      "deleteone" -> "deleteOne", "deletemany" -> "deleteMany",
      "replaceone" -> "replaceOne", "replacemany" -> "replaceMany",
      "bulkwrite" -> "bulkWrite", "toobjectid" -> "toObjectId")
    val legacyModule = Map(
      "stdin_stream" -> "stdin.stream", "stdout_stream" -> "stream.write",
      "file_watch" -> "file.watch", "stdin" -> "stdin.read", "stdout" -> "stdout.write")
    raw match {
      case "kafka" => if (inputs.isEmpty) "kafka.consume" else "kafka.produce"
      case "mongodb" => if (inputs.isEmpty) "mongodb.find" else "mongodb.insertMany"
      case p if p.startsWith("plugin.") =>
        normalizeFunction(p.stripPrefix("plugin."), inputs, cfg)
      case "http"  => s"http.${cfg.strOr("method", "GET").toLowerCase}"
      case "stdout.stream" => "stream.write"
      case m if m.startsWith("mongodb-") =>
        mongo.get(m.stripPrefix("mongodb-")).map("mongodb." + _).getOrElse(m)
      case h if h.startsWith("http-") => "http." + h.stripPrefix("http-").toLowerCase
      case t if t.startsWith("source.") || t.startsWith("sink.") || t.startsWith("transform.") =>
        val name = t.substring(t.indexOf('.') + 1)
        legacyModule.getOrElse(name,
          if (name.contains('.')) name
          else if (t.startsWith("source.")) s"$name.read"
          else if (t.startsWith("sink.")) s"$name.write"
          else s"$name.apply")
      case other => other
    }
  }

  private def flattenConf(prefix: String, t: Map[String, CVal]): Map[String, String] =
    t.flatMap {
      case (k, CTbl(sub)) => flattenConf(s"$prefix$k.", sub)
      case (k, v)         => Map(s"$prefix$k" -> v.render)
    }

  /** ${ENV_VAR} → env value (empty if unset), reference config.rs:265-293. */
  def resolveEnv(s: String): String = {
    val re = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r
    re.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      sys.env.getOrElse(m.group(1), "")))
  }

  /** {{var}} substitution into stage-config strings, recursively
    * (reference config.rs:297-356). */
  def interpolate(table: Map[String, CVal], vars: Map[String, String]): Map[String, CVal] = {
    def go(v: CVal): CVal = v match {
      case CStr(s)  => CStr(substitute(s, vars))
      case CArr(xs) => CArr(xs.map(go))
      case CTbl(t)  => CTbl(t.map { case (k, x) => k -> go(x) })
      case other    => other
    }
    table.map { case (k, v) => k -> go(v) }
  }

  def substitute(s: String, vars: Map[String, String]): String = {
    val re = "\\{\\{\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\}\\}".r
    re.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      vars.getOrElse(m.group(1), m.matched)))
  }
}
