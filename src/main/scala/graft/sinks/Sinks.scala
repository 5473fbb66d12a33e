package graft.sinks

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** Sinks perform their side effect when invoked and return the input frame
  * unchanged (pass-through), so fan-out after a sink keeps composing.
  * The DagCompiler only invokes sink stages at terminal/action time.
  *
  * Single-file outputs: the reference writes exactly one file per sink
  * (src/modules/sinks/csv.rs:80-123). `single_file = true` (default) matches
  * that via coalesce(1); large pipelines set it false to write one part per
  * partition (the scale path).
  */
object SinkUtil {
  def prepare(df: DataFrame, cfg: Cfg): DataFrame =
    if (cfg.boolOr("single_file", true)) df.coalesce(1) else df
  def mode(cfg: Cfg): String = cfg.strOr("mode", "overwrite")
  def mkParent(path: String): Unit = {
    val p = graft.core.GraftFs.path(path).getParent
    if (p != null) graft.core.GraftFs.mkdirs(p.toString)
  }
}

/** csv.write — reference src/modules/sinks/csv.rs:80-123. */
object CsvSink extends Stage {
  val name = "csv.write"
  val kind = StageKind.Sink
  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    SinkUtil.mkParent(cfg.str("path"))
    SinkUtil.prepare(df, cfg).write
      .option("header", cfg.boolOr("headers", true))
      .option("sep", cfg.strOr("delimiter", ","))
      .mode(SinkUtil.mode(cfg))
      .csv(cfg.str("path"))
    df
  }
}

/** json.write — formats records (JSON array, `pretty` opt), jsonl,
  * dataframe (column-oriented map) — reference src/modules/sinks/
  * json.rs:93-190. records/dataframe imply a single document → written on
  * the driver via toJSON iterator (bounded by `driver_limit`, default 1M
  * rows, to keep the 100 TB failure mode loud instead of OOM-silent).
  */
object JsonSink extends Stage {
  val name = "json.write"
  val kind = StageKind.Sink
  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    val path = cfg.str("path")
    SinkUtil.mkParent(path)
    cfg.strOr("format", "records") match {
      case "jsonl" =>
        SinkUtil.prepare(df, cfg).write.mode(SinkUtil.mode(cfg)).json(path)
      case "records" =>
        val limit = cfg.longOr("driver_limit", 1000000L)
        val rows = df.limit(limit.toInt + 1).toJSON.collect()
        if (rows.length > limit)
          throw new GraftPlanError(s"json.write format=records materializes on the driver; " +
            s"input exceeds driver_limit=$limit rows — use format=jsonl for large outputs")
        val pretty = cfg.boolOr("pretty", false)
        val body =
          if (pretty) rows.map(r => "  " + prettyJson(r).replace("\n", "\n  ")).mkString("[\n", ",\n", "\n]")
          else rows.mkString("[", ",", "]")
        graft.core.GraftFs.writeString(path, body)
      case "dataframe" =>
        val limit = cfg.longOr("driver_limit", 1000000L).toInt
        val cols = df.columns
        val collected = df.limit(limit + 1).collect()
        if (collected.length > limit)
          throw new GraftPlanError(s"json.write format=dataframe exceeds driver_limit=$limit")
        val colJson = cols.zipWithIndex.map { case (c, i) =>
          val vs = collected.map(r => scalarJson(r.get(i))).mkString("[", ",", "]")
          "\"" + c + "\":" + vs
        }.mkString("{", ",", "}")
        graft.core.GraftFs.writeString(path, colJson)
      case other => throw new GraftConfigError(s"unknown json format '$other'")
    }
    df
  }

  private def scalarJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case n: java.sql.Timestamp => "\"" + n.toInstant.toString + "\""
    case n => n.toString
  }

  /** naive 2-space pretty printer for a single JSON object line */
  private def prettyJson(compact: String): String = {
    val sb = new StringBuilder
    var depth = 0; var inStr = false; var esc = false
    compact.foreach { c =>
      if (esc) { sb += c; esc = false }
      else c match {
        case '\\' if inStr => sb += c; esc = true
        case '"' => sb += c; inStr = !inStr
        case '{' | '[' if !inStr => depth += 1; sb += c; sb += '\n'; sb ++= "  " * depth
        case '}' | ']' if !inStr => depth -= 1; sb += '\n'; sb ++= "  " * depth; sb += c
        case ',' if !inStr => sb += c; sb += '\n'; sb ++= "  " * depth
        case ':' if !inStr => sb ++= ": "
        case _ => sb += c
      }
    }
    sb.result()
  }
}

/** parquet.write — native extension (the scale-correct sink). File-layout
  * knobs for the 100 TB case: `compression` (zstd beats snappy ~30% on
  * text-heavy corpora at similar scan speed) and `max_records_per_file`
  * (bounds file size so downstream scans parallelize and object-store
  * multipart limits are never hit). */
object ParquetSink extends Stage {
  val name = "parquet.write"
  val kind = StageKind.Sink
  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    var w = SinkUtil.prepare(df, Cfg(cfg.table + ("single_file" -> CBool(cfg.boolOr("single_file", false)))))
      .write.mode(SinkUtil.mode(cfg))
    cfg.strOpt("compression").foreach(c => w = w.option("compression", c))
    cfg.longOpt("max_records_per_file").foreach(n => w = w.option("maxRecordsPerFile", n))
    cfg.strListOr("partition_by", Vector.empty) match {
      case Vector() =>
      case cols     => w = w.partitionBy(cols: _*)
    }
    w.parquet(cfg.str("path"))
    df
  }
}

/** table.write — save to the session catalog via saveAsTable, optionally
  * BUCKETED (`bucket_by` + `buckets`, optional `sort_by`): Spark's
  * persisted co-location primitive. Two tables bucketed by the same keys
  * into the same bucket count join with ZERO exchange on either side —
  * the shuffle is paid once at write time and amortized over every later
  * join/agg on those keys. This is the 100 TB answer to "this join is run
  * hourly against the same fact table": bucket the fact table once.
  * `path` makes it an external table (data at your location, not the
  * warehouse dir); bucketing requires the catalog (plain parquet.write
  * cannot record bucket metadata).
  */
object TableSink extends Stage {
  val name = "table.write"
  val kind = StageKind.Sink
  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    var w = df.write.mode(SinkUtil.mode(cfg)).format(cfg.strOr("format", "parquet"))
    cfg.strOpt("path").foreach(p => w = w.option("path", p))
    cfg.strListOr("partition_by", Vector.empty) match {
      case Vector() =>
      case cols     => w = w.partitionBy(cols: _*)
    }
    cfg.strListOr("bucket_by", Vector.empty) match {
      case Vector() =>
      case cols =>
        w = w.bucketBy(cfg.longOr("buckets", 8L).toInt, cols.head, cols.tail: _*)
        cfg.strListOr("sort_by", Vector.empty) match {
          case Vector() =>
          case s        => w = w.sortBy(s.head, s.tail: _*)
        }
    }
    w.saveAsTable(cfg.str("table"))
    df
  }
}

/** stdout.write — table (show), json, jsonl, csv with optional `limit`
  * (reference src/modules/sinks/stdout.rs:90-150).
  */
object StdoutSink extends Stage {
  val name = "stdout.write"
  val kind = StageKind.Sink
  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    val limit = cfg.longOr("limit", 20L).toInt
    cfg.strOr("format", "table") match {
      case "table" => df.show(limit, truncate = false)
      case "jsonl" | "json" =>
        df.toJSON.take(limit).foreach(println)
      case "csv" =>
        val cols = df.columns
        println(cols.mkString(","))
        df.take(limit).foreach(r => println(r.toSeq.map {
          case null => ""
          case s: String if s.contains(",") || s.contains("\"") =>
            "\"" + s.replace("\"", "\"\"") + "\""
          case v => v.toString
        }.mkString(",")))
      case other => throw new GraftConfigError(s"unknown stdout format '$other'")
    }
    df
  }
}

/** noop.sink — forces full evaluation without output (benchmarks). */
object NoopSink extends Stage {
  val name = "noop.sink"
  val kind = StageKind.Sink
  def apply(ctx: StageContext): DataFrame = {
    // foreach(_ => ()) evaluates every row without collecting
    ctx.primary.foreach(_ => ())
    ctx.primary
  }
}
