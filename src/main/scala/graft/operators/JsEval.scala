package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{functions => F}
import graft.config._
import graft.core._
import graft.js.{JsArr, JsError, JsInterp, JsNull, JsObj, JsUndefined, JsVal}

/** js.eval — per-row JavaScript transform, implemented NATIVELY.
  *
  * The reference runs this as a WASM plugin embedding the Boa JS engine
  * (reference plugins-wasm/conveyor-plugin-js-wasm/src/lib.rs): config
  * carries a `script` that must define `transform(row)`; each row crosses
  * into JS as an object of JSON values and the returned object becomes the
  * output row. Its engine loop constructs a fresh JS context and re-parses
  * the script source FOR EVERY ROW (lib.rs:160-176).
  *
  * Here the script is interpreted by graft.js — a pure-Scala ECMAScript
  * subset (lexer/parser/tree-walk evaluator, see JsAst.scala for the
  * declared surface) — so the stage needs no engine jar and runs fully
  * distributed:
  *
  *   - the script is parsed ONCE per partition (mapPartitions), not per row;
  *   - rows stream through `to_json` → transform → JSON lines, all inside
  *     one narrow stage — no shuffle, arbitrary scale-out;
  *   - syntax errors and a missing `transform` function surface at PLAN
  *     time (driver-side parse), before any cluster work is scheduled.
  *
  * Output schema: JS is dynamic, so by default the result schema is
  * inferred by Spark's distributed JSON schema inference (one extra pass
  * over the transformed rows). For the 100 TB path pass `schema = "<DDL>"`
  * (e.g. "id BIGINT, fullName STRING, age BIGINT") — then the plan is
  * single-pass with no inference job.
  *
  * Declared extensions beyond the reference:
  *   - returning null/undefined DROPS the row (transform-as-filter);
  *   - returning an array of objects emits MULTIPLE rows (flat-map);
  *   - on_error = "fail" (default) | "skip" — skip drops rows whose
  *     transform throws instead of failing the job.
  */
object JsEvalOp extends Stage {
  val name = "js.eval"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val script = ctx.cfg.str("script")
    val onError = ctx.cfg.strOr("on_error", "fail") match {
      case ok @ ("fail" | "skip") => ok
      case other => throw new GraftPlanError(s"js.eval on_error must be fail|skip, got '$other'")
    }
    val schemaDdl = ctx.cfg.strOpt("schema")

    // Plan-time validation: parse + require transform(). Runs the script's
    // top-level once on the driver; row work stays on executors.
    try new JsInterp(script)
    catch {
      case e: JsError => throw new GraftPlanError(s"js.eval script invalid: ${e.getMessage}")
    }

    val df = ctx.primary
    val spark = ctx.spark
    import spark.implicits._

    // ignoreNullFields=false so JS sees explicit nulls (Spark's default
    // omits null fields, which would turn row.x into undefined).
    val asJson: Dataset[String] = df
      .select(F.to_json(F.struct(df.columns.map(df(_)).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .as[String]

    val transformed: Dataset[String] = asJson.mapPartitions { rows =>
      val interp = new JsInterp(script) // parsed once per partition
      val skipOnError = onError == "skip"
      rows.flatMap { line =>
        // the array branch materializes EAGERLY (strict Vector, not a lazy
        // iterator) so element-type errors surface inside this try and
        // respect on_error + the row-context wrapper
        try {
          interp.callTransform(JsVal.parseJson(line)) match {
            case JsNull | JsUndefined => Vector.empty // declared: drop row
            case o: JsObj             => Vector(JsVal.stringify(o))
            case a: JsArr => // declared: array => multiple output rows
              a.items.toVector.map {
                case o: JsObj => JsVal.stringify(o)
                case other => throw new JsError(
                  s"transform returned an array containing ${JsVal.typeOf(other)}; elements must be objects")
              }
            case other => throw new JsError(
              s"transform must return an object (or null to drop, array to expand); got ${JsVal.typeOf(other)}")
          }
        } catch {
          // builtins may surface raw JVM exceptions (NumberFormatException
          // from parseInt overflow, DateTimeParseException, ...) — treat
          // every non-fatal throw as a row failure, not a job crash
          case scala.util.control.NonFatal(_) if skipOnError => Vector.empty
          case scala.util.control.NonFatal(e) =>
            val snippet = if (line.length > 200) line.take(200) + "..." else line
            throw new JsError(s"js.eval failed on row $snippet: ${e.getMessage}")
        }
      }
    }

    schemaDdl match {
      case Some(ddl) =>
        val schema = try StructType.fromDDL(ddl) catch {
          case e: Exception => throw new GraftPlanError(s"js.eval bad schema DDL '$ddl': ${e.getMessage}")
        }
        // from_json, NOT spark.read.json(dataset): the reader path converts
        // the dataset to an RDD, which forces full analysis + physical
        // planning of the UPSTREAM pipeline at compose time (measured: 3.9 s
        // of the 15-stage corpus example's 5.3 s compile was this stage) and
        // then hides that pipeline behind an RDD-scan boundary in the final
        // plan. from_json keeps the declared-schema path lazy and the whole
        // pipeline ONE Catalyst plan. (The JSON lines are machine-generated
        // by stringify above, so the readers' corrupt-record handling isn't
        // a meaningful difference.)
        transformed.select(F.from_json(F.col("value"), schema).as("__js"))
          .select("__js.*")
      case None =>
        // dynamic schema: distributed inference needs the reader (one extra
        // pass over the transformed rows, documented above)
        spark.read.json(transformed)
    }
  }
}
