package graft.operators

import org.apache.spark.sql.DataFrame
import graft.config._
import graft.core._

/** stage.pipeline — sub-pipeline composition (reference src/modules/stages/
  * pipeline.rs:128-247): run another pipeline, declared via `file` xor
  * `inline` TOML, as a single stage. The reference DISCARDS the
  * sub-pipeline's result and passes through its own input (TODO at
  * pipeline.rs:187-193); we return the sub-pipeline's terminal frame
  * (`output` selects a stage id; default = last stage), fixing that bug.
  * Because stages compose lazily here, the sub-pipeline's plan fuses into
  * the parent's Catalyst tree — no materialization boundary.
  */
object SubPipelineOp extends Stage {
  val name = "stage.pipeline"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val toml = (cfg.strOpt("file"), cfg.strOpt("inline")) match {
      case (Some(f), None) => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), java.nio.charset.StandardCharsets.UTF_8)
      case (None, Some(s)) => s
      case _ => throw new GraftConfigError("stage.pipeline requires exactly one of 'file' or 'inline'")
    }
    val pc = PipelineConfig.fromString(toml)
    val compiler = new DagCompiler(Registry.forPipeline(pc)) // sub-pipeline's own plugins load too
    // thread the OUTER pipeline's explain flag, success-deferral and cleanup
    // hooks through: a kafka.consume inside a sub-pipeline must not commit at
    // compose time (nor under `graft explain`) any more than a top-level one,
    // and its pinned batch must release when the OUTER run finishes
    val plans = compiler.compilePlans(ctx.spark, pc,
      explainOnly = ctx.cfg.boolOr("_explain_only", false),
      defer = ctx.deferToSuccess,
      cleanup = ctx.deferToCleanup)
    val outId = cfg.strOpt("output").getOrElse(pc.stages.last.id)
    plans.getOrElse(outId,
      throw new GraftConfigError(s"stage.pipeline output '$outId' not found"))
  }
}
