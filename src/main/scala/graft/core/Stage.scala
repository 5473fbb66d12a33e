package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.Cfg

/** A stage is a pure function (inputs, config) => DataFrame returning an
  * UNEXECUTED logical plan — the key architectural departure from the
  * reference, whose stages each eagerly collect
  * (reference: src/core/stage.rs:19-51 `Stage::execute` materializes per
  * stage; src/modules/transforms/filter.rs:117 `.collect()` per operator).
  * Here the whole pipeline DAG composes into ONE Catalyst plan, so pushdown,
  * pruning and whole-stage codegen span stage boundaries for free.
  */
trait Stage {
  /** Registry name, e.g. "filter.apply". */
  def name: String

  /** source | transform | sink — informational, mirrors the reference's
    * module grouping (src/modules/mod.rs:16-120). */
  def kind: StageKind

  def apply(ctx: StageContext): DataFrame
}

sealed trait StageKind
object StageKind {
  case object Source    extends StageKind
  case object Transform extends StageKind
  case object Sink      extends StageKind
}

/** Execution context handed to a stage.
  *
  * `inputs` preserves the declaration order of the stage's `inputs = [...]`
  * list. Single-input stages take the first input (the reference does
  * `inputs.into_values().next()` — filter.rs:93-96); multi-input stages
  * (join/union — our extension, absent in the reference per SURVEY §2.8)
  * consume them in order.
  */
final case class StageContext(
    spark: SparkSession,
    inputs: Seq[(String, DataFrame)],
    cfg: Cfg,
    stageId: String = "anon",
    /** Registrar for side effects that must wait for pipeline success —
      * e.g. kafka.consume's group-offset commit, which would otherwise
      * mark messages consumed before any sink has durably written them
      * (at-most-once). Direct stage invocation (tests, SparkEntry) runs
      * the action immediately, preserving commit-at-apply semantics;
      * DagCompiler.run substitutes a collector and fires the queue only
      * after every sink action has succeeded (at-least-once). */
    deferToSuccess: (() => Unit) => Unit = StageContext.RunNow,
    /** Registrar for resource RELEASES (cache unpersists) that must run when
      * the surrounding pipeline finishes — success OR failure — unlike
      * deferToSuccess, which a failed/cancelled run suppresses. DagCompiler
      * drains this queue in its finally block. Outside a pipeline the
      * default keeps the resource pinned: a directly-invoked stage returns a
      * plan whose consumption happens later, so releasing eagerly would
      * recompute the very chain the persist pins (bounded caches only —
      * stages document their direct-mode footprint). */
    deferToCleanup: (() => Unit) => Unit = StageContext.KeepPinned,
    /** Per-pipeline-run claim registry for resources that admit exactly ONE
      * writer per run (e.g. an `index_path` with `index_append = true`:
      * two appender stages would each snapshot the corpus before the
      * other's deferred append fires, so neither dedups against the
      * other's survivors and duplicates silently enter the index).
      * DagCompiler shares one set across a pipeline's stages; the default
      * fresh set means directly-invoked stages (tests, SparkEntry) never
      * conflict — each invocation IS its own run. */
    claims: scala.collection.mutable.Set[String] = scala.collection.mutable.Set.empty
) {
  /** True the first time `key` is claimed within this run; false when an
    * earlier stage of the same run already holds it. */
  def claimOnce(key: String): Boolean = claims.add(key)
  def primary: DataFrame = inputs.headOption.map(_._2).getOrElse(
    throw new GraftPlanError(s"stage '$stageId' requires at least one input"))
  /** Persist `df` and register its release with deferToCleanup: inside a
    * pipeline the cache drops when the run finishes (success OR failure);
    * direct invocation keeps it pinned for the caller's still-lazy result.
    * NOTE Dataset.persist returns `this`, so callers must never detect
    * pinning by reference inequality — use this helper. */
  def pin(df: DataFrame): DataFrame = StageContext.pinWith(deferToCleanup, df)
  def input(i: Int): DataFrame =
    if (i < inputs.size) inputs(i)._2
    else throw new GraftPlanError(s"stage '$stageId' requires ${i + 1} inputs, got ${inputs.size}")
  def noInputs: Boolean = inputs.isEmpty
}

class GraftPlanError(msg: String) extends RuntimeException(msg)

object StageContext {
  /** Default deferToSuccess: execute immediately (no pipeline around us). */
  val RunNow: (() => Unit) => Unit = action => action()

  /** Default deferToCleanup: discard — direct invocation keeps caches
    * pinned for the caller's later consumption of the returned plan. */
  val KeepPinned: (() => Unit) => Unit = _ => ()

  /** MEMORY_AND_DISK-persist `df` and register its release with `release`
    * (a StageContext.deferToCleanup, or KeepPinned outside a pipeline) —
    * for helper objects that persist intermediates without a ctx in scope. */
  def pinWith(release: (() => Unit) => Unit, df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    release(() => df.unpersist(blocking = false))
    df
  }

  /** Convenience for tests / SparkEntry: single anonymous input. */
  def one(spark: SparkSession, df: DataFrame, cfg: Cfg): StageContext =
    StageContext(spark, Seq("in" -> df), cfg)
}
