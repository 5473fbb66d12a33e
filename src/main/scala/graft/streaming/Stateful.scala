package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.config._
import graft.core._

/** Stateful streaming operators — arbitrary per-key state beyond windowed
  * aggregation (the brief's mapGroupsWithState bullet; the reference has no
  * stateful streaming at all — its "streaming" is count-based record
  * chunking, src/core/streaming.rs:100-133).
  */

/** dedup.stream — streaming deduplication. With `watermark_column` +
  * `delay`, uses dropDuplicatesWithinWatermark: state for a key is dropped
  * once the watermark passes it, so state size tracks the delay window,
  * not the whole stream — the only dedup that survives an unbounded
  * stream. Without a watermark it falls back to dropDuplicates (exact,
  * state grows with distinct keys — fine for batch parity, unbounded
  * streams should always set the watermark).
  */
object StreamDedupOp extends Stage {
  val name = "dedup.stream"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val cols = cfg.strList("columns")
    val df = ctx.primary
    (cfg.strOpt("watermark_column"), cfg.strOpt("delay")) match {
      case (Some(wc), Some(d)) if df.isStreaming =>
        df.withWatermark(wc, d).dropDuplicatesWithinWatermark(cols)
      case _ => df.dropDuplicates(cols)
    }
  }
}

/** aggregate.stateful — running per-key aggregate via mapGroupsWithState:
  * each micro-batch folds its rows into per-key state and emits the
  * updated (key, value) row. Unlike aggregate.stream (windowed), state
  * lives across batches for the stream's lifetime — the "current value
  * per key" pattern (counters, running totals, high-water marks).
  * Works identically on batch frames (Spark executes mapGroupsWithState
  * as a single-pass grouped fold), which is how the oracle checks it.
  * Ops: count, sum, avg, min, max on `value_column`; key cast to string,
  * value to double (state schema must be fixed at plan time).
  */
object StatefulAggOp extends Stage {
  val name = "aggregate.stateful"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val keyCol = cfg.str("key_column")
    val op = cfg.strOr("operation", "sum")
    val out = cfg.strOr("output_column", op)
    val valueCol = cfg.strOpt("value_column")
    if (op != "count" && valueCol.isEmpty)
      throw new GraftConfigError(s"aggregate.stateful '$op' requires value_column")

    val spark = ctx.spark
    import spark.implicits._
    val keyed = ctx.primary.select(
      F.col(keyCol).cast("string").alias("k"),
      valueCol.map(c => F.col(c).cast("double")).getOrElse(F.lit(1.0)).alias("v"))
      .as[(String, Double)]

    // state = (accumulator, row count); avg derives, min/max fold on acc
    val updated = keyed.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (k: String, rows: Iterator[(String, Double)],
       state: org.apache.spark.sql.streaming.GroupState[(Double, Long)]) =>
        var (acc, n) = state.getOption.getOrElse((
          op match {
            case "min" => Double.PositiveInfinity
            case "max" => Double.NegativeInfinity
            case _     => 0.0
          }, 0L))
        rows.foreach { case (_, v) =>
          n += 1
          op match {
            case "count"         => acc += 1
            case "sum" | "avg"   => acc += v
            case "min"           => acc = math.min(acc, v)
            case "max"           => acc = math.max(acc, v)
            case other => throw new GraftConfigError(s"unknown stateful op '$other'")
          }
        }
        state.update((acc, n))
        (k, if (op == "avg") acc / n else acc)
    }
    updated.toDF(keyCol, out)
  }
}
