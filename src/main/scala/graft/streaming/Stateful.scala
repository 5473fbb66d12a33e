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

/** aggregate.stateful — running per-key aggregate with cross-batch state:
  * each micro-batch folds its rows into per-key state and emits the
  * updated (key, value) row. Unlike aggregate.stream (windowed), state
  * lives across batches for the stream's lifetime — the "current value
  * per key" pattern (counters, running totals, high-water marks).
  * Works identically on batch frames (single-pass grouped fold), which is
  * how the oracle checks it.
  * Ops: count, sum, avg, min, max on `value_column`; key cast to string,
  * value to double (state schema must be fixed at plan time).
  *
  * Two engines, same fold and same answers (StatefulSpec asserts parity):
  *  - `engine = "mgws"` (default): mapGroupsWithState — works on every
  *    state-store provider.
  *  - `engine = "tws"`: transformWithState, the Spark 4 stateful-processor
  *    API — typed ValueState with optional TTL (`state_ttl` duration, e.g.
  *    "1 hour", bounds state for unbounded key spaces), timers, and live
  *    schema evolution. Streaming runs need the RocksDB state store
  *    (`spark.sql.streaming.stateStore.providerClass` =
  *    ...RocksDBStateStoreProvider, shipped with Spark); batch runs work
  *    on any store.
  */
object StatefulAggOp extends Stage {
  val name = "aggregate.stateful"
  val kind = StageKind.Transform

  private def foldOp(op: String, acc0: (Double, Long),
      rows: Iterator[Double]): (Double, Long) = {
    var (acc, n) = acc0
    rows.foreach { v =>
      n += 1
      op match {
        case "count"       => acc += 1
        case "sum" | "avg" => acc += v
        case "min"         => acc = math.min(acc, v)
        case "max"         => acc = math.max(acc, v)
        case other => throw new GraftConfigError(s"unknown stateful op '$other'")
      }
    }
    (acc, n)
  }
  private def init(op: String): (Double, Long) = (op match {
    case "min" => Double.PositiveInfinity
    case "max" => Double.NegativeInfinity
    case _     => 0.0
  }, 0L)
  private def emit(op: String, s: (Double, Long)): Double =
    if (op == "avg") s._1 / s._2 else s._1

  /** "90 seconds" / "5 minutes" / "1 hour" / "2 days" / "250 ms" → Duration. */
  private[streaming] def parseDuration(s: String): java.time.Duration = {
    val m = """^\s*(\d+)\s*(ms|millis|milliseconds?|s|seconds?|m|min|minutes?|h|hours?|d|days?)\s*$"""
      .r.findFirstMatchIn(s.toLowerCase)
      .getOrElse(throw new GraftConfigError(s"state_ttl: cannot parse duration '$s'"))
    val n = m.group(1).toLong
    m.group(2).head match {
      case 'm' if m.group(2).startsWith("ms") || m.group(2).startsWith("milli") =>
        java.time.Duration.ofMillis(n)
      case 's' => java.time.Duration.ofSeconds(n)
      case 'm' => java.time.Duration.ofMinutes(n)
      case 'h' => java.time.Duration.ofHours(n)
      case 'd' => java.time.Duration.ofDays(n)
    }
  }

  /** transformWithState processor: one ValueState cell per key. */
  private class RunningAgg(op: String, ttl: Option[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Double), (String, Double)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState, TimerValues}
    @transient private var st: ValueState[(Double, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = ttl.map(d => TTLConfig(StatefulAggOp.parseDuration(d))).getOrElse(TTLConfig.NONE)
      st = getHandle.getValueState[(Double, Long)]("agg",
        org.apache.spark.sql.Encoders.product[(Double, Long)], cfg)
    }
    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[(String, Double)] = {
      val cur = Option(st.get()).getOrElse(StatefulAggOp.init(op))
      val next = foldOp(op, cur, rows.map(_._2))
      st.update(next)
      Iterator((key, emit(op, next)))
    }
  }

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

    val updated = cfg.strOr("engine", "mgws") match {
      case "tws" =>
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        keyed.groupByKey(_._1).transformWithState(
          new RunningAgg(op, cfg.strOpt("state_ttl")),
          TimeMode.None(), OutputMode.Update())
      case "mgws" =>
        // state = (accumulator, row count); avg derives, min/max fold on acc
        keyed.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
          (k: String, rows: Iterator[(String, Double)],
           state: org.apache.spark.sql.streaming.GroupState[(Double, Long)]) =>
            val next = foldOp(op, state.getOption.getOrElse(init(op)), rows.map(_._2))
            state.update(next)
            (k, emit(op, next))
        }
      case other => throw new GraftConfigError(s"engine must be mgws|tws, got '$other'")
    }
    updated.toDF(keyCol, out)
  }
}
