package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** window.time — event-time windows (the Spark-native capability upgrade
  * over the reference's count-only windows; the reference has no event time
  * at all, SURVEY §2.4). Works identically on batch and streaming frames:
  * tumbling `window(ts, size)`, sliding `window(ts, size, slide)`; appends
  * the window struct as `window` (start/end). In streaming mode add
  * `watermark` (e.g. "10 minutes") for state cleanup + late-data dropping —
  * stateless on batch.
  */
object TimeWindowOp extends Stage {
  val name = "window.time"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val tsCol = cfg.str("ts_column")
    val size = cfg.str("size")        // e.g. "1 hour"
    val slide = cfg.strOpt("slide")
    var df = ctx.primary
    cfg.strOpt("watermark").foreach(w => df = df.withWatermark(tsCol, w))
    val win = slide match {
      case Some(sl) => F.window(F.col(tsCol), size, sl)
      case None     => F.window(F.col(tsCol), size)
    }
    df.withColumn("window", win)
  }
}

/** window.session — event-time session windows with gap timeout
  * (`session_window`), fixing the reference's session TODO
  * (src/core/streaming.rs:128-133 is a pass-through). session_window is a
  * grouping expression in Spark, so this stage performs the grouped
  * aggregation directly: group_by keys + aggregations (groupby.apply
  * shape); output = keys + session struct (start/end) + aggregates.
  * Streaming requires a watermark for state eviction.
  */
object SessionWindowOp extends Stage {
  val name = "window.session"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val tsCol = cfg.str("ts_column")
    val gap = cfg.strOr("gap", "5 minutes")
    var df = ctx.primary
    cfg.strOpt("watermark").foreach(w => df = df.withWatermark(tsCol, w))
    val keys = cfg.strListOr("group_by", Vector.empty)
    val aggs = cfg.tblArr("aggregations") match {
      case Vector() => Vector(F.count(F.lit(1)).alias("n_events"))
      case tbls => tbls.map { a =>
        graft.operators.AggOps.agg(a.str("operation"), a.str("column"), a)
          .alias(a.strOr("output_column", a.str("column")))
      }
    }
    val groupCols = F.session_window(F.col(tsCol), gap).alias("session") +:
      keys.map(F.col)
    df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
