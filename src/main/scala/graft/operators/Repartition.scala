package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** repartition.apply — explicit partition-count/layout control between
  * stages (extension; the reference has no notion of partitions at all).
  * The knob that turns "works at sf0.1" into "works at 100 TB":
  *
  *  - mode = "hash" (default): repartition(n, by…) — co-locates rows by
  *    key ahead of a sequence of per-key stages, or resizes partitions so
  *    downstream CPU-bound work uses every core.
  *  - mode = "range": repartitionByRange(n, by…) — sorted layout for
  *    writes that should cluster (paired with parquet.write, readers get
  *    min/max-pruned row groups on the range keys).
  *  - mode = "coalesce": coalesce(n) — narrow (no shuffle) reduction of
  *    partition count, e.g. before writing to avoid ten thousand tiny
  *    files.
  */
object RepartitionOp extends Stage {
  val name = "repartition.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val n = cfg.longOpt("n").map(_.toInt)
    val by = cfg.strListOr("by", Vector.empty).map(F.col)
    cfg.strOr("mode", "hash") match {
      case "hash" => (n, by) match {
        case (Some(k), Vector()) => df.repartition(k)
        case (Some(k), cols)     => df.repartition(k, cols: _*)
        case (None, Vector())    => throw new GraftConfigError("repartition.apply needs 'n' and/or 'by'")
        case (None, cols)        => df.repartition(cols: _*)
      }
      case "range" =>
        if (by.isEmpty) throw new GraftConfigError("mode=range requires 'by'")
        n match {
          case Some(k) => df.repartitionByRange(k, by: _*)
          case None    => df.repartitionByRange(by: _*)
        }
      case "coalesce" =>
        df.coalesce(n.getOrElse(throw new GraftConfigError("mode=coalesce requires 'n'")))
      case other => throw new GraftConfigError(s"unknown repartition mode '$other'")
    }
  }
}
