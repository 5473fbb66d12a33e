package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.config._
import graft.core._

/** join.apply — equi/theta joins (capability extension: the reference has NO
  * joins at all, SURVEY §2.8 — every multi-input stage reads only its first
  * input). First-class requirement for an analytics engine at 100 TB.
  *
  * Scale design:
  *  - `broadcast` = auto|left|right|none. auto lets Spark's AQE +
  *    autoBroadcastJoinThreshold decide; explicit left/right force
  *    F.broadcast() for known-small dims (nation/region-class tables) so
  *    the big fact side never shuffles.
  *  - equi-keys go through `on`/`left_on`/`right_on` so Catalyst plans a
  *    hash join keyed on them (shuffle on join keys only, AQE can convert
  *    to broadcast or split skewed partitions at runtime).
  *  - `salt` = N explicitly splits skewed keys when AQE's skew-join can't
  *    help (e.g. one key ≫ a whole partition after AQE's split ceiling, or
  *    AQE disabled): the left/probe side gets a uniform random salt in
  *    [0,N), the right/build side is replicated N× (explode), and the join
  *    key becomes (keys…, salt) — one hot key fans out over N reducers.
  *    Valid for inner/left/semi/anti (right rows may duplicate, so any
  *    join preserving unmatched RIGHT rows would multiply them).
  */
object JoinOp extends Stage {
  val name = "join.apply"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val how = cfg.strOr("how", "inner") match {
      case "inner" => "inner"
      case "left" | "left_outer" => "left_outer"
      case "right" | "right_outer" => "right_outer"
      case "outer" | "full" | "full_outer" => "full_outer"
      case "semi" | "left_semi" => "left_semi"
      case "anti" | "left_anti" => "left_anti"
      case "cross" => "cross"
      case other => throw new GraftConfigError(s"unknown join type '$other'")
    }
    val left0 = ctx.input(0)
    val right0 = ctx.input(1)
    val (left, right) = cfg.strOr("broadcast", "auto") match {
      case "left"  => (F.broadcast(left0), right0)
      case "right" => (left0, F.broadcast(right0))
      case _       => (left0, right0)
    }
    if (how == "cross") return left.crossJoin(right)
    val (lks, rks) =
      if (cfg.has("on")) { val ks = cfg.strList("on"); (ks, ks) }
      else {
        val l = cfg.strList("left_on"); val r = cfg.strList("right_on")
        if (l.size != r.size) throw new GraftConfigError("left_on/right_on length mismatch")
        (l, r)
      }

    cfg.longOpt("salt") match {
      case Some(n) if n > 1 =>
        if (!Set("inner", "left_outer", "left_semi", "left_anti").contains(how))
          throw new GraftConfigError(
            s"salt requires inner/left/semi/anti (right rows replicate); got '$how'")
        val sl = left.withColumn("_salt_l", (F.rand(42) * n).cast("int"))
        val sr = right.withColumn("_salt_r",
          F.explode(F.sequence(F.lit(0), F.lit(n.toInt - 1))))
        val cond = (lks.zip(rks).map { case (l, r) => sl(l) === sr(r) } :+
          (sl("_salt_l") === sr("_salt_r"))).reduce(_ && _)
        val joined = sl.join(sr, cond, how).drop("_salt_l", "_salt_r")
        // `on` semantics (usingColumns) keep ONE key column — drop right's
        if (cfg.has("on")) lks.foldLeft(joined)((df, k) => df.drop(sr(k))) else joined
      case _ =>
        if (cfg.has("on")) left.join(right, lks, how)
        else {
          val cond = lks.zip(rks).map { case (l, r) => left(l) === right(r) }.reduce(_ && _)
          left.join(right, cond, how)
        }
    }
  }
}

/** union.apply — UNION ALL of all inputs by column NAME (allowMissingColumns
  * configurable); `distinct = true` adds dedup. Extension (SURVEY §2.8).
  * unionByName is a zero-shuffle concat; distinct adds one hash shuffle.
  */
object UnionOp extends Stage {
  val name = "union.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    if (ctx.inputs.size < 2) throw new GraftPlanError("union.apply requires >= 2 inputs")
    val allowMissing = ctx.cfg.boolOr("allow_missing_columns", false)
    val merged = ctx.inputs.map(_._2).reduce((a, b) => a.unionByName(b, allowMissing))
    if (ctx.cfg.boolOr("distinct", false)) merged.distinct() else merged
  }
}

/** intersect.apply / except.apply — set ops (extension, SURVEY §2.8). */
object IntersectOp extends Stage {
  val name = "intersect.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame =
    if (ctx.cfg.boolOr("all", false)) ctx.input(0).intersectAll(ctx.input(1))
    else ctx.input(0).intersect(ctx.input(1))
}
object ExceptOp extends Stage {
  val name = "except.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame =
    if (ctx.cfg.boolOr("all", false)) ctx.input(0).exceptAll(ctx.input(1))
    else ctx.input(0).except(ctx.input(1))
}

/** window.rank — analytic window functions (rank/dense_rank/row_number/
  * lag/lead/cume_dist/ntile + framed aggregates) partitioned by keys.
  * Extension (reference has no window *functions*, SURVEY §2.8).
  * One shuffle on partition keys; sort is within partitions only.
  *
  * With EMPTY `partition_by` the naive `Window.partitionBy()` plan is an
  * `Exchange SinglePartition` — every row through one task. That case is
  * routed to [[KeylessWindow]], which computes identical answers with
  * distributed two-pass plans (grouped prefix for rank-family/aggregates,
  * range-sort + zipWithIndex for positional functions).
  */
object WindowFnOp extends Stage {
  val name = "window.rank"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cfg = ctx.cfg
    val partition = cfg.strListOr("partition_by", Vector.empty)
    val fn0 = cfg.strOr("function", "row_number")
    if (partition.isEmpty)
      return KeylessWindow.run(ctx.primary, cfg, fn0, cfg.strOr("output_column", fn0))
    val orderCfg = Cfg(cfg.table ++ Map("by" -> cfg.table.getOrElse("order_by", CArr(Vector.empty))))
    val order = SortOp.sortCols(orderCfg)
    val base = Window.partitionBy(partition.map(F.col): _*)
    val w = base.orderBy(order: _*)
    val fn = fn0
    val out = cfg.strOr("output_column", fn)
    val col: Column = fn match {
      case "row_number" => F.row_number()
      case "rank"       => F.rank()
      case "dense_rank" => F.dense_rank()
      case "percent_rank" => F.percent_rank()
      case "cume_dist"  => F.cume_dist()
      case "ntile"      => F.ntile(cfg.longOr("n", 4L).toInt)
      case "lag"        => F.lag(F.col(cfg.str("column")), cfg.longOr("offset", 1L).toInt)
      case "lead"       => F.lead(F.col(cfg.str("column")), cfg.longOr("offset", 1L).toInt)
      case "sum"        => F.sum(cfg.str("column"))
      case "avg"        => F.avg(cfg.str("column"))
      case "count"      => F.count(F.lit(1))
      case "min"        => F.min(cfg.str("column"))
      case "max"        => F.max(cfg.str("column"))
      case other => throw new GraftConfigError(s"unknown window function '$other'")
    }
    ctx.primary.withColumn(out, col.over(w))
  }
}

/** pivot.apply — pivot wide (extension). Values list strongly recommended
  * at scale (skips the extra distinct-values job). */
object PivotOp extends Stage {
  val name = "pivot.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val keys = cfg.strList("by")
    val pivotCol = cfg.str("pivot")
    val agg = AggOps.agg(cfg.strOr("operation", "sum"), cfg.str("column"), cfg)
    val grouped = ctx.primary.groupBy(keys.map(F.col): _*)
    val values = cfg.arrOpt("values").map(_.map {
      case CStr(s) => s: Any
      case CLong(l) => l: Any
      case CDouble(d) => d: Any
      case CBool(b) => b: Any
      case o => throw new GraftConfigError(s"pivot values: ${o.render}")
    })
    val pv = values match {
      case Some(vs) => grouped.pivot(pivotCol, vs)
      case None     => grouped.pivot(pivotCol)
    }
    pv.agg(agg)
  }
}
