package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.LongType
import graft.config._
import graft.core._

/** join.asof — as-of (point-in-time) join: for every left row, the LATEST
  * right row with right.on <= left.on (strict `<` optional), matched within
  * equi `by` keys, optionally within `tolerance`. The canonical time-series
  * operator Spark lacks natively (Pandas merge_asof / DuckDB ASOF JOIN /
  * kdb aj).
  *
  * Spark-first plan (no per-row loops, no range cross-join):
  * union both sides tagged, ONE hash shuffle on `by` + sort within
  * partitions on (on, side), then a running last_value(ignoreNulls) window
  * carries the most recent right row forward onto each left row. Cost =
  * one shuffle + one sort — same shape as a sort-merge join, scales the
  * same way.
  */
object AsofJoinOp extends Stage {
  val name = "join.asof"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cfg = ctx.cfg
    val left = ctx.input(0)
    val right = ctx.input(1)
    val by = cfg.strListOr("by", Vector.empty)
    val on = cfg.str("on")
    val strict = cfg.boolOr("strict", false)      // true: right.on < left.on
    val tolerance = cfg.doubleOpt("tolerance")    // in `on` units
    val rightPrefix = cfg.strOr("right_prefix", "r_")

    val rightValueCols = right.columns.filterNot(c => by.contains(c)).toSeq
    val leftCols = left.columns.toSeq

    // union schema: left cols + nullable right-value cols + side tag
    val taggedLeft = rightValueCols.foldLeft(left.withColumn("_side", F.lit(1)))(
      (df, c) => df.withColumn(s"_r_$c", F.lit(null).cast(right.schema(c).dataType)))
    val taggedRight0 = right.withColumn("_side", F.lit(0))
    val taggedRight = {
      // rename right value cols into the _r_ slots; add null left-only cols
      val renamed = rightValueCols.foldLeft(taggedRight0)(
        (df, c) => df.withColumnRenamed(c, s"_r_$c"))
      leftCols.filterNot(c => by.contains(c) || c == on)
        .foldLeft(renamed)((df, c) => df.withColumn(c, F.lit(null).cast(left.schema(c).dataType)))
        // right rows order on the same `on` axis; keep their own on value
        .withColumn(on, if (right.columns.contains(on)) F.col(s"_r_$on") else F.col(on))
    }
    val unioned = taggedLeft.unionByName(taggedRight.select(taggedLeft.columns.map(F.col): _*))

    // order: by on ascending; at equal `on`, right rows first unless strict
    // (strict: right rows at same timestamp must NOT be visible -> left first)
    val sideOrder = if (strict) F.col("_side").desc else F.col("_side").asc

    val carried: DataFrame = if (by.nonEmpty) {
      val part = Window.partitionBy(by.map(F.col): _*)
      val w = part.orderBy(F.col(on).asc, sideOrder)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // carry the latest right row forward (its `on` too, for tolerance) —
      // all carries in ONE select so they compile to a single Window node
      // (chained withColumn leaves interleaved Projects that block Spark's
      // CollapseWindow rule → one sorted pass per carried column)
      def carry(src: Column, out: String): Column =
        F.last(F.when(F.col("_side") === 0, src), ignoreNulls = true).over(w).alias(out)
      val carryCols = carry(F.col(on), "_r_on_matched") +:
        rightValueCols.map(c => carry(F.col(s"_r_$c"), s"_m_$c"))
      unioned.select(F.col("*") +: carryCols: _*)
    } else {
      // keyless as-of: Window.partitionBy() would be a SinglePartition
      // exchange (round-1 scale-killer). Instead: global range sort, then
      // the two-pass carry — pass 1 ships one last-non-null vector per
      // partition to the driver, pass 2 streams each partition seeded with
      // the broadcast prefix carry. Matches the window path's PER-COLUMN
      // last(ignoreNulls) semantics: a null cell in the newest right row
      // falls back to an older right row's value for that column only.
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StructField, StructType}
      val sorted = unioned.orderBy(F.col(on).asc, sideOrder)
      val cols = sorted.columns
      val sideIdx = cols.indexOf("_side")
      val srcNames = on +: rightValueCols.map(c => s"_r_$c")
      val srcIdcs = srcNames.map(n => cols.indexOf(n)).toArray
      val nSrc = srcIdcs.length
      val outNames = "_r_on_matched" +: rightValueCols.map(c => s"_m_$c")
      val outSchema = StructType(sorted.schema.fields ++
        outNames.zip(srcIdcs.map(i => sorted.schema.fields(i).dataType))
          .map { case (n, t) => StructField(n, t, nullable = true) })
      TwoPass(sorted, outSchema) { it =>
        // pass 1: last non-null value per carried column in this partition
        val acc = Array.fill[Any](nSrc)(null)
        it.foreach { r =>
          if (r.getInt(sideIdx) == 0) {
            var i = 0
            while (i < nSrc) { val v = r.get(srcIdcs(i)); if (v != null) acc(i) = v; i += 1 }
          }
        }
        acc.toVector
      } { stats =>
        stats.scanLeft(Vector.fill[Any](nSrc)(null)) { (acc, s) =>
          Vector.tabulate(nSrc)(i => if (s(i) != null) s(i) else acc(i))
        }.dropRight(1).toIndexedSeq
      } { (carry, it) =>
        val acc: Array[Any] = carry.toArray
        it.map { r =>
          if (r.getInt(sideIdx) == 0) {
            var i = 0
            while (i < nSrc) { val v = r.get(srcIdcs(i)); if (v != null) acc(i) = v; i += 1 }
          }
          Row.fromSeq(r.toSeq ++ acc)
        }
      }
    }

    val withinTol: Column = tolerance match {
      case Some(t) => F.col("_r_on_matched").isNotNull &&
        (F.col(on).cast("double") - F.col("_r_on_matched").cast("double")) <= t
      case None => F.col("_r_on_matched").isNotNull
    }

    val matchedCols = rightValueCols.map(c =>
      F.when(withinTol, F.col(s"_m_$c")).otherwise(F.lit(null)).alias(s"$rightPrefix$c"))

    carried.filter(F.col("_side") === 1)
      .select(leftCols.map(F.col) ++ matchedCols: _*)
  }
}

/** join.range — banded/interval join: left.value ∈ [right.lo, right.hi]
  * (inclusive). The naive Spark plan is a BroadcastNestedLoopJoin (fine for
  * a small right side); at scale this op uses BUCKET DECOMPOSITION: ranges
  * explode into fixed-width buckets, the join becomes an equi-join on
  * bucket id (hash shuffle, no nested loop), then an exact post-filter.
  * `bucket_width` tunes the explode factor vs bucket population trade-off.
  */
object RangeJoinOp extends Stage {
  val name = "join.range"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val left = ctx.input(0)
    val right = ctx.input(1)
    val value = cfg.str("value")     // left column
    val lo = cfg.str("lo")           // right columns
    val hi = cfg.str("hi")
    val how = cfg.strOr("how", "inner") match {
      case "inner" => "inner"
      case "left" | "left_outer" => "left_outer"
      case other => throw new GraftConfigError(s"join.range supports inner/left, got '$other'")
    }

    cfg.doubleOpt("bucket_width") match {
      case None =>
        // small right side: let Spark broadcast the nested-loop
        val cond = left(value) >= right(lo) && left(value) <= right(hi)
        left.join(F.broadcast(right), cond, how)
      case Some(w) =>
        val bLeft = left.withColumn("_bucket", F.floor(F.col(value) / w).cast(LongType))
        val bRight = right.withColumn("_bucket",
          F.explode(F.sequence(
            F.floor(F.col(lo) / w).cast(LongType),
            F.floor(F.col(hi) / w).cast(LongType))))
        val joined = bLeft.join(bRight, Seq("_bucket"), "inner")
          .filter(F.col(value) >= F.col(lo) && F.col(value) <= F.col(hi))
          .drop("_bucket")
        if (how == "inner") joined
        else { // left: re-attach unmatched left rows
          val matchedKeys = joined.select(left.columns.map(F.col): _*)
          val unmatched = left.exceptAll(matchedKeys)
          val rightNulls = right.columns.foldLeft(unmatched)(
            (df, c) => df.withColumn(c, F.lit(null).cast(right.schema(c).dataType)))
          joined.unionByName(rightNulls)
        }
    }
  }
}

/** groupby.cube — CUBE / ROLLUP / GROUPING SETS aggregation (absent in the
  * reference, SURVEY §2.8; standard OLAP surface). `mode` = cube | rollup;
  * same `aggregations` shape as groupby.apply. Adds grouping-id when
  * `grouping_id = true` so callers can tell subtotal levels apart.
  */
object CubeOp extends Stage {
  val name = "groupby.cube"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val keys = cfg.strList("by")
    val aggs = cfg.tblArr("aggregations").map { a =>
      AggOps.agg(a.str("operation"), a.str("column"), a)
        .alias(a.strOr("output_column", a.str("column")))
    }
    if (aggs.isEmpty) throw new GraftConfigError("groupby.cube requires aggregations")
    val df = ctx.primary
    val grouped = cfg.strOr("mode", "cube") match {
      case "cube"   => df.cube(keys.map(F.col): _*)
      case "rollup" => df.rollup(keys.map(F.col): _*)
      case other => throw new GraftConfigError(s"unknown mode '$other' (cube|rollup)")
    }
    // grouping_id() must be computed inside the same agg as the measures
    val finalAggs =
      if (cfg.boolOr("grouping_id", false))
        aggs :+ F.grouping_id().alias("grouping_id")
      else aggs
    grouped.agg(finalAggs.head, finalAggs.tail: _*)
  }
}
