package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.types._
import graft.config._
import graft.core._

/** Scale-safe analytic functions over a GLOBALLY ordered frame (window.rank
  * with empty `partition_by`, i.e. `Window.partitionBy()` semantics).
  *
  * The naive plan — `Window.partitionBy().orderBy(...)` — funnels the whole
  * dataset through ONE partition (`Exchange SinglePartition`), the classic
  * 100 TB scale-killer flagged in the round-1 review. This object computes
  * the same answers with distributed two-pass plans:
  *
  *  - rank / dense_rank / percent_rank / cume_dist and the running RANGE
  *    aggregates (sum/avg/count/min/max) are CONSTANT WITHIN A TIE GROUP
  *    (rows equal on all order keys). So: group by the order keys (one hash
  *    shuffle onto the much smaller distinct-key frame), range-sort that
  *    frame, prefix-fold it with per-partition offsets (pass 1 ships one
  *    tiny summary per partition to the driver, pass 2 applies broadcast
  *    offsets), and hash-join the per-group result back. No step is
  *    single-partition; the shuffles are keyed and AQE-coalescible.
  *
  *  - row_number / ntile are positional: global sort (range partitioning)
  *    + the zipWithIndex two-pass.
  *
  *  - lag / lead are positional with a k-row horizon: global sort, then
  *    pass 1 collects each partition's first-k/last-k values (tiny), the
  *    driver stitches cross-partition carries, pass 2 streams each
  *    partition with a k-deep buffer.
  *
  * Semantics match Spark's default window frame (RANGE UNBOUNDED PRECEDING
  * .. CURRENT ROW for ordered aggregates — tie groups move together),
  * asserted against the single-partition plan in KeylessWindowSpec.
  */
object KeylessWindow {

  /** Sum two non-null aggregate cell values of the same Spark numeric type. */
  private def plus(a: Any, b: Any): Any = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long)     => x + y
    case (x: java.lang.Double, y: java.lang.Double) => x + y
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
    case _ => throw new GraftConfigError(
      s"keyless running sum: unsupported cell types ${a.getClass.getName}/${b.getClass.getName}")
  }
  private def cmpMin(a: Any, b: Any): Any =
    if (a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0) a else b
  private def cmpMax(a: Any, b: Any): Any =
    if (a.asInstanceOf[Comparable[Any]].compareTo(b) >= 0) a else b

  /** One running value carried through the grouped prefix fold.
    * `src` aggregates the tie group; `merge` combines two non-null partials
    * (nulls are skipped: null+x=x, matching Spark aggregate null handling).
    */
  private case class RunSpec(tmp: String, src: Column, merge: (Any, Any) => Any)

  /** Grouped two-pass prefix: returns the input with `_rows_before` (rows in
    * strictly-earlier tie groups), `_grp_n`, `_dense` (1-based group index)
    * and one running-inclusive column per RunSpec attached, plus the global
    * row count. */
  private def groupedPrefix(df: DataFrame, orderKeys: Seq[String],
      sortCols: Seq[Column], runs: Seq[RunSpec]): (DataFrame, Long) = {
    val aggCols = F.count(F.lit(1)).alias("_grp_n") +: runs.map(r => r.src.alias(r.tmp))
    val g = df.groupBy(orderKeys.map(F.col): _*).agg(aggCols.head, aggCols.tail: _*)
    val sortedG = g.orderBy(sortCols: _*)
    val cols = sortedG.columns
    val nIdx = cols.indexOf("_grp_n")
    // capture only serializable values in the RDD closures (RunSpec holds a
    // Column, which is not serializable — never reference `runs` below)
    val nRuns = runs.size
    val runIdx: IndexedSeq[Int] = runs.map(r => cols.indexOf(r.tmp)).toIndexedSeq
    val merges: IndexedSeq[(Any, Any) => Any] =
      runs.map { r =>
        val m = r.merge   // detach from RunSpec before closure capture
        (a: Any, b: Any) => if (a == null) b else if (b == null) a else m(a, b)
      }.toIndexedSeq
    val outSchema = StructType(sortedG.schema.fields ++
      (StructField("_rows_before", LongType, nullable = false) +:
       StructField("_dense", LongType, nullable = false) +:
       runs.zipWithIndex.map { case (r, i) =>
         StructField(s"_run_${r.tmp}", sortedG.schema.fields(runIdx(i)).dataType, nullable = true)
       }))

    var total = 0L   // stashed by the driver-side fold
    val out = TwoPass(sortedG, outSchema) { it =>
      // pass 1: per-partition totals (rows, groups, per-run partial)
      var rows = 0L; var groups = 0L
      val partial = Array.fill[Any](nRuns)(null)
      it.foreach { r =>
        rows += r.getLong(nIdx); groups += 1
        var i = 0
        while (i < partial.length) {
          partial(i) = merges(i)(partial(i), r.get(runIdx(i))); i += 1
        }
      }
      (rows, groups, partial.toVector)
    } { stats =>
      total = stats.map(_._1).sum
      val zero = (0L, 0L, Vector.fill[Any](nRuns)(null))
      stats.scanLeft(zero) { case ((rows, groups, acc), (r, gc, pv)) =>
        (rows + r, groups + gc, Vector.tabulate(nRuns)(i => merges(i)(acc(i), pv(i))))
      }.dropRight(1).toIndexedSeq
    } { case ((rows0, dense0, acc0), it) =>
      var rows = rows0; var dense = dense0
      val acc = acc0.toArray
      it.map { r =>
        val before = rows; dense += 1
        rows += r.getLong(nIdx)
        var i = 0
        while (i < acc.length) {
          acc(i) = merges(i)(acc(i), r.get(runIdx(i))); i += 1
        }
        Row.fromSeq(r.toSeq ++ (before +: dense +: acc.toSeq))
      }
    }
    (out, total)
  }

  /** Join per-group computed columns back onto the original rows (null-safe
    * on the order keys, so null keys behave like groupBy, not like `=`). */
  private def joinBack(df: DataFrame, gRun: DataFrame, orderKeys: Seq[String],
      valueCols: Seq[(String, Column)]): DataFrame = {
    val gSel = gRun.select(
      orderKeys.map(k => F.col(k).alias(s"_gk_$k")) ++
        valueCols.map { case (n, c) => c.alias(n) }: _*)
    val cond = orderKeys.map(k => df(k) <=> gSel(s"_gk_$k")).reduce(_ && _)
    orderKeys.foldLeft(df.join(gSel, cond, "left"))((d, k) => d.drop(s"_gk_$k"))
  }

  /** Global-order positional index via sort + zipWithIndex (both range-
    * partitioned; no single-partition exchange). */
  private def withIdx(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField("_idx", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** lag/lead with cross-partition carries. `offset` rows; Spark null
    * default outside the frame. */
  private def lagLead(df: DataFrame, sortCols: Seq[Column], valueCol: String,
      offset: Int, lead: Boolean, out: String): DataFrame = {
    require(offset >= 1, "lag/lead offset must be >= 1")
    val sorted = df.orderBy(sortCols: _*)
    val vIdx = sorted.columns.indexOf(valueCol)
    if (vIdx < 0) throw new GraftConfigError(s"window.rank: unknown column '$valueCol'")
    val k = offset
    val outSchema = StructType(sorted.schema.fields :+
      StructField(out, sorted.schema(vIdx).dataType, nullable = true))
    TwoPass(sorted, outSchema) { it =>
      // pass 1: first-k and last-k values per partition
      val first = scala.collection.mutable.ArrayBuffer.empty[Any]
      val last = scala.collection.mutable.ArrayDeque.empty[Any]
      it.foreach { r =>
        val v = r.get(vIdx)
        if (first.size < k) first += v
        last += v; if (last.size > k) last.removeHead()
      }
      (first.toVector, last.toVector)
    } { stats =>
      // carries: for lag, the last k values before partition p; for lead,
      // the first k values after partition p
      if (!lead)
        stats.scanLeft(Vector.empty[Any])((acc, s) => (acc ++ s._2).takeRight(k))
          .dropRight(1).toIndexedSeq
      else
        stats.scanRight(Vector.empty[Any])((s, acc) => (s._1 ++ acc).take(k))
          .drop(1).toIndexedSeq
    } { (carry, it) =>
      if (!lead) {
        // ring of the k values preceding the current row, seeded from carry
        // (left-padded with nulls when fewer than k rows precede globally)
        val ring = scala.collection.mutable.ArrayDeque.empty[Any]
        ring ++= (Vector.fill[Any](k - carry.size)(null) ++ carry)
        it.map { r =>
          val v = ring.removeHead()
          ring += r.get(vIdx)
          Row.fromSeq(r.toSeq :+ v)
        }
      } else {
        new scala.collection.AbstractIterator[Row] {
          val buf = scala.collection.mutable.ArrayDeque.empty[Row]
          def hasNext: Boolean = buf.nonEmpty || it.hasNext
          def next(): Row = {
            while (buf.size < k + 1 && it.hasNext) buf += it.next()
            val cur = buf.removeHead()
            val v: Any =
              if (buf.size >= k) buf(k - 1).get(vIdx)
              else { val need = k - buf.size; if (need - 1 < carry.size) carry(need - 1) else null }
            Row.fromSeq(cur.toSeq :+ v)
          }
        }
      }
    }
  }

  /** Entry point for WindowFnOp's empty-partition_by case. */
  def run(df: DataFrame, cfg: Cfg, fn: String, out: String): DataFrame = {
    val orderCfg = Cfg(cfg.table ++ Map("by" -> cfg.table.getOrElse("order_by", CArr(Vector.empty))))
    val orderKeys = orderCfg.strListOr("by", Vector.empty)
    val sortCols = if (orderKeys.isEmpty) Seq.empty else SortOp.sortCols(orderCfg)

    def aggSpec(op: String, c: String): RunSpec = op match {
      case "sum"   => RunSpec("_s", F.sum(F.col(c)), plus)
      case "count" => RunSpec("_s", F.count(F.lit(1)), plus)
      case "min"   => RunSpec("_s", F.min(F.col(c)), cmpMin)
      case "max"   => RunSpec("_s", F.max(F.col(c)), cmpMax)
      case o => throw new GraftConfigError(s"unsupported keyless window aggregate '$o'")
    }

    fn match {
      case "row_number" =>
        withIdx(df, sortCols)
          .withColumn(out, (F.col("_idx") + 1).cast(IntegerType)).drop("_idx")
      case "ntile" =>
        // Spark ntile: the first (N mod n) tiles get ceil(N/n) rows
        val n = cfg.longOr("n", 4L)
        val total = df.count()
        val q = total / n; val rem = total % n
        withIdx(df, sortCols).withColumn(out,
          F.when(F.col("_idx") < rem * (q + 1), (F.col("_idx") / (q + 1)).cast(LongType) + 1)
            .otherwise(F.lit(rem) + ((F.col("_idx") - rem * (q + 1)) / math.max(q, 1L)).cast(LongType) + 1)
            .cast(IntegerType))
          .drop("_idx")
      case "lag" | "lead" =>
        lagLead(df, sortCols, cfg.str("column"), cfg.longOr("offset", 1L).toInt,
          lead = fn == "lead", out)
      case "rank" | "dense_rank" | "percent_rank" | "cume_dist" =>
        if (orderKeys.isEmpty)
          throw new GraftConfigError(s"window.rank '$fn' requires order_by")
        val (gRun, total) = groupedPrefix(df, orderKeys, sortCols, Seq.empty)
        val value: Column = fn match {
          case "rank"         => (F.col("_rows_before") + 1).cast(IntegerType)
          case "dense_rank"   => F.col("_dense").cast(IntegerType)
          case "percent_rank" =>
            if (total <= 1) F.lit(0.0)
            else F.col("_rows_before").cast(DoubleType) / (total - 1).toDouble
          case "cume_dist"    =>
            (F.col("_rows_before") + F.col("_grp_n")).cast(DoubleType) / total.toDouble
        }
        joinBack(df, gRun, orderKeys, Seq(out -> value))
      case "sum" | "count" | "min" | "max" if orderKeys.nonEmpty =>
        val spec = aggSpec(fn, if (fn == "count") "" else cfg.str("column"))
        val (gRun, _) = groupedPrefix(df, orderKeys, sortCols, Seq(spec))
        joinBack(df, gRun, orderKeys, Seq(out -> F.col(s"_run_${spec.tmp}")))
      case "avg" if orderKeys.nonEmpty =>
        val runs = Seq(
          RunSpec("_s", F.sum(F.col(cfg.str("column")).cast(DoubleType)), plus),
          RunSpec("_c", F.count(F.col(cfg.str("column"))), plus))
        val (gRun, _) = groupedPrefix(df, orderKeys, sortCols, runs)
        joinBack(df, gRun, orderKeys,
          Seq(out -> F.col("_run__s") / F.col("_run__c")))
      case "sum" | "count" | "min" | "max" | "avg" =>
        // no ordering → frame is the whole input: one global aggregate,
        // broadcast back (Spark's unbounded-frame semantics)
        val c = if (fn == "count") F.count(F.lit(1)) else AggOps.agg(fn, cfg.str("column"))
        df.crossJoin(F.broadcast(df.agg(c.alias(out))))
      case other => throw new GraftConfigError(s"unknown window function '$other'")
    }
  }
}
