package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.config._
import graft.core._
import graft.operators.Indexing

/** window.apply (batch parity) — COUNT-based windows over an ordered frame,
  * reproducing the reference's record-count windows
  * (reference src/core/streaming.rs:100-133 + src/modules/transforms/
  * window.rs:169-217): tumbling{size} chunks of N records; sliding{size,
  * slide} hops of `slide` emitting `size`-record windows; session{gap} —
  * which the reference declares but leaves as TODO (sliding actually emits
  * tumbling-of-slide, session is passthrough; streaming.rs:113-133). We
  * implement the DECLARED semantics (fixing the reference's TODOs).
  *
  * Output: input columns + `window_id` (long). Sliding duplicates rows into
  * every window that covers them (one row per (row, window) pair).
  *
  * Ordering comes from `order_by` (defaults to arrival/file order —
  * deterministic only with an explicit key list; SURVEY §7.3). Index
  * assignment is the distributed two-pass zipWithIndex, not a global
  * window function, so it scales.
  *
  * With `group_by` keys the windows are PER KEY (each key counts its own
  * records) and two more modes open up:
  *  - batch: plain partitioned window functions — one shuffle on the keys.
  *  - TRUE STREAMING input: a transformWithState processor keeps each
  *    key's running count (or last-gap/session-id) across micro-batches —
  *    the reference's record-count semantics, distributed by key. An
  *    EMPTY group_by on a stream runs keyless: one implicit key = one
  *    stateful task (see streamingKeyed's ordering caveat).
  *
  * Time-based windows (the Spark-native upgrade) live in TimeWindowOp.
  */
object CountWindowOp extends Stage {
  val name = "window.apply"
  val kind = StageKind.Transform

  /** The session-gap value as seconds-double. TIMESTAMP_NTZ has no direct
    * DOUBLE cast in Spark 4 (analysis error), so route it through
    * TimestampType first — the session timezone is applied consistently
    * on both lag sides, so gap DIFFERENCES are unaffected. */
  private def gapValue(df: DataFrame, tsCol: String): org.apache.spark.sql.Column =
    df.schema.find(_.name == tsCol).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        F.col(tsCol).cast("timestamp").cast("double")
      case _ => F.col(tsCol).cast("double")
    }

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val typ = cfg.strOr("type", "tumbling")
    val orderBy = cfg.strListOr("order_by", Vector.empty)
    val groupBy = cfg.strListOr("group_by", Vector.empty)
    if (ctx.primary.isStreaming) return streamingKeyed(ctx, typ, groupBy)
    if (groupBy.nonEmpty) return batchKeyed(ctx, typ, groupBy, orderBy)
    val indexed = Indexing.withGlobalIndex(ctx.primary, orderBy, "_idx")
    typ match {
      case "tumbling" =>
        val size = cfg.long("size")
        indexed.withColumn("window_id", (F.col("_idx") / F.lit(size)).cast(LongType)).drop("_idx")
      case "sliding" =>
        val size = cfg.long("size")
        val slide = cfg.longOr("slide", size)
        // row i belongs to window w iff w*slide <= i < w*slide + size
        // → w in [ceil((i-size+1)/slide), floor(i/slide)], clipped at 0.
        // With slide > size, rows in inter-window gaps have lo > hi and
        // belong to NO window — sequence(lo, hi) would count DOWN and
        // invent windows, so guard with a when (explode of NULL drops the
        // row, matching the streaming per-key path's empty `lo to hi`).
        val i = F.col("_idx")
        val lo = F.greatest(F.lit(0L), F.ceil((i - size + 1).cast("double") / slide).cast(LongType))
        val hi = F.floor(i.cast("double") / slide).cast(LongType)
        indexed
          .withColumn("window_id", F.explode(F.when(lo <= hi, F.sequence(lo, hi))))
          .drop("_idx")
      case "session" =>
        // count-based session: a new session starts when the gap column
        // (numeric/timestamp seconds) jumps by more than `gap`. The running
        // session id is a global prefix sum — computed DISTRIBUTED with the
        // same two-pass shape as zipWithIndex (per-partition boundary stats
        // to the driver, broadcast prefix offsets back), never a
        // single-partition window.
        val gap = cfg.doubleOr("gap", 300.0)
        val tsCol = cfg.strOpt("gap_column").orElse(orderBy.headOption).getOrElse(
          throw new GraftConfigError("session window requires order_by or gap_column"))
        val prepared = indexed.withColumn("_gapv", gapValue(indexed, tsCol))
        val outSchema = StructType(ctx.primary.schema.fields :+
          StructField("window_id", LongType, nullable = false))
        graft.operators.TwoPass(prepared, outSchema) { it =>
          // pass 1: per partition — first/last gap value + internal starts
          var first: Option[Double] = None; var last = 0.0
          var starts = 0L; var n = 0L; var prev: Option[Double] = None
          it.foreach { r =>
            val v = r.getAs[Double]("_gapv")
            if (first.isEmpty) first = Some(v)
            prev.foreach(pv => if (v - pv > gap) starts += 1)
            prev = Some(v); last = v; n += 1
          }
          (first, last, starts, n)
        } { stats =>
          var cur = 0L; var prevLast: Option[Double] = None
          stats.map { case (first, last, starts, n) =>
            val boundary = (prevLast, first) match {
              case (Some(pl), Some(f)) if f - pl > gap => 1L
              case _ => 0L
            }
            cur += boundary
            val off = cur
            cur += starts
            if (n > 0) prevLast = Some(last)
            off
          }
        } { (off, it) =>
          // pass 2: assign ids with the partition's prefix offset
          var sid = off
          var prev: Option[Double] = None
          it.map { r =>
            val v = r.getAs[Double]("_gapv")
            prev.foreach(pv => if (v - pv > gap) sid += 1)
            prev = Some(v)
            org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(2) :+ sid)
          }
        }
      case other => throw new GraftConfigError(s"unknown window type '$other'")
    }
  }

  /** Batch + group_by: per-key count windows via partitioned window
    * functions — one hash shuffle on the keys, sort within partitions. */
  private def batchKeyed(ctx: StageContext, typ: String,
      groupBy: Seq[String], orderBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cfg = ctx.cfg
    val part = Window.partitionBy(groupBy.map(F.col): _*)
    val order = (if (orderBy.nonEmpty) orderBy else groupBy).map(F.col(_).asc)
    val w = part.orderBy(order: _*)
    val rn = F.row_number().over(w).cast(LongType) - 1
    typ match {
      case "tumbling" =>
        val size = cfg.long("size")
        ctx.primary.withColumn("window_id", (rn / size).cast(LongType))
      case "sliding" =>
        val size = cfg.long("size")
        val slide = cfg.longOr("slide", size)
        // the window expression must land in its own projection: Spark
        // refuses a generator whose operand embeds a window function
        val i = F.col("_rn")
        val lo = F.greatest(F.lit(0L), F.ceil((i - size + 1).cast("double") / slide).cast(LongType))
        val hi = F.floor(i.cast("double") / slide).cast(LongType)
        // lo > hi (gap rows when slide > size) → NULL → explode drops the
        // row, never a descending sequence inventing windows
        ctx.primary.withColumn("_rn", rn)
          .withColumn("window_id", F.explode(F.when(lo <= hi, F.sequence(lo, hi))))
          .drop("_rn")
      case "session" =>
        val gap = cfg.doubleOr("gap", 300.0)
        val tsCol = cfg.strOpt("gap_column").orElse(orderBy.headOption).getOrElse(
          throw new GraftConfigError("session window requires order_by or gap_column"))
        val gv = gapValue(ctx.primary, tsCol)
        val flag = F.when(F.lag(gv, 1).over(w).isNotNull &&
          gv - F.lag(gv, 1).over(w) > gap, 1L).otherwise(0L)
        ctx.primary
          .withColumn("_flag", flag)
          .withColumn("window_id",
            F.sum(F.col("_flag")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .drop("_flag")
      case other => throw new GraftConfigError(s"unknown window type '$other'")
    }
  }

  /** Streaming + group_by: transformWithState keeps each key's running
    * record count (tumbling/sliding) or (last gap value, session id)
    * across micro-batches. Rows within a key are processed in micro-batch
    * arrival order — the reference's record-count semantics per key.
    *
    * KEYLESS streaming (empty group_by): all rows funnel through ONE
    * implicit key — a single stateful task, which is what a global
    * record-count window inherently is (the reference's single-threaded
    * window buffer has exactly this shape, streaming.rs:100-133). Ordering
    * caveat, documented: rows within a micro-batch arrive in partition
    * order, which is not deterministic across a distributed source —
    * declare `order_by` to sort each micro-batch before numbering
    * (deterministic when the trigger composition is, e.g. a kafka.stream
    * backlog under max_files_per_trigger); ACROSS batches the running
    * count follows batch arrival order, which checkpoints make replayable.
    * The single task is a throughput bottleneck by construction — keyed or
    * time windows are the scale path; keyless exists for parity with the
    * reference's global windows. */
  private def streamingKeyed(ctx: StageContext, typ: String, groupBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState, TimerValues, StatefulProcessor}
    val cfg = ctx.cfg
    val df = ctx.primary
    val keyIdcs = groupBy.map(df.columns.indexOf(_)).toArray
    keyIdcs.zipWithIndex.foreach { case (i, j) =>
      if (i < 0) throw new GraftConfigError(s"window.apply: unknown group_by column '${groupBy(j)}'")
    }
    // per-micro-batch sort by order_by before numbering — keyless AND
    // per-key (rows within a key otherwise arrive in nondeterministic
    // partition order; an order_by the user declared must not be a no-op)
    val sortIdcs = cfg.strListOr("order_by", Vector.empty).map { c =>
      val i = df.columns.indexOf(c)
      if (i < 0) throw new GraftConfigError(s"window.apply: unknown order_by column '$c'")
      // the comparator below relies on the JVM value being Comparable —
      // true for the atomic scalar types below, false for binary (byte[]
      // is not Comparable) and for array/map/struct. Reject at plan time;
      // the alternative is a ClassCastException inside the stateful
      // processor mid-stream.
      import org.apache.spark.sql.types._
      df.schema(i).dataType match {
        case BooleanType | ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | StringType | DateType | TimestampType |
             TimestampNTZType | _: DecimalType => ()
        case BinaryType => throw new GraftConfigError(
          s"window.apply: order_by column '$c' is binary — byte arrays have no " +
          "total order here; hash or hex-encode the column first")
        case dt => throw new GraftConfigError(
          s"window.apply: order_by column '$c' has non-orderable type ${dt.simpleString} — " +
          "order_by requires an atomic, comparable type (string/numeric/timestamp/date/boolean)")
      }
      i
    }
    val batchOrder: Iterator[Row] => Iterator[Row] =
      if (sortIdcs.isEmpty) identity
      else { it =>
        val rowOrd: Ordering[Row] = new Ordering[Row] {
          def compare(a: Row, b: Row): Int = {
            var c = 0; var k = 0
            while (c == 0 && k < sortIdcs.length) {
              val i = sortIdcs(k)
              c = (a.isNullAt(i), b.isNullAt(i)) match {
                case (true, true)   => 0
                case (true, false)  => -1
                case (false, true)  => 1
                case _ => a.get(i).asInstanceOf[Comparable[Any]].compareTo(b.get(i))
              }
              k += 1
            }
            c
          }
        }
        it.toArray.sorted(rowOrd).iterator
      }

    val (prepared, gapIdx) = typ match {
      case "session" =>
        val tsCol = cfg.strOpt("gap_column").getOrElse(
          throw new GraftConfigError("streaming session window requires gap_column"))
        val p = df.withColumn("_gapv", gapValue(df, tsCol))
        (p, p.columns.length - 1)
      case _ => (df, -1)
    }
    val outSchema = StructType(df.schema.fields :+ StructField("window_id", LongType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // length-prefixed key encoding: unambiguous under any value content —
    // ("ab","c") differs from ("a","bc"), and a null key differs from the
    // string "null"
    val keyFn = (r: Row) => keyIdcs.map { i =>
      if (r.isNullAt(i)) "-" else { val s = String.valueOf(r.get(i)); s"${s.length}:$s" }
    }.mkString("|")

    val processor: StatefulProcessor[String, Row, Row] = typ match {
      case "tumbling" | "sliding" =>
        val size = cfg.long("size")
        val slide = if (typ == "sliding") cfg.longOr("slide", size) else size
        new StatefulProcessor[String, Row, Row] {
          @transient private var st: ValueState[Long] = _
          override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
            st = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
          override def handleInputRows(key: String, rows: Iterator[Row],
              tv: TimerValues): Iterator[Row] = {
            var n = if (st.exists()) st.get() else 0L
            val out = batchOrder(rows).flatMap { r =>
              val i = n; n += 1; st.update(n)
              val lo = math.max(0L, math.ceil((i - size + 1).toDouble / slide).toLong)
              val hi = math.floorDiv(i, slide)
              (lo to hi).iterator.map(wid => Row.fromSeq(r.toSeq :+ wid))
            }
            out
          }
        }
      case "session" =>
        val gap = cfg.doubleOr("gap", 300.0)
        new StatefulProcessor[String, Row, Row] {
          @transient private var st: ValueState[(Double, Long)] = _
          override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
            st = getHandle.getValueState[(Double, Long)]("s",
              Encoders.product[(Double, Long)], TTLConfig.NONE)
          override def handleInputRows(key: String, rows: Iterator[Row],
              tv: TimerValues): Iterator[Row] = {
            var state = Option(st.get())
            batchOrder(rows).map { r =>
              val v = r.getDouble(gapIdx)
              val sid = state match {
                case Some((prev, s)) => if (v - prev > gap) s + 1 else s
                case None            => 0L
              }
              state = Some((v, sid)); st.update((v, sid))
              Row.fromSeq(r.toSeq.dropRight(1) :+ sid)
            }
          }
        }
      case other => throw new GraftConfigError(s"unknown window type '$other'")
    }
    prepared.groupByKey(keyFn)(Encoders.STRING)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())(enc)
  }
}

/** aggregate.stream (batch parity) — per-window aggregation over the output
  * of window.apply (reference src/modules/transforms/aggregate_stream.rs:
  * 29-344: ops count/sum/avg/min/max, optional group_by keys, output column
  * named after the op). In batch mode with no window_id present it
  * aggregates the whole input (reference behavior for DataFrame inputs).
  */
object AggregateStreamOp extends Stage {
  val name = "aggregate.stream"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val op = cfg.str("operation")
    val groupBy = cfg.strListOr("group_by", Vector.empty) ++
      (if (df.columns.contains("window_id")) Seq("window_id") else Seq.empty)
    val out = cfg.strOr("output_column", op)
    val valueCol = cfg.strOpt("value_column")
    val agg = op match {
      case "count" => F.count(F.lit(1)).alias(out)
      case "sum" | "avg" | "min" | "max" =>
        val c = valueCol.getOrElse(throw new GraftConfigError(s"aggregate.stream '$op' requires value_column"))
        graft.operators.AggOps.agg(op, c).alias(out)
      case other => throw new GraftConfigError(s"unknown stream aggregation '$other'")
    }
    if (groupBy.isEmpty) df.agg(agg)
    else df.groupBy(groupBy.map(F.col): _*).agg(agg)
  }
}
