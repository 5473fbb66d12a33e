package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._
import graft.config._
import graft.core._

/** filter.apply — single-column row predicate.
  * Semantics per reference src/modules/transforms/filter.rs:88-216:
  * operators `== = != <> > >= < <=` with typed literal, `contains`
  * (substring on string col), `in` (membership over array of values).
  * Compiles to a Column predicate → Catalyst pushes it into the scan.
  */
object FilterOp extends Stage {
  val name = "filter.apply"
  val kind = StageKind.Transform

  def lit(v: CVal): Column = v match {
    case CStr(s)    => F.lit(s)
    case CLong(l)   => F.lit(l)
    case CDouble(d) => F.lit(d)
    case CBool(b)   => F.lit(b)
    case other => throw new GraftConfigError(s"filter value must be scalar, got ${other.render}")
  }

  def predicate(cfg: Cfg): Column = {
    val c = F.col(cfg.str("column"))
    val op = cfg.strOr("operator", "==")
    op match {
      case "==" | "=" => c === lit(cfg.scalar("value"))
      case "!=" | "<>" => c =!= lit(cfg.scalar("value"))
      case ">"  => c > lit(cfg.scalar("value"))
      case ">=" => c >= lit(cfg.scalar("value"))
      case "<"  => c < lit(cfg.scalar("value"))
      case "<=" => c <= lit(cfg.scalar("value"))
      case "contains" => c.contains(cfg.str("value"))
      case "in" =>
        val vs = cfg.arrOpt("value").getOrElse(
          throw new GraftConfigError("filter 'in' requires an array value"))
        c.isin(vs.map {
          case CStr(s) => s: Any
          case CLong(l) => l: Any
          case CDouble(d) => d: Any
          case CBool(b) => b: Any
          case other => throw new GraftConfigError(s"unsupported in-list element ${other.render}")
        }: _*)
      case other => throw new GraftConfigError(s"unknown filter operator '$other'")
    }
  }

  def apply(ctx: StageContext): DataFrame = ctx.primary.filter(predicate(ctx.cfg))
}

/** select.apply — column projection preserving requested order
  * (reference src/modules/transforms/select.rs:52-81). Projection reaches
  * the parquet scan as ReadSchema pruning.
  */
object SelectOp extends Stage {
  val name = "select.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val cols = ctx.cfg.strList("columns")
    ctx.primary.select(cols.map(F.col): _*)
  }
}

/** map.apply — derived column from a micro-expression.
  * Behavior-compatible with the reference's naive parser
  * (src/modules/transforms/map.rs:105-244): exactly one binary op of
  * `* + - /` between `col op numericLiteral` (col/col allowed for `/` only),
  * else constants true/false, quoted string, numeric literal, or column copy.
  * First matching operator wins in order `* + - /`. We additionally accept a
  * `sql` key as an expr() passthrough (capability extension).
  */
object MapOp extends Stage {
  val name = "map.apply"
  val kind = StageKind.Transform

  def compile(df: DataFrame, expression: String): Column = {
    val e = expression.trim
    def isNum(s: String) = s.nonEmpty && s.matches("-?\\d+(\\.\\d+)?")
    def hasCol(s: String) = df.columns.contains(s)
    // first matching operator, reference order: * + - /
    val ops: Seq[(String, (Column, Column) => Column)] = Seq(
      ("*", _ * _), ("+", _ + _), ("-", _ - _), ("/", _ / _))
    val binary = ops.collectFirst {
      case (sym, f) if e.contains(sym) && e.split(java.util.regex.Pattern.quote(sym), -1).length == 2 =>
        val Array(l, r) = e.split(java.util.regex.Pattern.quote(sym), -1).map(_.trim)
        (sym, f, l, r)
    }
    binary match {
      case Some((sym, f, l, r)) if hasCol(l) && isNum(r) =>
        // reference casts col to Float64 first for numeric ops (map.rs:170-186)
        f(F.col(l).cast(DoubleType), F.lit(r.toDouble))
      case Some(("/", f, l, r)) if hasCol(l) && hasCol(r) =>
        f(F.col(l).cast(DoubleType), F.col(r).cast(DoubleType))
      case _ =>
        if (e == "true") F.lit(true)
        else if (e == "false") F.lit(false)
        else if (e.length >= 2 && ((e.head == '"' && e.last == '"') || (e.head == '\'' && e.last == '\'')))
          F.lit(e.substring(1, e.length - 1))
        else if (isNum(e)) { if (e.contains('.')) F.lit(e.toDouble) else F.lit(e.toLong) }
        else if (hasCol(e)) F.col(e)
        else throw new GraftConfigError(s"map.apply cannot compile expression '$expression'")
    }
  }

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val out = ctx.cfg.str("output_column")
    val col = ctx.cfg.strOpt("sql") match {
      case Some(sql) => F.expr(sql) // extension: full Spark SQL expression
      case None      => compile(df, ctx.cfg.str("expression"))
    }
    df.withColumn(out, col)
  }
}

/** Shared aggregation-expression builder for groupby.apply / reduce.apply.
  * Op set per reference src/modules/transforms/group_by.rs:118-151:
  * sum, avg/mean, count, min, max, median, std, var, first, last —
  * std/var are sample (ddof=1, Polars default), median is exact
  * (percentile, not approx) for oracle parity.
  */
object AggOps {
  def agg(op: String, column: String): Column = agg(op, column, Cfg.empty)

  /** Full builder: `a` is the aggregation's own config table, so sketch
    * ops can carry parameters (rsd, p, accuracy). Sketch aggregates are
    * the 100 TB answer to distinct-count/percentile: HLL++ and KLL-style
    * summaries merge associatively in the partial-agg step, so the shuffle
    * carries a fixed-size sketch per group instead of the value set.
    */
  def agg(op: String, column: String, a: Cfg): Column = op match {
    case "sum"          => F.sum(column)
    case "avg" | "mean" => F.avg(column)
    case "count"        => F.count(F.col(column))
    case "min"          => F.min(column)
    case "max"          => F.max(column)
    case "median"       => F.median(F.col(column))
    case "std"          => F.stddev_samp(column)
    case "var"          => F.var_samp(column)
    case "first"        => F.first(F.col(column), ignoreNulls = false)
    case "last"         => F.last(F.col(column), ignoreNulls = false)
    case "count_distinct" => F.count_distinct(F.col(column))
    case "approx_count_distinct" =>
      F.approx_count_distinct(F.col(column), a.doubleOr("rsd", 0.05))
    case "percentile_approx" =>
      F.percentile_approx(F.col(column), F.lit(a.doubleOr("p", 0.5)),
        F.lit(a.longOr("accuracy", 10000L).toInt))
    case "collect_set"  => F.collect_set(column)
    case other => throw new GraftConfigError(s"unknown aggregation '$other'")
  }
}

/** groupby.apply — GROUP BY with multiple named aggregations
  * (reference src/modules/transforms/group_by.rs:87-170). Pure
  * declarative groupBy/agg: Spark does map-side partial aggregation and
  * hash-based final agg; the shuffle is on the grouping keys only.
  */
object GroupByOp extends Stage {
  val name = "groupby.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val keys = ctx.cfg.strList("by")
    val aggs = ctx.cfg.tblArr("aggregations").map { a =>
      val col = a.str("column")
      val op  = a.str("operation")
      val out = a.strOr("output_column", col)
      AggOps.agg(op, col, a).alias(out)
    }
    if (aggs.isEmpty) throw new GraftConfigError("groupby.apply requires at least one aggregation")
    ctx.primary.groupBy(keys.map(F.col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

/** reduce.apply — whole-table aggregate → 1 row, 1 column
  * (reference src/modules/transforms/reduce.rs:91-136). Global aggregate:
  * partials per partition, single-row combine — no wide shuffle.
  */
object ReduceOp extends Stage {
  val name = "reduce.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.str("column")
    val op  = ctx.cfg.str("operation")
    val out = ctx.cfg.strOr("output_column", "result")
    ctx.primary.agg(AggOps.agg(op, col, ctx.cfg).alias(out))
  }
}

/** sort.apply — multi-column sort with per-column direction and a single
  * nulls_last flag (reference src/modules/transforms/sort.rs:78-136; Polars
  * default = nulls first). Spark range-partitions on the sort keys
  * (sampled boundaries) — a total sort scales out; no single-partition trap.
  */
object SortOp extends Stage {
  val name = "sort.apply"
  val kind = StageKind.Transform
  def sortCols(cfg: Cfg): Seq[Column] = {
    val keys = cfg.strList("by")
    val desc: Vector[Boolean] = cfg.get("descending") match {
      case Some(CBool(b))  => Vector.fill(keys.size)(b)
      case Some(CArr(vs))  => vs.map { case CBool(b) => b; case o => throw new GraftConfigError(s"descending: expected bool, got ${o.render}") }
      case None            => Vector.fill(keys.size)(false)
      case Some(o)         => throw new GraftConfigError(s"descending: expected bool or array, got ${o.render}")
    }
    val nullsLast = cfg.boolOr("nulls_last", false)
    keys.zipWithIndex.map { case (k, i) =>
      val d = if (i < desc.size) desc(i) else desc.lastOption.getOrElse(false)
      (d, nullsLast) match {
        case (false, false) => F.col(k).asc_nulls_first   // reference default
        case (false, true)  => F.col(k).asc_nulls_last
        case (true, false)  => F.col(k).desc_nulls_first
        case (true, true)   => F.col(k).desc_nulls_last
      }
    }
  }
  def apply(ctx: StageContext): DataFrame = ctx.primary.orderBy(sortCols(ctx.cfg): _*)
}

/** distinct.apply — dedup on all columns or a subset with survivor policy
  * `keep` ∈ first|last|none|any (reference src/modules/transforms/
  * distinct.rs:74-121; `none` drops every row that has any duplicate).
  *
  * Determinism note (SURVEY §7.3): the reference's first/last are defined by
  * single-process arrival order. Spark has no global row order, so
  * first/last take an `order_by` column list (required for deterministic
  * results; defaults to the frame's natural file order via
  * monotonically_increasing_id, documented caveat at scale).
  * All strategies are window-function based → one hash shuffle on the
  * subset keys, no global sort.
  */
object DistinctOp extends Stage {
  val name = "distinct.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = ctx.primary
    val subset = ctx.cfg.strListOr("columns", Vector.empty)
    val keep = ctx.cfg.strOr("keep", "first")
    if (subset.isEmpty) {
      keep match {
        case "none" =>
          val w = Window.partitionBy(df.columns.map(F.col): _*)
          df.withColumn("_cnt", F.count(F.lit(1)).over(w))
            .filter(F.col("_cnt") === 1).drop("_cnt")
        case _ => df.distinct()
      }
    } else {
      val part = Window.partitionBy(subset.map(F.col): _*)
      keep match {
        case "any" => df.dropDuplicates(subset)
        case "none" =>
          df.withColumn("_cnt", F.count(F.lit(1)).over(part))
            .filter(F.col("_cnt") === 1).drop("_cnt")
        case "first" | "last" =>
          val orderCols: Seq[Column] = ctx.cfg.strListOr("order_by", Vector.empty) match {
            case Vector() => Seq(F.monotonically_increasing_id())
            case cols     => cols.map(F.col)
          }
          val ordered = if (keep == "last") orderCols.map(_.desc) else orderCols
          val w = part.orderBy(ordered: _*)
          df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") === 1).drop("_rn")
        case other => throw new GraftConfigError(s"unknown keep mode '$other'")
      }
    }
  }
}

/** chunk.apply — group rows into fixed-size batches; one row per chunk with
  * an array-of-structs column (reference src/modules/transforms/
  * chunk.rs:62-126; batch_size 1–10000, output col default "records").
  *
  * Scale design: exact fixed-size chunking needs a global row index. We use
  * sortWithinPartitions+zipWithIndex (distributed two-pass: count per
  * partition, then offset) rather than a single-partition window — at 100 TB
  * a row_number() over an empty window would serialize the world. Ordering
  * comes from `order_by` (recommended) or file order.
  */
object ChunkOp extends Stage {
  val name = "chunk.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val n = ctx.cfg.longOr("batch_size", 100L)
    if (n < 1 || n > 10000) throw new GraftConfigError(s"batch_size must be in 1..10000, got $n")
    val out = ctx.cfg.strOr("output_column", "records")
    val orderBy = ctx.cfg.strListOr("order_by", Vector.empty)
    val indexed = Indexing.withGlobalIndex(df, orderBy, "_idx")
    val rowStruct = F.struct(df.columns.map(F.col): _*)
    indexed
      .withColumn("_chunk_id", (F.col("_idx") / F.lit(n)).cast(LongType))
      .groupBy("_chunk_id")
      .agg(F.sort_array(F.collect_list(F.struct(F.col("_idx"), rowStruct.alias("_row")))).alias("_sorted"))
      .select(
        F.col("_chunk_id").alias("chunk_id"),
        F.transform(F.col("_sorted"), x => x.getField("_row")).alias(out))
  }
}

/** Global, order-respecting row indexing without a single-partition window.
  * orderBy(...) range-partitions; zipWithIndex then assigns contiguous ids
  * with one tiny job to count partition sizes. Used by chunk.apply and
  * count-based windows (reference's arrival-order semantics, SURVEY §4.2.4).
  */
object Indexing {
  def withGlobalIndex(df: DataFrame, orderBy: Seq[String], idxCol: String): DataFrame = {
    val ordered = if (orderBy.nonEmpty) df.orderBy(orderBy.map(F.col): _*) else df
    val spark = df.sparkSession
    val schema = StructType(ordered.schema.fields :+ StructField(idxCol, LongType, nullable = false))
    val rdd = ordered.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(rdd, schema)
  }
}

/** json.extract — parse a string column as JSON, navigate a dot-path, emit
  * the value as STRING (numbers/bools stringified, null on miss) —
  * reference src/modules/transforms/json_extract.rs:69-149. Maps exactly to
  * get_json_object, which is codegen'd and needs no UDF.
  */
object JsonExtractOp extends Stage {
  val name = "json.extract"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.str("column")
    val path = ctx.cfg.str("path")
    val out = ctx.cfg.str("output_column")
    val jsonPath = "$." + path
    ctx.primary.withColumn(out, F.get_json_object(F.col(col), jsonPath))
  }
}

/** validate.schema — assert-style data-quality gate; passes input through
  * unchanged or fails the pipeline (reference src/modules/transforms/
  * validate.rs:99-246): required columns, dtypes, non-null, date-typed,
  * unique. One aggregate pass computes all row-level checks.
  */
object ValidateOp extends Stage {
  val name = "validate.schema"
  val kind = StageKind.Transform

  private val typeNames: Map[String, DataType => Boolean] = Map(
    "string"   -> (_ == StringType),
    "int"      -> (t => t == IntegerType || t == LongType || t == ShortType || t == ByteType),
    "float"    -> (t => t == DoubleType || t == FloatType),
    "bool"     -> (_ == BooleanType),
    "date"     -> (t => t == DateType || t == TimestampType),
    "datetime" -> (_ == TimestampType)
  )

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    val schema = df.schema
    def field(c: String): Option[StructField] = schema.fields.find(_.name == c)

    val required = cfg.strListOr("required_fields", Vector.empty)
    required.foreach { c => if (field(c).isEmpty) errs += s"missing required field '$c'" }

    cfg.tblOpt("field_types").foreach { ft =>
      ft.table.foreach { case (c, tv) =>
        val want = tv match { case CStr(s) => s; case o => throw new GraftConfigError(s"field_types.$c: ${o.render}") }
        val check = typeNames.getOrElse(want,
          throw new GraftConfigError(s"unknown type '$want' (string|int|float|bool|date|datetime)"))
        field(c) match {
          case None => errs += s"field_types: column '$c' not present"
          case Some(f) => if (!check(f.dataType)) errs += s"column '$c' has type ${f.dataType.simpleString}, expected $want"
        }
      }
    }
    cfg.strListOr("date_fields", Vector.empty).foreach { c =>
      field(c) match {
        case None => errs += s"date_fields: column '$c' not present"
        case Some(f) => if (f.dataType != DateType && f.dataType != TimestampType)
          errs += s"column '$c' is not date-typed (${f.dataType.simpleString})"
      }
    }

    // row-level checks: single aggregate pass
    val nonNull = cfg.strListOr("non_nullable", Vector.empty).filter(c => field(c).isDefined)
    val unique  = cfg.strListOr("unique_fields", Vector.empty).filter(c => field(c).isDefined)
    cfg.strListOr("non_nullable", Vector.empty).foreach { c => if (field(c).isEmpty) errs += s"non_nullable: column '$c' not present" }
    cfg.strListOr("unique_fields", Vector.empty).foreach { c => if (field(c).isEmpty) errs += s"unique_fields: column '$c' not present" }

    if (nonNull.nonEmpty || unique.nonEmpty) {
      val aggs: Seq[Column] =
        Seq(F.count(F.lit(1)).alias("_total")) ++
        nonNull.map(c => F.count(F.when(F.col(c).isNull, F.lit(1))).alias(s"_null_$c")) ++
        unique.map(c => F.countDistinct(F.col(c)).alias(s"_uniq_$c")) ++
        unique.map(c => F.count(F.when(F.col(c).isNull, F.lit(1))).alias(s"_unull_$c"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val total = row.getAs[Long]("_total")
      nonNull.foreach { c =>
        val nulls = row.getAs[Long](s"_null_$c")
        if (nulls > 0) errs += s"column '$c' has $nulls null values"
      }
      unique.foreach { c =>
        // countDistinct ignores nulls; reference n_unique counts null as a value
        val uq = row.getAs[Long](s"_uniq_$c") + (if (row.getAs[Long](s"_unull_$c") > 0) 1 else 0)
        if (uq != total) errs += s"column '$c' is not unique ($uq distinct of $total rows)"
      }
    }

    if (errs.nonEmpty)
      throw new GraftValidationError("validation failed:\n  " + errs.mkString("\n  "))
    df
  }
}

/** limit.apply — top-N / LIMIT as a standalone op (absent in the reference
  * except stdout's `limit` — SURVEY §2.8; a needed primitive at scale).
  * With `by` keys this is a total-order top-K: Spark's TakeOrderedAndProject
  * computes per-partition top-K then merges K·P rows — no full sort.
  */
object LimitOp extends Stage {
  val name = "limit.apply"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    val n = ctx.cfg.long("n").toInt
    val df = ctx.primary
    ctx.cfg.strListOr("by", Vector.empty) match {
      case Vector() => df.limit(n)
      case _        => SortOp(StageContext(ctx.spark, ctx.inputs, ctx.cfg, ctx.stageId)).limit(n)
    }
  }
}

/** profile.apply — one-pass column profiling: the reporting companion to
  * validate.schema's assertions. Output is one row per profiled column:
  * `column, dtype, n_rows, n_nonnull, n_distinct, min_value, max_value`
  * (min/max rendered as strings so the schema is column-type-agnostic).
  *
  * ONE aggregation job covers every column (4 aggregate buffers per
  * column in a single pass). Scale-safe DEFAULTS: `distinct = "approx"`
  * (HLL++ sketches — fixed-size mergeable state; `rsd` tunes the error)
  * and `quantiles` via percentile_approx (bounded GK sketch per column;
  * `quantiles_accuracy` tunes it). The exact paths stay available where
  * the report feeds a correctness decision — `distinct = "exact"` plans
  * one Expand ×(N+1) over the input, `quantiles_exact = true` buffers
  * every value of each numeric column in one aggregation buffer — both
  * are the wrong default at 100 TB, so both are opt-in. The single agg
  * row is unpivoted driver-free via one generator projection.
  */
object ProfileOp extends Stage {
  val name = "profile.apply"
  val kind = StageKind.Transform

  /** `0.5 → q50`, `0.125 → q12_5` — keep the full value so nearby
    * quantiles cannot collide into one duplicate column name. */
  private[graft] def quantileName(q: Double): String =
    "q" + (BigDecimal(q.toString) * 100).underlying.stripTrailingZeros
      .toPlainString.replace("-", "m").replace(".", "_")

  private def quote(c: String): String = "`" + c.replace("`", "``") + "`"

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    val cols = cfg.strListOr("columns", df.columns.toVector)
    cols.find(c => !df.columns.contains(c)).foreach(c =>
      throw new GraftPlanError(s"profile.apply: column '$c' not found; available: ${df.columns.mkString(", ")}"))
    val distinctOf: String => Column = cfg.strOr("distinct", "approx") match {
      case "exact"  => c => F.count_distinct(F.col(c))
      case "approx" => c => F.approx_count_distinct(c, cfg.doubleOr("rsd", 0.05))
      case "none"   => _ => F.lit(null).cast("long")
      case other => throw new GraftConfigError(
        s"profile.apply distinct must be exact|approx|none, got '$other'")
    }
    val quantiles = cfg.arrOpt("quantiles").map(_.map {
      case CDouble(v) => v
      case CLong(v)   => v.toDouble
      case other => throw new GraftConfigError(s"quantiles must be numbers, got ${other.render}")
    }).getOrElse(Vector.empty)
    quantiles.find(q => q < 0 || q > 1).foreach(q =>
      throw new GraftConfigError(s"quantiles must be in [0, 1], got $q"))
    val quantilesExact = cfg.boolOr("quantiles_exact", false)
    val qAccuracy = cfg.longOr("quantiles_accuracy", 10000L)
    val numeric = df.schema.fields.map(f => f.name ->
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toMap

    def quantileAgg(c: String): Column = {
      val arr = s"array(${quantiles.mkString(", ")})"
      if (quantilesExact) F.expr(s"percentile(${quote(c)}, $arr)")
      else F.expr(s"cast(percentile_approx(${quote(c)}, $arr, $qAccuracy) as array<double>)")
    }
    val aggs = F.count(F.lit(1)).alias("__n") +: cols.flatMap { c => Seq(
      F.count(F.col(c)).alias(s"__nn_$c"),
      distinctOf(c).alias(s"__nd_$c"),
      F.min(F.col(c)).cast("string").alias(s"__min_$c"),
      F.max(F.col(c)).cast("string").alias(s"__max_$c")) ++
      (if (quantiles.nonEmpty && numeric(c)) Seq(quantileAgg(c).alias(s"__q_$c"))
      else Seq.empty)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    // unpivot the single agg row: one struct per column → explode
    val rows = F.explode(F.array(cols.map { c =>
      val base = Seq(
        F.lit(c).alias("column"),
        F.lit(dtypes(c)).alias("dtype"),
        F.col("__n").alias("n_rows"),
        F.col(s"__nn_$c").alias("n_nonnull"),
        F.col(s"__nd_$c").cast("long").alias("n_distinct"),
        F.col(s"__min_$c").alias("min_value"),
        F.col(s"__max_$c").alias("max_value"))
      val qs = quantiles.zipWithIndex.map { case (q, i) =>
        (if (numeric(c)) F.col(s"__q_$c").getItem(i) else F.lit(null).cast("double"))
          .alias(quantileName(q))
      }
      F.struct(base ++ qs: _*)
    }: _*))
    one.select(rows.alias("__p")).select("__p.*")
  }
}

/** explode.apply — one row per element of an array (or per entry of a
  * map) column: the generator step a TOML pipeline cannot otherwise
  * express (`map.apply sql` is a projection — Spark generators must be
  * planned in a select, not a withColumn). `column` may be any SQL
  * expression ("split(text, ' ')" works), `into` names the element
  * column (default = the source column name), `outer = true` keeps rows
  * whose array is null/empty (null element), `position_column` adds the
  * element index. Pure Generate node — zero shuffle.
  */
object ExplodeOp extends Stage {
  val name = "explode.apply"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    val colExpr = cfg.str("column")
    val into = cfg.strOr("into", if (df.columns.contains(colExpr)) colExpr else "value")
    val outer = cfg.boolOr("outer", false)
    val src = F.expr(colExpr)
    val others = df.columns.filterNot(_ == into).map(F.col).toSeq
    cfg.strOpt("position_column") match {
      case Some(pos) =>
        val gen = if (outer) F.posexplode_outer(src) else F.posexplode(src)
        df.select(others :+ gen.as(Seq(pos, into)): _*)
      case None =>
        val gen = if (outer) F.explode_outer(src) else F.explode(src)
        df.select(others :+ gen.alias(into): _*)
    }
  }
}
