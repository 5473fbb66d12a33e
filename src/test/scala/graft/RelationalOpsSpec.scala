package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError, GraftValidationError}
import graft.core.StageContext
import graft.operators._

class RelationalOpsSpec extends SparkSpec {
  private def ctx(df: org.apache.spark.sql.DataFrame, kvs: (String, Any)*) =
    StageContext.one(spark, df, Cfg.of(kvs: _*))

  // ---- filter.apply (reference filter.rs:88-216 operator matrix) ----
  test("filter: comparison operators") {
    assert(FilterOp(ctx(salesDf, "column" -> "value", "operator" -> ">=", "value" -> 150))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(FilterOp(ctx(salesDf, "column" -> "value", "operator" -> "<", "value" -> 150))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(FilterOp(ctx(salesDf, "column" -> "name", "operator" -> "==", "value" -> "Bob"))
      .count() == 1)
    assert(FilterOp(ctx(salesDf, "column" -> "name", "operator" -> "<>", "value" -> "Bob"))
      .count() == 2)
  }

  test("filter: contains and in") {
    assert(FilterOp(ctx(salesDf, "column" -> "name", "operator" -> "contains", "value" -> "li"))
      .collect().map(_.getString(1)).sorted.toSeq == Seq("Alice", "Charlie"))
    assert(FilterOp(ctx(salesDf, "column" -> "name", "operator" -> "in",
      "value" -> Seq("Alice", "Bob", "Nobody"))).count() == 2)
  }

  test("filter: default operator is ==, unknown operator rejected") {
    assert(FilterOp(ctx(usersDf, "column" -> "status", "value" -> "active")).count() == 7)
    intercept[GraftConfigError](
      FilterOp(ctx(salesDf, "column" -> "value", "operator" -> "~~", "value" -> 1)))
  }

  // ---- select.apply ----
  test("select keeps requested order and subset") {
    val out = SelectOp(ctx(salesDf, "columns" -> Seq("value", "id")))
    assert(out.columns.toSeq == Seq("value", "id"))
  }

  test("select single string accepted") {
    assert(SelectOp(ctx(salesDf, "columns" -> "name")).columns.toSeq == Seq("name"))
  }

  // ---- map.apply (reference map.rs quirks) ----
  test("map: col op literal for * + - /") {
    val out = MapOp(ctx(salesDf, "expression" -> "value * 2", "output_column" -> "v2"))
      .select("v2").collect().map(_.getDouble(0)).sorted.toSeq
    assert(out == Seq(200.0, 300.0, 400.0))
    val plus = MapOp(ctx(salesDf, "expression" -> "value + 5", "output_column" -> "p"))
      .select("p").collect().map(_.getDouble(0)).sorted.toSeq
    assert(plus == Seq(105.0, 155.0, 205.0))
  }

  test("map: col / col division") {
    import spark.implicits._
    val df = Seq((10.0, 4.0)).toDF("a", "b")
    val out = MapOp(StageContext.one(spark, df, Cfg.of(
      "expression" -> "a / b", "output_column" -> "q")))
    assert(out.select("q").head().getDouble(0) == 2.5)
  }

  test("map: constants, strings, column copy; replaces existing column") {
    assert(MapOp(ctx(salesDf, "expression" -> "true", "output_column" -> "t"))
      .select("t").head().getBoolean(0))
    assert(MapOp(ctx(salesDf, "expression" -> "\"tag\"", "output_column" -> "s"))
      .select("s").head().getString(0) == "tag")
    assert(MapOp(ctx(salesDf, "expression" -> "7", "output_column" -> "n"))
      .select("n").head().getLong(0) == 7L)
    val copied = MapOp(ctx(salesDf, "expression" -> "value", "output_column" -> "value"))
    assert(copied.columns.count(_ == "value") == 1)
  }

  test("map: sql passthrough extension") {
    val out = MapOp(ctx(salesDf, "sql" -> "upper(name)", "output_column" -> "u"))
    assert(out.select("u").collect().map(_.getString(0)).toSet == Set("ALICE", "BOB", "CHARLIE"))
  }

  // ---- groupby.apply (reference group_by.rs op set; A4 fixture) ----
  test("groupby: multi-agg with aliases; median/std/var ddof=1") {
    val out = GroupByOp(ctx(employeesDf,
      "by" -> "department",
      "aggregations" -> Seq(
        Map("column" -> "salary", "operation" -> "avg", "output_column" -> "avg_salary"),
        Map("column" -> "employee_id", "operation" -> "count", "output_column" -> "employee_count"),
        Map("column" -> "salary", "operation" -> "median", "output_column" -> "med"),
        Map("column" -> "salary", "operation" -> "std", "output_column" -> "sd"),
        Map("column" -> "salary", "operation" -> "var", "output_column" -> "vr"))))
      .collect().map(r => r.getString(0) -> r).toMap
    val eng = out("eng")
    assert(eng.getAs[Double]("avg_salary") == 110.0)
    assert(eng.getAs[Long]("employee_count") == 3L)
    assert(eng.getAs[Double]("med") == 110.0)
    assert(math.abs(eng.getAs[Double]("sd") - 10.0) < 1e-9) // sample stddev
    assert(math.abs(eng.getAs[Double]("vr") - 100.0) < 1e-9) // sample var
  }

  test("groupby: first/last with deterministic single partition") {
    val out = GroupByOp(ctx(employeesDf.coalesce(1).orderBy("employee_id"),
      "by" -> "department",
      "aggregations" -> Seq(
        Map("column" -> "employee_id", "operation" -> "first", "output_column" -> "f"),
        Map("column" -> "employee_id", "operation" -> "last", "output_column" -> "l"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("eng") == (1L, 3L))
    assert(out("sales") == (4L, 5L))
  }

  test("groupby: default output column = input column name") {
    val out = GroupByOp(ctx(employeesDf, "by" -> "department",
      "aggregations" -> Seq(Map("column" -> "salary", "operation" -> "sum"))))
    assert(out.columns.toSeq == Seq("department", "salary"))
  }

  // ---- reduce.apply ----
  test("reduce: ops and default output column") {
    val out = ReduceOp(ctx(salesDf, "column" -> "value", "operation" -> "sum"))
    assert(out.columns.toSeq == Seq("result"))
    assert(out.head().getLong(0) == 450L)
    assert(ReduceOp(ctx(salesDf, "column" -> "value", "operation" -> "median", "output_column" -> "m"))
      .head().getDouble(0) == 150.0)
    assert(ReduceOp(ctx(salesDf, "column" -> "value", "operation" -> "count"))
      .head().getLong(0) == 3L)
  }

  // ---- sort.apply (reference nulls-first default) ----
  test("sort: multi-key with per-column direction; nulls first by default") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((3L, "c"), (null, "x"), (1L, "a"), (2L, "b"))
      .toDF("k", "v")
    val asc = SortOp(StageContext.one(spark, df, Cfg.of("by" -> "k")))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(asc == Seq(None, Some(1L), Some(2L), Some(3L)))
    val nl = SortOp(StageContext.one(spark, df, Cfg.of("by" -> "k", "nulls_last" -> true)))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(nl == Seq(Some(1L), Some(2L), Some(3L), None))
    val desc = SortOp(StageContext.one(spark, df, Cfg.of(
      "by" -> Seq("k"), "descending" -> Seq(true))))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(desc == Seq(None, Some(3L), Some(2L), Some(1L))) // nulls first kept
  }

  // ---- distinct.apply keep modes (reference distinct.rs:74-121) ----
  test("distinct: keep modes on subset") {
    import spark.implicits._
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("id", "k", "v")
    def ids(keep: String) = DistinctOp(StageContext.one(spark, df, Cfg.of(
      "columns" -> Seq("k"), "keep" -> keep, "order_by" -> Seq("id"))))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids("first") == Seq(1L, 3L))
    assert(ids("last") == Seq(2L, 3L))
    assert(ids("none") == Seq(3L))
    assert(DistinctOp(StageContext.one(spark, df, Cfg.of(
      "columns" -> Seq("k"), "keep" -> "any"))).count() == 2)
  }

  test("distinct: all columns") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("x", "y")
    assert(DistinctOp(StageContext.one(spark, df, Cfg.empty)).count() == 2)
    assert(DistinctOp(StageContext.one(spark, df, Cfg.of("keep" -> "none"))).count() == 1)
  }

  // ---- chunk.apply (reference chunk.rs:62-126) ----
  test("chunk: exact sizes, ordered content, array-of-structs shape") {
    import spark.implicits._
    val df = (1 to 25).map(i => (i.toLong, s"r$i")).toDF("id", "v").repartition(3)
    val out = ChunkOp(StageContext.one(spark, df, Cfg.of(
      "batch_size" -> 10, "order_by" -> Seq("id"))))
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    val sizes = out.map(_.getSeq[Any](1).size).toSeq
    assert(sizes == Seq(10, 10, 5))
    val firstChunk = out(0).getSeq[org.apache.spark.sql.Row](1)
    assert(firstChunk.map(_.getLong(0)) == (1L to 10L))
  }

  test("chunk: batch_size bounds enforced") {
    intercept[GraftConfigError](
      ChunkOp(ctx(salesDf, "batch_size" -> 0)))
    intercept[GraftConfigError](
      ChunkOp(ctx(salesDf, "batch_size" -> 20000)))
  }

  // ---- json.extract (A5 fixture, reference json_extract.rs) ----
  test("json.extract: nested path, stringified values, null on miss") {
    import spark.implicits._
    val df = Seq(
      """{"meta": {"req": {"headers": {"x-trace-id": "trace-123"}}}}""",
      """{"meta": {"req": {}}}""",
      """{"n": 42, "b": true, "o": {"k": 1}}""",
      "not json at all").toDF("line")
    def ext(path: String) = JsonExtractOp(StageContext.one(spark, df, Cfg.of(
      "column" -> "line", "path" -> path, "output_column" -> "out")))
      .select("out").collect().map(r => Option(r.getString(0))).toSeq
    assert(ext("meta.req.headers.x-trace-id") == Seq(Some("trace-123"), None, None, None))
    assert(ext("n") == Seq(None, None, Some("42"), None))
    assert(ext("b") == Seq(None, None, Some("true"), None))
    assert(ext("o") == Seq(None, None, Some("""{"k":1}"""), None))
  }

  // ---- validate.schema (reference validate.rs) ----
  test("validate: passes through valid frame; fails on violations") {
    val ok = ValidateOp(ctx(salesDf,
      "required_fields" -> Seq("id", "name", "value"),
      "field_types" -> Map("id" -> "int", "name" -> "string", "value" -> "int"),
      "non_nullable" -> Seq("id"),
      "unique_fields" -> Seq("id")))
    assert(ok.count() == 3)

    intercept[GraftValidationError](ValidateOp(ctx(salesDf, "required_fields" -> Seq("ghost"))))
    intercept[GraftValidationError](ValidateOp(ctx(salesDf, "field_types" -> Map("name" -> "int"))))
    import spark.implicits._
    val withNull = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b")).toDF("id", "v")
    intercept[GraftValidationError](ValidateOp(StageContext.one(spark, withNull,
      Cfg.of("non_nullable" -> Seq("id")))))
    val withDup = Seq((1L, "a"), (1L, "b")).toDF("id", "v")
    intercept[GraftValidationError](ValidateOp(StageContext.one(spark, withDup,
      Cfg.of("unique_fields" -> Seq("id")))))
  }

  // ---- limit.apply ----
  test("limit: plain and top-k") {
    assert(LimitOp(ctx(salesDf, "n" -> 2)).count() == 2)
    val top = LimitOp(ctx(salesDf, "n" -> 2, "by" -> Seq("value"), "descending" -> true))
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(2L, 3L)) // value 200, 150
  }

  // ---- profile.apply ----
  test("profile: one row per column with nulls/distinct/min/max") {
    import spark.implicits._
    val df = Seq((1L, "a", Some(2.5)), (2L, "b", None), (3L, "a", Some(-1.0)))
      .toDF("id", "k", "v")
    val got = ProfileOp(ctx(df)).orderBy("column")
      .as[(String, String, Long, Long, Long, String, String)].collect()
    assert(got === Array(
      ("id", "bigint", 3L, 3L, 3L, "1", "3"),
      ("k", "string", 3L, 3L, 2L, "a", "b"),
      ("v", "double", 3L, 2L, 2L, "-1.0", "2.5")))
    // column subset + distinct=none
    val sub = ProfileOp(ctx(df, "columns" -> Seq("k"), "distinct" -> "none")).head()
    assert(sub.getString(0) === "k" && sub.isNullAt(4))
    // approx mode returns a sane estimate; unknown column fails loud
    val approx = ProfileOp(ctx(df, "columns" -> Seq("id"), "distinct" -> "approx")).head()
    assert(approx.getLong(4) === 3L)
    intercept[graft.core.GraftPlanError](ProfileOp(ctx(df, "columns" -> Seq("nope"))))
    // ONE aggregation job: the plan has exactly one pair of agg exchanges
    val plan = ProfileOp(ctx(df)).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "profiling must not self-join")
    // exact quantiles (opt-in) on numeric columns, null on strings
    val q = ProfileOp(ctx(df, "quantiles" -> Seq(0.5), "quantiles_exact" -> true))
      .orderBy("column").collect()
    assert(q.map(r => Option(r.get(7))).toSeq ===
      Seq(Some(2.0), None, Some(0.75))) // median id=2, k null, v=(-1+2.5)/2
    intercept[GraftConfigError](ProfileOp(ctx(df, "quantiles" -> Seq(1.5))))
  }

  test("profile defaults are scale-safe: approx distinct + sketch quantiles") {
    import spark.implicits._
    val df = spark.range(1000).select(F.col("id"), (F.col("id") % 10).as("b"))
    // default path: HLL distinct (no Expand ×(N+1)), percentile_approx
    // (bounded sketch — no global per-column value buffering)
    val prof = ProfileOp(ctx(df.toDF(), "quantiles" -> Seq(0.5, 0.125)))
    val plan = prof.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Expand"), s"default profile must not plan an Expand:\n$plan")
    assert(!plan.matches("(?s).*\\bpercentile\\(.*"),
      s"default profile must use percentile_approx, not exact percentile:\n$plan")
    assert(plan.contains("approx_count_distinct") || plan.contains("HyperLogLog"))
    val rows = prof.orderBy("column").collect()
    // fractional quantile names keep the full value — 0.125 → q12_5, no collision
    assert(prof.columns.takeRight(2).toSeq === Seq("q50", "q12_5"))
    // HLL at rsd=0.05 on 1000 distinct: within 15%; median of 0..999 ≈ 500±1
    val idRow = rows.find(_.getString(0) == "id").get
    assert(math.abs(idRow.getLong(4) - 1000L) <= 150)
    assert(math.abs(idRow.getDouble(7) - 499.5) <= 5.0)
    // exact distinct remains opt-in and exact
    val exact = ProfileOp(ctx(df.toDF(), "distinct" -> "exact")).orderBy("column").collect()
    assert(exact.map(_.getLong(4)).toSeq === Seq(10L, 1000L))
    // quoted identifiers survive the quantile expr (ADVICE: backtick names)
    val weird = spark.range(10).select(F.col("id").as("odd name"))
    val wq = ProfileOp(ctx(weird, "quantiles" -> Seq(0.5))).head()
    assert(wq.getString(0) === "odd name" && !wq.isNullAt(7))
  }

  test("profile quantile naming: full-value, collision-free") {
    import graft.operators.ProfileOp.quantileName
    assert(quantileName(0.5) === "q50")
    assert(quantileName(0.125) === "q12_5")
    assert(quantileName(0.13) === "q13")
    assert(quantileName(0.001) === "q0_1")
    assert(quantileName(1.0) === "q100")
    assert(quantileName(0.0) === "q0")
  }

  // ---- explode.apply ----
  test("explode: expression source, outer mode, position column") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, ""), (3L, null)).toDF("id", "text")
    // expression source: split on the fly; empty string still yields [""]
    val got = ExplodeOp(ctx(df, "column" -> "split(text, ' ')", "into" -> "word"))
      .select("id", "word").as[(Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got === Array((1L, "a"), (1L, "b"), (2L, "")))
    // outer keeps the null-array row with a null element
    val outer = ExplodeOp(ctx(df, "column" -> "split(text, ' ')", "into" -> "word",
      "outer" -> true))
    assert(outer.count() === 4L)
    // position column + default into name for a real array column
    val arr = df.select(F.col("id"), F.split(F.col("text"), " ").as("toks"))
    val pos = ExplodeOp(ctx(arr, "column" -> "toks", "position_column" -> "i"))
      .select("id", "i", "toks").as[(Long, Int, String)].collect().sorted
    assert(pos === Array((1L, 0, "a"), (1L, 1, "b"), (2L, 0, "")))
    // generator only — no shuffle in the plan
    val plan = ExplodeOp(ctx(arr, "column" -> "toks"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
