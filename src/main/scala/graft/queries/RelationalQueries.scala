package graft.queries

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.LongType
import graft.config.Cfg
import graft.core.StageContext
import graft.operators._
import QueryDef.{t, viaStage}

/** Correctness-gate queries for every SURVEY §2 relational operator, each
  * with a DuckDB oracle over the same parquet tables.
  *
  * Float discipline (so Spark and DuckDB hash-match bit-for-bit):
  *  - l_quantity is whole-numbered → sums/avgs are exact in IEEE754
  *    regardless of aggregation order.
  *  - money columns (o_totalprice, l_extendedprice) have order-dependent
  *    double sums → any aggregate over them is round()ed in BOTH engines.
  *  - per-row arithmetic (x*1.1, x/y) is a single IEEE op → deterministic.
  */
object RelationalQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- filter.apply: one query per operator class ----
    QueryDef("filter_eq",
      "SELECT * FROM lineitem WHERE l_returnflag = 'R'") { (s, d) =>
      viaStage(s, d, "lineitem", FilterOp,
        Cfg.of("column" -> "l_returnflag", "operator" -> "==", "value" -> "R"))
    },
    QueryDef("filter_neq",
      "SELECT * FROM lineitem WHERE l_linestatus <> 'F'") { (s, d) =>
      viaStage(s, d, "lineitem", FilterOp,
        Cfg.of("column" -> "l_linestatus", "operator" -> "!=", "value" -> "F"))
    },
    QueryDef("filter_gt",
      "SELECT * FROM lineitem WHERE l_quantity > 47") { (s, d) =>
      viaStage(s, d, "lineitem", FilterOp,
        Cfg.of("column" -> "l_quantity", "operator" -> ">", "value" -> 47))
    },
    QueryDef("filter_ge",
      "SELECT * FROM lineitem WHERE l_quantity >= 48") { (s, d) =>
      viaStage(s, d, "lineitem", FilterOp,
        Cfg.of("column" -> "l_quantity", "operator" -> ">=", "value" -> 48))
    },
    QueryDef("filter_lt",
      "SELECT * FROM lineitem WHERE l_quantity < 3") { (s, d) =>
      viaStage(s, d, "lineitem", FilterOp,
        Cfg.of("column" -> "l_quantity", "operator" -> "<", "value" -> 3))
    },
    QueryDef("filter_le",
      "SELECT * FROM lineitem WHERE l_quantity <= 2") { (s, d) =>
      viaStage(s, d, "lineitem", FilterOp,
        Cfg.of("column" -> "l_quantity", "operator" -> "<=", "value" -> 2))
    },
    QueryDef("filter_contains",
      "SELECT * FROM customer WHERE c_name LIKE '%00%'") { (s, d) =>
      viaStage(s, d, "customer", FilterOp,
        Cfg.of("column" -> "c_name", "operator" -> "contains", "value" -> "00"))
    },
    QueryDef("filter_in",
      "SELECT * FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')") { (s, d) =>
      viaStage(s, d, "customer", FilterOp,
        Cfg.of("column" -> "c_mktsegment", "operator" -> "in",
          "value" -> Seq("BUILDING", "AUTOMOBILE")))
    },

    // ---- select.apply ----
    QueryDef("select_proj",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem") { (s, d) =>
      viaStage(s, d, "lineitem", SelectOp,
        Cfg.of("columns" -> Seq("l_orderkey", "l_linenumber", "l_quantity")))
    },

    // ---- map.apply expression forms ----
    QueryDef("map_mul",
      """SELECT l_orderkey, l_linenumber, l_extendedprice * 1.1 AS adj
        |FROM lineitem""".stripMargin) { (s, d) =>
      val mapped = viaStage(s, d, "lineitem", MapOp,
        Cfg.of("expression" -> "l_extendedprice * 1.1", "output_column" -> "adj"))
      mapped.select("l_orderkey", "l_linenumber", "adj")
    },
    QueryDef("map_div_cols",
      """SELECT l_orderkey, l_linenumber, l_extendedprice / l_quantity AS unit_price
        |FROM lineitem""".stripMargin) { (s, d) =>
      val mapped = viaStage(s, d, "lineitem", MapOp,
        Cfg.of("expression" -> "l_extendedprice / l_quantity", "output_column" -> "unit_price"))
      mapped.select("l_orderkey", "l_linenumber", "unit_price")
    },
    QueryDef("map_const",
      "SELECT l_orderkey, l_linenumber, 'flagged' AS tag FROM lineitem WHERE l_quantity > 49") { (s, d) =>
      val filtered = viaStage(s, d, "lineitem", FilterOp,
        Cfg.of("column" -> "l_quantity", "operator" -> ">", "value" -> 49))
      MapOp(StageContext.one(s, filtered,
        Cfg.of("expression" -> "\"flagged\"", "output_column" -> "tag")))
        .select("l_orderkey", "l_linenumber", "tag")
    },

    // ---- groupby.apply: agg op coverage ----
    QueryDef("groupby_basic",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(l_quantity) AS cnt,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  avg(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      viaStage(s, d, "lineitem", GroupByOp, Cfg.of(
        "by" -> Seq("l_returnflag", "l_linestatus"),
        "aggregations" -> Seq(
          Map("column" -> "l_quantity", "operation" -> "sum", "output_column" -> "sum_qty"),
          Map("column" -> "l_quantity", "operation" -> "count", "output_column" -> "cnt"),
          Map("column" -> "l_quantity", "operation" -> "min", "output_column" -> "min_qty"),
          Map("column" -> "l_quantity", "operation" -> "max", "output_column" -> "max_qty"),
          Map("column" -> "l_quantity", "operation" -> "avg", "output_column" -> "avg_qty"))))
    },
    QueryDef("groupby_stats",
      """SELECT l_returnflag,
        |  median(l_quantity) AS med_qty,
        |  round(stddev_samp(l_quantity), 6) AS std_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val g = viaStage(s, d, "lineitem", GroupByOp, Cfg.of(
        "by" -> "l_returnflag",
        "aggregations" -> Seq(
          Map("column" -> "l_quantity", "operation" -> "median", "output_column" -> "med_qty"),
          Map("column" -> "l_quantity", "operation" -> "std", "output_column" -> "std_qty"),
          Map("column" -> "l_quantity", "operation" -> "var", "output_column" -> "var_qty"))))
      g.select(F.col("l_returnflag"),
        F.col("med_qty"),
        F.round(F.col("std_qty"), 6).alias("std_qty"),
        F.round(F.col("var_qty"), 6).alias("var_qty"))
    },

    // ---- reduce.apply ----
    QueryDef("reduce_sum",
      "SELECT sum(l_quantity) AS result FROM lineitem") { (s, d) =>
      viaStage(s, d, "lineitem", ReduceOp,
        Cfg.of("column" -> "l_quantity", "operation" -> "sum"))
    },
    QueryDef("reduce_avg",
      "SELECT round(avg(o_totalprice), 4) AS result FROM orders") { (s, d) =>
      viaStage(s, d, "orders", ReduceOp,
        Cfg.of("column" -> "o_totalprice", "operation" -> "avg"))
        .select(F.round(F.col("result"), 4).alias("result"))
    },
    QueryDef("reduce_minmax",
      """SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
        |  count(o_totalprice) AS cnt FROM orders""".stripMargin) { (s, d) =>
      val df = t(s, d, "orders")
      val mn = ReduceOp(StageContext.one(s, df, Cfg.of("column" -> "o_totalprice", "operation" -> "min", "output_column" -> "mn")))
      val mx = ReduceOp(StageContext.one(s, df, Cfg.of("column" -> "o_totalprice", "operation" -> "max", "output_column" -> "mx")))
      val ct = ReduceOp(StageContext.one(s, df, Cfg.of("column" -> "o_totalprice", "operation" -> "count", "output_column" -> "cnt")))
      mn.crossJoin(mx).crossJoin(ct)
    },
    QueryDef("reduce_median",
      "SELECT median(o_totalprice) AS result FROM orders") { (s, d) =>
      viaStage(s, d, "orders", ReduceOp,
        Cfg.of("column" -> "o_totalprice", "operation" -> "median"))
    },

    // ---- sort.apply ----
    QueryDef("sort_multi",
      "SELECT * FROM orders ORDER BY o_orderpriority ASC, o_totalprice DESC") { (s, d) =>
      viaStage(s, d, "orders", SortOp, Cfg.of(
        "by" -> Seq("o_orderpriority", "o_totalprice"),
        "descending" -> Seq(false, true)))
    },

    // ---- distinct.apply keep modes ----
    QueryDef("distinct_pairs",
      "SELECT DISTINCT o_custkey, o_orderstatus FROM orders") { (s, d) =>
      val proj = viaStage(s, d, "orders", SelectOp,
        Cfg.of("columns" -> Seq("o_custkey", "o_orderstatus")))
      DistinctOp(StageContext.one(s, proj, Cfg.empty))
    },
    QueryDef("distinct_first",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderstatus ORDER BY o_orderkey) AS rn
        |      FROM orders) WHERE rn = 1""".stripMargin) { (s, d) =>
      viaStage(s, d, "orders", DistinctOp, Cfg.of(
        "columns" -> Seq("o_custkey", "o_orderstatus"),
        "keep" -> "first", "order_by" -> Seq("o_orderkey")))
    },
    QueryDef("distinct_last",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderstatus ORDER BY o_orderkey DESC) AS rn
        |      FROM orders) WHERE rn = 1""".stripMargin) { (s, d) =>
      viaStage(s, d, "orders", DistinctOp, Cfg.of(
        "columns" -> Seq("o_custkey", "o_orderstatus"),
        "keep" -> "last", "order_by" -> Seq("o_orderkey")))
    },
    QueryDef("distinct_none",
      """SELECT * FROM orders
        |WHERE (o_custkey, o_orderstatus) IN
        |  (SELECT (o_custkey, o_orderstatus) FROM orders
        |   GROUP BY o_custkey, o_orderstatus HAVING count(*) = 1)""".stripMargin) { (s, d) =>
      viaStage(s, d, "orders", DistinctOp, Cfg.of(
        "columns" -> Seq("o_custkey", "o_orderstatus"), "keep" -> "none"))
    },

    // ---- chunk.apply (summarized — array-of-structs itself is checked in unit tests) ----
    QueryDef("chunk_nation",
      """SELECT CAST(floor(rn / 10) AS BIGINT) AS chunk_id,
        |  count(*) AS n_rows, min(n_nationkey) AS mn, max(n_nationkey) AS mx
        |FROM (SELECT n_nationkey, row_number() OVER (ORDER BY n_nationkey) - 1 AS rn FROM nation)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val chunked = viaStage(s, d, "nation", ChunkOp, Cfg.of(
        "batch_size" -> 10, "order_by" -> Seq("n_nationkey")))
      chunked.select(
        F.col("chunk_id"),
        F.size(F.col("records")).cast(LongType).alias("n_rows"),
        F.array_min(F.transform(F.col("records"), x => x.getField("n_nationkey"))).alias("mn"),
        F.array_max(F.transform(F.col("records"), x => x.getField("n_nationkey"))).alias("mx"))
    },

    // ---- json.extract ----
    QueryDef("json_extract_k",
      "SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events") { (s, d) =>
      viaStage(s, d, "events", JsonExtractOp, Cfg.of(
        "column" -> "props", "path" -> "k", "output_column" -> "k_val"))
        .select("event_id", "k_val")
    },
    QueryDef("json_extract_missing",
      "SELECT event_id, json_extract_string(props, '$.nope') AS missing_val FROM events") { (s, d) =>
      viaStage(s, d, "events", JsonExtractOp, Cfg.of(
        "column" -> "props", "path" -> "nope", "output_column" -> "missing_val"))
        .select("event_id", "missing_val")
    },

    // ---- validate.schema (pass → passthrough; fail path unit-tested) ----
    QueryDef("validate_pass",
      "SELECT * FROM customer") { (s, d) =>
      viaStage(s, d, "customer", ValidateOp, Cfg.of(
        "required_fields" -> Seq("c_custkey", "c_name", "c_acctbal"),
        "field_types" -> Map("c_custkey" -> "int", "c_name" -> "string", "c_acctbal" -> "float"),
        "non_nullable" -> Seq("c_custkey", "c_name"),
        "unique_fields" -> Seq("c_custkey")))
    },

    // ---- count-based window + aggregate.stream batch parity ----
    // the reference's canonical composition (streaming-window-example.toml):
    // window.apply → aggregate.stream, which picks up window_id implicitly
    QueryDef("aggstream_tumbling",
      """SELECT CAST(floor(rn / 200) AS BIGINT) AS window_id,
        |  round(sum(value), 6) AS total
        |FROM (SELECT *, row_number() OVER (ORDER BY ts, event_id) - 1 AS rn FROM events)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val win = graft.streaming.CountWindowOp(StageContext.one(s, t(s, d, "events"), Cfg.of(
        "type" -> "tumbling", "size" -> 200, "order_by" -> Seq("ts", "event_id"))))
      graft.streaming.AggregateStreamOp(StageContext.one(s, win, Cfg.of(
        "operation" -> "sum", "value_column" -> "value", "output_column" -> "total")))
        .select(F.col("window_id"), F.round(F.col("total"), 6).alias("total"))
    },

    QueryDef("window_count_tumbling",
      """SELECT CAST(floor(rn / 100) AS BIGINT) AS window_id,
        |  count(*) AS n_events,
        |  round(sum(value), 6) AS sum_value,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM (SELECT *, row_number() OVER (ORDER BY ts, event_id) - 1 AS rn FROM events)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val win = graft.streaming.CountWindowOp(StageContext.one(s, t(s, d, "events"), Cfg.of(
        "type" -> "tumbling", "size" -> 100, "order_by" -> Seq("ts", "event_id"))))
      win.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"))
    },

    QueryDef("window_count_sliding",
      """SELECT window_id, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM (
        |  SELECT event_id,
        |    unnest(generate_series(
        |      greatest(0, CAST(ceil((rn - 300 + 1) / 100.0) AS BIGINT)),
        |      CAST(floor(rn / 100.0) AS BIGINT))) AS window_id
        |  FROM (SELECT event_id, row_number() OVER (ORDER BY ts, event_id) - 1 AS rn
        |        FROM events))
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val win = graft.streaming.CountWindowOp(StageContext.one(s, t(s, d, "events"), Cfg.of(
        "type" -> "sliding", "size" -> 300, "slide" -> 100,
        "order_by" -> Seq("ts", "event_id"))))
      win.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"))
    },

    // count-session: gap column floored to whole epoch seconds on BOTH
    // sides (events.ts is ns in parquet, µs in Spark — sub-second precision
    // would flip boundary comparisons). window_id must be CAST to BIGINT:
    // DuckDB sum(INTEGER) yields HUGEINT, which pandas renders as float64
    // (0.0 vs Spark's 0) and the driver's value-hash compare then fails
    // even though every value is numerically equal.
    QueryDef("window_count_session",
      """WITH o AS (SELECT event_id, floor(epoch(ts)) AS gv,
        |    row_number() OVER (ORDER BY floor(epoch(ts)), event_id) - 1 AS rn FROM events),
        |f AS (SELECT event_id, rn,
        |    CASE WHEN lag(gv) OVER (ORDER BY rn) IS NOT NULL
        |         AND gv - lag(gv) OVER (ORDER BY rn) > 600 THEN 1 ELSE 0 END AS flag FROM o)
        |SELECT window_id, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM (SELECT event_id, CAST(sum(flag) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS BIGINT) AS window_id FROM f)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .withColumn("tsec", F.floor(F.col("ts").cast("double")).cast("double"))
      val win = graft.streaming.CountWindowOp(StageContext.one(s, ev, Cfg.of(
        "type" -> "session", "gap" -> 600.0,
        "order_by" -> Seq("tsec", "event_id"), "gap_column" -> "tsec")))
      win.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"))
    },

    // per-key tumbling count windows (group_by batch path — the same
    // semantics the streaming transformWithState processor keeps per key)
    QueryDef("window_count_keyed",
      """SELECT user_id, window_id, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM (
        |  SELECT user_id, event_id,
        |    CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 50) AS BIGINT) AS window_id
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val win = graft.streaming.CountWindowOp(StageContext.one(s, t(s, d, "events"), Cfg.of(
        "type" -> "tumbling", "size" -> 50,
        "group_by" -> Seq("user_id"), "order_by" -> Seq("ts", "event_id"))))
      win.groupBy("user_id", "window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"))
    },

    // ---- limit / top-k ----
    QueryDef("topk_orders",
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10") { (s, d) =>
      viaStage(s, d, "orders", LimitOp, Cfg.of(
        "n" -> 10, "by" -> Seq("o_totalprice", "o_orderkey"),
        "descending" -> Seq(true, false)))
    }
  )
}
