package graft.queries

import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.StageContext
import graft.operators._
import QueryDef.t

/** Advanced-join gate queries: as-of (point-in-time) join, banded range
  * join, CUBE/ROLLUP. All are capability extensions (the reference has no
  * joins at all, SURVEY §2.8); DuckDB expresses each natively (ASOF JOIN,
  * GROUP BY CUBE/ROLLUP) so the oracle is a real independent check.
  *
  * Float discipline (see RelationalQueries): money sums are round()ed in
  * both engines; as-of/range predicates compare against exact values
  * (integer band bounds, deduped timestamps) so no boundary ulp drift.
  */
object AdvancedJoinQueries {

  val all: Seq[QueryDef] = Seq(

    // For every order: the same customer's most recent EARLIER order date
    // and that day's best (max) total price. Right side is deduped per
    // (custkey, date) so the as-of match is deterministic at ties.
    QueryDef("asof_prev_order",
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate AS r_o_orderdate,
        |         max(o_totalprice) AS r_best_price
        |  FROM orders GROUP BY 1, 2)
        |SELECT l.o_orderkey, l.o_custkey, l.o_orderdate, l.o_totalprice,
        |       r.r_o_orderdate, r.r_best_price
        |FROM orders l ASOF LEFT JOIN r
        |  ON l.o_custkey = r.o_custkey AND l.o_orderdate > r.r_o_orderdate""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders")
      val right = orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("best_price"))
      val joined = AsofJoinOp(StageContext(s, Seq("l" -> orders, "r" -> right), Cfg.of(
        "by" -> Seq("o_custkey"), "on" -> "o_orderdate",
        "strict" -> true, "right_prefix" -> "r_")))
      joined.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "r_o_orderdate", "r_best_price")
    },

    // Banded range join on integer band bounds (exact in double, so the
    // boundary comparison is engine-independent). bucket_width exercises
    // the scale path: explode ranges into fixed buckets -> equi-join on
    // bucket id (hash shuffle) -> exact post-filter. No nested loop.
    QueryDef("range_join_bands",
      """WITH bands AS (
        |  SELECT n_nationkey AS band_id,
        |         n_nationkey * 400 - 1000 AS lo,
        |         n_nationkey * 400 - 601 AS hi
        |  FROM nation)
        |SELECT c.c_custkey, c.c_acctbal, b.band_id
        |FROM customer c JOIN bands b
        |  ON c.c_acctbal >= b.lo AND c.c_acctbal <= b.hi""".stripMargin) { (s, d) =>
      val bands = t(s, d, "nation").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 400 - 1000).alias("lo"),
        (F.col("n_nationkey") * 400 - 601).alias("hi"))
      RangeJoinOp(StageContext(s, Seq("l" -> t(s, d, "customer"), "r" -> bands), Cfg.of(
        "value" -> "c_acctbal", "lo" -> "lo", "hi" -> "hi", "bucket_width" -> 400.0)))
        .select("c_custkey", "c_acctbal", "band_id")
    },

    QueryDef("cube_status_priority",
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
      val cube = CubeOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "mode" -> "cube", "by" -> Seq("o_orderstatus", "o_orderpriority"),
        "aggregations" -> Seq(
          Map("operation" -> "sum", "column" -> "o_totalprice", "output_column" -> "revenue"),
          Map("operation" -> "count", "column" -> "o_orderkey", "output_column" -> "n_orders")))))
      cube.select(F.col("o_orderstatus"), F.col("o_orderpriority"),
        F.round(F.col("revenue"), 2).alias("revenue"), F.col("n_orders"))
    },

    QueryDef("rollup_status_priority",
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
      val roll = CubeOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "mode" -> "rollup", "by" -> Seq("o_orderstatus", "o_orderpriority"),
        "aggregations" -> Seq(
          Map("operation" -> "sum", "column" -> "o_totalprice", "output_column" -> "revenue"),
          Map("operation" -> "count", "column" -> "o_orderkey", "output_column" -> "n_orders")))))
      roll.select(F.col("o_orderstatus"), F.col("o_orderpriority"),
        F.round(F.col("revenue"), 2).alias("revenue"), F.col("n_orders"))
    },

    // rollup + grouping_id: guards the CubeOp mode-dispatch (round-1 bug:
    // grouping_id=true silently recomputed a CUBE regardless of mode). A
    // rollup of 2 keys has 3 levels; a cube would emit a 4th (gid=2) — the
    // row count alone catches the regression, the gid values pin semantics.
    QueryDef("rollup_grouping_id",
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grouping_id
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
      val roll = CubeOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "mode" -> "rollup", "by" -> Seq("o_orderstatus", "o_orderpriority"),
        "grouping_id" -> true,
        "aggregations" -> Seq(
          Map("operation" -> "sum", "column" -> "o_totalprice", "output_column" -> "revenue")))))
      roll.select(F.col("o_orderstatus"), F.col("o_orderpriority"),
        F.round(F.col("revenue"), 2).alias("revenue"),
        F.col("grouping_id").cast("long").alias("grouping_id"))
    }
  )
}
