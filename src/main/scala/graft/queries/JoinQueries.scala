package graft.queries

import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.StageContext
import graft.operators._
import QueryDef.t

/** Join / set-op / window-function queries (capability extensions — the
  * reference has none of these, SURVEY §2.8). Dimension tables
  * (nation/region) are explicitly broadcast so the fact side never shuffles.
  */
object JoinQueries {

  private def join2(s: org.apache.spark.sql.SparkSession,
                    l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
                    cfg: Cfg) =
    JoinOp(StageContext(s, Seq("l" -> l, "r" -> r), cfg))

  val all: Seq[QueryDef] = Seq(

    QueryDef("join_cust_nation_region",
      """SELECT r_name, n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, d) =>
      val cn = join2(s, t(s, d, "customer"), t(s, d, "nation"),
        Cfg.of("left_on" -> "c_nationkey", "right_on" -> "n_nationkey", "broadcast" -> "right"))
      val cnr = join2(s, cn, t(s, d, "region"),
        Cfg.of("left_on" -> "n_regionkey", "right_on" -> "r_regionkey", "broadcast" -> "right"))
      cnr.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    },

    QueryDef("join_orders_customer",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      val oc = join2(s, t(s, d, "orders"), t(s, d, "customer"),
        Cfg.of("left_on" -> "o_custkey", "right_on" -> "c_custkey"))
      oc.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    },

    // TPC-H Q3 shape — the classic 3-way fact join: filter both fact sides
    // BEFORE the join (predicate pushdown to both scans), broadcast nothing
    // (orders/lineitem are both fact-sized), aggregate after, top-k last.
    QueryDef("q3_shipping_priority",
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-15'
        |  AND l_shipdate > TIMESTAMP '1997-06-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = FilterOp(StageContext.one(s, t(s, d, "customer"),
        Cfg.of("column" -> "c_mktsegment", "operator" -> "==", "value" -> "BUILDING")))
      val ord = t(s, d, "orders").filter(F.col("o_orderdate") < F.lit("1997-06-15"))
      val li = t(s, d, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-06-15"))
      val co = join2(s, ord, cust,
        Cfg.of("left_on" -> "o_custkey", "right_on" -> "c_custkey"))
      val col3 = join2(s, li, co,
        Cfg.of("left_on" -> "l_orderkey", "right_on" -> "o_orderkey"))
      col3.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2)
          .alias("revenue"))
        .orderBy(F.col("revenue").desc, F.col("l_orderkey"))
        .limit(10)
    },

    // Same semantics as join_orders_customer, but through the explicit
    // skew-salt path (salt=8, no broadcast): proves salting is invisible
    // to results while fanning one hot key over 8 reducers.
    QueryDef("join_salted_skew",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      val oc = join2(s, t(s, d, "orders"), t(s, d, "customer"),
        Cfg.of("left_on" -> "o_custkey", "right_on" -> "c_custkey",
          "salt" -> 8, "broadcast" -> "none"))
      oc.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    },

    QueryDef("join_left_null_side",
      """SELECT c_custkey, c_name, o_orderkey
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey <= 50""".stripMargin) { (s, d) =>
      val cust = FilterOp(StageContext.one(s, t(s, d, "customer"),
        Cfg.of("column" -> "c_custkey", "operator" -> "<=", "value" -> 50)))
      join2(s, cust, t(s, d, "orders"),
        Cfg.of("how" -> "left", "left_on" -> "c_custkey", "right_on" -> "o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey")
    },

    QueryDef("join_semi",
      """SELECT * FROM customer c WHERE EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin) { (s, d) =>
      val bigOrders = FilterOp(StageContext.one(s, t(s, d, "orders"),
        Cfg.of("column" -> "o_totalprice", "operator" -> ">", "value" -> 400000)))
      join2(s, t(s, d, "customer"), bigOrders,
        Cfg.of("how" -> "semi", "left_on" -> "c_custkey", "right_on" -> "o_custkey"))
    },

    QueryDef("join_anti",
      """SELECT * FROM customer c WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin) { (s, d) =>
      val bigOrders = FilterOp(StageContext.one(s, t(s, d, "orders"),
        Cfg.of("column" -> "o_totalprice", "operator" -> ">", "value" -> 400000)))
      join2(s, t(s, d, "customer"), bigOrders,
        Cfg.of("how" -> "anti", "left_on" -> "c_custkey", "right_on" -> "o_custkey"))
    },

    QueryDef("union_all",
      """SELECT * FROM orders WHERE o_totalprice > 450000
        |UNION ALL
        |SELECT * FROM orders WHERE o_totalprice < 10000""".stripMargin) { (s, d) =>
      val hi = FilterOp(StageContext.one(s, t(s, d, "orders"),
        Cfg.of("column" -> "o_totalprice", "operator" -> ">", "value" -> 450000)))
      val lo = FilterOp(StageContext.one(s, t(s, d, "orders"),
        Cfg.of("column" -> "o_totalprice", "operator" -> "<", "value" -> 10000)))
      UnionOp(StageContext(s, Seq("hi" -> hi, "lo" -> lo), Cfg.empty))
    },

    QueryDef("intersect_keys",
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""".stripMargin) { (s, d) =>
      def seg(v: String) = FilterOp(StageContext.one(s, t(s, d, "customer"),
        Cfg.of("column" -> "c_mktsegment", "operator" -> "==", "value" -> v)))
        .select("c_nationkey")
      IntersectOp(StageContext(s, Seq("a" -> seg("BUILDING"), "b" -> seg("AUTOMOBILE")), Cfg.empty))
    },

    QueryDef("except_keys",
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, d) =>
      val allK = t(s, d, "orders").select("o_custkey")
      val fK = FilterOp(StageContext.one(s, t(s, d, "orders"),
        Cfg.of("column" -> "o_orderstatus", "operator" -> "==", "value" -> "F")))
        .select("o_custkey")
      ExceptOp(StageContext(s, Seq("a" -> allK, "b" -> fK), Cfg.empty))
    },

    QueryDef("window_rank_top3",
      """SELECT c_custkey, c_nationkey, c_acctbal, rn
        |FROM (SELECT c_custkey, c_nationkey, c_acctbal,
        |        row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer) WHERE rn <= 3""".stripMargin) { (s, d) =>
      val ranked = WindowFnOp(StageContext.one(s, t(s, d, "customer"), Cfg.of(
        "function" -> "row_number", "output_column" -> "rn",
        "partition_by" -> Seq("c_nationkey"),
        "order_by" -> Seq("c_acctbal", "c_custkey"),
        "descending" -> Seq(true, false))))
      ranked.filter(F.col("rn") <= 3).select("c_custkey", "c_nationkey", "c_acctbal", "rn")
    },

    QueryDef("window_lag",
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price
        |FROM orders WHERE o_custkey <= 100""".stripMargin) { (s, d) =>
      val sub = FilterOp(StageContext.one(s, t(s, d, "orders"),
        Cfg.of("column" -> "o_custkey", "operator" -> "<=", "value" -> 100)))
      WindowFnOp(StageContext.one(s, sub, Cfg.of(
        "function" -> "lag", "column" -> "o_totalprice", "offset" -> 1,
        "output_column" -> "prev_price",
        "partition_by" -> Seq("o_custkey"), "order_by" -> Seq("o_orderkey"))))
        .select("o_orderkey", "o_custkey", "o_totalprice", "prev_price")
    },

    QueryDef("pivot_status_by_priority",
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val pv = PivotOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "by" -> "o_orderpriority", "pivot" -> "o_orderstatus",
        "values" -> Seq("F", "O", "P"),
        "column" -> "o_totalprice", "operation" -> "sum")))
      pv.select(F.col("o_orderpriority"),
        F.round(F.col("F"), 2).alias("F"),
        F.round(F.col("O"), 2).alias("O"),
        F.round(F.col("P"), 2).alias("P"))
    }
  )
}
