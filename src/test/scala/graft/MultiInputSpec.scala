package graft

import graft.config.Cfg
import graft.core.StageContext
import graft.operators._

class MultiInputSpec extends SparkSpec {
  import spark.implicits._

  private def two(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame, kvs: (String, Any)*) =
    StageContext(spark, Seq("l" -> l, "r" -> r), Cfg.of(kvs: _*))

  private lazy val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
  private lazy val right = Seq((2, "x"), (3, "y"), (4, "z")).toDF("k", "rv")

  test("join: inner/left/right/full/semi/anti/cross") {
    assert(JoinOp(two(left, right, "on" -> "k")).count() == 2)
    assert(JoinOp(two(left, right, "on" -> "k", "how" -> "left")).count() == 3)
    assert(JoinOp(two(left, right, "on" -> "k", "how" -> "right")).count() == 3)
    assert(JoinOp(two(left, right, "on" -> "k", "how" -> "outer")).count() == 4)
    val semi = JoinOp(two(left, right, "on" -> "k", "how" -> "semi"))
    assert(semi.columns.toSeq == Seq("k", "lv") && semi.count() == 2)
    assert(JoinOp(two(left, right, "on" -> "k", "how" -> "anti"))
      .collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(JoinOp(two(left, right, "how" -> "cross")).count() == 9)
  }

  test("join: left_on/right_on with different key names") {
    val r2 = right.withColumnRenamed("k", "rk")
    val out = JoinOp(two(left, r2, "left_on" -> "k", "right_on" -> "rk"))
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("k", "lv", "rk", "rv"))
  }

  test("join: explicit broadcast hint produces a broadcast join plan") {
    val out = JoinOp(two(left, right, "on" -> "k", "broadcast" -> "right"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("union: by name, missing columns, distinct") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id") // shuffled column order
    val u = UnionOp(StageContext(spark, Seq("a" -> a, "b" -> b), Cfg.empty))
    assert(u.count() == 2)
    assert(u.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))

    val c = Seq(3).toDF("id")
    val um = UnionOp(StageContext(spark, Seq("a" -> a, "c" -> c),
      Cfg.of("allow_missing_columns" -> true)))
    assert(um.count() == 2)

    val dup = UnionOp(StageContext(spark, Seq("a" -> a, "a2" -> a), Cfg.of("distinct" -> true)))
    assert(dup.count() == 1)
  }

  test("intersect and except") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(2, 3, 4).toDF("x")
    assert(IntersectOp(StageContext(spark, Seq("a" -> a, "b" -> b), Cfg.empty))
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(ExceptOp(StageContext(spark, Seq("a" -> a, "b" -> b), Cfg.empty))
      .collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("window functions: row_number/rank/lag over partitions") {
    val df = Seq(("a", 1, 10), ("a", 2, 20), ("a", 3, 20), ("b", 4, 5)).toDF("g", "id", "v")
    val rn = WindowFnOp(StageContext.one(spark, df, Cfg.of(
      "function" -> "row_number", "partition_by" -> Seq("g"),
      "order_by" -> Seq("id"), "output_column" -> "rn")))
    assert(rn.filter("g = 'a'").orderBy("id").select("rn")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))

    val rk = WindowFnOp(StageContext.one(spark, df, Cfg.of(
      "function" -> "rank", "partition_by" -> Seq("g"),
      "order_by" -> Seq("v"), "descending" -> Seq(true), "output_column" -> "rk")))
    assert(rk.filter("g = 'a'").orderBy("id").select("rk")
      .collect().map(_.getInt(0)).toSeq == Seq(3, 1, 1))

    val lg = WindowFnOp(StageContext.one(spark, df, Cfg.of(
      "function" -> "lag", "column" -> "v", "partition_by" -> Seq("g"),
      "order_by" -> Seq("id"), "output_column" -> "prev")))
    assert(lg.filter("g = 'a'").orderBy("id").select("prev")
      .collect().map(r => Option(r.get(0))).toSeq == Seq(None, Some(10), Some(20)))
  }

  test("pivot with declared values") {
    val df = Seq(("p1", "F", 10.0), ("p1", "O", 20.0), ("p2", "F", 5.0)).toDF("g", "s", "v")
    val out = PivotOp(StageContext.one(spark, df, Cfg.of(
      "by" -> "g", "pivot" -> "s", "values" -> Seq("F", "O"),
      "column" -> "v", "operation" -> "sum")))
      .orderBy("g").collect()
    assert(out(0).getDouble(1) == 10.0 && out(0).getDouble(2) == 20.0)
    assert(out(1).getDouble(1) == 5.0 && out(1).isNullAt(2))
  }
}
