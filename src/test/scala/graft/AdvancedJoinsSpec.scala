package graft

import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.StageContext
import graft.operators._

/** join.asof / join.range / groupby.cube semantics. */
class AdvancedJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 10L, 12.0),
    ("B", 3L, 20.0), ("B", 7L, 21.0)
  ).toDF("sym", "t", "px")

  private def quotes = Seq(
    ("A", 0L, 9.9), ("A", 5L, 10.9), ("A", 8L, 11.5),
    ("B", 2L, 19.5), ("B", 9L, 22.0)
  ).toDF("sym", "t", "bid")

  private def asof(cfg: Cfg) =
    AsofJoinOp(StageContext(spark, Seq("l" -> trades, "r" -> quotes), cfg))

  test("join.asof: latest right row with t <= left.t per key") {
    val out = asof(Cfg.of("by" -> Seq("sym"), "on" -> "t", "right_prefix" -> "q_"))
      .select("sym", "t", "px", "q_t", "q_bid")
      .as[(String, Long, Double, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      ("A", 1L, 10.0, Some(0L), Some(9.9)),
      ("A", 5L, 11.0, Some(5L), Some(10.9)),   // inclusive at equal t
      ("A", 10L, 12.0, Some(8L), Some(11.5)),
      ("B", 3L, 20.0, Some(2L), Some(19.5)),
      ("B", 7L, 21.0, Some(2L), Some(19.5))))
  }

  test("join.asof strict: right rows at the same t are not visible") {
    val out = asof(Cfg.of("by" -> Seq("sym"), "on" -> "t", "strict" -> true,
      "right_prefix" -> "q_"))
      .filter($"sym" === "A" && $"t" === 5L)
      .select("q_t", "q_bid").as[(Option[Long], Option[Double])].head()
    assert(out === ((Some(0L), Some(9.9))))   // t=5 quote excluded, falls back to t=0
  }

  test("join.asof tolerance: stale matches become null") {
    val out = asof(Cfg.of("by" -> Seq("sym"), "on" -> "t", "tolerance" -> 3.0,
      "right_prefix" -> "q_"))
      .select("sym", "t", "q_t").as[(String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    // B@7: latest quote is t=2, gap 5 > 3 -> null match
    assert(out.find(r => r._1 == "B" && r._2 == 7L).get._3 === None)
    // A@10: quote t=8, gap 2 <= 3 -> kept
    assert(out.find(r => r._1 == "A" && r._2 == 10L).get._3 === Some(8L))
  }

  test("join.asof with no by keys: single global timeline") {
    val l = Seq(5L, 100L).toDF("t")
    val r = Seq((1L, "x"), (50L, "y")).toDF("t", "v")
    val out = AsofJoinOp(StageContext(spark, Seq("l" -> l, "r" -> r),
      Cfg.of("on" -> "t", "right_prefix" -> "m_")))
      .orderBy("t").select("m_v").as[Option[String]].collect()
    assert(out === Array(Some("x"), Some("y")))
  }

  private def points = Seq(1.0, 5.0, 10.0, 17.0, 25.0).toDF("x")
  private def ranges = Seq(("a", 0.0, 6.0), ("b", 4.0, 12.0), ("c", 20.0, 30.0))
    .toDF("rid", "lo", "hi")

  test("join.range: broadcast and bucketed plans agree") {
    def run(cfg: Cfg) =
      RangeJoinOp(StageContext(spark, Seq("l" -> points, "r" -> ranges), cfg))
        .select("x", "rid").as[(Double, String)].collect().toSet
    val expected = Set((1.0, "a"), (5.0, "a"), (5.0, "b"), (10.0, "b"), (25.0, "c"))
    assert(run(Cfg.of("value" -> "x", "lo" -> "lo", "hi" -> "hi")) === expected)
    assert(run(Cfg.of("value" -> "x", "lo" -> "lo", "hi" -> "hi",
      "bucket_width" -> 5.0)) === expected)
  }

  test("join.range left: unmatched left rows survive with null right") {
    val out = RangeJoinOp(StageContext(spark, Seq("l" -> points, "r" -> ranges),
      Cfg.of("value" -> "x", "lo" -> "lo", "hi" -> "hi", "how" -> "left",
        "bucket_width" -> 5.0)))
      .select("x", "rid").as[(Double, Option[String])].collect()
    assert(out.count(_._1 == 17.0) === 1)
    assert(out.find(_._1 == 17.0).get._2 === None)
    assert(out.length === 6)   // 5 matches + 1 unmatched
  }

  test("groupby.cube: cube emits all 4 grouping levels, rollup 3") {
    val df = Seq(("x", "p", 1L), ("x", "q", 2L), ("y", "p", 4L))
      .toDF("a", "b", "v")
    def run(mode: String) = CubeOp(StageContext.one(spark, df, Cfg.of(
      "mode" -> mode, "by" -> Seq("a", "b"),
      "aggregations" -> Seq(Map("operation" -> "sum", "column" -> "v", "output_column" -> "sv")))))
    val cube = run("cube").collect()
    assert(cube.length === 3 + 2 + 2 + 1)   // (a,b) + (a) + (b) + ()
    val total = cube.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total.length === 1 && total.head.getLong(2) === 7L)
    val rollup = run("rollup").collect()
    assert(rollup.length === 3 + 2 + 1)     // no (b)-only level
  }

  test("groupby.cube grouping_id distinguishes subtotal levels") {
    val df = Seq(("x", "p", 1L)).toDF("a", "b", "v")
    val out = CubeOp(StageContext.one(spark, df, Cfg.of(
      "mode" -> "cube", "by" -> Seq("a", "b"), "grouping_id" -> true,
      "aggregations" -> Seq(Map("operation" -> "sum", "column" -> "v", "output_column" -> "sv")))))
    val ids = out.select("grouping_id").as[Long].collect().sorted
    assert(ids === Array(0L, 1L, 2L, 3L))
  }

  test("groupby.cube: grouping_id=true respects mode=rollup (round-1 bug)") {
    val df = Seq(("x", "p", 1L), ("x", "q", 2L), ("y", "p", 4L))
      .toDF("a", "b", "v")
    val out = CubeOp(StageContext.one(spark, df, Cfg.of(
      "mode" -> "rollup", "by" -> Seq("a", "b"), "grouping_id" -> true,
      "aggregations" -> Seq(Map("operation" -> "sum", "column" -> "v", "output_column" -> "sv")))))
      .collect()
    // rollup of 2 keys: no (b)-only level → gid=2 must be absent
    assert(out.length === 3 + 2 + 1)
    val ids = out.map(_.getAs[Long]("grouping_id")).distinct.sorted
    assert(ids === Array(0L, 1L, 3L))
  }
}
