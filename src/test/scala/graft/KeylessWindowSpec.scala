package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.config.Cfg
import graft.core.StageContext
import graft.operators._

/** Keyless (empty partition_by) window functions must match the naive
  * Window.partitionBy() single-partition plan value-for-value while never
  * PLANNING a single-partition exchange. The fixture has tie groups that
  * span partition boundaries (the hard case for the distributed prefix),
  * nulls in the aggregated column, and a descending-order variant.
  */
class KeylessWindowSpec extends SparkSpec {
  import spark.implicits._

  // 40 rows, only 7 distinct keys → tie runs cross the 32 shuffle partitions
  private def df: DataFrame = {
    val rows = (0 until 40).map { i =>
      val k = i % 7
      val v: java.lang.Double = if (i % 11 == 0) null else i.toDouble
      (k, s"r$i", v)
    }
    rows.toDF("k", "id", "v")
  }

  private def viaOp(fn: String, extra: (String, Any)*): DataFrame =
    WindowFnOp(StageContext.one(spark, df, Cfg.of(
      (Seq("function" -> fn, "order_by" -> Seq("k"), "output_column" -> "w") ++ extra): _*)))

  private def naive(c: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("w", c.over(Window.partitionBy().orderBy(F.col("k").asc_nulls_first)))

  private def byId(d: DataFrame): Array[(String, Any)] =
    d.select("id", "w").collect().map(r => (r.getString(0), r.get(1))).sortBy(_._1)

  private def assertParity(fn: String, naiveCol: org.apache.spark.sql.Column,
      extra: (String, Any)*): Unit =
    assert(byId(viaOp(fn, extra: _*)) === byId(naive(naiveCol)), s"fn=$fn")

  test("rank family matches the single-partition plan across tie groups") {
    assertParity("rank", F.rank())
    assertParity("dense_rank", F.dense_rank())
    assertParity("percent_rank", F.percent_rank())
    assertParity("cume_dist", F.cume_dist())
  }

  test("running RANGE aggregates match, including null cells") {
    assertParity("sum", F.sum("v"), "column" -> "v")
    assertParity("min", F.min("v"), "column" -> "v")
    assertParity("max", F.max("v"), "column" -> "v")
    assertParity("count", F.count(F.lit(1)))
    val got = byId(viaOp("avg", "column" -> "v"))
    val want = byId(naive(F.avg("v")))
    got.zip(want).foreach { case ((gi, gv), (wi, wv)) =>
      assert(gi === wi)
      (gv, wv) match {
        case (null, null) =>
        case (a: Double, b: Double) => assert(math.abs(a - b) < 1e-9)
        case other => fail(s"avg mismatch $other")
      }
    }
  }

  test("positional functions: row_number total order, ntile, lag, lead") {
    // row_number over ties is order-dependent; assert on a UNIQUE order key
    val u = df.withColumn("uk", F.col("id"))
    def viaU(fn: String, extra: (String, Any)*) =
      WindowFnOp(StageContext.one(spark, u, Cfg.of(
        (Seq("function" -> fn, "order_by" -> Seq("uk"), "output_column" -> "w") ++ extra): _*)))
    def naiveU(c: org.apache.spark.sql.Column) =
      u.withColumn("w", c.over(Window.partitionBy().orderBy(F.col("uk").asc_nulls_first)))
    assert(byId(viaU("row_number")) === byId(naiveU(F.row_number())))
    assert(byId(viaU("ntile", "n" -> 6L)) === byId(naiveU(F.ntile(6))))
    assert(byId(viaU("lag", "column" -> "v", "offset" -> 3L)) ===
      byId(naiveU(F.lag(F.col("v"), 3))))
    assert(byId(viaU("lead", "column" -> "v", "offset" -> 3L)) ===
      byId(naiveU(F.lead(F.col("v"), 3))))
  }

  test("descending order and keyless asof agree with the windowed plan") {
    assert(byId(viaOp("rank", "descending" -> true)) ===
      byId(df.withColumn("w", F.rank().over(
        Window.partitionBy().orderBy(F.col("k").desc_nulls_first)))))

    // keyless asof: by=[] takes the RDD two-pass path
    val trades = Seq((1L, 10.0), (5L, 11.0), (10L, 12.0), (3L, 20.0)).toDF("t", "px")
    val quotes = Seq((0L, 9.9), (5L, 10.9), (8L, 11.5)).toDF("t", "bid")
    val out = AsofJoinOp(StageContext(spark, Seq("l" -> trades, "r" -> quotes),
      Cfg.of("on" -> "t", "right_prefix" -> "q_")))
      .select("t", "px", "q_t", "q_bid")
      .as[(Long, Double, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(out === Array(
      (1L, 10.0, Some(0L), Some(9.9)),
      (3L, 20.0, Some(0L), Some(9.9)),
      (5L, 11.0, Some(5L), Some(10.9)),
      (10L, 12.0, Some(8L), Some(11.5))))
  }

  test("keyless plans never contain a SinglePartition exchange") {
    def planOf(d: DataFrame): String = d.queryExecution.executedPlan.toString
    val plans = Seq(
      planOf(viaOp("rank")),
      planOf(viaOp("sum", "column" -> "v")),
      planOf(AsofJoinOp(StageContext(spark,
        Seq("l" -> Seq((1L, 1.0)).toDF("t", "px"), "r" -> Seq((0L, 2.0)).toDF("t", "bid")),
        Cfg.of("on" -> "t")))))
    plans.foreach(p => assert(!p.contains("SinglePartition"), p.linesIterator.take(5).mkString("\n")))
  }
}
