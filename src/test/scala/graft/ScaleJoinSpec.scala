package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators._
import graft.sources.TableSource
import graft.sinks.TableSink

/** Scale-path join mechanics: skew salting and bucketed co-location. */
class ScaleJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows of one hot key + a tail, against a 3-row dim
  private def skewedFact = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 3).toLong, i))
    .toDF("k", "v")
  private def dim = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "name")

  private def join(cfg: Cfg) =
    JoinOp(StageContext(spark, Seq("l" -> skewedFact, "r" -> dim), cfg))

  test("join.apply salt: inner/left/semi/anti match the unsalted result") {
    for (how <- Seq("inner", "left", "semi", "anti")) {
      val plain = join(Cfg.of("on" -> Seq("k"), "how" -> how))
      val salted = join(Cfg.of("on" -> Seq("k"), "how" -> how, "salt" -> 4))
      assert(salted.columns === plain.columns, s"columns for $how")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salted $how join differs from plain")
    }
  }

  test("join.apply salt with left_on/right_on keeps both key columns") {
    val r = dim.withColumnRenamed("k", "dk")
    val out = JoinOp(StageContext(spark, Seq("l" -> skewedFact, "r" -> r),
      Cfg.of("left_on" -> "k", "right_on" -> "dk", "salt" -> 4)))
    assert(out.columns.toSeq === Seq("k", "v", "dk", "name"))
    assert(out.count() === 1000L)
  }

  test("join.apply salt rejects right/full joins (right rows would replicate)") {
    intercept[GraftConfigError] { join(Cfg.of("on" -> Seq("k"), "how" -> "right", "salt" -> 4)) }
    intercept[GraftConfigError] { join(Cfg.of("on" -> Seq("k"), "how" -> "full", "salt" -> 4)) }
  }

  test("table.write bucketed: co-located join plans with zero Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    val facts = (1 to 100).map(i => (i.toLong % 10, i.toLong)).toDF("k", "v")
    val dims = (0L to 9L).map(i => (i, s"d$i")).toDF("k", "name")
    def write(df: org.apache.spark.sql.DataFrame, tbl: String): Unit =
      TableSink(StageContext.one(spark, df, Cfg.of(
        "table" -> tbl, "path" -> s"$wh/$tbl",
        "bucket_by" -> Seq("k"), "sort_by" -> Seq("k"), "buckets" -> 4)))
    try {
      write(facts, "graft_fact_b")
      write(dims, "graft_dim_b")
      val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val f = TableSource(StageContext(spark, Seq.empty, Cfg.of("name" -> "graft_fact_b")))
        val d = TableSource(StageContext(spark, Seq.empty, Cfg.of("name" -> "graft_dim_b")))
        val joined = JoinOp(StageContext(spark, Seq("l" -> f, "r" -> d),
          Cfg.of("on" -> Seq("k"), "broadcast" -> "none")))
        val plan = joined.queryExecution.sparkPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join should be exchange-free, got:\n$plan")
        assert(joined.count() === 100L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
      spark.sql("DROP TABLE IF EXISTS graft_dim_b")
    }
  }

  test("repartition.apply: hash/range/coalesce control partition layout") {
    val df = (1 to 100).map(i => (i.toLong % 10, i.toLong)).toDF("k", "v")
    def run(cfg: Cfg) = RepartitionOp(StageContext.one(spark, df, cfg))
    assert(run(Cfg.of("n" -> 7)).rdd.getNumPartitions === 7)
    assert(run(Cfg.of("n" -> 5, "by" -> Seq("k"))).rdd.getNumPartitions === 5)
    assert(run(Cfg.of("mode" -> "coalesce", "n" -> 1)).rdd.getNumPartitions === 1)
    val ranged = run(Cfg.of("mode" -> "range", "n" -> 4, "by" -> Seq("v")))
    assert(ranged.rdd.getNumPartitions <= 4)
    // range layout: partition-local max < next partition's min
    val perPart = ranged.select("v").rdd
      .mapPartitionsWithIndex((i, it) => { val s = it.map(_.getLong(0)).toSeq
        if (s.isEmpty) Iterator.empty else Iterator((i, s.min, s.max)) })
      .collect().sortBy(_._1)
    perPart.sliding(2).foreach {
      case Array((_, _, max1), (_, min2, _)) => assert(max1 < min2)
      case _ =>
    }
    intercept[GraftConfigError](run(Cfg.of("mode" -> "coalesce")))
  }

  test("table.read by catalog name round-trips table.write") {
    val wh = java.nio.file.Files.createTempDirectory("graft_tbl_").toString
    try {
      TableSink(StageContext.one(spark, salesDf, Cfg.of(
        "table" -> "graft_sales_rt", "path" -> s"$wh/t")))
      val back = TableSource(StageContext(spark, Seq.empty, Cfg.of("name" -> "graft_sales_rt")))
      assert(back.orderBy("id").collect() === salesDf.orderBy("id").collect())
    } finally spark.sql("DROP TABLE IF EXISTS graft_sales_rt")
  }
}
