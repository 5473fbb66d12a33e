package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.MixOp

/** mix.apply: integer copies, deterministic fractional sampling, source
  * tagging, by-name union. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def corpusA = (1L to 100L).map(i => (i, s"a$i")).toDF("id", "text")
  private def corpusB = (1L to 100L).map(i => (i + 1000, s"b$i")).toDF("id", "text")

  private def mix(cfg: (String, Any)*) =
    MixOp(StageContext(spark, Seq("a" -> corpusA, "b" -> corpusB), Cfg.of(cfg: _*)))

  test("integer weights are exact copy counts; zero drops an input") {
    val out = mix("weights" -> Seq(2.0, 1.0), "source_column" -> "src",
      "sources" -> Seq("wiki", "web"))
    assert(out.filter($"src" === "wiki").count() === 200L)
    assert(out.filter($"src" === "web").count() === 100L)
    // every wiki row exactly twice
    assert(out.filter($"src" === "wiki").groupBy("id").count()
      .filter($"count" =!= 2).count() === 0L)
    assert(mix("weights" -> Seq(0.0, 1.0)).count() === 100L)
  }

  test("fractional weights sample deterministically around the expectation") {
    def ids(seed: Long) = mix("weights" -> Seq(0.3, 0.0), "seed" -> seed)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids(7L) === ids(7L))
    val n = ids(7L).size
    assert(n > 10 && n < 60, s"~30 of 100 expected, got $n")
    // 2.5 = two full copies + ~half a third
    val counts = mix("weights" -> Seq(2.5, 0.0))
      .groupBy("id").count().select("count").as[Long].collect()
    assert(counts.forall(c => c == 2L || c == 3L))
    assert(counts.count(_ == 3L) > 10 && counts.count(_ == 3L) < 90)
  }

  test("temperature derives weights from measured source sizes") {
    // sources 400 vs 100 rows
    val big = (1L to 400L).map(i => (i, s"big$i")).toDF("id", "text")
    val small = (1L to 100L).map(i => (i + 10000, s"small$i")).toDF("id", "text")
    def tmix(cfg: (String, Any)*) = MixOp(StageContext(spark,
      Seq("big" -> big, "small" -> small),
      Cfg.of((Seq[(String, Any)]("source_column" -> "src",
        "sources" -> Seq("big", "small")) ++ cfg): _*)))

    // α = 1, target = 2× total: natural proportions, every row exactly
    // twice (the snap keeps integer-intent weights exactly integer)
    val doubled = tmix("temperature" -> 1.0, "target_rows" -> 1000)
    assert(doubled.count() === 1000L)
    assert(doubled.groupBy("id").count()
      .filter($"count" =!= 2).count() === 0L)

    // α = 0: sources equalize — ~250 rows each (small upsamples 2.5×,
    // big downsamples to 0.625), realized counts near expectation
    val flat = tmix("temperature" -> 0.0)
    val bySrc = flat.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySrc("big") - 250L) < 40, s"big: ${bySrc("big")}")
    assert(math.abs(bySrc("small") - 250L) < 40, s"small: ${bySrc("small")}")

    // α = 0.3 sits between natural (400/100) and flat (250/250)
    val t3 = tmix("temperature" -> 0.3)
    val by3 = t3.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by3("big") > bySrc("big") && by3("big") < 400L,
      s"α=0.3 big ${by3("big")} should sit between flat ${bySrc("big")} and natural 400")

    // exclusivity + validation
    intercept[GraftConfigError](tmix("temperature" -> 0.3, "weights" -> Seq(1.0, 1.0)))
    intercept[GraftConfigError](tmix("weights" -> Seq(1.0, 1.0), "target_rows" -> 10))
    intercept[GraftConfigError](tmix("temperature" -> -0.5))
  }

  test("temperatureWeights: empty sources get zero weight, never poison the sum") {
    // private[graft]: callable from the spec package directly
    val w = MixOp.temperatureWeights(Vector(0L, 100L), 0.0, 100.0)
    assert(w(0) === 0.0 && w(1) === 1.0)
    assert(MixOp.temperatureWeights(Vector(0L, 0L), 0.3, 100.0) === Vector(0.0, 0.0))
    // α = 1 exact-multiple targets snap to integers
    assert(MixOp.temperatureWeights(Vector(300L, 700L), 1.0, 2000.0) === Vector(2.0, 2.0))
  }

  test("missing columns need the explicit flag; weight/name arity checked") {
    val skinny = Seq((1L, "x")).toDF("id", "text")
    val extra = Seq((2L, "y", 0.5)).toDF("id", "text", "quality")
    intercept[org.apache.spark.sql.AnalysisException] {
      MixOp(StageContext(spark, Seq("a" -> skinny, "b" -> extra), Cfg.of())).count()
    }
    val ok = MixOp(StageContext(spark, Seq("a" -> skinny, "b" -> extra),
      Cfg.of("allow_missing_columns" -> true)))
    assert(ok.count() === 2L)
    intercept[GraftConfigError](mix("weights" -> Seq(1.0)))
    intercept[GraftConfigError](mix("weights" -> Seq(-1.0, 1.0)))
    intercept[GraftConfigError](mix("sources" -> Seq("only-one")))
  }

  test("id_column decorrelates duplicate rows; source_column collisions rejected") {
    // 50 byte-identical copies of one row: content hashing keeps or drops
    // them as a block; id hashing decides per row
    val dups = (1L to 50L).map(i => (i, "same text")).toDF("id", "text")
    val byContent = MixOp(StageContext(spark, Seq("a" -> dups.drop("id")),
      Cfg.of("weights" -> Seq(0.5)))).count()
    assert(byContent === 0L || byContent === 50L) // all-or-nothing block
    val byId = MixOp(StageContext(spark, Seq("a" -> dups),
      Cfg.of("weights" -> Seq(0.5), "id_column" -> "id"))).count()
    assert(byId > 10L && byId < 40L, s"~25 of 50 expected, got $byId")
    // same seed+id → same decision, regardless of content
    val byId2 = MixOp(StageContext(spark,
      Seq("a" -> dups.withColumn("text", F.lit("other"))),
      Cfg.of("weights" -> Seq(0.5), "id_column" -> "id"))).count()
    assert(byId2 === byId)

    intercept[GraftConfigError](mix("source_column" -> "text"))
    intercept[GraftConfigError](
      MixOp(StageContext(spark, Seq("a" -> corpusA),
        Cfg.of("weights" -> Seq(0.5), "id_column" -> "nope"))))
  }

  test("no shuffle in the mixing plan") {
    val plan = mix("weights" -> Seq(2.0, 0.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("temperature sizes parquet inputs from footers: zero jobs, identical weights") {
    // two parquet corpora on disk — the real "mix these corpora" shape
    val dir = java.nio.file.Files.createTempDirectory("graft_mix_ft").toString
    corpusA.write.parquet(s"$dir/a")
    corpusB.limit(40).write.parquet(s"$dir/b")
    val pa = spark.read.parquet(s"$dir/a")
    val pb = spark.read.parquet(s"$dir/b")
    // the scan shortcut prices these from footers
    assert(MixOp.scanRowCount(pa) === Some(100L))
    assert(MixOp.scanRowCount(pb.select("id", "text")) === Some(40L),
      "row-preserving projection keeps the shortcut")
    // cardinality-changing plans must NOT shortcut
    assert(MixOp.scanRowCount(pa.filter($"id" > 50)) === None)
    assert(MixOp.scanRowCount(corpusA) === None, "in-memory input is not a file scan")

    // composing a temperature mix over pure scans issues NO Spark job
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val fromFooters = try {
      val out = MixOp(StageContext(spark, Seq("a" -> pa, "b" -> pb),
        Cfg.of("temperature" -> 1.0, "target_rows" -> 280, "source_column" -> "src")))
      Thread.sleep(500) // listener bus is async
      assert(jobs.get() === 0,
        s"temperature sizing over parquet scans issued ${jobs.get()} count jobs")
      out
    } finally spark.sparkContext.removeSparkListener(listener)
    // identical weights to the count() path: α=1, target 2×(100+40) →
    // exactly 2 copies of every row either way
    assert(fromFooters.count() === 280L)
    val viaCount = MixOp(StageContext(spark,
      Seq("a" -> pa.filter(F.lit(true)), "b" -> pb.filter(F.lit(true))),
      Cfg.of("temperature" -> 1.0, "target_rows" -> 280, "source_column" -> "src")))
    assert(fromFooters.select("id", "src").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq ===
      viaCount.select("id", "src").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq, "footer-priced and count()-priced mixes must be identical")
  }
}
