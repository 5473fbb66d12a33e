package graft

import org.apache.spark.sql.{functions => F}
import graft.config._
import graft.core._
import graft.operators._
import graft.streaming._

class WindowSpec extends SparkSpec {
  import spark.implicits._

  private def seqDf = (0L until 10L).map(i => (i, i * 10)).toDF("id", "v").repartition(3)

  test("count tumbling windows: exact sizes in order") {
    val out = CountWindowOp(StageContext.one(spark, seqDf, Cfg.of(
      "type" -> "tumbling", "size" -> 3, "order_by" -> Seq("id"))))
    val grouped = out.groupBy("window_id").agg(
      F.count(F.lit(1)).alias("n"), F.min("id").alias("mn"), F.max("id").alias("mx"))
      .orderBy("window_id").collect()
    assert(grouped.map(_.getLong(1)).toSeq == Seq(3L, 3L, 3L, 1L))
    assert(grouped.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 2L), (3L, 5L), (6L, 8L), (9L, 9L)))
  }

  test("count sliding windows: hop membership (size 4, slide 2)") {
    val out = CountWindowOp(StageContext.one(spark, seqDf, Cfg.of(
      "type" -> "sliding", "size" -> 4, "slide" -> 2, "order_by" -> Seq("id"))))
    val w0 = out.filter("window_id = 0").select("id").collect().map(_.getLong(0)).sorted.toSeq
    val w1 = out.filter("window_id = 1").select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(w0 == Seq(0L, 1L, 2L, 3L))
    assert(w1 == Seq(2L, 3L, 4L, 5L))
    // row 5 belongs to windows 1 and 2 only
    assert(out.filter("id = 5").select("window_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("sampling windows (slide > size): gap rows belong to NO window") {
    // size 2, slide 5: windows cover rows {0,1}, {5,6}; rows 2-4 and 7-9
    // are in inter-window gaps — the round-2 review caught sequence(lo, hi)
    // counting DOWN for them and inventing windows
    def gaps(df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.select("id", "window_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === Seq((0L, 0L), (1L, 0L), (5L, 1L), (6L, 1L)), got)
    }
    gaps(CountWindowOp(StageContext.one(spark, seqDf, Cfg.of(
      "type" -> "sliding", "size" -> 2, "slide" -> 5, "order_by" -> Seq("id")))))
    // keyed batch path shares the arithmetic — one constant key
    val keyed = seqDf.withColumn("k", F.lit("x"))
    gaps(CountWindowOp(StageContext.one(spark, keyed, Cfg.of(
      "type" -> "sliding", "size" -> 2, "slide" -> 5,
      "group_by" -> Seq("k"), "order_by" -> Seq("id")))).drop("k"))
  }

  test("count session windows: gap on a numeric column") {
    val df = Seq(0.0, 1.0, 2.0, 50.0, 51.0, 120.0).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val out = CountWindowOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "session", "gap" -> 10.0, "order_by" -> Seq("t"), "gap_column" -> "t")))
    val sessions = out.groupBy("window_id").count().orderBy("window_id")
      .collect().map(_.getLong(1)).toSeq
    assert(sessions == Seq(3L, 2L, 1L))
  }

  test("aggregate.stream: per-window and whole-input modes") {
    val win = CountWindowOp(StageContext.one(spark, seqDf, Cfg.of(
      "type" -> "tumbling", "size" -> 5, "order_by" -> Seq("id"))))
    val agg = AggregateStreamOp(StageContext.one(spark, win, Cfg.of(
      "operation" -> "sum", "value_column" -> "v")))
      .orderBy("window_id").collect()
    assert(agg.map(_.getLong(1)).toSeq == Seq(100L, 350L)) // 0+..+40, 50+..+90
    val whole = AggregateStreamOp(StageContext.one(spark, seqDf, Cfg.of(
      "operation" -> "count")))
    assert(whole.head().getLong(0) == 10L)
  }

  test("time windows: tumbling hour buckets") {
    val df = Seq(
      java.sql.Timestamp.valueOf("2026-01-01 10:15:00"),
      java.sql.Timestamp.valueOf("2026-01-01 10:45:00"),
      java.sql.Timestamp.valueOf("2026-01-01 11:05:00")).toDF("ts")
    val win = TimeWindowOp(StageContext.one(spark, df, Cfg.of(
      "ts_column" -> "ts", "size" -> "1 hour")))
    val counts = win.groupBy("window").count().orderBy("window.start")
      .select("count").collect().map(_.getLong(0)).toSeq
    assert(counts == Seq(2L, 1L))
  }

  test("session windows: gap merge semantics") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:03:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:20:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))).toDF("uid", "ts")
    val out = SessionWindowOp(StageContext.one(spark, df, Cfg.of(
      "ts_column" -> "ts", "gap" -> "5 minutes", "group_by" -> Seq("uid"))))
    val sessions = out.select("uid", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sessions == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }
}

class DagCompilerSpec extends SparkSpec {

  private def run(toml: String): Map[String, org.apache.spark.sql.DataFrame] =
    DagCompiler.default.run(spark, PipelineConfig.fromString(toml))

  test("linear pipeline end-to-end with inline source and csv sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dag").toString
    val out = run(
      s"""[pipeline]
         |name = "t"
         |[[stages]]
         |id = "src"
         |function = "inline.data"
         |[stages.config]
         |jsonl = '''
         |{"id": 1, "v": 100}
         |{"id": 2, "v": 200}
         |{"id": 3, "v": 150}
         |'''
         |[[stages]]
         |id = "big"
         |function = "filter.apply"
         |inputs = ["src"]
         |config = { column = "v", operator = ">=", value = 150 }
         |[[stages]]
         |id = "sink"
         |function = "csv.write"
         |inputs = ["big"]
         |config = { path = "$dir/out" }
         |""".stripMargin)
    assert(out("big").count() == 2)
    val files = new java.io.File(s"$dir/out").listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "id,v" && lines.size == 3)
  }

  test("cycle detection rejects cyclic DAGs") {
    intercept[GraftPlanError](run(
      """[pipeline]
        |name = "c"
        |[[stages]]
        |id = "a"
        |function = "filter.apply"
        |inputs = ["b"]
        |config = { column = "x", value = 1 }
        |[[stages]]
        |id = "b"
        |function = "filter.apply"
        |inputs = ["a"]
        |config = { column = "x", value = 1 }
        |""".stripMargin))
  }

  test("continue strategy: failing sink does not abort the pipeline") {
    val out = run(
      """[pipeline]
        |name = "cont"
        |[error_handling]
        |strategy = "continue"
        |[[stages]]
        |id = "src"
        |function = "inline.data"
        |config = { jsonl = "{\"x\": 1}" }
        |[[stages]]
        |id = "bad"
        |function = "csv.write"
        |inputs = ["src"]
        |config = { path = "/proc/definitely/not/writable/xx" }
        |[[stages]]
        |id = "ok"
        |function = "stdout.write"
        |inputs = ["src"]
        |config = { format = "jsonl", limit = 1 }
        |""".stripMargin)
    assert(out("src").count() == 1)
  }

  test("stop strategy: failing sink aborts") {
    intercept[Exception](run(
      """[pipeline]
        |name = "stop"
        |[[stages]]
        |id = "src"
        |function = "inline.data"
        |config = { jsonl = "{\"x\": 1}" }
        |[[stages]]
        |id = "bad"
        |function = "csv.write"
        |inputs = ["src"]
        |config = { path = "/proc/definitely/not/writable/xx" }
        |""".stripMargin))
  }

  test("sub-pipeline returns its terminal frame (reference TODO fixed)") {
    val out = run(
      """[pipeline]
        |name = "outer"
        |[[stages]]
        |id = "sub"
        |function = "stage.pipeline"
        |[stages.config]
        |inline = '''
        |[pipeline]
        |name = "inner"
        |[[stages]]
        |id = "src"
        |function = "inline.data"
        |config = { jsonl = "{\"x\": 41}" }
        |[[stages]]
        |id = "inc"
        |function = "map.apply"
        |inputs = ["src"]
        |config = { expression = "x + 1", output_column = "y" }
        |'''
        |""".stripMargin)
    assert(out("sub").select("y").head().getDouble(0) == 42.0)
  }

  test("unknown function error lists available names") {
    val e = intercept[GraftConfigError](run(
      """[pipeline]
        |name = "u"
        |[[stages]]
        |id = "x"
        |function = "bogus.op"
        |""".stripMargin))
    assert(e.getMessage.contains("bogus.op") && e.getMessage.contains("filter.apply"))
  }
}

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("template renders row fields, leaves unknown placeholders") {
    val row = salesDf.filter("id = 1").head()
    assert(Template.render("u/{{id}}/{{name}}", row) == "u/1/Alice")
    assert(Template.render("{{ id }} spaced", row) == "1 spaced")
    assert(Template.render("{{missing}}", row) == "{{missing}}")
  }

  test("http.fetch mock per_row appends deterministic result") {
    val out = HttpFetchOp(StageContext.one(spark, salesDf, Cfg.of(
      "url" -> "https://api.test/users/{{id}}", "mock" -> true, "concurrency" -> 2)))
    val rows = out.select("id", "http_result").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == """{"mock":true,"url":"https://api.test/users/1"}""")
    assert(rows.size == 3)
  }

  test("http.fetch mock batch mode sets one shared result") {
    val out = HttpFetchOp(StageContext.one(spark, salesDf, Cfg.of(
      "url" -> "https://api.test/all", "mode" -> "batch", "mock" -> true)))
    assert(out.select("http_result").distinct().count() == 1)
  }

  test("ai.generate request bodies are valid shapes per provider") {
    val b = AiGenerateOp.requestBody("anthropic", "m", "hi \"there\"", 100, 0.5)
    assert(b.contains("\"max_tokens\":100") && b.contains("\\\"there\\\""))
    val o = AiGenerateOp.requestBody("ollama", "m", "p", 10, 0.0)
    assert(o.contains("\"stream\":false"))
    intercept[GraftConfigError](AiGenerateOp.requestBody("bad", "m", "p", 1, 0.0))
  }

  test("ai.generate mock appends templated response") {
    val out = AiGenerateOp(StageContext.one(spark, salesDf, Cfg.of(
      "provider" -> "openai", "model" -> "gpt-test",
      "prompt" -> "Hello {{name}}", "output_column" -> "resp", "mock" -> true)))
    val r = out.filter("id = 2").select("resp").head().getString(0)
    assert(r == "[mock:openai/gpt-test] Hello Bob")
  }
}

class DlqConnectorSpec extends SparkSpec {
  import spark.implicits._

  test("DLQ: failing sink's input quarantined with error note under continue") {
    val dlq = java.nio.file.Files.createTempDirectory("graft_dlq").toString
    graft.core.DagCompiler.default.run(spark, graft.config.PipelineConfig.fromString(
      s"""[pipeline]
         |name = "dlq"
         |[error_handling]
         |strategy = "continue"
         |dead_letter_queue = { path = "$dlq" }
         |[[stages]]
         |id = "src"
         |function = "inline.data"
         |config = { jsonl = "{\\"x\\": 1}\\n{\\"x\\": 2}" }
         |[[stages]]
         |id = "bad"
         |function = "csv.write"
         |inputs = ["src"]
         |config = { path = "/proc/not/writable/x" }
         |""".stripMargin))
    val saved = spark.read.parquet(s"$dlq/bad")
    assert(saved.count() == 2)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dlq/bad/_error.txt")))
  }

  test("global timeout_seconds aborts a stuck pipeline; absent = unlimited") {
    val slow =
      """[pipeline]
        |name = "slow"
        |[global]
        |timeout_seconds = 2
        |[[stages]]
        |id = "src"
        |function = "inline.data"
        |config = { jsonl = "{\"u\": \"a\"}\n{\"u\": \"b\"}" }
        |[[stages]]
        |id = "fetch"
        |function = "http.fetch"
        |inputs = ["src"]
        |config = { url = "https://x/{{u}}", mock = true, mock_latency_ms = 60000, concurrency = 1 }
        |[[stages]]
        |id = "out"
        |function = "noop.sink"
        |inputs = ["fetch"]
        |""".stripMargin
    val t0 = System.nanoTime()
    val e = intercept[graft.core.GraftPlanError] {
      graft.core.DagCompiler.default.run(spark,
        graft.config.PipelineConfig.fromString(slow))
    }
    assert(e.getMessage.contains("timeout_seconds"))
    assert((System.nanoTime() - t0) / 1e9 < 30, "timeout must fire near the deadline")
    // a fast pipeline under a generous timeout completes normally
    val ok = graft.core.DagCompiler.default.run(spark,
      graft.config.PipelineConfig.fromString(
        """[pipeline]
          |name = "fast"
          |[global]
          |timeout_seconds = 120
          |[[stages]]
          |id = "src"
          |function = "inline.data"
          |config = { jsonl = "{\"x\": 1}" }
          |""".stripMargin))
    assert(ok("src").count() === 1L)
  }

  test("rate_limit_per_sec paces enrichment launches (mock mode)") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"u$i")).toDF("id", "name").repartition(1)
    def elapsedMs(body: => Unit): Long = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000000L
    }
    // 10 requests at 20/s = 9 pacing intervals × 50 ms ≥ 450 ms minimum
    val paced = elapsedMs {
      graft.operators.HttpFetchOp(graft.core.StageContext.one(spark, df,
        graft.config.Cfg.of("url" -> "https://x/{{name}}", "mock" -> true,
          "rate_limit_per_sec" -> 20.0))).collect()
    }
    assert(paced >= 400, s"http.fetch paced run took ${paced}ms — pacing not applied")
    val aiPaced = elapsedMs {
      graft.operators.AiGenerateOp(graft.core.StageContext.one(spark, df,
        graft.config.Cfg.of("provider" -> "openai", "model" -> "m",
          "prompt" -> "p {{name}}", "output_column" -> "resp", "mock" -> true,
          "rate_limit_per_sec" -> 20.0))).collect()
    }
    assert(aiPaced >= 400, s"ai.generate paced run took ${aiPaced}ms — pacing not applied")
  }

  test("http.get source: mock_response json array -> rows, object -> one row") {
    val arr = graft.operators.HttpGetSource(graft.core.StageContext(spark, Seq.empty,
      graft.config.Cfg.of("url" -> "https://x/api",
        "mock_response" -> """[{"id": 1, "n": "a"}, {"id": 2, "n": "b"}]"""), "h"))
    assert(arr.count() == 2 && arr.columns.toSet == Set("id", "n"))
    val obj = graft.operators.HttpPostSource(graft.core.StageContext(spark, Seq.empty,
      graft.config.Cfg.of("url" -> "https://x/api", "body" -> "{}",
        "mock_response" -> """{"ok": true}"""), "h"))
    assert(obj.count() == 1 && obj.head().getBoolean(0))
  }

  test("reference-name aliases resolve; full mongo family registered") {
    val reg = graft.core.Registry.withDefaults
    assert(reg.contains("file.watch"))
    assert(reg.contains("stdout_stream.write"))
    for (op <- Seq("find", "findOne", "aggregate", "insertMany", "insertOne",
      "updateOne", "updateMany", "deleteOne", "deleteMany", "replaceOne",
      "replaceMany", "bulkWrite", "toObjectId"))
      assert(reg.contains(s"mongodb.$op"), s"missing mongodb.$op")
    for (m <- Seq("get", "post", "put", "patch", "delete"))
      assert(reg.contains(s"http.$m"), s"missing http.$m")
  }

  test("mongodb.toObjectId wraps 24-hex strings, passes others through") {
    val df = Seq("507f1f77bcf86cd799439011", "not-an-oid").toDF("mid")
    val out = graft.operators.MongoToObjectIdOp(graft.core.StageContext.one(
      spark, df, graft.config.Cfg.of("column" -> "mid")))
      .collect().map(_.getString(0)).toSeq
    assert(out(0) == """{"$oid": "507f1f77bcf86cd799439011"}""")
    assert(out(1) == "not-an-oid")
  }
}
