package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.{GraftPlanError, StageContext}
import graft.operators.{KafkaConsumeSource, KafkaLog, KafkaProduceSink, KafkaStatsOp}
import scala.jdk.CollectionConverters._

/** File-backed kafka.consume / kafka.produce: roundtrip parsing, group
  * offset commit/resume, deterministic partition routing, per-partition
  * offset density, non-JSON payload wrapping, and the live-broker gap. */
class KafkaSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_kafka").toString

  private def produce(root: String, cfg: (String, Any)*): Unit =
    KafkaProduceSink(StageContext.one(spark, salesDf,
      Cfg.of(Seq("path" -> root, "topic" -> "sales") ++ cfg: _*)))

  private def consume(root: String, cfg: (String, Any)*) =
    KafkaConsumeSource(StageContext(spark, Seq.empty,
      Cfg.of(Seq("path" -> root, "topic" -> "sales", "group_id" -> "g1") ++ cfg: _*)))

  test("produce → consume round-trips values with kafka metadata merged in") {
    val root = freshRoot()
    produce(root, "key_field" -> "name")
    val got = consume(root)
    assert(got.columns.sorted.toSeq === Seq("_kafka_key", "_kafka_offset",
      "_kafka_partition", "_kafka_payload", "_kafka_timestamp", "id", "name", "value"))
    val rows = got.orderBy("id")
      .select("id", "name", "value", "_kafka_key", "_kafka_partition", "_kafka_offset")
      .as[(Long, String, Long, String, Int, Long)].collect()
    assert(rows.map(r => (r._1, r._2, r._3)) ===
      Array((1L, "Alice", 100L), (2L, "Bob", 200L), (3L, "Charlie", 150L)))
    // key mirrors key_field; single partition (default) numbers offsets densely
    assert(rows.forall(r => r._4 == r._2 && r._5 == 0))
    assert(rows.map(_._6).sorted === Array(0L, 1L, 2L))
    // payload parsed fine → no raw fallback
    assert(got.filter(F.col("_kafka_payload").isNotNull).count() === 0)
  }

  test("group offsets: auto-commit resumes where the last consume stopped") {
    val root = freshRoot()
    produce(root)
    val first = consume(root, "max_messages" -> 2L)
    assert(first.count() === 2)
    val second = consume(root)
    assert(second.count() === 1)
    // the batch order contract is (offset, partition) ascending
    assert(second.select("_kafka_offset").as[Long].head() === 2L)
    assert(consume(root).count() === 0)
    // a different group still sees the full backlog
    assert(consume(root, "group_id" -> "g2").count() === 3)
  }

  test("commit=false leaves the group frontier untouched") {
    val root = freshRoot()
    produce(root)
    assert(consume(root, "commit" -> false).count() === 3)
    assert(consume(root).count() === 3)
  }

  test("starting_offsets=earliest replays past the committed frontier") {
    val root = freshRoot()
    produce(root)
    assert(consume(root).count() === 3) // commits to the end
    assert(consume(root).count() === 0)
    assert(consume(root, "starting_offsets" -> "earliest",
      "commit" -> false).count() === 3)
    intercept[graft.config.GraftConfigError](
      consume(root, "starting_offsets" -> "latest"))
  }

  test("keyed routing is deterministic; offsets continue across produces") {
    val root = freshRoot()
    produce(root, "key_field" -> "name", "num_partitions" -> 4L)
    produce(root, "key_field" -> "name")
    val got = consume(root, "max_messages" -> 0L)
    assert(got.count() === 6)
    // same key → same partition on both produces
    val byKey = got.groupBy("_kafka_key")
      .agg(F.countDistinct("_kafka_partition").as("nparts"),
           F.count(F.lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    assert(byKey.forall { case (_, nparts, n) => nparts == 1L && n == 2L })
    // offsets dense per partition: 0..count-1
    val dense = got.groupBy("_kafka_partition")
      .agg(F.min("_kafka_offset").as("lo"), F.max("_kafka_offset").as("hi"),
           F.count(F.lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect()
    assert(dense.forall { case (_, lo, hi, n) => lo == 0L && hi == n - 1 })
  }

  test("non-JSON payloads wrap as _kafka_payload; JSON rows keep fields") {
    val root = freshRoot()
    val dir = java.nio.file.Paths.get(root, "sales", "partition=0")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("seg.txt"), java.util.Arrays.asList(
      """{"offset": 0, "key": "a", "value": "{\"id\": 1, \"name\": \"Alice\"}"}""",
      """{"offset": 1, "value": "plain text, not json"}"""))
    val got = consume(root).orderBy("_kafka_offset")
      .select("id", "name", "_kafka_payload", "_kafka_key")
      .as[(Option[Long], Option[String], Option[String], Option[String])].collect()
    assert(got === Array(
      (Some(1L), Some("Alice"), None, Some("a")),
      (None, None, Some("plain text, not json"), None)))
  }

  test("value_format=raw and an explicit schema DDL both skip inference") {
    val root = freshRoot()
    produce(root)
    val raw = consume(root, "commit" -> false, "value_format" -> "raw")
    assert(raw.columns.contains("_kafka_payload") && !raw.columns.contains("id"))
    assert(raw.count() === 3)
    val typed = consume(root, "commit" -> false,
      "schema" -> "id LONG, name STRING, value LONG")
    assert(typed.select(F.sum("value")).as[Long].head() === 450L)
  }

  test("max_messages=0 reads the whole backlog without a top-k") {
    val root = freshRoot()
    produce(root)
    val plan = consume(root, "commit" -> false, "max_messages" -> 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrdered"))
  }

  test("live-broker config raises the gap error naming the jar") {
    val eC = intercept[GraftPlanError] {
      KafkaConsumeSource(StageContext(spark, Seq.empty, Cfg.of(
        "brokers" -> "k:9092", "topic" -> "t", "group_id" -> "g")))
    }
    assert(eC.getMessage.contains("spark-sql-kafka-0-10"))
    val eP = intercept[GraftPlanError] {
      KafkaProduceSink(StageContext.one(spark, salesDf, Cfg.of(
        "brokers" -> "k:9092", "topic" -> "t")))
    }
    assert(eP.getMessage.contains("spark-sql-kafka-0-10"))
  }

  test("consume of a missing topic and partition shrink both fail loud") {
    val root = freshRoot()
    val e = intercept[GraftPlanError] { consume(root) }
    assert(e.getMessage.contains("topic 'sales' not found"))
    produce(root, "num_partitions" -> 4L, "key_field" -> "name")
    val e2 = intercept[GraftConfigError] { produce(root, "num_partitions" -> 2L) }
    assert(e2.getMessage.contains("cannot shrink"))
  }

  test("committed frontier prunes whole segments from the consume scan") {
    val root = freshRoot()
    // three produce batches = three segments in partition 0
    for (batch <- 0 to 2)
      KafkaProduceSink(StageContext.one(spark,
        spark.range(batch * 10, batch * 10 + 10)
          .selectExpr("id", "concat('u', id) AS name"),
        Cfg.of("path" -> root, "topic" -> "sales")))
    // drain the first two segments (20 messages), committing
    assert(consume(root, "max_messages" -> 20L).count() === 20)
    // commit=false: a committing bounded consume persists its batch (the
    // frontier and the delivered rows must agree), which hides the file
    // scan from inputFiles — the pruning shape is the same either way
    val tail = consume(root, "commit" -> false, "schema" -> "id LONG, name STRING")
    assert(tail.count() === 10)
    // only the third segment is read: pruning, not just filtering
    assert(tail.inputFiles.length === 1,
      s"expected 1 surviving segment, scanned: ${tail.inputFiles.mkString(", ")}")
    // a fresh group still scans everything
    assert(consume(root, "group_id" -> "g2", "max_messages" -> 0L)
      .inputFiles.length === 3)
  }

  test("kafka.stream reads the log as a stream; new produces arrive exactly-once") {
    val root = freshRoot()
    produce(root, "key_field" -> "name")
    val src = graft.operators.KafkaStreamSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> root, "topic" -> "sales",
      "schema" -> "id LONG, name STRING, value LONG")))
    assert(src.isStreaming)
    assert(src.columns.contains("id") && src.columns.contains("_kafka_offset"))
    val q = src.writeStream.outputMode("append").format("memory")
      .queryName("kafka_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM kafka_stream_out").head().getLong(0) === 3L)
      KafkaProduceSink(StageContext.one(spark,
        spark.range(10, 12).selectExpr("id", "'X' AS name", "id * 10 AS value"),
        Cfg.of("path" -> root, "topic" -> "sales", "key_field" -> "name")))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM kafka_stream_out").head().getLong(0) === 5L)
      assert(spark.sql("SELECT sum(id) FROM kafka_stream_out").head().getLong(0) === 27L)
    } finally q.stop()
  }

  test("CLI explain never advances the group frontier") {
    val root = freshRoot()
    produce(root)
    val toml =
      s"""[pipeline]
         |name = "k"
         |[[stages]]
         |id = "src"
         |function = "kafka.consume"
         |config = { path = "$root", topic = "sales", group_id = "g1" }
         |[[stages]]
         |id = "keep"
         |function = "filter.apply"
         |inputs = ["src"]
         |config = { column = "_kafka_offset", operator = ">=", value = 0 }
         |""".stripMargin
    val plans = graft.core.DagCompiler.default.compilePlans(spark,
      graft.config.PipelineConfig.fromString(toml), explainOnly = true)
    // placeholder shape without a declared schema: raw payload + metadata
    assert(plans("src").columns.contains("_kafka_payload"))
    assert(KafkaLog.committed(root, "g1", "sales").isEmpty)
    // the next REAL consume still sees the whole backlog
    assert(consume(root).count() === 3)
  }

  test("explain of a pipeline that CREATES its topic shows placeholders, touches nothing") {
    val root = freshRoot()
    val toml =
      s"""[pipeline]
         |name = "k"
         |[[stages]]
         |id = "src"
         |function = "inline.data"
         |config = { jsonl = "{\\"id\\": 1}" }
         |[[stages]]
         |id = "produce"
         |function = "kafka.produce"
         |inputs = ["src"]
         |config = { path = "$root", topic = "fresh" }
         |[[stages]]
         |id = "consume"
         |function = "kafka.consume"
         |config = { path = "$root", topic = "fresh", group_id = "g1" }
         |[[stages]]
         |id = "compact"
         |function = "kafka.compact"
         |config = { path = "$root", topic = "fresh" }
         |""".stripMargin
    val plans = graft.core.DagCompiler.default.compilePlans(spark,
      graft.config.PipelineConfig.fromString(toml), explainOnly = true)
    assert(plans("consume").columns.contains("_kafka_payload"))
    assert(plans("compact").columns.contains("offset"))
    // nothing created: no topic dir, no offsets
    assert(!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, "fresh")))
    assert(KafkaLog.committed(root, "g1", "fresh").isEmpty)
  }

  test("pipeline run defers the commit: failed sink re-delivers, success commits") {
    val root = freshRoot()
    produce(root)
    def toml(sinkPath: String) =
      s"""[pipeline]
         |name = "k"
         |[[stages]]
         |id = "src"
         |function = "kafka.consume"
         |config = { path = "$root", topic = "sales", group_id = "g1", schema = "id LONG, name STRING, value LONG" }
         |[[stages]]
         |id = "out"
         |function = "csv.write"
         |inputs = ["src"]
         |config = { path = "$sinkPath" }
         |""".stripMargin
    intercept[Exception] {
      graft.core.DagCompiler.default.run(spark,
        graft.config.PipelineConfig.fromString(toml("/proc/not/writable/x")))
    }
    // failed sink → frontier untouched → the batch re-delivers next run
    assert(KafkaLog.committed(root, "g1", "sales").isEmpty)
    val ok = java.nio.file.Files.createTempDirectory("graft_kafka_out").resolve("ok")
    graft.core.DagCompiler.default.run(spark,
      graft.config.PipelineConfig.fromString(toml(ok.toString)))
    assert(KafkaLog.committed(root, "g1", "sales").values.sum === 3L)
    assert(consume(root).count() === 0)
  }

  test("retention_segments keeps only the newest N segments per partition") {
    val root = freshRoot()
    for (batch <- 0 to 2)
      KafkaProduceSink(StageContext.one(spark,
        spark.range(batch * 10, batch * 10 + 10).coalesce(1)
          .selectExpr("id", "concat('u', id) AS name"),
        Cfg.of("path" -> root, "topic" -> "sales", "retention_segments" -> 2L)))
    // only the newest two 10-row segments survive
    val got = consume(root, "group_id" -> "fresh", "max_messages" -> 0L,
      "schema" -> "id LONG, name STRING")
    assert(got.count() === 20)
    assert(got.agg(F.min("id"), F.max("id")).head() ===
      org.apache.spark.sql.Row(10L, 29L))
    assert(got.inputFiles.length === 2)
    // offsets continue past deleted segments on the next produce
    KafkaProduceSink(StageContext.one(spark,
      spark.range(100, 101).coalesce(1).selectExpr("id", "'x' AS name"),
      Cfg.of("path" -> root, "topic" -> "sales")))
    val tail = consume(root, "group_id" -> "fresh2", "max_messages" -> 0L,
      "schema" -> "id LONG, name STRING").filter(F.col("id") === 100)
    assert(tail.select("_kafka_offset").as[Long].head() === 30L)
  }

  test("kafka.compact keeps the highest-offset record per key, offsets sparse") {
    val root = freshRoot()
    // two generations of the same keys + one keyless record
    produce(root, "key_field" -> "name")                       // offsets 0-2
    KafkaProduceSink(StageContext.one(spark,
      salesDf.withColumn("value", F.col("value") * 10),
      Cfg.of("path" -> root, "topic" -> "sales", "key_field" -> "name"))) // 3-5
    KafkaProduceSink(StageContext.one(spark,
      spark.range(1).selectExpr("id", "'k' AS name", "id AS value"),
      Cfg.of("path" -> root, "topic" -> "sales")))             // keyless, 6
    val compacted = graft.operators.KafkaCompactOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "sales"), "c"))
    // keyless dropped; latest generation survives with ORIGINAL offsets
    val got = consume(root, "max_messages" -> 0L,
      "schema" -> "id LONG, name STRING, value LONG")
    assert(got.count() === 3)
    assert(got.select(F.sum("value")).as[Long].head() === 4500L) // 1000+2000+1500
    assert(got.select("_kafka_offset").as[Long].collect().sorted === Array(3L, 4L, 5L))
    assert(compacted.count() === 3)
    // produce after compact continues from the preserved end frontier
    produce(root, "key_field" -> "name")
    assert(consume(root, "group_id" -> "g2", "max_messages" -> 0L)
      .select(F.max("_kafka_offset")).as[Long].head() === 8L)
  }

  test("a failed run still releases the pinned consume batch (cleanup hook)") {
    val root = freshRoot()
    produce(root)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val good = java.nio.file.Files.createTempDirectory("graft_kafka_ok").resolve("g")
    // first sink succeeds (materializes the pinned batch cache), second
    // fails → Stop aborts the run. The unpersist used to be coupled to the
    // success-only commit deferral, leaking the cache on exactly this path.
    intercept[Exception] {
      graft.core.DagCompiler.default.run(spark, graft.config.PipelineConfig.fromString(
        s"""[pipeline]
           |name = "k"
           |[[stages]]
           |id = "src"
           |function = "kafka.consume"
           |config = { path = "$root", topic = "sales", group_id = "g1", schema = "id LONG, name STRING, value LONG" }
           |[[stages]]
           |id = "ok"
           |function = "csv.write"
           |inputs = ["src"]
           |config = { path = "$good" }
           |[[stages]]
           |id = "bad"
           |function = "csv.write"
           |inputs = ["src"]
           |config = { path = "/proc/not/writable/x" }
           |""".stripMargin))
    }
    (spark.sparkContext.getPersistentRDDs.keySet -- before).foreach { id =>
      println(s"LEAKED RDD $id: ${spark.sparkContext.getPersistentRDDs(id).toDebugString.linesIterator.take(3).mkString(" | ")}")
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "pinned consume batch must unpersist when the run fails")
    // and at-least-once still holds: no commit happened either
    assert(KafkaLog.committed(root, "g1", "sales").isEmpty)
  }

  test("timeout cancellation suppresses the deferred offset commit") {
    val root = freshRoot()
    produce(root)
    val e = intercept[GraftPlanError] {
      graft.core.DagCompiler.default.run(spark, graft.config.PipelineConfig.fromString(
        s"""[pipeline]
           |name = "t"
           |[global]
           |timeout_seconds = 2
           |[[stages]]
           |id = "src"
           |function = "kafka.consume"
           |config = { path = "$root", topic = "sales", group_id = "g1", schema = "id LONG, name STRING, value LONG" }
           |[[stages]]
           |id = "fetch"
           |function = "http.fetch"
           |inputs = ["src"]
           |config = { url = "https://x/{{name}}", mock = true, mock_latency_ms = 60000, concurrency = 1 }
           |[[stages]]
           |id = "out"
           |function = "noop.sink"
           |inputs = ["fetch"]
           |""".stripMargin))
    }
    assert(e.getMessage.contains("timeout_seconds"))
    // the cancelled background body must not fire the commit afterwards —
    // cancelJobGroupAndFutureJobs kills jobs it submits from here on, and
    // the cancelled flag gates deferred.foreach even if the body completes
    Thread.sleep(1500)
    assert(KafkaLog.committed(root, "g1", "sales").isEmpty,
      "timed-out pipeline must not commit the consumer frontier")
  }

  test("compact refuses an all-keyless topic instead of erasing it") {
    val root = freshRoot()
    produce(root) // no key_field → every record keyless
    val compacted = graft.operators.KafkaCompactOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "sales"), "c"))
    // the log survives untouched (the old behavior installed the empty
    // compaction, silently deleting every partition dir)
    assert(compacted.count() === 3)
    assert(consume(root, "group_id" -> "fresh", "max_messages" -> 0L).count() === 3)
    val dir = KafkaLog.topicDir(root, "sales")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir.toString + ".compact.tmp")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir.toString + ".compact.old")))
  }

  test("compact recovers a PARTIAL crashed swap per partition, losing nothing") {
    val root = freshRoot()
    // two-partition keyed topic
    KafkaProduceSink(StageContext.one(spark, salesDf, Cfg.of(
      "path" -> root, "topic" -> "sales", "key_field" -> "name",
      "num_partitions" -> 2L)))
    val dir = KafkaLog.topicDir(root, "sales")
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("partition=")).toList.sortBy(_.toString)
    assert(parts.size === 2, "fixture needs records in both partitions")
    // simulate a crash partway through swap step (1): only ONE partition
    // was moved aside; the other still sits in the topic dir
    val hold = java.nio.file.Paths.get(dir.toString + ".compact.old")
    java.nio.file.Files.createDirectories(hold)
    java.nio.file.Files.move(parts.head, hold.resolve(parts.head.getFileName.toString))
    val compacted = graft.operators.KafkaCompactOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "sales"), "c"))
    // all-or-nothing recovery would have deleted the held partition here
    assert(compacted.count() === 3, "per-partition recovery must restore the held partition")
    assert(!java.nio.file.Files.isDirectory(hold))
    assert(consume(root, "group_id" -> "fresh", "max_messages" -> 0L).count() === 3)
  }

  test("a compose-time config error still drains registered cleanups") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_docs")
    (1L to 20L).map(i => (i, s"some shared words plus unique token u$i here"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    // bloom decontaminate materializes its pinned benchmark grams EAGERLY
    // at compose time (count + filter build); the next stage's unknown
    // column then fails compose before any sink runs — the pinned cache
    // must still release in the run's finally
    val e = intercept[Exception] {
      graft.core.DagCompiler.default.run(spark, graft.config.PipelineConfig.fromString(
        s"""[pipeline]
           |name = "composefail"
           |[[stages]]
           |id = "docs"
           |function = "table.read"
           |config = { dir = "$tmp", table = "documents" }
           |[[stages]]
           |id = "cleaned"
           |function = "decontaminate.ngram"
           |inputs = ["docs", "docs"]
           |config = { column = "text", id_column = "doc_id", n = 3, mode = "filter", bloom = true }
           |[[stages]]
           |id = "boom"
           |function = "filter.apply"
           |inputs = ["cleaned"]
           |config = { column = "no_such_column", operator = ">", value = 1 }
           |[[stages]]
           |id = "out"
           |function = "noop.sink"
           |inputs = ["boom"]
           |""".stripMargin))
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "compose-time failure leaked a pinned cache")
  }

  test("a plain read repairs a crashed swap — consumers never see the partial window") {
    val root = freshRoot()
    produce(root, "key_field" -> "name")
    val dir = KafkaLog.topicDir(root, "sales")
    val hold = java.nio.file.Paths.get(dir.toString + ".compact.old")
    // crash between swap steps (1) and (2): old generation held aside,
    // nothing installed — WITHOUT a subsequent compact, a consume (or a
    // backlog read committing offsets) must still see the full log
    java.nio.file.Files.createDirectories(hold)
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("partition="))
      .foreach(p => java.nio.file.Files.move(p, hold.resolve(p.getFileName.toString)))
    val got = consume(root, "group_id" -> "reader", "max_messages" -> 0L)
    assert(got.count() === 3, "read-side recovery must restore the held generation")
    assert(!java.nio.file.Files.isDirectory(hold))
  }

  test("compact recovers a crashed swap: held old generation is restored") {
    val root = freshRoot()
    produce(root, "key_field" -> "name")
    val dir = KafkaLog.topicDir(root, "sales")
    val hold = java.nio.file.Paths.get(dir.toString + ".compact.old")
    // simulate a crash between swap steps (1) and (2): the old generation
    // was moved aside but nothing was installed
    java.nio.file.Files.createDirectories(hold)
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("partition="))
      .foreach(p => java.nio.file.Files.move(p, hold.resolve(p.getFileName.toString)))
    val compacted = graft.operators.KafkaCompactOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "sales"), "c"))
    assert(compacted.count() === 3, "recovery must restore the held generation")
    assert(!java.nio.file.Files.isDirectory(hold))
    assert(consume(root, "group_id" -> "fresh", "max_messages" -> 0L).count() === 3)
  }

  test("continue strategy: a swallowed sink failure still suppresses the commit") {
    val root = freshRoot()
    produce(root)
    // the sink fails but continue swallows it — the batch was never
    // durably written, so the frontier must NOT advance
    graft.core.DagCompiler.default.run(spark, graft.config.PipelineConfig.fromString(
      s"""[pipeline]
         |name = "k"
         |[error_handling]
         |strategy = "continue"
         |[[stages]]
         |id = "src"
         |function = "kafka.consume"
         |config = { path = "$root", topic = "sales", group_id = "g1", schema = "id LONG, name STRING, value LONG" }
         |[[stages]]
         |id = "out"
         |function = "csv.write"
         |inputs = ["src"]
         |config = { path = "/proc/not/writable/x" }
         |""".stripMargin))
    assert(KafkaLog.committed(root, "g1", "sales").isEmpty)
    assert(consume(root).count() === 3)
  }

  test("sub-pipeline kafka.consume inherits explain/deferral from the outer run") {
    val root = freshRoot()
    produce(root)
    val toml =
      s"""[pipeline]
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
         |function = "kafka.consume"
         |config = { path = "$root", topic = "sales", group_id = "g1", schema = "id LONG, name STRING, value LONG" }
         |'''
         |""".stripMargin
    // explain: composing the sub-pipeline must not commit
    graft.core.DagCompiler.default.compilePlans(spark,
      graft.config.PipelineConfig.fromString(toml), explainOnly = true)
    assert(KafkaLog.committed(root, "g1", "sales").isEmpty)
    // a real run with a sink commits once, after success
    val out = java.nio.file.Files.createTempDirectory("graft_kafka_out").resolve("ok")
    graft.core.DagCompiler.default.run(spark, graft.config.PipelineConfig.fromString(
      toml +
        s"""[[stages]]
           |id = "sink"
           |function = "csv.write"
           |inputs = ["sub"]
           |config = { path = "$out" }
           |""".stripMargin))
    assert(KafkaLog.committed(root, "g1", "sales").values.sum === 3L)
  }

  test("topic writer lease: produce and compact exclude each other, loud") {
    import spark.implicits._
    // the offline single-writer contract was documentation until now:
    // the offset frontier is read-then-extend (two produces mint
    // colliding offsets) and a produce during a compact's swap writes
    // into a mid-move partition dir — both now fail loud on the shared
    // per-topic lease instead
    val root = java.nio.file.Files.createTempDirectory("graft_klease").toString
    val df = Seq(("a", 1L), ("b", 2L)).toDF("name", "v")
    KafkaProduceSink(StageContext.one(spark, df, Cfg.of(
      "path" -> root, "topic" -> "t", "key_field" -> "name")))
    val dir = KafkaLog.topicDir(root, "t")
    graft.streaming.IngestLease.acquire(dir, "/other/writer", "other_producer",
      graft.streaming.IngestLease.StaleMsDefault, "kafka.produce", KafkaLog.TopicLeaseName)
    val e1 = intercept[GraftPlanError](KafkaProduceSink(StageContext.one(spark, df,
      Cfg.of("path" -> root, "topic" -> "t", "key_field" -> "name"))))
    assert(e1.getMessage.contains("other_producer"))
    val e2 = intercept[GraftPlanError](graft.operators.KafkaCompactOp(StageContext(
      spark, Seq.empty, Cfg.of("path" -> root, "topic" -> "t"), "kc")))
    assert(e2.getMessage.contains("other_producer"))
    graft.streaming.IngestLease.release(dir, "/other/writer", KafkaLog.TopicLeaseName)
    // freed → sequential produce + compact work, lease never pollutes reads
    KafkaProduceSink(StageContext.one(spark, df, Cfg.of(
      "path" -> root, "topic" -> "t", "key_field" -> "name")))
    val compacted = graft.operators.KafkaCompactOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "t"), "kc"))
    assert(compacted.filter(F.col("key").isNotNull).count() === 2L,
      "latest value per key after compact")
    assert(!graft.core.GraftFs.exists(s"$dir/${KafkaLog.TopicLeaseName}"),
      "batch leases always release")
  }

  test("timestamp_field lands in _kafka_timestamp") {
    val root = freshRoot()
    KafkaProduceSink(StageContext.one(spark,
      salesDf.withColumn("ts_ms", F.col("id") * 1000L),
      Cfg.of("path" -> root, "topic" -> "sales", "timestamp_field" -> "ts_ms")))
    val got = consume(root).orderBy("id")
      .select("_kafka_timestamp").as[Long].collect()
    assert(got === Array(1000L, 2000L, 3000L))
  }

  test("kafka.stats reports topic shape and the writer lease round-trips") {
    import graft.streaming.IngestLease
    val root = freshRoot()
    produce(root, "key_field" -> "name", "num_partitions" -> 2L)
    def statsRow() = KafkaStatsOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "sales"), "ks"))
      .select("topic", "partitions", "segments", "bytes",
        "lease_holder", "lease_age_ms").head()
    val free = statsRow()
    assert(free.getString(0) === "sales")
    assert(free.getLong(1) === 2L)
    assert(free.getLong(2) === 2L, "one produce appends one segment per partition")
    assert(free.getLong(3) > 0L)
    assert(free.isNullAt(4) && free.isNullAt(5), "free topic must report null lease")
    val dir = KafkaLog.topicDir(root, "sales")
    IngestLease.acquire(dir, "ck-kstats", "w", 600000L, "spec", KafkaLog.TopicLeaseName)
    try {
      val held = statsRow()
      assert(held.getString(4).contains("checkpoint=ck-kstats"))
      assert(held.getLong(5) >= 0L)
    } finally IngestLease.release(dir, "ck-kstats", KafkaLog.TopicLeaseName)
    assert(statsRow().isNullAt(4))
    // topic discovery: no `topic` key lists every topic under the root
    KafkaProduceSink(StageContext.one(spark, salesDf,
      Cfg.of("path" -> root, "topic" -> "audit")))
    val all = KafkaStatsOp(StageContext(spark, Seq.empty, Cfg.of("path" -> root), "ks"))
    assert(all.select("topic").as[String].collect().sorted.toSeq === Seq("audit", "sales"))
  }

  test("a live kafka.stream survives a concurrent compact swap + mid-swap crash; surviving records exactly once") {
    val root = freshRoot()
    val topic = "swap"
    // 10 records per wave over 5 keys: later waves supersede earlier ones,
    // so compaction genuinely folds; every record is keyed (keyless drops
    // are a separate documented contract)
    def wave(w: Int): Unit = KafkaProduceSink(StageContext.one(spark,
      (0 until 10).map(i => (w * 100L + i, s"k${i % 5}", s"v$w-$i")).toDF("id", "k", "v"),
      Cfg.of("path" -> root, "topic" -> topic, "key_field" -> "k",
        "num_partitions" -> 2L)))
    wave(1); wave(2)
    val stream = graft.operators.KafkaStreamSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> root, "topic" -> topic,
      "schema" -> "id LONG, k STRING, v STRING", "max_files_per_trigger" -> 1L)))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kswap_ck").toString
    val q = stream.writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("_kafka_partition", "_kafka_offset", "v").collect()
          .foreach(r => seen.add((r.getInt(0), r.getLong(1), r.getString(2))))
      }.start()
    try {
      // let the stream get partway through the backlog first
      val t0 = System.currentTimeMillis()
      while (seen.size() < 5 && System.currentTimeMillis() - t0 < 30000) Thread.sleep(50)
      assert(seen.size() >= 5, "stream never started delivering")
      // (1) a REAL compact runs while the stream is live: old segments
      // vanish mid-read (ignoreMissingFiles keeps the query up), compacted
      // segments re-enter under fresh names (legal re-delivery)
      graft.operators.KafkaCompactOp(StageContext(spark, Seq.empty,
        Cfg.of("path" -> root, "topic" -> topic), "c"))
      wave(3)
      // (2) a mid-swap CRASH window while live: one partition held aside,
      // several triggers fire over the hole, then a plain read repairs it
      val dir = java.nio.file.Paths.get(KafkaLog.topicDir(root, topic))
      val held = java.nio.file.Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("partition=")).toList
        .sortBy(_.toString).head
      val hold = java.nio.file.Paths.get(dir.toString + ".compact.old")
      java.nio.file.Files.createDirectories(hold)
      java.nio.file.Files.move(held, hold.resolve(held.getFileName.toString))
      Thread.sleep(500)
      assert(q.isActive && q.exception.isEmpty,
        s"stream died inside the crash window: ${q.exception}")
      KafkaLog.read(spark, root, topic).count() // any reader repairs the swap
      wave(4)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      // CONTRACT: every record surviving in the repaired log was delivered,
      // and dedup on (partition, offset) makes that exactly once — the
      // offsets ride in the data precisely so readers can dedup across
      // compaction, like a real broker's offset-preserving cleaner
      val want = KafkaLog.read(spark, root, topic)
        .select(F.col("partition"), F.col("offset"),
          F.get_json_object(F.col("value"), "$.v").as("v"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      assert(want.nonEmpty)
      val delivered = seen.iterator().asScala.toVector
      val missing = want -- delivered.toSet
      assert(missing.isEmpty, s"surviving records never delivered: $missing")
      // no torn delivery: one (partition, offset) never carries two values
      val torn = delivered.groupBy(r => (r._1, r._2))
        .filter { case (_, vs) => vs.map(_._3).distinct.size > 1 }
      assert(torn.isEmpty, s"one offset delivered with conflicting values: $torn")
    } finally q.stop()
  }
}
