package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config.Cfg
import graft.core.StageContext
import graft.operators._

/** Empty and single-row inputs — the degenerate shapes that break
  * window/LSH/union-based operators first. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc: DataFrame = Seq((1L, "hello world")).toDF("doc_id", "text")

  test("dedup families: empty and single-row inputs pass through") {
    for ((op, cfg) <- Seq[(graft.core.Stage, Cfg)](
      DedupExactOp -> Cfg.of("columns" -> Seq("text")),
      DedupMinHashOp -> Cfg.of("id_column" -> "doc_id", "text_column" -> "text"),
      DedupNgramOp -> Cfg.of("id_column" -> "doc_id", "text_column" -> "text"),
      DedupSimHashOp -> Cfg.of("id_column" -> "doc_id", "text_column" -> "text"))) {
      assert(op(StageContext.one(spark, emptyDocs, cfg)).count() === 0L, op.name)
      assert(op(StageContext.one(spark, oneDoc, cfg)).count() === 1L, op.name)
    }
  }

  test("dedup.embedding: empty and single-vector inputs") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val one = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cfg = Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "dim" -> 2)
    assert(DedupEmbeddingOp(StageContext.one(spark, empty, cfg)).count() === 0L)
    assert(DedupEmbeddingOp(StageContext.one(spark, one, cfg)).count() === 1L)
    // without a declared dim, inference must survive the empty frame too
    val noDim = Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding")
    assert(DedupEmbeddingOp(StageContext.one(spark, empty, noDim)).count() === 0L)
    // blocking=ivf: the in-op quantizer must survive an empty sample
    val ivfCfg = Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding",
      "blocking" -> "ivf", "nlist" -> 4, "dim" -> 2)
    assert(DedupEmbeddingOp(StageContext.one(spark, empty, ivfCfg)).count() === 0L)
    assert(DedupEmbeddingOp(StageContext.one(spark, one, ivfCfg)).count() === 1L)
  }

  test("ai.embed mock and cluster-free ops on empty input") {
    assert(AiEmbedOp(StageContext.one(spark, emptyDocs, Cfg.of(
      "mock" -> true, "dim" -> 8))).count() === 0L)
    val out = AiEmbedOp(StageContext.one(spark, oneDoc, Cfg.of(
      "mock" -> true, "dim" -> 8)))
    assert(out.count() === 1L && out.head().getSeq[Float](2).length === 8)
  }

  test("join.asof: empty right keeps all left rows unmatched; empty left is empty") {
    val l = Seq(("a", 1L, 10.0)).toDF("k", "t", "px")
    val r = Seq.empty[(String, Long, Double)].toDF("k", "t", "bid")
    val out = AsofJoinOp(StageContext(spark, Seq("l" -> l, "r" -> r),
      Cfg.of("by" -> Seq("k"), "on" -> "t", "right_prefix" -> "q_")))
    assert(out.count() === 1L)
    assert(out.select("q_bid").head().isNullAt(0))
    val out2 = AsofJoinOp(StageContext(spark, Seq("l" -> r.toDF("k", "t", "bid"), "r" -> l),
      Cfg.of("by" -> Seq("k"), "on" -> "t")))
    assert(out2.count() === 0L)
  }

  test("join.range: empty sides") {
    val pts = Seq(1.0).toDF("x")
    val none = Seq.empty[(String, Double, Double)].toDF("rid", "lo", "hi")
    for (cfg <- Seq(
      Cfg.of("value" -> "x", "lo" -> "lo", "hi" -> "hi"),
      Cfg.of("value" -> "x", "lo" -> "lo", "hi" -> "hi", "bucket_width" -> 5.0))) {
      assert(RangeJoinOp(StageContext(spark, Seq("l" -> pts, "r" -> none), cfg)).count() === 0L)
      assert(RangeJoinOp(StageContext(spark, Seq("l" -> pts, "r" -> none),
        Cfg(cfg.table + ("how" -> graft.config.CStr("left"))))).count() === 1L)
    }
  }

  test("groupby.cube on empty input emits only the grand-total grouping row semantics") {
    val empty = Seq.empty[(String, Long)].toDF("a", "v")
    val out = CubeOp(StageContext.one(spark, empty, Cfg.of(
      "mode" -> "cube", "by" -> Seq("a"),
      "aggregations" -> Seq(Map("operation" -> "count", "column" -> "v", "output_column" -> "n")))))
    // matches SQL: GROUP BY CUBE over empty input has no groups at all
    assert(out.count() === 0L)
  }

  test("sample/split/repartition on empty frames") {
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    assert(SampleOp(StageContext.one(spark, empty,
      Cfg.of("fraction" -> 0.5))).count() === 0L)
    assert(SplitOp(StageContext.one(spark, empty,
      Cfg.of("columns" -> Seq("id"), "percent" -> 50))).count() === 0L)
    assert(RepartitionOp(StageContext.one(spark, empty,
      Cfg.of("n" -> 4))).count() === 0L)
  }

  test("aggregate.stateful on empty batch input") {
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    val out = graft.streaming.StatefulAggOp(StageContext.one(spark, empty, Cfg.of(
      "key_column" -> "k", "value_column" -> "v", "operation" -> "sum")))
    assert(out.count() === 0L)
  }

  test("keyless window functions on empty and single-row frames") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val one = Seq((1L, 2.0)).toDF("k", "v")
    for (fn <- Seq("rank", "row_number", "sum", "lag")) {
      val cfg = Cfg.of("function" -> fn, "order_by" -> Seq("k"),
        "column" -> "v", "output_column" -> "w")
      assert(WindowFnOp(StageContext.one(spark, empty, cfg)).count() === 0L, fn)
      assert(WindowFnOp(StageContext.one(spark, one, cfg)).count() === 1L, fn)
    }
  }

  test("zorder.apply on empty, single-row, and constant-column frames") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val one = Seq((1L, 2L)).toDF("x", "y")
    val const = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val cfg = Cfg.of("columns" -> Seq("x", "y"), "bits" -> 4)
    assert(ZOrderOp(StageContext.one(spark, empty, cfg)).count() === 0L)
    assert(ZOrderOp(StageContext.one(spark, one, cfg)).count() === 1L)
    assert(ZOrderOp(StageContext.one(spark, const, cfg)).count() === 2L)
  }

  test("excel round-trip of an empty frame (header-only sheet)") {
    val path = java.nio.file.Files.createTempFile("graft_empty", ".xlsx").toString
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    ExcelWriteSink(StageContext.one(spark, empty, Cfg.of("path" -> path)))
    val back = ExcelReadSource(StageContext(spark, Seq.empty, Cfg.of("path" -> path)))
    assert(back.count() === 0L)
  }

  test("mongodb.normalize passes null cells through") {
    val df = Seq((1L, """{"a": {"$numberInt": "2"}}"""), (2L, null))
      .toDF("id", "j")
    val out = MongoNormalizeOp(StageContext.one(spark, df, Cfg.of("column" -> "j")))
      .orderBy("id").select("j").collect()
    assert(out(0).getString(0) === """{"a":2}""")
    assert(out(1).isNullAt(0))
  }

  test("mongodb writes on empty collections: updates no-op, inserts seed, upsert fires") {
    val empty = Seq.empty[(Long, String, Double)].toDF("_id", "cat", "price")
    assert(MongoUpdateManyOp(StageContext.one(spark, empty, Cfg.of(
      "query" -> """{"cat": "a"}""", "update" -> """{"$set": {"cat": "b"}}"""))).count() === 0L)
    assert(MongoDeleteManyOp(StageContext.one(spark, empty, Cfg.of(
      "query" -> "{}"))).count() === 0L)
    assert(MongoUpdateOneOp(StageContext.one(spark, empty, Cfg.of(
      "query" -> """{"cat": "a"}""", "update" -> """{"$set": {"price": 1}}"""))).count() === 0L)
    val upserted = MongoUpdateOneOp(StageContext.one(spark, empty, Cfg.of(
      "query" -> """{"cat": "a"}""", "update" -> """{"$set": {"price": 2.5}}""",
      "upsert" -> true)))
    assert(upserted.count() === 1L)
    assert(MongoInsertManyOp(StageContext.one(spark, empty, Cfg.of(
      "documents" -> """[{"_id": 1, "cat": "x"}]"""))).count() === 1L)
  }

  test("dedup.lines and the normalizers on empty and null-text inputs") {
    assert(DedupLinesOp(StageContext.one(spark, emptyDocs,
      Cfg.of("id_column" -> "doc_id"))).count() === 0L)
    assert(DedupLinesOp(StageContext.one(spark, oneDoc,
      Cfg.of("id_column" -> "doc_id"))).select("text").as[String].head() === "hello world")
    val withNull = Seq((1L, "x"), (2L, null)).toDF("doc_id", "text")
    // null text explodes to nothing → reassembles as "" (documented husk)
    val cleaned = DedupLinesOp(StageContext.one(spark, withNull, Cfg.of("id_column" -> "doc_id")))
    assert(cleaned.count() === 2L)
    assert(UrlNormalizeOp(StageContext.one(spark, emptyDocs,
      Cfg.of("column" -> "text"))).count() === 0L)
    val nulled = TextNormalizeOp(StageContext.one(spark, withNull, Cfg.of()))
      .orderBy("doc_id").select("text").collect()
    assert(nulled(1).isNullAt(0))
  }

  test("quality.gopher, filter.lines and shuffle.apply on empty frames") {
    assert(GopherQualityOp(StageContext.one(spark, emptyDocs, Cfg.of())).count() === 0L)
    assert(GopherQualityOp(StageContext.one(spark, emptyDocs,
      Cfg.of("mode" -> "filter"))).count() === 0L)
    assert(LineFilterOp(StageContext.one(spark, emptyDocs,
      Cfg.of("min_words" -> 1))).count() === 0L)
    assert(ShuffleOp(StageContext.one(spark, emptyDocs, Cfg.of("seed" -> 1))).count() === 0L)
  }

  test("decontaminate.ngram and sample.importance on empty/null frames") {
    val bench = Seq((100L, "alpha beta")).toDF("doc_id", "text")
    // empty train → empty out; empty benchmark → nothing contaminated
    assert(DecontaminateOp(StageContext(spark, Seq("t" -> emptyDocs, "b" -> bench),
      Cfg.of("n" -> 2L))).count() === 0L)
    val vsEmpty = DecontaminateOp(StageContext(spark, Seq("t" -> oneDoc, "b" -> emptyDocs),
      Cfg.of("n" -> 2L)))
    assert(vsEmpty.count() === 1L)
    assert(vsEmpty.select("contaminated").as[Boolean].head() === false)
    // null text hashes as no grams on the bench side; train nulls survive
    val withNull = Seq((1L, "x y"), (2L, null)).toDF("doc_id", "text")
    assert(DecontaminateOp(StageContext(spark, Seq("t" -> withNull, "b" -> bench),
      Cfg.of("n" -> 2L, "mode" -> "filter"))).count() === 2L)

    assert(ImportanceSampleOp(StageContext(spark, Seq("r" -> emptyDocs, "t" -> bench),
      Cfg.of())).count() === 0L)
    assert(ImportanceSampleOp(StageContext(spark, Seq("r" -> oneDoc, "t" -> emptyDocs),
      Cfg.of())).count() === 1L)
  }

  test("kafka.consume of an exhausted topic stays readable") {
    val root = java.nio.file.Files.createTempDirectory("graft_kafka_empty").toString
    KafkaProduceSink(StageContext.one(spark, oneDoc,
      Cfg.of("path" -> root, "topic" -> "t", "key_field" -> "text")))
    val first = KafkaConsumeSource(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "t", "group_id" -> "g")))
    assert(first.count() === 1L)
    // frontier past the end: empty batch, schema still well-formed
    val drained = KafkaConsumeSource(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "t", "group_id" -> "g")))
    assert(drained.count() === 0L)
    assert(drained.columns.contains("_kafka_offset"))
  }

  test("profile, explode and chunk.text on empty frames") {
    val prof = ProfileOp(StageContext.one(spark, emptyDocs, Cfg.of()))
    assert(prof.count() === 2L) // one report row per column, zero-row stats
    assert(prof.filter(F.col("n_rows") =!= 0).count() === 0L)
    assert(ExplodeOp(StageContext.one(spark, emptyDocs,
      Cfg.of("column" -> "split(text, ' ')", "into" -> "w"))).count() === 0L)
    assert(ChunkTextOp(StageContext.one(spark, emptyDocs,
      Cfg.of("max_tokens" -> 8L))).count() === 0L)
    assert(SentencesOp(StageContext.one(spark, emptyDocs, Cfg.of())).count() === 0L)
  }

  test("profile default quantiles and mix id_column on empty frames") {
    // approx quantiles on zero rows → null per quantile column, no failure
    val prof = ProfileOp(StageContext.one(spark,
      Seq.empty[(Long, Double)].toDF("id", "v"), Cfg.of("quantiles" -> Seq(0.5))))
    assert(prof.count() === 2L)
    assert(prof.filter(F.col("q50").isNotNull).count() === 0L)
    // mix with id_column over empty inputs
    assert(MixOp(StageContext(spark, Seq("a" -> emptyDocs),
      Cfg.of("weights" -> Seq(0.5), "id_column" -> "doc_id"))).count() === 0L)
  }

  test("kafka.compact refuses an all-keyless topic; the log survives intact") {
    val root = java.nio.file.Files.createTempDirectory("graft_kafka_empty").toString
    // keyless-only topic: compacting to nothing would erase the whole log,
    // not just drop keyless records — the operator refuses and leaves it
    KafkaProduceSink(StageContext.one(spark,
      Seq((1L, "a")).toDF("id", "name"), Cfg.of("path" -> root, "topic" -> "t")))
    val compacted = KafkaCompactOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "t"), "c"))
    assert(compacted.count() === 1L)
    // refusing twice is stable
    assert(KafkaCompactOp(StageContext(spark, Seq.empty,
      Cfg.of("path" -> root, "topic" -> "t"), "c")).count() === 1L)
    // offsets continue past the preserved record on the next produce
    KafkaProduceSink(StageContext.one(spark,
      Seq((2L, "b")).toDF("id", "name"),
      Cfg.of("path" -> root, "topic" -> "t", "key_field" -> "name")))
    val got = KafkaConsumeSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> root, "topic" -> "t", "group_id" -> "g",
      "max_messages" -> 0L, "schema" -> "id LONG, name STRING")))
    assert(got.count() === 2L)
    assert(got.agg(F.max("_kafka_offset")).head().getLong(0) === 1L)
  }

  test("BPE on empty corpora and empty strings") {
    assert(BpeTrainOp(StageContext.one(spark, emptyDocs, Cfg.of())).count() === 0L)
    val out = BpeTokenizeOp(StageContext.one(spark,
      Seq((1L, ""), (2L, null)).toDF("doc_id", "text"),
      Cfg.of("merges" -> Seq("a b"))))
      .orderBy("doc_id").select("n_tokens").as[Long].collect()
    assert(out.toSeq === Seq(0L, 0L))
  }
}
