package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.ShardWriteOp

/** shards.write: token/row-budget shard assignment, one-file-per-shard
  * layout, manifest parity with the files, jsonl roundtrip, overwrite
  * semantics, partitioning-independence, config edges. */
class ShardsWriteSpec extends SparkSpec {
  import spark.implicits._

  // doc_id → ws token count: 1→3, 2→4, 3→2, 4→5, 5→1, 6→6
  // prefix starts: 0, 3, 7, 9, 14, 15 → budget 7 ⇒ shards 0,0,1,1,2,2
  private def docs = Seq(
    (1L, "a b c"), (2L, "a b c d"), (3L, "a b"),
    (4L, "a b c d e"), (5L, "a"), (6L, "a b c d e f")
  ).toDF("doc_id", "text")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def run(path: String, cfg: (String, Any)*) =
    ShardWriteOp(StageContext.one(spark, docs, Cfg.of(
      Seq[(String, Any)]("path" -> path, "order_by" -> Seq("doc_id"),
        "shard_tokens" -> 7L) ++ cfg: _*)))

  test("by=tokens: start-offset rule, manifest matches hand computation") {
    val path = tmp("shw_tok")
    val manifest = run(path).orderBy("shard")
      .as[(Long, Long, Long)].collect()
    assert(manifest === Array((0L, 2L, 7L), (1L, 2L, 7L), (2L, 2L, 7L)))
    // the files agree with the manifest and carry the original columns
    val back = spark.read.parquet(path)
    assert(back.columns.sorted.toSeq === Seq("doc_id", "shard", "text"))
    val byShard = back.groupBy("shard").agg(
        F.count(F.lit(1)).as("n"), F.sort_array(F.collect_list("doc_id")).as("ids"))
      .orderBy("shard").collect()
      .map(r => (r.getAs[Number]("shard").longValue, r.getLong(1), r.getSeq[Long](2)))
    assert(byShard === Array((0L, 2L, Seq(1L, 2L)), (1L, 2L, Seq(3L, 4L)),
      (2L, 2L, Seq(5L, 6L))))
  }

  test("one data file per shard directory") {
    val path = tmp("shw_files")
    run(path)
    val shards = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shards.length === 3)
    shards.foreach { dir =>
      val data = dir.listFiles().filter(_.getName.startsWith("part-"))
      assert(data.length === 1, s"${dir.getName}: expected one file, got ${data.length}")
    }
  }

  test("shard assignment is independent of input partitioning") {
    val path1 = tmp("shw_p1"); val path7 = tmp("shw_p7")
    def manifest(path: String, df: org.apache.spark.sql.DataFrame) =
      ShardWriteOp(StageContext.one(spark, df, Cfg.of(
        "path" -> path, "order_by" -> Seq("doc_id"), "shard_tokens" -> 7L)))
        .orderBy("shard").as[(Long, Long, Long)].collect()
    assert(manifest(path1, docs.coalesce(1)) === manifest(path7, docs.repartition(7)))
  }

  test("by=rows shards on rank; jsonl roundtrips the rows") {
    val path = tmp("shw_rows")
    val manifest = ShardWriteOp(StageContext.one(spark, docs, Cfg.of(
      "path" -> path, "by" -> "rows", "order_by" -> Seq("doc_id"),
      "shard_rows" -> 4L, "format" -> "jsonl")))
      .orderBy("shard").as[(Long, Long, Long)].collect()
    // 6 rows / budget 4 → shard 0: ranks 0-3 (19 tokens), shard 1: ranks 4-5
    assert(manifest === Array((0L, 4L, 14L), (1L, 2L, 7L)))
    val back = spark.read.json(path)
    assert(back.count() === 6)
    assert(back.filter(F.col("shard") === 0).select("doc_id")
      .as[Long].collect().sorted === Array(1L, 2L, 3L, 4L))
  }

  test("token_column overrides the tokenizer") {
    val path = tmp("shw_tc")
    val withTok = docs.withColumn("n_tok", F.lit(10L))
    val manifest = ShardWriteOp(StageContext.one(spark, withTok, Cfg.of(
      "path" -> path, "order_by" -> Seq("doc_id"), "shard_tokens" -> 20L,
      "token_column" -> "n_tok")))
      .orderBy("shard").as[(Long, Long, Long)].collect()
    assert(manifest === Array((0L, 2L, 20L), (1L, 2L, 20L), (2L, 2L, 20L)))
  }

  test("compression: gzip jsonl shards roundtrip; bad codec fails loud") {
    val path = tmp("shw_gz")
    ShardWriteOp(StageContext.one(spark, docs, Cfg.of(
      "path" -> path, "by" -> "rows", "order_by" -> Seq("doc_id"),
      "shard_rows" -> 4L, "format" -> "jsonl", "compression" -> "gzip")))
    val shard0 = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).head
    assert(shard0.listFiles().exists(_.getName.endsWith(".json.gz")))
    assert(spark.read.json(path).count() === 6)
    intercept[GraftConfigError](run(tmp("e8"), "compression" -> "brotli9000"))
  }

  test("existing path refused by default; overwrite replaces it") {
    val path = tmp("shw_ow")
    run(path)
    intercept[Exception](run(path))
    val manifest = run(path, "overwrite" -> true)
    assert(manifest.count() === 3)
    assert(spark.read.parquet(path).count() === 6)
  }

  test("empty input: empty manifest, no shard dirs") {
    val path = tmp("shw_empty")
    val manifest = ShardWriteOp(StageContext.one(spark,
      docs.filter(F.lit(false)), Cfg.of(
        "path" -> path, "order_by" -> Seq("doc_id"), "shard_tokens" -> 7L)))
    assert(manifest.count() === 0)
    assert(!new java.io.File(path).listFiles()
      .exists(_.getName.startsWith("shard=")))
  }

  test("_explain_only plans the manifest schema without writing") {
    val path = tmp("shw_ex")
    val m = ShardWriteOp(StageContext.one(spark, docs, Cfg.of(
      "path" -> path, "order_by" -> Seq("doc_id"), "shard_tokens" -> 7L,
      "_explain_only" -> true)))
    assert(m.columns.toSeq === Seq("shard", "n_docs", "n_tokens"))
    assert(m.count() === 0)
    assert(!new java.io.File(path).exists())
  }

  test("config edges fail loud") {
    intercept[GraftConfigError](run(tmp("e1"), "by" -> "bytes"))
    intercept[GraftConfigError](run(tmp("e2"), "format" -> "csv"))
    intercept[GraftConfigError](run(tmp("e3"), "shard_tokens" -> 0L))
    intercept[GraftConfigError](ShardWriteOp(StageContext.one(spark, docs,
      Cfg.of("path" -> tmp("e4"), "shard_tokens" -> 7L)))) // no order_by
    intercept[GraftConfigError](run(tmp("e5"), "token_column" -> "missing"))
    intercept[GraftConfigError](ShardWriteOp(StageContext.one(spark,
      docs.select(F.col("doc_id")), Cfg.of("path" -> tmp("e6"),
        "order_by" -> Seq("doc_id"), "shard_tokens" -> 7L)))) // no text col
    intercept[GraftConfigError](ShardWriteOp(StageContext.one(spark,
      docs.withColumn("shard", F.lit(1)), Cfg.of("path" -> tmp("e7"),
        "order_by" -> Seq("doc_id"), "shard_tokens" -> 7L)))) // shard taken
  }
}
