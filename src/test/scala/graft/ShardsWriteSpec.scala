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

  test("wave commits (shards_per_commit) produce the same export as one commit") {
    val one = tmp("shw_w1"); val waved = tmp("shw_w2")
    run(one)
    run(waved, "shards_per_commit" -> 1L) // 3 shards → 3 waves
    def dump(p: String) = spark.read.parquet(p)
      .select("shard", "doc_id", "text").as[(Long, Long, String)].collect().sorted.toSeq
    assert(dump(one) === dump(waved))
    // one file per shard holds under waves, and the progress dir is gone
    // (the manifest is the commit marker)
    (0 to 2).foreach { s =>
      assert(new java.io.File(s"$waved/shard=$s").listFiles()
        .count(_.getName.startsWith("part-")) === 1)
    }
    assert(!new java.io.File(s"$waved/_progress").exists())
  }

  test("resume skips committed waves, rewrites the crash-window wave, refuses changed settings") {
    val clean = tmp("shw_resume_ref")
    run(clean, "shards_per_commit" -> 1L)
    val path = tmp("shw_resume")
    run(path, "shards_per_commit" -> 1L)
    // manufacture the crash: remove the commit marker (_manifest), then
    // reconstruct _progress as it stood after wave 1 committed — wave 2's
    // marker missing, its shard dir holding a torn extra file
    graft.core.GraftFs.deleteRec(s"$path/_manifest")
    val fp = fingerprintOf(path)
    val pd = new java.io.File(s"$path/_progress"); pd.mkdirs()
    java.nio.file.Files.write(pd.toPath.resolve("_meta.json"), fp.getBytes)
    java.nio.file.Files.write(pd.toPath.resolve("wave-0.json"), "{}".getBytes)
    java.nio.file.Files.write(pd.toPath.resolve("wave-1.json"), "{}".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/shard=2/part-torn.parquet.tmp"), "junk".getBytes)
    val mtimes01 = (0 to 1).map(s => new java.io.File(s"$path/shard=$s")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap)
    Thread.sleep(1100) // mtime resolution
    val manifest = run(path, "shards_per_commit" -> 1L).orderBy("shard")
      .as[(Long, Long, Long)].collect()
    // committed waves were NOT rewritten (same files, same mtimes)...
    (0 to 1).foreach { s =>
      val now = new java.io.File(s"$path/shard=$s")
        .listFiles().map(f => f.getName -> f.lastModified()).toMap
      assert(now === mtimes01(s), s"shard $s was rewritten on resume")
    }
    // ...the crash-window wave was (torn file gone, exactly one part file)
    val s2 = new java.io.File(s"$path/shard=2").listFiles().map(_.getName)
    assert(!s2.exists(_.contains("torn")))
    assert(s2.count(_.startsWith("part-")) === 1)
    // and the result equals the clean run, manifest included
    assert(manifest === Array((0L, 2L, 7L), (1L, 2L, 7L), (2L, 2L, 7L)))
    def dump(p: String) = spark.read.parquet(p)
      .select("shard", "doc_id", "text").as[(Long, Long, String)].collect().sorted.toSeq
    assert(dump(path) === dump(clean))
    assert(!new java.io.File(s"$path/_progress").exists())

    // changed settings against a crashed export: fingerprint mismatch
    // fails loud instead of stitching two different shardings
    graft.core.GraftFs.deleteRec(s"$path/_manifest")
    val pd2 = new java.io.File(s"$path/_progress"); pd2.mkdirs()
    java.nio.file.Files.write(pd2.toPath.resolve("_meta.json"), fp.getBytes)
    val e = intercept[GraftConfigError](run(path, "shards_per_commit" -> 1L,
      "shard_tokens" -> 9L))
    assert(e.getMessage.contains("not resumable"))
    // and an unrelated directory (no _progress at all) is refused too
    val foreign = tmp("shw_foreign")
    new java.io.File(foreign).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$foreign/data.bin"), "x".getBytes)
    assert(intercept[GraftConfigError](run(foreign)).getMessage.contains("not resumable"))
  }

  /** The fingerprint shards.write would write for `docs` at budget 7,
    * waves of 1 — derived by running a throwaway export and capturing its
    * _meta.json before completion is impossible (it is deleted at
    * commit), so restate it from the op's documented fields. */
  private def fingerprintOf(path: String): String =
    """{"by":"tokens","budget":7,"order_by":"doc_id","format":"parquet",""" +
    """"compression":"default","total_units":21,"max_shard":2,"wave_size":1}"""

  test("in-file row order is exactly order_by (writer sort not re-inserted)") {
    // 24 docs, shuffled across 8 input partitions so shuffle-arrival order
    // is adversarial; budget 99 rows → ONE shard holding all of them. If
    // the dynamic-partition writer inserted its own sort (required ordering
    // not satisfied by our shard-prefixed sortWithinPartitions), in-shard
    // order would degrade to arrival order and this read-back would catch it.
    val path = tmp("shw_order")
    val many = spark.range(24).select(
        (F.lit(23) - F.col("id")).as("doc_id"),
        F.concat(F.lit("w "), F.col("id").cast("string")).as("text"))
      .repartition(8)
    ShardWriteOp(StageContext.one(spark, many, Cfg.of(
      "path" -> path, "by" -> "rows", "order_by" -> Seq("doc_id"),
      "shard_rows" -> 99L)))
    val file = new java.io.File(s"$path/shard=0").listFiles()
      .filter(_.getName.startsWith("part-")).head
    // one small file reads back as one partition: collect order = file order
    val inFile = spark.read.parquet(file.getPath)
      .select("doc_id").as[Long].collect().toSeq
    assert(inFile === (0L to 23L), "rows inside the shard file are not in order_by order")
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
