package graft

import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.{GraftFs, GraftPlanError, StageContext}
import graft.operators.{DedupExactOp, IndexBuildOp, IndexCompactOp, IndexSnapshot,
  IndexStatsOp, KafkaConsumeSource, KafkaProduceSink}

/** The Hadoop FileSystem seam: every index / ingest / kafka-log path goes
  * through GraftFs, so cluster stores (hdfs://, s3a://) resolve the same
  * way Spark's own readers do. Local evidence: the full index lifecycle —
  * build, probe, append, stats, compact — runs against SCHEME-QUALIFIED
  * `file:` paths (the Hadoop local FS implementation, not java.nio), and
  * the object-store guard fails loud with its own message rather than a
  * connector lookup error. */
class GraftFsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("qualified / relativize / listFilesRec round-trip bare and file: paths") {
    val dir = tmp("gfs_rt")
    GraftFs.mkdirs(s"$dir/a/b")
    GraftFs.writeString(s"$dir/a/b/x.txt", "hello")
    // bare and file:-qualified spellings are the same identity
    assert(GraftFs.qualified(dir) === GraftFs.qualified(s"file:$dir"))
    assert(GraftFs.isDir(s"file:$dir/a"))
    assert(GraftFs.readString(s"file:$dir/a/b/x.txt") === "hello")
    val listed = GraftFs.listFilesRec(dir)
    assert(listed.map(_._1.endsWith("a/b/x.txt")) === Vector(true))
    assert(listed.head._2 === 5L)
    assert(GraftFs.relativize(dir, listed.head._1) === "a/b/x.txt")
    assert(GraftFs.relativize(s"file:$dir", listed.head._1) === "a/b/x.txt")
  }

  test("writeStringCommit replaces content atomically and leaves no tmp litter") {
    val dir = tmp("gfs_commit")
    GraftFs.writeStringCommit(s"$dir/m.json", "one")
    assert(GraftFs.readString(s"$dir/m.json") === "one")
    GraftFs.writeStringCommit(s"$dir/m.json", "two")
    assert(GraftFs.readString(s"$dir/m.json") === "two")
    assert(GraftFs.listNames(dir) === Vector("m.json"))
  }

  test("renameIsAtomic: file/hdfs yes, s3a/gs no; guard message names the scheme") {
    assert(GraftFs.renameIsAtomic("/tmp/idx"))
    assert(GraftFs.renameIsAtomic("file:/tmp/idx"))
    assert(GraftFs.renameIsAtomic("hdfs://nn:8020/idx"))
    assert(!GraftFs.renameIsAtomic("s3a://bucket/idx"))
    assert(!GraftFs.renameIsAtomic("gs://bucket/idx"))
    val e = intercept[GraftPlanError] {
      GraftFs.requireAtomicRename("s3a://bucket/idx", "index.compact")
    }
    assert(e.getMessage.contains("s3a"))
    assert(e.getMessage.contains("atomic"))
  }

  test("index lifecycle end-to-end on scheme-qualified file: paths") {
    val idx = s"file:${tmp("gfs_idx")}/exact"
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    IndexBuildOp(StageContext.one(spark, docs, Cfg.of(
      "type" -> "exact", "path" -> idx, "columns" -> Seq("text"))))
    // probe: batch with one known duplicate, appending the survivor
    val batch = Seq((10L, "alpha"), (11L, "delta")).toDF("doc_id", "text")
    val survivors = DedupExactOp(StageContext.one(spark, batch, Cfg.of(
      "columns" -> Seq("text"), "index_path" -> idx, "index_append" -> true)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors === Seq(11L))
    // the appended key is visible to the next probe
    val batch2 = Seq((20L, "delta"), (21L, "epsilon")).toDF("doc_id", "text")
    val survivors2 = DedupExactOp(StageContext.one(spark, batch2, Cfg.of(
      "columns" -> Seq("text"), "index_path" -> idx)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors2 === Seq(21L))
    // stats + compact run through the same qualified root
    val statsBefore = IndexStatsOp(StageContext.one(spark, docs, Cfg.of("path" -> idx)))
      .select("rows", "files").as[(Long, Long)].head()
    assert(statsBefore._1 === 4L) // 3 built + 1 appended key
    IndexCompactOp(StageContext.one(spark, docs, Cfg.of("path" -> idx)))
    val statsAfter = IndexStatsOp(StageContext.one(spark, docs, Cfg.of("path" -> idx)))
      .select("rows", "files", "appends_since_compact").as[(Long, Long, Long)].head()
    assert(statsAfter._1 === 4L)
    assert(statsAfter._2 === 1L, "compacted to one file")
    assert(statsAfter._3 === 0L, "fresh compact.gen covers the whole generation")
    // probe result identical after compact
    val survivors3 = DedupExactOp(StageContext.one(spark, batch2, Cfg.of(
      "columns" -> Seq("text"), "index_path" -> idx)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors3 === Seq(21L))
  }

  test("kafka produce/consume round-trips on a scheme-qualified file: log root") {
    val root = s"file:${tmp("gfs_kafka")}/log"
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("name", "v")
    KafkaProduceSink(StageContext.one(spark, df, Cfg.of(
      "path" -> root, "topic" -> "t", "key_field" -> "name")))
    val got = KafkaConsumeSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> root, "topic" -> "t", "group_id" -> "g", "max_messages" -> 0L), "k"))
    assert(got.count() === 3L)
    assert(got.select("name").as[String].collect().sorted.toSeq === Seq("a", "b", "c"))
  }
}
