package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.{GraftPlanError, StageContext}
import graft.operators.{IngestCompactOp, IngestMaintenance, IngestStatsOp}

/** ingest.compact — bounding the stream.ingest output's per-micro-batch
  * partition count: committed batches fold into `ingest_batch=-1`, the
  * retry race is excluded via checkpoint commits, and the manifest swap
  * protocol never exposes a duplicate row at any crash point. */
class IngestCompactSpec extends SparkSpec {
  import spark.implicits._
  import java.nio.file.{Files, Paths}

  private def row(i: Long) = (i, s"doc number $i with some words")

  /** hand-built stream.ingest-shaped output: one parquet dir per batch id
    * plus a checkpoint commits/ entry per COMMITTED id */
  private def mkOutput(batches: Seq[(Long, Seq[Long])], committed: Seq[Long]): String = {
    val root = Files.createTempDirectory("ingc_out").toString
    batches.foreach { case (id, ids) =>
      ids.map(row).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$root/ingest_batch=$id")
    }
    Files.createDirectories(Paths.get(s"$root/_checkpoint/commits"))
    committed.foreach(id =>
      Files.write(Paths.get(s"$root/_checkpoint/commits/$id"), "v1".getBytes("UTF-8")))
    root
  }

  private def readIds(root: String): Seq[Long] =
    spark.read.parquet(root).select("doc_id").as[Long].collect().sorted.toSeq

  private def batchDirs(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(root))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("ingest_batch=")).toSet
    finally s.close()
  }

  test("committed batches fold into ingest_batch=-1; rows identical; re-run is a no-op") {
    val root = mkOutput(Seq(0L -> Seq(1L, 2L), 1L -> Seq(3L), 2L -> Seq(4L, 5L)),
      committed = Seq(0L, 1L, 2L))
    val before = readIds(root)
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root)))
    assert(readIds(root) === before, "folding is purely physical")
    assert(batchDirs(root) === Set("ingest_batch=-1"))
    // nothing left to fold — clean no-op, rows untouched
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root)))
    assert(readIds(root) === before)
    // later batches fold INTO the existing compacted region
    Seq(row(6L)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$root/ingest_batch=3")
    Files.write(Paths.get(s"$root/_checkpoint/commits/3"), "v1".getBytes("UTF-8"))
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root)))
    assert(readIds(root) === (before :+ 6L).sorted)
    assert(batchDirs(root) === Set("ingest_batch=-1"))
  }

  test("compact_if: below-threshold run is a loud no-op, above-threshold run folds") {
    val root = mkOutput(Seq(0L -> Seq(1L, 2L), 1L -> Seq(3L), 2L -> Seq(4L, 5L)),
      committed = Seq(0L, 1L, 2L))
    def compact(extra: (String, Any)*): Unit =
      IngestCompactOp(StageContext.one(spark, Seq(row(9L)).toDF("doc_id", "text"),
        Cfg.of(Seq[(String, Any)]("path" -> root) ++ extra: _*)))
    // 3 foldable dirs, tiny files: batch_dirs_above=10 does NOT trip → no-op
    compact("compact_if" -> Map("batch_dirs_above" -> 10L))
    assert(batchDirs(root) === Set("ingest_batch=0", "ingest_batch=1", "ingest_batch=2"),
      "untripped compact_if must leave the output untouched")
    // unknown / empty condition tables fail loud (checked while foldable
    // work exists — the policy gate sits behind the nothing-to-fold return)
    intercept[GraftConfigError](compact("compact_if" -> Map("no_such_condition" -> 1L)))
    intercept[GraftConfigError](compact("compact_if" -> Map.empty[String, Any]))
    // tiny files DO trip the mean-size threshold → fold happens
    compact("compact_if" -> Map("batch_dirs_above" -> 10L, "mean_file_kb_below" -> 512L))
    assert(batchDirs(root) === Set("ingest_batch=-1"))
    assert(readIds(root) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("uncommitted batches and batches above the watermark are left alone") {
    // batch 2 exists on disk but is NOT committed — a crashed micro-batch
    // that may replay; folding it would duplicate its rows on retry
    val root = mkOutput(Seq(0L -> Seq(1L), 1L -> Seq(2L), 2L -> Seq(3L)),
      committed = Seq(0L, 1L))
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root)))
    assert(batchDirs(root) === Set("ingest_batch=-1", "ingest_batch=2"))
    assert(readIds(root) === Seq(1L, 2L, 3L))

    val root2 = mkOutput(Seq(0L -> Seq(1L), 1L -> Seq(2L), 2L -> Seq(3L)),
      committed = Seq(0L, 1L, 2L))
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root2, "watermark" -> 1)))
    assert(batchDirs(root2) === Set("ingest_batch=-1", "ingest_batch=2"))
    assert(readIds(root2) === Seq(1L, 2L, 3L))
  }

  test("no checkpoint: explicit watermark AND force required") {
    val root = Files.createTempDirectory("ingc_nockpt").toString
    Seq(row(1L)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$root/ingest_batch=0")
    Seq(row(2L)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$root/ingest_batch=1")
    intercept[GraftConfigError](IngestCompactOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"), Cfg.of("path" -> root))))
    intercept[GraftConfigError](IngestCompactOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root, "watermark" -> 1)))) // force still missing
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root, "watermark" -> 1, "force" -> true)))
    assert(batchDirs(root) === Set("ingest_batch=-1"))
    assert(readIds(root) === Seq(1L, 2L))
    // missing output root fails loud
    intercept[GraftPlanError](IngestCompactOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> (root + "/definitely_missing"), "watermark" -> 1, "force" -> true))))
  }

  test("one fold at a time: a concurrent ingest.compact is refused loud") {
    // two concurrent folds share the _ingest_compact_tmp staging dir and
    // the manifest; interleaved abort/commit states can hold committed
    // partitions aside with no folded generation installed — excluded by
    // the maintenance lease (which deliberately does NOT conflict with a
    // live stream's output lease: folding committed batches stays legal)
    val root = Files.createTempDirectory("ingc_lease").toString
    Seq(row(1L)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$root/ingest_batch=0")
    Seq(row(2L)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$root/ingest_batch=1")
    graft.streaming.IngestLease.acquire(root, "/other/fold", "other_compact",
      graft.streaming.IngestLease.StaleMsDefault, "ingest.compact", "_ingest_compact.lease")
    val e = intercept[GraftPlanError](IngestCompactOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root, "watermark" -> 1, "force" -> true))))
    assert(e.getMessage.contains("other_compact"))
    graft.streaming.IngestLease.release(root, "/other/fold", "_ingest_compact.lease")
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root, "watermark" -> 1, "force" -> true)))
    assert(batchDirs(root) === Set("ingest_batch=-1"))
    assert(readIds(root) === Seq(1L, 2L))
    assert(!graft.core.GraftFs.exists(s"$root/_ingest_compact.lease"),
      "maintenance lease always releases")
  }

  test("crash repair: roll forward after the manifest, roll back before it") {
    // pre-install crash: tmp generation + manifest written, sources still
    // in place → recoverSwap must finish the fold
    val root = mkOutput(Seq(0L -> Seq(1L, 2L), 1L -> Seq(3L)), committed = Seq(0L, 1L))
    Seq(row(1L), row(2L), row(3L)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$root/_ingest_compact_tmp/data")
    Files.write(Paths.get(s"$root/_ingest_compact_manifest.json"),
      "ingest_batch=0\ningest_batch=1".getBytes("UTF-8"))
    IngestMaintenance.recoverSwap(root)
    assert(batchDirs(root) === Set("ingest_batch=-1"))
    assert(readIds(root) === Seq(1L, 2L, 3L))
    assert(!Files.exists(Paths.get(s"$root/_ingest_compact_manifest.json")))
    assert(!Files.exists(Paths.get(s"$root/_ingest_compact_tmp")))
    // post-install crash: manifest still present, tmp consumed, generation
    // installed → repair must NOT touch the installed generation
    Files.write(Paths.get(s"$root/_ingest_compact_manifest.json"),
      "ingest_batch=0\ningest_batch=1".getBytes("UTF-8"))
    IngestMaintenance.recoverSwap(root)
    assert(readIds(root) === Seq(1L, 2L, 3L))
    // mid-move crash: manifest written, SOME sources already held aside,
    // install not yet done → repair finishes the holds and installs
    val root3 = mkOutput(Seq(0L -> Seq(4L), 1L -> Seq(5L)), committed = Seq(0L, 1L))
    Seq(row(4L), row(5L)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$root3/_ingest_compact_tmp/data")
    Files.write(Paths.get(s"$root3/_ingest_compact_manifest.json"),
      "ingest_batch=0\ningest_batch=1".getBytes("UTF-8"))
    Files.createDirectories(Paths.get(s"$root3/_ingest_compact_old"))
    Files.move(Paths.get(s"$root3/ingest_batch=0"),
      Paths.get(s"$root3/_ingest_compact_old/ingest_batch=0"))
    IngestMaintenance.recoverSwap(root3)
    assert(batchDirs(root3) === Set("ingest_batch=-1"))
    assert(readIds(root3) === Seq(4L, 5L))
    // pre-manifest crash: a stray tmp with no manifest is discarded and
    // held-aside dirs (tampering recovery) are restored
    val root2 = mkOutput(Seq(0L -> Seq(7L)), committed = Seq(0L))
    Seq(row(9L)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$root2/_ingest_compact_tmp/data")
    IngestMaintenance.recoverSwap(root2)
    assert(!Files.exists(Paths.get(s"$root2/_ingest_compact_tmp")))
    assert(readIds(root2) === Seq(7L))
  }

  test("ingest.stats: batch/commit/compaction counts before and after a fold") {
    val root = mkOutput(Seq(0L -> Seq(1L), 1L -> Seq(2L), 2L -> Seq(3L)),
      committed = Seq(0L, 1L))
    def stats() = IngestStatsOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"), Cfg.of("path" -> root))).head()
    val before = stats()
    assert(before.getAs[Long]("batch_dirs") === 3L)
    assert(before.getAs[Long]("committed") === 2L)
    assert(before.getAs[Long]("uncommitted") === 1L)
    assert(before.getAs[Long]("compacted") === 0L)
    assert(before.getAs[Long]("files") === 3L && before.getAs[Long]("bytes") > 0L)
    // a hand-built batch output has no _metrics — null columns, not zeros
    assert(before.isNullAt(before.fieldIndex("metric_batches")))
    assert(before.isNullAt(before.fieldIndex("rows_in")))
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> root)))
    val after = stats()
    assert(after.getAs[Long]("batch_dirs") === 1L) // the uncommitted survivor
    assert(after.getAs[Long]("committed") === 0L)
    assert(after.getAs[Long]("compacted") === 1L)
    // missing output fails loud
    intercept[GraftPlanError](IngestStatsOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> (root + "/missing")))))
  }

  test("end-to-end: a real stream.ingest output compacts against its own checkpoint") {
    val idx = Files.createTempDirectory("ingc_e2e_idx").toString
    graft.operators.IndexBuildOp(StageContext.one(spark,
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text"),
      Cfg.of("type" -> "minhash", "path" -> idx, "id_column" -> "doc_id",
        "text_column" -> "text", "num_hashes" -> 64, "bands" -> 16, "seed" -> 7)))
    val streamDir = Files.createTempDirectory("ingc_e2e_in").toString
    Seq((10L, "one wholly novel streaming sentence of fresh words here"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(streamDir)
    Thread.sleep(400)
    Seq((11L, "second entirely different new document with other vocabulary"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(streamDir)
    val stream = graft.streaming.FileStreamSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> streamDir, "format" -> "parquet", "max_files_per_trigger" -> 1L)))
    val out = Files.createTempDirectory("ingc_e2e_out").toString + "/data"
    graft.streaming.StreamIngestSink(StageContext.one(spark, stream, Cfg.of(
      "path" -> out, "index_path" -> idx, "dedup" -> "minhash",
      "trigger" -> "available_now", "id_column" -> "doc_id",
      "text_column" -> "text", "threshold" -> 0.8)))
    assert(batchDirs(out).size === 2)
    // the default checkpoint (<path>/_checkpoint) holds both commits —
    // no explicit watermark or force needed
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> out)))
    assert(batchDirs(out) === Set("ingest_batch=-1"))
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(10L, 11L))
  }

  test("compact folds _metrics into one summary; stats totals identical; leftovers repaired") {
    val idx = Files.createTempDirectory("ingc_mf_idx").toString
    graft.operators.IndexBuildOp(StageContext.one(spark,
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text"),
      Cfg.of("type" -> "minhash", "path" -> idx, "id_column" -> "doc_id",
        "text_column" -> "text", "num_hashes" -> 64, "bands" -> 16, "seed" -> 7)))
    val streamDir = Files.createTempDirectory("ingc_mf_in").toString
    Seq((10L, "one wholly novel streaming sentence of fresh words here"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(streamDir)
    Thread.sleep(400)
    Seq((11L, "second entirely different new document with other vocabulary"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(streamDir)
    val stream = graft.streaming.FileStreamSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> streamDir, "format" -> "parquet", "max_files_per_trigger" -> 1L)))
    val out = Files.createTempDirectory("ingc_mf_out").toString + "/data"
    graft.streaming.StreamIngestSink(StageContext.one(spark, stream, Cfg.of(
      "path" -> out, "index_path" -> idx, "dedup" -> "minhash",
      "trigger" -> "available_now", "id_column" -> "doc_id",
      "text_column" -> "text", "threshold" -> 0.8)))
    def stats() = IngestStatsOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"), Cfg.of("path" -> out))).head()
    def metricTotals() = {
      val s = stats()
      (s.getAs[Long]("metric_batches"), s.getAs[Long]("rows_in"),
       s.getAs[Long]("survivors"), s.getAs[Long]("max_batch_ms"))
    }
    val before = metricTotals()
    assert(before._1 === 2L && before._2 === 2L && before._3 === 2L)
    def metricFiles() = graft.core.GraftFs.listNames(s"$out/_metrics")
      .filter(_.startsWith("batch-")).sorted

    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> out)))
    // the per-batch files folded into one summary — the _metrics dir no
    // longer grows with stream lifetime
    assert(metricFiles().isEmpty, "per-batch metric files must fold away")
    assert(graft.core.GraftFs.isFile(s"$out/_metrics/compacted.json"))
    // totals are indistinguishable before/after the fold
    assert(metricTotals() === before)

    // crash window: a batch file at or below the fold frontier that the
    // delete pass missed must not double-count (stats skips it) and the
    // next fold removes it
    graft.core.GraftFs.writeString(s"$out/_metrics/batch-0.json",
      """{"batch_id":0,"rows_in":999,"survivors":999,"duration_ms":999,"ts_ms":1}""")
    assert(metricTotals() === before, "a folded id's leftover file must not re-count")
    IngestCompactOp(StageContext.one(spark, Seq(row(0L)).toDF("doc_id", "text"),
      Cfg.of("path" -> out)))
    assert(metricFiles().isEmpty, "the next compact sweeps fold-frontier leftovers")
    assert(metricTotals() === before)
  }

  test("a committed zero-survivor batch's metrics fold (not deleted as stale)") {
    // batch 0: rows_in=5, zero survivors → metric file but NO data dir.
    // Foldability keyed on data-dir presence would let `through` jump past
    // id 0 (folding 1,2), then the next fold deletes batch-0.json as stale
    // without summing it — rows_in silently shrinks by 5.
    val root = mkOutput(Seq(1L -> Seq(3L), 2L -> Seq(4L, 5L)),
      committed = Seq(0L, 1L, 2L))
    java.nio.file.Files.createDirectories(Paths.get(s"$root/_metrics"))
    def metric(id: Long, rowsIn: Long, surv: Long) =
      graft.core.GraftFs.writeString(s"$root/_metrics/batch-$id.json",
        s"""{"batch_id":$id,"rows_in":$rowsIn,"survivors":$surv,"duration_ms":7,"ts_ms":1}""")
    metric(0L, 5L, 0L); metric(1L, 1L, 1L); metric(2L, 2L, 2L)
    def totals() = {
      val s = IngestStatsOp(StageContext.one(spark,
        Seq(row(0L)).toDF("doc_id", "text"), Cfg.of("path" -> root))).head()
      (s.getAs[Long]("metric_batches"), s.getAs[Long]("rows_in"),
       s.getAs[Long]("survivors"))
    }
    assert(totals() === ((3L, 8L, 3L)))
    def compact(): Unit = IngestCompactOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"), Cfg.of("path" -> root)))
    compact()
    assert(totals() === ((3L, 8L, 3L)), "fold must sum the zero-survivor batch")
    assert(graft.core.GraftFs.listNames(s"$root/_metrics")
      .count(_.startsWith("batch-")) === 0, "all committed metric files fold away")
    // a second pass must not shrink anything either
    compact()
    assert(totals() === ((3L, 8L, 3L)))
  }

  test("ingest.stats surfaces the output and compact leases while held, null when free") {
    import graft.streaming.IngestLease
    val root = mkOutput(Seq(0L -> Seq(1L, 2L)), committed = Seq(0L))
    def leaseRow() = IngestStatsOp(StageContext.one(spark,
      Seq(row(0L)).toDF("doc_id", "text"), Cfg.of("path" -> root)))
      .select("lease_holder", "lease_age_ms",
        "compact_lease_holder", "compact_lease_age_ms").head()
    val free = leaseRow()
    assert((0 to 3).forall(free.isNullAt), s"free output must report null leases: $free")
    // the stream writer's output lease
    IngestLease.acquire(root, "ck-stats-spec", "q", 600000L, "spec",
      IngestLease.OutLeaseName)
    try {
      val held = leaseRow()
      assert(held.getString(0).contains("checkpoint=ck-stats-spec"))
      assert(held.getLong(1) >= 0L)
      assert(held.isNullAt(2) && held.isNullAt(3),
        "the out lease must not read as a compact lease")
    } finally IngestLease.release(root, "ck-stats-spec", IngestLease.OutLeaseName)
    // a running ingest.compact's lease (separate file by design)
    IngestLease.acquire(root, "ck-compact-spec", "c", 600000L, "spec",
      IngestLease.CompactLeaseName)
    try {
      val held = leaseRow()
      assert(held.isNullAt(0) && held.isNullAt(1))
      assert(held.getString(2).contains("checkpoint=ck-compact-spec"))
      assert(held.getLong(3) >= 0L)
    } finally IngestLease.release(root, "ck-compact-spec", IngestLease.CompactLeaseName)
    val after = leaseRow()
    assert((0 to 3).forall(after.isNullAt), "released leases must read null again")
  }
}
