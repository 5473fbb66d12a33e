package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** Crash-swap repair for `ingest.compact` (the OUTPUT-side sibling of
  * IndexMaintenance): the compaction protocol commits through a manifest —
  * (1) write the complete folded generation under `_ingest_compact_tmp/`
  * (invisible to readers: `_` prefix), (2) write
  * `_ingest_compact_manifest.json` naming every source partition dir (THE
  * commit point), (3) hold each source dir aside under
  * `_ingest_compact_old/`, (4) install the folded generation as
  * `ingest_batch=-1`, (5) delete old, manifest, tmp — in that order. A
  * crash BEFORE the manifest leaves only invisible `_` artifacts (rolled
  * back / cleaned); a crash AFTER it rolls forward deterministically (the
  * manifest pins the source set, the tmp generation is complete by
  * construction). At no crash point can a reader see a row twice; the
  * worst transient state is held-aside rows missing until the next repair.
  */
private[graft] object IngestMaintenance {
  import java.nio.file.{Files, Paths, Path}

  private def deleteIfExists(p: Path): Unit = if (Files.exists(p)) KafkaLog.deleteRec(p)

  def recoverSwap(root: String): Unit = synchronized {
    // the lock serializes repairs within one JVM; across processes (a
    // stream.ingest start racing a crashed compact's repair from another
    // graft run) the repair is idempotent over directory states — a lost
    // move race re-stats and re-runs until the winner's result is
    // visible, the same contract IndexMaintenance.recoverSwap got in r6
    import java.nio.file.{FileAlreadyExistsException, NoSuchFileException,
      DirectoryNotEmptyException}
    var attempts = 0
    var done = false
    while (!done) {
      try { repairOnce(root); done = true }
      catch {
        case e @ (_: FileAlreadyExistsException | _: NoSuchFileException |
                  _: DirectoryNotEmptyException) =>
          attempts += 1
          if (attempts >= 5) {
            // converged iff no commit marker and no held sources remain
            val rootP = Paths.get(root)
            if (!Files.exists(rootP.resolve("_ingest_compact_manifest.json")) &&
                !Files.isDirectory(rootP.resolve("_ingest_compact_old"))) done = true
            else throw e
          } else Thread.sleep(20L * attempts)
      }
    }
  }

  private def repairOnce(root: String): Unit = {
    val rootP = Paths.get(root)
    if (!Files.isDirectory(rootP)) return
    val manifest = rootP.resolve("_ingest_compact_manifest.json")
    val tmpData = rootP.resolve("_ingest_compact_tmp").resolve("data")
    val old = rootP.resolve("_ingest_compact_old")
    val target = rootP.resolve("ingest_batch=-1")
    if (Files.exists(manifest)) {
      // the manifest is written only after the tmp generation is complete
      // → roll FORWARD: finish holding sources aside, install, clean up.
      // The manifest names only ingest_batch=<id> source dirs, NEVER the
      // compacted region: whether the `ingest_batch=-1` on disk is the
      // old folded generation (pre-install — its rows are already merged
      // into tmp) or the freshly installed one (post-install — must not
      // be touched) is decided by whether tmp still exists.
      val names = new String(Files.readAllBytes(manifest), "UTF-8")
        .linesIterator.map(_.trim).filter(_.nonEmpty).toVector
      Files.createDirectories(old)
      names.foreach { n =>
        val src = rootP.resolve(n)
        if (Files.isDirectory(src)) Files.move(src, old.resolve(n))
      }
      if (Files.isDirectory(tmpData)) {
        if (Files.isDirectory(target)) {
          // a repair that crashed exactly between this hold-aside and the
          // install can leave a stale held copy; it is already merged
          // into tmp, so clear it rather than fail the move
          deleteIfExists(old.resolve("ingest_batch=-1.old"))
          Files.move(target, old.resolve("ingest_batch=-1.old"))
        }
        Files.move(tmpData, target)
      }
      deleteIfExists(old)
      Files.deleteIfExists(manifest)
      deleteIfExists(rootP.resolve("_ingest_compact_tmp"))
    } else {
      // crash before the commit point: restore anything held aside (dir
      // names are preserved, so the move back is exact) and discard tmp
      if (Files.isDirectory(old)) {
        val stream = Files.list(old)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala.foreach { held =>
            val back = rootP.resolve(held.getFileName.toString)
            if (!Files.exists(back)) Files.move(held, back)
          }
        } finally stream.close()
        deleteIfExists(old)
      }
      deleteIfExists(rootP.resolve("_ingest_compact_tmp"))
    }
  }
}

/** ingest.compact — bound the partition count of a `stream.ingest` OUTPUT:
  * the stream writes one `ingest_batch=<id>` partition dir per micro-batch
  * (the idempotent-retry unit), so a long-running stream mints dirs
  * forever — per-minute triggers ≈ 500k dirs/year, the same small-files
  * rot `index.compact` heals on the index side. This verb folds all
  * partitions at-or-below a watermark into one compacted region,
  * `ingest_batch=-1` (a real BIGINT value, so the partition column's type
  * and every existing reader survive; -1 is never a live batch id —
  * Structured Streaming batch ids start at 0).
  *
  * SAFE BY CONSTRUCTION against the retry race: a replayed micro-batch
  * overwrites its own `ingest_batch=<id>` partition, so folding an
  * UNCOMMITTED batch would let the replay re-land rows that are already in
  * the compacted region — duplicates. ingest.compact therefore folds only
  * batch ids recorded in the stream's checkpoint `commits/` directory
  * (a committed batch never replays). No checkpoint (output divorced from
  * its stream)? Then an explicit `watermark` AND `force = true` are
  * required — the caller asserts quiescence the files can't prove.
  *
  * Crash-safe via the [[IngestMaintenance]] manifest protocol (readers of
  * the output are plain `spark.read.parquet` users with no repair hook, so
  * unlike the index swap, no crash point may expose a DUPLICATE row; this
  * protocol's worst transient state is held-aside rows missing until the
  * next ingest.compact / stream.ingest run repairs). Row counts are
  * checked before the commit point — a lossy rewrite aborts untouched.
  *
  * MATERIALIZATION BARRIER like index.compact: runs eagerly at
  * plan-compose time, passes its input through; CLI `explain` skips it.
  *
  * Config: `path` (the stream.ingest output root), `checkpoint` (default
  * `<path>/_checkpoint`, matching stream.ingest's default), `watermark`
  * (fold ids <= this; default: every committed id), `target_file_mb` = 128,
  * `force` = false (required when no checkpoint commits exist).
  */
object IngestCompactOp extends Stage {
  val name = "ingest.compact"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    if (cfg.boolOr("_explain_only", false)) return ctx.primary
    val root = cfg.str("path")
    val targetMb = cfg.longOr("target_file_mb", 128L)
    if (targetMb < 1) throw new GraftConfigError("ingest.compact: target_file_mb must be >= 1")
    val spark = ctx.spark
    import java.nio.file.{Files, Paths}

    IngestMaintenance.recoverSwap(root)
    val rootP = Paths.get(root)
    if (!Files.isDirectory(rootP)) throw new GraftPlanError(
      s"ingest.compact: no ingest output at $root")

    // batch partitions present on disk
    import scala.jdk.CollectionConverters._
    val dirStream = Files.list(rootP)
    val batchDirs = try dirStream.iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("ingest_batch="))
      .map(_.getFileName.toString).toVector
    finally dirStream.close()
    val idsOnDisk = batchDirs.flatMap(n => n.stripPrefix("ingest_batch=").toLongOption)

    // committed batch ids from the stream's checkpoint — the only ids that
    // can never replay and are therefore safe to fold
    val checkpoint = cfg.strOr("checkpoint", s"$root/_checkpoint")
    val commitsP = Paths.get(s"$checkpoint/commits")
    val committed: Option[Set[Long]] =
      if (Files.isDirectory(commitsP)) {
        val s = Files.list(commitsP)
        try Some(s.iterator().asScala
          .flatMap(p => p.getFileName.toString.toLongOption).toSet)
        finally s.close()
      } else None
    val watermark = cfg.longOpt("watermark")
    if (committed.isEmpty && (watermark.isEmpty || !cfg.boolOr("force", false)))
      throw new GraftConfigError(
        s"ingest.compact: no stream checkpoint commits at $checkpoint — committed and " +
        "in-flight batches are indistinguishable, and folding a batch that later " +
        "replays would duplicate its rows. Pass an explicit watermark AND force = true " +
        "to assert the stream is quiesced (or point `checkpoint` at the real location)")
    val foldable = idsOnDisk.filter(id => id >= 0 &&
      watermark.forall(id <= _) && committed.forall(_.contains(id)))
    val hasCompacted = idsOnDisk.contains(-1L)
    if (foldable.isEmpty || (foldable.size == 1 && !hasCompacted)) {
      System.err.println(s"[graft] ingest.compact: $root — nothing to fold " +
        s"(${foldable.size} foldable batch dir(s))")
      return ctx.primary
    }
    // the old compacted region is re-folded by READING it into the new
    // generation, but it is never listed in the manifest — recoverSwap
    // holds it aside only while the tmp generation exists (pre-install)
    val manifestNames = foldable.map(id => s"ingest_batch=$id")
    val sources = manifestNames ++
      (if (hasCompacted) Seq("ingest_batch=-1") else Seq.empty)

    val srcPaths = sources.map(n => s"$root/$n")
    val folded = spark.read.option("basePath", root).parquet(srcPaths: _*)
      .drop("ingest_batch")
    val bytes = sources.flatMap { n =>
      val walk = Files.walk(rootP.resolve(n))
      try walk.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).toVector
      finally walk.close()
    }.sum
    val targetBytes = targetMb * 1024L * 1024L
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

    val tmpData = s"$root/_ingest_compact_tmp/data"
    folded.repartition(nOut).write.mode("overwrite").parquet(tmpData)

    // refuse to commit a generation that lost (or invented) rows — this is
    // the last cheap moment before source dirs are held aside
    val before = folded.count()
    val after = spark.read.parquet(tmpData).count()
    if (before != after) {
      KafkaLog.deleteRec(Paths.get(s"$root/_ingest_compact_tmp"))
      throw new GraftPlanError(
        s"ingest.compact: rewrite row count mismatch at $root ($before before, $after " +
        "after) — compacted generation discarded, output left untouched")
    }

    // COMMIT POINT: the manifest names the exact source set; recoverSwap
    // rolls the rest forward from here no matter where a crash lands
    Files.write(rootP.resolve("_ingest_compact_manifest.json"),
      manifestNames.mkString("\n").getBytes("UTF-8"))
    IngestMaintenance.recoverSwap(root)

    System.err.println(s"[graft] ingest.compact: $root — folded ${sources.size} " +
      s"partition dir(s) (${bytes / 1048576} MiB) into ingest_batch=-1 ($nOut file(s))")
    ctx.primary
  }
}

/** ingest.stats — fragmentation / health report for a `stream.ingest`
  * OUTPUT: the read-only companion of `ingest.compact` that answers
  * "should I fold yet?", mirroring index.stats on the index side. One row:
  *
  *   path, batch_dirs (live ingest_batch=<id> partitions), committed
  *   (how many of those the checkpoint has committed — the foldable set),
  *   uncommitted (dirs a replay may still overwrite — never foldable),
  *   compacted (1 if an ingest_batch=-1 region exists), files, bytes,
  *   mean_file_kb
  *
  * Directory listing only — no data scan. Runs the crash repair first
  * like every other maintenance entry point. Config: `path`,
  * `checkpoint` (default `<path>/_checkpoint`).
  */
object IngestStatsOp extends Stage {
  val name = "ingest.stats"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val spark = ctx.spark
    import spark.implicits._
    if (cfg.boolOr("_explain_only", false))
      return Seq.empty[(String, Long, Long, Long, Long, Long, Long, Double)]
        .toDF("path", "batch_dirs", "committed", "uncommitted", "compacted",
          "files", "bytes", "mean_file_kb")
    val root = cfg.str("path")
    import java.nio.file.{Files, Paths}
    IngestMaintenance.recoverSwap(root)
    val rootP = Paths.get(root)
    if (!Files.isDirectory(rootP)) throw new GraftPlanError(
      s"ingest.stats: no ingest output at $root")
    import scala.jdk.CollectionConverters._
    val dirStream = Files.list(rootP)
    val batchDirs = try dirStream.iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("ingest_batch="))
      .map(_.getFileName.toString).toVector
    finally dirStream.close()
    val ids = batchDirs.flatMap(n => n.stripPrefix("ingest_batch=").toLongOption)
    val live = ids.filter(_ >= 0)
    val checkpoint = cfg.strOr("checkpoint", s"$root/_checkpoint")
    val commitsP = Paths.get(s"$checkpoint/commits")
    val committedIds: Set[Long] =
      if (!Files.isDirectory(commitsP)) Set.empty
      else {
        val s = Files.list(commitsP)
        try s.iterator().asScala.flatMap(p => p.getFileName.toString.toLongOption).toSet
        finally s.close()
      }
    val walk = Files.walk(rootP)
    val parts = try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) && {
        val name = p.getFileName.toString
        name.startsWith("part-") && name.endsWith(".parquet") &&
        !rootP.relativize(p).iterator().asScala.exists { seg =>
          val s = seg.toString; s.startsWith("_") || s.startsWith(".")
        }
      }).map(p => Files.size(p)).toVector
    finally walk.close()
    val bytes = parts.sum
    val meanKb = if (parts.isEmpty) 0.0
      else math.round(bytes / 1024.0 / parts.size * 10) / 10.0
    Seq((root, live.size.toLong, live.count(committedIds.contains).toLong,
        live.count(id => !committedIds.contains(id)).toLong,
        (if (ids.contains(-1L)) 1L else 0L), parts.size.toLong, bytes, meanKb))
      .toDF("path", "batch_dirs", "committed", "uncommitted", "compacted",
        "files", "bytes", "mean_file_kb")
  }
}
