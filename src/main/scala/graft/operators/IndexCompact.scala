package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** Shared crash-swap repair for `index.compact`: the swap holds the old
  * corpus generation aside as `corpus.compact.old` before installing the
  * compacted `corpus.compact.tmp`, so a crash at any point leaves at least
  * one complete generation on disk — and every corpus READER runs this
  * repair first, so no probe ever observes the partial-swap window (the
  * same contract kafka.consume/stream got for kafka.compact's mid-swap
  * crashes). Synchronized within one JVM; ACROSS processes (concurrent
  * readers from separate graft runs are allowed) the repair is idempotent
  * by retry — a lost directory-move race re-stats and converges on the
  * winner's completed repair instead of surfacing the move failure.
  */
private[graft] object IndexMaintenance {
  /** Repair a compact that died mid-swap under `<path>/`. Idempotent, two
    * directory stats in the no-crash common case.
    *
    * `cleanTmp` — only index.compact itself passes true: a leftover
    * `corpus.compact.tmp` with the corpus intact is just a stale artifact
    * of a crash BEFORE the swap began, but an active compaction's tmp
    * write looks identical, so readers must leave it alone (the
    * maintenance contract says compact runs quiesced, but a reader
    * deleting a writer's half-written tmp turns a contract violation into
    * data loss).
    */
  def recoverSwap(path: String, cleanTmp: Boolean = false): Unit = synchronized {
    val corpus = s"$path/corpus"
    val hold = s"$path/corpus.compact.old"
    val tmp = s"$path/corpus.compact.tmp"
    // true = this attempt's view converged; false = a rename reported a
    // lost race (source vanished / destination appeared under us)
    def repair(): Boolean =
      if (GraftFs.isDir(hold)) {
        if (!GraftFs.isDir(corpus)) {
          // died between hold-aside and install. The tmp write commits
          // BEFORE the swap starts, so if tmp exists it is the complete new
          // generation — finish the install; tmp missing (external
          // tampering) falls back to restoring the held old generation.
          if (GraftFs.isDir(tmp)) {
            if (!GraftFs.rename(tmp, corpus)) false
            else { GraftFs.deleteRec(hold); true }
          } else GraftFs.rename(hold, corpus)
        } else {
          // died after install, before the held generation's delete
          GraftFs.deleteRec(hold); true
        }
      } else if (cleanTmp && GraftFs.isDir(tmp)) {
        GraftFs.deleteRec(tmp); true
      } else true
    // the lock serializes repairs within one JVM, but concurrent READER
    // processes are allowed (only compact itself must be quiesced), and
    // after a crashed compact every reader races the same moves — the
    // loser's rename reports failure (Hadoop FS rename returns false on a
    // vanished source / appeared destination rather than throwing); the
    // repair is idempotent over directory states, so re-stat and re-run
    // until the winner's result is visible. A crashed-compact repair can
    // only exist where compact ran, and compact's entry point guards
    // atomic-rename capability — so these moves never run on a
    // copy-rename object store.
    var attempts = 0
    var done = false
    while (!done) {
      if (repair()) done = true
      else {
        attempts += 1
        if (attempts >= 5) {
          // converged iff a complete generation is installed and no held
          // generation remains — then the race partner finished the job
          if (GraftFs.isDir(corpus) && !GraftFs.isDir(hold)) done = true
          else throw new GraftPlanError(
            s"index maintenance: crash-swap repair at $path did not converge " +
            s"after $attempts attempts (corpus=${GraftFs.isDir(corpus)}, " +
            s"held=${GraftFs.isDir(hold)})")
        } else Thread.sleep(20L * attempts)
      }
    }
  }

  /** (family name, corpus partition columns) of the index at `path`, from
    * its own metadata — shared by index.compact and index.stats. */
  def layout(spark: org.apache.spark.sql.SparkSession, path: String,
      op: String): (String, Seq[String]) = {
    if (GraftFs.isDir(s"$path/meta")) {
      // schema-only footer read: layout() dispatches on which fields EXIST,
      // needs no values — and must not throw on a zero-row meta table
      val fields = IndexMeta.schemaFields(spark, s"$path/meta")
      if (fields.contains("ksub")) ("ivfpq", Seq("cell"))
      else if (fields.contains("band_planes")) ("lsh", Seq("band", "pband", "ingest_tag"))
      else if (fields.contains("pbuckets")) ("lsh", Seq("block", "pbucket"))
      else if (fields.contains("ngram_size")) ("ngram", Seq.empty)
      else if (fields.contains("shingle_size")) ("minhash", Seq.empty)
      else if (fields.contains("simhash")) ("simhash", Seq.empty)
      else if (fields.contains("columns")) ("exact", Seq.empty)
      else throw new GraftPlanError(
        s"$op: unrecognized index meta at $path (fields: ${fields.mkString(", ")})")
    } else if (GraftFs.isDir(s"$path/centroids")) ("ivf", Seq("cell"))
    else throw new GraftPlanError(s"$op: no index at $path — run index.build first")
  }
}

/** index.compact — physical compaction of an `index.build` index: rewrite
  * the corpus into few right-sized files, byte-identical rows, then swap
  * the new generation in crash-safely. Incremental ingestion GROWS an
  * index one small append at a time — `dedup.* index_append = true` adds a
  * few part files per pipeline run, and `stream.ingest` adds one
  * `corpus/sb-<ckpt>-<batch>/` subdir per micro-batch — so after thousands
  * of batches a probe lists thousands of tiny files: the classic
  * small-files pathology (listing dominates, every scan task reads a
  * droplet). Compaction is the missing third verb of the index lifecycle:
  * build → append per batch → compact when fragmented.
  *
  * Layout-aware, driven by the index's own meta:
  *   - exact / minhash (flat corpus): coalesce to ceil(bytes /
  *     target_file_mb) files (default 128 MiB — the parquet-friendly
  *     scan-task size); streaming per-batch subdirs fold into the flat
  *     generation
  *   - lsh (block, pbucket) / ivf (cell): one file per partition dir via
  *     repartition on the partition columns — dir layout, partition
  *     pruning, and `basePath` column recovery all survive unchanged
  *
  * PURELY PHYSICAL: rows pass through exactly (no distinct, no re-keying,
  * no re-hashing) and `meta/`/`centroids/` are untouched, so probe results
  * are bit-identical before and after — the spec and the
  * index_compact_parity gate pin this. A row-count check between the
  * snapshot and the written tmp aborts the swap on any mismatch (the swap
  * deletes the old generation; never trade durability for one count scan).
  *
  * Crash-safe swap, same discipline as kafka.compact: (1) write
  * `corpus.compact.tmp` fully, (2) rename `corpus` →
  * `corpus.compact.old`, (3) rename tmp → `corpus`, (4) delete the held
  * old generation LAST. Every reader (IndexSnapshot + the knn probes) runs
  * IndexMaintenance.recoverSwap first, so a crash at any point repairs to
  * a complete generation before any file listing.
  *
  * Maintenance contract (same single-writer rule as the kafka log and
  * index_append): run compact QUIESCED — no concurrent appender, probe, or
  * recovering streaming query on the same index. In particular a
  * stream.ingest query crashed mid-batch may hold an uncommitted
  * `corpus/sb-…` append; compacting before it replays folds that append
  * into the flat generation, and the replay's self-match exclusion
  * (excludeDir) can no longer see it — ENFORCED, not just documented:
  * a corpus holding any sb-* micro-batch dir refuses to compact unless
  * `force = true` asserts the stream is quiesced at a committed batch
  * (committed and in-flight appends are indistinguishable on disk).
  *
  * MATERIALIZATION BARRIER like index.build: runs eagerly at plan-compose
  * time and passes its input through, so it composes mid-pipeline; CLI
  * `explain` skips it (read-only).
  *
  * Config: `path` (the index root), `target_file_mb` = 128 (flat
  * layouts), `force` = false (required to fold stream.ingest sb-* dirs),
  * and optionally `compact_if` — POLICY thresholds so a scheduled
  * maintenance pipeline compacts only when fragmentation warrants it
  * (the shape a corpus-lifetime deployment actually runs, instead of
  * rewriting a healthy corpus every night):
  *
  *   compact_if = { mean_file_kb_below = 512, files_above = 1000,
  *                  appends_since_compact_above = 200 }
  *
  * Conditions OR together (any trip ⇒ compact; the table present but no
  * condition tripped ⇒ loud-logged no-op); the stats come from the same
  * listing index.stats reports, so the decision costs one directory
  * listing, no data scan. Omit `compact_if` for today's unconditional
  * behavior.
  */
object IndexCompactOp extends Stage {
  val name = "index.compact"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    if (cfg.boolOr("_explain_only", false)) return ctx.primary
    val path = cfg.str("path")
    val targetMb = cfg.longOr("target_file_mb", 128L)
    if (targetMb < 1) throw new GraftConfigError("index.compact: target_file_mb must be >= 1")
    val spark = ctx.spark

    // THE WHOLE VERB runs under the shared batch/maintenance lease —
    // including the mode decision, crash repair, generation GC, and the
    // snapshot listing, not just the rewrite: a batch index_append landing
    // between an unleased listing and a leased rewrite would be invisible
    // to the snapshot and deleted by the swap (the silent-miss class the
    // lease exists for), and the generational GC must never see — or
    // collect — another compact's in-progress generation. A live
    // stream.ingest holding the index fails this claim loud: the
    // quiesced contract, enforced.
    graft.streaming.IngestLease.withBatchLease(path, "index.compact") {

    // COMMIT MODE. "swap" (the classic protocol) installs the rewritten
    // corpus by two directory renames and is only sound where rename is an
    // atomic metadata op; "generations" writes the rewrite to a fresh
    // `corpus-NNNNNN` dir and commits by REPLACING the `corpus.ptr`
    // pointer file — a single small-file PUT, atomic on every store — so
    // index.compact works on S3-class stores too (see DESIGN_NOTES
    // "Object-store commit semantics"). auto = generations when the store
    // lacks atomic rename OR the index is already generational; swap
    // otherwise (keeps the measured local behavior and its crash-repair
    // machinery byte-identical).
    val corpusDir0 = IndexSnapshot.corpusDir(path)
    val generational = cfg.strOr("layout", "auto") match {
      case "swap" =>
        GraftFs.requireAtomicRename(path, "index.compact layout=swap")
        if (corpusDir0 != s"$path/corpus") throw new GraftConfigError(
          s"index.compact: the index at $path is generation-pointer committed " +
          "(corpus.ptr present) — layout=swap cannot apply; use layout=generations or auto")
        false
      case "generations" => true
      case "auto" => corpusDir0 != s"$path/corpus" || !GraftFs.renameIsAtomic(path)
      case other => throw new GraftConfigError(
        s"index.compact: layout must be swap|generations|auto, got '$other'")
    }
    if (!generational) {
      IndexMaintenance.recoverSwap(path, cleanTmp = true)
    } else {
      // quiesced-maintenance contract ⇒ any corpus-* dir the pointer does
      // not reference is a crashed rewrite's garbage — collect it now
      val active = GraftFs.path(corpusDir0).getName
      GraftFs.listDirNames(path)
        .filter(g => g.startsWith("corpus-") && g != active)
        .foreach(g => GraftFs.deleteRec(s"$path/$g"))
    }

    // the index family (= corpus layout) from its own metadata
    val (family, partitionCols) = IndexMaintenance.layout(spark, path, "index.compact")

    val corpusDir = corpusDir0
    val filesLen = IndexSnapshot.filesWithLen(corpusDir,
      s"index.compact: index at $path has no corpus directory")
    val files = filesLen.map(_._1)
    if (files.nonEmpty) { // empty index — nothing to rewrite

    // a stream.ingest query crashed mid-batch may hold an UNCOMMITTED
    // corpus/sb-* append that its replay must still see via the excludeDir
    // self-match exclusion; folding it into the flat generation would make
    // the retried batch dedup against its own failed attempt and emit
    // nothing. Committed and in-flight sb-* dirs are indistinguishable
    // from here, so their mere presence blocks ANY corpus rewrite here —
    // compact and retrain alike — unless the caller asserts the stream is
    // quiesced at a committed batch.
    val sbDirs = files.map(f => GraftFs.relativize(corpusDir, f))
      .flatMap(_.split('/').dropRight(1))
      .filter(s => s.startsWith("sb-") || s.startsWith("ingest_tag=sb-"))
      .distinct
    def requireQuiesced(): Unit =
      if (sbDirs.nonEmpty && !cfg.boolOr("force", false))
        throw new GraftConfigError(
          s"index.compact: the corpus at $path holds ${sbDirs.size} stream.ingest " +
          "micro-batch append dir(s) (sb-*) — if the streaming query crashed mid-batch, " +
          "its replay dedups against its own folded append and emits nothing. Stop the " +
          "stream at a committed batch (or drop its checkpoint), then re-run with " +
          "force = true")

    // retrain_if policy gate — the observe→act closure over index.recall
    // and cell_skew: when the measured number crosses the threshold, the
    // quantizer is REBUILT from the current corpus (index.build
    // mode=overwrite semantics under this verb's already-held lease), so
    // appends that drifted off the frozen training distribution stop
    // costing recall. A retrain rewrites every corpus file, so it
    // supersedes the physical compact below.
    val retrainReason: Option[String] = cfg.tblOpt("retrain_if").flatMap(cond =>
      IndexRetrain.evaluate(ctx, path, family, corpusDir, cond))
    retrainReason.foreach { reason =>
      requireQuiesced()
      IndexRetrain.retrain(ctx, path, family, corpusDir,
        cfg.tblOpt("retrain_if").get, reason)
    }

    // compact_if policy gate: skip the rewrite when nothing tripped. A
    // fired retrain skips it too (the rebuild just rewrote the corpus);
    // retrain_if present WITHOUT compact_if is a policy-only invocation —
    // untripped means untouched, not an unconditional rewrite.
    val policySkipped = retrainReason.isDefined || (cfg.tblOpt("compact_if") match {
      case None =>
        val policyOnly = cfg.tblOpt("retrain_if").isDefined
        if (policyOnly)
          System.err.println(s"[graft] index.compact: $path — retrain_if not " +
            "tripped (no compact_if) — skipped")
        policyOnly
      case Some(cond) =>
      val known = Set("mean_file_kb_below", "files_above", "appends_since_compact_above")
      cond.table.keys.filterNot(known).foreach(k => throw new GraftConfigError(
        s"index.compact: unknown compact_if condition '$k' (use ${known.mkString(", ")})"))
      if (cond.table.isEmpty) throw new GraftConfigError(
        "index.compact: compact_if is present but names no condition")
      val meanKb = filesLen.map(_._2).sum / 1024.0 / files.size
      lazy val sinceCompact = {
        val gen = s"$path/compact.gen"
        if (!GraftFs.exists(gen)) files.size.toLong
        else {
          val compacted = GraftFs.readString(gen)
            .linesIterator.map(_.trim).filter(_.nonEmpty).toSet
          files.count(f => !compacted.contains(GraftFs.relativize(corpusDir, f))).toLong
        }
      }
      val tripped =
        cond.longOpt("mean_file_kb_below").exists(meanKb < _) ||
        cond.longOpt("files_above").exists(files.size > _) ||
        cond.longOpt("appends_since_compact_above").exists(sinceCompact > _)
      if (!tripped)
        System.err.println(s"[graft] index.compact: $path — compact_if not tripped " +
          f"(${files.size} files, mean $meanKb%.1f KiB, $sinceCompact appends since " +
          "compact) — skipped")
      !tripped
    })
    if (!policySkipped) {
    requireQuiesced()
    val bytes = filesLen.map(_._2).sum

    val reader = spark.read
    val corpus0 = (if (partitionCols.nonEmpty)
                     reader.option("basePath", GraftFs.qualified(corpusDir))
                   else reader).parquet(files: _*)
    // bands layout: fold every ingest_tag into "base" — the tag is layout
    // provenance (which micro-batch appended the row), never probed, and a
    // long-running stream mints one (band, pband, tag) dir per populated
    // band per micro-batch; folding restores the bands × pdirs dir bound.
    // Probe results are unchanged (probes join on (band, pband, bsig) and
    // read the tag only for streaming self-exclusion, which the force-flag
    // quiesce contract already rules out here).
    val corpus = if (partitionCols.contains("ingest_tag"))
      corpus0.withColumn("ingest_tag", F.lit("base")) else corpus0

    // generations mode writes the rewrite STRAIGHT to the next
    // generation dir (a crash leaves an unreferenced dir the next compact
    // garbage-collects — never a partial active corpus); swap mode stages
    // it in the .tmp dir the repair protocol knows
    val tmp =
      if (!generational) s"$path/corpus.compact.tmp"
      else {
        val next = 1L + GraftFs.listDirNames(path)
          .filter(_.startsWith("corpus-"))
          .flatMap(_.stripPrefix("corpus-").toLongOption)
          .foldLeft(0L)(math.max)
        f"$path/corpus-$next%06d"
      }
    if (partitionCols.nonEmpty)
      corpus.repartition(partitionCols.map(F.col): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp)
    else {
      val targetBytes = targetMb * 1024L * 1024L
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      corpus.repartition(nOut).write.mode("overwrite").parquet(tmp)
    }

    // refuse to install a generation that lost (or invented) rows: the
    // swap deletes the old corpus, so this is the last cheap moment to
    // notice a rewrite bug before it becomes data loss
    val before = corpus.count()
    val after = spark.read.parquet(tmp).count()
    if (before != after) {
      GraftFs.deleteRec(tmp)
      throw new GraftPlanError(
        s"index.compact: rewrite row count mismatch at $path ($before before, $after " +
        "after) — compacted generation discarded, index left untouched")
    }

    // record the compacted generation's file list (for index.stats'
    // appends_since_compact) BEFORE the commit, from the new generation's
    // listing — in swap mode the relative part-file names are identical
    // post-install, and writing it here means a crash between the commit
    // and this write can't leave stats over-reporting the whole corpus as
    // fresh appends. A crash between this write and the commit leaves
    // compact.gen naming a discarded generation — stats then over-report
    // (reads as "never compacted"), which only triggers an early
    // re-compact, never skips one.
    val tmpFiles = IndexSnapshot.files(tmp, s"index.compact: $tmp vanished")
    val rel = tmpFiles.map(f => GraftFs.relativize(tmp, f))
    GraftFs.writeStringCommit(s"$path/compact.gen", rel.mkString("\n"))

    if (!generational) {
      val hold = s"$path/corpus.compact.old"
      if (!GraftFs.rename(corpusDir, hold))
        throw new GraftPlanError(
          s"index.compact: could not hold the corpus generation aside at $path — " +
          "another maintenance process is racing this compact (compact must run quiesced)")
      if (!GraftFs.rename(tmp, corpusDir))
        // recoverable: the next corpus reader's recoverSwap installs tmp
        throw new GraftPlanError(
          s"index.compact: install rename lost a race at $path — the next corpus " +
          "reader repairs the swap; re-run compact quiesced")
      GraftFs.deleteRec(hold)
    } else {
      // THE commit point: replace the pointer (single small-file PUT —
      // atomic everywhere); every reader resolves through
      // IndexSnapshot.corpusDir, so the switch is all-or-nothing. The old
      // generation is garbage after this line — best-effort delete, with
      // the next compact's GC as the backstop.
      GraftFs.writeStringCommit(s"$path/corpus.ptr", GraftFs.path(tmp).getName)
      GraftFs.deleteRec(corpusDir)
    }

    System.err.println(s"[graft] index.compact: $path — ${files.size} files " +
      s"(${bytes / 1048576} MiB) → ${tmpFiles.size} files" +
      (if (generational) s" [generation ${GraftFs.path(tmp).getName}]" else ""))

    } // !policySkipped
    } // files.nonEmpty
    } // withBatchLease
    ctx.primary
  }
}

/** `retrain_if` — the remediation half of the index-quality loop. The
  * measurement half already exists (`index.recall` measures pruned-probe
  * recall, `index.stats` reports cell_skew); this closes it: a scheduled
  * maintenance pipeline can now say
  *
  *   [stages.maintain.config.retrain_if]
  *   recall_below = 0.8     # trip when measured mean recall@k drops below
  *   nprobe = 4             # ... at this probe width (k/queries/seed too)
  *   cell_skew_above = 4.0  # or when the hottest cell exceeds this ×fair-share
  *
  * and the quantizer is rebuilt from the CURRENT corpus only when a
  * measured number says it degraded. Conditions OR together; cell skew is
  * checked first (parquet footers only) so a layout-visible degradation
  * never pays the recall measurement (one corpus scan + q probes).
  *
  * The retrain itself is `index.build mode=overwrite` semantics executed
  * under index.compact's already-held writer lease: stage the corpus rows
  * (minus the layout's own columns) to `_retrain_src`, row-parity check,
  * then retrain + re-encode + rewrite through the same build internals a
  * user rebuild runs — fresh centroids (+ codebooks for ivfpq), fresh
  * meta, frozen-append compatibility preserved (later appends assign
  * against the NEW quantizer exactly as they would after a manual
  * rebuild). Crash contract, honestly: a crash between the corpus
  * overwrite starting and finishing loses the live corpus generation —
  * the same window a manual `index.build mode=overwrite` has — but the
  * staged `_retrain_src` copy survives until the rebuild succeeds, so the
  * rows are recoverable by hand. ivf/ivfpq only (the families with a
  * trainable quantizer; lsh planes are fixed at build, set-membership
  * families have nothing to retrain). */
private[operators] object IndexRetrain {

  /** Evaluate retrain_if against the measured index; Some(reason) when a
    * condition trips. Validates the table loud even when nothing trips. */
  def evaluate(ctx: StageContext, path: String, family: String,
      corpusDir: String, cond: Cfg): Option[String] = {
    val known = Set("recall_below", "cell_skew_above", "nprobe", "k",
      "queries", "seed", "rerank", "id_column", "vector_column", "max_train",
      "corpus_sample")
    cond.table.keys.filterNot(known).foreach(k => throw new GraftConfigError(
      s"index.compact: unknown retrain_if key '$k' (use ${known.mkString(", ")})"))
    if (cond.doubleOpt("recall_below").isEmpty && cond.doubleOpt("cell_skew_above").isEmpty)
      throw new GraftConfigError(
        "index.compact: retrain_if must name recall_below and/or cell_skew_above")
    if (family != "ivf" && family != "ivfpq") throw new GraftConfigError(
      s"index.compact: retrain_if applies to cell-quantized indexes (ivf/ivfpq) — " +
      s"the index at $path is $family (lsh planes are fixed at build; " +
      "set-membership families have no quantizer)")
    val spark = ctx.spark
    val skew = cond.doubleOpt("cell_skew_above").flatMap { thr =>
      if (thr <= 1.0) throw new GraftConfigError(
        s"index.compact: retrain_if.cell_skew_above must be > 1.0 (1.0 = perfectly balanced), got $thr")
      val occ = Pq.cellOccupancy(spark, corpusDir)
      val total = occ.values.sum
      if (occ.isEmpty || total == 0L) None
      else {
        val nlist = IvfCentroids.load(spark, path, "index.compact retrain_if").length
        val ratio = occ.values.max.toDouble * nlist / total
        if (ratio > thr) Some(f"cell_skew $ratio%.2f > $thr%.2f") else None
      }
    }
    skew.orElse(cond.doubleOpt("recall_below").flatMap { thr =>
      if (thr <= 0.0 || thr > 1.0) throw new GraftConfigError(
        s"index.compact: retrain_if.recall_below must be in (0, 1], got $thr")
      val nprobe = cond.longOr("nprobe", 4L)
      val rCfg = Seq[(String, Any)](
        "path" -> path,
        "k" -> cond.longOr("k", 10L),
        "nprobe" -> nprobe,
        "queries" -> cond.longOr("queries", 20L),
        "seed" -> cond.longOr("seed", 11L)) ++
        cond.strOpt("id_column").map(v => "id_column" -> (v: Any)).toSeq ++
        cond.strOpt("vector_column").map(v => "vector_column" -> (v: Any)).toSeq ++
        cond.longOpt("rerank").map(v => "rerank" -> (v: Any)).toSeq ++
        // a SCHEDULED policy check at corpus scale should not pay a full
        // exact-truth scan per evaluation — index.recall's sampled mode
        // composes here
        cond.doubleOpt("corpus_sample").map(v => "corpus_sample" -> (v: Any)).toSeq
      val measured = IndexRecallOp(StageContext.one(spark, ctx.primary, Cfg.of(rCfg: _*)))
        .head().getAs[Double]("mean_recall")
      if (measured < thr) Some(f"mean_recall $measured%.4f < $thr%.4f at nprobe=$nprobe")
      else None
    })
  }

  /** Rebuild the quantizer from the current corpus. Caller holds the
    * writer lease and has verified the quiesced contract. */
  def retrain(ctx: StageContext, path: String, family: String,
      corpusDir: String, cond: Cfg, reason: String): Unit = {
    val spark = ctx.spark
    val files = IndexSnapshot.files(corpusDir,
      s"index.compact retrain: no corpus at $path")
    val corpus = spark.read.option("basePath", GraftFs.qualified(corpusDir))
      .parquet(files: _*)
    // drop only the columns the index layout minted; everything else —
    // ids, the vector, user payload — feeds the rebuild unchanged
    val reserved =
      if (family == "ivfpq") Set("cell", "pq_codes", "pq_vnorm") else Set("cell")
    val src = corpus.select(
      corpus.columns.filterNot(reserved).map(F.col).toSeq: _*)

    // stage BEFORE any destructive step: the overwrite below reads from
    // this copy, never from the directory it is rewriting
    val stage = s"$path/_retrain_src"
    GraftFs.deleteRec(stage)
    src.write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    val before = corpus.count()
    val after = staged.count()
    if (before != after) {
      GraftFs.deleteRec(stage)
      throw new GraftPlanError(
        s"index.compact retrain: staged copy row count mismatch at $path " +
        s"($before corpus, $after staged) — retrain aborted, index untouched")
    }

    val buildCfg: Seq[(String, Any)] = family match {
      case "ivfpq" =>
        val meta = IndexMeta.head(spark, s"$path/meta")
        Seq("type" -> "ivfpq", "path" -> path,
          "vector_column" -> PqIndex.metaVectorColumn(meta),
          "nlist" -> meta.getAs[Int]("nlist").toLong,
          "m" -> meta.getAs[Int]("m").toLong,
          "ksub" -> meta.getAs[Int]("ksub").toLong,
          "seed" -> cond.longOr("seed", meta.getAs[Long]("seed")),
          "max_train" -> cond.longOr("max_train", 10000L))
      case _ =>
        val nlist = IvfCentroids.load(spark, path, "index.compact retrain").length
        Seq("type" -> "ivf", "path" -> path,
          "vector_column" -> cond.strOr("vector_column", "embedding"),
          "nlist" -> nlist.toLong,
          "seed" -> cond.longOr("seed", 11L),
          "max_train" -> cond.longOr("max_train", 100000L))
    }

    // index.build mode=overwrite semantics, minus the lease this verb
    // already holds: invalidate the compacted-generation record and any
    // generation-pointer state, then run the same build internals
    GraftFs.deleteIfExists(s"$path/compact.gen")
    IndexSnapshot.resetGenerations(path)
    val bctx = StageContext.one(spark, staged, Cfg.of(buildCfg: _*))
    if (family == "ivfpq") PqIndex.build(bctx)
    else IndexBuildOp.buildIvf(bctx)
    GraftFs.deleteRec(stage) // rebuild landed — the recovery copy retires
    System.err.println(s"[graft] index.compact: $path — retrain_if tripped " +
      s"($reason): $family quantizer retrained on the current corpus " +
      s"($before rows)")
  }
}

/** index.stats — fragmentation / health report for an `index.build`
  * index: the read-only companion of `index.compact` that answers "should
  * I compact yet?". One output row:
  *
  *   path, index_type (exact|minhash|ngram|simhash|lsh|ivf), rows, files,
  *   bytes,
  *   mean_file_kb, stream_append_dirs (corpus/sb-* micro-batch dirs from
  *   stream.ingest), partition_dirs (populated (block,pbucket)/cell dirs;
  *   0 for flat layouts)
  *
  * `rows` is a parquet-metadata count over the corpus snapshot (footers
  * only — no data scan); everything else is directory listing. Safe to
  * run any time (repairs a crashed compact swap first, like every other
  * corpus reader); wire `files` / `mean_file_kb` into a maintenance
  * pipeline's filter to trigger `index.compact` conditionally.
  *
  * MATERIALIZATION SEMANTICS: a plain transform — the stats frame IS the
  * output (unlike index.compact, which passes its input through).
  */
object IndexStatsOp extends Stage {
  val name = "index.stats"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val spark = ctx.spark
    import spark.implicits._

    if (cfg.boolOr("_explain_only", false))
      return Seq.empty[(String, String, Long, Long, Long, Double, Long, Long, Long,
          Option[String], Option[Long], Option[Double], Option[Double], Option[Double])]
        .toDF("path", "index_type", "rows", "files", "bytes", "mean_file_kb",
          "stream_append_dirs", "partition_dirs", "appends_since_compact",
          "lease_holder", "lease_age_ms", "mean_bucket_occupancy", "pq_scan_ratio",
          "cell_skew")

    IndexMaintenance.recoverSwap(path)
    val (family, partitionCols) = IndexMaintenance.layout(spark, path, "index.stats")
    val corpusDir = IndexSnapshot.corpusDir(path)
    val filesLen = IndexSnapshot.filesWithLen(corpusDir,
      s"index.stats: index at $path has no corpus directory")
    val files = filesLen.map(_._1)
    val bytes = filesLen.map(_._2).sum
    // one dir per stream.ingest micro-batch (the per-batch idempotent
    // append target) — the lsh/ivf partition dirs are key=value segments
    val appendDirs = files.map(f => GraftFs.relativize(corpusDir, f))
      .flatMap(_.split('/').dropRight(1))
      // flat layouts: bare sb-* subdirs; bands layout: ingest_tag=sb-*
      // partition dirs (counted once per tag, not once per (band, pband))
      .filter(s => !s.contains("=") || s.startsWith("ingest_tag=sb-"))
      .distinct.size.toLong
    val partDirs =
      if (partitionCols.isEmpty) 0L
      else files.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.size.toLong
    val rows =
      if (files.isEmpty) 0L
      else spark.read.parquet(files: _*).count() // parquet footer count
    val meanKb = if (files.isEmpty) 0.0
      else math.round(bytes / 1024.0 / files.size * 10) / 10.0
    // files beyond the last compacted generation (index.compact records
    // its generation's file list in compact.gen) — the direct "appends
    // since last compact" trigger signal; never compacted → every file.
    // Self-healing heuristic: a compact crashed between its gen-write and
    // its swap leaves gen naming a discarded generation, which reads here
    // as "everything is a fresh append" — an early re-compact, never a
    // skipped one.
    val gen = s"$path/compact.gen"
    val sinceCompact =
      if (!GraftFs.exists(gen)) files.size.toLong
      else {
        val compacted = GraftFs.readString(gen)
          .linesIterator.map(_.trim).filter(_.nonEmpty).toSet
        files.count(f => !compacted.contains(GraftFs.relativize(corpusDir, f))).toLong
      }
    // live-writer visibility: the lease body + heartbeat age, so a
    // maintenance pipeline can see "a writer holds this index" in the
    // same report it reads fragmentation from (and skip/schedule its
    // compact accordingly) — null columns when the index is free
    val lease = graft.streaming.IngestLease.holder(path)
    // bands layout only: mean rows per (band, bucket) — the linear-in-n
    // candidate driver the build-time advisory warns on (BENCH_NOTES r11
    // ANN rungs); a maintenance pipeline can watch it drift and trigger a
    // band_planes rebuild the way compact_if triggers folds. rows here is
    // the SIGNATURE row count (bands rows per vector), so vectors =
    // rows / bands and occupancy = vectors / 2^band_planes.
    val occupancy: Option[Double] =
      if (!GraftFs.isDir(s"$path/meta")) None
      else {
        val m = IndexMeta.head(spark, s"$path/meta")
        if (!m.schema.fieldNames.contains("band_planes")) None
        else {
          val bands = m.getAs[Int]("bands").toLong
          val planes = m.getAs[Int]("band_planes")
          Some(rows.toDouble / math.max(1L, bands) / (1L << planes))
        }
      }
    // ivfpq only: measured vector-column bytes / code-column bytes over
    // the corpus footers — the per-index, observable version of the
    // BENCH_NOTES scan-bytes claim (an ADC probe reads 1/ratio of the
    // bytes a flat probe would); null for every other family
    val pqScanRatio: Option[Double] =
      if (family != "ivfpq" || files.isEmpty) None
      else try {
        val m = IndexMeta.head(spark, s"$path/meta")
        val vecCol = PqIndex.metaVectorColumn(m)
        val vecBytes = PqIndex.columnChunkBytes(spark, files, Set(vecCol))
        val codeBytes = PqIndex.columnChunkBytes(spark, files, Set("pq_codes", "pq_vnorm"))
        if (codeBytes <= 0L) None
        else Some(math.round(vecBytes.toDouble / codeBytes * 10) / 10.0)
      } catch { case scala.util.control.NonFatal(_) => None }
    // ivf/ivfpq only: the hottest cell's share of the corpus × nlist —
    // 1.0 = perfectly balanced, ≫ 1 = a skewed quantizer (the observable
    // form of the build-time cell-skew advisory: probes at fixed nprobe
    // lose recall balance). Footer row counts per cell dir, no data scan;
    // a maintenance pipeline can watch it drift and trigger a
    // mode=overwrite retrain. Null for non-cell families.
    val cellSkew: Option[Double] =
      if (family != "ivf" && family != "ivfpq") None
      else try {
        // nlist from the centroids table, NOT the populated-cell count —
        // a fully collapsed quantizer (everything in one cell) must read
        // as maximal skew (= nlist), not as "balanced"
        val nlist = IvfCentroids.load(spark, path, "index.stats").length
        val occ = Pq.cellOccupancy(spark, corpusDir)
        val total = occ.values.sum
        if (occ.isEmpty || total == 0L || nlist == 0) None
        else Some(math.round(occ.values.max.toDouble * nlist / total * 100) / 100.0)
      } catch { case scala.util.control.NonFatal(_) => None }
    Seq((path, family, rows, files.size.toLong, bytes, meanKb, appendDirs, partDirs,
        sinceCompact, lease.map(_._1), lease.map(_._2), occupancy, pqScanRatio, cellSkew))
      .toDF("path", "index_type", "rows", "files", "bytes", "mean_file_kb",
        "stream_append_dirs", "partition_dirs", "appends_since_compact",
        "lease_holder", "lease_age_ms", "mean_bucket_occupancy", "pq_scan_ratio",
        "cell_skew")
  }
}
