package graft.operators

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.config._
import graft.core._

/** shards.write — export a cleaned corpus as fixed-budget training shards
  * plus a manifest, the hand-off format between a data pipeline and a
  * pre-training loader (WebDataset / Megatron-style sharding: many
  * same-sized files a loader can shuffle, shard across ranks, and resume
  * by offset — training-data extension; the reference stops at whole-file
  * csv/json sinks).
  *
  * Sharding rule (`by = "tokens"`, default): documents take the global
  * `order_by` order and a document belongs to the shard of its global
  * token START offset — shard_id = floor(tok_start / shard_tokens).
  * Documents are never split (the pack.sequences chunk mode is the
  * splitting variant); shard token sums therefore wobble around the
  * budget by at most one document. `by = "rows"` shards on row rank
  * instead: shard_id = floor(rank / shard_rows). Both rules are pure
  * functions of the sorted order — one window cumsum in SQL, which is
  * exactly how the correctness gate's DuckDB oracle restates them.
  *
  * Token counts: `token_column` (precomputed upstream — the real-pipeline
  * path), else derived from `text_column` with the shared tokenizer
  * (`tokenizer` = whitespace | bpeish, TextFns — the same expressions
  * text.tokens gates against DuckDB). `by = "rows"` needs no token source
  * (manifest n_tokens falls back to 0 when none is resolvable).
  *
  * Layout: `path/shard=<id>/part-*` in `format` = parquet (default) |
  * jsonl, ONE file per shard (rows are shuffled once, keyed by shard id,
  * so each shard is written by a single task — the intended shape: a
  * shard IS the unit of parallel IO downstream; rows inside a shard file
  * keep the `order_by` order, so file bytes are deterministic and loaders
  * can resume by in-shard offset); `path/_manifest/` holds one row per
  * shard (`shard`, `n_docs`, `n_tokens`) — underscore-named, so readers
  * of `path` skip it. The manifest is derived FROM THE WRITTEN FILES
  * (read back, grouped by the shard partition column), never from a
  * re-execution of the sharding plan — re-executed partitions could
  * permute `order_by` ties and silently disagree with what was written.
  * Registered as a TRANSFORM whose output is the manifest, NOT the input
  * rows — the index.build/ingest.compact pattern: the write is the
  * compose-time side effect, and the useful downstream product is the
  * audit row set (`explain` skips the write and plans an empty manifest).
  * `overwrite = true` replaces an existing export; the default refuses a
  * COMPLETED existing path.
  *
  * Crash contract + RESTARTABILITY: the manifest is written AFTER the
  * data and is the export's commit marker — an export directory with no
  * `_manifest/` is incomplete. Re-running the same export over it
  * RESUMES instead of redoing finished work: the data is committed in
  * WAVES of `shards_per_commit` shards (default 0 = one wave, i.e. one
  * commit), each wave's completion recorded as `_progress/wave-<i>.json`
  * after its files commit. On resume, marked waves are skipped outright;
  * shard dirs of unmarked waves (at most the crash-window wave plus
  * never-started ones) are deleted and rewritten, so the final output is
  * byte-identical to a clean run. `_progress/_meta.json` fingerprints
  * the export (rule, budget, order, format, totals) — a resume against a
  * CHANGED input or settings fails loud demanding `overwrite = true`
  * rather than silently stitching two different corpora. The fingerprint
  * is totals-based (partition layout varies across JVMs: range
  * sampling), so resume assumes the deterministic corpus `order_by`
  * already requires. `_progress/` is deleted when the manifest commits.
  *
  * 100 TB shape: the prefix sum is the TwoPass scaffold (per-partition
  * summaries ∝ #partitions, never #rows), each wave's pass-2 reads ONLY
  * the sorted partitions whose offset span overlaps the wave
  * (PartitionPruningRDD — shard ids are monotone in the sorted order, so
  * a wave is a contiguous partition range; boundary partitions are read
  * twice, everything else once regardless of wave count), the shard
  * shuffle is one hash exchange per wave on the shard id, and the
  * manifest is a narrow agg over the written files with ≤ #shards rows
  * that never touches the driver. Shard count at 100 TB / 1 GB budget ≈
  * 10⁵ — `shards_per_commit` ≈ 10³ bounds a crash's lost work to ~1% of
  * the export, and the manifest parquet replaces any need to list
  * `path` at all.
  */
object ShardWriteOp extends Stage {
  val name = "shards.write"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val path = cfg.str("path")
    val by = cfg.strOr("by", "tokens") match {
      case ok @ ("tokens" | "rows") => ok
      case other => throw new GraftConfigError(
        s"shards.write: by must be tokens|rows, got '$other'")
    }
    val format = cfg.strOr("format", "parquet") match {
      case ok @ ("parquet" | "jsonl") => ok
      case other => throw new GraftConfigError(
        s"shards.write: format must be parquet|jsonl, got '$other'")
    }
    val orderBy = cfg.strList("order_by")
    if (orderBy.isEmpty) throw new GraftConfigError(
      "shards.write requires order_by — shard membership is order-dependent and must be deterministic")
    if (df.columns.contains("shard")) throw new GraftConfigError(
      "shards.write: input already has a 'shard' column — rename it (shard is the partition column)")

    // token source: explicit token_column > text_column via tokenizer >
    // (rows mode only) none. Budget validation is per-rule. The expression
    // is name-resolved, so it evaluates identically over the input and
    // over the read-back of the written shards (manifest derivation).
    val tokCol: org.apache.spark.sql.Column = cfg.strOpt("token_column") match {
      case Some(tc) =>
        if (!df.columns.contains(tc)) throw new GraftConfigError(
          s"shards.write: token_column '$tc' not in input (${df.columns.mkString(", ")})")
        F.coalesce(F.col(tc).cast(LongType), F.lit(0L))
      case None =>
        val textCol = cfg.strOr("text_column", "text")
        if (df.columns.contains(textCol)) {
          val t = F.col(textCol)
          cfg.strOr("tokenizer", "whitespace") match {
            case "whitespace" => F.coalesce(TextFns.wsTokenCount(t).cast(LongType), F.lit(0L))
            case "bpeish"     => F.coalesce(TextFns.bpeishTokenCount(t), F.lit(0L))
            case other => throw new GraftConfigError(
              s"shards.write tokenizer must be whitespace|bpeish, got '$other'")
          }
        } else if (by == "rows") F.lit(0L)
        else throw new GraftConfigError(
          s"shards.write by=tokens: no token_column and no '$textCol' column to tokenize")
    }

    val budget = by match {
      case "tokens" =>
        val b = cfg.long("shard_tokens")
        if (b <= 0) throw new GraftConfigError(
          s"shards.write: shard_tokens must be positive, got $b")
        b
      case "rows" =>
        val b = cfg.long("shard_rows")
        if (b <= 0) throw new GraftConfigError(
          s"shards.write: shard_rows must be positive, got $b")
        b
    }
    val perCommit = cfg.longOr("shards_per_commit", 0L)
    if (perCommit < 0) throw new GraftConfigError(
      s"shards.write: shards_per_commit must be >= 0 (0 = single commit), got $perCommit")

    // explain: every config/schema check above ran; skip the jobs (prefix
    // sum, write, manifest) and plan the empty manifest shape
    if (cfg.boolOr("_explain_only", false)) {
      import ctx.spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("shard", "n_docs", "n_tokens")
    }

    val spark = ctx.spark
    val orderCols = orderBy.map(F.col)
    val sorted = df.withColumn("__graft_ntok", tokCol)
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val ntokIdx = sorted.schema.fieldIndex("__graft_ntok")
    val outSchema = StructType(sorted.schema.fields :+
      StructField("shard", LongType, nullable = false))

    // pass 1 + fold now; pass 2 below, per wave, over only the partitions
    // each wave touches
    val (staged, pass2) = by match {
      case "tokens" =>
        (TwoPass.stage(sorted) { it: Iterator[Row] =>
          var s = 0L; it.foreach(r => s += r.getLong(ntokIdx)); s
        } { sums => sums.scanLeft(0L)(_ + _).dropRight(1) },
        (carry: Long, it: Iterator[Row]) => {
          var running = carry
          it.map { r =>
            val start = running
            running += r.getLong(ntokIdx)
            Row.fromSeq(r.toSeq :+ start / budget)
          }
        })
      case "rows" =>
        (TwoPass.stage(sorted) { it: Iterator[Row] =>
          var n = 0L; it.foreach(_ => n += 1); n
        } { counts => counts.scanLeft(0L)(_ + _).dropRight(1) },
        (carry: Long, it: Iterator[Row]) => {
          var rank = carry
          it.map { r =>
            val id = rank / budget
            rank += 1
            Row.fromSeq(r.toSeq :+ id)
          }
        })
    }
    val stats = staged.stats
    val carries = staged.carries
    val total = if (stats.isEmpty) 0L else carries.last + stats.last
    val maxShard = if (total == 0) -1L else (total - 1) / budget
    val waveSize = if (perCommit == 0L) math.max(1L, maxShard + 1) else perCommit
    val waves: IndexedSeq[(Long, Long)] =
      if (maxShard < 0) IndexedSeq.empty
      else (0L to maxShard by waveSize).map(s0 => (s0, math.min(s0 + waveSize - 1, maxShard)))
    // shard-id span of partition p (None = empty partition)
    def span(p: Int): Option[(Long, Long)] =
      if (stats(p) == 0L) None
      else Some((carries(p) / budget, (carries(p) + stats(p) - 1) / budget))

    // shard compression: gzip jsonl / zstd parquet are the loader-standard
    // shapes at real scale; default = the format's Spark default
    val compression = cfg.strOpt("compression")
    compression.filterNot(Set("none", "gzip", "snappy", "zstd", "lz4")).foreach(c =>
      throw new GraftConfigError(
        s"shards.write: compression must be none|gzip|snappy|zstd|lz4, got '$c'"))

    // ---- export-directory protocol (resume / overwrite / refuse) ----
    val progressDir = s"$path/_progress"
    val fingerprint =
      s"""{"by":"$by","budget":$budget,"order_by":"${orderBy.mkString(",")}",""" +
      s""""format":"$format","compression":"${compression.getOrElse("default")}",""" +
      s""""total_units":$total,"max_shard":$maxShard,"wave_size":$waveSize}"""
    var doneWaves: Set[Int] = Set.empty
    if (GraftFs.isDir(path) || GraftFs.isFile(path)) {
      val completed = GraftFs.isDir(s"$path/_manifest")
      if (cfg.boolOr("overwrite", false)) GraftFs.deleteRec(path)
      else if (completed) throw new GraftConfigError(
        s"shards.write: $path already holds a completed export (a _manifest/ commit " +
        "marker exists) — pass overwrite = true to replace it")
      else if (GraftFs.isFile(s"$progressDir/_meta.json") &&
               GraftFs.readString(s"$progressDir/_meta.json") == fingerprint) {
        // RESUME a crashed export of the same corpus + settings: marked
        // waves are complete (their marker committed after their files);
        // everything else rewrites. One listing finds the shard dirs that
        // belong to unmarked waves (the crash-window wave's partial or
        // fully-written-but-unmarked data) — delete just those.
        doneWaves = GraftFs.listNames(progressDir)
          .filter(n => n.startsWith("wave-") && n.endsWith(".json"))
          .map(_.stripPrefix("wave-").stripSuffix(".json").toInt).toSet
        GraftFs.listDirNames(path).filter(_.startsWith("shard=")).foreach { d =>
          val wave = (d.stripPrefix("shard=").toLong / waveSize).toInt
          if (!doneWaves.contains(wave)) GraftFs.deleteRec(s"$path/$d")
        }
        GraftFs.deleteRec(s"$path/_temporary")
        GraftFs.deleteRec(s"$path/_wave_tmp") // crash-window wave's staging
        System.err.println(s"[graft] shards.write: resuming crashed export at $path — " +
          s"${doneWaves.size}/${waves.size} waves already committed")
      }
      else throw new GraftConfigError(
        s"shards.write: $path exists but is not resumable (no _manifest/, and no " +
        "_progress/ matching this export's fingerprint — a crashed export of " +
        "DIFFERENT data or settings, or an unrelated directory); pass " +
        "overwrite = true to replace it")
    }
    GraftFs.mkdirs(progressDir)
    GraftFs.writeString(s"$progressDir/_meta.json", fingerprint)

    // ---- wave writes: filter to the wave's shard range, one shuffle
    // keyed on shard id → each shard dir gets exactly one file; in-shard
    // rows re-sorted to order_by so shard files are deterministic ----
    // multi-wave writes go through a per-wave staging dir: a SaveMode
    // .Append straight into the export root resolves the existing
    // relation first, which builds a file index over every shard dir
    // written so far — O(accumulated shards) listing per wave, quadratic
    // over the export (measured at the 10^5-shard rung: ~10.9 s/wave at
    // 100 waves vs the flat ~1.1 s/commit at 525 shards, with Spark's
    // partition-metadata cache evicting mid-run). Staging writes into an
    // empty dir (no listing), then renames the wave's disjoint shard=
    // dirs into place — O(wave) metadata moves, flat in export size.
    val waveTmp = s"$path/_wave_tmp"
    waves.zipWithIndex.foreach { case ((s0, s1), i) =>
      if (!doneWaves.contains(i)) {
        val target = if (waves.size == 1) path else waveTmp
        if (waves.size > 1) GraftFs.deleteRec(waveTmp)
        val sel = (p: Int) => span(p).exists { case (lo, hi) => lo <= s1 && hi >= s0 }
        // EXPLICIT partition count: a wave's shuffle is small, and AQE
        // would coalesce a plain repartition(shard) to one post-shuffle
        // partition — ONE task then opens every shard file of the wave
        // sequentially, which measured ~3.7× the per-shard write cost at
        // the 10^5-shard rung regardless of wave size. A user-specified
        // count is exempt from AQE coalescing, keeping the dir-writing
        // parallelism at the session's shuffle width in every wave.
        val writeParallelism = spark.sessionState.conf.numShufflePartitions
        var w = staged.run(spark, outSchema, sel)(pass2)
          .filter(F.col("shard").between(s0, s1))
          .drop("__graft_ntok")
          .repartition(writeParallelism, F.col("shard"))
          // shard FIRST: the dynamic-partition writer requires its output
          // ordered by the partition column and inserts its own (unstable)
          // sort otherwise, which would destroy the order_by order inside
          // each shard file on a multi-partition cluster. With shard as a
          // prefix the required ordering is already satisfied, no sort is
          // inserted, and in-file row order is exactly order_by.
          .sortWithinPartitions((F.col("shard") +: orderCols): _*)
          .write.partitionBy("shard").mode("append")
        compression.foreach(c => w = w.option("compression", c))
        format match {
          case "parquet" => w.parquet(target)
          case "jsonl"   => w.json(target)
        }
        if (waves.size > 1) {
          GraftFs.listDirNames(waveTmp).filter(_.startsWith("shard=")).foreach { d =>
            if (!GraftFs.rename(s"$waveTmp/$d", s"$path/$d"))
              throw new GraftPlanError(
                s"shards.write: could not install $d from the wave staging dir — " +
                "another process is writing this export (run it quiesced)")
          }
          GraftFs.deleteRec(waveTmp)
        }
        GraftFs.writeString(s"$progressDir/wave-$i.json",
          s"""{"wave":$i,"first_shard":$s0,"last_shard":$s1}""")
      }
    }
    staged.unpersist() // every pass-2 consumer has run

    // ---- manifest FROM THE WRITTEN FILES (read-your-writes: the audit
    // rows describe what is durably on disk, not a re-execution of the
    // plan), committed last — it is the export's completion marker ----
    val dataSchema = StructType(df.schema.fields)
    val manifest =
      if (maxShard < 0) spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(Seq(
          StructField("shard", LongType), StructField("n_docs", LongType),
          StructField("n_tokens", LongType))))
      else {
        val written = format match {
          case "parquet" => spark.read.option("basePath", path).parquet(path)
          case "jsonl"   => spark.read.schema(dataSchema).option("basePath", path).json(path)
        }
        written.groupBy(F.col("shard").cast(LongType).as("shard"))
          .agg(F.count(F.lit(1)).as("n_docs"), F.sum(tokCol).as("n_tokens"))
      }
    GraftFs.mkdirs(path) // empty corpus: the export dir still exists
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    GraftFs.deleteRec(progressDir) // the manifest is the commit marker now
    ctx.spark.read.parquet(s"$path/_manifest")
  }
}
