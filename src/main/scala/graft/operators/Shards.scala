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
  * shard IS the unit of parallel IO downstream); `path/_manifest/` holds
  * one row per shard (`shard`, `n_docs`, `n_tokens`) — underscore-named,
  * so readers of `path` skip it. Registered as a TRANSFORM whose output
  * is the manifest (read back from disk), NOT the input rows — the
  * index.build/ingest.compact pattern: the write is the compose-time
  * side effect, and the useful downstream product is the audit row set
  * (pipe it into stdout.write or validate.schema; `explain` skips the
  * write and plans an empty manifest). `overwrite = true` replaces an
  * existing export; the default refuses an existing path.
  *
  * Crash contract: the manifest is written AFTER the data and is the
  * export's commit marker — an export directory with no `_manifest/` is
  * incomplete (a crash mid-write) and should be re-run with
  * `overwrite = true`; per-task atomicity inside the data write is the
  * Spark/Hadoop committer's.
  *
  * 100 TB shape: the prefix sum is the TwoPass scaffold (per-partition
  * summaries ∝ #partitions, never #rows), the shard shuffle is one
  * hash exchange on the shard id (collisions only serialize two shards
  * through one task), and the manifest is a narrow agg with ≤ #shards
  * rows that never touches the driver. Shard count at 100 TB / 1 GB
  * budget ≈ 10⁵ — directory listings stay per-shard, and the manifest
  * parquet replaces any need to list `path` at all.
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
    // (rows mode only) none. Budget validation is per-rule.
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

    // explain: every config/schema check above ran; skip the jobs (prefix
    // sum, write, manifest) and plan the empty manifest shape
    if (cfg.boolOr("_explain_only", false)) {
      import ctx.spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("shard", "n_docs", "n_tokens")
    }

    val orderCols = orderBy.map(F.col)
    val sorted = df.withColumn("__graft_ntok", tokCol)
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val ntokIdx = sorted.schema.fieldIndex("__graft_ntok")
    val outSchema = StructType(sorted.schema.fields :+
      StructField("shard", LongType, nullable = false))

    val sharded = by match {
      case "tokens" =>
        TwoPass[Long, Long](sorted, outSchema) { it =>
          var s = 0L; it.foreach(r => s += r.getLong(ntokIdx)); s
        } { sums =>
          sums.scanLeft(0L)(_ + _).dropRight(1)
        } { (carry, it) =>
          var running = carry
          it.map { r =>
            val start = running
            running += r.getLong(ntokIdx)
            Row.fromSeq(r.toSeq :+ start / budget)
          }
        }
      case "rows" =>
        TwoPass[Long, Long](sorted, outSchema) { it =>
          var n = 0L; it.foreach(_ => n += 1); n
        } { counts =>
          counts.scanLeft(0L)(_ + _).dropRight(1)
        } { (carry, it) =>
          var rank = carry
          it.map { r =>
            val id = rank / budget
            rank += 1
            Row.fromSeq(r.toSeq :+ id)
          }
        }
    }

    val writeMode =
      if (cfg.boolOr("overwrite", false)) "overwrite" else "errorifexists"
    // shard compression: gzip jsonl / zstd parquet are the loader-standard
    // shapes at real scale; default = the format's Spark default
    val compression = cfg.strOpt("compression")
    compression.filterNot(Set("none", "gzip", "snappy", "zstd", "lz4")).foreach(c =>
      throw new GraftConfigError(
        s"shards.write: compression must be none|gzip|snappy|zstd|lz4, got '$c'"))
    // one shuffle keyed on shard id → each shard dir gets exactly one file
    var files = sharded.drop("__graft_ntok")
      .repartition(F.col("shard"))
      .write.partitionBy("shard").mode(writeMode)
    compression.foreach(c => files = files.option("compression", c))
    format match {
      case "parquet" => files.parquet(path)
      case "jsonl"   => files.json(path)
    }
    // manifest AFTER the data (an overwrite wiped `path` above); ≤ #shards
    // rows, coalesced — the audit artifact a loader reads instead of
    // listing path
    sharded.groupBy("shard")
      .agg(F.count(F.lit(1)).as("n_docs"), F.sum("__graft_ntok").as("n_tokens"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
    ctx.spark.read.parquet(s"$path/_manifest")
  }
}
