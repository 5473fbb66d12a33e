package graft.operators

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.config._
import graft.core._

/** pack.sequences — turn a document table into fixed-token-budget training
  * sequences, the packing step between a cleaned corpus and a pre-training
  * data loader (training-data extension).
  *
  * Modes:
  *  - `chunk` (default, GPT-style concat-and-cut): documents concatenate
  *    into one global token stream in `order_by` order and the stream is
  *    cut every `max_tokens`; a document may span sequences. Output per
  *    doc: `n_tokens`, `tok_start`/`tok_end` (global token offsets),
  *    `seq_first`/`seq_last` (the sequence ids it lands in). The global
  *    offset is a prefix sum → the distributed TwoPass scaffold (one tiny
  *    per-partition summary, no single-partition exchange), and the whole
  *    semantic is ONE window cumsum in SQL — DuckDB-oracle-checked.
  *  - `greedy` (bin packing, no doc splits): documents fill a sequence
  *    until the next one would overflow `max_tokens`, then a new sequence
  *    starts. Declared semantics at scale: packing is RANGE-PARTITION-
  *    LOCAL — sequences never span the range partitions of the `order_by`
  *    sort (each partition starts a fresh sequence; ids stay globally
  *    unique and dense via a TwoPass count-fold). A doc longer than
  *    `max_tokens` gets a sequence of its own. Output per doc: `n_tokens`,
  *    `seq_id`, `seq_pos`.
  *
  * Token counts come from `token_column` (precomputed, e.g. a real
  * tokenizer upstream) or are derived from `text_column` with the shared
  * tokenizer (`tokenizer = whitespace|bpeish`, TextFns parity — the same
  * expressions text.tokens gates against DuckDB).
  */
object PackOp extends Stage {
  val name = "pack.sequences"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val maxTokens = cfg.long("max_tokens")
    if (maxTokens <= 0) throw new GraftConfigError("pack.sequences max_tokens must be positive")
    val orderBy = cfg.strList("order_by")
    if (orderBy.isEmpty) throw new GraftConfigError(
      "pack.sequences requires order_by — packing is order-dependent and must be deterministic")
    val df = ctx.primary

    val nTok0: org.apache.spark.sql.Column = cfg.strOpt("token_column") match {
      case Some(tc) => F.col(tc).cast(LongType)
      case None =>
        val text = F.col(cfg.strOr("text_column", "text"))
        cfg.strOr("tokenizer", "whitespace") match {
          case "whitespace" => TextFns.wsTokenCount(text).cast(LongType)
          case "bpeish"     => TextFns.bpeishTokenCount(text)
          case other => throw new GraftConfigError(
            s"pack.sequences tokenizer must be whitespace|bpeish, got '$other'")
        }
    }
    // null text / null token value contributes zero tokens (a null would
    // otherwise NPE out of Row.getLong in the executor)
    val nTok = F.coalesce(nTok0, F.lit(0L))

    val orderCols = orderBy.map(F.col)
    val sorted = df.withColumn("n_tokens", nTok)
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // fieldIndex, not columns.length-1: withColumn REPLACES in place when
    // the input already has an n_tokens column
    val ntokIdx = sorted.schema.fieldIndex("n_tokens")

    cfg.strOr("mode", "chunk") match {
      case "chunk"  => chunk(sorted, ntokIdx, maxTokens)
      case "greedy" => greedy(sorted, ntokIdx, maxTokens)
      case other => throw new GraftConfigError(s"pack.sequences mode must be chunk|greedy, got '$other'")
    }
  }

  private def chunk(sorted: DataFrame, ntokIdx: Int, maxTokens: Long): DataFrame = {
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("tok_start", LongType, nullable = false),
      StructField("tok_end", LongType, nullable = false),
      StructField("seq_first", LongType, nullable = false),
      StructField("seq_last", LongType, nullable = false)))
    TwoPass[Long, Long](sorted, outSchema) { it =>
      var s = 0L
      it.foreach(r => s += r.getLong(ntokIdx))
      s
    } { sums =>
      sums.scanLeft(0L)(_ + _).dropRight(1) // exclusive prefix per partition
    } { (carry, it) =>
      var running = carry
      it.map { r =>
        val n = r.getLong(ntokIdx)
        val start = running
        val end = start + n
        running = end
        val seqFirst = start / maxTokens
        val seqLast = math.max(start, end - 1) / maxTokens
        Row.fromSeq(r.toSeq ++ Seq(start, end, seqFirst, seqLast))
      }
    }
  }

  private def greedy(sorted: DataFrame, ntokIdx: Int, maxTokens: Long): DataFrame = {
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("seq_id", LongType, nullable = false),
      StructField("seq_pos", LongType, nullable = false)))
    // pass 1 counts the sequences each partition produces (packing is
    // partition-local, so the count is a pure function of the partition)
    TwoPass[Long, Long](sorted, outSchema) { it =>
      var seqs = 0L
      var room = -1L // -1 = no open sequence
      it.foreach { r =>
        val n = r.getLong(ntokIdx)
        if (room < 0 || n > room) { seqs += 1; room = maxTokens }
        room -= n
      }
      seqs
    } { counts =>
      counts.scanLeft(0L)(_ + _).dropRight(1)
    } { (firstSeqId, it) =>
      var seq = firstSeqId - 1
      var room = -1L
      var pos = 0L
      it.map { r =>
        val n = r.getLong(ntokIdx)
        if (room < 0 || n > room) { seq += 1; room = maxTokens; pos = 0L }
        room -= n
        val out = Row.fromSeq(r.toSeq ++ Seq(seq, pos))
        pos += 1
        out
      }
    }
  }
}
