package graft

import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.PackOp

/** pack.sequences — token-budget packing for training sequences. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  // token counts (whitespace): 3, 4, 2, 5, 1
  private def docs = Seq(
    (1L, "a b c"), (2L, "d e f g"), (3L, "h i"), (4L, "j k l m n"), (5L, "o"))
    .toDF("doc_id", "text")

  private def pack(cfg: (String, Any)*) =
    PackOp(StageContext.one(spark, docs, Cfg.of(
      (Seq[(String, Any)]("order_by" -> Seq("doc_id")) ++ cfg): _*)))

  test("chunk mode: global offsets and sequence spans") {
    val out = pack("max_tokens" -> 4).orderBy("doc_id")
      .select("doc_id", "n_tokens", "tok_start", "tok_end", "seq_first", "seq_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 3L, 0L, 3L, 0L, 0L),   // tokens 0-2 → seq 0
      (2L, 4L, 3L, 7L, 0L, 1L),   // tokens 3-6 → spans seqs 0,1
      (3L, 2L, 7L, 9L, 1L, 2L),   // tokens 7-8 → spans seqs 1,2
      (4L, 5L, 9L, 14L, 2L, 3L),  // tokens 9-13 → spans seqs 2,3
      (5L, 1L, 14L, 15L, 3L, 3L)))
  }

  test("chunk mode is partition-invariant (prefix sum, not partition luck)") {
    val base = pack("max_tokens" -> 4).orderBy("doc_id").collect().toSeq
    val repartitioned = PackOp(StageContext.one(spark, docs.repartition(7), Cfg.of(
      "order_by" -> Seq("doc_id"), "max_tokens" -> 4))).orderBy("doc_id").collect().toSeq
    assert(base === repartitioned)
  }

  test("greedy mode: no sequence exceeds the budget, positions reset, ids dense") {
    val out = pack("max_tokens" -> 6, "mode" -> "greedy").orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id", "seq_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // greedy fill at 6: [doc1(3) doc2? 3+4>6 → no] → seq0=[1], seq1=[2(4), 3(2)], seq2=[4(5), 5(1)]
    assert(out.toSeq === Seq(
      (1L, 3L, 0L, 0L), (2L, 4L, 1L, 0L), (3L, 2L, 1L, 1L),
      (4L, 5L, 2L, 0L), (5L, 1L, 2L, 1L)))
    val totals = out.groupBy(_._3).values.map(_.map(_._2).sum)
    assert(totals.forall(_ <= 6))
  }

  test("greedy mode: an oversized document gets its own sequence") {
    val big = Seq((1L, "a b"), (2L, "c d e f g h i j"), (3L, "k")).toDF("doc_id", "text")
    val out = PackOp(StageContext.one(spark, big, Cfg.of(
      "order_by" -> Seq("doc_id"), "max_tokens" -> 4, "mode" -> "greedy")))
      .orderBy("doc_id").select("seq_id").as[Long].collect().toSeq
    assert(out === Seq(0L, 1L, 2L)) // 8-token doc is alone in seq 1
  }

  test("precomputed token_column and bpeish tokenizer are honored") {
    val withTok = docs.withColumn("toks", org.apache.spark.sql.functions.lit(10L))
    val out = PackOp(StageContext.one(spark, withTok, Cfg.of(
      "order_by" -> Seq("doc_id"), "max_tokens" -> 10, "token_column" -> "toks")))
      .orderBy("doc_id").select("seq_first").as[Long].collect().toSeq
    assert(out === Seq(0L, 1L, 2L, 3L, 4L))
    val bp = pack("max_tokens" -> 100, "tokenizer" -> "bpeish").orderBy("doc_id")
      .select("n_tokens").as[Long].head()
    assert(bp === 3L) // "a b c" → 3 bpeish tokens
  }

  test("null text counts zero tokens; existing n_tokens column is found by position") {
    val nullDocs = Seq((1L, Some("a b")), (2L, None), (3L, Some("c")))
      .toDF("doc_id", "text")
    val out = PackOp(StageContext.one(spark, nullDocs, Cfg.of(
      "order_by" -> Seq("doc_id"), "max_tokens" -> 2)))
      .orderBy("doc_id").select("n_tokens", "tok_start").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((2L, 0L), (0L, 2L), (1L, 2L)))
    // token column named n_tokens but NOT in last position
    val mid = Seq((1L, 7L, "x"), (2L, 3L, "y")).toDF("doc_id", "n_tokens", "note")
    val packed = PackOp(StageContext.one(spark, mid, Cfg.of(
      "order_by" -> Seq("doc_id"), "max_tokens" -> 5, "token_column" -> "n_tokens")))
      .orderBy("doc_id").select("tok_start", "tok_end").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(packed.toSeq === Seq((0L, 7L), (7L, 10L)))
  }

  test("config validation is loud") {
    intercept[GraftConfigError](PackOp(StageContext.one(spark, docs, Cfg.of("max_tokens" -> 4))))
    intercept[GraftConfigError](pack("max_tokens" -> 0))
    intercept[GraftConfigError](pack("max_tokens" -> 4, "mode" -> "optimal"))
    intercept[GraftConfigError](pack("max_tokens" -> 4, "tokenizer" -> "tiktoken"))
  }
}
