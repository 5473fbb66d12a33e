package graft

import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.{Bpe, BpeTokenizeOp, BpeTrainOp}

/** bpe.train + tokenize.bpe — Sennrich char-level BPE. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the classic hand-computed example") {
    // Sennrich et al. 2016 running example (word, freq):
    // low:5 lower:2 newest:6 widest:3
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnMerges(vocab, 4)
    // pair counts round 1: (e,s)=9 (newest+widest) wins; then (es,t)=9;
    // then (l,o)=7; then (lo,w)=7
    assert(merges === Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encodeWord applies merges by rank and never crosses word chars") {
    val rank = Map(("e", "s") -> 0, ("es", "t") -> 1, ("l", "o") -> 2, ("lo", "w") -> 3)
    assert(Bpe.encodeWord("newest", rank).toSeq === Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("lowest", rank).toSeq === Seq("low", "est"))
    assert(Bpe.encodeWord("x", rank).toSeq === Seq("x"))
    assert(Bpe.encodeWord("slow", rank).toSeq === Seq("s", "low"))
  }

  test("token concatenation always reconstructs the word (round-trip invariant)") {
    val rank = Map(("e", "s") -> 0, ("es", "t") -> 1, ("l", "o") -> 2)
    for (w <- Seq("tempest", "lesson", "stellar", "ls", ""))
      assert(Bpe.encodeWord(w, rank).mkString === w)
  }

  test("bpe.train is distributed word counting + driver merge learning") {
    val docs = Seq.tabulate(20)(i => s"newest newest widest low lower doc$i")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = BpeTrainOp(StageContext.one(spark, docs, Cfg.of(
      "num_merges" -> 4)))
    assert(merges.columns.toSeq === Seq("rank", "left", "right"))
    val got = merges.as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got.take(2).map(t => (t._2, t._3)) === Seq(("e", "s"), ("es", "t")))
  }

  test("tokenize.bpe with inline merges: counts and optional token arrays") {
    val docs = Seq((1L, "newest lowest"), (2L, "low")).toDF("doc_id", "text")
    val out = BpeTokenizeOp(StageContext.one(spark, docs, Cfg.of(
      "merges" -> Seq("e s", "es t", "l o", "lo w"),
      "tokens_column" -> "toks")))
    val rows = out.select("doc_id", "n_tokens", "toks").as[(Long, Long, Seq[String])].collect()
    val byId = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) === ((6L, Seq("n", "e", "w", "est", "low", "est"))))
    assert(byId(2L) === ((1L, Seq("low"))))
  }

  test("tokenize.bpe consumes bpe.train output as a second input") {
    val corpus = Seq.tabulate(10)(i => (i.toLong, "newest widest newest")).toDF("doc_id", "text")
    val merges = BpeTrainOp(StageContext.one(spark, corpus, Cfg.of("num_merges" -> 2)))
    val out = BpeTokenizeOp(StageContext(spark,
      Seq("docs" -> Seq((1L, "newest")).toDF("doc_id", "text"), "merges" -> merges),
      Cfg.of("tokens_column" -> "toks")))
    assert(out.select("toks").as[Seq[String]].head() === Seq("n", "e", "w", "est"))
  }

  test("tokenize.bpe without merges errors; count-only path adds just n_tokens") {
    intercept[GraftConfigError] {
      BpeTokenizeOp(StageContext.one(spark, Seq((1L, "x")).toDF("doc_id", "text"), Cfg.of()))
    }
    val out = BpeTokenizeOp(StageContext.one(spark,
      Seq((1L, "ab ab")).toDF("doc_id", "text"), Cfg.of("merges" -> Seq("a b"))))
    assert(out.columns.toSeq === Seq("doc_id", "text", "n_tokens"))
    assert(out.select("n_tokens").as[Long].head() === 2L)
  }
}
