package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** Byte-pair-encoding tokenizer pair: learn merges from the corpus, then
  * tokenize with them — the Sennrich et al. 2016 algorithm (the BPE used
  * by subword-nmt/GPT-style vocabularies), char-level symbols.
  *
  * Training-data pipelines need REAL subword token counts (pack.sequences
  * budgets, per-doc cost estimates); the whitespace/bpeish counters in
  * text.tokens approximate, this pair is exact for a given merge table.
  *
  * Scale design: the corpus-sized work — word frequency counting — is
  * fully distributed (tokenize → explode → groupBy word, map-side partial
  * aggregation). Merge learning then runs on the WORD-FREQUENCY TABLE,
  * which is vocabulary-sized, not corpus-sized: it is capped by
  * `top_words` (default 50k, loud cap — same bounded-and-documented
  * driver pattern as json.write's driver_limit) and collected once. This
  * is exactly how subword-nmt trains on real corpora: pair statistics
  * over word types weighted by frequency, never over running text. At
  * 100 TB the word-frequency shuffle is one aggregation; everything
  * after is O(vocab × merges) on the driver.
  */
object Bpe {

  /** One merge-learning step's data: word types as symbol arrays with
    * corpus frequencies. */
  type Vocab = Array[(Array[String], Long)]

  /** Learn `numMerges` merges from (word, freq) pairs — Sennrich
    * algorithm: repeatedly merge the most frequent adjacent symbol pair.
    * Ties break lexicographically (deterministic across runs/partitions). */
  def learnMerges(words: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    val vocab: Vocab = words.map { case (w, f) =>
      (w.map(_.toString).toArray, f)
    }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var n = 0
    var continue = true
    while (n < numMerges && continue) {
      // count adjacent pairs weighted by word frequency
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.merge(k, f, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        var best: (String, String) = null
        var bestN = 0L
        counts.forEach { (k, v) =>
          if (v > bestN || (v == bestN && (best == null || pairLt(k, best)))) {
            best = k; bestN = v
          }
        }
        if (bestN < 2) continue = false // nothing repeats — no signal left
        else {
          merges += best
          val merged = best._1 + best._2
          var wi = 0
          while (wi < vocab.length) {
            val (syms, f) = vocab(wi)
            if (syms.length > 1) {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                  out += merged; i += 2
                } else { out += syms(i); i += 1 }
              }
              vocab(wi) = (out.toArray, f)
            }
            wi += 1
          }
          n += 1
        }
      }
    }
    merges.result()
  }

  private def pairLt(a: (String, String), b: (String, String)): Boolean =
    if (a._1 != b._1) a._1 < b._1 else a._2 < b._2

  /** Tokenize one word with a ranked merge table (lowest rank first —
    * the order merges were learned is the order they apply). */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val out = new Array[String](syms.length - 1)
        var j = 0; var k = 0
        while (j < syms.length) {
          if (j == bestAt) { out(k) = syms(j) + syms(j + 1); j += 2 }
          else { out(k) = syms(j); j += 1 }
          k += 1
        }
        syms = out
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** The shared word splitter: whitespace pre-tokenization (BPE merges
    * never cross word boundaries — standard Sennrich/GPT behavior). */
  def words(text: String): Array[String] =
    if (text == null) Array.empty else text.split("\\s+").filter(_.nonEmpty)
}

/** bpe.train — learn a BPE merge table from a text column. Output frame:
  * (rank BIGINT, left STRING, right STRING), ready for any sink and for
  * tokenize.bpe's merges input. */
object BpeTrainOp extends Stage {
  val name = "bpe.train"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    import ctx.spark.implicits._
    val col = ctx.cfg.strOr("column", "text")
    val numMerges = ctx.cfg.longOr("num_merges", 100L).toInt
    val topWords = ctx.cfg.longOr("top_words", 50000L).toInt
    val sampleFraction = ctx.cfg.doubleOpt("sample_fraction")
    val lowercase = ctx.cfg.boolOr("lowercase", false)

    var df = ctx.primary
    sampleFraction.foreach(f => df = df.sample(f, ctx.cfg.longOr("seed", 42L)))
    var textCol = df(col)
    if (lowercase) textCol = F.lower(textCol)

    // distributed part: word frequencies (one shuffle, partial aggs),
    // capped at the top_words most frequent word types
    val freq = df
      .select(F.explode(F.split(F.trim(textCol), "\\s+")).alias("__w"))
      .filter(F.length(F.col("__w")) > 0)
      .groupBy("__w").agg(F.count(F.lit(1)).alias("__f"))
      .orderBy(F.col("__f").desc, F.col("__w"))
      .limit(topWords)
      .as[(String, Long)]
      .collect() // bounded by top_words — the documented driver cap

    val merges = Bpe.learnMerges(freq.toSeq, numMerges)
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
  }
}

/** tokenize.bpe — apply a BPE merge table to a text column. Merges come
  * from a second input frame (rank/left/right — bpe.train's output or
  * table.read over a saved table) or inline config `merges = ["a b", ...]`
  * (rank = list order). Adds `n_tokens` and optionally the token array. */
object BpeTokenizeOp extends Stage {
  val name = "tokenize.bpe"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    import ctx.spark.implicits._
    val col = ctx.cfg.strOr("column", "text")
    val countCol = ctx.cfg.strOr("count_column", "n_tokens")
    val tokensCol = ctx.cfg.strOpt("tokens_column")
    val lowercase = ctx.cfg.boolOr("lowercase", false)

    val mergeList: Seq[(String, String)] = ctx.cfg.strListOr("merges", Vector.empty) match {
      case list if list.nonEmpty =>
        list.map { m =>
          m.split(" ", 2) match {
            case Array(l, r) => (l, r)
            case _ => throw new GraftConfigError(s"tokenize.bpe: merge '$m' must be 'left right'")
          }
        }
      case _ if ctx.inputs.size >= 2 =>
        // merge tables are vocab-sized; cap the driver collect loudly
        // (the json.write driver_limit pattern)
        val cap = ctx.cfg.longOr("max_merges", 100000L).toInt
        val rows = ctx.input(1).select("rank", "left", "right")
          .as[(Long, String, String)].limit(cap + 1).collect()
        if (rows.length > cap)
          throw new GraftConfigError(
            s"tokenize.bpe: merges input exceeds max_merges=$cap rows; " +
            "raise max_merges only if the table really is a merge list")
        rows.sortBy(_._1).map(t => (t._2, t._3)).toSeq
      case _ => throw new GraftConfigError(
        "tokenize.bpe needs merges = [\"l r\", ...] or a second input frame (bpe.train output)")
    }
    val rank: Map[(String, String), Int] = mergeList.zipWithIndex.toMap

    val df = ctx.primary
    val tokenize = (s: String) => {
      val src = if (lowercase && s != null) s.toLowerCase(java.util.Locale.ROOT) else s
      Bpe.words(src).flatMap(w => Bpe.encodeWord(w, rank))
    }
    tokensCol match {
      case Some(tc) =>
        val fn = F.udf(tokenize)
        val withT = df.withColumn(tc, fn(df(col)))
        withT.withColumn(countCol, F.size(F.col(tc)).cast("long"))
      case None => // count-only path: no array materialization in the row
        val fn = F.udf((s: String) => tokenize(s).length.toLong)
        df.withColumn(countCol, fn(df(col)))
    }
  }
}
