package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.config._
import graft.core._

/** dedup.substrings — EXACT substring-level deduplication: when a run of
  * `min_tokens` (default 50) whitespace tokens repeats verbatim anywhere in
  * the corpus, every occurrence except the canonical first keeps nothing
  * of it (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better" — their ExactSubstr rule, which removes repeated spans
  * INSIDE documents that whole-doc and near-dup dedup both miss: license
  * boilerplate, templated headers, quoted reposts).
  *
  * Semantics:
  *  - every overlapping `min_tokens`-token window of every document is a
  *    span occurrence; occurrences are duplicated when the SAME token
  *    sequence appears elsewhere (another doc OR another position of the
  *    same doc);
  *  - the canonical occurrence — minimum (doc, start) — survives; all
  *    other duplicated windows mark their token range for removal;
  *  - overlapping/adjacent marked ranges merge per doc (so a 200-token
  *    verbatim repeat becomes ONE merged span, approximating the full
  *    repeated region), and `mode = "remove"` (default) rebuilds the text
  *    without the merged spans. `mode = "annotate"` instead appends
  *    `n_dup_spans` (raw duplicated windows) and `dup_token_frac`
  *    (merged removed tokens / total tokens).
  *
  * Scale shape (vs the paper's offline suffix array): windows are hashed
  * per row in one fused-UDF pass — the corpus-wide work is ONE shuffle of
  * narrow (hash, doc, start) rows, a per-hash min/count aggregate
  * (map-side partial combine), and a join back of only the duplicated
  * hashes; span merging and text rebuild are per-doc, state bounded by
  * document length. `stride` (default 1 = every position, exact) trades
  * recall for window volume via CONTENT-DEFINED anchors: only windows
  * starting at a token whose hash ≡ 0 (mod stride) are sampled — both
  * occurrences of a repeat pick the same relative anchors regardless of
  * where the repeat sits in each document (fixed-phase sampling would
  * never collide across misaligned occurrences), cutting shuffled rows
  * ~stride× and missing a repeat with k anchorable positions beyond the
  * window with probability ≈ (1 - 1/stride)^k.
  *
  * Reference scope note: the reference engine has no substring dedup;
  * this is a training-data extension (SURVEY §2.8 family), same contract
  * style as dedup.lines (reference has no analog either).
  */
object SubstringDedupOp extends Stage {
  val name = "dedup.substrings"
  val kind = StageKind.Transform

  /** 64-bit FNV-1a over the window's tokens (NUL-separated — token
    * boundaries must hash, "ab c" ≠ "a bc"). */
  private def fnv1a(toks: Seq[String], from: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < from + n) {
      val t = toks(i)
      var j = 0
      while (j < t.length) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
      h ^= 0; h *= 0x100000001b3L // separator
      i += 1
    }
    h
  }

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val col = cfg.strOr("column", "text")
    val idCol = cfg.strOr("id_column", "doc_id")
    val n = cfg.longOr("min_tokens", 50L).toInt
    val stride = cfg.longOr("stride", 1L).toInt
    val mode = cfg.strOr("mode", "remove") match {
      case ok @ ("remove" | "annotate") => ok
      case other => throw new GraftConfigError(
        s"dedup.substrings mode must be remove|annotate, got '$other'")
    }
    if (n < 2) throw new GraftConfigError("dedup.substrings: min_tokens must be >= 2")
    if (stride < 1 || stride > n) throw new GraftConfigError(
      s"dedup.substrings: stride must be in [1, min_tokens], got $stride")
    Seq(col, idCol).foreach(c => if (!df.columns.contains(c))
      throw new GraftPlanError(s"dedup.substrings: column '$c' not found"))

    // the input is referenced twice (window extraction + final join-back):
    // persist so a composed upstream chain runs once, not per branch —
    // the same documented trade as ExactCollapse (Dedup.scala); at scale
    // the persist is corpus-sized but the upstream may be a whole
    // cleaning pipeline, which would be far costlier to run twice
    // inside a DagCompiler run the cache is released in the run's finally —
    // success OR failure (a success-only deferral leaked it on failed
    // runs); direct invocation keeps it pinned (the caller's result is
    // still lazy) — bench/gates clear caches between queries
    val src = ctx.pin(df)

    // one fused pass per row: (start, window hash) pairs; stride > 1
    // samples content-defined anchor positions (see scaladoc)
    val winUdf = F.udf { (text: String) =>
      if (text == null) Seq.empty[(Int, Long)]
      else {
        val toks = Bpe.words(text)
        if (toks.length < n) Seq.empty[(Int, Long)]
        else (0 to toks.length - n).iterator
          .filter(s => stride == 1 ||
            java.lang.Long.remainderUnsigned(fnv1a(toks, s, 1), stride) == 0)
          .map(s => (s, fnv1a(toks, s, n))).toSeq
      }
    }
    val wins = src
      .select(F.col(idCol).alias("__id"), F.explode(winUdf(F.col(col))).alias("__w"))
      .select(F.col("__id"), F.col("__w._1").alias("__start"), F.col("__w._2").alias("__h"))

    // duplicated hashes: total count + canonical (min (doc, start)) in one agg
    val groups = wins.groupBy("__h").agg(
      F.count(F.lit(1)).alias("__cnt"),
      F.min(F.struct(F.col("__id").alias("i"), F.col("__start").alias("s"))).alias("__can"))
      .filter(F.col("__cnt") > 1)

    // non-canonical occurrences of duplicated windows → (doc, start) marks
    val marks = wins.join(groups, Seq("__h"))
      .filter(!(F.col("__id") === F.col("__can.i") && F.col("__start") === F.col("__can.s")))
      .select(F.col("__id"), F.col("__start"))

    // per-doc merged spans; state bounded by tokens-per-doc
    val spans = marks.groupBy("__id").agg(
      F.sort_array(F.collect_list(F.col("__start"))).alias("__starts"),
      F.count(F.lit(1)).alias("__n_dup"))

    val joined = src.join(
      spans.withColumnRenamed("__id", idCol), Seq(idCol), "left")

    mode match {
      case "annotate" =>
        val fracUdf = F.udf { (text: String, starts: Seq[Int]) =>
          if (text == null || starts == null || starts.isEmpty) 0.0
          else {
            val total = Bpe.words(text).length
            if (total == 0) 0.0
            else math.round(mergedSpanTokens(starts, n).toDouble / total * 1e6) / 1e6
          }
        }
        joined
          .withColumn("n_dup_spans", F.coalesce(F.col("__n_dup"), F.lit(0L)))
          .withColumn("dup_token_frac", fracUdf(F.col(col), F.col("__starts")))
          .drop("__starts", "__n_dup")
      case "remove" =>
        val cutUdf = F.udf { (text: String, starts: Seq[Int]) =>
          if (text == null || starts == null || starts.isEmpty) text
          else {
            val toks = Bpe.words(text)
            val drop = new Array[Boolean](toks.length)
            starts.foreach { s =>
              var i = s; val end = math.min(s + n, toks.length)
              while (i < end) { drop(i) = true; i += 1 }
            }
            toks.indices.iterator.filterNot(drop).map(toks).mkString(" ")
          }
        }
        joined
          .withColumn(col, cutUdf(F.col(col), F.col("__starts")))
          .drop("__starts", "__n_dup")
    }
  }

  /** Total tokens covered by the union of [s, s+n) intervals
    * (starts sorted ascending). */
  private[operators] def mergedSpanTokens(starts: Seq[Int], n: Int): Long = {
    var total = 0L
    var curStart = -1
    var curEnd = -1
    starts.foreach { s =>
      if (s >= curEnd) { // new island
        if (curEnd > curStart) total += curEnd - curStart
        curStart = s; curEnd = s + n
      } else curEnd = math.max(curEnd, s + n)
    }
    if (curEnd > curStart) total += curEnd - curStart
    total
  }
}
