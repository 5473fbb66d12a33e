package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.config._
import graft.core._

/** sample.importance — DSIR data selection (Xie 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every raw
  * document by how much more likely its hashed-n-gram features are
  * under a TARGET corpus than under the raw corpus, then keep the
  * highest-importance examples. The published recipe for "give me the
  * Wikipedia-like / textbook-like slice of this crawl".
  *
  * Inputs: raw corpus (primary), target corpus (second input, required).
  * Config: `column` = "text", `id_column` = "doc_id", `max_ngram` = 2
  * (bag of word 1..n-grams, the paper's unigram+bigram features),
  * `hex_digits` = 4 (features hash into 16^d buckets via an md5 prefix
  * — md5 so the ORACLE can restate the exact bucketing; the paper uses
  * 10k buckets, 65536 here), `smoothing` = 0.5 (add-alpha on both
  * distributions), `mode` = annotate | topk | gumbel, `k` (docs kept by
  * topk/gumbel), `seed` (gumbel).
  *
  * annotate appends `n_features` and `log_importance` =
  * Σ_features [log p_target(b) − log p_raw(b)]; topk keeps the k
  * highest-importance rows deterministically (importance desc, id asc);
  * gumbel is the paper's sampling-without-replacement: top-k of
  * log_importance + Gumbel(0,1) noise, seeded per-id (xxhash64), so a
  * rerun reproduces the same sample but the oracle can't (engine hash)
  * — gumbel is spec-pinned, annotate/topk oracle-gated.
  *
  * Numerics: the per-bucket log-ratio is quantized to 1e-4 nats on a
  * BIGINT (the quality.perplexity discipline), so the per-doc sum is an
  * exact integer — order-independent under Spark's unordered aggregation
  * and bit-identical in the oracle; /1e4 at the end is one correctly-
  * rounded IEEE division on both engines.
  *
  * Scale shape: two feature-count aggregations (one per corpus), a
  * bucket-weight table bounded by 16^d rows (broadcastable), the raw
  * side explodes to narrow (id, 4-char bucket) pairs for one join +
  * per-doc sum, and only per-doc stats join back to full rows. No
  * driver collection anywhere; topk is TakeOrderedAndProject.
  */
object ImportanceSampleOp extends Stage {
  val name = "sample.importance"
  val kind = StageKind.Transform

  private val Q = 10000.0

  /** Bag (with multiplicity) of word 1..maxN-gram bucket keys; a doc
    * contributes n-grams only at sizes it has enough tokens for.
    *
    * Single-pass UDF (the langId/RepetitionOp lesson): the expression
    * form (flatten∘transform∘sequence + per-gram concat_ws/md5 casts)
    * runs interpreted and re-tokenizes per n — measured ~4× slower at
    * sf0.1. One tokenize, one rolling StringBuilder per n, one digest
    * per gram; identical bytes → identical buckets (oracle-pinned). */
  def featureBuckets(text: Column, maxN: Int, hexDigits: Int): Column = {
    val hex = "0123456789abcdef".toCharArray
    val udf = F.udf { t: String =>
      if (t == null) null
      else {
        val toks = t.toLowerCase.trim.split("\\s+")
        val md = java.security.MessageDigest.getInstance("MD5")
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length * maxN)
        val sb = new java.lang.StringBuilder
        var n = 1
        while (n <= maxN) {
          if (toks.length >= n) {
            var i = 0
            while (i <= toks.length - n) {
              sb.setLength(0)
              var j = 0
              while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
              md.reset()
              val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              val chars = new Array[Char](hexDigits)
              var k = 0
              while (k < hexDigits) {
                val b = digest(k / 2) & 0xff
                chars(k) = hex(if (k % 2 == 0) b >>> 4 else b & 0xf)
                k += 1
              }
              out += new String(chars)
              i += 1
            }
          }
          n += 1
        }
        out.toArray
      }
    }
    udf(text)
  }

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val raw = ctx.input(0)
    val target = ctx.input(1)
    val col = cfg.strOr("column", "text")
    val id = cfg.strOr("id_column", "doc_id")
    if (!raw.columns.contains(id))
      throw new GraftPlanError(
        s"sample.importance: id_column '$id' not found; available: ${raw.columns.mkString(", ")}")
    val maxN = cfg.longOr("max_ngram", 2L).toInt
    if (maxN < 1) throw new GraftConfigError(s"sample.importance: max_ngram must be >= 1, got $maxN")
    val hexDigits = cfg.longOr("hex_digits", 4L).toInt
    if (hexDigits < 1 || hexDigits > 8)
      throw new GraftConfigError(s"sample.importance: hex_digits must be in 1..8, got $hexDigits")
    val alpha = cfg.doubleOr("smoothing", 0.5)
    if (alpha <= 0.0)
      throw new GraftConfigError(s"sample.importance: smoothing must be > 0, got $alpha")
    val mode = cfg.strOr("mode", "annotate") match {
      case ok @ ("annotate" | "topk" | "gumbel") => ok
      case other => throw new GraftConfigError(
        s"sample.importance mode must be annotate|topk|gumbel, got '$other'")
    }
    val buckets = math.pow(16.0, hexDigits)

    // persisted: feeds BOTH the count aggregation and the per-doc scoring
    // join — without it the tokenize+digest explode runs twice. Narrow
    // rows (id + d hex chars), MEMORY_AND_DISK spills safely at scale.
    val rawFeat = ctx.pin(raw.select(F.col(id).as("__id"),
      F.explode(featureBuckets(F.col(col), maxN, hexDigits)).as("__b")))
    val tgtFeat = target.select(
      F.explode(featureBuckets(F.col(col), maxN, hexDigits)).as("__b"))

    val rawCounts = rawFeat.groupBy("__b").agg(F.count(F.lit(1)).cast("double").as("__cr"))
    val tgtCounts = tgtFeat.groupBy("__b").agg(F.count(F.lit(1)).cast("double").as("__ct"))
    // bucket weight table: every bucket seen on either side, <= 16^d rows
    val weights = rawCounts.join(tgtCounts, Seq("__b"), "full_outer")
      .select(F.col("__b"),
        F.coalesce(F.col("__cr"), F.lit(0.0)).as("__cr"),
        F.coalesce(F.col("__ct"), F.lit(0.0)).as("__ct"))
    val totals = weights.agg(
      F.sum("__cr").as("__nr"), F.sum("__ct").as("__nt"))
    val logRatioQ = F.round((
      F.log((F.col("__ct") + F.lit(alpha)) / (F.col("__nt") + F.lit(alpha * buckets))) -
      F.log((F.col("__cr") + F.lit(alpha)) / (F.col("__nr") + F.lit(alpha * buckets)))
    ) * Q, 0).cast("long")
    val weightTable = weights.crossJoin(F.broadcast(totals))
      .select(F.col("__b"), logRatioQ.as("__lrq"))

    val perDoc = rawFeat.join(weightTable, Seq("__b"))
      .groupBy("__id")
      .agg(F.count(F.lit(1)).as("n_features"), F.sum("__lrq").as("__slrq"))

    val annotated = raw.join(perDoc, raw(id) === perDoc("__id"), "left")
      .drop("__id")
      .withColumn("n_features", F.coalesce(F.col("n_features"), F.lit(0L)))
      .withColumn("log_importance",
        F.coalesce(F.col("__slrq").cast("double") / Q, F.lit(0.0)))
      .drop("__slrq")

    mode match {
      case "annotate" => annotated
      case "topk" =>
        val k = cfg.longOr("k", 100L).toInt
        annotated.orderBy(F.col("log_importance").desc, F.col(id).asc).limit(k)
          .drop("n_features", "log_importance")
      case "gumbel" =>
        val k = cfg.longOr("k", 100L).toInt
        val seed = cfg.longOr("seed", 11L)
        // u in (0,1) from a seeded per-id hash — deterministic across
        // reruns, retries, and partition layouts, unlike rand()
        val u = (F.pmod(F.xxhash64(F.lit(seed), F.col(id)), F.lit(1L << 52))
          .cast("double") + 0.5) / (1L << 52).toDouble
        val gumbel = -F.log(-F.log(u))
        annotated
          .withColumn("__key", F.col("log_importance") + gumbel)
          .orderBy(F.col("__key").desc, F.col(id).asc).limit(k)
          .drop("__key", "n_features", "log_importance")
    }
  }
}
