package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** decontaminate.ngram — exact n-gram collision decontamination, the
  * GPT-3 (Brown 2020, Appendix C: 13-gram overlap) / PaLM (Chowdhery
  * 2022 §6: ≥70% of 8-grams seen) benchmark-leakage filter. Distinct
  * from `join.similar` (near-duplicate matching): a single verbatim
  * n-gram hit against the benchmark set is evidence of leakage even
  * when the documents as a whole are dissimilar.
  *
  * Inputs: training corpus (primary), benchmark corpus (second input).
  * Config: `column` = "text" (and `benchmark_column` when the sides
  * differ), `id_column` = "doc_id", `n` = 13, `mode` = annotate |
  * filter | semi, and the contamination rule — `min_matches` = 1
  * (GPT-3: any collision) or `max_overlap` ∈ (0,1] (PaLM-style: the
  * fraction of the document's distinct n-grams found in the benchmark).
  * annotate appends `n_ngrams` / `n_matched_ngrams` / `contaminated`;
  * filter keeps clean rows; semi keeps contaminated rows (audit).
  *
  * Scale shape (the dedup.lines pattern): benchmark n-grams distinct-
  * collapse to one narrow column of 64-bit hashes — at real scale the
  * benchmark side is tiny next to the corpus and AQE broadcasts it; the
  * training side explodes to (id, hash) pairs (~16 B/row), one left-semi
  * join + one per-doc count, and only the per-doc stats (never the
  * grams) join back to the full rows. No cross join, no driver
  * collection; n-grams are single-pass per document (Shingles UDF).
  *
  * `bloom = true`: broadcast-Bloom prefilter for the regime where the
  * benchmark gram set outgrows the exact-broadcast threshold (a full eval
  * suite is ~10⁸ grams ≈ 800 MB of raw longs, but ~120 MB as a 1%-FPP
  * Bloom filter). The filter is built once over the distinct benchmark
  * grams, broadcast, and applied to the exploded training grams BEFORE
  * the semi-join — Bloom has no false negatives, and the exact join still
  * runs on the survivors, so results are BIT-IDENTICAL to bloom = false
  * (the correctness gate pins both against one oracle); only the shuffle
  * shrinks, from the full corpus gram stream to the ~FPP-sized candidate
  * slice. `bloom_fpp` = 0.01. Builds eagerly at plan-compose time
  * (two jobs over the small side; skipped under CLI explain).
  */
object DecontaminateOp extends Stage {
  val name = "decontaminate.ngram"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val train = ctx.input(0)
    val bench = ctx.input(1)
    val col = cfg.strOr("column", "text")
    val benchCol = cfg.strOr("benchmark_column", col)
    val id = cfg.strOr("id_column", "doc_id")
    val n = cfg.longOr("n", 13L).toInt
    if (n < 1) throw new GraftConfigError(s"decontaminate.ngram: n must be >= 1, got $n")
    val minMatches = cfg.longOr("min_matches", 1L)
    val maxOverlap = cfg.doubleOpt("max_overlap")
    val mode = cfg.strOr("mode", "annotate") match {
      case ok @ ("annotate" | "filter" | "semi") => ok
      case other => throw new GraftConfigError(
        s"decontaminate.ngram mode must be annotate|filter|semi, got '$other'")
    }

    // shingleHashes emits DISTINCT n-gram hashes per document (and the
    // whole-document gram for docs shorter than n tokens — those can
    // still leak a benchmark verbatim)
    val useBloom = cfg.boolOr("bloom", false) && !cfg.boolOr("_explain_only", false)
    val bloomFpp = cfg.doubleOr("bloom_fpp", 0.01)
    if (bloomFpp <= 0.0 || bloomFpp >= 1.0) throw new GraftConfigError(
      s"decontaminate.ngram: bloom_fpp must be in (0, 1), got $bloomFpp")

    val benchGrams0 = bench
      .select(F.explode(Shingles.shingleHashes(F.col(benchCol), n)).as("__gram"))
      .distinct()
    // bloom mode scans the benchmark grams three times (count, filter
    // build, exact join) — pin the small side for the duration of the run
    val benchGrams = if (useBloom) ctx.pin(benchGrams0) else benchGrams0
    val trainGrams0 = train.select(
      F.col(id).as("__id"),
      F.size(Shingles.shingleHashes(F.col(col), n)).as("n_ngrams"),
      F.explode(Shingles.shingleHashes(F.col(col), n)).as("__gram"))
    val trainGrams =
      if (!useBloom) trainGrams0
      else {
        val items = benchGrams.count()
        if (items == 0) trainGrams0
        else {
          val bf = benchGrams.stat.bloomFilter("__gram", items, bloomFpp)
          val bc = ctx.spark.sparkContext.broadcast(bf)
          val mightContain = F.udf((g: Long) => bc.value.mightContainLong(g))
          trainGrams0.filter(mightContain(F.col("__gram")))
        }
      }
    val perDoc = trainGrams
      .join(benchGrams, Seq("__gram"), "left_semi")
      .groupBy("__id", "n_ngrams")
      .agg(F.count(F.lit(1)).as("n_matched_ngrams"))

    val contaminated = maxOverlap match {
      case Some(frac) =>
        F.col("n_matched_ngrams").cast("double") / F.col("n_ngrams") >= frac
      case None => F.col("n_matched_ngrams") >= minMatches
    }
    val stats = train
      .join(perDoc, train(id) === perDoc("__id"), "left")
      .drop("__id")
      .withColumn("n_ngrams",
        F.coalesce(F.col("n_ngrams"), F.size(Shingles.shingleHashes(F.col(col), n))))
      .withColumn("n_matched_ngrams", F.coalesce(F.col("n_matched_ngrams"), F.lit(0L)))
      .withColumn("contaminated", contaminated)

    mode match {
      case "annotate" => stats
      case "filter" =>
        stats.filter(!F.col("contaminated"))
          .drop("n_ngrams", "n_matched_ngrams", "contaminated")
      case "semi" =>
        stats.filter(F.col("contaminated"))
          .drop("n_ngrams", "n_matched_ngrams", "contaminated")
    }
  }
}

/** decontaminate.embedding — SEMANTIC benchmark decontamination: drop (or
  * flag) training documents whose embedding sits within `threshold` cosine
  * of ANY benchmark document. The n-gram filter above catches verbatim
  * leakage; this catches the rephrased kind — translated, re-worded, or
  * templated benchmark items that share no 13-gram with the original but
  * embed next to it (the contamination mode n-gram overlap provably
  * misses, which is why modern release audits run both).
  *
  * Same I/O contract as decontaminate.ngram: training corpus (primary),
  * benchmark corpus (second input) — or `index_path` pointing at a
  * prebuilt `index.build type=lsh` corpus of benchmark embeddings, so a
  * fixed eval suite is embedded and indexed ONCE and every training batch
  * probes it. `mode` = annotate | filter | semi; annotate appends
  * `n_benchmark_matches` (benchmark docs at ≥ threshold),
  * `max_benchmark_cosine` (null when clean) and `contaminated`.
  *
  * Candidate generation IS `join.similar method=embedding` — one shared
  * implementation, so every blocking layout (`pigeonhole` hyperplane
  * blocks, `bands` banded LSH, `ivf` cluster blocking) and its scale
  * shape applies verbatim: the two corpora are never cross-joined, the
  * benchmark side exact-collapses to distinct representatives, and only
  * (id, signature) pairs travel the candidate shuffle. annotate adds one
  * narrow groupBy over the surviving pairs (bounded by matches, not by
  * corpus size) and a left join back to the full rows.
  */
object DecontaminateEmbeddingOp extends Stage {
  val name = "decontaminate.embedding"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val train = ctx.input(0)
    val id = cfg.strOr("id_column", "doc_id")
    val mode = cfg.strOr("mode", "annotate") match {
      case ok @ ("annotate" | "filter" | "semi") => ok
      case other => throw new GraftConfigError(
        s"decontaminate.embedding mode must be annotate|filter|semi, got '$other'")
    }
    // delegate candidate generation to join.similar: same cfg minus OUR
    // mode key (join.similar's mode is the delegation detail below), the
    // id default rebased to doc_id (this family's convention)
    def delegate(joinMode: String): DataFrame =
      SimilarJoinOp(ctx.copy(cfg = Cfg(cfg.table - "mode" ++ Map(
        "method" -> CStr("embedding"), "mode" -> CStr(joinMode),
        "id_column" -> CStr(id)))))
    mode match {
      // filter keeps CLEAN rows = anti-join; semi keeps contaminated
      case "filter" => delegate("anti")
      case "semi"   => delegate("semi")
      case "annotate" =>
        val per = delegate("pairs")
          .groupBy("left_id")
          .agg(F.count(F.lit(1)).as("n_benchmark_matches"),
            F.max(F.col("cosine")).as("max_benchmark_cosine"))
        train.join(per, train(id) === per("left_id"), "left")
          .drop("left_id")
          .withColumn("n_benchmark_matches",
            F.coalesce(F.col("n_benchmark_matches"), F.lit(0L)))
          .withColumn("contaminated", F.col("n_benchmark_matches") > 0)
    }
  }
}
