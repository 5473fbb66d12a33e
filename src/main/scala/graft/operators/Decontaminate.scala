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
    val benchGrams = bench
      .select(F.explode(Shingles.shingleHashes(F.col(benchCol), n)).as("__gram"))
      .distinct()
    val trainGrams = train.select(
      F.col(id).as("__id"),
      F.size(Shingles.shingleHashes(F.col(col), n)).as("n_ngrams"),
      F.explode(Shingles.shingleHashes(F.col(col), n)).as("__gram"))
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
