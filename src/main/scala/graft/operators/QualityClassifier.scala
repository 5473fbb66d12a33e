package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** quality.train / quality.score — the trainable document-quality
  * classifier every published LLM data pipeline runs (GPT-3's
  * WebText-vs-CommonCrawl LR filter, CCNet's fastText language/quality
  * models, LLaMA's wiki-reference classifier): label a positive corpus
  * (wiki/books) 1 and raw crawl 0, train a linear model over word
  * features, score and threshold the crawl.
  *
  * quality.train — logistic regression over WORD-COUNT features:
  * CountVectorizer (vocab capped at `vocab_size`, the documented driver
  * cap — same pattern as bpe.train's top_words) + MLlib LogisticRegression
  * (`max_iter`, `reg_param`, `elastic_net`). The model is emitted AS A
  * FRAME of (term STRING, weight DOUBLE) rows plus one `__intercept__`
  * row — sinkable to parquet, auditable with plain SQL (the top
  * positive/negative terms ARE the model), and consumable by
  * quality.score as a second input. Word-keyed weights are the point:
  * hashed features (fastText buckets) would be opaque and untestable.
  *
  * quality.score — scores `sigmoid(intercept + Σ count(w)·weight(w))`
  * via ONE explode + broadcastable vocab join + per-doc sum, the same
  * scale shape as quality.perplexity: the corpus never collects, the
  * model is vocab-sized. The dot product accumulates in 1e-6-QUANTIZED
  * integer space, so scores are bit-stable under any partitioning/retry
  * order (float sums are not associative; quantized longs are) — also
  * what lets a SQL oracle restate the exact score. `mode = "filter"`
  * keeps rows with score >= `threshold`; default annotates
  * `score_column` (= "quality_score").
  */
object QualityClassifierTrainOp extends Stage {
  val name = "quality.train"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    import ctx.spark.implicits._
    val cfg = ctx.cfg
    val df = ctx.primary
    val col = cfg.strOr("column", "text")
    val labelCol = cfg.strOr("label_column", "label")
    val vocabSize = cfg.longOr("vocab_size", 50000L).toInt
    val maxIter = cfg.longOr("max_iter", 50L).toInt
    // regularized by default: on (near-)separable data unregularized LR
    // weights diverge to ±Infinity (no finite maximum-likelihood optimum)
    val regParam = cfg.doubleOr("reg_param", 1e-3)
    val elasticNet = cfg.doubleOr("elastic_net", 0.0)
    val lowercase = cfg.boolOr("lowercase", false)
    Seq(col, labelCol).foreach(c => if (!df.columns.contains(c))
      throw new GraftPlanError(s"quality.train: column '$c' not found"))

    var textCol = df(col)
    if (lowercase) textCol = F.lower(textCol)
    val prepared = df.select(
      F.col(labelCol).cast("double").alias("__label"),
      F.coalesce(F.split(F.trim(textCol), "\\s+"), F.array()).alias("__words"))
      .withColumn("__words", F.filter(F.col("__words"), w => F.length(w) > 0))
    val bad = prepared.filter(F.col("__label").isNull ||
      (F.col("__label") =!= 0.0 && F.col("__label") =!= 1.0)).limit(1).count()
    if (bad > 0) throw new GraftConfigError(
      s"quality.train: label_column '$labelCol' must be 0/1 with no nulls")
    val classes = prepared.select("__label").distinct().limit(3).count()
    if (classes < 2) throw new GraftPlanError(
      "quality.train: training input needs BOTH label classes (0 and 1) — " +
      s"got ${if (classes == 0) "an empty frame" else "a single class"}")

    val cv = new org.apache.spark.ml.feature.CountVectorizer()
      .setInputCol("__words").setOutputCol("__features")
      .setVocabSize(vocabSize)
      .fit(prepared)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam).setElasticNetParam(elasticNet)
    val model = lr.fit(cv.transform(prepared))

    // vocab-sized driver data by construction (the documented cap).
    // sigmoid saturates past |z| ≈ 36: clamp any runaway weight there and
    // zero NaNs, so the emitted model always scores to finite values
    def safe(w: Double): Double =
      if (w.isNaN) 0.0 else math.max(-36.0, math.min(36.0, w))
    val weights = model.coefficients.toArray.map(safe)
    (cv.vocabulary.zip(weights).toSeq :+ ("__intercept__", safe(model.intercept)))
      .toDF("term", "weight")
  }
}

object QualityClassifierScoreOp extends Stage {
  val name = "quality.score"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    if (ctx.inputs.size < 2)
      throw new GraftPlanError("quality.score requires two inputs: (documents, model frame " +
        "of term/weight rows — quality.train's output or any table with those columns)")
    val model = ctx.input(1)
    Seq("term", "weight").foreach(c => if (!model.columns.contains(c))
      throw new GraftPlanError(s"quality.score: model input needs column '$c'"))
    val col = cfg.strOr("column", "text")
    val idCol = cfg.strOr("id_column", "doc_id")
    val out = cfg.strOr("score_column", "quality_score")
    val lowercase = cfg.boolOr("lowercase", false)
    val mode = cfg.strOr("mode", "annotate")
    val threshold = cfg.doubleOr("threshold", 0.5)
    Seq(col, idCol).foreach(c => if (!df.columns.contains(c))
      throw new GraftPlanError(s"quality.score: column '$c' not found"))

    var textCol = F.col(col)
    if (lowercase) textCol = F.lower(textCol)
    // one pseudo-token per doc carries the intercept through the SAME
    // join+sum as the real words — no-vocab and null-text docs still score
    val occurrences = df.select(F.col(idCol).alias("__id"),
      F.explode(F.concat(
        F.array(F.lit("__intercept__")),
        F.filter(F.coalesce(F.split(F.trim(textCol), "\\s+"), F.array()),
          w => F.length(w) > 0))).alias("term"))

    // 1e-6-quantized integer dot product: order-independent, oracle-exact.
    // The model frame may come from ANY table: zero NaNs and clamp to
    // ±1e9 so the quantizing cast can never overflow (ANSI mode throws on
    // ±Infinity → BIGINT)
    val q = model.select(F.col("term"),
      F.round(F.greatest(F.least(F.nanvl(F.col("weight"), F.lit(0.0)),
        F.lit(1e9)), F.lit(-1e9)) * 1e6).cast("long").alias("__wq"))
    val scores = occurrences
      .join(F.broadcast(q), Seq("term"), "left")
      .groupBy("__id")
      .agg(F.sum(F.coalesce(F.col("__wq"), F.lit(0L))).alias("__zq"))
      .select(F.col("__id").alias(idCol),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("__zq") / 1e6))), 6).alias(out))

    val annotated = df.join(scores, Seq(idCol), "left")
    mode match {
      case "annotate" => annotated
      case "filter"   => annotated.filter(F.col(out) >= threshold).drop(out)
      case other => throw new GraftConfigError(
        s"quality.score mode must be annotate|filter, got '$other'")
    }
  }
}
