package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.{GraftPlanError, StageContext}
import graft.operators.{QualityClassifierScoreOp, QualityClassifierTrainOp}

/** quality.train / quality.score: separation on a separable corpus, exact
  * closed-form scoring with hand weights, filter mode, error surface. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val good = (1L to 30L).map(i =>
      (i, s"informative structured prose reference citation archive volume $i", 1))
    val bad = (31L to 60L).map(i =>
      (i, s"click casino bonus winner spam free pills offer $i", 0))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("train separates a separable corpus; scoring ranks held-out docs") {
    val model = QualityClassifierTrainOp(StageContext.one(spark, corpus,
      Cfg.of("label_column" -> "label", "max_iter" -> 50)))
    assert(model.columns.toSeq === Seq("term", "weight"))
    assert(model.filter($"term" === "__intercept__").count() === 1)
    // wiki-ish words weigh positive, spam words negative
    val w = model.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("informative") > 0 && w("citation") > 0)
    assert(w("casino") < 0 && w("spam") < 0)

    val held = Seq(
      (100L, "reference archive citation prose"),
      (101L, "casino spam pills bonus")).toDF("doc_id", "text")
    val scored = QualityClassifierScoreOp(StageContext(spark,
      Seq("docs" -> held, "model" -> model), Cfg.of()))
      .orderBy("doc_id").select("quality_score").as[Double].collect()
    assert(scored(0) > 0.9, s"good doc scored ${scored(0)}")
    assert(scored(1) < 0.1, s"spam doc scored ${scored(1)}")
  }

  test("scoring is the exact quantized sigmoid; intercept-only docs score") {
    val model = Seq(("hello", 2.0), ("world", -1.0), ("__intercept__", 0.5))
      .toDF("term", "weight")
    val docs = Seq(
      (1L, "hello hello world"),  // z = 0.5 + 2*2 - 1 = 3.5
      (2L, "unknown tokens only"),// z = 0.5
      (3L, null)                  // z = 0.5 (null text still scores)
    ).toDF("doc_id", "text")
    val got = QualityClassifierScoreOp(StageContext(spark,
      Seq("d" -> docs, "m" -> model), Cfg.of()))
      .orderBy("doc_id").select("quality_score").as[Double].collect()
    def sig(z: Double) = math.round(1.0 / (1.0 + math.exp(-z)) * 1e6) / 1e6
    assert(got(0) === sig(3.5))
    assert(got(1) === sig(0.5))
    assert(got(2) === sig(0.5))
  }

  test("filter mode thresholds; errors are loud") {
    val model = Seq(("keep", 5.0), ("__intercept__", -2.0)).toDF("term", "weight")
    val docs = Seq((1L, "keep this"), (2L, "drop this")).toDF("doc_id", "text")
    val kept = QualityClassifierScoreOp(StageContext(spark,
      Seq("d" -> docs, "m" -> model),
      Cfg.of("mode" -> "filter", "threshold" -> 0.5)))
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    assert(!kept.columns.contains("quality_score"))

    intercept[GraftPlanError](QualityClassifierScoreOp(
      StageContext.one(spark, docs, Cfg.of())))
    intercept[GraftPlanError](QualityClassifierScoreOp(StageContext(spark,
      Seq("d" -> docs, "m" -> docs), Cfg.of())))
    intercept[GraftConfigError](QualityClassifierTrainOp(StageContext.one(spark,
      Seq((1L, "x", 2)).toDF("doc_id", "text", "label"),
      Cfg.of("label_column" -> "label"))))
    intercept[GraftPlanError](QualityClassifierTrainOp(StageContext.one(spark,
      corpus, Cfg.of("label_column" -> "nope"))))
  }

  test("non-finite model weights never crash scoring (ANSI cast guard)") {
    val model = Seq(("boom", Double.PositiveInfinity), ("nan", Double.NaN),
      ("__intercept__", Double.NegativeInfinity)).toDF("term", "weight")
    val docs = Seq((1L, "boom nan x")).toDF("doc_id", "text")
    val got = QualityClassifierScoreOp(StageContext(spark,
      Seq("d" -> docs, "m" -> model), Cfg.of()))
      .select("quality_score").as[Double].head()
    assert(!got.isNaN && got >= 0.0 && got <= 1.0)
    // train on perfectly separable two-doc data stays finite (reg default)
    val tiny = Seq((1L, "aaa", 1), (2L, "bbb", 0)).toDF("doc_id", "text", "label")
    val m = QualityClassifierTrainOp(StageContext.one(spark, tiny,
      Cfg.of("label_column" -> "label")))
      .select("weight").as[Double].collect()
    assert(m.forall(w => !w.isNaN && !w.isInfinite && math.abs(w) <= 36.0))
  }

  test("degenerate inputs: empty/one-class training fails loud, empty scoring is empty") {
    val empty = Seq.empty[(Long, String, Int)].toDF("doc_id", "text", "label")
    val e1 = intercept[GraftPlanError](QualityClassifierTrainOp(
      StageContext.one(spark, empty, Cfg.of("label_column" -> "label"))))
    assert(e1.getMessage.contains("empty frame"))
    val oneClass = Seq((1L, "a", 1), (2L, "b", 1)).toDF("doc_id", "text", "label")
    val e2 = intercept[GraftPlanError](QualityClassifierTrainOp(
      StageContext.one(spark, oneClass, Cfg.of("label_column" -> "label"))))
    assert(e2.getMessage.contains("single class"))
    val model = Seq(("a", 1.0), ("__intercept__", 0.0)).toDF("term", "weight")
    assert(QualityClassifierScoreOp(StageContext(spark,
      Seq("d" -> empty.drop("label"), "m" -> model), Cfg.of())).count() === 0L)
  }

  test("score plan broadcasts the model and never shuffles whole documents") {
    val model = Seq(("a", 1.0), ("__intercept__", 0.0)).toDF("term", "weight")
    val docs = (1L to 100L).map(i => (i, s"a b c $i")).toDF("doc_id", "text")
    val plan = QualityClassifierScoreOp(StageContext(spark,
      Seq("d" -> docs, "m" -> model), Cfg.of())).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }
}
