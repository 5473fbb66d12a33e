package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.{GraftPlanError, StageContext}
import graft.operators.ImportanceSampleOp

/** sample.importance (DSIR): feature counting, importance ordering,
  * deterministic gumbel resampling, output modes. */
class ImportanceSamplingSpec extends SparkSpec {
  import spark.implicits._

  // raw pool: two docs written in "target language", two unrelated
  private def raw = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a dog ran in the park"),
    (3L, "quantum flux capacitor misaligned badly"),
    (4L, "synergy roadmap alignment stakeholder deck")
  ).toDF("doc_id", "text")

  private def target = Seq(
    (100L, "the cat sat on a mat"),
    (101L, "a dog sat in the park")
  ).toDF("doc_id", "text")

  private def run(cfg: (String, Any)*) =
    ImportanceSampleOp(StageContext(spark, Seq("r" -> raw, "t" -> target),
      Cfg.of(Seq("id_column" -> "doc_id") ++ cfg: _*)))

  test("n_features counts the 1..2-gram bag; target-like docs score higher") {
    val got = run("mode" -> "annotate").orderBy("doc_id")
      .select("doc_id", "n_features", "log_importance")
      .as[(Long, Long, Double)].collect()
    // 6-word docs: 6 unigrams + 5 bigrams; 5-word docs: 5 + 4
    assert(got.map(_._2) === Array(11L, 11L, 9L, 9L))
    val byId = got.map(r => r._1 -> r._3).toMap
    // docs sharing the target's vocabulary beat the out-of-domain ones
    assert(math.min(byId(1L), byId(2L)) > math.max(byId(3L), byId(4L)))
  }

  test("topk keeps the k best with the original schema, deterministically") {
    val top2 = run("mode" -> "topk", "k" -> 2L)
    assert(top2.columns.toSeq === Seq("doc_id", "text"))
    assert(top2.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("gumbel resampling is seed-deterministic; noise decides exact ties") {
    def sample(seed: Long) =
      run("mode" -> "gumbel", "k" -> 2L, "seed" -> seed)
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sample(7L) === sample(7L))
    // equal-importance docs: the seeded noise alone picks the subset
    val flat = (1L to 4L).map(i => (i, "same text every time")).toDF("doc_id", "text")
    def flatSample(seed: Long) =
      ImportanceSampleOp(StageContext(spark, Seq("r" -> flat, "t" -> target),
        Cfg.of("id_column" -> "doc_id", "mode" -> "gumbel", "k" -> 2L, "seed" -> seed)))
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(flatSample(3L) === flatSample(3L))
    val draws = (1L to 8L).map(flatSample).distinct
    assert(draws.size > 1, "different seeds should draw different tie-broken samples")
  }

  test("single-word docs contribute unigrams only; short-doc bag is exact") {
    val tiny = Seq((1L, "hello")).toDF("doc_id", "text")
    val got = ImportanceSampleOp(StageContext(spark,
      Seq("r" -> tiny, "t" -> target), Cfg.of("id_column" -> "doc_id")))
    assert(got.select("n_features").as[Long].head() === 1L)
  }

  test("config contract: two inputs, sane ranges") {
    intercept[GraftPlanError] {
      ImportanceSampleOp(StageContext.one(spark, raw, Cfg.of("id_column" -> "doc_id")))
    }
    intercept[GraftConfigError] { run("hex_digits" -> 9L) }
    intercept[GraftConfigError] { run("smoothing" -> 0.0) }
    intercept[GraftConfigError] { run("mode" -> "bogus") }
  }

  test("no cartesian in the plan") {
    val plan = run("mode" -> "annotate").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
