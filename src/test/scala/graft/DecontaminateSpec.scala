package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.DecontaminateOp

/** decontaminate.ngram: exact n-gram collision rules (GPT-3 any-hit,
  * PaLM fraction), short-document whole-gram arm, output modes. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // "alpha beta gamma delta" is a verbatim 4-gram leak of bench doc 100
  private def train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "completely unrelated text with no benchmark overlap at all here"),
    (3L, "prefix words then alpha beta gamma delta and a suffix tail"),
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "question alpha beta gamma delta answer"),
    (101L, "tiny doc")
  ).toDF("doc_id", "text")

  private def run(cfg: (String, Any)*) =
    DecontaminateOp(StageContext(spark, Seq("t" -> train, "b" -> bench),
      Cfg.of(Seq("id_column" -> "doc_id", "n" -> 4L) ++ cfg: _*)))

  test("annotate counts matched distinct n-grams per doc; any-hit rule") {
    val got = run("mode" -> "annotate").orderBy("doc_id")
      .select("doc_id", "n_ngrams", "n_matched_ngrams", "contaminated")
      .as[(Long, Int, Long, Boolean)].collect()
    // doc 3 has 8 4-grams, exactly one of them in the bench set;
    // doc 4 (< n tokens) leaks its whole-document gram vs bench 101
    assert(got === Array(
      (1L, 7, 0L, false), (2L, 7, 0L, false), (3L, 8, 1L, true), (4L, 1, 1L, true)))
  }

  test("filter keeps clean rows with the original schema; semi keeps hits") {
    val clean = run("mode" -> "filter")
    assert(clean.columns.toSeq === Seq("doc_id", "text"))
    assert(clean.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
    assert(run("mode" -> "semi").select("doc_id").as[Long].collect().sorted ===
      Array(3L, 4L))
  }

  test("max_overlap switches to the PaLM fraction rule") {
    // doc 3: 1/8 matched = 0.125; doc 4: 1/1 = 1.0
    val strict = run("mode" -> "semi", "max_overlap" -> 0.5)
    assert(strict.select("doc_id").as[Long].collect() === Array(4L))
    val loose = run("mode" -> "semi", "max_overlap" -> 0.1)
    assert(loose.select("doc_id").as[Long].collect().sorted === Array(3L, 4L))
  }

  test("min_matches raises the any-hit bar") {
    assert(run("mode" -> "semi", "min_matches" -> 2L).count() === 0)
  }

  test("no cartesian product in the plan; bad mode fails loud") {
    val plan = run("mode" -> "annotate").queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
    intercept[GraftConfigError] { run("mode" -> "bogus") }
  }
}
