package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.SubstringDedupOp

/** dedup.substrings: canonical-first survival, cross- and intra-doc
  * repeats, span merging, stride recall, annotate metrics, degenerate
  * inputs. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def op(df: org.apache.spark.sql.DataFrame, cfg: (String, Any)*) =
    SubstringDedupOp(StageContext.one(spark, df,
      Cfg.of(Seq("min_tokens" -> 3L) ++ cfg: _*)))

  test("cross-doc repeat: first occurrence survives, later copy is cut") {
    val df = Seq(
      (1L, "a b c d e unique tail one"),
      (2L, "other head a b c d e more words")).toDF("doc_id", "text")
    val got = op(df).orderBy("doc_id").select("text").as[String].collect()
    // doc 1 keeps everything (canonical); doc 2 loses the 5-token repeat
    assert(got(0) === "a b c d e unique tail one")
    assert(got(1) === "other head more words")
  }

  test("intra-doc repeat is removed too; overlapping windows merge to one span") {
    val df = Seq((7L, "x y z p q x y z p q t")).toDF("doc_id", "text")
    // windows of 3: "x y z" repeats at 0 and 5, "y z p" at 1/6, "z p q" at 2/7
    // → marks at 5,6,7 merge to [5,10): the whole second copy goes
    val got = op(df).select("text").as[String].head()
    assert(got === "x y z p q t")
  }

  test("annotate mode: raw window marks + merged token fraction") {
    val df = Seq(
      (1L, "a b c d e unique tail one"),
      (2L, "other head a b c d e more words"),
      (3L, "totally fresh content here")).toDF("doc_id", "text")
    val got = op(df, "mode" -> "annotate")
      .orderBy("doc_id")
      .select("n_dup_spans", "dup_token_frac").as[(Long, Double)].collect()
    assert(got(0) === ((0L, 0.0)))     // canonical doc untouched
    // doc 2: 3 duplicated windows (a b c / b c d / c d e) merging to 5 of 9 tokens
    assert(got(1)._1 === 3L)
    assert(math.abs(got(1)._2 - 5.0 / 9.0) < 1e-5)
    assert(got(2) === ((0L, 0.0)))
  }

  test("stride > 1 cuts window volume but still catches long repeats") {
    val repeat = (1 to 12).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, repeat + " filler"), (2L, "pre " + repeat)).toDF("doc_id", "text")
    val got = op(df, "min_tokens" -> 4L, "stride" -> 2L, "mode" -> "annotate")
      .orderBy("doc_id").select("n_dup_spans").as[Long].collect()
    assert(got(0) === 0L)
    assert(got(1) > 0L) // the 12-token repeat is caught at stride 2
  }

  test("degenerate inputs: short docs, nulls, no repeats, bad config") {
    val df = Seq((1L, "a b"), (2L, null), (3L, "p q r s")).toDF("doc_id", "text")
    val got = op(df).orderBy("doc_id").select("text").as[String].collect()
    assert(got.toSeq === Seq("a b", null, "p q r s"))
    intercept[GraftConfigError](op(df, "mode" -> "nope").count())
    intercept[GraftConfigError](op(df, "min_tokens" -> 1L).count())
    intercept[GraftConfigError](op(df, "stride" -> 9L).count())
  }

  test("shuffle carries narrow rows only; no cartesian") {
    val df = (1L to 50L).map(i => (i, s"doc $i body a b c d e f")).toDF("doc_id", "text")
    val plan = op(df).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
