package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.{DecontaminateEmbeddingOp, IndexBuildOp}

/** decontaminate.embedding: semantic benchmark decontamination — annotate
  * stats, filter/semi complements, index_path probe parity, blocking
  * layouts, empty-side edges. The candidate machinery itself is
  * join.similar's (SimilarityJoinSpec + the banded/ivf suites); these
  * tests pin THIS op's contract on top of it. */
class DecontaminateEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  // v = [1..8]; scaled copies have cosine exactly 1, the negation −1, and
  // every other cross pair stays far below the 0.95 threshold
  private def vec(scale: Float) = Array.tabulate(8)(i => (i + 1) * scale)
  private def other = Array(1f, -2f, 3f, -4f, 5f, -6f, 7f, -8f)

  private def train = Seq(
    (1L, vec(1f)),   // leaks: cosine 1.0 vs BOTH scaled bench copies
    (2L, other),     // clean (cosine −1 vs bench 102, ≤0.18 elsewhere)
    (3L, vec(-1f)),  // clean: cosine −1 vs the bench copies
    (4L, Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f)) // clean (max cosine 0.56)
  ).toDF("doc_id", "embedding")

  private def bench = Seq(
    (100L, vec(2f)), (101L, vec(4f)), (102L, other.map(x => -x))
  ).toDF("doc_id", "embedding")

  private def run(cfg: (String, Any)*) =
    DecontaminateEmbeddingOp(StageContext(spark, Seq("t" -> train, "b" -> bench),
      Cfg.of(Seq[(String, Any)]("id_column" -> "doc_id",
        "vector_column" -> "embedding", "threshold" -> 0.95) ++ cfg: _*)))

  test("annotate appends match count, max cosine, and the flag") {
    val got = run("mode" -> "annotate").orderBy("doc_id")
      .select("doc_id", "n_benchmark_matches", "max_benchmark_cosine", "contaminated")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    assert(got.map(x => (x._1, x._2, x._4)) ===
      Array((1L, 2L, true), (2L, 0L, false), (3L, 0L, false), (4L, 0L, false)))
    assert(got(0)._3.get > 0.999) // the scaled-copy cosine
    assert(got.drop(1).forall(_._3.isEmpty)) // clean rows: null, not 0.0
  }

  test("filter keeps clean rows with the original schema; semi keeps leaks") {
    val clean = run("mode" -> "filter")
    assert(clean.columns.toSeq === Seq("doc_id", "embedding"))
    assert(clean.select("doc_id").as[Long].collect().sorted === Array(2L, 3L, 4L))
    assert(run("mode" -> "semi").select("doc_id").as[Long].collect() === Array(1L))
  }

  test("index_path: a prebuilt bands-layout benchmark index probes identically") {
    val idx = java.nio.file.Files.createTempDirectory("dce_idx").toString
    IndexBuildOp(StageContext.one(spark, bench, Cfg.of(
      "type" -> "lsh", "blocking" -> "bands", "path" -> idx,
      "id_column" -> "doc_id", "vector_column" -> "embedding",
      "bands" -> 8, "band_planes" -> 12, "seed" -> 7, "partition_dirs" -> 4)))
    val got = DecontaminateEmbeddingOp(StageContext(spark, Seq("t" -> train),
      Cfg.of("id_column" -> "doc_id", "vector_column" -> "embedding",
        "threshold" -> 0.95, "mode" -> "annotate", "index_path" -> idx)))
      .orderBy("doc_id")
      .select("doc_id", "n_benchmark_matches", "contaminated")
      .as[(Long, Long, Boolean)].collect()
    assert(got === Array((1L, 2L, true), (2L, 0L, false),
      (3L, 0L, false), (4L, 0L, false)))
  }

  test("blocking=ivf at nlist=1 reproduces the pigeonhole verdicts") {
    val got = run("mode" -> "semi", "blocking" -> "ivf", "nlist" -> 1, "seed" -> 3)
      .select("doc_id").as[Long].collect()
    assert(got === Array(1L))
  }

  test("empty benchmark: everything is clean; empty train: empty output") {
    val emptyB = bench.filter(F.lit(false))
    val allClean = DecontaminateEmbeddingOp(StageContext(spark,
      Seq("t" -> train, "b" -> emptyB),
      Cfg.of("id_column" -> "doc_id", "vector_column" -> "embedding",
        "threshold" -> 0.95, "mode" -> "annotate")))
    assert(allClean.filter(F.col("contaminated")).count() === 0)
    assert(allClean.count() === 4)
    val emptyT = DecontaminateEmbeddingOp(StageContext(spark,
      Seq("t" -> train.filter(F.lit(false)), "b" -> bench),
      Cfg.of("id_column" -> "doc_id", "vector_column" -> "embedding",
        "threshold" -> 0.95, "mode" -> "filter")))
    assert(emptyT.count() === 0)
  }

  test("bad mode fails loud") {
    intercept[GraftConfigError](run("mode" -> "purge").count())
  }
}
