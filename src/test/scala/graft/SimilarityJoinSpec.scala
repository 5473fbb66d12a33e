package graft

import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.SimilarJoinOp

/** join.similar — cross-table near-match join (decontamination primitive). */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.DataFrame

  private def run(l: DataFrame, r: DataFrame, cfg: (String, Any)*) =
    SimilarJoinOp(StageContext(spark, Seq("l" -> l, "r" -> r), Cfg.of(cfg: _*)))

  // training corpus: two docs near-identical to benchmark items, two clean
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely unrelated text about distributed query engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (4L, "another clean document discussing parquet footers and row group pruning"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank today")
  ).toDF("doc_id", "text")

  private val benchmark = Seq(
    (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (101L, "some benchmark question about astronomy and the orbital period of mars")
  ).toDF("doc_id", "text")

  test("pairs mode emits verified (left, right, jaccard) matches") {
    val pairs = run(corpus, benchmark,
      "id_column" -> "doc_id", "text_column" -> "text", "threshold" -> 0.8)
      .collect().map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
    // docs 1, 3, 5 match benchmark 100 (1 and 5 are exact copies of it;
    // 3 differs by one trailing token); nothing matches 101
    assert(pairs.toSet === Set((1L, 100L), (3L, 100L), (5L, 100L)))
  }

  test("anti mode = decontamination: keeps only unmatched left rows") {
    val clean = run(corpus, benchmark,
      "id_column" -> "doc_id", "text_column" -> "text",
      "threshold" -> 0.8, "mode" -> "anti")
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L, 4L))
    assert(clean.columns.toSeq === corpus.columns.toSeq) // full left rows
  }

  test("semi mode keeps the contaminated rows for auditing") {
    val hits = run(corpus, benchmark,
      "id_column" -> "doc_id", "text_column" -> "text",
      "threshold" -> 0.8, "mode" -> "semi")
    assert(hits.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 5L))
  }

  test("exact-duplicate groups expand through representatives (1 and 5 both reported)") {
    // 1 and 5 share identical text: the LSH join sees ONE representative,
    // yet both original ids must appear in the output
    val pairs = run(corpus, benchmark,
      "id_column" -> "doc_id", "text_column" -> "text", "threshold" -> 0.8)
    assert(pairs.filter($"left_id".isin(1L, 5L)).count() === 2)
  }

  test("distinct id/text column names per side") {
    val l = corpus.toDF("lid", "ltxt")
    val r = benchmark.toDF("rid", "rtxt")
    val pairs = run(l, r,
      "left_id" -> "lid", "right_id" -> "rid",
      "left_text" -> "ltxt", "right_text" -> "rtxt", "threshold" -> 0.8)
    assert(pairs.count() === 3)
  }

  test("embedding method matches by cosine") {
    def vec(base: Double, jitter: Double) =
      Array.tabulate(8)(i => (base + (if (i == 0) jitter else 0.0) + i).toFloat)
    val l = Seq((1L, vec(1.0, 0.0)), (2L, Array.fill(8)(-1.0f))).toDF("id", "emb")
    val r = Seq((10L, vec(1.0, 0.01))).toDF("id", "emb")
    val pairs = run(l, r,
      "method" -> "embedding", "vector_column" -> "emb", "threshold" -> 0.99)
      .collect().map(x => (x.getAs[Long]("left_id"), x.getAs[Long]("right_id")))
    assert(pairs.toSet === Set((1L, 10L)))
    val anti = run(l, r,
      "method" -> "embedding", "vector_column" -> "emb",
      "threshold" -> 0.99, "mode" -> "anti")
    assert(anti.select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("embedding method with blocking=bands: same matches, loud rejections") {
    def vec(base: Double, jitter: Double) =
      Array.tabulate(8)(i => (base + (if (i == 0) jitter else 0.0) + i).toFloat)
    val l = Seq((1L, vec(1.0, 0.0)), (2L, Array.fill(8)(-1.0f))).toDF("id", "emb")
    val r = Seq((10L, vec(1.0, 0.01))).toDF("id", "emb")
    val pairs = run(l, r,
      "method" -> "embedding", "vector_column" -> "emb", "threshold" -> 0.99,
      "blocking" -> "bands", "bands" -> 16, "band_planes" -> 12, "seed" -> 5)
      .collect().map(x => (x.getAs[Long]("left_id"), x.getAs[Long]("right_id")))
    assert(pairs.toSet === Set((1L, 10L)))
    intercept[GraftConfigError](run(l, r,
      "method" -> "embedding", "vector_column" -> "emb", "blocking" -> "rings"))
    intercept[GraftConfigError](run(l, r,
      "method" -> "embedding", "vector_column" -> "emb",
      "blocking" -> "bands", "band_planes" -> 0))
    intercept[GraftConfigError](run(l, r,
      "method" -> "embedding", "vector_column" -> "emb",
      "blocking" -> "bands", "bands" -> 0))
    // a leftover pigeonhole planes value (not divisible by blocks) must
    // not reject the banded path, which never uses it
    val viaLeftover = run(l, r,
      "method" -> "embedding", "vector_column" -> "emb", "threshold" -> 0.99,
      "blocking" -> "bands", "planes" -> 30, "seed" -> 5)
      .collect().map(x => (x.getAs[Long]("left_id"), x.getAs[Long]("right_id")))
    assert(viaLeftover.toSet === Set((1L, 10L)))
  }

  test("config validation is loud") {
    intercept[GraftConfigError](run(corpus, benchmark,
      "id_column" -> "doc_id", "mode" -> "full"))
    intercept[GraftConfigError](run(corpus, benchmark,
      "id_column" -> "doc_id", "method" -> "levenshtein"))
    intercept[GraftConfigError](run(corpus, benchmark,
      "id_column" -> "doc_id", "num_hashes" -> 100, "bands" -> 32))
  }

  test("no cartesian/nested-loop join in the plan") {
    val plan = run(corpus, benchmark,
      "id_column" -> "doc_id", "text_column" -> "text")
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("cartesian") && !plan.contains("joinwithoutcondition"))
  }
  test("index_path minhash: probe equals the two-input join; params from meta") {
    val idx = java.nio.file.Files.createTempDirectory("sj_mh_idx").toString
    graft.operators.IndexBuildOp(StageContext.one(spark, benchmark, Cfg.of(
      "type" -> "minhash", "path" -> idx, "id_column" -> "doc_id",
      "text_column" -> "text", "shingle_size" -> 3, "num_hashes" -> 128,
      "bands" -> 32, "seed" -> 42)))
    def viaIndex(mode: String) = SimilarJoinOp(StageContext.one(spark, corpus, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text", "threshold" -> 0.8,
      "index_path" -> idx, "mode" -> mode)))
    val pairs = viaIndex("pairs").collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
    assert(pairs.toSet === Set((1L, 100L), (3L, 100L), (5L, 100L)))
    val anti = viaIndex("anti").select("doc_id").as[Long].collect().sorted
    assert(anti.toSeq === Seq(2L, 4L))
    // conflicting explicit params fail loud instead of silently missing
    intercept[GraftConfigError](SimilarJoinOp(StageContext.one(spark, corpus, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text", "threshold" -> 0.8,
      "index_path" -> idx, "num_hashes" -> 64))))
    // a non-minhash index is rejected with direction
    val lsh = java.nio.file.Files.createTempDirectory("sj_notmh_idx").toString
    graft.operators.IndexBuildOp(StageContext.one(spark,
      Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding"), Cfg.of(
        "type" -> "lsh", "path" -> lsh, "vector_column" -> "embedding",
        "num_planes" -> 16, "blocks" -> 4)))
    intercept[GraftConfigError](SimilarJoinOp(StageContext.one(spark, corpus, Cfg.of(
      "id_column" -> "doc_id", "text_column" -> "text", "index_path" -> lsh))))
  }

  test("index_path embedding: pigeonhole and bands layouts both probe; scores match") {
    def vec(i: Int, scale: Float = 1f): Array[Float] =
      Array.tabulate(4)(j => if (j == i) scale else 0f)
    val corpusV = Seq((100L, vec(0), "a"), (101L, vec(1), "b"), (102L, vec(2), "c"))
      .toDF("vec_id", "embedding", "label")
    // left: scaled copy of 100 (cosine 1), novel direction, copy of 102
    val leftV = Seq((1L, vec(0, 3f)), (2L, vec(3)), (3L, vec(2, 2f)))
      .toDF("vec_id", "embedding")
    for (blocking <- Seq("pigeonhole", "bands")) {
      val idx = java.nio.file.Files.createTempDirectory(s"sj_emb_$blocking").toString
      val base = Seq[(String, Any)]("type" -> "lsh", "path" -> idx,
        "id_column" -> "vec_id", "vector_column" -> "embedding", "seed" -> 11)
      val cfgB = if (blocking == "bands")
        base ++ Seq[(String, Any)]("blocking" -> "bands", "bands" -> 4,
          "band_planes" -> 4, "partition_dirs" -> 4)
      else base ++ Seq[(String, Any)]("num_planes" -> 16, "blocks" -> 4)
      graft.operators.IndexBuildOp(StageContext.one(spark, corpusV, Cfg.of(cfgB: _*)))
      val pairs = SimilarJoinOp(StageContext.one(spark, leftV, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "method" -> "embedding", "threshold" -> 0.95, "index_path" -> idx)))
        .collect().map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"),
          r.getAs[Double]("cosine")))
      assert(pairs.toSet === Set((1L, 100L, 1.0), (3L, 102L, 1.0)),
        s"$blocking: " + pairs.mkString(", "))
      // anti mode: only the novel-direction row survives
      val anti = SimilarJoinOp(StageContext.one(spark, leftV, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "method" -> "embedding", "threshold" -> 0.95, "index_path" -> idx,
        "mode" -> "anti"))).select("vec_id").as[Long].collect().sorted
      assert(anti.toSeq === Seq(2L), s"$blocking anti")
    }
    // an explicit blocking that contradicts the layout fails loud
    val idxB = java.nio.file.Files.createTempDirectory("sj_emb_conf").toString
    graft.operators.IndexBuildOp(StageContext.one(spark, corpusV, Cfg.of(
      "type" -> "lsh", "blocking" -> "bands", "path" -> idxB,
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "bands" -> 4, "band_planes" -> 4, "seed" -> 11)))
    intercept[GraftConfigError](SimilarJoinOp(StageContext.one(spark, leftV, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "method" -> "embedding", "blocking" -> "pigeonhole", "index_path" -> idxB))))
    // index_path plus a second input is ambiguous
    intercept[GraftConfigError](SimilarJoinOp(StageContext(spark,
      Seq("l" -> leftV, "r" -> corpusV), Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "method" -> "embedding", "index_path" -> idxB))))
  }
}

