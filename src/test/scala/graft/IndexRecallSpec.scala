package graft

import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.{IndexBuildOp, IndexRecallOp}

/** index.recall — the recall-observability maintenance verb: exhaustive
  * calibration (nprobe = nlist ⇒ exactly 1.0, pinning the one-pass exact
  * ground truth against the probe's ordering), pruned sensitivity,
  * nprobe monotonicity, per-query output, family guards, determinism. */
class IndexRecallSpec extends SparkSpec {

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def build(tpe: String, extra: (String, Any)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ir_$tpe").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      (Seq[(String, Any)]("type" -> tpe, "path" -> dir,
        "vector_column" -> "embedding", "nlist" -> 16, "seed" -> 11) ++ extra): _*)))
    dir
  }

  private def recall(dir: String, extra: (String, Any)*) =
    IndexRecallOp(StageContext.one(spark, emb, Cfg.of(
      (Seq[(String, Any)]("path" -> dir, "id_column" -> "vec_id",
        "queries" -> 8, "k" -> 10, "seed" -> 11) ++ extra): _*))).head()

  test("exhaustive calibration: nprobe = nlist reads exactly 1.0 (ivf and ivfpq)") {
    val ivf = recall(build("ivf"), "nprobe" -> 16)
    assert(ivf.getAs[Double]("mean_recall") === 1.0 &&
      ivf.getAs[Double]("min_recall") === 1.0,
      "every-cell probe IS brute force — any miss means the exact side and " +
      "the probe disagree on ordering")
    assert(ivf.getAs[Long]("queries") === 8L && ivf.getAs[Long]("k") === 10L)
    // ivfpq with covering rerank: ADC shortlists, exact rerank recovers
    val pq = recall(build("ivfpq", "m" -> 8, "ksub" -> 16),
      "nprobe" -> 16, "rerank" -> 100)
    assert(pq.getAs[Double]("mean_recall") === 1.0 && pq.getAs[Double]("min_recall") === 1.0)
  }

  test("pruned probes read below 1.0 on random data, monotone in nprobe") {
    val dir = build("ivf")
    val r1 = recall(dir, "nprobe" -> 1).getAs[Double]("mean_recall")
    val r4 = recall(dir, "nprobe" -> 4).getAs[Double]("mean_recall")
    val r16 = recall(dir, "nprobe" -> 16).getAs[Double]("mean_recall")
    info(f"index.recall ivf mean: nprobe=1 $r1%.3f, 4 $r4%.3f, 16 $r16%.3f")
    assert(r1 <= r4 + 1e-9 && r4 <= r16 + 1e-9 && r16 === 1.0)
    assert(r1 < 1.0, "the metric must be sensitive at nprobe=1 on 500 random vectors")
  }

  test("corpus_sample: 1.0 is byte-identical to the default; sampled truth stays calibrated") {
    val dir = build("ivf")
    // explicit 1.0 ≡ omitted — same report, every column
    val full = recall(dir, "nprobe" -> 4)
    val one = recall(dir, "nprobe" -> 4, "corpus_sample" -> 1.0)
    assert(one.toSeq === full.toSeq, "corpus_sample = 1.0 must be today's behavior exactly")

    // sampled, exhaustive probe: the probe IS brute force and both sides
    // restrict to the SAME id-hash sample, so within-sample recall is 1.0
    // — the calibration point survives sampling
    val ex = recall(dir, "nprobe" -> 16, "corpus_sample" -> 0.5)
    assert(ex.getAs[Double]("mean_recall") === 1.0 && ex.getAs[Double]("min_recall") === 1.0,
      "exhaustive within-sample recall must be exactly 1.0")

    // sampled pruned probe: a valid recall in [0,1], deterministic per seed
    val a = recall(dir, "nprobe" -> 2, "corpus_sample" -> 0.5).getAs[Double]("mean_recall")
    val b = recall(dir, "nprobe" -> 2, "corpus_sample" -> 0.5).getAs[Double]("mean_recall")
    assert(a === b && a >= 0.0 && a <= 1.0)

    // config edges: out-of-range fraction, and a draw too small to measure
    intercept[GraftConfigError](recall(dir, "corpus_sample" -> 0.0))
    intercept[GraftConfigError](recall(dir, "corpus_sample" -> 1.5))
    intercept[graft.core.GraftPlanError](recall(dir, "corpus_sample" -> 1e-9))
  }

  test("per_query rows, determinism, family guard") {
    val dir = build("ivf")
    val rows = IndexRecallOp(StageContext.one(spark, emb, Cfg.of(
      "path" -> dir, "id_column" -> "vec_id", "queries" -> 8, "k" -> 10,
      "nprobe" -> 4, "seed" -> 11, "per_query" -> true)))
    val a = rows.collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(a.length === 8 && a.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    val b = IndexRecallOp(StageContext.one(spark, emb, Cfg.of(
      "path" -> dir, "id_column" -> "vec_id", "queries" -> 8, "k" -> 10,
      "nprobe" -> 4, "seed" -> 11, "per_query" -> true)))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(a === b, "same index + seed → same report")

    // set-membership / fixed-plane families have no probe-recall notion
    import spark.implicits._
    val mh = java.nio.file.Files.createTempDirectory("graft_ir_mh").toString
    IndexBuildOp(StageContext.one(spark,
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text"),
      Cfg.of("type" -> "minhash", "path" -> mh, "id_column" -> "doc_id",
        "text_column" -> "text", "num_hashes" -> 64, "bands" -> 16, "seed" -> 7)))
    val e = intercept[GraftConfigError](recall(mh, "nprobe" -> 4))
    assert(e.getMessage.contains("recall is a property"))
  }
}
