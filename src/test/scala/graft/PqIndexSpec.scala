package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import graft.config.Cfg
import graft.config.GraftConfigError
import graft.core.StageContext
import graft.operators.{IndexBuildOp, IndexCompactOp, IndexStatsOp, KnnBruteForceOp, KnnIvfOp, Pq}

/** index.build type=ivfpq + the knn.ivf ADC probe: codebook training
  * determinism, exhaustive parity with brute force, the columnar-pruning
  * contract (ADC scan never reads the raw vector column), frozen-quantizer
  * append, and lifecycle compatibility (index.compact / index.stats see
  * the ivfpq family). */
class PqIndexSpec extends SparkSpec {

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def buildPq(extra: (String, Any)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      (Seq[(String, Any)]("type" -> "ivfpq", "path" -> dir,
        "vector_column" -> "embedding", "nlist" -> 8, "m" -> 8,
        "ksub" -> 16, "seed" -> 11) ++ extra): _*)))
    dir
  }

  private def knn(dir: String, extra: (String, Any)*) =
    KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      (Seq[(String, Any)]("query_id" -> 0, "k" -> 10,
        "index_path" -> dir) ++ extra): _*)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

  private def brute = KnnBruteForceOp(StageContext.one(spark, emb, Cfg.of(
    "query_id" -> 0, "k" -> 10)))
    .collect().map(r => (r.getLong(0), r.getDouble(1)))

  // ---- pure training machinery ----

  test("lloyd is deterministic and clamps k to the distinct point count") {
    val pts = Array(Array(0.0, 0.0), Array(0.0, 0.0), Array(10.0, 10.0),
      Array(10.1, 10.0), Array(0.1, 0.0))
    val a = Pq.lloyd(pts, 8, 15, seed = 3L)
    val b = Pq.lloyd(pts, 8, 15, seed = 3L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.length === 4, "k must clamp to the 4 distinct points")
    val two = Pq.lloyd(pts, 2, 15, seed = 3L)
    // the two natural clusters must separate
    assert(two.length === 2)
    assert(two.map(c => c(0) < 5.0).toSet === Set(true, false),
      "one center near (0,0), one near (10,10)")
  }

  test("encode emits m one-byte codes and the exact vector norm") {
    val cents = Array(Array(0.0, 0.0, 0.0, 0.0), Array(10.0, 10.0, 10.0, 10.0))
    val books = Pq.trainCodebooks(
      Array(Array(1.0, 0.0, 0.0, 1.0), Array(-1.0, 0.0, 0.0, -1.0)),
      m = 2, ksub = 2, iters = 5, seed = 1L)
    val (cell, codes, norm) = Pq.encode(Array(3.0, 4.0, 0.0, 0.0), cents, books)
    assert(cell === 0, "nearest coarse centroid")
    assert(codes.length === 2, "one code per subspace")
    assert(math.abs(norm - 5.0) < 1e-12, "exact norm, not reconstructed")
  }

  // ---- probe correctness ----

  test("nprobe = nlist with covering rerank matches brute force exactly") {
    val dir = buildPq()
    // rerank·k (50·10) ≥ the 500-row corpus → the exact pass re-scores every
    // candidate ADC could possibly rank: the plumbing (encode, codes
    // round-trip, rerank join) must reproduce brute force bit-for-bit
    assert(knn(dir, "nprobe" -> 8, "rerank" -> 50) === brute)
  }

  test("realistic settings keep high recall on clustered data") {
    // the sf fixture embeddings are near-uniform random — every cosine is
    // near 0 and quantization error swamps the (meaningless) ranking, the
    // documented worst case for any ANN. Real embedding corpora cluster;
    // synthesize that: 16 tight clusters in 64-dim, query a member.
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_rec").toString
    IndexBuildOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
      "nlist" -> 16, "m" -> 8, "ksub" -> 16, "seed" -> 11)))
    def ids(x: org.apache.spark.sql.DataFrame) = x.collect().map(_.getLong(0)).toSet
    val got = ids(KnnIvfOp(StageContext.one(spark, df, Cfg.of(
      "query_id" -> 0, "k" -> 10, "nprobe" -> 4, "rerank" -> 4,
      "index_path" -> dir))))
    val want = ids(KnnBruteForceOp(StageContext.one(spark, df, Cfg.of(
      "query_id" -> 0, "k" -> 10))))
    val recall = got.intersect(want).size.toDouble / want.size
    info(s"recall@10 at nprobe=4/16 rerank=4: $recall")
    // deterministic (seeded data, seeded quantizer + codebooks); the floor
    // has slack so a re-tuned trainer doesn't flap the spec
    assert(recall >= 0.8, s"recall $recall below 0.8")
  }

  test("rerank = 0 returns ADC scores whose top-1 is the query itself") {
    val dir = buildPq()
    val top = knn(dir, "nprobe" -> 8, "rerank" -> 0).head
    // vec 0 IS the query: its residual decodes to its own codes, so its
    // approximate dot is maximal among near-identical candidates
    assert(top._1 === 0L)
  }

  // ---- the scale contract: plan shapes ----

  test("ADC scan reads codes, never the raw vector column; cells prune") {
    val dir = buildPq()
    val probe = KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10, "nprobe" -> 2, "rerank" -> 0,
      "index_path" -> dir)))
    val scans = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("corpus")) => f
    }
    assert(scans.nonEmpty, "expected a corpus file scan")
    scans.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.contains("embedding"),
        s"ADC scan must not read the raw vectors (ReadSchema: $read)")
      assert(read.contains("pq_codes") && read.contains("pq_vnorm"),
        s"ADC scan must read the codes and norms (ReadSchema: $read)")
      assert(s.partitionFilters.nonEmpty,
        "cell IN (...) must prune at planning time")
    }
  }

  test("rerank reads the vector column only in its own candidate-join scan") {
    val dir = buildPq()
    val probe = KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10, "nprobe" -> 2, "rerank" -> 3,
      "index_path" -> dir)))
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case _ => Seq.empty
      }))
    probe.collect() // adaptive: finalize stages before inspecting
    val scans = flatten(probe.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("corpus")) => f
    }
    val (withVec, withoutVec) = scans.partition(
      _.requiredSchema.fieldNames.contains("embedding"))
    assert(withoutVec.nonEmpty, "the ADC candidate scan must stay narrow")
    assert(withVec.forall(!_.requiredSchema.fieldNames.contains("pq_codes")),
      "the rerank scan reads vectors + id only, not codes")
  }

  // ---- append (frozen quantizer + codebooks) ----

  test("append encodes against the frozen codebooks; union equals brute force") {
    val F = org.apache.spark.sql.functions
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_ap").toString
    IndexBuildOp(StageContext.one(spark, emb.filter(F.col("vec_id") % 2 === 0), Cfg.of(
      "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
      "nlist" -> 8, "m" -> 8, "ksub" -> 16, "seed" -> 11)))
    IndexBuildOp(StageContext.one(spark, emb.filter(F.col("vec_id") % 2 =!= 0), Cfg.of(
      "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
      "mode" -> "append")))
    assert(knn(dir, "nprobe" -> 8, "rerank" -> 50) === brute)
  }

  test("append with explicitly different params fails loud") {
    val dir = buildPq()
    val e = intercept[GraftConfigError] {
      IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
        "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
        "mode" -> "append", "ksub" -> 32)))
    }
    assert(e.getMessage.contains("ksub"))
  }

  test("append with reserved layout columns in the input fails loud") {
    val F2 = org.apache.spark.sql.functions
    val dir = buildPq()
    val e = intercept[GraftConfigError] {
      IndexBuildOp(StageContext.one(spark,
        emb.withColumn("pq_codes", F2.lit(1)), Cfg.of(
        "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
        "mode" -> "append")))
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("append against a missing index fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_none").toString
    val e = intercept[GraftConfigError] {
      IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
        "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
        "mode" -> "append")))
    }
    assert(e.getMessage.contains("mode=overwrite"))
  }

  // ---- config validation ----

  test("dim not divisible by m fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_bad").toString
    val e = intercept[GraftConfigError] {
      IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
        "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
        "m" -> 7)))
    }
    assert(e.getMessage.contains("divisible"))
  }

  test("ksub beyond one byte fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_bad2").toString
    val e = intercept[GraftConfigError] {
      IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
        "type" -> "ivfpq", "path" -> dir, "vector_column" -> "embedding",
        "ksub" -> 300)))
    }
    assert(e.getMessage.contains("256"))
  }

  // ---- batch probe (knn.join) ----

  test("knn.join ivfpq with covering rerank equals batch brute force") {
    val dir = buildPq()
    val F2 = org.apache.spark.sql.functions
    val q = emb.filter(F2.col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaPq = rows(graft.operators.KnnJoinOp(StageContext.one(spark, q, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 7,
      "index_path" -> dir, "nprobe" -> 8, "rerank" -> 100))))
    val brute = rows(graft.operators.KnnJoinOp(StageContext(spark,
      Seq("q" -> q, "c" -> emb), Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 7))))
    assert(viaPq === brute)
  }

  test("knn.join ivfpq candidate scan stays narrow and cell-pruned") {
    val dir = buildPq()
    val F2 = org.apache.spark.sql.functions
    val probe = graft.operators.KnnJoinOp(StageContext.one(spark,
      emb.filter(F2.col("vec_id") < 5), Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 7,
      "index_path" -> dir, "nprobe" -> 2, "rerank" -> 3)))
    probe.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case _ => Seq.empty
      }))
    val scans = flatten(probe.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("corpus")) => f
    }
    assert(scans.nonEmpty, "expected corpus file scans")
    val narrow = scans.filter(_.requiredSchema.fieldNames.contains("pq_codes"))
    assert(narrow.nonEmpty, "the ADC candidate scan must read pq_codes")
    narrow.foreach { s =>
      assert(!s.requiredSchema.fieldNames.contains("embedding"),
        s"candidate scan must not read vectors (ReadSchema: ${s.requiredSchema.fieldNames.toSet})")
      assert(s.partitionFilters.nonEmpty, "cell IN (...) must prune at planning time")
    }
  }

  test("rerank on a flat ivf index fails loud (single-query and batch)") {
    val F2 = org.apache.spark.sql.functions
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_flat").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivf", "path" -> dir, "vector_column" -> "embedding",
      "nlist" -> 8, "seed" -> 11)))
    val e1 = intercept[GraftConfigError] {
      KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
        "query_id" -> 0, "k" -> 10, "index_path" -> dir, "rerank" -> 4)))
    }
    assert(e1.getMessage.contains("ivfpq"))
    val e2 = intercept[GraftConfigError] {
      graft.operators.KnnJoinOp(StageContext.one(spark,
        emb.filter(F2.col("vec_id") < 5), Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 7,
        "index_path" -> dir, "rerank" -> 4)))
    }
    assert(e2.getMessage.contains("ivfpq"))
    // and the flat family reports no pq scan ratio
    val stats = IndexStatsOp(StageContext.one(spark, emb.limit(1), Cfg.of("path" -> dir)))
      .collect().head
    assert(stats.isNullAt(stats.fieldIndex("pq_scan_ratio")))
  }

  // ---- lifecycle: compact + stats see the family ----

  test("index.compact preserves ivfpq probe results; index.stats reports the family") {
    val dir = buildPq()
    val before = knn(dir, "nprobe" -> 8, "rerank" -> 50)
    IndexCompactOp(StageContext.one(spark, emb.limit(1), Cfg.of("path" -> dir)))
    assert(knn(dir, "nprobe" -> 8, "rerank" -> 50) === before)
    val stats = IndexStatsOp(StageContext.one(spark, emb.limit(1), Cfg.of("path" -> dir)))
      .collect().head
    assert(stats.getAs[String]("index_type") === "ivfpq")
    // measured scan-bytes observability: the vector column weighs an
    // order of magnitude more than the code columns (64 floats vs m=8
    // bytes + one norm), so the ratio is far above 1
    val ratio = stats.getAs[Double]("pq_scan_ratio")
    assert(!stats.isNullAt(stats.fieldIndex("pq_scan_ratio")) && ratio > 2.0,
      s"pq_scan_ratio $ratio")
  }
}
