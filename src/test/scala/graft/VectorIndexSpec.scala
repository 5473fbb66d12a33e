package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import graft.config.Cfg
import graft.core.StageContext
import graft.operators.{IndexBuildOp, KnnBruteForceOp, KnnIvfOp, KnnJoinOp, KnnLshOp}

/** index.build + knn.ivf index_path: exactness at nprobe=nlist and real
  * parquet partition pruning on the probe scan. */
class VectorIndexSpec extends SparkSpec {

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def buildIndex(nlist: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "path" -> dir, "vector_column" -> "embedding", "nlist" -> nlist, "seed" -> 11)))
    dir
  }

  test("nprobe = nlist probes every cell and matches brute force exactly") {
    val dir = buildIndex(nlist = 8)
    val viaIndex = KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10, "nprobe" -> 8, "index_path" -> dir)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = KnnBruteForceOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaIndex === brute)
  }

  test("nprobe < nlist prunes corpus partitions in the scan") {
    val dir = buildIndex(nlist = 8)
    val probe = KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10, "nprobe" -> 2, "index_path" -> dir)))
    val scans = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths.exists(_.toString.contains("corpus")) => f
    }
    assert(scans.nonEmpty, "expected a corpus file scan")
    // the cell IN (...) predicate must be a PARTITION filter (pruned at
    // planning), not a post-scan data filter
    assert(scans.forall(_.partitionFilters.nonEmpty),
      probe.queryExecution.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    // top-1 must still be the query vector itself (cosine 1.0 cell always probed)
    val top = probe.collect().head
    assert(top.getLong(0) === 0L && top.getDouble(1) === 1.0)
  }

  test("lsh index probe returns the same candidates as the inline scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_spec").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "path" -> dir, "type" -> "lsh", "vector_column" -> "embedding",
      "num_planes" -> 16, "blocks" -> 4, "seed" -> 11)))
    def run(extra: (String, Any)*) =
      KnnLshOp(StageContext.one(spark, emb, Cfg.of(
        (Seq[(String, Any)]("query_id" -> 0, "k" -> 10, "num_planes" -> 16,
          "blocks" -> 4, "seed" -> 11) ++ extra): _*)))
    val inline = run().collect().map(r => (r.getLong(0), r.getDouble(1)))
    val probe = run("index_path" -> dir)
    val indexed = probe.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(indexed === inline)
    // the (block, bucket) predicate must prune at planning time; the scan
    // sits inside an AdaptiveSparkPlanExec (dropDuplicates adds an
    // exchange), so flatten adaptive nodes before collecting
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case _ => Seq.empty
      }))
    val flat = flatten(probe.queryExecution.executedPlan)
    info("plan nodes: " + flat.map(_.getClass.getSimpleName).distinct.mkString(", "))
    val scans = flat.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths.exists(_.toString.contains("corpus")) => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty))
  }

  test("probe_hamming = width covers every bucket and equals brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshex_spec").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "path" -> dir, "type" -> "lsh", "vector_column" -> "embedding",
      "num_planes" -> 16, "blocks" -> 4, "seed" -> 11)))
    def probe(d: Int) = KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10, "index_path" -> dir, "probe_hamming" -> d)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = KnnBruteForceOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10))).collect().map(r => (r.getLong(0), r.getDouble(1)))
    // d = width (16/4 = 4): every bucket of every block probed → the
    // candidate set is the whole corpus, the answer is exact
    assert(probe(4) === brute)
    // multi-probe recall is monotone in d: each widened probe's result
    // cosine floor can only improve toward the brute-force floor
    val floors = (0 to 4).map(d => probe(d).map(_._2).min)
    assert(floors.zip(floors.tail).forall { case (a, b) => b >= a - 1e-9 })
    // inline mode agrees with itself at the exhaustive setting too
    val inlineAll = KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 10, "num_planes" -> 16, "blocks" -> 4,
      "seed" -> 11, "probe_hamming" -> 4)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(inlineAll === brute)
    // out-of-range d fails loud
    intercept[graft.config.GraftConfigError](KnnLshOp(StageContext.one(spark, emb,
      Cfg.of("query_id" -> 0, "k" -> 10, "index_path" -> dir, "probe_hamming" -> 5))))
  }

  test("knn.ivf with no index_path still trains inline (legacy mode)") {
    val out = KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "k" -> 5, "nlist" -> 4, "nprobe" -> 4, "seed" -> 11)))
      .collect()
    assert(out.length === 5 && out.head.getLong(0) === 0L)
  }

  test("knn.join: per-query top-k equals per-query brute force; bounded heap shape") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val corpus = (0 until 50).map { i =>
      val r = new scala.util.Random(i * 131L + 3)
      val v = Array.fill(8)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(F.col("vec_id") < 3)
    val out = KnnJoinOp(graft.core.StageContext(spark, Seq(
      "q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.length === 15, "3 queries x k=5")
    // per query: ranks are 1..5, descending cosine, self is rank 1 (cos 1)
    for (q <- 0L until 3L) {
      val mine = out.filter(_._1 == q).sortBy(_._4)
      assert(mine.map(_._4).toSeq === Seq(1, 2, 3, 4, 5))
      assert(mine.head._2 === q && mine.head._3 === 1.0)
      assert(mine.map(_._3).toSeq === mine.map(_._3).sortBy(-(_: Double)).toSeq)
      // equals the single-query operator's answer on the same corpus
      val single = KnnBruteForceOp(graft.core.StageContext.one(spark, corpus, Cfg.of(
        "query_id" -> q, "id_column" -> "vec_id",
        "vector_column" -> "embedding", "k" -> 5)))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(mine.map(m => (m._2, m._3)).toSeq === single)
    }
    // rejections: k < 1, unknown broadcast mode, missing column
    intercept[graft.config.GraftConfigError](KnnJoinOp(graft.core.StageContext(spark,
      Seq("q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 0))))
    intercept[graft.config.GraftConfigError](KnnJoinOp(graft.core.StageContext(spark,
      Seq("q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding",
        "broadcast" -> "corpus"))))
    intercept[graft.core.GraftPlanError](KnnJoinOp(graft.core.StageContext(spark,
      Seq("q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "nope", "vector_column" -> "embedding"))))
    // plan shape: the query side broadcasts (BNLJ), no sort-merge join
    val plan = KnnJoinOp(graft.core.StageContext(spark, Seq(
      "q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("knn.join index_path: pruned probe, exhaustive equals brute force, rejections") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val corpus = (0 until 60).map { i =>
      val r = new scala.util.Random(i * 17L + 5)
      val v = Array.fill(16)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("kj_idx").toString
    IndexBuildOp(graft.core.StageContext.one(spark, corpus, Cfg.of(
      "type" -> "lsh", "path" -> idx, "id_column" -> "vec_id",
      "vector_column" -> "embedding", "num_planes" -> 16, "blocks" -> 4,
      "seed" -> 11, "partition_dirs" -> 8)))
    val queries = corpus.filter(F.col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sortBy(x => (x._1, x._4))
    // probe_hamming = width: provably covers every bucket == brute force
    val exhaustive = rows(KnnJoinOp(graft.core.StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 6,
      "index_path" -> idx, "probe_hamming" -> 4))))
    val brute = rows(KnnJoinOp(graft.core.StageContext(spark, Seq(
      "q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 6))))
    assert(exhaustive === brute)
    // default pruned probe: self (cosine 1, every block collides) is rank 1
    val pruned = rows(KnnJoinOp(graft.core.StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 6,
      "index_path" -> idx))))
    for (q <- 0L until 2L) {
      val mine = pruned.filter(_._1 == q)
      assert(mine.nonEmpty && mine.head._2 === q && mine.head._3 === 1.0)
      // pruned candidates are a subset: every (corpus_id, cosine) appears
      // in the exhaustive answer's candidate set or ranks below it
      assert(mine.map(_._3).toSeq === mine.map(_._3).sortBy(-(_: Double)).toSeq)
    }
    // rejections: both corpus input AND index_path; bad probe_hamming;
    // wrong column name vs the indexed columns
    intercept[graft.config.GraftConfigError](KnnJoinOp(graft.core.StageContext(spark,
      Seq("q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding",
        "index_path" -> idx))))
    intercept[graft.config.GraftConfigError](KnnJoinOp(graft.core.StageContext.one(spark,
      queries, Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding",
        "index_path" -> idx, "probe_hamming" -> 5))))
    intercept[graft.core.GraftPlanError](KnnJoinOp(graft.core.StageContext.one(spark,
      queries, Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding",
        "right_id" -> "nope", "index_path" -> idx))))
    // dim mismatch fails loud
    val wrongDim = (0 until 2).map(i => (i.toLong, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    intercept[graft.config.GraftConfigError](KnnJoinOp(graft.core.StageContext.one(spark,
      wrongDim, Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding",
        "index_path" -> idx))))
  }

  test("knn.join: zero-norm vectors are excluded, and explain needs no index") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    // corpus with a zero vector: cosine(q, 0) = 0/0 = NaN — the window's
    // NaN-largest ordering would rank it first while the heap's primitive
    // compare would never insert it into a full heap; the operator must
    // exclude it from BOTH passes instead
    val corpus = ((0 until 6).map { i =>
      val r = new scala.util.Random(i * 7L + 1)
      (i.toLong, Array.fill(4)(r.nextGaussian().toFloat))
    } :+ ((99L, Array.fill(4)(0f)))).toDF("vec_id", "embedding")
    val queries = corpus.filter(F.col("vec_id") === 0L)
    val out = KnnJoinOp(graft.core.StageContext(spark, Seq(
      "q" -> queries, "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 7)))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.length === 6, "zero-norm corpus row excluded, all others ranked")
    assert(!out.exists(_._1 == 99L) && out.forall(p => !p._2.isNaN))
    // a zero-norm QUERY likewise yields no pairs
    assert(KnnJoinOp(graft.core.StageContext(spark, Seq(
      "q" -> corpus.filter(F.col("vec_id") === 99L), "c" -> corpus),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 3)))
      .count() === 0)
    // explain of an index probe with NO index on disk: placeholder plan,
    // no jobs against the missing index, nothing created on disk
    val ghost = java.nio.file.Files.createTempDirectory("kj_ghost").toString + "/nope"
    val planned = KnnJoinOp(graft.core.StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 3,
      "index_path" -> ghost, "_explain_only" -> true)))
    assert(planned.count() === 0)
    assert(!new java.io.File(ghost).exists(), "explain touches nothing")
    // without explain, the missing index still fails loud
    intercept[graft.core.GraftPlanError](KnnJoinOp(graft.core.StageContext.one(spark,
      queries, Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding",
        "index_path" -> ghost))))
  }

  test("bands occupancy advisory: fires past ~1000 rows/bucket with the right band_planes hint") {
    import graft.operators.IndexBuildOp
    // healthy: 1M rows over 2^16 buckets = ~15/bucket
    assert(IndexBuildOp.bandsOccupancyWarning(1000000L, 16).isEmpty)
    // boundary: exactly 1000/bucket is still healthy
    assert(IndexBuildOp.bandsOccupancyWarning(1000L * (1L << 16), 16).isEmpty)
    // degraded: 100M rows over 2^16 = ~1526/bucket — warn, and the hint
    // must be the smallest band_planes restoring <= 1000/bucket
    val w = IndexBuildOp.bandsOccupancyWarning(100000000L, 16)
    assert(w.isDefined)
    assert(w.get.contains("band_planes >= 17"), w.get)
    // 1B rows needs 2^20
    val w2 = IndexBuildOp.bandsOccupancyWarning(1000000000L, 16)
    assert(w2.get.contains("band_planes >= 20"), w2.get)
    // extreme corpus: the hint stays within the 63-bit signature width
    val w3 = IndexBuildOp.bandsOccupancyWarning(Long.MaxValue / 4, 2)
    assert(w3.get.contains("band_planes >= 52"), w3.get)
  }

  test("bands occupancy advisory is wired: a build past the threshold emits it") {
    import graft.operators.IndexBuildOp
    import graft.config.Cfg
    import graft.core.StageContext
    import spark.implicits._
    // band_planes=1 → 2 buckets per band: 2100 rows ≈ 1050/bucket > 1000
    val idx = java.nio.file.Files.createTempDirectory("graft_occ").toString
    val vecs = (1L to 2100L).map(i => (i, Array(i.toFloat, (i * 7 % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val realErr = System.err
    val captured = new java.io.ByteArrayOutputStream()
    System.setErr(new java.io.PrintStream(captured, true, "UTF-8"))
    try IndexBuildOp(StageContext.one(spark, vecs, Cfg.of(
      "type" -> "lsh", "blocking" -> "bands", "path" -> idx,
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "bands" -> 2, "band_planes" -> 1, "partition_dirs" -> 1, "seed" -> 3)))
    finally System.setErr(realErr)
    val err = captured.toString("UTF-8")
    assert(err.contains("rows/bucket"), s"advisory never emitted; stderr was: $err")
    assert(err.contains("band_planes >="), err)
    // and index.stats surfaces the same number for the maintenance loop:
    // 2100 vectors / 2^1 buckets = 1050 mean occupancy
    val occ = graft.operators.IndexStatsOp(StageContext.one(spark, vecs,
      Cfg.of("path" -> idx))).select("mean_bucket_occupancy").head()
    assert(!occ.isNullAt(0))
    assert(math.abs(occ.getDouble(0) - 1050.0) < 1e-9, occ.toString)
  }

  test("index.stats mean_bucket_occupancy is null for non-bands layouts") {
    import graft.operators.{IndexBuildOp, IndexStatsOp}
    import graft.config.Cfg
    import graft.core.StageContext
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft_occ_exact").toString
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    IndexBuildOp(StageContext.one(spark, docs, Cfg.of(
      "type" -> "exact", "path" -> idx, "columns" -> Seq("text"))))
    val occ = IndexStatsOp(StageContext.one(spark, docs, Cfg.of("path" -> idx)))
      .select("mean_bucket_occupancy").head()
    assert(occ.isNullAt(0), "occupancy is a bands-layout fact only")
  }
}
