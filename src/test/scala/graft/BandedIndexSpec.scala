package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.config.{Cfg, GraftConfigError}
import graft.core.StageContext
import graft.operators.{DedupEmbeddingOp, IndexBuildOp, IndexCompactOp, IndexStatsOp,
  KnnBruteForceOp, KnnIvfOp, KnnJoinOp, KnnLshOp}

/** index.build type=lsh blocking=bands — the banded corpus layout — and
  * its incremental probes: dedup.embedding index_path, knn.lsh, knn.join.
  * The layout composes the two flagship scale features (banded blocking ×
  * probe-don't-rescan) and adds the `ingest_tag` partition level that
  * makes dedup=embedding streamable. */
class BandedIndexSpec extends SparkSpec {
  import spark.implicits._

  // the probe scan may sit inside AdaptiveSparkPlanExec — flatten before
  // collecting FileSourceScanExec nodes (the VectorIndexSpec pattern)
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: (p.children.flatMap(flatten) ++ (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
      case _ => Seq.empty
    }))

  private def corpusScans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("corpus")) => f
    }

  // orthogonal basis vectors: pairwise cosine 0, scaled copies cosine 1.
  // Scaling (not byte-copying) defeats ExactCollapse, so every duplicate
  // must be recalled THROUGH the banded machinery itself.
  private def vec(i: Int, scale: Float = 1f): Array[Float] =
    Array.tabulate(4)(j => if (j == i) scale else 0f)

  private def corpus1 = Seq(
    (1L, vec(0), "a"), (2L, vec(1), "b"), (3L, vec(2), "c")
  ).toDF("vec_id", "embedding", "label")

  private val bandCfg = Seq[(String, Any)](
    "type" -> "lsh", "blocking" -> "bands", "vector_column" -> "embedding",
    "bands" -> 4, "band_planes" -> 4, "seed" -> 11, "partition_dirs" -> 8)

  private def buildIndex(path: String): Unit =
    IndexBuildOp(StageContext.one(spark, corpus1, Cfg.of(
      (bandCfg ++ Seq[(String, Any)]("path" -> path)): _*)))

  test("bands layout: (band, pband, ingest_tag=base) dirs + bands meta") {
    val idx = java.nio.file.Files.createTempDirectory("bl_idx").toString
    buildIndex(idx)
    val meta = spark.read.parquet(s"$idx/meta").head()
    assert(meta.getAs[Int]("bands") === 4 && meta.getAs[Int]("band_planes") === 4 &&
      meta.getAs[Long]("seed") === 11L && meta.getAs[Int]("dim") === 4 &&
      meta.getAs[Int]("pbuckets") === 8)
    val dirs = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$idx/corpus"))
      .filter(java.nio.file.Files.isDirectory(_)).map[String](_.getFileName.toString)
    import scala.jdk.CollectionConverters._
    val segs = dirs.iterator().asScala.toVector
    assert(segs.exists(_.startsWith("band=")), segs.mkString(", "))
    assert(segs.exists(_.startsWith("pband=")))
    assert(segs.contains("ingest_tag=base"))
    assert(!segs.exists(s => s.startsWith("ingest_tag=") && s != "ingest_tag=base"))
    // each row is stored once per band, exact band sig as a data column
    val rows = spark.read.option("basePath", s"$idx/corpus").parquet(s"$idx/corpus")
    assert(rows.count() === 3L * 4)
    assert(rows.columns.sorted === Array("band", "bsig", "embedding", "ingest_tag",
      "label", "pband", "vec_id"))
  }

  test("banded incremental probe: scaled copies drop, novel rows survive, in-batch dups drop") {
    val idx = java.nio.file.Files.createTempDirectory("bl_idx2").toString
    buildIndex(idx)
    val batch = Seq(
      (10L, vec(0, 2f), "x"),  // scaled copy of indexed 1 → cross-drop
      (11L, vec(3), "n"),      // novel direction → survives
      (12L, vec(3, 3f), "n2")  // in-batch scaled dup of 11 → in-batch drop
    ).toDF("vec_id", "embedding", "label")
    val got = DedupEmbeddingOp(StageContext.one(spark, batch, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "index_path" -> idx)))
      .select("vec_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(11L))
  }

  test("index_append grows the banded corpus under ingest_tag=base") {
    val idx = java.nio.file.Files.createTempDirectory("bl_idx3").toString
    buildIndex(idx)
    val batchA = Seq((20L, vec(3), "n")).toDF("vec_id", "embedding", "label")
    val keptA = DedupEmbeddingOp(StageContext.one(spark, batchA, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "index_path" -> idx, "index_append" -> true)))
    assert(keptA.count() === 1)
    val batchB = Seq(
      (30L, vec(3, 5f), "dup of 20"),
      (31L, Array(1f, 1f, 1f, 1f), "novel diagonal")
    ).toDF("vec_id", "embedding", "label")
    val keptB = DedupEmbeddingOp(StageContext.one(spark, batchB, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "index_path" -> idx)))
      .select("vec_id").as[Long].collect().sorted
    assert(keptB.toSeq === Seq(31L), "batch A's survivor must be matchable after append")
    // batch append stays under the base tag — no stray per-batch dirs
    import scala.jdk.CollectionConverters._
    val tags = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$idx/corpus"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("ingest_tag=")).toSet
    assert(tags === Set("ingest_tag=base"))
  }

  test("explicit blocking conflicting with the index layout fails loud") {
    val idx = java.nio.file.Files.createTempDirectory("bl_idx4").toString
    buildIndex(idx)
    val batch = Seq((10L, vec(0), "x")).toDF("vec_id", "embedding", "label")
    val e = intercept[GraftConfigError] {
      DedupEmbeddingOp(StageContext.one(spark, batch, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "blocking" -> "pigeonhole", "index_path" -> idx)))
    }
    assert(e.getMessage.contains("bands-partitioned"))
  }

  test("pigeonhole append onto a bands index (and vice versa) fails loud") {
    val idx = java.nio.file.Files.createTempDirectory("bl_idx5").toString
    buildIndex(idx)
    val e = intercept[GraftConfigError] {
      IndexBuildOp(StageContext.one(spark, corpus1, Cfg.of(
        "type" -> "lsh", "path" -> idx, "vector_column" -> "embedding",
        "num_planes" -> 16, "blocks" -> 4, "seed" -> 11, "mode" -> "append")))
    }
    assert(e.getMessage.contains("bands-partitioned"))
    val idx2 = java.nio.file.Files.createTempDirectory("bl_idx6").toString
    IndexBuildOp(StageContext.one(spark, corpus1, Cfg.of(
      "type" -> "lsh", "path" -> idx2, "vector_column" -> "embedding",
      "num_planes" -> 16, "blocks" -> 4, "seed" -> 11)))
    val e2 = intercept[GraftConfigError] {
      IndexBuildOp(StageContext.one(spark, corpus1, Cfg.of(
        (bandCfg ++ Seq[(String, Any)]("path" -> idx2, "mode" -> "append")): _*)))
    }
    assert(e2.getMessage.contains("pigeonhole"))
  }

  test("knn.lsh probes a bands index with partition pruning; full widen matches brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("bl_knn").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "lsh", "blocking" -> "bands", "path" -> idx,
      "vector_column" -> "embedding", "bands" -> 8, "band_planes" -> 4,
      "seed" -> 11, "partition_dirs" -> 8)))
    val probe = KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> 10, "index_path" -> idx)))
    val scans = corpusScans(probe)
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "bands probe must prune (band, pband) partitions")
    // the query vector itself always collides with its own band sigs
    val top = probe.collect().head
    assert(top.getLong(0) === 0L && top.getDouble(1) === 1.0)
    // probe_hamming = band_planes covers every bucket of every band ≡ brute force
    val exhaustive = KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> 10, "index_path" -> idx, "probe_hamming" -> 4)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = KnnBruteForceOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> 10))).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(exhaustive === brute)
  }

  test("knn.join bands probe at probe_hamming = band_planes equals batch brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("bl_kj").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "lsh", "blocking" -> "bands", "path" -> idx,
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "bands" -> 8, "band_planes" -> 4, "seed" -> 11, "partition_dirs" -> 8)))
    val queries = emb.filter(F.col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val brute = rows(KnnJoinOp(StageContext(spark, Seq("q" -> queries, "c" -> emb),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5))))
    val banded = rows(KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx, "probe_hamming" -> 4))))
    assert(banded === brute)
    // the default pruned probe still finds each query itself at rank 1
    val pruned = KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx)))
    val selfTop = pruned.filter(F.col("rank") === 1)
      .select("query_id", "corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(selfTop.length === 5 && selfTop.forall(t => t._1 === t._2 && t._3 === 1.0))
  }

  test("probe_bands bounds the bands scan: near-exact hits survive j=1, static band filter, rejections") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("bl_pb").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "lsh", "blocking" -> "bands", "path" -> idx,
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "bands" -> 8, "band_planes" -> 4, "seed" -> 11, "partition_dirs" -> 8)))
    val queries = emb.filter(F.col("vec_id") < 5)
    // j = 1: an exact match collides in EVERY band, so each query still
    // finds itself at rank 1 through 1/8 of the amplified corpus
    val j1 = KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx, "probe_bands" -> 1)))
    val selfTop = j1.filter(F.col("rank") === 1)
      .select("query_id", "corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(selfTop.length === 5 && selfTop.forall(t => t._1 === t._2 && t._3 === 1.0))
    // the corpus-side bound is STATIC partition pruning on band < j
    val scans = corpusScans(j1)
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.exists(
      _.toString.contains("band"))), "probe_bands must prune band partitions statically")
    // j = bands ≡ the full probe (the exhaustive-parity gate's shape)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val full = rows(KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx, "probe_hamming" -> 4))))
    val fullJ = rows(KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx, "probe_hamming" -> 4, "probe_bands" -> 8))))
    assert(fullJ === full)
    // knn.lsh: same knob, same j=1 self-hit property
    val lsh1 = KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> 10, "index_path" -> idx, "probe_bands" -> 1))).collect().head
    assert(lsh1.getLong(0) === 0L && lsh1.getDouble(1) === 1.0)
    // out-of-range and wrong-layout uses fail loud
    intercept[GraftConfigError](KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx, "probe_bands" -> 9))))
    intercept[GraftConfigError](KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> 10, "probe_bands" -> 2))))
  }

  test("knn.join ivf probe: nprobe=nlist equals brute force; nprobe<nlist prunes partitions") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("bl_kj_ivf").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivf", "path" -> idx, "vector_column" -> "embedding",
      "nlist" -> 8, "seed" -> 11)))
    val queries = emb.filter(F.col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val brute = rows(KnnJoinOp(StageContext(spark, Seq("q" -> queries, "c" -> emb),
      Cfg.of("id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5))))
    val ivf = rows(KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx, "nprobe" -> 8))))
    assert(ivf === brute)
    val prunedProbe = KnnJoinOp(StageContext.one(spark, queries, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> 5,
      "index_path" -> idx, "nprobe" -> 2)))
    val scans = corpusScans(prunedProbe)
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "ivf probe must carry a cell partition filter")
    val selfTop = prunedProbe.filter(F.col("rank") === 1)
      .select("query_id", "corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(selfTop.length === 5 && selfTop.forall(t => t._1 === t._2 && t._3 === 1.0))
  }

  test("ivf mode=append: frozen quantizer, probe sees the union, rejections loud") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("bl_ivfap").toString
    IndexBuildOp(StageContext.one(spark, emb.filter(F.col("vec_id") % 2 === 0), Cfg.of(
      "type" -> "ivf", "path" -> idx, "vector_column" -> "embedding",
      "nlist" -> 8, "seed" -> 11)))
    val centsBefore = spark.read.parquet(s"$idx/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    IndexBuildOp(StageContext.one(spark, emb.filter(F.col("vec_id") % 2 =!= 0), Cfg.of(
      "type" -> "ivf", "path" -> idx, "vector_column" -> "embedding",
      "mode" -> "append")))
    // the quantizer is FROZEN: same centroid set, no duplicate cell ids
    val centsAfter = spark.read.parquet(s"$idx/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(centsAfter === centsBefore)
    // corpus holds every row exactly once
    assert(spark.read.parquet(s"$idx/corpus").count() === emb.count())
    // exhaustive probe over the grown index ≡ brute force over the union
    val viaIndex = KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> 10, "nprobe" -> 8, "index_path" -> idx)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = KnnBruteForceOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> 0, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> 10))).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaIndex === brute)
    // append without an existing index / with a mismatched dim fails loud
    intercept[GraftConfigError](IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivf", "path" -> (idx + "_missing"), "vector_column" -> "embedding",
      "mode" -> "append"))))
    import spark.implicits._
    intercept[GraftConfigError](IndexBuildOp(StageContext.one(spark,
      Seq((1L, Array(1f, 2f))).toDF("vec_id", "embedding"), Cfg.of(
        "type" -> "ivf", "path" -> idx, "vector_column" -> "embedding",
        "mode" -> "append"))))
  }

  test("index.compact folds ingest tags into base; probe results identical") {
    val idx = java.nio.file.Files.createTempDirectory("bl_cmp").toString
    buildIndex(idx)
    // grow with a batch append, then compact
    val batchA = Seq((20L, vec(3), "n")).toDF("vec_id", "embedding", "label")
    DedupEmbeddingOp(StageContext.one(spark, batchA, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "index_path" -> idx, "index_append" -> true))).count()
    val batchB = Seq(
      (30L, vec(3, 5f), "dup"), (31L, Array(1f, 1f, 1f, 1f), "novel")
    ).toDF("vec_id", "embedding", "label")
    def probe() = DedupEmbeddingOp(StageContext.one(spark, batchB, Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "index_path" -> idx)))
      .select("vec_id").as[Long].collect().sorted.toSeq
    val before = probe()
    IndexCompactOp(StageContext.one(spark, corpus1, Cfg.of("path" -> idx)))
    assert(probe() === before)
    val stats = IndexStatsOp(StageContext.one(spark, corpus1, Cfg.of("path" -> idx))).head()
    assert(stats.getAs[String]("index_type") === "lsh")
  }
}
