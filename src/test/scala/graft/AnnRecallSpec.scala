package graft

import org.apache.spark.sql.DataFrame
import graft.config.Cfg
import graft.core.StageContext
import graft.operators.{IndexBuildOp, KnnBruteForceOp, KnnIvfOp, KnnLshOp}

/** Recall@k of the PRUNED ANN probes against the exhaustive answer. The
  * pruned gates (knn_ivf, knn_ivfpq, knn_lsh) are rows-only — no offline
  * SQL oracle can restate a result that depends on the engine's seeded
  * quantizer — but recall vs the engine's own brute force at a fixed seed
  * IS pinnable, and it is the only signal that would catch a
  * quantizer-quality regression: the exhaustive-parity gates run at
  * nprobe = nlist where quantizer quality is irrelevant.
  *
  * Two fixtures, because achievable recall is a property of the DATA:
  * the sf0.001 embeddings are near-uniform random in dim 64, where a
  * query's true top-10 scatters across cells and recall at nprobe=4/16
  * tops out in the 0.5-0.65 band (measured; every step is seeded, so
  * the value is exact, and the thresholds sit just below it — any real
  * quantizer/codebook regression moves them toward the ~0.25-0.3
  * probed-share floor, cf. the measured nprobe=1 recall of 0.35). On a
  * CLUSTERED corpus — the distribution ANN indexes exist for — the same
  * settings must clear the conventional >= 0.9 bar, and that is pinned
  * too. Mean over 10 query ids, at each gate's own pruning settings.
  *
  * PROVENANCE: every floor here is a measured constant of the CURRENT
  * test-fixture generation (0.64 / 0.57 / 0.51 on today's sf0.001
  * embeddings; ~1.0 clustered). If the fixtures are regenerated these
  * floors silently describe the wrong data and a failure here would read
  * as a quantizer regression — run `sbt "runMain graft.RecallPins"` (the
  * re-pin tool, same settings single-sourced in its scaladoc) and reset
  * each floor ~0.05 below the freshly measured value. */
class AnnRecallSpec extends SparkSpec {

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private val K = 10
  private val QueryIds = 0L until 10L

  private def ids(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  private lazy val exact: Map[Long, Set[Long]] = QueryIds.map { q =>
    q -> ids(KnnBruteForceOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K))))
  }.toMap

  private def meanRecall(probe: Long => DataFrame): Double =
    QueryIds.map(q => ids(probe(q)).intersect(exact(q)).size.toDouble / K)
      .sum / QueryIds.size

  test("knn.ivf pruned probe (nprobe=4/16) holds recall@10 on random data") {
    val idx = java.nio.file.Files.createTempDirectory("graft_recall_ivf").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivf", "path" -> idx, "vector_column" -> "embedding",
      "nlist" -> 16, "seed" -> 11)))
    val r = meanRecall(q => KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "index_path" -> idx))))
    info(f"knn.ivf recall@10 at nprobe=4: $r%.3f")
    assert(r >= 0.6, f"ivf recall@10 degraded to $r%.3f — quantizer regression (0.64 measured)")
  }

  test("knn.ivfpq ADC probe (nprobe=4, rerank=4) holds recall@10 on random data") {
    val idx = java.nio.file.Files.createTempDirectory("graft_recall_pq").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivfpq", "path" -> idx, "vector_column" -> "embedding",
      "nlist" -> 16, "m" -> 8, "ksub" -> 16, "seed" -> 11)))
    val r = meanRecall(q => KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "rerank" -> 4, "index_path" -> idx))))
    info(f"knn.ivfpq recall@10 at nprobe=4 rerank=4: $r%.3f")
    assert(r >= 0.5, f"ivfpq recall@10 degraded to $r%.3f — codebook/quantizer regression (0.57 measured)")
  }

  test("knn.lsh pruned probe (gate settings) holds recall@10 on random data") {
    val r = meanRecall(q => KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "num_planes" -> 16, "blocks" -> 4, "seed" -> 11))))
    info(f"knn.lsh recall@10: $r%.3f")
    assert(r >= 0.45, f"lsh recall@10 degraded to $r%.3f — hyperplane/probe regression (0.51 measured)")
  }

  test("clustered corpus: pruned ivf and ivfpq clear the conventional recall@10 >= 0.9 bar") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 3)
    val rows = for { c <- 0 until 8; i <- 0 until 150 } yield {
      val v = Array.tabulate(16)(j => (centers(c)(j) + rnd.nextGaussian()).toFloat)
      ((c * 150 + i).toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = (0 until 8).map(c => (c * 150).toLong)
    def exactIds(q: Long) = ids(KnnBruteForceOp(StageContext.one(spark, df, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding", "k" -> K))))
    def recall(probe: Long => DataFrame) =
      queries.map(q => ids(probe(q)).intersect(exactIds(q)).size.toDouble / K)
        .sum / queries.size

    val idx = java.nio.file.Files.createTempDirectory("graft_recall_clus_ivf").toString
    IndexBuildOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "ivf", "path" -> idx, "vector_column" -> "embedding",
      "nlist" -> 16, "seed" -> 11)))
    val rIvf = recall(q => KnnIvfOp(StageContext.one(spark, df, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "index_path" -> idx))))

    val idxPq = java.nio.file.Files.createTempDirectory("graft_recall_clus_pq").toString
    IndexBuildOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "ivfpq", "path" -> idxPq, "vector_column" -> "embedding",
      "nlist" -> 16, "m" -> 8, "ksub" -> 32, "seed" -> 11)))
    // rerank scales with how flat the in-cell neighborhood is: inside one
    // cluster the cosine gaps are quantization-sized, so the ADC shortlist
    // needs headroom before the exact rerank (still pruned: 8·10 = 80
    // candidates of 1200 rows)
    val rPq = recall(q => KnnIvfOp(StageContext.one(spark, df, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "rerank" -> 8, "index_path" -> idxPq))))

    info(f"clustered recall@10 at nprobe=4: ivf $rIvf%.3f, ivfpq $rPq%.3f")
    assert(rIvf >= 0.9, f"ivf recall@10 on clustered data degraded to $rIvf%.3f")
    assert(rPq >= 0.9, f"ivfpq recall@10 on clustered data degraded to $rPq%.3f")
  }

  test("recall is monotone in nprobe and exact at nprobe = nlist") {
    val idx = java.nio.file.Files.createTempDirectory("graft_recall_mono").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivf", "path" -> idx, "vector_column" -> "embedding",
      "nlist" -> 16, "seed" -> 11)))
    def at(nprobe: Int) = meanRecall(q => KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> nprobe, "index_path" -> idx))))
    val r1 = at(1); val r4 = at(4); val r16 = at(16)
    info(f"ivf recall@10: nprobe=1 $r1%.3f, nprobe=4 $r4%.3f, nprobe=16 $r16%.3f")
    assert(r1 <= r4 + 1e-9 && r4 <= r16 + 1e-9,
      "recall must not decrease as more cells are probed")
    assert(r16 === 1.0, "nprobe = nlist probes every cell → exact")
    // the metric is SENSITIVE: nprobe=1 must measurably trail exhaustive,
    // otherwise these gates could never catch a quantizer regression
    assert(r1 < 1.0, "nprobe=1 at 16 cells should not be perfect on 500 rows")
  }
}
