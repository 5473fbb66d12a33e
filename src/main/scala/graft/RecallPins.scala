package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.Cfg
import graft.core.StageContext
import graft.operators.{IndexBuildOp, KnnBruteForceOp, KnnIvfOp, KnnLshOp}

/** Re-pin tool for AnnRecallSpec's measured recall thresholds.
  *
  * The spec's pins (ivf >= 0.6, ivfpq >= 0.5, lsh >= 0.45 on the sf0.001
  * embeddings; >= 0.9 on the synthetic clustered fixture) are MEASURED
  * CONSTANTS of a specific fixture generation: the sf0.001 embeddings
  * parquet is driver-generated (near-uniform random, dim 64, ~500 rows —
  * see TESTDATA.md), and achievable pruned recall is a property of that
  * data. If the test fixtures are ever regenerated (new seed, new row
  * count, new dimensionality), the spec's thresholds silently stop
  * describing the new data and a failure would read as a quantizer
  * regression when it is a fixture change.
  *
  * This main recomputes every measured number with the exact settings the
  * spec uses and prints current-vs-pinned, so re-pinning after a fixture
  * regeneration is one run:
  *
  *   sbt "runMain graft.RecallPins [sfDir]"     # default /root/testdata/sf0.001
  *
  * Reading the output: `measured` is today's exact value (every step is
  * seeded — reruns on the same fixture print the same numbers);
  * `pinned_floor` is what AnnRecallSpec currently asserts. After a fixture
  * regeneration, set each spec floor ~0.05 below the new measured value
  * (the gap absorbs nothing at fixed seeds — it is there so an intentional
  * small algorithm change does not force a re-pin — and a real quantizer
  * regression moves recall toward the probed-share floor, far below any
  * such gap). The clustered fixture is generated HERE with the same seeds
  * the spec uses, so its bar re-validates on every run regardless of the
  * parquet fixtures. */
object RecallPins {
  private val K = 10

  private def ids(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.load(spark, sfDir, "embeddings")
    val queryIds = 0L until 10L
    val exact: Map[Long, Set[Long]] = queryIds.map { q =>
      q -> ids(KnnBruteForceOp(StageContext.one(spark, emb, Cfg.of(
        "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
        "k" -> K))))
    }.toMap
    def meanRecall(probe: Long => DataFrame): Double =
      queryIds.map(q => ids(probe(q)).intersect(exact(q)).size.toDouble / K)
        .sum / queryIds.size

    def report(name: String, pinned: Double, measured: Double): Unit =
      println(f"[pins] $name%-28s measured=$measured%.3f pinned_floor=$pinned%.2f" +
        (if (measured < pinned) "  << BELOW PIN — fixture changed or regression" else ""))

    // — identical settings to AnnRecallSpec, in spec order —
    val ivfIdx = java.nio.file.Files.createTempDirectory("pins_ivf").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivf", "path" -> ivfIdx, "vector_column" -> "embedding",
      "nlist" -> 16, "seed" -> 11)))
    report("ivf nprobe=4", 0.6, meanRecall(q => KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "index_path" -> ivfIdx)))))

    val pqIdx = java.nio.file.Files.createTempDirectory("pins_pq").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> "ivfpq", "path" -> pqIdx, "vector_column" -> "embedding",
      "nlist" -> 16, "m" -> 8, "ksub" -> 16, "seed" -> 11)))
    report("ivfpq nprobe=4 rerank=4", 0.5, meanRecall(q => KnnIvfOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "rerank" -> 4, "index_path" -> pqIdx)))))

    report("lsh planes=16 blocks=4", 0.45, meanRecall(q => KnnLshOp(StageContext.one(spark, emb, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "num_planes" -> 16, "blocks" -> 4, "seed" -> 11)))))

    // clustered fixture — generated with the spec's exact seeds
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
    def cRecall(probe: Long => DataFrame) =
      queries.map(q => ids(probe(q)).intersect(exactIds(q)).size.toDouble / K)
        .sum / queries.size
    val cIvf = java.nio.file.Files.createTempDirectory("pins_clus_ivf").toString
    IndexBuildOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "ivf", "path" -> cIvf, "vector_column" -> "embedding",
      "nlist" -> 16, "seed" -> 11)))
    report("clustered ivf nprobe=4", 0.9, cRecall(q => KnnIvfOp(StageContext.one(spark, df, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "index_path" -> cIvf)))))
    val cPq = java.nio.file.Files.createTempDirectory("pins_clus_pq").toString
    IndexBuildOp(StageContext.one(spark, df, Cfg.of(
      "type" -> "ivfpq", "path" -> cPq, "vector_column" -> "embedding",
      "nlist" -> 16, "m" -> 8, "ksub" -> 32, "seed" -> 11)))
    report("clustered ivfpq nprobe=4 rerank=8", 0.9, cRecall(q => KnnIvfOp(StageContext.one(spark, df, Cfg.of(
      "query_id" -> q, "id_column" -> "vec_id", "vector_column" -> "embedding",
      "k" -> K, "nprobe" -> 4, "rerank" -> 8, "index_path" -> cPq)))))

    spark.stop()
  }
}
