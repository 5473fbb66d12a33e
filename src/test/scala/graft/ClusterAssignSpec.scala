package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.{GraftPlanError, StageContext}
import graft.operators.{ClusterAssignOp, IndexBuildOp, SampleOp}

/** cluster.assign: parity with the index's own cell partitioning, both
  * index families, null/validation behavior, and the composition it
  * exists for (cluster-balanced stratified sampling). */
class ClusterAssignSpec extends SparkSpec {

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def build(tpe: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ca_$tpe").toString
    IndexBuildOp(StageContext.one(spark, emb, Cfg.of(
      "type" -> tpe, "path" -> dir, "vector_column" -> "embedding",
      "nlist" -> 8, "m" -> 8, "ksub" -> 16, "seed" -> 11)))
    dir
  }

  test("assignment equals the index's own cell for indexed rows (ivf and ivfpq)") {
    for (tpe <- Seq("ivf", "ivfpq")) {
      val dir = build(tpe)
      val tagged = ClusterAssignOp(StageContext.one(spark, emb, Cfg.of(
        "index_path" -> dir)))
        .select(F.col("vec_id"), F.col("cluster"))
      val stored = spark.read.parquet(s"$dir/corpus")
        .select(F.col("vec_id"), F.col("cell"))
      val mismatches = tagged.join(stored, Seq("vec_id"))
        .filter(F.col("cluster") =!= F.col("cell")).count()
      assert(mismatches === 0L, s"$tpe: tags must equal the stored cells")
      assert(tagged.count() === emb.count())
    }
  }

  test("null vectors tag null; dim mismatch and collisions fail loud") {
    import spark.implicits._
    val dir = build("ivf")
    val withNull = Seq((1L, Seq(0.1f, 0.2f)), (2L, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    val e = intercept[GraftConfigError] {
      ClusterAssignOp(StageContext.one(spark, withNull, Cfg.of("index_path" -> dir)))
    }
    assert(e.getMessage.contains("length 2"))
    val dim64 = emb.limit(4).withColumn("embedding",
      F.when(F.col("vec_id") === 0, F.lit(null).cast("array<float>"))
        .otherwise(F.col("embedding")))
    val tags = ClusterAssignOp(StageContext.one(spark, dim64, Cfg.of(
      "index_path" -> dir))).collect()
      .map(r => (r.getLong(0), r.isNullAt(r.fieldIndex("cluster")))).toMap
    assert(tags(0L) === true && tags.count(!_._2) === 3)
    intercept[GraftConfigError] {
      ClusterAssignOp(StageContext.one(spark,
        emb.withColumn("cluster", F.lit(1)), Cfg.of("index_path" -> dir)))
    }
    intercept[GraftPlanError] {
      ClusterAssignOp(StageContext.one(spark, emb, Cfg.of(
        "index_path" -> "/tmp/graft_ca_nowhere")))
    }
  }

  // ---- dedup.embedding blocking=ivf (SemDeDup-style cluster blocking;
  // lives here because the quantizer/cell machinery is cluster.assign's) --

  test("dedup blocking=ivf at nlist=1 is exhaustive: every scaled copy drops") {
    val copies = emb.withColumn("vec_id", F.col("vec_id") + 10000)
      .withColumn("embedding", F.transform(F.col("embedding"), x => x * F.lit(2.0f)))
    val out = graft.operators.DedupEmbeddingOp(StageContext.one(spark,
      emb.unionByName(copies), Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "blocking" -> "ivf", "nlist" -> 1, "seed" -> 11)))
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === emb.collect().map(_.getLong(0)).toSet,
      "all 10000+ copies drop, every original survives")
  }

  test("dedup blocking=ivf with a shared quantizer_path drops same-cell near-copies") {
    val dir = build("ivf")
    // ×1.001 scaling: cosine exactly 1 (drops under the threshold rule),
    // euclidean displacement tiny → same cell as the original for every
    // interior point; the prebuilt quantizer keeps cells identical to
    // cluster.assign's tags
    val copies = emb.withColumn("vec_id", F.col("vec_id") + 10000)
      .withColumn("embedding", F.transform(F.col("embedding"), x => x * F.lit(1.001f)))
    val out = graft.operators.DedupEmbeddingOp(StageContext.one(spark,
      emb.unionByName(copies), Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "threshold" -> 0.95, "blocking" -> "ivf", "quantizer_path" -> dir)))
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.count(_ >= 10000) === 0, s"copies surviving: ${ids.count(_ >= 10000)}")
    assert(ids.size === emb.count())
  }

  test("join.similar blocking=ivf with a shared quantizer finds near-copies (semi)") {
    val dir = build("ivf")
    val copies = emb.filter(F.col("vec_id") < 100)
      .withColumn("vec_id", F.col("vec_id") + 100000)
      .withColumn("embedding", F.transform(F.col("embedding"), x => x * F.lit(1.001f)))
    val out = graft.operators.SimilarJoinOp(StageContext(spark,
      Seq("l" -> emb, "r" -> copies), Cfg.of(
      "id_column" -> "vec_id", "vector_column" -> "embedding",
      "method" -> "embedding", "threshold" -> 0.99,
      "blocking" -> "ivf", "quantizer_path" -> dir, "mode" -> "semi")))
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 100L).toSet,
      s"exactly the copied originals match; got ${ids.size} ids")
  }

  test("dedup blocking=ivf validation: bad nlist, missing quantizer, bad blocking") {
    intercept[GraftConfigError] {
      graft.operators.DedupEmbeddingOp(StageContext.one(spark, emb, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "blocking" -> "ivf", "nlist" -> 0)))
    }
    intercept[GraftPlanError] {
      graft.operators.DedupEmbeddingOp(StageContext.one(spark, emb, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "blocking" -> "ivf", "quantizer_path" -> "/tmp/graft_noidx_here")))
    }
    val e = intercept[GraftConfigError] {
      graft.operators.DedupEmbeddingOp(StageContext.one(spark, emb, Cfg.of(
        "id_column" -> "vec_id", "vector_column" -> "embedding",
        "blocking" -> "kmeans")))
    }
    assert(e.getMessage.contains("pigeonhole|bands|ivf"))
  }

  test("composes with stratified sampling: exactly k rows per cluster") {
    val dir = build("ivf")
    val tagged = ClusterAssignOp(StageContext.one(spark, emb, Cfg.of(
      "index_path" -> dir)))
    val sampled = SampleOp(StageContext.one(spark, tagged, Cfg.of(
      "by" -> "cluster", "default_count" -> 5)))
    val perCluster = sampled.groupBy("cluster").count().collect()
      .map(r => r.getLong(1))
    // every populated cluster contributes min(5, its size) rows
    val sizes = tagged.groupBy("cluster").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(perCluster.nonEmpty)
    sampled.groupBy("cluster").count().collect().foreach { r =>
      val want = math.min(5L, sizes(r.getInt(0)))
      assert(r.getLong(1) === want, s"cluster ${r.getInt(0)}")
    }
  }
}
