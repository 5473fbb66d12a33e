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
