package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config._
import graft.core._

/** index.build — persist an IVF-flat vector index so ANN probes prune I/O
  * instead of scanning the corpus (round-1 review: knn.ivf re-trained its
  * quantizer inside every query — correct, but the index belongs OUTSIDE
  * the query at 100 TB).
  *
  * Layout under `path`:
  *   corpus/    the input rows + `cell` (nearest-centroid id), written
  *              `partitionBy("cell")` — a probe filtering `cell IN (...)`
  *              becomes parquet PARTITION PRUNING: nprobe/nlist of the
  *              bytes are read, visible as PartitionFilters in the scan
  *   centroids/ (cell INT, centroid ARRAY<DOUBLE>) — nlist rows, tiny;
  *              probes rank these driver-side to pick cells
  *
  * The quantizer is MLlib KMeans on a bounded sample (`max_train`), the
  * standard IVF recipe: centroid quality needs a sample, assignment is one
  * broadcast-model map pass over the full corpus. Rebuild = re-run with
  * mode=overwrite (default). Pass-through stage: returns its input, so it
  * composes mid-pipeline like table.write.
  */
object IndexBuildOp extends Stage {
  val name = "index.build"
  val kind = StageKind.Sink

  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val cfg = ctx.cfg
    val path = cfg.str("path")
    val vecCol = cfg.strOr("vector_column", "embedding")
    val nlist = cfg.longOr("nlist", 16L).toInt
    val seed = cfg.longOr("seed", 11L)
    val maxTrain = cfg.longOr("max_train", 100000L).toInt
    val mode = cfg.strOr("mode", "overwrite")

    val toVec = F.udf { v: Seq[Float] => Vectors.dense(v.map(_.toDouble).toArray) }
    val feat = ctx.primary.withColumn("_features", toVec(F.col(vecCol).cast("array<float>")))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("_features").setPredictionCol("cell")
      .fit(feat.select("_features").limit(maxTrain))

    km.transform(feat).drop("_features")
      .write.mode(mode).partitionBy("cell").parquet(s"$path/corpus")

    val spark = ctx.spark
    import spark.implicits._
    km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode(mode).parquet(s"$path/centroids")
    ctx.primary
  }
}
