package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.StageContext
import graft.operators.ZOrderOp

/** zorder.apply — result invariance + a measured row-group pruning win
  * over a linear sort, read from real parquet footers. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // 40k rows over a 200×200 grid — two independent dimensions
  private def grid = spark.range(40000).select(
    (F.col("id") % 200).alias("x"),
    (F.col("id") / 200).cast("long").alias("y"),
    F.col("id").alias("payload"))

  /** Row groups whose (x, y) min/max stats overlap the query box. */
  private def overlappingRowGroups(dir: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): (Int, Int) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    var total = 0; var overlap = 0
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        r.getFooter.getBlocks.forEach { b =>
          total += 1
          def range(col: String): (Long, Long) = {
            val c = b.getColumns.asScala.find(_.getPath.toDotString == col).get
            val s = c.getStatistics
            (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
             s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
          val (xmn, xmx) = range("x"); val (ymn, ymx) = range("y")
          if (xmx >= xLo && xmn <= xHi && ymx >= yLo && ymn <= yHi) overlap += 1
        }
      } finally r.close()
    }
    (overlap, total)
  }

  test("z-order is a pure reordering: same rows out") {
    val out = ZOrderOp(StageContext.one(spark, grid, Cfg.of(
      "columns" -> Seq("x", "y"), "bits" -> 8)))
    assert(out.count() === 40000L)
    assert(out.agg(F.sum("payload")).head().getLong(0) ===
      grid.agg(F.sum("payload")).head().getLong(0))
  }

  test("z-ordered layout prunes row groups on BOTH dimensions of a box query") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val small = Map("parquet.block.size" -> "16384", "parquet.page.size" -> "4096")

    // linear layout: sorted by x only (the best single-column clustering)
    grid.orderBy("x").coalesce(1).write
      .options(small).mode("overwrite").parquet(s"$base/linear")
    val zed = ZOrderOp(StageContext.one(spark, grid, Cfg.of(
      "columns" -> Seq("x", "y"), "bits" -> 8, "partitions" -> 1)))
    zed.coalesce(1).write.options(small).mode("overwrite").parquet(s"$base/zorder")

    // the z-curve's claim is pruning on EVERY indexed dimension. A linear
    // sort on x clusters x at least as well (its one dimension), but can
    // never prune a y-only predicate — every row group spans all of y.
    val (zy, zTot) = overlappingRowGroups(s"$base/zorder", 0, 199, 40, 60)
    val (ly, lTot) = overlappingRowGroups(s"$base/linear", 0, 199, 40, 60)
    info(s"row groups overlapping y-range: z-order $zy/$zTot, linear $ly/$lTot")
    assert(zTot > 10 && lTot > 10, "need multiple row groups for the comparison")
    assert(ly === lTot, "linear-by-x cannot prune a y-only predicate")
    assert(zy.toDouble / zTot < 0.8, s"z-order must prune y-only: $zy/$zTot")
    // and the x dimension still prunes too (box query skips groups)
    val (zb, _) = overlappingRowGroups(s"$base/zorder", 40, 60, 40, 60)
    info(s"row groups overlapping 10%x10% box: z-order $zb/$zTot")
    assert(zb < zTot / 2, s"box query should skip most groups: $zb/$zTot")
    // and the data must round-trip
    val backZ = spark.read.parquet(s"$base/zorder")
      .filter(F.col("x").between(40, 60) && F.col("y").between(40, 60)).count()
    val backL = spark.read.parquet(s"$base/linear")
      .filter(F.col("x").between(40, 60) && F.col("y").between(40, 60)).count()
    assert(backZ === backL)
  }

  test("quantile bucketing keeps pruning selective under heavy skew") {
    // power-law x: ~97% of values land in [0, 40) but the range runs to
    // ~524k, so width-bucketing with 8 bits puts almost every row in
    // bucket 0 and the x dimension stops contributing to the Morton code.
    val skewed = spark.range(40000).select(
      F.pow(F.lit(2.0), (F.col("id") % 20).cast("double") - 1).cast("long").alias("x"),
      (F.col("id") / 200).cast("long").alias("y"),
      F.col("id").alias("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_skew").toString
    val small = Map("parquet.block.size" -> "16384", "parquet.page.size" -> "4096")
    def layout(mode: String, dir: String): Unit =
      ZOrderOp(StageContext.one(spark, skewed, Cfg.of(
        "columns" -> Seq("x", "y"), "bits" -> 8, "partitions" -> 1,
        "bucketing" -> mode)))
        .coalesce(1).write.options(small).mode("overwrite").parquet(s"$base/$dir")
    layout("width", "width")
    layout("quantile", "quantile")

    // hot-range query on the skewed dimension: x in [0, 8) holds ~4/20 of
    // the data; equal-population buckets separate it, width buckets don't.
    val (ww, wTot) = overlappingRowGroups(s"$base/width", 0, 7, 0, 199)
    val (qq, qTot) = overlappingRowGroups(s"$base/quantile", 0, 7, 0, 199)
    info(s"row groups overlapping hot x-range: width $ww/$wTot, quantile $qq/$qTot")
    assert(wTot > 10 && qTot > 10, "need multiple row groups for the comparison")
    assert(qq.toDouble / qTot < ww.toDouble / wTot,
      s"quantile mode must prune the skewed dimension better: $qq/$qTot vs $ww/$wTot")
    assert(qq.toDouble / qTot < 0.6, s"quantile layout should skip the cold tail: $qq/$qTot")
    // result invariance
    assert(spark.read.parquet(s"$base/quantile").count() === 40000L)
    assert(spark.read.parquet(s"$base/quantile").agg(F.sum("payload")).head().getLong(0) ===
      skewed.agg(F.sum("payload")).head().getLong(0))
  }
}
