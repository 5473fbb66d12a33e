package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.{IndexSnapshot, Pq}

/** Focused pins for the r13 optimization-round internals:
  * - IndexSnapshot.footerRows (the zero-job replacement for
  *   spark.read.parquet(...).count() on advisory paths) must agree with
  *   the count it replaced;
  * - Pq.lloyd's seeded k-means++ init must stay deterministic, respect
  *   the distinct-point clamp, and actually spread initial centers (the
  *   property the shuffle init lost and AnnRecallSpec's recall pins
  *   caught at 0.59 < 0.60).
  */
class R13OptimizationSpec extends SparkSpec {

  test("footerRows equals the Spark count of the same files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_frows").toString
    (1 to 1234).map(i => (i.toLong, s"row-$i")).toDF("id", "s")
      .repartition(7).write.mode("overwrite").parquet(dir)
    val files = IndexSnapshot.files(dir, "missing")
    assert(files.nonEmpty)
    assert(IndexSnapshot.footerRows(files) === spark.read.parquet(dir).count())
    assert(IndexSnapshot.footerRows(Nil) === 0L)
  }

  test("lloyd k-means++ init: deterministic, clamped, spread across separated domains") {
    val rnd = new scala.util.Random(7)
    // 4 well-separated clusters of 50 points each, dim 6
    val pts = (for {
      d <- 0 until 4; _ <- 0 until 50
    } yield Array.tabulate(6)(_ => d * 100.0 + rnd.nextGaussian())).toArray
    val a = Pq.lloyd(pts, 4, Pq.TrainIters, seed = 11L)
    val b = Pq.lloyd(pts, 4, Pq.TrainIters, seed = 11L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "same sample + seed => same centers")
    // each center must land in a DIFFERENT domain: k-means++ init spreads
    // proportional to squared distance, and Lloyd's keeps the partition
    val domains = a.map(c => math.round(c.sum / c.length / 100.0).toInt).toSet
    assert(domains === Set(0, 1, 2, 3),
      s"k-means++ init must spread one center per separated cluster, got $domains")
    // clamp: more centers than distinct points yields exactly the distinct set
    val dup = Array(Array(1.0, 2.0), Array(1.0, 2.0), Array(3.0, 4.0))
    assert(Pq.lloyd(dup, 8, 5, seed = 3L).length === 2)
  }
}
