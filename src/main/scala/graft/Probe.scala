package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing probe: `runMain graft.Probe <query> <sfDir> [reps]`.
  * Same session config and evaluation as Bench (noop write, warm-up at
  * sf0.001, cache cleared between reps) but isolates one query so its
  * scaling can be measured without cross-query interference.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ev(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val fn = SparkEntry.queries(name)
    try ev(fn(spark, "/root/testdata/sf0.001").limit(8)) catch { case _: Throwable => }
    spark.catalog.clearCache()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      ev(fn(spark, dir))
      println(f"[probe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
