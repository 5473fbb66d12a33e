package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named gates to files — the r13
  * optimization-round evidence artifact (`plans/r13/<query>_{before,after}.txt`).
  *
  * Usage: sbt "runMain graft.PlansDump <outDir> <suffix> <gate> [gate ...]"
  * e.g.   sbt "runMain graft.PlansDump plans/r13 after dedup_minhash knn_ivf"
  *
  * Each gate's query runs once against sf0.001 through the noop sink first
  * (index-building gates create their indexes eagerly at plan compose; the
  * noop write also materializes the AQE final plan), then the formatted
  * plan is written to `<outDir>/<gate>_<suffix>.txt`.
  */
object PlansDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlansDump <outDir> <suffix> <gate> [gate ...]")
    val outDir = args(0); val suffix = args(1); val gates = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    gates.foreach { g =>
      try {
        val df = SparkEntry.queries(g)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${g}_$suffix.txt"), plan)
        println(s"[plansdump] wrote $outDir/${g}_$suffix.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[plansdump] $g failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
