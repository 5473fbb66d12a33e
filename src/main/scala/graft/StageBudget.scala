package graft

import org.apache.spark.sql.SparkSession

/** Per-stage wall-clock budget of a TOML pipeline: evaluates every stage's
  * composed plan in topological order (cache cleared between runs, so each
  * number is the stage's FULL prefix cost) and prints cumulative + delta.
  * The delta column is approximate — Catalyst may optimize a prefix
  * differently inside a longer plan — but it localizes which stage owns
  * the wall-clock of a composed pipeline.
  *
  * Run: `sbt "runMain graft.StageBudget <pipeline.toml> [sfDirFrom sfDirTo]"`
  */
object StageBudget {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val toml0 = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val toml = if (args.length > 2) toml0.replace(args(1), args(2)) else toml0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pc = graft.config.PipelineConfig.fromString(toml)
    val compiler = new graft.core.DagCompiler(graft.core.Registry.forPipeline(pc))
    var prev = 0.0
    println(f"${"stage"}%-22s ${"full-prefix s"}%13s ${"delta s"}%8s")
    pc.stages.foreach { st =>
      val kind = graft.core.Registry.forPipeline(pc).resolve(st.function).kind
      if (kind != graft.core.StageKind.Sink) {
        spark.catalog.clearCache()
        // recompile per stage: caches from the previous stage's run must
        // not subsidize this one (each row = cold full-prefix cost)
        val plans = compiler.compilePlans(spark, pc)
        val t0 = System.nanoTime()
        plans(st.id).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"${st.id}%-22s $dt%13.2f ${dt - prev}%8.2f")
        prev = dt
      }
    }
    spark.stop()
  }
}
