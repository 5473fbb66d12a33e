package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-gate Spark-JOB audit: run one named gate (Bench semantics — warm
  * rep at sf0.001, then a timed rep at the target SF) with a listener
  * that records every job's wall time, task count, and action call site.
  *
  * Why: the expensive bench gates are LIFECYCLE gates (index build +
  * probe + append + oracle) whose sf0.1 cost is mostly per-JOB fixed
  * overhead, not data — so the lever is the NUMBER of actions an
  * operator issues, and this is the tool that shows where each action
  * comes from (`count at Dedup.scala:NNN`). Usage:
  *
  *   sbt "runMain graft.GateAudit dedup_embedding_bands_incremental [sfDir]"
  *
  * Reading the output: AQE query-stage jobs and broadcast-exchange
  * materializations run on executor-side futures, so their call site
  * surfaces as `withThreadLocalCaptured ... CompletableFuture` — that
  * bucket is "the query's own shuffle/broadcast stages" (they overlap,
  * which is why job_wall_sum can exceed total). The named-site rows are
  * the DRIVER-issued actions (eager counts/heads/writes inside
  * operators) — the ones an operator could actually shed. First finding
  * (r11): dedup_embedding_bands_incremental = 47 jobs, all but ~8 of
  * them AQE stages of the probe/build themselves; the named eager
  * actions cost <0.3 s combined — no shed-able driver action remains in
  * the dedup family at gate scale.
  */
object GateAudit {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse(
      sys.error("usage: GateAudit <gate_name> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fn = SparkEntry.queries.getOrElse(gate,
      sys.error(s"unknown gate '$gate'"))
    def evalFully(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm rep (codegen/JIT, plan shapes) at the smallest SF
    try evalFully(fn(spark, "/root/testdata/sf0.001").limit(8))
    catch { case _: Throwable => () }
    spark.catalog.clearCache(); System.gc()

    final case class Job(id: Int, start: Long, site: String, tasks: Int)
    val open = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val doneJobs = new java.util.concurrent.ConcurrentLinkedQueue[(Job, Double)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // prefer the explicit job description (operators label their
        // actions per guide §1.5) — the stage-name call site of a
        // foreachBatch job is just the stream's start() line
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .getOrElse(j.stageInfos.lastOption.map(_.name).getOrElse("?"))
        open.put(j.jobId, Job(j.jobId, System.nanoTime(),
          site, j.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val job = open.remove(j.jobId)
        if (job != null)
          doneJobs.add((job, (System.nanoTime() - job.start) / 1e9))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    evalFully(fn(spark, sfDir))
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val jobs = doneJobs.asScala.toSeq.sortBy(_._1.id)
    println(f"[audit] gate=$gate total=$total%.2f s jobs=${jobs.size} " +
      f"job_wall_sum=${jobs.map(_._2).sum}%.2f s")
    // group by call site — the actionable view
    jobs.groupBy(_._1.site).toSeq.sortBy(-_._2.map(_._2).sum).foreach {
      case (site, js) =>
        println(f"[audit]  ${js.map(_._2).sum}%6.2f s  ${js.size}%3d jobs  " +
          f"${js.map(_._1.tasks).sum}%5d tasks  $site")
    }
    spark.stop()
  }
}
