package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Every SparkEntry query is fully evaluated (noop-format write: all rows
  * and columns materialize through the whole plan — count() would let
  * Catalyst prune the plan to nothing).
  *
  * Methodology: each query first runs ONCE against the smallest SF with a
  * limit(8) — that compiles the plan, populates the whole-stage-codegen
  * class cache, and initializes UDF/HttpClient state — then the measured
  * run executes TWICE at the target SF and reports the MIN. The JSON
  * therefore reports steady-state throughput (how a resident engine
  * executes repeated pipelines), not first-invocation Janino compile
  * latency, which at local test scale would otherwise be 2-4x the actual
  * query cost and identical for every engine.
  *
  * Interference control (round-1 lesson: two trivial get_json_object
  * queries read 11-13 s in the driver's 79-query run vs 0.3 s isolated):
  *  - System.gc() BETWEEN queries, outside every timed window, so heap
  *    debt accumulated by query N can't surface as a collection pause
  *    inside query N+1's measurement;
  *  - min-of-2 discards one-off bursts (machine contention, async
  *    cleaner activity) that land in a single rep;
  *  - per-query GC-pause deltas go to stderr as [bench-gc] lines so an
  *    inflated number can be attributed from the driver log alone.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def evalFully(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: JVM + codegen + parquet footer caches
    try evalFully(Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count()) catch { case _: Throwable => }

    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis: Long = {
      var t = 0L; gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime)); t
    }

    // probe knobs (driver runs use the defaults): SPARK_GRAFT_BENCH_ONLY =
    // comma-separated query names, SPARK_GRAFT_BENCH_REPS = rep count —
    // for attributing a single query's run-to-run variance without paying
    // for the whole suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val repCount = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // plan-shape warm-up at the smallest SF; limit(8) keeps per-row
      // stages (mock-latency enrichment) from doing real work
      try evalFully(fn(spark, warmDir).limit(8)) catch { case _: Throwable => }
      val reps = (1 to repCount).map { _ =>
        // operators that persist() intermediates (dedup families) hold
        // their cache through the returned plan; drop it, then collect the
        // previous query's heap debt OUTSIDE the timed window
        spark.catalog.clearCache()
        System.gc()
        graft.queries.BenchPhases.reset()
        val gc0 = gcMillis
        val t0 = System.nanoTime()
        try evalFully(fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        ((System.nanoTime() - t0) / 1e9, (gcMillis - gc0) / 1e3,
          graft.queries.BenchPhases.snapshot)
      }
      spark.catalog.clearCache()
      val best = reps.minBy(_._1)
      System.err.println(f"[bench-gc] $name reps=${reps.map(r => f"${r._1}%.2f").mkString(",")} gc=${reps.map(r => f"${r._2}%.2f").mkString(",")}")
      (name, best._1, best._3)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // per-phase attribution for gates that record internal phases (the
    // heavyweight lifecycle gates): the min-rep's phase splits, plus the
    // un-attributed remainder (the lazy plan the noop write materializes —
    // for the streaming gates, the full-corpus oracle-parity side) as
    // `materialize`. This is what lets a driver-run drift be attributed
    // without a worktree bisect (r9-r10 stream_ingest_parity ±28%).
    val phases = results.filter(_._3.nonEmpty).map { case (k, v, ph) =>
      val rest = math.max(0.0, v - ph.values.sum)
      val inner = (ph.toSeq.sortBy(_._1) :+ ("materialize" -> rest))
        .map { case (p, sec) => "\"" + p + "\":" + f"$sec%.3f" }.mkString("{", ",", "}")
      "\"" + k + "\":" + inner
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // stdout carries ONLY the driver-contract fields (metric/value/unit/
    // queries/sf): r12's line carried `phases` too and exceeded the
    // driver's tail capture, which cost the round-over-round comparison
    // (PERF_r13 prev_bench_ok=false). The phase attribution still lands in
    // bench_full.json below — same data, off the size-bounded channel.
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    val fullLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"phases":$phases,"sf":"$sfDir"}"""
    // the driver's captured stdout truncates on long runs (BENCH_r05/r06
    // both lost the a–l half of the per-query map) — also land the full
    // sorted line (with phases) in a repo file so rounds diff 100% of queries
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json")),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write bench_full.json: ${e.getMessage}") }
    spark.stop()
  }
}
