package graft.queries

/** Per-gate phase timing for the heavyweight lifecycle gates (r9-r10
  * verdicts: stream_ingest_parity drifted ±28% across three driver runs
  * with no way to tell index-build cost from micro-batch cost from
  * oracle-materialization cost without a worktree bisect session).
  *
  * Gates wrap their EAGER internal steps in [[time]]; [[Bench]] resets the
  * registry before each timed rep, snapshots it after, and emits the
  * min-rep's phases into bench_full.json as a `phases` map with the
  * un-attributed remainder (the lazy plan materialized by the noop write —
  * for the streaming gates that is the full-corpus oracle-parity side) as
  * `materialize`. Recording is a ConcurrentHashMap merge per phase —
  * nanoseconds of overhead, so it stays on in Verify and specs, which
  * simply never read it.
  */
object BenchPhases {
  private val current = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def reset(): Unit = current.clear()

  def time[T](phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally current.merge(phase, (System.nanoTime() - t0) / 1e9, (a, b) => a + b)
  }

  /** Record an externally-measured duration (e.g. DagCompiler's per-stage
    * compose hook) — same cumulative merge as [[time]]. */
  def add(phase: String, sec: Double): Unit =
    current.merge(phase, sec, (a, b) => a + b)

  /** Decompose a completed stream.ingest run (`totalSec` of wall) into
    * `ingest_batch_work` (the sum of per-micro-batch durations from the
    * _metrics files the sink writes) and `ingest_stream_overhead` (the
    * rest: query start/stop, checkpointing, trigger scheduling, the lease
    * claim) — the r10 verdict's missing attribution for the two slowest
    * gates. Metrics unreadable → the whole wall lands in overhead, never
    * a throw (this is bench instrumentation, not the operator). */
  def splitStreamIngest(outPath: String, totalSec: Double): Unit = {
    val batchSec =
      try {
        val dir = s"$outPath/_metrics"
        if (!graft.core.GraftFs.isDir(dir)) 0.0
        else graft.core.GraftFs.listNames(dir)
          .filter(n => n.startsWith("batch-") && n.endsWith(".json"))
          .map { n =>
            graft.js.JsVal.parseJson(graft.core.GraftFs.readString(s"$dir/$n"))
              .asInstanceOf[graft.js.JsObj]
              .fields("duration_ms").asInstanceOf[graft.js.JsNum].d / 1000.0
          }.sum
      } catch { case _: Exception => 0.0 }
    add("ingest_batch_work", math.min(batchSec, totalSec))
    add("ingest_stream_overhead", math.max(0.0, totalSec - batchSec))
  }

  /** Phase → cumulative seconds since the last reset. */
  def snapshot: Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    current.forEach((k, v) => b += (k -> v))
    b.result()
  }
}
