package graft.operators

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.config._
import graft.core._

/** topk.approx — bounded-memory heavy hitters: the k most frequent values
  * of a column (or of its whitespace tokens with `tokenize = true`) via a
  * per-partition Misra-Gries summary (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS'12). The corpus-analysis
  * staple — top domains, top tokens, boilerplate strings — without paying
  * for a full groupBy of an unbounded key space.
  *
  * Scale shape: one pass per partition keeps at most `capacity` counters
  * in a single JVM map — the raw stream never shuffles, and with
  * `tokenize = true` the exploded (doc × token) frame never EXISTS
  * anywhere; only the per-partition summaries (≤ capacity narrow
  * (value, count) rows each) shuffle into one small merge aggregation.
  * A 100 TB corpus with 32k partitions moves ≤ 32k × capacity summary
  * rows — megabytes — where groupBy+orderBy would shuffle the full
  * token stream.
  *
  * Error contract (classical MG bound, documented in the output): each
  * reported count UNDERESTIMATES the true count by at most
  * floor(N / capacity) summed across partitions (N = total values
  * scanned); `count_max` = count + floor(N / capacity) is a guaranteed
  * upper bound, and any value whose true count exceeds N / capacity is
  * guaranteed to be reported. When every partition holds fewer than
  * `capacity` distinct values the summary never evicts and the counts
  * are EXACT — the configuration the correctness gate pins against the
  * SQL oracle.
  *
  * Config: `column` = "text", `k` = 100, `capacity` = max(10 × k, 1000),
  * `tokenize` = false (lowercase + whitespace-split each value first,
  * byte-identical to text.tokens' ws_tokens tokenization).
  * Output: k rows (term, count, count_max), count descending, ties by
  * term ascending — deterministic for a fixed input.
  *
  * `output = "summary"` emits the mergeable summary itself instead of the
  * top-k — (term, count, capacity) counter rows plus one null-term marker
  * row carrying the frame's scanned-value total N — for INCREMENTAL
  * corpus monitoring: sketch each ingestion batch once, persist the
  * summaries (parquet.write), and `topk.merge` combines any number of
  * them into a global top-k without ever rescanning old batches. Merging
  * summed counters preserves the MG contract (Agarwal PODS'12): the
  * merged undercount is ≤ floor(ΣN / capacity), the same bound formula.
  */
object TopKOp extends Stage {
  val name = "topk.approx"
  val kind = StageKind.Transform

  private[operators] val SketchSchema = StructType(Seq(
    StructField("__t", StringType, nullable = true),
    StructField("__c", LongType, nullable = false)))

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val col = cfg.strOr("column", "text")
    val k = cfg.longOr("k", 100L).toInt
    val capacity = cfg.longOr("capacity", math.max(10L * k, 1000L)).toInt
    val tokenize = cfg.boolOr("tokenize", false)
    val output = cfg.strOr("output", "topk") match {
      case ok @ ("topk" | "summary") => ok
      case other => throw new GraftConfigError(
        s"topk.approx: output must be topk|summary, got '$other'")
    }
    if (k < 1) throw new GraftConfigError(s"topk.approx: k must be >= 1, got $k")
    if (capacity < k) throw new GraftConfigError(
      s"topk.approx: capacity ($capacity) must be >= k ($k)")
    if (!df.columns.contains(col))
      throw new GraftPlanError(s"topk.approx: column '$col' not found")

    // Per-partition Misra-Gries: admit while under capacity; when full and
    // the value is untracked, decrement every counter (dropping zeros) —
    // the classical "cancel capacity+1 distinct occurrences" step that
    // bounds the undercount by N_p/capacity. A null-term row carries the
    // partition's processed-value count N_p out for the global bound.
    val values = df.select(F.col(col).cast("string"))
    val sketches = values.mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long](capacity * 2)
      var n = 0L
      def offer(v: String): Unit = {
        n += 1
        val cur = counts.get(v)
        if (cur != 0L || counts.containsKey(v)) counts.put(v, cur + 1L)
        else if (counts.size < capacity) counts.put(v, 1L)
        else {
          val iter = counts.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      it.foreach { r =>
        val s = r.getString(0)
        if (s != null) {
          if (!tokenize) offer(s)
          // skip empty tokens: an empty/whitespace-only doc splits to [""]
          // and a cleaned corpus full of them would surface "" as a
          // heavy hitter (TextCleaning's tokenizers filter the same way)
          else s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
            .foreach(t => if (t.nonEmpty) offer(t))
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[Row](Row(null, n))
      counts.forEach((t, c) => out += Row(t, c))
      out.iterator
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(SketchSchema))

    // the sketch frame feeds two branches (counters + the N marker):
    // pin it or the raw-stream pass runs twice — bounded cache,
    // ≤ partitions × (capacity + 1) narrow rows
    val pinned = ctx.pin(sketches.toDF())

    output match {
      case "summary" =>
        // mergeable form, tagged with the capacity so topk.merge can
        // reject mismatched sketches
        val counters = pinned.filter(F.col("__t").isNotNull)
          .groupBy("__t").agg(F.sum("__c").as("count"))
          .select(F.col("__t").as("term"), F.col("count"))
        val marker = pinned.filter(F.col("__t").isNull)
          .agg(F.coalesce(F.sum("__c"), F.lit(0L)).as("count"))
          .select(F.lit(null).cast("string").as("term"), F.col("count"))
        // merge-compress (Agarwal PODS'12): the per-partition union can
        // hold up to partitions × capacity distinct terms — subtract the
        // (capacity+1)-th largest merged count and drop non-positives, so
        // the persisted summary is ≤ capacity rows and the per-term
        // undercount stays inside the N/capacity budget the marker row
        // carries (MG's bound is N/(capacity+1); ours is the looser
        // floor(N/capacity), so count_max remains a true upper bound).
        // One bounded eager job (top capacity+1 counts); skipped under
        // CLI explain — the uncompressed summary is equally valid.
        val kth =
          if (cfg.boolOr("_explain_only", false)) 0L
          else {
            val top = counters.orderBy(F.col("count").desc).limit(capacity + 1)
              .select("count").collect()
            if (top.length <= capacity) 0L else top.map(_.getLong(0)).min
          }
        val compressed =
          if (kth == 0L) counters
          else counters.select(F.col("term"), (F.col("count") - kth).as("count"))
            .filter(F.col("count") > 0)
        compressed.unionByName(marker)
          .withColumn("capacity", F.lit(capacity.toLong))
      case _ => TopKMerge.finish(pinned.withColumnRenamed("__t", "term")
          .withColumnRenamed("__c", "count"), k, capacity)
    }
  }
}

private[operators] object TopKMerge {
  /** (term, count) rows with null-term N markers → deterministic top-k
    * with the MG bound column. Shared by topk.approx and topk.merge. */
  def finish(sketch: DataFrame, k: Int, capacity: Int): DataFrame = {
    val totals = sketch.filter(F.col("term").isNull)
      .agg(F.coalesce(F.sum("count"), F.lit(0L)).as("__n"))
    val merged = sketch.filter(F.col("term").isNotNull)
      .groupBy("term").agg(F.sum("count").as("count"))
    merged
      .crossJoin(F.broadcast(totals))
      .select(F.col("term"), F.col("count"),
        (F.col("count") + F.floor(F.col("__n") / F.lit(capacity.toLong))).cast("long").as("count_max"))
      .orderBy(F.col("count").desc, F.col("term").asc)
      .limit(k)
  }
}

/** topk.merge — combine persisted topk.approx `output = "summary"` frames
  * (any number of inputs, or one frame holding several batches' rows
  * unioned/appended in one parquet dir) into the global top-k. Summed MG
  * counters keep the mergeable-summaries contract: undercount ≤
  * floor(ΣN / capacity). All summaries must share one capacity —
  * mismatches fail loud (the bound formula would silently lie).
  *
  * The incremental path at 100 TB: each ingestion batch is sketched ONCE
  * (its raw stream never shuffles), summaries of ≤ capacity+1 rows land
  * in cheap storage, and the corpus-lifetime vocabulary/domain audit is a
  * merge over megabytes instead of a rescan over everything.
  */
object TopKMergeOp extends Stage {
  val name = "topk.merge"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val k = cfg.longOr("k", 100L).toInt
    if (k < 1) throw new GraftConfigError(s"topk.merge: k must be >= 1, got $k")
    if (ctx.inputs.isEmpty)
      throw new GraftPlanError("topk.merge requires at least one summary input")
    val frames = ctx.inputs.map(_._2)
    frames.foreach { f =>
      val missing = Seq("term", "count", "capacity").filterNot(f.columns.contains)
      if (missing.nonEmpty) throw new GraftPlanError(
        s"topk.merge: input lacks summary columns ${missing.mkString(", ")} — " +
        "feed topk.approx output = \"summary\" frames")
    }
    // pin BEFORE the capacity check: a live (un-persisted) topk.approx
    // summary input would otherwise run its whole sketch pass once for
    // the check and again for the merged top-k — bounded cache, summary
    // rows only
    val all = ctx.pin(frames.reduce((a, b) =>
      a.select("term", "count", "capacity").unionByName(b.select("term", "count", "capacity"))))
    // one tiny eager aggregate over summary rows: uniform capacity or fail
    // loud. CLI explain stays job-free — plan with a placeholder bound.
    val capacity =
      if (cfg.boolOr("_explain_only", false)) 1
      else {
        val caps = all.select("capacity").distinct().collect().map(_.getLong(0))
        if (caps.length != 1) throw new GraftConfigError(
          s"topk.merge: summaries disagree on capacity (${caps.sorted.mkString(", ")}) — " +
          "the merged error bound is only valid for one shared capacity")
        caps.head.toInt
      }
    TopKMerge.finish(all.select("term", "count"), k, capacity)
  }
}
