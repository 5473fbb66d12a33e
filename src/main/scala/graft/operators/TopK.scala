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
  * byte-identical to text.tokens' ws_tokens tokenization), `group_by` =
  * [] — with group keys, an independent sketch per group (per-source
  * vocabulary, per-domain boilerplate: the standard corpus-audit shape)
  * with the error bound computed from each group's OWN total; summaries
  * carry the group columns and topk.merge groups by them automatically.
  * Output: k rows per group (group…, term, count, count_max), count
  * descending, ties by term ascending — deterministic for a fixed input.
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
    val groups = cfg.strListOr("group_by", Vector.empty)
    val output = cfg.strOr("output", "topk") match {
      case ok @ ("topk" | "summary") => ok
      case other => throw new GraftConfigError(
        s"topk.approx: output must be topk|summary, got '$other'")
    }
    if (k < 1) throw new GraftConfigError(s"topk.approx: k must be >= 1, got $k")
    if (capacity < k) throw new GraftConfigError(
      s"topk.approx: capacity ($capacity) must be >= k ($k)")
    (col +: groups).foreach(c => if (!df.columns.contains(c))
      throw new GraftPlanError(s"topk.approx: column '$c' not found"))
    val reserved = Set("term", "count", "count_max", "capacity")
    groups.filter(reserved.contains).foreach(g => throw new GraftConfigError(
      s"topk.approx: group_by column '$g' collides with an output column name"))
    if (groups.contains(col)) throw new GraftConfigError(
      s"topk.approx: '$col' cannot be both the counted column and a group_by key")

    // Per-(partition, group) Misra-Gries: admit while under capacity; when
    // full and the value is untracked, decrement every counter (dropping
    // zeros) — the classical "cancel capacity+1 distinct occurrences" step
    // that bounds the undercount by N_pg/capacity. A null-term row per
    // group carries the group's processed-value count N_g out for the
    // per-group bound. Memory: (#groups seen in the partition) × capacity
    // counters — group_by is for bounded key spaces (source, domain,
    // lang); for a high-cardinality group key repartition by it first so
    // each task holds one group's sketch.
    val g = groups.length
    val values = df.select(groups.map(F.col) :+ F.col(col).cast("string"): _*)
    val sketchSchema = StructType(
      values.schema.fields.take(g) ++ SketchSchema.fields)
    val sketches = values.mapPartitions { it =>
      val perGroup = new java.util.HashMap[Vector[Any], java.util.HashMap[String, Long]]()
      val ns = new java.util.HashMap[Vector[Any], Long]()
      def offer(key: Vector[Any], v: String): Unit = {
        val counts = {
          val cur = perGroup.get(key)
          if (cur != null) cur
          else { val m = new java.util.HashMap[String, Long](); perGroup.put(key, m); m }
        }
        ns.merge(key, 1L, _ + _)
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
        val key = (0 until g).map(r.get).toVector
        val s = r.getString(g)
        if (s != null) {
          if (!tokenize) offer(key, s)
          // skip empty tokens: an empty/whitespace-only doc splits to [""]
          // and a cleaned corpus full of them would surface "" as a
          // heavy hitter (TextCleaning's tokenizers filter the same way)
          else s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
            .foreach(t => if (t.nonEmpty) offer(key, t))
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      ns.forEach((key, n) => out += Row.fromSeq(key ++ Seq(null, n)))
      perGroup.forEach((key, counts) =>
        counts.forEach((t, c) => out += Row.fromSeq(key ++ Seq(t, c))))
      out.iterator
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(sketchSchema))

    // the sketch frame feeds two branches (counters + the N marker):
    // pin it or the raw-stream pass runs twice — bounded cache,
    // ≤ partitions × groups × (capacity + 1) narrow rows
    val pinned = ctx.pin(sketches.toDF())

    output match {
      case "summary" =>
        // mergeable form, tagged with the capacity so topk.merge can
        // reject mismatched sketches
        val counters = pinned.filter(F.col("__t").isNotNull)
          .groupBy(groups.map(F.col) :+ F.col("__t"): _*).agg(F.sum("__c").as("count"))
          .select(groups.map(F.col) ++ Seq(F.col("__t").as("term"), F.col("count")): _*)
        val marker = pinned.filter(F.col("__t").isNull)
          .groupBy(groups.map(F.col): _*)
          .agg(F.coalesce(F.sum("__c"), F.lit(0L)).as("count"))
          .select(groups.map(F.col) ++
            Seq(F.lit(null).cast("string").as("term"), F.col("count")): _*)
        // merge-compress (Agarwal PODS'12): the per-partition union can
        // hold up to partitions × capacity distinct terms per group —
        // subtract the group's (capacity+1)-th largest merged count and
        // drop non-positives, so the persisted summary is ≤ capacity rows
        // per group and the per-term undercount stays inside the
        // N/capacity budget the marker row carries (MG's bound is
        // N/(capacity+1); ours is the looser floor(N/capacity), so
        // count_max remains a true upper bound). Ungrouped: one bounded
        // eager job (top capacity+1 counts), skipped under CLI explain —
        // the uncompressed summary is equally valid. Grouped: a
        // summary-rows-only window computes each group's threshold
        // (#groups is unbounded, so no driver collect).
        val compressed =
          if (groups.isEmpty) {
            val kth =
              if (cfg.boolOr("_explain_only", false)) 0L
              else {
                val top = counters.orderBy(F.col("count").desc).limit(capacity + 1)
                  .select("count").collect()
                if (top.length <= capacity) 0L else top.map(_.getLong(0)).min
              }
            if (kth == 0L) counters
            else counters.select(F.col("term"), (F.col("count") - kth).as("count"))
              .filter(F.col("count") > 0)
          } else {
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(groups.map(F.col): _*)
              .orderBy(F.col("count").desc, F.col("term").asc)
            val kth = counters.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") === capacity + 1)
              .select(groups.map(F.col) :+ F.col("count").as("__kth"): _*)
            counters.join(kth, groups, "left")
              .select(groups.map(F.col) ++ Seq(F.col("term"),
                F.when(F.col("__kth").isNull, F.col("count"))
                  .otherwise(F.col("count") - F.col("__kth")).as("count")): _*)
              .filter(F.col("count") > 0)
          }
        compressed.unionByName(marker)
          .withColumn("capacity", F.lit(capacity.toLong))
      case _ => TopKMerge.finish(pinned.withColumnRenamed("__t", "term")
          .withColumnRenamed("__c", "count"), groups, k, capacity)
    }
  }
}

private[operators] object TopKMerge {
  /** (group…, term, count) rows with null-term N markers → deterministic
    * top-k (per group when `groups` is non-empty) with the MG bound
    * column. Shared by topk.approx and topk.merge. Grouped: the bound
    * uses each group's own scanned-value total, and ranking is a window
    * over summary rows — no driver collection, any group cardinality. */
  def finish(sketch: DataFrame, groups: Seq[String], k: Int, capacity: Int): DataFrame = {
    val merged = sketch.filter(F.col("term").isNotNull)
      .groupBy(groups.map(F.col) :+ F.col("term"): _*).agg(F.sum("count").as("count"))
    if (groups.isEmpty) {
      val totals = sketch.filter(F.col("term").isNull)
        .agg(F.coalesce(F.sum("count"), F.lit(0L)).as("__n"))
      merged
        .crossJoin(F.broadcast(totals))
        .select(F.col("term"), F.col("count"),
          (F.col("count") + F.floor(F.col("__n") / F.lit(capacity.toLong))).cast("long").as("count_max"))
        .orderBy(F.col("count").desc, F.col("term").asc)
        .limit(k)
    } else {
      import org.apache.spark.sql.expressions.Window
      val totals = sketch.filter(F.col("term").isNull)
        .groupBy(groups.map(F.col): _*)
        .agg(F.coalesce(F.sum("count"), F.lit(0L)).as("__n"))
      val w = Window.partitionBy(groups.map(F.col): _*)
        .orderBy(F.col("count").desc, F.col("term").asc)
      merged.join(totals, groups)
        .select(groups.map(F.col) ++ Seq(F.col("term"), F.col("count"),
          (F.col("count") + F.floor(F.col("__n") / F.lit(capacity.toLong)))
            .cast("long").as("count_max")): _*)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k).drop("__rn")
        .orderBy(groups.map(F.col(_).asc) ++
          Seq(F.col("count").desc, F.col("term").asc): _*)
    }
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
    // any extra columns are the sketches' group_by keys — merge per group.
    // Every input must carry the same group set or the merge is undefined.
    // `ingest_batch` is stream.sketch's provenance partition column, not a
    // group key — merging across micro-batches is exactly the point.
    val nonGroup = Set("term", "count", "capacity", "ingest_batch")
    val groups = frames.head.columns.toSeq.filterNot(nonGroup.contains)
    frames.foreach { f =>
      val gs = f.columns.toSet -- nonGroup
      if (gs != groups.toSet) throw new GraftPlanError(
        s"topk.merge: summaries disagree on group columns " +
        s"(${groups.mkString(", ")} vs ${gs.toSeq.sorted.mkString(", ")})")
    }
    val cols = groups ++ Seq("term", "count", "capacity")
    // pin BEFORE the capacity check: a live (un-persisted) topk.approx
    // summary input would otherwise run its whole sketch pass once for
    // the check and again for the merged top-k — bounded cache, summary
    // rows only
    val all = ctx.pin(frames.reduce((a, b) =>
      a.select(cols.map(F.col): _*).unionByName(b.select(cols.map(F.col): _*))))
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
    TopKMerge.finish(all.select((groups ++ Seq("term", "count")).map(F.col): _*),
      groups, k, capacity)
  }
}
