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
  */
object TopKOp extends Stage {
  val name = "topk.approx"
  val kind = StageKind.Transform

  private val SketchSchema = StructType(Seq(
    StructField("__t", StringType, nullable = true),
    StructField("__c", LongType, nullable = false)))

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val col = cfg.strOr("column", "text")
    val k = cfg.longOr("k", 100L).toInt
    val capacity = cfg.longOr("capacity", math.max(10L * k, 1000L)).toInt
    val tokenize = cfg.boolOr("tokenize", false)
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

    // merge: summed sketch counts per term (≤ #partitions × capacity rows),
    // global N from the marker rows, then the top-k with the bound column
    val totals = sketches.filter(F.col("__t").isNull)
      .agg(F.coalesce(F.sum("__c"), F.lit(0L)).as("__n"))
    val merged = sketches.filter(F.col("__t").isNotNull)
      .groupBy("__t").agg(F.sum("__c").as("count"))
    merged
      .crossJoin(F.broadcast(totals))
      .select(F.col("__t").as("term"), F.col("count"),
        (F.col("count") + F.col("__n") / F.lit(capacity.toLong)).cast("long").as("count_max"))
      .orderBy(F.col("count").desc, F.col("term").asc)
      .limit(k)
  }
}
