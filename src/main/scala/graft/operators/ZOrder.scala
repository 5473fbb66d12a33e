package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.LongType
import graft.config._
import graft.core._

/** zorder.apply — Z-order (Morton) clustering of the frame on 2-6 numeric/
  * date columns, so a subsequent parquet/table write produces row groups
  * whose per-column min/max stats are SELECTIVE FOR MULTI-DIMENSIONAL
  * RANGE PREDICATES. A linear sort clusters only its leading column; the
  * Z-curve keeps every indexed column's values locally clustered, so
  * `WHERE a BETWEEN … AND b BETWEEN …` skips row groups on both
  * dimensions (ZOrderSpec measures the pruning win on real footers).
  *
  * Spark-first mechanics, one job + one range shuffle:
  *  1. one tiny agg computes each column's (min, max);
  *  2. each value maps to a `bits`-bit equal-width bucket (nulls → bucket
  *     0; degenerate min=max columns contribute nothing);
  *  3. bucket ids bit-interleave into the Morton code (codegen'd bit ops —
  *     no UDF);
  *  4. repartitionByRange + sortWithinPartitions on the code cluster the
  *     data; the helper column is dropped before the sink sees it.
  *
  * Bucketing modes (`bucketing`, default `width`):
  *  - `width`: equal-width buckets from one (min, max) agg — stats-cheap,
  *    right for roughly-uniform columns;
  *  - `quantile`: bucket boundaries from ONE multi-column approxQuantile
  *    pass (Greenwald-Khanna sketch, error `quantile_error`, default
  *    0.25/2^bits), applied via MLlib Bucketizer (binary-search splits).
  *    Equal-POPULATION buckets keep every bucket selective under heavy
  *    skew (a power-law column collapses to a handful of width-buckets,
  *    and row groups stop pruning on that dimension). Costs one extra
  *    stats pass — pay it when the column is skewed.
  * `partitions` overrides the shuffle width (default:
  * spark.sql.shuffle.partitions).
  */
object ZOrderOp extends Stage {
  val name = "zorder.apply"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val cols = cfg.strList("columns")
    if (cols.size < 2 || cols.size > 6)
      throw new GraftConfigError(s"zorder.apply needs 2-6 columns, got ${cols.size}")
    val bits = cfg.longOr("bits", 12L).toInt
    if (bits * cols.size > 60)
      throw new GraftConfigError(
        s"bits=$bits × ${cols.size} columns exceeds 60 interleaved bits — lower bits")
    val df = ctx.primary

    // DateType does not cast to double directly — route through timestamp
    def numeric(c: String): org.apache.spark.sql.Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType => F.col(c).cast("timestamp").cast("double")
      case _ => F.col(c).cast("double")
    }

    val mode = cfg.strOr("bucketing", "width") match {
      case ok @ ("width" | "quantile") => ok
      case other => throw new GraftConfigError(s"zorder.apply bucketing must be width|quantile, got '$other'")
    }
    val explainOnly = cfg.boolOr("_explain_only", false)
    val n = cols.size
    val maxBucket = (1L << bits) - 1

    // 1-2. per-column bucket expressions. Under CLI `explain` no job may
    // run — placeholder stats keep the plan shape without touching data.
    // (source: a frame that may carry quantile temp columns)
    val (bucketSource, bucketCols: Seq[org.apache.spark.sql.Column], tempCols: Seq[String]) =
      if (mode == "width" || explainOnly) {
        val ranges: Seq[(String, Double, Double)] =
          if (explainOnly) cols.map(c => (c, 0.0, 1.0))
          else {
            val aggs = cols.flatMap(c => Seq(
              F.min(numeric(c)).alias(s"_min_$c"),
              F.max(numeric(c)).alias(s"_max_$c")))
            val st = df.agg(aggs.head, aggs.tail: _*).head()
            cols.zipWithIndex.map { case (c, i) =>
              val lo = if (st.isNullAt(2 * i)) 0.0 else st.getDouble(2 * i)
              val hi = if (st.isNullAt(2 * i + 1)) 0.0 else st.getDouble(2 * i + 1)
              (c, lo, hi)
            }
          }
        val bc = ranges.map { case (c, lo, hi) =>
          if (hi <= lo) F.lit(0L)
          else F.least(F.lit(maxBucket), F.greatest(F.lit(0L),
            F.floor((F.coalesce(numeric(c), F.lit(lo)) - lo) / (hi - lo) * (maxBucket + 1)).cast(LongType)))
        }
        (df, bc, Seq.empty[String])
      } else {
        // quantile mode: equal-population boundaries from one G-K sketch
        // pass over all columns, materialized through Bucketizer's
        // binary-search (a layout-time op — the per-row log2(buckets)
        // search is noise next to the range shuffle that follows).
        val nBuckets = (1L << bits).toInt
        val err = cfg.doubleOr("quantile_error", 0.25 / nBuckets)
        val probs = (0 to nBuckets).map(_.toDouble / nBuckets).toArray
        val numNames = cols.indices.map(i => s"_zq_$i")
        val withNum = cols.zip(numNames).foldLeft(df) { case (d, (c, nm)) =>
          d.withColumn(nm, numeric(c))
        }
        val allSplits = withNum.stat.approxQuantile(numNames.toArray, probs, err)
        var cur = withNum
        val bc = Vector.newBuilder[org.apache.spark.sql.Column]
        val temps = Vector.newBuilder[String]
        cols.indices.foreach { ci =>
          temps += numNames(ci)
          val interior = allSplits(ci).distinct.sorted.drop(1).dropRight(1)
            .filter(v => !v.isNaN && !v.isInfinite)
          if (interior.isEmpty) bc += F.lit(0L) // constant / all-null column
          else {
            val splits = Double.NegativeInfinity +: interior :+ Double.PositiveInfinity
            val outName = s"_zb_$ci"
            // nulls → lowest bucket (same policy as width mode); NaN → kept
            // by Bucketizer in an overflow bucket, clamped below
            cur = cur.withColumn(numNames(ci),
              F.coalesce(F.col(numNames(ci)), F.lit(interior.head - 1)))
            val bucketizer = new org.apache.spark.ml.feature.Bucketizer()
              .setInputCol(numNames(ci)).setOutputCol(outName)
              .setSplits(splits).setHandleInvalid("keep")
            cur = bucketizer.transform(cur)
            temps += outName
            // After split dedup a skewed/low-cardinality column may yield
            // m << 2^bits buckets. Raw ids would then occupy only the LOW
            // interleaved bits (the fast-varying end of the curve) and the
            // dimension would stop clustering — scale ids across the full
            // bit width so distinctions land in the high bits.
            val m = splits.length - 1
            bc += F.least(F.lit(maxBucket),
              F.floor(F.col(outName) * ((maxBucket + 1).toDouble / m)).cast(LongType))
          }
        }
        (cur, bc.result(), temps.result())
      }

    // 3. interleave, all as codegen'd expressions: z = Σ_bit
    // bucket_c[bit] moved to position (bit * ncols + colIdx)
    val z = (0 until bits).flatMap { bit =>
      bucketCols.zipWithIndex.map { case (b, ci) =>
        // extract bit `bit` of the bucket, shift to interleaved position
        F.shiftleft(F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1L)), bit * n + ci)
      }
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))

    // 4. cluster — temp quantile/bucket columns are dropped BEFORE the
    // range exchange so they never ride through shuffle + sort
    val withZ = bucketSource.withColumn("_zorder", z).drop(tempCols: _*)
    val parted = cfg.longOpt("partitions") match {
      case Some(p) => withZ.repartitionByRange(p.toInt, F.col("_zorder"))
      case None    => withZ.repartitionByRange(F.col("_zorder"))
    }
    parted.sortWithinPartitions("_zorder").drop("_zorder")
  }
}
