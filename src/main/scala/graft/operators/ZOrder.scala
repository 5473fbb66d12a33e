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
  * Equal-width bucketing is stats-cheap and good enough for pruning; a
  * heavily skewed column can pre-transform (e.g. map.apply log) before
  * z-ordering. `partitions` overrides the shuffle width (default:
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

    // 1. per-column min/max in ONE aggregate pass (tiny driver row).
    // Under CLI `explain` no job may run — placeholder ranges keep the
    // plan shape identical without touching the data.
    val ranges: Seq[(String, Double, Double)] =
      if (cfg.boolOr("_explain_only", false)) cols.map(c => (c, 0.0, 1.0))
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

    // 2-3. bucket + interleave, all as codegen'd expressions: bucket_c =
    // clamp(floor((v-lo)/(hi-lo) * 2^bits)); z = Σ_bit bucket_c[bit] moved
    // to position (bit * ncols + colIdx)
    val n = cols.size
    val maxBucket = (1L << bits) - 1
    val bucketCols = ranges.map { case (c, lo, hi) =>
      if (hi <= lo) F.lit(0L)
      else F.least(F.lit(maxBucket), F.greatest(F.lit(0L),
        F.floor((F.coalesce(numeric(c), F.lit(lo)) - lo) / (hi - lo) * (maxBucket + 1)).cast(LongType)))
    }
    val z = (0 until bits).flatMap { bit =>
      bucketCols.zipWithIndex.map { case (b, ci) =>
        // extract bit `bit` of the bucket, shift to interleaved position
        F.shiftleft(F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1L)), bit * n + ci)
      }
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))

    // 4. cluster
    val withZ = df.withColumn("_zorder", z)
    val parted = cfg.longOpt("partitions") match {
      case Some(p) => withZ.repartitionByRange(p.toInt, F.col("_zorder"))
      case None    => withZ.repartitionByRange(F.col("_zorder"))
    }
    parted.sortWithinPartitions("_zorder").drop("_zorder")
  }
}
