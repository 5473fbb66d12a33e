package graft.operators

import scala.reflect.ClassTag
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** The distributed two-pass prefix scaffold shared by every order-dependent
  * operator that refuses a single-partition exchange (keyless window
  * functions, keyless as-of carries, count-session ids, grouped prefixes):
  *
  *   pass 1  — one small summary per sorted partition, collected in
  *             partition order (bytes ∝ #partitions, never #rows);
  *   fold    — the driver turns the ordered summaries into one carry value
  *             per partition (prefix state from the left, the right, or
  *             both — caller's choice);
  *   pass 2  — each partition streams again, seeded with its broadcast
  *             carry, emitting output rows.
  *
  * The input RDD is persisted across the two passes: they are separate
  * jobs, and recomputing the sort between them could permute rows that tie
  * on the sort key, silently mis-stitching carries on a real cluster. The
  * ContextCleaner drops the persisted partitions once the result is
  * unreferenced.
  */
object TwoPass {
  def apply[S: ClassTag, C: ClassTag](sorted: DataFrame, outSchema: StructType)(
      pass1: Iterator[Row] => S)(
      fold: IndexedSeq[S] => IndexedSeq[C])(
      pass2: (C, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val spark = sorted.sparkSession
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val stats: IndexedSeq[S] = rdd
      .mapPartitionsWithIndex((p, it) => Iterator((p, pass1(it))))
      .collect().sortBy(_._1).map(_._2).toIndexedSeq
    val carries = fold(stats)
    val bCarries = spark.sparkContext.broadcast(carries)
    val out = rdd.mapPartitionsWithIndex { (p, it) =>
      pass2(bCarries.value(p), it)
    }
    spark.createDataFrame(out, outSchema)
  }
}
