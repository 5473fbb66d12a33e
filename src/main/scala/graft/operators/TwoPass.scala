package graft.operators

import scala.reflect.ClassTag
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * unreferenced; callers that fully consume their output inside one
  * invocation (shards.write) should [[Staged.unpersist]] explicitly
  * instead of pinning a corpus-sized cache for the session lifetime.
  */
object TwoPass {

  /** The staged form: pass 1 has run, the per-partition summaries and
    * carries are in hand, and pass 2 can be issued any number of times
    * over any SUBSET of partitions — the restartable-export shape
    * (shards.write commits in waves, each wave re-reading only the
    * partitions whose offset span overlaps it). */
  final class Staged[S, C](
      private[TwoPass] val rdd: org.apache.spark.rdd.RDD[Row],
      val stats: IndexedSeq[S],
      val carries: IndexedSeq[C]) {

    /** Pass-2 over only the partitions `sel` admits. PartitionPruningRDD
      * drops unselected partitions from the job entirely — they are
      * neither scheduled nor read, so a selective run prices as its
      * selection, not as the corpus. */
    def run(spark: SparkSession, outSchema: StructType, sel: Int => Boolean)(
        pass2: (C, Iterator[Row]) => Iterator[Row]): DataFrame = {
      val bCarries = spark.sparkContext.broadcast(carries)
      // mapPartitionsWithIndex sees the ORIGINAL partition index (the
      // pruned RDD delegates compute to the parent's partition objects),
      // so carries stay index-aligned under pruning
      val mapped = rdd.mapPartitionsWithIndex { (p, it) =>
        pass2(bCarries.value(p), it)
      }
      val pruned = org.apache.spark.rdd.PartitionPruningRDD.create(mapped, sel)
      spark.createDataFrame(pruned, outSchema)
    }

    def run(spark: SparkSession, outSchema: StructType)(
        pass2: (C, Iterator[Row]) => Iterator[Row]): DataFrame =
      run(spark, outSchema, _ => true)(pass2)

    /** Release the persisted pass-1 scan. Only call once every consuming
      * action has run — pass-2 results are lazy plans over the cache. */
    def unpersist(): Unit = rdd.unpersist(blocking = false)
  }

  /** Run pass 1 + the fold now (two driver-visible steps: persist + one
    * summary job); return the staged handle for pass-2 runs. */
  def stage[S: ClassTag, C: ClassTag](sorted: DataFrame)(
      pass1: Iterator[Row] => S)(
      fold: IndexedSeq[S] => IndexedSeq[C]): Staged[S, C] = {
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val stats: IndexedSeq[S] = rdd
      .mapPartitionsWithIndex((p, it) => Iterator((p, pass1(it))))
      .collect().sortBy(_._1).map(_._2).toIndexedSeq
    new Staged(rdd, stats, fold(stats))
  }

  def apply[S: ClassTag, C: ClassTag](sorted: DataFrame, outSchema: StructType)(
      pass1: Iterator[Row] => S)(
      fold: IndexedSeq[S] => IndexedSeq[C])(
      pass2: (C, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val staged = stage(sorted)(pass1)(fold)
    staged.run(sorted.sparkSession, outSchema)(pass2)
  }
}
