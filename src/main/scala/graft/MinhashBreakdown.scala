package graft

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

/** One-off: stage-by-stage timing of the minhash dedup ladder on the 50k
  * synthetic corpus, to attribute the superlinear wall observed in
  * ScaleProbe. */
object MinhashBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = spark.read.parquet(s"$dir/docs")
    def time(name: String)(body: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val out = body
      println(f"[breakdown] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out rows)")
    }
    // warm
    d.select(F.col("doc_id")).write.format("noop").mode("overwrite").save()

    val hashed = d.select(F.col("doc_id").as("id"),
        Shingles.shingleHashes(F.col("text"), 3).as("shingles"))
      .withColumn("sig", Shingles.minhashSignature(F.col("shingles"), 128, 42))
    time("shingle+sig compute")(hashed.select("id", "sig").write.format("noop").mode("overwrite").save().asInstanceOf[Any] match { case _ => d.count() })
    val pinned = hashed.persist()
    time("pin hashed")(pinned.count())
    time("verifiedPairs")(LshVerify.verifiedPairs(pinned, 32, 4, 128, 0.8).count())
    pinned.unpersist()
    spark.stop()
  }
}
