package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Declared schemas for the driver test tables (TESTDATA.md / FIXTURES.md §B).
  * Parquet is self-describing so reads don't need these, but at 100 TB a
  * declared schema is mandatory for CSV/JSON sources (inference = extra full
  * scan, SURVEY §1.2) — the source operators accept any of these by name,
  * and `expect` lets pipelines assert the contract early.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  // memoized per (session, dir, table): Verify/Bench build 70+ query plans
  // over the same ten tables — reusing the resolved relation skips repeated
  // schema/footer resolution (the data itself is still read lazily per job)
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((System.identityHashCode(spark), dir, name),
      _ => load0(spark, dir, name))

  private def load0(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver fixture's events.ts is parquet TIMESTAMP(NANOS), which
      // Spark 4 rejects (PARQUET_TYPE_ILLEGAL) unless read as long; convert
      // ns → µs TimestampType to present the FIXTURES.md schema. A replica
      // WRITTEN by Spark (e.g. the 10× scaling copy) already has µs
      // timestamps — branch on the actual decoded type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val ts = raw.schema("ts").dataType match {
        case LongType => timestamp_micros(floor(col("ts") / 1000L).cast("long"))
        // a µs fixture WITHOUT the isAdjustedToUTC flag decodes as
        // TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ — normalize to
        // the FIXTURES.md TimestampType (session tz is UTC everywhere, so
        // values line up with the oracle's naive read either way)
        case TimestampNTZType => col("ts").cast(TimestampType)
        case _        => col("ts")
      }
      raw.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$dir/$name.parquet")
}
