package graft

import org.apache.spark.sql.{SparkSession, DataFrame, functions => F}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-domain registries; every entry routes
  * through the operator layer (graft.operators) so the correctness gate
  * exercises the same code paths a TOML pipeline compiles to.
  */
object SparkEntry {

  private def registries: Seq[QueryDef] =
    RelationalQueries.all ++ JoinQueries.all ++ AdvancedJoinQueries.all ++
      ExtensionQueries.all ++ PipelineQueries.all ++ MongoWriteQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped: scan → filter → groupBy partial-agg → sort. */
  def entry(spark: SparkSession): DataFrame = {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    li.filter(F.col("l_quantity") >= 1)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
