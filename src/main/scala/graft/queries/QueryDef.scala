package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.config.Cfg
import graft.core.{Stage, StageContext}

/** One correctness-gate query: Spark plan builder + (optionally) equivalent
  * DuckDB SQL over the same parquet tables. Column names MUST match between
  * the two (the driver sorts columns by name and hashes values).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Run a single-input stage over a named test table. */
  def viaStage(spark: SparkSession, dir: String, table: String, stage: Stage, cfg: Cfg): DataFrame =
    stage(StageContext.one(spark, Tables.load(spark, dir, table), cfg))

  def t(spark: SparkSession, dir: String, table: String): DataFrame =
    Tables.load(spark, dir, table)
}
