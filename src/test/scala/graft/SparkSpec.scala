package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, lazy init). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  /** A2 fixture (reference tests/integration_test.rs:14-17). */
  def salesDf: DataFrame = {
    import spark.implicits._
    Seq((1L, "Alice", 100L), (2L, "Bob", 200L), (3L, "Charlie", 150L))
      .toDF("id", "name", "value")
  }

  /** A1 fixture (reference examples/users.json). */
  def usersDf: DataFrame = {
    import spark.implicits._
    (1L to 10L).map(i => (i, s"User$i", if (i % 3 == 0) "inactive" else "active"))
      .toDF("id", "name", "status")
  }

  /** A4 grouping fixture (reference docs/builtin-functions.md). */
  def employeesDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("eng", 100.0, 1L), ("eng", 110.0, 2L), ("eng", 120.0, 3L),
      ("sales", 80.0, 4L), ("sales", 90.0, 5L))
      .toDF("department", "salary", "employee_id")
  }
}
