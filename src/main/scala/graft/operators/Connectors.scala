package graft.operators

import org.apache.spark.sql.DataFrame
import graft.config._
import graft.core._

/** External-system connectors (reference plugins, SURVEY §2.6-2.7).
  *
  * This build environment has zero egress and ships no connector jars
  * (checked: /opt/spark/jars has no kafka/mongo/POI/JS engine), so these
  * stages validate their config eagerly — pipelines referencing them parse
  * and `validate` OFFLINE — and fail at execution time with a precise
  * description of the jar that enables them. On a real cluster, dropping
  * the named jar on the classpath makes the marked TODO a ~20-line body
  * (the Spark API calls are spelled out per stage).
  */
abstract class GapStage(val name: String, val kind: StageKind,
                        requiredKeys: Seq[String], enabler: String, sparkApi: String) extends Stage {
  def apply(ctx: StageContext): DataFrame = {
    requiredKeys.foreach(ctx.cfg.str) // config contract still enforced
    throw new GraftPlanError(
      s"$name requires $enabler on the classpath (not available in this " +
      s"offline build). Spark-native implementation: $sparkApi")
  }
}

/** kafka.consume — reference plugins/conveyor-plugin-kafka lib.rs:34-203:
  * bounded batch read of `max_messages` from a topic. */
object KafkaConsumeSource extends GapStage("kafka.consume", StageKind.Source,
  Seq("brokers", "topic"),
  "spark-sql-kafka-0-10 (org.apache.spark:spark-sql-kafka-0-10_2.13)",
  """spark.read.format("kafka").option("kafka.bootstrap.servers", brokers)
    |.option("subscribe", topic).option("endingOffsets", "latest").load()
    |.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)", "timestamp")""".stripMargin)

/** kafka.produce — reference lib.rs:205-295. */
object KafkaProduceSink extends GapStage("kafka.produce", StageKind.Sink,
  Seq("brokers", "topic"),
  "spark-sql-kafka-0-10",
  """df.selectExpr("to_json(struct(*)) AS value").write.format("kafka")
    |.option("kafka.bootstrap.servers", brokers).option("topic", topic).save()""".stripMargin)

/** mongodb.find / mongodb.aggregate — reference conveyor-plugin-mongodb
  * lib.rs:24-38 op enum; read side. */
object MongoFindSource extends GapStage("mongodb.find", StageKind.Source,
  Seq("uri", "database", "collection"),
  "mongo-spark-connector (org.mongodb.spark:mongo-spark-connector_2.13)",
  """spark.read.format("mongodb").option("connection.uri", uri)
    |.option("database", db).option("collection", coll)
    |.option("aggregation.pipeline", jsonFilter).load()""".stripMargin)

object MongoAggregateSource extends GapStage("mongodb.aggregate", StageKind.Source,
  Seq("uri", "database", "collection", "pipeline"),
  "mongo-spark-connector",
  """spark.read.format("mongodb").option("aggregation.pipeline", pipelineJson).load()""")

/** mongodb.insertMany (the write family collapses to Spark save modes;
  * update/replace/delete need foreachPartition + the Mongo driver). */
object MongoInsertSink extends GapStage("mongodb.insertMany", StageKind.Sink,
  Seq("uri", "database", "collection"),
  "mongo-spark-connector",
  """df.write.format("mongodb").mode("append").option("connection.uri", uri)
    |.option("database", db).option("collection", coll).save()""".stripMargin)

/** js.eval — reference conveyor-plugin-js-wasm (Boa engine): per-row JS
  * transform(row) => row. No JS engine ships with JDK 17 and GraalVM JS is
  * not in the offline cache. The Spark-idiomatic substitute available TODAY
  * is map.apply's `sql` passthrough (full Spark SQL expressions). */
object JsEvalOp extends GapStage("js.eval", StageKind.Transform,
  Seq("script"),
  "a JVM JavaScript engine (org.graalvm.js:js + js-scriptengine)",
  """df.mapPartitions { rows => val engine = enginePerPartition(); rows.map(evalRow) }
    |(offline alternative: map.apply with config sql = "<spark sql expr>")""".stripMargin)

/** excel.read / excel.write — reference conveyor-plugin-excel-wasm. */
object ExcelReadSource extends GapStage("excel.read", StageKind.Source,
  Seq("path"),
  "Apache POI (org.apache.poi:poi-ooxml) or com.crealytics:spark-excel",
  """spark.read.format("excel").option("header", true).load(path)""")

object ExcelWriteSink extends GapStage("excel.write", StageKind.Sink,
  Seq("path"),
  "Apache POI or spark-excel",
  """df.write.format("excel").option("header", true).save(path)""")
