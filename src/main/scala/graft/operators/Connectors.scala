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

// mongodb.find / mongodb.findOne / mongodb.aggregate are implemented
// natively in MongoQuery.scala: the Mongo query language compiles to
// Catalyst, with extended-JSON dump files as the offline collection source.

/** mongodb.insertMany (the write family collapses to Spark save modes;
  * update/replace/delete need foreachPartition + the Mongo driver). */
object MongoInsertSink extends GapStage("mongodb.insertMany", StageKind.Sink,
  Seq("uri", "database", "collection"),
  "mongo-spark-connector",
  """df.write.format("mongodb").mode("append").option("connection.uri", uri)
    |.option("database", db).option("collection", coll).save()""".stripMargin)

/** Remaining MongoDB write-op surface (reference lib.rs:24-38 op enum) —
  * gap treatment: these genuinely need a live server round-trip
  * (foreachPartition + the Mongo driver bulk API). */
object MongoGaps {
  private def mk(op: String, kind: StageKind, api: String) =
    new GapStage(s"mongodb.$op", kind, Seq("uri", "database", "collection"),
      "mongo-spark-connector", api) {}
  val sinks: Seq[Stage] = Seq(
    "insertOne" -> "df.limit(1).write.format(\"mongodb\").mode(\"append\").save()",
    "updateOne" -> "df.foreachPartition(bulkWrite(UpdateOneModel))",
    "updateMany" -> "df.foreachPartition(bulkWrite(UpdateManyModel))",
    "deleteOne" -> "df.foreachPartition(bulkWrite(DeleteOneModel))",
    "deleteMany" -> "df.foreachPartition(bulkWrite(DeleteManyModel))",
    "replaceOne" -> "df.foreachPartition(bulkWrite(ReplaceOneModel))",
    "replaceMany" -> "df.foreachPartition(bulkWrite(ReplaceOneModel per row))",
    "bulkWrite" -> "df.foreachPartition(collection.bulkWrite(models))"
  ).map { case (op, api) => mk(op, StageKind.Sink, api) }
}

/** mongodb.toObjectId — the one mongo op that is a PURE transform
  * (reference lib.rs:1553-1604 wraps hex strings as {"$oid": ...}); no
  * driver needed, implemented natively. */
object MongoToObjectIdOp extends Stage {
  val name = "mongodb.toObjectId"
  val kind = StageKind.Transform
  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.sql.functions._
    val col = ctx.cfg.str("column")
    val out = ctx.cfg.strOr("output_column", col)
    ctx.primary.withColumn(out,
      when(ctx.primary(col).rlike("^[0-9a-fA-F]{24}$"),
        concat(lit("{\"$oid\": \""), ctx.primary(col), lit("\"}")))
        .otherwise(ctx.primary(col)))
  }
}

/** mongodb.normalize — MongoDB Extended JSON → plain scalars, the inverse
  * of toObjectId and the read-side companion the reference performs inside
  * json_to_bson (reference plugins/conveyor-plugin-mongodb/src/lib.rs:
  * 1540-1615): recursively rewrites
  *   {"$oid": "24-hex"}                     → the hex string
  *   {"$date": "rfc3339" | {"$numberLong": "ms"} | ms}
  *                                          → epoch millis (default) or a
  *                                            fixed-format ISO-8601 string
  *                                            (date_format = "iso")
  *   {"$numberLong": "n"}                   → 64-bit integer
  *   {"$numberInt": "n"}                    → 32-bit integer
  *   {"$numberDouble": "x"}                 → double
  * inside arbitrarily nested documents/arrays. Wrappers that fail to parse
  * fall through as regular objects, and non-JSON input passes through
  * unchanged — both mirroring the reference's lenient fallbacks.
  *
  * Pure column transform (Jackson, already on Spark's classpath); needs no
  * Mongo driver, so pipelines can consume extended-JSON exports (mongoexport
  * files, $-typed API payloads) fully offline. Scala UDF is justified here:
  * a recursive tree rewrite has no functions./Catalyst equivalent.
  */
object MongoNormalizeOp extends Stage {
  val name = "mongodb.normalize"
  val kind = StageKind.Transform

  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node._

  // per-executor singleton (ObjectMapper is not serializable-stable)
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val isoFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(java.time.ZoneOffset.UTC)

  private def dateNode(millis: Long, iso: Boolean): JsonNode =
    if (iso) TextNode.valueOf(isoFmt.format(java.time.Instant.ofEpochMilli(millis)))
    else LongNode.valueOf(millis)

  private def rewrite(n: JsonNode, iso: Boolean): JsonNode = n match {
    case o: ObjectNode =>
      val oid = o.get("$oid")
      if (oid != null && oid.isTextual && oid.asText.matches("^[0-9a-fA-F]{24}$"))
        return TextNode.valueOf(oid.asText)
      val date = o.get("$date")
      if (date != null) {
        if (date.isTextual)
          try return dateNode(java.time.Instant.parse(date.asText).toEpochMilli, iso)
          catch { case _: java.time.format.DateTimeParseException => }
        else if (date.isObject && date.get("$numberLong") != null && date.get("$numberLong").isTextual)
          try return dateNode(date.get("$numberLong").asText.toLong, iso)
          catch { case _: NumberFormatException => }
        else if (date.isIntegralNumber)
          return dateNode(date.asLong, iso)
      }
      def num(key: String)(parse: String => JsonNode): Option[JsonNode] = {
        val v = o.get(key)
        if (v != null && v.isTextual)
          try Some(parse(v.asText)) catch { case _: NumberFormatException => None }
        else None
      }
      num("$numberLong")(s => LongNode.valueOf(s.toLong))
        .orElse(num("$numberInt")(s => IntNode.valueOf(s.toInt)))
        .orElse(num("$numberDouble")(s => DoubleNode.valueOf(s.toDouble)))
        .getOrElse {
          val out = mapper.createObjectNode()
          o.fields().forEachRemaining(e => out.set[JsonNode](e.getKey, rewrite(e.getValue, iso)))
          out
        }
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.forEach(e => out.add(rewrite(e, iso)))
      out
    case other => other
  }

  /** Normalize one extended-JSON document; non-JSON input passes through. */
  def normalize(s: String, iso: Boolean): String =
    try mapper.writeValueAsString(rewrite(mapper.readTree(s), iso))
    catch { case _: Exception => s }

  def apply(ctx: StageContext): DataFrame = {
    import org.apache.spark.sql.functions._
    val col = ctx.cfg.str("column")
    val out = ctx.cfg.strOr("output_column", col)
    val iso = ctx.cfg.strOr("date_format", "millis") match {
      case "millis" => false
      case "iso"    => true
      case other => throw new GraftConfigError(s"date_format must be millis|iso, got '$other'")
    }
    val fn = udf((s: String) => if (s == null) null else normalize(s, iso))
    ctx.primary.withColumn(out, fn(ctx.primary(col)))
  }
}

/** Registry alias — same stage under a reference-compatible second name
  * (e.g. the reference's `file.watch` / `stdout_stream.write`). */
final class AliasStage(alias: String, target: Stage) extends Stage {
  val name: String = alias
  val kind: StageKind = target.kind
  def apply(ctx: StageContext): DataFrame = target(ctx)
}
