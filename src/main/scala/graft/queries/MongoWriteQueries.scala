package graft.queries

import org.apache.spark.sql.{functions => F}
import graft.config.Cfg
import graft.core.StageContext
import graft.operators._
import QueryDef.t

/** Oracle gates for the MongoDB write family: each op runs in transform
  * mode over the orders table and the oracle states the same document
  * semantics in SQL (update = CASE WHEN, delete = negated WHERE, insert =
  * UNION ALL, *One = min-order-key subquery).
  *
  * Float discipline: all the $inc/$set deltas here are exactly
  * representable doubles (1000, 0.25, literals with ≤2 bits of fraction),
  * so both engines compute bit-identical IEEE results and no rounding is
  * needed — same discipline as the csv/json round-trip gates.
  */
object MongoWriteQueries {

  def all: Seq[QueryDef] = Seq(

    // updateMany: $set + $inc over a compound filter
    QueryDef("mongo_update_many",
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN m THEN o_totalprice + 1000 ELSE o_totalprice END AS price,
        |  CASE WHEN m THEN 'X-BULK' ELSE o_orderpriority END AS pri
        |FROM (SELECT *, (o_orderstatus = 'O' AND o_totalprice < 100000) AS m
        |      FROM orders)""".stripMargin) { (s, d) =>
      MongoUpdateManyOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "query" -> """{"o_orderstatus": "O", "o_totalprice": {"$lt": 100000}}""",
        "update" -> """{"$set": {"o_orderpriority": "X-BULK"}, "$inc": {"o_totalprice": 1000}}""")))
        .select(F.col("o_orderkey"), F.col("o_orderstatus"),
          F.col("o_totalprice").alias("price"), F.col("o_orderpriority").alias("pri"))
    },

    // updateOne: exactly the first match in o_orderkey order is touched
    QueryDef("mongo_update_one",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' AND o_orderkey =
        |    (SELECT min(o_orderkey) FROM orders WHERE o_orderstatus = 'F')
        |  THEN 'FIRST-F' ELSE o_orderpriority END AS pri
        |FROM orders""".stripMargin) { (s, d) =>
      MongoUpdateOneOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "query" -> """{"o_orderstatus": "F"}""",
        "update" -> """{"$set": {"o_orderpriority": "FIRST-F"}}""",
        "order_by" -> "o_orderkey")))
        .select(F.col("o_orderkey"), F.col("o_orderpriority").alias("pri"))
    },

    // deleteMany: negated compound predicate
    QueryDef("mongo_delete_many",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice >= 50000)""".stripMargin) { (s, d) =>
      MongoDeleteManyOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "query" -> """{"o_orderstatus": "F", "o_totalprice": {"$gte": 50000}}""")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },

    // insertMany: config docs append with schema alignment (missing field → NULL)
    QueryDef("mongo_insert_many",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey < 100
        |UNION ALL SELECT CAST(900001 AS BIGINT), 'Z', 1.5
        |UNION ALL SELECT CAST(900002 AS BIGINT), 'Z', CAST(NULL AS DOUBLE)""".stripMargin) { (s, d) =>
      val slice = t(s, d, "orders").filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      MongoInsertManyOp(StageContext.one(s, slice, Cfg.of(
        "documents" ->
          """[{"o_orderkey": 900001, "o_orderstatus": "Z", "o_totalprice": 1.5},
            | {"o_orderkey": 900002, "o_orderstatus": "Z"}]""".stripMargin)))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },

    // replaceOne: first match replaced wholesale, id preserved, rest NULLed
    QueryDef("mongo_replace_one",
      """SELECT o_orderkey,
        |  CASE WHEN hit THEN 'REPL' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN hit THEN 0.5 ELSE o_totalprice END AS price,
        |  CASE WHEN hit THEN NULL ELSE o_orderpriority END AS pri
        |FROM (SELECT *, o_orderstatus = 'P' AND o_orderkey =
        |        (SELECT min(o_orderkey) FROM orders WHERE o_orderstatus = 'P') AS hit
        |      FROM orders)""".stripMargin) { (s, d) =>
      MongoReplaceOneOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "query" -> """{"o_orderstatus": "P"}""",
        "replacement" -> """{"o_orderstatus": "REPL", "o_totalprice": 0.5}""",
        "order_by" -> "o_orderkey")))
        .select(F.col("o_orderkey"), F.col("o_orderstatus"),
          F.col("o_totalprice").alias("price"), F.col("o_orderpriority").alias("pri"))
    },

    // insertOne: a single config document appends with schema alignment
    QueryDef("mongo_insert_one",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey < 100
        |UNION ALL SELECT CAST(900003 AS BIGINT), 'Q', 2.25""".stripMargin) { (s, d) =>
      val slice = t(s, d, "orders").filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      MongoInsertOneOp(StageContext.one(s, slice, Cfg.of(
        "document" -> """{"o_orderkey": 900003, "o_orderstatus": "Q", "o_totalprice": 2.25}""")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },

    // deleteOne: exactly the first match in o_orderkey order disappears
    QueryDef("mongo_delete_one",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_orderkey =
        |  (SELECT min(o_orderkey) FROM orders WHERE o_orderstatus = 'F'))""".stripMargin) { (s, d) =>
      MongoDeleteOneOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "query" -> """{"o_orderstatus": "F"}""",
        "order_by" -> "o_orderkey")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },

    // replaceMany: EVERY match replaced wholesale, id preserved, rest NULLed
    QueryDef("mongo_replace_many",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'P' THEN 'RP' ELSE o_orderstatus END AS status,
        |  CASE WHEN o_orderstatus = 'P' THEN 0.75 ELSE o_totalprice END AS price,
        |  CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END AS pri
        |FROM orders""".stripMargin) { (s, d) =>
      MongoReplaceManyOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "query" -> """{"o_orderstatus": "P"}""",
        "replacement" -> """{"o_orderstatus": "RP", "o_totalprice": 0.75}""",
        "order_by" -> "o_orderkey")))
        .select(F.col("o_orderkey"), F.col("o_orderstatus").alias("status"),
          F.col("o_totalprice").alias("price"), F.col("o_orderpriority").alias("pri"))
    },

    // upsert: no match → the filter's equality fields + $set/$setOnInsert
    // fields are inserted as a new document
    QueryDef("mongo_upsert",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |UNION ALL SELECT CAST(900009 AS BIGINT), CAST(42 AS BIGINT), 'ZZ', 9.5""".stripMargin) { (s, d) =>
      MongoUpdateOneOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "query" -> """{"o_orderstatus": {"$eq": "ZZ"}, "o_custkey": 42}""",
        "update" -> """{"$set": {"o_totalprice": 9.5}, "$setOnInsert": {"o_orderkey": 900009}}""",
        "upsert" -> true, "order_by" -> "o_orderkey")))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    },

    // bulkWrite: delete → update → insert threaded as one plan
    QueryDef("mongo_bulk_write",
      """WITH del AS (
        |  SELECT * FROM orders
        |  WHERE NOT (o_orderstatus = 'P' AND o_totalprice < 100000)),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 0.25
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM del)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
        |UNION ALL SELECT CAST(900100 AS BIGINT), 'N', 3.75""".stripMargin) { (s, d) =>
      MongoBulkWriteOp(StageContext.one(s, t(s, d, "orders"), Cfg.of(
        "operations" ->
          """[{"deleteMany": {"filter": {"o_orderstatus": "P", "o_totalprice": {"$lt": 100000}}}},
            | {"updateMany": {"filter": {"o_orderstatus": "O"}, "update": {"$inc": {"o_totalprice": 0.25}}}},
            | {"insertOne": {"document": {"o_orderkey": 900100, "o_orderstatus": "N", "o_totalprice": 3.75}}}]""".stripMargin)))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    }
  )
}
