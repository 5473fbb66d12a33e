package graft

import graft.config.Cfg
import graft.core.{GraftPlanError, StageContext}
import graft.operators._

/** Mongo query-language compiler: filter docs and aggregation pipelines
  * compiled to Catalyst over DataFrames and extended-JSON dumps. */
class MongoQuerySpec extends SparkSpec {
  import org.apache.spark.sql.{functions => F}

  private def find(df: org.apache.spark.sql.DataFrame, cfg: (String, Any)*) =
    MongoFindSource(StageContext.one(spark, df, Cfg.of(cfg: _*)))
  private def agg(df: org.apache.spark.sql.DataFrame, pipeline: String) =
    MongoAggregateSource(StageContext.one(spark, df, Cfg.of("pipeline" -> pipeline)))

  private def ordersLike = {
    import spark.implicits._
    Seq(
      (1L, "O", 100.0, "a"), (2L, "F", 250.0, "b"), (3L, "O", 75.0, "a"),
      (4L, "P", 300.0, "c"), (5L, "O", 120.0, "b"), (6L, "F", 80.0, null.asInstanceOf[String]))
      .toDF("id", "status", "total", "clerk")
  }

  test("equality, comparison, $in, $and/$or compile and filter correctly") {
    assert(find(ordersLike, "query" -> """{"status": "O"}""").count() === 3)
    assert(find(ordersLike, "query" -> """{"total": {"$gt": 100}}""").count() === 3)
    assert(find(ordersLike, "query" -> """{"total": {"$gte": 100, "$lt": 300}}""").count() === 3)
    assert(find(ordersLike, "query" -> """{"status": {"$in": ["O", "P"]}}""").count() === 4)
    assert(find(ordersLike, "query" -> """{"status": {"$nin": ["O", "P"]}}""").count() === 2)
    assert(find(ordersLike, "query" -> """{"$or": [{"status": "P"}, {"total": {"$lt": 80}}]}""").count() === 2)
    assert(find(ordersLike, "query" -> """{"$and": [{"status": "O"}, {"total": {"$gt": 100}}]}""").count() === 1)
    assert(find(ordersLike, "query" -> """{"$nor": [{"status": "O"}, {"status": "F"}]}""").count() === 1)
    assert(find(ordersLike, "query" -> """{"id": {"$mod": [2, 0]}}""").count() === 3)
    assert(find(ordersLike, "query" -> """{"status": {"$regex": "^[OF]$"}}""").count() === 5)
  }

  test("null semantics: {f: null}, $ne, $exists match Mongo") {
    assert(find(ordersLike, "query" -> """{"clerk": null}""").count() === 1)
    // $ne matches docs where the field is null too
    assert(find(ordersLike, "query" -> """{"clerk": {"$ne": "a"}}""").count() === 4)
    assert(find(ordersLike, "query" -> """{"clerk": {"$exists": true}}""").count() === 5)
    assert(find(ordersLike, "query" -> """{"clerk": {"$exists": false}}""").count() === 1)
    assert(find(ordersLike, "query" -> """{"clerk": {"$in": ["a", null]}}""").count() === 3)
  }

  test("projection, sort, limit, skip") {
    val out = find(ordersLike,
      "query" -> """{"status": "O"}""",
      "projection" -> """{"id": 1, "total": 1}""",
      "sort" -> """{"total": -1}""",
      "limit" -> 2)
    assert(out.columns.toSeq === Seq("id", "total"))
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(5L, 1L))
    val skipped = find(ordersLike, "sort" -> """{"id": 1}""", "skip" -> 4)
    assert(skipped.collect().map(_.getLong(0)).toSeq === Seq(5L, 6L))
    // exclusion projection
    val excl = find(ordersLike, "projection" -> """{"clerk": 0}""")
    assert(excl.columns.toSeq === Seq("id", "status", "total"))
  }

  test("sort by a field the projection excludes (Mongo evaluation order)") {
    val out = find(ordersLike,
      "projection" -> """{"id": 1}""",
      "sort" -> """{"total": -1}""", "limit" -> 2)
    assert(out.columns.toSeq === Seq("id"))
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(4L, 2L)) // totals 300, 250
  }

  test("$project _id semantics: default-included, _id:0 mixes with inclusions") {
    import spark.implicits._
    val df = Seq(("x1", 1L, "a"), ("x2", 2L, "b")).toDF("_id", "n", "s")
    val incl = agg(df, """[{"$project": {"n": 1}}]""")
    assert(incl.columns.toSeq === Seq("_id", "n")) // _id rides along by default
    val noId = agg(df, """[{"$project": {"_id": 0, "n": 1}}]""")
    assert(noId.columns.toSeq === Seq("n")) // legal mix in Mongo
    val computed = agg(df, """[{"$project": {"_id": {"$toUpper": "$s"}, "n": 1}}]""")
    assert(computed.orderBy("n").collect().map(_.getString(0)).toSeq === Seq("A", "B"))
  }

  test("findOne returns exactly one row") {
    val out = MongoFindOneSource(StageContext.one(spark, ordersLike, Cfg.of(
      "query" -> """{"status": "F"}""", "sort" -> """{"id": 1}""")))
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("aggregate: $match → $group accumulators → $sort") {
    val out = agg(ordersLike,
      """[{"$match": {"total": {"$gt": 50}}},
        | {"$group": {"_id": "$status", "n": {"$sum": 1}, "rev": {"$sum": "$total"},
        |             "hi": {"$max": "$total"}, "mean": {"$avg": "$total"}}},
        | {"$sort": {"_id": 1}}]""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(("F", 2L, 330.0, 250.0), ("O", 3L, 295.0, 120.0), ("P", 1L, 300.0, 300.0)))
  }

  test("aggregate: $project expressions, $addFields, $unset, $count") {
    val proj = agg(ordersLike,
      """[{"$project": {"id": 1, "gross": {"$multiply": ["$total", 1.1]},
        |               "tag": {"$concat": ["$status", "-", "x"]}}},
        | {"$sort": {"id": 1}}, {"$limit": 1}]""".stripMargin).collect().head
    assert(math.abs(proj.getDouble(1) - 110.0) < 1e-9)
    assert(proj.getString(2) === "O-x")
    val af = agg(ordersLike, """[{"$addFields": {"flag": {"$cond": [{"$gte": ["$total", 100]}, "big", "small"]}}}]""")
    assert(af.filter(F.col("flag") === "big").count() === 4)
    val un = agg(ordersLike, """[{"$unset": ["clerk", "status"]}]""")
    assert(un.columns.toSeq === Seq("id", "total"))
    val cnt = agg(ordersLike, """[{"$match": {"status": "O"}}, {"$count": "n"}]""").collect().head
    assert(cnt.getLong(0) === 3L)
  }

  test("aggregate: compound _id, $push/$addToSet, distinct via bare $group") {
    val out = agg(ordersLike,
      """[{"$group": {"_id": {"s": "$status", "big": {"$gte": ["$total", 100]}},
        |             "ids": {"$push": "$id"}}},
        | {"$sort": {"_id": 1}}]""".stripMargin)
    assert(out.count() === 5)
    val distinct = agg(ordersLike, """[{"$group": {"_id": "$status"}}]""")
    assert(distinct.collect().map(_.getString(0)).sorted.toSeq === Seq("F", "O", "P"))
  }

  test("aggregate: $unwind explodes arrays") {
    import spark.implicits._
    val df = Seq((1L, Seq("x", "y")), (2L, Seq("z")), (3L, Seq.empty[String]))
      .toDF("id", "tags")
    assert(agg(df, """[{"$unwind": "$tags"}]""").count() === 3)
    assert(agg(df, """[{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": true}}]""").count() === 4)
  }

  test("extended-JSON dump file: wrappers normalize before inference") {
    val dir = java.nio.file.Files.createTempDirectory("mongo_dump")
    val f = dir.resolve("coll.jsonl")
    java.nio.file.Files.writeString(f,
      """{"_id": {"$oid": "507f1f77bcf86cd799439011"}, "n": {"$numberLong": "42"}, "when": {"$date": "2024-01-02T00:00:00Z"}, "name": "a"}
        |{"_id": {"$oid": "507f1f77bcf86cd799439012"}, "n": {"$numberLong": "7"}, "when": {"$date": "2024-06-01T00:00:00Z"}, "name": "b"}
        |""".stripMargin)
    val out = MongoFindSource(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> f.toString, "query" -> """{"n": {"$gt": 10}}""")))
    val row = out.collect().head
    assert(row.getAs[String]("_id") === "507f1f77bcf86cd799439011")
    assert(row.getAs[Long]("n") === 42L)
    assert(row.getAs[Long]("when") === 1704153600000L) // epoch millis scalar
  }

  test("server mode without path raises the gap error naming the jar") {
    val e = intercept[GraftPlanError](MongoFindSource(StageContext(spark, Seq.empty, Cfg.of(
      "uri" -> "mongodb://localhost", "database" -> "d", "collection" -> "c"))))
    assert(e.getMessage.contains("mongo-spark-connector"))
  }

  test("unsupported operators raise plan errors naming the operator") {
    intercept[GraftPlanError](find(ordersLike, "query" -> """{"total": {"$near": 1}}"""))
    intercept[GraftPlanError](agg(ordersLike, """[{"$lookup": {}}]"""))
    intercept[GraftPlanError](agg(ordersLike, """[{"$project": {"a": 1, "b": 0}}]"""))
    intercept[GraftPlanError](agg(ordersLike, """[{"$group": {"nope": 1}}]"""))
  }

  test("query compiles to a declarative Filter in the analyzed plan") {
    // (the optimized plan folds LocalRelation inputs, so assert pre-fold)
    val plan = find(ordersLike, "query" -> """{"total": {"$gt": 100}}""").queryExecution
      .analyzed.toString
    assert(plan.contains("Filter"))
  }
}
