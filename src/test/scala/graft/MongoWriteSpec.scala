package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.config.Cfg
import graft.core.{GraftPlanError, StageContext}
import graft.operators._

/** MongoDB write family: update-operator compilation, first-match
  * restriction, upsert, replacement, bulkWrite sequencing. */
class MongoWriteSpec extends SparkSpec {
  import spark.implicits._

  private def coll: DataFrame = Seq(
    (1L, "a", 10.0, "x"),
    (2L, "b", 20.0, "y"),
    (3L, "a", 30.0, "z"),
    (4L, "c", 40.0, "w")
  ).toDF("_id", "cat", "price", "tag")

  private def run(stage: MongoWriteStage, cfg: (String, Any)*): DataFrame =
    stage(StageContext.one(spark, coll, Cfg.of(cfg: _*)))

  private def rows(df: DataFrame): Seq[(Long, String, Double, String)] =
    df.select("_id", "cat", "price", "tag").as[(Long, String, Double, String)]
      .collect().sortBy(_._1).toSeq

  test("update ops keep matching on ORIGINAL values when the filter column is updated") {
    // {price<=10} selects _id 1; $set resets price AND flags tag — both
    // must apply to the same original matches (regression: the second
    // withColumn used to re-resolve the predicate against the new price)
    val out = run(MongoUpdateManyOp,
      "query" -> """{"price": {"$lte": 10}}""",
      "update" -> """{"$set": {"price": 999.0, "tag": "was-cheap"}}""")
    assert(rows(out) === Seq(
      (1L, "a", 999.0, "was-cheap"), (2L, "b", 20.0, "y"),
      (3L, "a", 30.0, "z"), (4L, "c", 40.0, "w")))
    assert(!out.columns.contains("__graft_matched"))
  }

  test("updateMany $set/$inc only touch matching rows") {
    val out = run(MongoUpdateManyOp,
      "query" -> """{"cat": "a"}""",
      "update" -> """{"$set": {"tag": "hit"}, "$inc": {"price": 5}}""")
    assert(rows(out) === Seq(
      (1L, "a", 15.0, "hit"), (2L, "b", 20.0, "y"),
      (3L, "a", 35.0, "hit"), (4L, "c", 40.0, "w")))
  }

  test("updateMany $mul/$min/$max/$unset semantics") {
    val out = run(MongoUpdateManyOp,
      "query" -> """{"price": {"$gte": 20}}""",
      "update" -> """{"$mul": {"price": 2}, "$min": {"_id": 3}, "$unset": {"tag": ""}}""")
    val got = out.select("_id", "cat", "price", "tag")
      .as[(Long, String, Double, Option[String])].collect().sortBy(_._3).toSeq
    assert(got === Seq(
      (1L, "a", 10.0, Some("x")),       // unmatched, untouched
      (2L, "b", 40.0, None),            // 20*2, tag unset
      (3L, "a", 60.0, None),            // _id min(3,3)=3
      (3L, "c", 80.0, None)))           // _id min(4,3)=3
  }

  test("$set on a brand-new field adds a column, null for unmatched rows") {
    val out = run(MongoUpdateManyOp,
      "query" -> """{"cat": "b"}""",
      "update" -> """{"$set": {"flag": true}}""")
    val got = out.select("_id", "flag").as[(Long, Option[Boolean])].collect().toMap
    assert(got === Map(1L -> None, 2L -> Some(true), 3L -> None, 4L -> None))
  }

  test("$inc seeds a missing field with the increment (matched rows only)") {
    val out = run(MongoUpdateManyOp,
      "query" -> """{"cat": "a"}""",
      "update" -> """{"$inc": {"hits": 7}}""")
    val got = out.select("_id", "hits").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(7L), 2L -> None, 3L -> Some(7L), 4L -> None))
  }

  test("$rename moves the value for matched rows and nulls the old column") {
    val out = run(MongoUpdateManyOp,
      "query" -> """{"_id": {"$lte": 2}}""",
      "update" -> """{"$rename": {"tag": "label"}}""")
    val got = out.select("_id", "tag", "label")
      .as[(Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, None, Some("x")), (2L, None, Some("y")),
      (3L, Some("z"), None), (4L, Some("w"), None)))
  }

  test("updateOne touches exactly the first match by order_by") {
    val out = run(MongoUpdateOneOp,
      "query" -> """{"cat": "a"}""",
      "update" -> """{"$set": {"tag": "first"}}""")
    assert(rows(out) === Seq(
      (1L, "a", 10.0, "first"), (2L, "b", 20.0, "y"),
      (3L, "a", 30.0, "z"), (4L, "c", 40.0, "w")))
    assert(!out.columns.contains(MongoUpdateCompiler.firstHelper))
  }

  test("updateOne with a custom order_by picks by that column") {
    val out = run(MongoUpdateOneOp,
      "query" -> """{"cat": "a"}""",
      "update" -> """{"$set": {"tag": "first"}}""",
      "order_by" -> "price")
    assert(rows(out).map(_._4) === Seq("first", "y", "z", "w"))
  }

  test("updateOne on a missing order_by column raises a plan error") {
    val e = intercept[GraftPlanError] {
      run(MongoUpdateOneOp,
        "query" -> """{"cat": "a"}""",
        "update" -> """{"$set": {"tag": "t"}}""",
        "order_by" -> "nope")
    }
    assert(e.getMessage.contains("order_by"))
  }

  test("updateOne upsert inserts filter-equality + $set fields when nothing matches") {
    val out = run(MongoUpdateOneOp,
      "query" -> """{"cat": "zz", "price": {"$eq": 99.5}}""",
      "update" -> """{"$set": {"tag": "new"}, "$setOnInsert": {"_id": 9}}""",
      "upsert" -> true)
    assert(out.count() === 5)
    val added = out.filter(F.col("cat") === "zz")
      .select("_id", "price", "tag").as[(Long, Double, String)].head()
    assert(added === ((9L, 99.5, "new")))
  }

  test("upsert seeds arithmetic operators on the inserted doc ($inc/$mul/$min/$max)") {
    val out = run(MongoUpdateManyOp,
      "query" -> """{"cat": "zz"}""",
      "update" -> """{"$inc": {"price": 5}, "$mul": {"qty": 3}, "$max": {"score": 9}}""",
      "upsert" -> true)
    val added = out.filter(F.col("cat") === "zz")
      .select("price", "qty", "score").as[(Double, Long, Long)].head()
    assert(added === ((5.0, 0L, 9L))) // $inc seeds n, $mul seeds 0, $max seeds operand
  }

  test("upsert=false (default) leaves the collection unchanged on no match") {
    val out = run(MongoUpdateOneOp,
      "query" -> """{"cat": "zz"}""",
      "update" -> """{"$set": {"tag": "new"}}""")
    assert(rows(out) === rows(coll))
  }

  test("deleteMany removes all matches; deleteOne only the first") {
    val dm = run(MongoDeleteManyOp, "query" -> """{"cat": "a"}""")
    assert(rows(dm).map(_._1) === Seq(2L, 4L))
    val d1 = run(MongoDeleteOneOp, "query" -> """{"cat": "a"}""")
    assert(rows(d1).map(_._1) === Seq(2L, 3L, 4L))
    assert(!d1.columns.contains(MongoUpdateCompiler.firstHelper))
  }

  test("replaceOne replaces the first match wholesale, preserving the id") {
    val out = run(MongoReplaceOneOp,
      "query" -> """{"cat": "a"}""",
      "replacement" -> """{"cat": "R", "note": "swapped"}""")
    val got = out.select("_id", "cat", "price", "tag", "note")
      .as[(Long, String, Option[Double], Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got.head === ((1L, "R", None, None, Some("swapped"))))
    assert(got.tail.forall(_._5.isEmpty))
    assert(got(2) === ((3L, "a", Some(30.0), Some("z"), None)))
  }

  test("replaceMany replaces every match") {
    val out = run(MongoReplaceManyOp,
      "query" -> """{"cat": "a"}""",
      "replacement" -> """{"cat": "R"}""")
    val got = out.select("_id", "cat", "price").as[(Long, String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "R", None), (2L, "b", Some(20.0)), (3L, "R", None), (4L, "c", Some(40.0))))
  }

  test("insertOne / insertMany append documents with schema alignment") {
    val one = run(MongoInsertOneOp, "document" -> """{"_id": 5, "cat": "d"}""")
    assert(one.count() === 5)
    val added = one.filter(F.col("_id") === 5)
      .select("cat", "price").as[(String, Option[Double])].head()
    assert(added === (("d", None)))

    val many = run(MongoInsertManyOp,
      "documents" -> """[{"_id": 6, "price": 1.5}, {"_id": 7, "tag": "t7", "extra": "e"}]""")
    assert(many.count() === 6)
    assert(many.columns.contains("extra"))
    val got = many.filter(F.col("_id") >= 6)
      .select("_id", "price", "tag", "extra")
      .as[(Long, Option[Double], Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((6L, Some(1.5), None, None), (7L, None, Some("t7"), Some("e"))))
  }

  test("insertMany normalizes extended-JSON wrappers in config documents") {
    val out = run(MongoInsertManyOp,
      "documents" -> """[{"_id": {"$numberLong": "8"}, "price": {"$numberDouble": "2.5"}}]""")
    val added = out.filter(F.col("_id") === 8).select("price").as[Double].head()
    assert(added === 2.5)
  }

  test("bulkWrite applies operations in order as one plan") {
    val out = run(MongoBulkWriteOp,
      "operations" ->
        """[{"deleteMany": {"filter": {"cat": "c"}}},
          | {"updateMany": {"filter": {"cat": "a"}, "update": {"$inc": {"price": 1}}}},
          | {"insertOne": {"document": {"_id": 10, "cat": "n", "price": 0.5, "tag": "t"}}},
          | {"updateOne": {"filter": {"cat": "a"}, "update": {"$set": {"tag": "one"}}}}]""".stripMargin)
    assert(rows(out) === Seq(
      (1L, "a", 11.0, "one"), (2L, "b", 20.0, "y"),
      (3L, "a", 31.0, "z"), (10L, "n", 0.5, "t")))
  }

  test("write ops read and rewrite a dump-backed collection end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mw").toString
    val dump = dir + "/coll"
    coll.select(F.concat(
      F.lit("{\"_id\": {\"$numberLong\": \""), F.col("_id").cast("string"),
      F.lit("\"}, \"cat\": \""), F.col("cat"),
      F.lit("\", \"price\": "), F.col("price").cast("string"), F.lit("}")
    ).alias("value")).write.text(dump)
    val out = MongoUpdateManyOp(StageContext(spark, Seq.empty, Cfg.of(
      "path" -> dump,
      "query" -> """{"cat": "a"}""",
      "update" -> """{"$set": {"cat": "A"}}""")))
    val got = out.select("_id", "cat").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "A"), (2L, "b"), (3L, "A"), (4L, "c")))
    // insertMany in dump+input mode appends the input frame
    val appended = MongoInsertManyOp(StageContext.one(spark,
      Seq((9L, "z", 1.0)).toDF("_id", "cat", "price"),
      Cfg.of("path" -> dump)))
    assert(appended.count() === 5)
  }

  test("uri-only config still raises the connector gap error") {
    val e = intercept[GraftPlanError] {
      MongoUpdateManyOp(StageContext(spark, Seq.empty, Cfg.of(
        "uri" -> "mongodb://x", "database" -> "d", "collection" -> "c",
        "query" -> "{}", "update" -> """{"$set": {"a": 1}}""")))
    }
    assert(e.getMessage.contains("mongo-spark-connector"))
  }

  test("$currentDate is rejected as non-deterministic") {
    val e = intercept[GraftPlanError] {
      run(MongoUpdateManyOp, "query" -> "{}",
        "update" -> """{"$currentDate": {"ts": true}}""")
    }
    assert(e.getMessage.contains("currentDate"))
  }
}
