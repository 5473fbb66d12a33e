package graft

import graft.config.Cfg
import graft.core.StageContext
import graft.operators.MongoNormalizeOp

/** mongodb.normalize — extended-JSON rewrites, lenient fallbacks. */
class MongoNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(s: String, extra: (String, Any)*): String =
    MongoNormalizeOp(StageContext.one(spark, Seq(Tuple1(s)).toDF("j"),
      Cfg.of((Seq("column" -> "j"): Seq[(String, Any)]) ++ extra: _*)))
      .select("j").as[String].head()

  test("$oid / $numberLong / $numberInt / $numberDouble unwrap to scalars") {
    assert(run("""{"a": {"$oid": "507f1f77bcf86cd799439011"}}""") ===
      """{"a":"507f1f77bcf86cd799439011"}""")
    assert(run("""{"n": {"$numberLong": "9007199254740993"}}""") ===
      """{"n":9007199254740993}""")
    assert(run("""{"n": {"$numberInt": "42"}, "x": {"$numberDouble": "2.5"}}""") ===
      """{"n":42,"x":2.5}""")
  }

  test("$date: numberLong, RFC-3339 and bare-millis forms → epoch millis") {
    assert(run("""{"d": {"$date": {"$numberLong": "1234567890123"}}}""") ===
      """{"d":1234567890123}""")
    assert(run("""{"d": {"$date": "1970-01-01T00:00:01Z"}}""") === """{"d":1000}""")
    assert(run("""{"d": {"$date": 5000}}""") === """{"d":5000}""")
  }

  test("date_format=iso renders a fixed-width UTC timestamp") {
    assert(run("""{"d": {"$date": {"$numberLong": "1000"}}}""", "date_format" -> "iso") ===
      """{"d":"1970-01-01T00:00:01.000Z"}""")
  }

  test("nesting, arrays, and lenient fallbacks") {
    assert(run("""{"a": [{"$numberInt": "1"}, {"b": {"$numberLong": "2"}}]}""") ===
      """{"a":[1,{"b":2}]}""")
    // invalid oid (wrong length) stays a regular object
    assert(run("""{"a": {"$oid": "123"}}""") === """{"a":{"$oid":"123"}}""")
    // unparseable number stays wrapped
    assert(run("""{"n": {"$numberLong": "xx"}}""") === """{"n":{"$numberLong":"xx"}}""")
    // non-JSON passes through untouched
    assert(run("not json at all") === "not json at all")
    // non-finite $numberDouble is legal extended JSON but not a legal bare
    // JSON number — emitted quoted so the document stays parseable
    assert(run("""{"x": {"$numberDouble": "NaN"}}""") === """{"x":"NaN"}""")
    assert(run("""{"x": {"$numberDouble": "-Infinity"}}""") === """{"x":"-Infinity"}""")
  }
}
