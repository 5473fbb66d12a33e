package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.config._
import graft.core._
import graft.js.{JsArr, JsBool, JsNull, JsNum, JsObj, JsStr, JsVal}

/** MongoDB query-language compiler: Mongo filter documents and aggregation
  * pipelines → Catalyst plans.
  *
  * The reference forwards `query` / `pipeline` JSON straight to a Mongo
  * server (reference plugins/conveyor-plugin-mongodb/src/lib.rs:1201-1224
  * parse_query, :1041-1108 execute_aggregate_async) — the query SEMANTICS
  * live server-side. Here those semantics are compiled to native Spark
  * expressions, which makes the find/findOne/aggregate surface real and
  * testable offline:
  *
  *   - collection = a mongoexport-style extended-JSON .jsonl dump
  *     (`path = ...`); `{"$oid"}/{"$date"}/{"$numberLong"}` wrappers are
  *     normalized to scalars (MongoNormalizeOp) BEFORE schema inference,
  *     so `_id` is a string and `$date` a number, exactly as the driver
  *     presents them;
  *   - `query` filter docs compile to Column predicates (pushed to the
  *     scan by Catalyst — .explain shows PushedFilters on the normalized
  *     parquet path, and codegen'd filters over jsonl);
  *   - `pipeline` stages compile to filter/select/groupBy/sort/limit/
  *     offset/explode — one declarative plan, no per-stage collect;
  *   - on a real cluster the same compiler output applies unchanged on a
  *     `spark.read.format("mongodb")` frame (connector jar permitting —
  *     `uri` without `path` still raises the gap error naming it).
  *
  * Supported filter operators: equality, $eq $ne $gt $gte $lt $lte $in
  * $nin $exists $regex $mod $and $or $nor $not. Aggregation stages:
  * $match $project $addFields/$set $unset $group $sort $limit $skip
  * $count $unwind. Accumulators: $sum $avg $min $max $first $last $push
  * $addToSet $count. Expressions: "$field" refs, literals, $add $subtract
  * $multiply $divide $mod $concat $toUpper $toLower $ifNull $cond $abs
  * $floor $ceil $round $size $literal. Anything else raises a
  * GraftPlanError naming the unsupported operator.
  */
object MongoQuery {

  private def err(msg: String) = throw new GraftPlanError(s"mongodb query: $msg")

  /** Parse a config JSON string (TOML carries it as a string, matching the
    * reference's stringly config), normalizing extended-JSON wrappers. */
  def parseDoc(json: String): JsVal =
    JsVal.parseJson(MongoNormalizeOp.normalize(json, iso = false))

  // ------------------------------------------------------------- filters

  /** Compile a Mongo filter document to a boolean Column. */
  def compileFilter(doc: JsVal): Column = doc match {
    case o: JsObj =>
      val conjuncts = o.fields.map { case (k, v) => compileClause(k, v) }.toSeq
      if (conjuncts.isEmpty) F.lit(true) else conjuncts.reduce(_ && _)
    case _ => err("filter must be a JSON object")
  }

  private def compileClause(key: String, v: JsVal): Column = key match {
    case "$and" => andOf(v, "$and").reduce(_ && _)
    case "$or"  => andOf(v, "$or").reduce(_ || _)
    case "$nor" => !andOf(v, "$nor").reduce(_ || _)
    case "$not" => !compileFilter(v)
    case op if op.startsWith("$") => err(s"unsupported top-level operator '$op'")
    case field =>
      v match {
        case o: JsObj if o.fields.keys.exists(_.startsWith("$")) =>
          o.fields.map { case (op, operand) => fieldOp(field, op, operand) }
            .reduce(_ && _)
        case JsNull => F.col(field).isNull // Mongo: {f: null} matches null/missing
        case lit    => F.col(field) === toLit(lit)
      }
  }

  private def andOf(v: JsVal, op: String): Seq[Column] = v match {
    case a: JsArr if a.items.nonEmpty => a.items.toSeq.map(compileFilter)
    case _ => err(s"$op expects a non-empty array of filter documents")
  }

  private def fieldOp(field: String, op: String, operand: JsVal): Column = {
    val c = F.col(field)
    op match {
      case "$eq"  => operand match { case JsNull => c.isNull; case x => c === toLit(x) }
      case "$ne"  => operand match {
        case JsNull => c.isNotNull
        // Mongo $ne also matches docs missing the field (null here)
        case x      => c.isNull || c =!= toLit(x)
      }
      case "$gt"  => c > toLit(operand)
      case "$gte" => c >= toLit(operand)
      case "$lt"  => c < toLit(operand)
      case "$lte" => c <= toLit(operand)
      case "$in" => operand match {
        case a: JsArr =>
          val (nulls, rest) = a.items.toSeq.partition(_ == JsNull)
          val base = if (rest.nonEmpty) c.isin(rest.map(litValue): _*) else F.lit(false)
          if (nulls.nonEmpty) base || c.isNull else base
        case _ => err("$in expects an array")
      }
      case "$nin" => operand match {
        case a: JsArr =>
          val rest = a.items.toSeq.filter(_ != JsNull)
          val notIn = if (rest.nonEmpty) !c.isin(rest.map(litValue): _*) else F.lit(true)
          // Mongo $nin matches missing-field docs too unless null is listed
          if (a.items.contains(JsNull)) notIn && c.isNotNull else notIn || c.isNull
        case _ => err("$nin expects an array")
      }
      case "$exists" => operand match {
        case JsBool(true)  => c.isNotNull
        case JsBool(false) => c.isNull
        case _ => err("$exists expects true|false")
      }
      case "$regex" => operand match {
        case JsStr(p) => c.rlike(p)
        case _        => err("$regex expects a string pattern")
      }
      case "$mod" => operand match {
        case a: JsArr if a.items.length == 2 =>
          (c % toLit(a.items(0))) === toLit(a.items(1))
        case _ => err("$mod expects [divisor, remainder]")
      }
      case "$not" => operand match {
        case o: JsObj => !o.fields.map { case (innerOp, innerV) => fieldOp(field, innerOp, innerV) }.reduce(_ && _)
        case _        => err("field-level $not expects an operator document")
      }
      case other => err(s"unsupported filter operator '$other' on field '$field'")
    }
  }

  private[operators] def litValue(v: JsVal): Any = v match {
    case JsNum(d)  => if (d == Math.floor(d) && Math.abs(d) < 1e15) d.toLong else d
    case JsStr(s)  => s
    case JsBool(b) => b
    case JsNull    => null
    case a: JsArr  => a.items.toSeq.map(litValue)
    case other     => err(s"unsupported literal ${JsVal.typeOf(other)}")
  }
  private def toLit(v: JsVal): Column = F.lit(litValue(v))

  // --------------------------------------------------------- expressions

  /** Compile a Mongo aggregation expression ("$field", literal, or
    * operator document) to a Column. */
  def compileExpr(v: JsVal): Column = v match {
    case JsStr(s) if s.startsWith("$") => F.col(s.drop(1))
    case JsStr(s)  => F.lit(s)
    case JsNum(_) | JsBool(_) | JsNull => toLit(v)
    case a: JsArr  => err("bare arrays are not valid aggregation expressions")
    case o: JsObj if o.fields.size == 1 =>
      val (op, operand) = o.fields.head
      def args2(name: String): (Column, Column) = operand match {
        case a: JsArr if a.items.length == 2 => (compileExpr(a.items(0)), compileExpr(a.items(1)))
        case _ => err(s"$name expects a 2-element array")
      }
      def argsN: Seq[Column] = operand match {
        case a: JsArr => a.items.toSeq.map(compileExpr)
        case single   => Seq(compileExpr(single))
      }
      op match {
        case "$literal"  => toLit(operand)
        case "$add"      => argsN.reduce(_ + _)
        case "$subtract" => val (a, b) = args2("$subtract"); a - b
        case "$multiply" => argsN.reduce(_ * _)
        case "$divide"   => val (a, b) = args2("$divide"); a / b
        case "$mod"      => val (a, b) = args2("$mod"); a % b
        case "$concat"   => F.concat(argsN: _*)
        case "$toUpper"  => F.upper(compileExpr(operand))
        case "$toLower"  => F.lower(compileExpr(operand))
        case "$abs"      => F.abs(compileExpr(operand))
        case "$floor"    => F.floor(compileExpr(operand))
        case "$ceil"     => F.ceil(compileExpr(operand))
        case "$round"    => operand match {
          case a: JsArr if a.items.length == 2 =>
            F.round(compileExpr(a.items(0)), toNumber(a.items(1)).toInt)
          case single => F.round(compileExpr(single))
        }
        case "$size"     => F.size(compileExpr(operand))
        case "$ifNull"   => F.coalesce(argsN: _*)
        case "$cond"     => operand match {
          case a: JsArr if a.items.length == 3 =>
            F.when(compileCondExpr(a.items(0)), compileExpr(a.items(1)))
              .otherwise(compileExpr(a.items(2)))
          case o2: JsObj =>
            F.when(compileCondExpr(o2.fields.getOrElse("if", err("$cond needs 'if'"))),
                compileExpr(o2.fields.getOrElse("then", err("$cond needs 'then'"))))
              .otherwise(compileExpr(o2.fields.getOrElse("else", err("$cond needs 'else'"))))
          case _ => err("$cond expects [if, then, else] or {if, then, else}")
        }
        case "$eq" | "$ne" | "$gt" | "$gte" | "$lt" | "$lte" =>
          val (a, b) = args2(op)
          op match {
            case "$eq" => a === b; case "$ne" => a =!= b
            case "$gt" => a > b;   case "$gte" => a >= b
            case "$lt" => a < b;   case _ => a <= b
          }
        case "$and" => argsN.reduce(_ && _)
        case "$or"  => argsN.reduce(_ || _)
        case "$not" => !compileCondExpr(operand match {
          case arr: JsArr if arr.items.length == 1 => arr.items(0)
          case single => single
        })
        case other => err(s"unsupported aggregation expression operator '$other'")
      }
    case o: JsObj => err(s"expression object must have exactly one $$operator key, got ${o.fields.keys.mkString(",")}")
    case other => err(s"unsupported expression ${JsVal.typeOf(other)}")
  }

  /** Comparison-position expression ($cond if / $not) — same compiler, but
    * a bare "$field" ref is used as a boolean. */
  private def compileCondExpr(v: JsVal): Column = compileExpr(v)

  private def toNumber(v: JsVal): Double = v match {
    case JsNum(d) => d
    case other    => err(s"expected a number, got ${JsVal.typeOf(other)}")
  }

  // ------------------------------------------------------------ pipeline

  /** Apply a Mongo aggregation pipeline (JSON array of stage docs) to a
    * DataFrame. */
  def applyPipeline(df: DataFrame, pipelineJson: String): DataFrame = {
    val stages = parseDoc(pipelineJson) match {
      case a: JsArr => a.items.toSeq
      case _        => err("pipeline must be a JSON array of stages")
    }
    stages.foldLeft(df) { (cur, stage) =>
      stage match {
        case o: JsObj if o.fields.size == 1 =>
          val (op, spec) = o.fields.head
          applyStage(cur, op, spec)
        case _ => err("each pipeline stage must be a single-key object like {\"$match\": {...}}")
      }
    }
  }

  private def applyStage(df: DataFrame, op: String, spec: JsVal): DataFrame = op match {
    case "$match" => df.filter(compileFilter(spec))
    case "$limit" => df.limit(toNumber(spec).toInt)
    case "$skip"  => df.offset(toNumber(spec).toInt)
    case "$count" => spec match {
      case JsStr(name) => df.agg(F.count(F.lit(1)).alias(name))
      case _           => err("$count expects a string field name")
    }
    case "$sort" => spec match {
      case o: JsObj if o.fields.nonEmpty =>
        val keys = o.fields.map {
          case (f, JsNum(1.0))  => F.col(f).asc
          case (f, JsNum(-1.0)) => F.col(f).desc
          case (f, other)       => err(s"$$sort direction for '$f' must be 1 or -1")
        }.toSeq
        df.orderBy(keys: _*)
      case _ => err("$sort expects {field: 1|-1, ...}")
    }
    case "$project" => spec match {
      case o: JsObj if o.fields.nonEmpty =>
        def isExclude(v: JsVal) = v == JsNum(0.0) || v == JsBool(false)
        def isInclude(v: JsVal) = v == JsNum(1.0) || v == JsBool(true)
        // `_id: 0` is special: Mongo allows it INSIDE an inclusion
        // projection, and _id is included by default otherwise
        val idExcluded = o.fields.get("_id").exists(isExclude)
        val rest = o.fields.filter(_._1 != "_id")
        val excludes = rest.collect { case (f, v) if isExclude(v) => f }.toSeq
        if (excludes.nonEmpty) {
          val bad = rest.collect { case (f, v) if !isExclude(v) => f }
          if (bad.nonEmpty) err(s"$$project cannot mix exclusion with inclusion (${bad.mkString(",")})")
          df.drop(excludes ++ (if (idExcluded) Seq("_id") else Seq.empty): _*)
        } else if (rest.isEmpty && idExcluded) {
          df.drop("_id")
        } else {
          val named = rest.map {
            case (f, v) if isInclude(v) => F.col(f)
            case (f, expr)              => compileExpr(expr).alias(f)
          }.toSeq
          // _id handling: explicit expression wins; otherwise included by
          // default when the frame has it and `_id: 0` wasn't given
          val idCol = o.fields.get("_id") match {
            case Some(v) if isExclude(v) => Seq.empty
            case Some(v) if isInclude(v) => Seq(F.col("_id"))
            case Some(expr)              => Seq(compileExpr(expr).alias("_id"))
            case None if df.columns.contains("_id") => Seq(F.col("_id"))
            case None => Seq.empty
          }
          df.select(idCol ++ named: _*)
        }
      case _ => err("$project expects a projection document")
    }
    case "$addFields" | "$set" => spec match {
      case o: JsObj =>
        o.fields.foldLeft(df) { case (cur, (f, expr)) => cur.withColumn(f, compileExpr(expr)) }
      case _ => err(s"$op expects a document of field: expression")
    }
    case "$unset" => spec match {
      case JsStr(f) => df.drop(f)
      case a: JsArr => df.drop(a.items.toSeq.map {
        case JsStr(f) => f
        case other    => err("$unset expects field name strings")
      }: _*)
      case _ => err("$unset expects a field name or array of names")
    }
    case "$unwind" => spec match {
      case JsStr(path) if path.startsWith("$") =>
        val f = path.drop(1)
        df.withColumn(f, F.explode(F.col(f)))
      case o: JsObj =>
        o.fields.get("path") match {
          case Some(JsStr(path)) if path.startsWith("$") =>
            val f = path.drop(1)
            val keepNull = o.fields.get("preserveNullAndEmptyArrays").contains(JsBool(true))
            df.withColumn(f, if (keepNull) F.explode_outer(F.col(f)) else F.explode(F.col(f)))
          case _ => err("$unwind expects {path: \"$field\"}")
        }
      case _ => err("$unwind expects \"$field\"")
    }
    case "$group" => spec match {
      case o: JsObj =>
        val idSpec = o.fields.getOrElse("_id", err("$group requires _id"))
        val accs = o.fields.toSeq.filter(_._1 != "_id").map {
          case (name, acc: JsObj) if acc.fields.size == 1 =>
            val (accOp, operand) = acc.fields.head
            (name, compileAccumulator(accOp, operand, name))
          case (name, _) => err(s"$$group accumulator '$name' must be a single-key {$$op: expr} document")
        }
        // no accumulators = pure distinct: {$group: {_id: "$f"}}
        if (accs.isEmpty)
          groupFrame(df, idSpec).agg(F.count(F.lit(1)).alias("__n")).drop("__n")
        else
          groupFrame(df, idSpec).agg(accs.head._2, accs.tail.map(_._2): _*)
      case _ => err("$group expects a document")
    }
    case other => err(s"unsupported pipeline stage '$other'")
  }

  /** Build the grouped frame with the `_id` output column(s). */
  private def groupFrame(df: DataFrame, idSpec: JsVal) = idSpec match {
    case JsNull => df.groupBy(F.lit(null).cast("string").alias("_id"))
    case JsStr(s) if s.startsWith("$") => df.groupBy(F.col(s.drop(1)).alias("_id"))
    case o: JsObj => // compound key → struct column named _id
      val parts = o.fields.map { case (k, expr) => compileExpr(expr).alias(k) }.toSeq
      df.groupBy(F.struct(parts: _*).alias("_id"))
    case lit => df.groupBy(toLit(lit).alias("_id"))
  }

  private def compileAccumulator(op: String, operand: JsVal, name: String): Column = {
    def e = compileExpr(operand)
    val c = op match {
      case "$sum" => operand match {
        case JsNum(1.0) => F.count(F.lit(1)) // the idiomatic doc-count
        case _          => F.sum(e)
      }
      case "$avg"      => F.avg(e)
      case "$min"      => F.min(e)
      case "$max"      => F.max(e)
      case "$first"    => F.first(e, ignoreNulls = false)
      case "$last"     => F.last(e, ignoreNulls = false)
      case "$push"     => F.collect_list(e)
      case "$addToSet" => F.collect_set(e)
      case "$count"    => F.count(F.lit(1))
      case "$stdDevPop"  => F.stddev_pop(e)
      case "$stdDevSamp" => F.stddev_samp(e)
      case other => err(s"unsupported accumulator '$other' for '$name'")
    }
    c.alias(name)
  }
}

/** Collection resolution shared by the read AND write stages: a
  * mongoexport-style extended-JSON dump (`path`), an input frame
  * (transform mode), or — `uri` with no offline substitute — the gap
  * error naming the enabling connector jar. */
private[operators] object MongoCollection {
  def resolve(ctx: StageContext, name: String): DataFrame = {
    ctx.cfg.strOpt("path") match {
      case Some(path) =>
        import ctx.spark.implicits._
        val raw = ctx.spark.read.textFile(path)
        val normalized = raw.map(line => MongoNormalizeOp.normalize(line, iso = false))
        ctx.cfg.strOpt("schema") match {
          case Some(ddl) => // single pass — no inference job
            val fields = org.apache.spark.sql.types.StructType.fromDDL(ddl)
            ctx.spark.read.schema(fields).json(normalized)
          case None => ctx.spark.read.json(normalized)
        }
      case None if !ctx.noInputs => ctx.primary // transform mode: query the input frame
      case None =>
        ctx.cfg.str("uri") // enforce the reference's config contract
        ctx.cfg.str("database"); ctx.cfg.str("collection")
        throw new GraftPlanError(
          s"$name: live server mode requires mongo-spark-connector on the classpath " +
          "(not in this offline build). Offline modes available TODAY: " +
          "path = <extended-JSON .jsonl dump> (mongoexport format), or feed the " +
          "stage an input frame to query it in place.")
    }
  }
}

/** Shared scaffolding for the find/findOne/aggregate stages: resolve the
  * collection frame (dump file or error naming the connector jar), then
  * compile the configured query surface. */
abstract class MongoReadStage(val name: String) extends Stage {
  val kind = StageKind.Source

  protected def collection(ctx: StageContext): DataFrame =
    MongoCollection.resolve(ctx, name)

  protected def applyFind(ctx: StageContext, one: Boolean): DataFrame = {
    var df = collection(ctx)
    ctx.cfg.strOpt("query").foreach { q =>
      df = df.filter(MongoQuery.compileFilter(MongoQuery.parseDoc(q)))
    }
    // Mongo evaluation order: sort/skip/limit act on full documents; the
    // projection applies LAST (sorting by an unprojected field is legal)
    ctx.cfg.strOpt("sort").foreach { s =>
      df = MongoQuery.applyPipeline(df, s"""[{"$$sort": $s}]""")
    }
    ctx.cfg.doubleOpt("skip").foreach(n => df = df.offset(n.toInt))
    if (one) df = df.limit(1)
    else ctx.cfg.doubleOpt("limit").foreach(n => df = df.limit(n.toInt))
    ctx.cfg.strOpt("projection").foreach { p =>
      df = MongoQuery.applyPipeline(df, s"""[{"$$project": $p}]""")
    }
    df
  }
}

/** mongodb.find — filter/projection/sort/limit/skip over a collection
  * (reference lib.rs:100-180 execute_find_async; its `query`/`limit`
  * config keys, plus the standard find options). */
object MongoFindSource extends MongoReadStage("mongodb.find") {
  def apply(ctx: StageContext): DataFrame = applyFind(ctx, one = false)
}

/** mongodb.findOne — find with limit 1 (reference lib.rs:183-230). */
object MongoFindOneSource extends MongoReadStage("mongodb.findOne") {
  def apply(ctx: StageContext): DataFrame = applyFind(ctx, one = true)
}

/** mongodb.aggregate — aggregation pipeline (reference lib.rs:1041-1130). */
object MongoAggregateSource extends MongoReadStage("mongodb.aggregate") {
  def apply(ctx: StageContext): DataFrame =
    MongoQuery.applyPipeline(collection(ctx), ctx.cfg.str("pipeline"))
}
