package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.NullType
import graft.config._
import graft.core._
import graft.js.{JsArr, JsBool, JsNull, JsNum, JsObj, JsStr, JsVal}

/** MongoDB write family, implemented natively: update documents compile to
  * Catalyst column rewrites over a file-backed (or in-flight) collection.
  *
  * The reference forwards each write op to a live server (reference
  * plugins/conveyor-plugin-mongodb/src/lib.rs:24-38 op enum; :232-420
  * execute_insert/update/delete/replace) — the WRITE semantics live
  * server-side. Here those semantics are the transform: every stage takes
  * the collection (a mongoexport extended-JSON dump via `path`, or the
  * input frame), applies the op, and RETURNS the updated collection as a
  * DataFrame, so a pipeline can chain writes and land the result with any
  * sink (`json.write format=jsonl` re-creates a mongoexport dump). `uri`
  * without an offline substitute still raises the gap error naming
  * mongo-spark-connector, preserving the live-server contract.
  *
  * Semantics (documented deviations from a live server):
  *   - Collections are columnar: "removing a field" ($unset, replacement)
  *     sets the column to NULL rather than dropping a per-document key.
  *   - *One ops pick the first match by the `order_by` column (default
  *     `_id`) instead of natural insertion order, which Spark does not
  *     have. `order_by` should be unique (like `_id`); on ties every tied
  *     row is affected.
  *   - $currentDate is rejected (non-deterministic; breaks replayable
  *     plans). Pipelines can $set an explicit timestamp instead.
  *
  * Scale shape: updateMany/deleteMany/replaceMany are pure narrow
  * projections/filters (zero shuffle, codegen'd CASE WHEN). The *One ops
  * add one tiny aggregate (min of the order column over matches) that is
  * broadcast back — no wide exchange of the collection itself. Upsert
  * needs a bounded existence probe (`limit(1).count()`), the same
  * loud-and-bounded pattern as json.write's driver_limit.
  *
  * Update operators: $set $unset $inc $mul $min $max $rename.
  * Filters: the full MongoQuery.compileFilter surface.
  */
object MongoUpdateCompiler {

  private def err(msg: String) = throw new GraftPlanError(s"mongodb update: $msg")

  private def colOrNull(df: DataFrame, f: String): Column =
    if (df.columns.contains(f)) df(f) else F.lit(null)

  private def opFields(op: String, spec: JsVal): Seq[(String, JsVal)] = spec match {
    case o: JsObj => o.fields.toSeq
    case _        => err(s"$op expects a {field: value} document")
  }

  /** True where the filter matches — null-safe (Mongo predicates never
    * evaluate to "unknown"; a doc either matches or it doesn't). */
  def matchedCol(filterDoc: JsVal): Column =
    F.coalesce(MongoQuery.compileFilter(filterDoc), F.lit(false))

  /** Apply an update document ({$set: {...}, $inc: {...}, ...}) to the
    * rows where `matched` holds; all rows are kept.
    *
    * The predicate is MATERIALIZED into a helper column first: `matched`
    * is an unresolved column expression, and the per-field withColumn
    * rewrites would otherwise re-resolve it against already-updated
    * values when an update op touches a column the filter references
    * ({qty: {$lte: 0}} + {$set: {qty: 5, status: "restocked"}} must
    * restock the status of the SAME rows whose qty it just reset). */
  def applyUpdate(df: DataFrame, matchedExpr: Column, update: JsObj): DataFrame = {
    val flag = "__graft_matched"
    val base = df.withColumn(flag, matchedExpr)
    val matched = F.col(flag)
    update.fields.foldLeft(base) { case (cur, (op, spec)) =>
      op match {
        case "$set" =>
          opFields(op, spec).foldLeft(cur) { case (d, (f, v)) =>
            d.withColumn(f, F.when(matched, F.lit(MongoQuery.litValue(v))).otherwise(colOrNull(d, f)))
          }
        case "$unset" =>
          opFields(op, spec).foldLeft(cur) { case (d, (f, _)) =>
            if (d.columns.contains(f)) d.withColumn(f, F.when(matched, F.lit(null)).otherwise(d(f)))
            else d // unsetting a missing field is a no-op (Mongo semantics)
          }
        case "$inc" | "$mul" =>
          opFields(op, spec).foldLeft(cur) { case (d, (f, v)) =>
            val n = F.lit(MongoQuery.litValue(v))
            // Mongo: $inc on a missing field seeds it with the increment;
            // $mul seeds it with 0
            val updated =
              if (op == "$inc") F.coalesce(colOrNull(d, f), F.lit(0)) + n
              else F.coalesce(colOrNull(d, f), F.lit(0)) * n
            d.withColumn(f, F.when(matched, updated).otherwise(colOrNull(d, f)))
          }
        case "$min" | "$max" =>
          opFields(op, spec).foldLeft(cur) { case (d, (f, v)) =>
            val n = F.lit(MongoQuery.litValue(v))
            // least/greatest skip nulls → a missing field takes the operand,
            // exactly Mongo's "sets the field if absent"
            val updated = if (op == "$min") F.least(colOrNull(d, f), n) else F.greatest(colOrNull(d, f), n)
            d.withColumn(f, F.when(matched, updated).otherwise(colOrNull(d, f)))
          }
        case "$rename" =>
          opFields(op, spec).foldLeft(cur) { case (d, (f, v)) =>
            val newName = v match {
              case JsStr(s) => s
              case _        => err("$rename expects {old: \"new\"} with a string target")
            }
            val oldVal = colOrNull(d, f)
            val d2 = d.withColumn(newName, F.when(matched, oldVal).otherwise(colOrNull(d, newName)))
            if (d2.columns.contains(f) && f != newName)
              d2.withColumn(f, F.when(matched, F.lit(null)).otherwise(d2(f)))
            else d2
          }
        case "$currentDate" =>
          err("$currentDate is non-deterministic and unsupported; $set an explicit timestamp")
        case other => err(s"unsupported update operator '$other'")
      }
    }.drop(flag)
  }

  /** Replace matched rows wholesale with `replacement`; the `idCol`
    * (Mongo: _id) survives the replacement, everything else not named in
    * the replacement becomes NULL. */
  def applyReplace(df: DataFrame, matched: Column, replacement: JsObj, idCol: String): DataFrame = {
    val rep = replacement.fields
    val extra = rep.keys.filterNot(df.columns.contains).toSeq
    val outCols = df.columns.toSeq ++ extra
    df.select(outCols.map { c =>
      val orig = colOrNull(df, c)
      val repV: Column = rep.get(c) match {
        case Some(v)              => F.lit(MongoQuery.litValue(v))
        case None if c == idCol   => orig
        case None                 => F.lit(null)
      }
      F.when(matched, repV).otherwise(orig).alias(c)
    }: _*)
  }

  /** Build the "first matching document" predicate: min of the order
    * column over matches, broadcast back as a scalar — no wide shuffle.
    * Returns (frame-with-helper-column, restricted predicate). Callers
    * must drop [[firstHelper]] when done. */
  val firstHelper = "__graft_first"
  def restrictToFirst(df: DataFrame, matched: Column, ord: String, name: String): (DataFrame, Column) = {
    if (!df.columns.contains(ord))
      throw new GraftPlanError(
        s"$name: order_by column '$ord' is not in the collection " +
        s"(${df.columns.mkString(", ")}); set order_by to a unique key column")
    val firstDf = df.filter(matched).agg(F.min(F.col(ord)).alias(firstHelper))
    val joined = df.crossJoin(F.broadcast(firstDf))
    (joined, matched && F.col(ord) === F.col(firstHelper))
  }

  /** Parse config JSON that must be a document. */
  def doc(json: String, what: String): JsObj = MongoQuery.parseDoc(json) match {
    case o: JsObj => o
    case _        => err(s"$what must be a JSON document")
  }

  /** Construct a frame of documents (config JSON) aligned to the
    * collection's schema: overlapping columns cast to the collection's
    * types, brand-new all-null columns cast to string so they survive
    * parquet. Nested documents are supported (spark.read.json on the
    * normalized lines — docs are config-sized, inference is driver-cheap). */
  def docsFrame(ctx: StageContext, docs: Seq[JsVal], template: DataFrame): DataFrame = {
    import ctx.spark.implicits._
    val lines = docs.map {
      case o: JsObj => JsVal.stringify(o)
      case other    => err(s"insert expects documents, got ${JsVal.typeOf(other)}")
    }
    val parsed = ctx.spark.read.json(ctx.spark.createDataset(lines))
    parsed.select(parsed.columns.toSeq.map { c =>
      template.schema.fields.find(_.name == c) match {
        case Some(f) => F.col(c).cast(f.dataType).alias(c)
        case None =>
          val dt = parsed.schema(c).dataType
          if (dt == NullType) F.col(c).cast("string").alias(c) else F.col(c)
      }
    }: _*)
  }

  /** Append docs to the collection (insertOne/insertMany and the upsert
    * path). Union is by name; fields missing on either side become NULL. */
  def insertDocs(ctx: StageContext, coll: DataFrame, docs: Seq[JsVal]): DataFrame =
    coll.unionByName(docsFrame(ctx, docs, coll), allowMissingColumns = true)

  /** The document an upsert inserts when nothing matched: equality fields
    * from the filter, then every update operator applied to that base doc
    * (Mongo's documented upsert composition): $set/$setOnInsert write
    * values, $inc seeds the increment, $mul seeds 0, $min/$max seed the
    * operand, $rename moves an equality field. */
  def upsertDoc(filter: JsObj, update: JsObj): JsObj = {
    val out = JsObj.empty
    filter.fields.foreach {
      case (k, _) if k.startsWith("$") => // $and/$or etc contribute nothing
      case (k, o: JsObj) =>
        o.fields.get("$eq").foreach(v => out.fields.update(k, v))
      case (k, v) => out.fields.update(k, v)
    }
    update.fields.foreach {
      case ("$set" | "$setOnInsert", o: JsObj) =>
        o.fields.foreach { case (k, v) => out.fields.update(k, v) }
      case ("$inc", o: JsObj) => // missing field + $inc n → n
        o.fields.foreach { case (k, v) => out.fields.update(k, v) }
      case ("$mul", o: JsObj) => // missing field + $mul → 0
        o.fields.foreach { case (k, _) => out.fields.update(k, JsNum(0)) }
      case ("$min" | "$max", o: JsObj) => // missing field takes the operand
        o.fields.foreach { case (k, v) => out.fields.update(k, v) }
      case ("$rename", o: JsObj) =>
        o.fields.foreach {
          case (from, JsStr(to)) =>
            out.fields.remove(from).foreach(v => out.fields.update(to, v))
          case _ =>
        }
      case _ => // $unset on a missing field is a no-op
    }
    out
  }

  /** Bounded existence probe for upsert — limit(1) keeps the action tiny. */
  def anyMatch(df: DataFrame, matched: Column): Boolean =
    df.filter(matched).limit(1).count() > 0
}

/** Shared scaffolding: resolve the collection, run one write op. */
abstract class MongoWriteStage(val name: String) extends Stage {
  val kind = StageKind.Transform
  import MongoUpdateCompiler._

  protected def coll(ctx: StageContext): DataFrame = MongoCollection.resolve(ctx, name)
  protected def ordCol(ctx: StageContext): String = ctx.cfg.strOr("order_by", "_id")
  protected def filterDoc(ctx: StageContext): JsObj =
    doc(ctx.cfg.strOr("query", "{}"), "query")

  /** One write op against an explicit collection — shared with bulkWrite. */
  def applyTo(ctx: StageContext, collection: DataFrame): DataFrame

  def apply(ctx: StageContext): DataFrame = applyTo(ctx, coll(ctx))
}

/** mongodb.insertOne — append one config document (reference lib.rs:232-260). */
object MongoInsertOneOp extends MongoWriteStage("mongodb.insertOne") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame =
    insertDocs(ctx, c, Seq(MongoQuery.parseDoc(ctx.cfg.str("document"))))
}

/** mongodb.insertMany — append config documents, or (with `path` set and
  * an input frame present) append the input frame to the dump-backed
  * collection (reference lib.rs:262-300). */
object MongoInsertManyOp extends MongoWriteStage("mongodb.insertMany") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame =
    ctx.cfg.strOpt("documents") match {
      case Some(json) => MongoQuery.parseDoc(json) match {
        case a: JsArr => insertDocs(ctx, c, a.items.toSeq)
        case _ => throw new GraftPlanError("mongodb.insertMany: documents must be a JSON array")
      }
      case None if ctx.cfg.has("path") && !ctx.noInputs =>
        c.unionByName(ctx.primary, allowMissingColumns = true)
      case None => throw new GraftPlanError(
        "mongodb.insertMany: provide documents = <JSON array>, or path = <dump> " +
        "plus an input frame of rows to insert")
    }
}

/** mongodb.updateMany — update every matching document (reference
  * lib.rs:302-340). Config: query, update, upsert. */
object MongoUpdateManyOp extends MongoWriteStage("mongodb.updateMany") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame = {
    val filter = filterDoc(ctx)
    val update = doc(ctx.cfg.str("update"), "update")
    val matched = matchedCol(filter)
    if (ctx.cfg.boolOr("upsert", false) && !anyMatch(c, matched))
      insertDocs(ctx, c, Seq(upsertDoc(filter, update)))
    else applyUpdate(c, matched, update)
  }
}

/** mongodb.updateOne — update the first match by order_by (reference
  * lib.rs:302-340 update with multi=false). */
object MongoUpdateOneOp extends MongoWriteStage("mongodb.updateOne") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame = {
    val filter = filterDoc(ctx)
    val update = doc(ctx.cfg.str("update"), "update")
    val matched = matchedCol(filter)
    if (ctx.cfg.boolOr("upsert", false) && !anyMatch(c, matched))
      insertDocs(ctx, c, Seq(upsertDoc(filter, update)))
    else {
      val (joined, first) = restrictToFirst(c, matched, ordCol(ctx), name)
      applyUpdate(joined, first, update).drop(firstHelper)
    }
  }
}

/** mongodb.deleteMany — drop every matching document (reference lib.rs:342-370). */
object MongoDeleteManyOp extends MongoWriteStage("mongodb.deleteMany") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame =
    c.filter(!matchedCol(doc(ctx.cfg.str("query"), "query")))
}

/** mongodb.deleteOne — drop the first match by order_by. */
object MongoDeleteOneOp extends MongoWriteStage("mongodb.deleteOne") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame = {
    val matched = matchedCol(doc(ctx.cfg.str("query"), "query"))
    val (joined, first) = restrictToFirst(c, matched, ordCol(ctx), name)
    joined.filter(!F.coalesce(first, F.lit(false))).drop(firstHelper)
  }
}

/** mongodb.replaceOne — replace the first match wholesale, preserving the
  * order/id column (reference lib.rs:372-400). Config: query, replacement,
  * upsert. */
object MongoReplaceOneOp extends MongoWriteStage("mongodb.replaceOne") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame = {
    val filter = filterDoc(ctx)
    val replacement = doc(ctx.cfg.str("replacement"), "replacement")
    val matched = matchedCol(filter)
    if (ctx.cfg.boolOr("upsert", false) && !anyMatch(c, matched))
      insertDocs(ctx, c, Seq(upsertDoc(filter, JsObj("$set" -> replacement))))
    else {
      val ord = ordCol(ctx)
      val (joined, first) = restrictToFirst(c, matched, ord, name)
      applyReplace(joined, first, replacement, ord).drop(firstHelper)
    }
  }
}

/** mongodb.replaceMany — the reference's non-standard bulk replace
  * (lib.rs:24-38 op enum): every match replaced with the same document. */
object MongoReplaceManyOp extends MongoWriteStage("mongodb.replaceMany") {
  import MongoUpdateCompiler._
  def applyTo(ctx: StageContext, c: DataFrame): DataFrame =
    applyReplace(c, matchedCol(filterDoc(ctx)),
      doc(ctx.cfg.str("replacement"), "replacement"), ordCol(ctx))
}

/** mongodb.bulkWrite — a JSON array of write ops applied in order
  * (reference lib.rs:402-420), each a single-key document:
  * {"insertOne": {"document": {...}}}, {"updateMany": {"filter": ...,
  * "update": ...}}, {"deleteOne": {"filter": ...}}, ... The fold threads
  * one growing Catalyst plan — no per-op materialization. */
object MongoBulkWriteOp extends MongoWriteStage("mongodb.bulkWrite") {
  import MongoUpdateCompiler._

  private def err(msg: String) = throw new GraftPlanError(s"mongodb.bulkWrite: $msg")

  def applyTo(ctx: StageContext, c: DataFrame): DataFrame = {
    val ops = MongoQuery.parseDoc(ctx.cfg.str("operations")) match {
      case a: JsArr => a.items.toSeq
      case _        => err("operations must be a JSON array")
    }
    val ord = ordCol(ctx)
    ops.foldLeft(c) { (cur, opDoc) =>
      val (op, spec) = opDoc match {
        case o: JsObj if o.fields.size == 1 => o.fields.head
        case _ => err("each operation must be a single-key document like {\"updateMany\": {...}}")
      }
      val s = spec match { case o: JsObj => o; case _ => err(s"$op spec must be a document") }
      def field(k: String): JsObj = s.fields.get(k) match {
        case Some(o: JsObj) => o
        case Some(_)        => err(s"$op.$k must be a document")
        case None           => err(s"$op requires '$k'")
      }
      def filterOf = s.fields.get("filter").orElse(s.fields.get("query")) match {
        case Some(o: JsObj) => o
        case _              => err(s"$op requires a 'filter' document")
      }
      def upsert = s.fields.get("upsert").contains(JsBool(true))
      // an upsert op runs an existence probe NOW; persist the accumulated
      // lineage first or the probe re-reads and re-rewrites the whole
      // chain from the source files (and so would the next probe). Release
      // when the surrounding pipeline finishes (success or failure);
      // direct invocation keeps it pinned for the caller's lazy result
      // (bounded: the collection frame, evictable).
      def probed: DataFrame = {
        if (upsert) { cur.persist(); ctx.deferToCleanup(() => cur.unpersist(blocking = false)) }
        cur
      }
      op match {
        case "insertOne" => insertDocs(ctx, cur, Seq(field("document")))
        case "insertMany" => s.fields.get("documents") match {
          case Some(a: JsArr) => insertDocs(ctx, cur, a.items.toSeq)
          case _              => err("insertMany requires 'documents' array")
        }
        case "updateMany" | "updateOne" =>
          val filter = filterOf
          val update = field("update")
          val matched = matchedCol(filter)
          if (upsert && !anyMatch(probed, matched))
            insertDocs(ctx, cur, Seq(upsertDoc(filter, update)))
          else if (op == "updateMany") applyUpdate(cur, matched, update)
          else {
            val (joined, first) = restrictToFirst(cur, matched, ord, name)
            applyUpdate(joined, first, update).drop(firstHelper)
          }
        case "deleteMany" => cur.filter(!matchedCol(filterOf))
        case "deleteOne" =>
          val (joined, first) = restrictToFirst(cur, matchedCol(filterOf), ord, name)
          joined.filter(!F.coalesce(first, F.lit(false))).drop(firstHelper)
        case "replaceOne" =>
          val filter = filterOf
          val replacement = field("replacement")
          val matched = matchedCol(filter)
          if (upsert && !anyMatch(probed, matched))
            insertDocs(ctx, cur, Seq(upsertDoc(filter, JsObj("$set" -> replacement))))
          else {
            val (joined, first) = restrictToFirst(cur, matched, ord, name)
            applyReplace(joined, first, replacement, ord).drop(firstHelper)
          }
        case other => err(s"unsupported bulk op '$other'")
      }
    }
  }
}
