package graft.js

import scala.collection.mutable

/** Runtime values for the mini-JS engine backing `js.eval`.
  *
  * The reference executes row transforms with a full JS engine (Boa) inside
  * a WASM plugin (reference plugins-wasm/conveyor-plugin-js-wasm/src/
  * lib.rs:160-210), creating a fresh `Context` and re-evaluating the script
  * source PER ROW. We interpret a deliberately-scoped ECMAScript subset in
  * pure Scala instead: the script parses once per partition and each row is
  * a single `transform(row)` call — no engine construction, no per-row
  * source re-parse, no JSON round-trip through strings inside the hot loop.
  *
  * The value universe is JSON's (the reference marshals rows through
  * serde_json, so row values are exactly JSON values) plus functions and
  * dates.
  */
sealed trait JsVal

case object JsUndefined extends JsVal
case object JsNull extends JsVal
final case class JsBool(b: Boolean) extends JsVal
final case class JsNum(d: Double) extends JsVal
final case class JsStr(s: String) extends JsVal
/** Mutable, insertion-ordered — JS object semantics; order drives output
  * column order. `klass` is non-null for class instances: methods resolve
  * through it (not through `fields`), so Object.keys / JSON.stringify see
  * own data properties only — real prototype behavior without a prototype
  * chain. */
final class JsObj(val fields: mutable.LinkedHashMap[String, JsVal],
                  val klass: JsClass = null) extends JsVal
final class JsArr(val items: mutable.ArrayBuffer[JsVal]) extends JsVal
/** User function (declaration, expression, arrow, or class method).
  * `home` (class methods/constructors only) anchors `super` resolution. */
final case class JsFunc(params: Vector[Param], body: Vector[Stmt],
                        closure: Env, name: String,
                        home: JsClass = null) extends JsVal {
  /** Arrows never rebind `this` (lexical). The sentinel can't collide with
    * user functions: '<' can't appear in an identifier. */
  def isArrow: Boolean = name == "<arrow>"
}

/** A `class` declaration. Instance methods live on the class (resolved via
  * [[JsObj.klass]]); statics are ordinary properties of the class value.
  * Methods are stored as raw (params, body) and wrapped into [[JsFunc]]s
  * (with `home` = the OWNING class, for `super`) at lookup time. */
final class JsClass(val name: String,
                    val parent: Option[JsClass],
                    val ctor: Option[(Vector[Param], Vector[Stmt])],
                    val methods: Map[String, (Vector[Param], Vector[Stmt])],
                    val statics: mutable.LinkedHashMap[String, JsVal],
                    val fieldInits: Vector[(String, Option[Expr])],
                    val closure: Env) extends JsVal {
  /** Nearest definition walking up the parent chain, with its owning class. */
  def findMethod(n: String): Option[(JsClass, (Vector[Param], Vector[Stmt]))] =
    methods.get(n).map((this, _)).orElse(parent.flatMap(_.findMethod(n)))
  def findCtor: Option[(JsClass, (Vector[Param], Vector[Stmt]))] =
    ctor.map((this, _)).orElse(parent.flatMap(_.findCtor))
  def findStatic(n: String): Option[JsVal] =
    statics.get(n).orElse(parent.flatMap(_.findStatic(n)))
  def isSubclassOf(c: JsClass): Boolean =
    (this eq c) || parent.exists(_.isSubclassOf(c))
}
/** Built-in; `thisv` is bound at member lookup (e.g. `"a,b".split`). */
final case class JsNative(name: String, fn: (JsVal, Seq[JsVal]) => JsVal) extends JsVal
/** `new Date(...)` — epoch millis, UTC accessors. */
final case class JsDate(millis: Long) extends JsVal

/** Regex literal `/pattern/flags` or `new RegExp(...)` — the JS-flavored
  * pattern compiled to `java.util.regex` (the syntaxes agree on the
  * engine-portable subset scripts actually use: classes, quantifiers,
  * alternation, anchors, groups incl. named ones, lookaround, \d \w \s \b).
  * Stateless: `g` drives replace/match/split call sites, not a mutable
  * `lastIndex` cursor (document scripts relying on stateful `exec`
  * loops — use matchAll instead). Immutable, so one compiled instance is
  * safely shared across rows and partitions. */
final class JsRegex(val source: String, val flags: String) extends JsVal {
  val global: Boolean = flags.contains('g')
  val pattern: java.util.regex.Pattern = JsRegex.compile(source, flags)
}

object JsRegex {
  def compile(source: String, flags: String): java.util.regex.Pattern = {
    import java.util.regex.Pattern
    var f = 0
    flags.foreach {
      case 'g' | 'y' => // sticky/global are call-site behavior, not Pattern flags
      case 'i' => f |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      case 'm' => f |= Pattern.MULTILINE
      case 's' => f |= Pattern.DOTALL
      case 'u' => // java.util.regex is natively unicode-aware
      case 'd' => // match-indices flag: no observable effect here
      case other => throw new JsError(s"unsupported regex flag '$other'")
    }
    try Pattern.compile(source, f)
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw new JsError(s"invalid regex /$source/$flags: ${e.getMessage}")
    }
  }
}

object JsObj {
  def empty: JsObj = new JsObj(mutable.LinkedHashMap.empty)
  def apply(kvs: (String, JsVal)*): JsObj = new JsObj(mutable.LinkedHashMap(kvs: _*))
}
object JsArr {
  def apply(vs: JsVal*): JsArr = new JsArr(mutable.ArrayBuffer(vs: _*))
  def of(vs: Iterable[JsVal]): JsArr = new JsArr(mutable.ArrayBuffer.from(vs))
}

class JsError(msg: String) extends RuntimeException(msg)

object JsVal {

  def truthy(v: JsVal): Boolean = v match {
    case JsUndefined | JsNull => false
    case JsBool(b)            => b
    case JsNum(d)             => d != 0.0 && !d.isNaN
    case JsStr(s)             => s.nonEmpty
    case _                    => true
  }

  /** ToNumber coercion (subset: no object valueOf chain). */
  def toNumber(v: JsVal): Double = v match {
    case JsNum(d)     => d
    case JsBool(b)    => if (b) 1.0 else 0.0
    case JsNull       => 0.0
    case JsUndefined  => Double.NaN
    case JsStr(s)     =>
      val t = s.trim
      if (t.isEmpty) 0.0
      else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
    case JsDate(ms)   => ms.toDouble
    case _            => Double.NaN
  }

  /** ToString coercion — JS number formatting (integral doubles print
    * without the trailing `.0`). */
  def toStr(v: JsVal): String = v match {
    case JsStr(s)     => s
    case JsNum(d)     => numToString(d)
    case JsBool(b)    => b.toString
    case JsNull       => "null"
    case JsUndefined  => "undefined"
    case a: JsArr     => a.items.map(i => if (i == JsNull || i == JsUndefined) "" else toStr(i)).mkString(",")
    case _: JsObj     => "[object Object]"
    case f: JsFunc    => s"function ${f.name}() { ... }"
    case c: JsClass   => s"class ${c.name} { ... }"
    case n: JsNative  => s"function ${n.name}() { [native code] }"
    case JsDate(ms)   => isoString(ms)
    case r: JsRegex   => s"/${r.source}/${r.flags}"
  }

  def numToString(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == Math.floor(d) && Math.abs(d) < 1e15) {
      if (d == 0.0 && 1.0 / d < 0) "0" else d.toLong.toString
    } else d.toString

  def isoString(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString match {
      // Instant prints "...Z" without millis when they are zero; JS always
      // prints the 3-digit millis field.
      case s if s.length == 20 => s.dropRight(1) + ".000Z"
      case s                   => s
    }

  def typeOf(v: JsVal): String = v match {
    case JsUndefined            => "undefined"
    case JsNull                 => "object"
    case _: JsBool              => "boolean"
    case _: JsNum               => "number"
    case _: JsStr               => "string"
    case _: JsFunc | _: JsNative | _: JsClass => "function"
    case _                      => "object"
  }

  /** Strict equality (===). */
  def strictEq(a: JsVal, b: JsVal): Boolean = (a, b) match {
    case (JsNum(x), JsNum(y))   => x == y // NaN !== NaN falls out of ==
    case (JsStr(x), JsStr(y))   => x == y
    case (JsBool(x), JsBool(y)) => x == y
    case (JsNull, JsNull)       => true
    case (JsUndefined, JsUndefined) => true
    case (x: JsObj, y: JsObj)   => x eq y
    case (x: JsArr, y: JsArr)   => x eq y
    case (x: JsRegex, y: JsRegex) => x eq y
    case (JsDate(x), JsDate(y)) => x == y
    case _                      => false
  }

  /** Loose equality (==) — the useful subset of the abstract-equality
    * algorithm: null==undefined, number/string/bool numeric coercion. */
  def looseEq(a: JsVal, b: JsVal): Boolean = (a, b) match {
    case (JsNull | JsUndefined, JsNull | JsUndefined) => true
    case (JsNull | JsUndefined, _) | (_, JsNull | JsUndefined) => false
    case (JsNum(_), JsNum(_)) | (JsStr(_), JsStr(_)) | (JsBool(_), JsBool(_)) => strictEq(a, b)
    case (_: JsObj, _) | (_, _: JsObj) | (_: JsArr, _) | (_, _: JsArr) => strictEq(a, b)
    case _ => { val x = toNumber(a); val y = toNumber(b); x == y }
  }

  // ---------------------------------------------------------------- JSON

  /** Parse a JSON document into JsVals (used for row input and
    * `JSON.parse`). Hand-rolled — no JSON library ships in build.sbt. */
  def parseJson(s: String): JsVal = {
    val p = new JsonParser(s)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new JsError(s"JSON.parse: trailing characters at ${p.pos}")
    v
  }

  private final class JsonParser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (!atEnd && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String) = throw new JsError(s"JSON.parse: $msg at offset $pos")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def parseValue(): JsVal = {
      skipWs()
      if (atEnd) fail("unexpected end")
      s.charAt(pos) match {
        case '{' =>
          pos += 1; skipWs()
          val m = mutable.LinkedHashMap.empty[String, JsVal]
          if (!atEnd && s.charAt(pos) == '}') { pos += 1; return new JsObj(m) }
          var done = false
          while (!done) {
            skipWs()
            val k = parseString()
            skipWs(); expect(':')
            m(k) = parseValue()
            skipWs()
            if (!atEnd && s.charAt(pos) == ',') pos += 1
            else { expect('}'); done = true }
          }
          new JsObj(m)
        case '[' =>
          pos += 1; skipWs()
          val b = mutable.ArrayBuffer.empty[JsVal]
          if (!atEnd && s.charAt(pos) == ']') { pos += 1; return new JsArr(b) }
          var done = false
          while (!done) {
            b += parseValue()
            skipWs()
            if (!atEnd && s.charAt(pos) == ',') pos += 1
            else { expect(']'); done = true }
          }
          new JsArr(b)
        case '"' => JsStr(parseString())
        case 't' => if (s.startsWith("true", pos)) { pos += 4; JsBool(true) } else fail("bad literal")
        case 'f' => if (s.startsWith("false", pos)) { pos += 5; JsBool(false) } else fail("bad literal")
        case 'n' => if (s.startsWith("null", pos)) { pos += 4; JsNull } else fail("bad literal")
        case c if c == '-' || (c >= '0' && c <= '9') =>
          val start = pos
          if (s.charAt(pos) == '-') pos += 1
          while (!atEnd && { val ch = s.charAt(pos); (ch >= '0' && ch <= '9') || ch == '.' || ch == 'e' || ch == 'E' || ch == '+' || ch == '-' }) pos += 1
          JsNum(s.substring(start, pos).toDouble)
        case c => fail(s"unexpected '$c'")
      }
    }
    def parseString(): String = {
      expect('"')
      val b = new java.lang.StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(pos); pos += 1
        c match {
          case '"'  => return b.toString
          case '\\' =>
            if (atEnd) fail("bad escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"'  => b.append('"')
              case '\\' => b.append('\\')
              case '/'  => b.append('/')
              case 'b'  => b.append('\b')
              case 'f'  => b.append('\f')
              case 'n'  => b.append('\n')
              case 'r'  => b.append('\r')
              case 't'  => b.append('\t')
              case 'u'  =>
                if (pos + 4 > s.length) fail("bad \\u escape")
                b.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case x => fail(s"bad escape \\$x")
            }
          case other => b.append(other)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** JSON.stringify (no indent arg support beyond 0/absent; functions and
    * undefined are dropped from objects / nulled in arrays, per spec). */
  def stringify(v: JsVal): String = {
    val b = new java.lang.StringBuilder
    writeJson(v, b)
    b.toString
  }

  private def writeJson(v: JsVal, b: java.lang.StringBuilder): Unit = v match {
    case JsNull | JsUndefined => b.append("null")
    case JsBool(x)            => b.append(x)
    case JsNum(d) =>
      if (d.isNaN || d.isInfinite) b.append("null") else b.append(numToString(d))
    case JsStr(s)             => writeJsonString(s, b)
    case JsDate(ms)           => writeJsonString(isoString(ms), b)
    case _: JsRegex           => b.append("{}") // JSON.stringify(/x/) === '{}'
    case a: JsArr =>
      b.append('[')
      var first = true
      a.items.foreach { item =>
        if (!first) b.append(','); first = false
        item match {
          case _: JsFunc | _: JsNative | _: JsClass | JsUndefined => b.append("null")
          case x => writeJson(x, b)
        }
      }
      b.append(']')
    case o: JsObj =>
      b.append('{')
      var first = true
      o.fields.foreach { case (k, value) =>
        value match {
          case _: JsFunc | _: JsNative | _: JsClass | JsUndefined => // dropped
          case x =>
            if (!first) b.append(','); first = false
            writeJsonString(k, b); b.append(':'); writeJson(x, b)
        }
      }
      b.append('}')
    case _: JsFunc | _: JsNative | _: JsClass => b.append("null")
  }

  private def writeJsonString(s: String, b: java.lang.StringBuilder): Unit = {
    b.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case '\b' => b.append("\\b")
        case '\f' => b.append("\\f")
        case x if x < 0x20 => b.append(f"\\u${x.toInt}%04x")
        case x => b.append(x)
      }
      i += 1
    }
    b.append('"')
  }
}

/** Lexical environment — a mutable frame chain (function closures capture
  * the defining frame). */
final class Env(val parent: Env) {
  private val vars = mutable.HashMap.empty[String, JsVal]

  def define(name: String, v: JsVal): Unit = vars(name) = v

  def lookup(name: String): Option[JsVal] =
    vars.get(name).orElse(if (parent ne null) parent.lookup(name) else None)

  /** Assign to the nearest frame that defines `name`; defines globally (on
    * the root frame) otherwise — sloppy-mode JS. */
  def assign(name: String, v: JsVal): Unit =
    if (vars.contains(name)) vars(name) = v
    else if (parent ne null) parent.assign(name, v)
    else vars(name) = v

  def child: Env = new Env(this)
}
