package graft.js

import scala.collection.mutable

/** Standard-library surface for the `js.eval` subset: the globals and the
  * per-type method tables. Scoped to what row-transform scripts actually
  * use (string/array/object manipulation, Math, JSON, Date) — anything
  * outside raises a JsError naming the missing member.
  */
object Builtins {

  import JsVal._

  // ------------------------------------------------------------- globals

  def install(g: Env): Unit = {
    g.define("undefined", JsUndefined)
    g.define("NaN", JsNum(Double.NaN))
    g.define("Infinity", JsNum(Double.PositiveInfinity))

    g.define("Math", JsObj(
      "PI" -> JsNum(Math.PI), "E" -> JsNum(Math.E),
      "floor"  -> nat1("Math.floor")(a => JsNum(Math.floor(toNumber(a)))),
      "ceil"   -> nat1("Math.ceil")(a => JsNum(Math.ceil(toNumber(a)))),
      "round"  -> nat1("Math.round")(a => {
        val d = toNumber(a)
        JsNum(if (d.isNaN || d.isInfinite) d else Math.floor(d + 0.5)) // JS rounds half UP (incl. negatives)
      }),
      "trunc"  -> nat1("Math.trunc")(a => JsNum(toNumber(a).toLong.toDouble)),
      "abs"    -> nat1("Math.abs")(a => JsNum(Math.abs(toNumber(a)))),
      "sign"   -> nat1("Math.sign")(a => JsNum(Math.signum(toNumber(a)))),
      "sqrt"   -> nat1("Math.sqrt")(a => JsNum(Math.sqrt(toNumber(a)))),
      "cbrt"   -> nat1("Math.cbrt")(a => JsNum(Math.cbrt(toNumber(a)))),
      "exp"    -> nat1("Math.exp")(a => JsNum(Math.exp(toNumber(a)))),
      "log"    -> nat1("Math.log")(a => JsNum(Math.log(toNumber(a)))),
      "log2"   -> nat1("Math.log2")(a => JsNum(Math.log(toNumber(a)) / Math.log(2))),
      "log10"  -> nat1("Math.log10")(a => JsNum(Math.log10(toNumber(a)))),
      "pow"    -> JsNative("Math.pow", (_, as) => JsNum(Math.pow(num(as, 0), num(as, 1)))),
      "min"    -> JsNative("Math.min", (_, as) =>
        JsNum(if (as.isEmpty) Double.PositiveInfinity else as.map(toNumber).min)),
      "max"    -> JsNative("Math.max", (_, as) =>
        JsNum(if (as.isEmpty) Double.NegativeInfinity else as.map(toNumber).max)),
      "hypot"  -> JsNative("Math.hypot", (_, as) => JsNum(Math.sqrt(as.map(v => { val d = toNumber(v); d * d }).sum))),
      "random" -> JsNative("Math.random", (_, _) => JsNum(java.util.concurrent.ThreadLocalRandom.current().nextDouble()))
    ))

    g.define("JSON", JsObj(
      "stringify" -> JsNative("JSON.stringify", (_, as) =>
        as.headOption match {
          case None | Some(JsUndefined) => JsUndefined
          case Some(v)                  => JsStr(stringify(v))
        }),
      "parse" -> JsNative("JSON.parse", (_, as) => parseJson(str(as, 0)))
    ))

    g.define("Object", JsObj(
      "keys" -> nat1("Object.keys") {
        case o: JsObj => JsArr.of(o.fields.keys.map(JsStr(_)))
        case a: JsArr => JsArr.of(a.items.indices.map(i => JsStr(i.toString)))
        case other    => throw new JsError(s"Object.keys on ${typeOf(other)}")
      },
      "values" -> nat1("Object.values") {
        case o: JsObj => JsArr.of(o.fields.values)
        case a: JsArr => JsArr.of(a.items)
        case other    => throw new JsError(s"Object.values on ${typeOf(other)}")
      },
      "entries" -> nat1("Object.entries") {
        case o: JsObj => JsArr.of(o.fields.map { case (k, v) => JsArr(JsStr(k), v) })
        case a: JsArr => JsArr.of(a.items.zipWithIndex.map { case (v, i) => JsArr(JsStr(i.toString), v) })
        case other    => throw new JsError(s"Object.entries on ${typeOf(other)}")
      },
      "fromEntries" -> nat1("Object.fromEntries") {
        case a: JsArr =>
          val m = mutable.LinkedHashMap.empty[String, JsVal]
          a.items.foreach {
            case pair: JsArr if pair.items.length >= 2 => m(toStr(pair.items(0))) = pair.items(1)
            case other => throw new JsError("Object.fromEntries expects [key, value] pairs")
          }
          new JsObj(m)
        case other => throw new JsError(s"Object.fromEntries on ${typeOf(other)}")
      },
      "assign" -> JsNative("Object.assign", (_, as) => {
        as.headOption match {
          case Some(target: JsObj) =>
            as.drop(1).foreach {
              case src: JsObj => src.fields.foreach { case (k, v) => target.fields(k) = v }
              case JsNull | JsUndefined =>
              case other => throw new JsError(s"Object.assign source is ${typeOf(other)}")
            }
            target
          case _ => throw new JsError("Object.assign target must be an object")
        }
      })
    ))

    g.define("Array", JsObj(
      "isArray" -> nat1("Array.isArray")(v => JsBool(v.isInstanceOf[JsArr])),
      "from" -> JsNative("Array.from", (_, as) => as.headOption match {
        case Some(a: JsArr)  => JsArr.of(a.items)
        case Some(JsStr(s))  => JsArr.of(s.map(c => JsStr(c.toString)))
        case Some(o: JsObj)  => // array-like {length: n}
          o.fields.get("length").map(l => JsArr.of(Vector.fill(toNumber(l).toInt)(JsUndefined)))
            .getOrElse(JsArr())
        case _ => JsArr()
      })
    ))

    g.define("Number", JsNative("Number", (_, as) =>
      JsNum(as.headOption.map(toNumber).getOrElse(0.0))))

    g.define("String", JsNative("String", (_, as) =>
      JsStr(as.headOption.map(toStr).getOrElse(""))))
    g.define("Boolean", JsNative("Boolean", (_, as) =>
      JsBool(as.headOption.exists(truthy))))

    g.define("parseInt", JsNative("parseInt", (_, as) => {
      val s = str(as, 0).trim
      val radix = as.lift(1).map(toNumber(_).toInt).filter(_ != 0).getOrElse(10)
      val (sign, rest0) =
        if (s.startsWith("-")) (-1L, s.drop(1))
        else if (s.startsWith("+")) (1L, s.drop(1)) else (1L, s)
      val rest = if (radix == 16 && (rest0.startsWith("0x") || rest0.startsWith("0X"))) rest0.drop(2) else rest0
      val digits = rest.takeWhile(c => Character.digit(c, radix) >= 0)
      if (digits.isEmpty) JsNum(Double.NaN)
      else JsNum(sign * java.lang.Long.parseLong(digits, radix).toDouble)
    }))
    g.define("parseFloat", JsNative("parseFloat", (_, as) => {
      val s = str(as, 0).trim
      val m = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r.findFirstIn(s)
      JsNum(m.map(_.toDouble).getOrElse(Double.NaN))
    }))
    g.define("isNaN", nat1("isNaN")(v => JsBool(toNumber(v).isNaN)))
    g.define("isFinite", nat1("isFinite")(v => JsBool(!toNumber(v).isNaN && !toNumber(v).isInfinite)))

    g.define("Date", JsObj(
      "now" -> JsNative("Date.now", (_, _) => JsNum(System.currentTimeMillis().toDouble)),
      "parse" -> nat1("Date.parse")(v => JsNum(parseDateMs(toStr(v)).map(_.toDouble).getOrElse(Double.NaN)))
    ))

    // console.log → stderr (executor logs), returns undefined
    g.define("console", JsObj(
      "log" -> JsNative("console.log", (_, as) => { System.err.println("[js.eval] " + as.map(toStr).mkString(" ")); JsUndefined }),
      "error" -> JsNative("console.error", (_, as) => { System.err.println("[js.eval] " + as.map(toStr).mkString(" ")); JsUndefined }),
      "warn" -> JsNative("console.warn", (_, as) => { System.err.println("[js.eval] " + as.map(toStr).mkString(" ")); JsUndefined })
    ))
  }

  private def nat1(name: String)(f: JsVal => JsVal): JsNative =
    JsNative(name, (_, as) => f(as.headOption.getOrElse(JsUndefined)))

  private def num(as: Seq[JsVal], i: Int): Double = toNumber(as.lift(i).getOrElse(JsUndefined))
  private def str(as: Seq[JsVal], i: Int): String = toStr(as.lift(i).getOrElse(JsUndefined))

  // --------------------------------------------------------------- Date

  def newDate(args: Seq[JsVal]): JsVal = args match {
    case Seq()           => JsDate(System.currentTimeMillis())
    case Seq(JsNum(ms))  => JsDate(ms.toLong)
    case Seq(JsStr(s))   => JsDate(parseDateMs(s).getOrElse(
      throw new JsError(s"new Date: unparseable date string '$s'")))
    case Seq(JsDate(ms)) => JsDate(ms)
    case more if more.length >= 2 =>
      val y = num(more, 0).toInt; val mo = num(more, 1).toInt
      val d = if (more.length > 2) num(more, 2).toInt else 1
      val h = if (more.length > 3) num(more, 3).toInt else 0
      val mi = if (more.length > 4) num(more, 4).toInt else 0
      val sec = if (more.length > 5) num(more, 5).toInt else 0
      val ms = if (more.length > 6) num(more, 6).toInt else 0
      val ldt = java.time.LocalDateTime.of(y, 1, 1, 0, 0)
        .plusMonths(mo.toLong).plusDays((d - 1).toLong)
        .plusHours(h.toLong).plusMinutes(mi.toLong).plusSeconds(sec.toLong)
      JsDate(ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli + ms)
    case _ => throw new JsError("new Date: unsupported arguments")
  }

  def parseDateMs(s: String): Option[Long] = {
    val t = s.trim
    def attempt(f: => Long): Option[Long] = try Some(f) catch { case _: Exception => None }
    attempt(java.time.Instant.parse(t).toEpochMilli)
      .orElse(attempt(java.time.OffsetDateTime.parse(t).toInstant.toEpochMilli))
      .orElse(attempt(java.time.LocalDateTime.parse(t).toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      .orElse(attempt(java.time.LocalDateTime.parse(t.replace(' ', 'T')).toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      .orElse(attempt(java.time.LocalDate.parse(t).atStartOfDay.toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
  }

  // ------------------------------------------------------------- members

  /** Resolve `obj.name` for built-in properties/methods. Returns None when
    * the base is a JsObj without that field (caller yields undefined) or
    * when nothing matches. */
  def member(obj: JsVal, name: String, interp: JsInterp): Option[JsVal] = obj match {
    case o: JsObj =>
      o.fields.get(name).orElse(name match {
        case "hasOwnProperty" =>
          Some(JsNative("hasOwnProperty", (t, as) => t match {
            case to: JsObj => JsBool(to.fields.contains(str(as, 0)))
            case _         => JsBool(false)
          }))
        case _ => Some(JsUndefined)
      })
    case JsStr(s)  => stringMember(s, name, interp)
    case a: JsArr  => arrayMember(a, name, interp)
    case JsNum(d)  => numberMember(d, name)
    case d: JsDate => Some(dateMember(d, name))
    case r: JsRegex => Some(regexMember(r, name))
    case JsBool(_) => name match {
      case "toString" => Some(JsNative("toString", (t, _) => JsStr(toStr(t))))
      case _          => None
    }
    case n: JsNative if n.name == "Number" => numberStaticMember(name)
    case n: JsNative if n.name == "String" => stringStaticMember(name)
    case _ => None
  }

  /** Statics on the Number constructor (`Number.isInteger(x)`, …). */
  private def numberStaticMember(name: String): Option[JsVal] = name match {
    case "isInteger" => Some(nat1("Number.isInteger") {
      case JsNum(d) => JsBool(!d.isNaN && !d.isInfinite && d == Math.floor(d))
      case _        => JsBool(false)
    })
    case "isFinite" => Some(nat1("Number.isFinite") {
      case JsNum(d) => JsBool(!d.isNaN && !d.isInfinite)
      case _        => JsBool(false)
    })
    case "isNaN" => Some(nat1("Number.isNaN") {
      case JsNum(d) => JsBool(d.isNaN)
      case _        => JsBool(false)
    })
    case "parseFloat" | "parseInt" => None // resolved via the globals of the same name
    case "MAX_SAFE_INTEGER" => Some(JsNum(9007199254740991.0))
    case "MIN_SAFE_INTEGER" => Some(JsNum(-9007199254740991.0))
    case "EPSILON"          => Some(JsNum(Math.ulp(1.0)))
    case "POSITIVE_INFINITY" => Some(JsNum(Double.PositiveInfinity))
    case "NEGATIVE_INFINITY" => Some(JsNum(Double.NegativeInfinity))
    case "NaN"               => Some(JsNum(Double.NaN))
    case _ => None
  }

  private def stringStaticMember(name: String): Option[JsVal] = name match {
    case "fromCharCode" => Some(JsNative("String.fromCharCode", (_, as) =>
      JsStr(as.map(v => toNumber(v).toChar).mkString)))
    case _ => None
  }

  private def stringMember(s: String, name: String, interp: JsInterp): Option[JsVal] = Some(name match {
    case "length" => JsNum(s.length.toDouble)
    case "toUpperCase" => JsNative(name, (_, _) => JsStr(s.toUpperCase))
    case "toLowerCase" => JsNative(name, (_, _) => JsStr(s.toLowerCase))
    case "trim"      => JsNative(name, (_, _) => JsStr(s.trim))
    case "trimStart" => JsNative(name, (_, _) => JsStr(s.replaceFirst("^\\s+", "")))
    case "trimEnd"   => JsNative(name, (_, _) => JsStr(s.replaceFirst("\\s+$", "")))
    case "split" => JsNative(name, (_, as) => as.headOption match {
      case None | Some(JsUndefined) => JsArr(JsStr(s))
      case Some(re: JsRegex) =>
        JsArr.of(regexSplit(s, re).take(splitLimit(as)))
      case Some(sep0) =>
        val sep = toStr(sep0)
        val parts =
          if (sep.isEmpty) s.map(_.toString)
          else splitLiteral(s, sep)
        JsArr.of(parts.take(splitLimit(as)).map(JsStr(_)))
    })
    case "slice" => JsNative(name, (_, as) => {
      val (from, until) = sliceRange(s.length, as)
      JsStr(if (from >= until) "" else s.substring(from, until))
    })
    case "substring" => JsNative(name, (_, as) => {
      var a = clamp(as.headOption.map(toNumber).getOrElse(0.0), s.length)
      var b = clamp(as.lift(1).map(toNumber).getOrElse(s.length.toDouble), s.length)
      if (a > b) { val t = a; a = b; b = t }
      JsStr(s.substring(a, b))
    })
    case "substr" => JsNative(name, (_, as) => {
      val start0 = as.headOption.map(toNumber(_).toInt).getOrElse(0)
      val start = if (start0 < 0) Math.max(0, s.length + start0) else Math.min(start0, s.length)
      val len = as.lift(1).map(toNumber(_).toInt).getOrElse(s.length - start)
      JsStr(s.substring(start, Math.min(s.length, start + Math.max(0, len))))
    })
    case "indexOf"     => JsNative(name, (_, as) => JsNum(s.indexOf(str(as, 0), as.lift(1).map(toNumber(_).toInt).getOrElse(0)).toDouble))
    case "lastIndexOf" => JsNative(name, (_, as) => JsNum(s.lastIndexOf(str(as, 0)).toDouble))
    case "includes"   => JsNative(name, (_, as) => JsBool(s.contains(str(as, 0))))
    case "startsWith" => JsNative(name, (_, as) => JsBool(s.startsWith(str(as, 0), as.lift(1).map(toNumber(_).toInt).getOrElse(0))))
    case "endsWith"   => JsNative(name, (_, as) => JsBool(s.endsWith(str(as, 0))))
    case "charAt"     => JsNative(name, (_, as) => {
      val i = num(as, 0).toInt
      JsStr(if (i >= 0 && i < s.length) s.charAt(i).toString else "")
    })
    case "charCodeAt" => JsNative(name, (_, as) => {
      val i = num(as, 0).toInt
      if (i >= 0 && i < s.length) JsNum(s.charAt(i).toDouble) else JsNum(Double.NaN)
    })
    case "at" => JsNative(name, (_, as) => {
      val i0 = num(as, 0).toInt
      val i = if (i0 < 0) s.length + i0 else i0
      if (i >= 0 && i < s.length) JsStr(s.charAt(i).toString) else JsUndefined
    })
    case "repeat"  => JsNative(name, (_, as) => JsStr(s * Math.max(0, num(as, 0).toInt)))
    case "padStart" => JsNative(name, (_, as) => JsStr(pad(s, as, start = true)))
    case "padEnd"   => JsNative(name, (_, as) => JsStr(pad(s, as, start = false)))
    case "concat"  => JsNative(name, (_, as) => JsStr(s + as.map(toStr).mkString))
    case "replace" => JsNative(name, (_, as) => as.headOption match {
      case Some(re: JsRegex) =>
        JsStr(regexReplace(s, re, as.lift(1).getOrElse(JsUndefined), re.global, interp))
      case _ =>
        val pat = str(as, 0)
        val i = s.indexOf(pat)
        if (i < 0 || pat.isEmpty) JsStr(s)
        else as.lift(1) match {
          case Some(f @ (_: JsFunc | _: JsNative)) => // fn replacement, literal pattern
            val rep = toStr(interp.call(f, JsUndefined, Seq(JsStr(pat), JsNum(i), JsStr(s))))
            JsStr(s.substring(0, i) + rep + s.substring(i + pat.length))
          case repV => // JS GetSubstitution applies to string patterns too
            JsStr(s.substring(0, i) +
              expandLiteralReplacement(str(Seq(repV.getOrElse(JsUndefined)), 0), pat, i, s) +
              s.substring(i + pat.length))
        }
    })
    case "replaceAll" => JsNative(name, (_, as) => as.headOption match {
      case Some(re: JsRegex) =>
        if (!re.global) throw new JsError("String.replaceAll requires a /g regex")
        JsStr(regexReplace(s, re, as.lift(1).getOrElse(JsUndefined), all = true, interp))
      case _ =>
        val pat = str(as, 0); val rep = str(as, 1)
        if (rep.indexOf('$') < 0 || pat.isEmpty) JsStr(s.replace(pat, rep))
        else { // $-substitution per occurrence (JS GetSubstitution)
          val b = new java.lang.StringBuilder
          var last = 0
          var i = s.indexOf(pat)
          while (i >= 0) {
            b.append(s, last, i).append(expandLiteralReplacement(rep, pat, i, s))
            last = i + pat.length
            i = s.indexOf(pat, last)
          }
          b.append(s, last, s.length)
          JsStr(b.toString)
        }
    })
    case "toString"   => JsNative(name, (_, _) => JsStr(s))
    case "localeCompare" => JsNative(name, (_, as) => JsNum(Integer.signum(s.compareTo(str(as, 0))).toDouble))
    case "codePointAt" => JsNative(name, (_, as) => {
      val i = num(as, 0).toInt
      if (i >= 0 && i < s.length) JsNum(s.codePointAt(i).toDouble) else JsUndefined
    })
    case "normalize" => JsNative(name, (_, _) => JsStr(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)))
    case "match" => JsNative(name, (_, as) => {
      val re = regexArg(as, "match")
      if (re.global) { // all full matches, or null when none
        val m = re.pattern.matcher(s)
        val out = Vector.newBuilder[JsVal]
        while (m.find()) out += JsStr(m.group)
        val v = out.result()
        if (v.isEmpty) JsNull else JsArr.of(v)
      } else {
        val m = re.pattern.matcher(s)
        if (m.find()) matchArray(m) else JsNull
      }
    })
    case "matchAll" => JsNative(name, (_, as) => {
      val re = regexArg(as, "matchAll")
      if (!re.global) throw new JsError("String.matchAll requires a /g regex")
      val m = re.pattern.matcher(s)
      val out = Vector.newBuilder[JsVal]
      while (m.find()) out += matchArray(m)
      JsArr.of(out.result()) // array, not iterator: for-of works the same
    })
    case "search" => JsNative(name, (_, as) => {
      val m = regexArg(as, "search").pattern.matcher(s)
      JsNum(if (m.find()) m.start.toDouble else -1.0)
    })
    case other => throw new JsError(s"unsupported string method '.$other'")
  })

  // --------------------------------------------------------------- regex

  /** String regex-method argument: a regex, or a pattern string compiled
    * flagless (JS coerces). */
  private def regexArg(as: Seq[JsVal], m: String): JsRegex = as.headOption match {
    case Some(r: JsRegex) => r
    case Some(JsStr(p))   => new JsRegex(p, "")
    case other => throw new JsError(s"String.$m expects a regex, got ${other.map(typeOf).getOrElse("nothing")}")
  }

  /** JS match/exec result: [full, group1, ...] (undefined for groups that
    * did not participate). Extra props (.index/.input) are not carried —
    * use search() for the index. */
  private def matchArray(m: java.util.regex.Matcher): JsArr = {
    val out = Vector.newBuilder[JsVal]
    out += JsStr(m.group)
    var g = 1
    while (g <= m.groupCount) {
      out += (if (m.group(g) == null) JsUndefined else JsStr(m.group(g)))
      g += 1
    }
    JsArr.of(out.result())
  }

  /** String.replace/replaceAll with a regex: function replacements get
    * (match, p1.., offset, string); string replacements expand JS $-refs
    * ourselves ($$ $& $` $' $n $<name>) — Java's appendReplacement has
    * different escaping rules. Java's find() self-advances on zero-width
    * matches, so a star-quantified /g pattern never loops. */
  private def regexReplace(s: String, re: JsRegex, rep: JsVal, all: Boolean, interp: JsInterp): String = {
    val m = re.pattern.matcher(s)
    val b = new java.lang.StringBuilder
    var last = 0
    var go = true
    while (go && m.find()) {
      b.append(s, last, m.start)
      rep match {
        case f @ (_: JsFunc | _: JsNative) =>
          val args = Vector.newBuilder[JsVal]
          args += JsStr(m.group)
          var g = 1
          while (g <= m.groupCount) {
            args += (if (m.group(g) == null) JsUndefined else JsStr(m.group(g)))
            g += 1
          }
          args += JsNum(m.start.toDouble); args += JsStr(s)
          b.append(toStr(interp.call(f, JsUndefined, args.result())))
        case other => expandReplacement(toStr(other), m, s, b)
      }
      last = m.end
      if (!all) go = false
    }
    b.append(s, last, s.length)
    b.toString
  }

  /** $-substitution for literal (string) patterns: $$ $& $` $' (no
    * capture groups exist); unknown $-sequences stay literal, per JS. */
  private def expandLiteralReplacement(rep: String, matched: String, at: Int, input: String): String = {
    if (rep.indexOf('$') < 0) return rep
    val b = new java.lang.StringBuilder
    var i = 0
    while (i < rep.length) {
      val c = rep.charAt(i)
      if (c == '$' && i + 1 < rep.length) {
        rep.charAt(i + 1) match {
          case '$'  => b.append('$'); i += 2
          case '&'  => b.append(matched); i += 2
          case '`'  => b.append(input, 0, at); i += 2
          case '\'' => b.append(input, at + matched.length, input.length); i += 2
          case _    => b.append(c); i += 1
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Expand a JS replacement template against the current match. */
  private def expandReplacement(rep: String, m: java.util.regex.Matcher, input: String, b: java.lang.StringBuilder): Unit = {
    var i = 0
    val n = rep.length
    while (i < n) {
      val c = rep.charAt(i)
      if (c == '$' && i + 1 < n) {
        rep.charAt(i + 1) match {
          case '$'  => b.append('$'); i += 2
          case '&'  => b.append(m.group); i += 2
          case '`'  => b.append(input, 0, m.start); i += 2
          case '\'' => b.append(input, m.end, input.length); i += 2
          case '<' =>
            val end = rep.indexOf('>', i + 2)
            if (end < 0) { b.append(c); i += 1 }
            else {
              val g = try m.group(rep.substring(i + 2, end)) catch { case _: Exception => null }
              if (g != null) b.append(g)
              i = end + 1
            }
          case d if d >= '0' && d <= '9' =>
            // longest valid group number wins (up to 2 digits), per JS
            val twoEnd = if (i + 2 < n && rep.charAt(i + 2).isDigit) i + 3 else i + 2
            val two = rep.substring(i + 1, twoEnd).toInt
            if (twoEnd == i + 3 && two >= 1 && two <= m.groupCount) {
              val g = m.group(two); if (g != null) b.append(g); i += 3
            } else {
              val one = rep.charAt(i + 1) - '0'
              if (one >= 1 && one <= m.groupCount) {
                val g = m.group(one); if (g != null) b.append(g); i += 2
              } else { b.append(c); i += 1 } // $0 / out-of-range: literal
            }
          case _ => b.append(c); i += 1
        }
      } else { b.append(c); i += 1 }
    }
  }

  /** JS String.split(regex): pieces between matches, captured groups
    * interleaved, no match accepted at the end position, zero-width
    * matches at the previous boundary skipped. */
  private def regexSplit(s: String, re: JsRegex): Vector[JsVal] = {
    if (s.isEmpty) { // "".split(/x/) → [""] unless the regex matches empty
      val m = re.pattern.matcher(s)
      return if (m.find()) Vector.empty else Vector(JsStr(s))
    }
    val out = Vector.newBuilder[JsVal]
    val m = re.pattern.matcher(s)
    var last = 0
    var searchFrom = 0
    var done = false
    while (!done && searchFrom <= s.length && m.find(searchFrom)) {
      val st = m.start; val en = m.end
      if (st == s.length) done = true // no separator match at the end position
      else if (st == en && en == last) searchFrom = st + 1 // zero-width at prev boundary
      else {
        out += JsStr(s.substring(last, st))
        var g = 1
        while (g <= m.groupCount) {
          out += (if (m.group(g) == null) JsUndefined else JsStr(m.group(g)))
          g += 1
        }
        last = en
        searchFrom = if (en == st) en + 1 else en
      }
    }
    out += JsStr(s.substring(last))
    out.result()
  }

  private def regexMember(r: JsRegex, name: String): JsVal = name match {
    case "source"     => JsStr(r.source)
    case "flags"      => JsStr(r.flags)
    case "global"     => JsBool(r.global)
    case "ignoreCase" => JsBool(r.flags.contains('i'))
    case "multiline"  => JsBool(r.flags.contains('m'))
    case "lastIndex"  => JsNum(0) // stateless engine (header note)
    case "test" => JsNative("RegExp.test", (_, as) =>
      JsBool(r.pattern.matcher(str(as, 0)).find()))
    case "exec" => JsNative("RegExp.exec", (_, as) => {
      val m = r.pattern.matcher(str(as, 0))
      if (m.find()) matchArray(m) else JsNull
    })
    case "toString" => JsNative("RegExp.toString", (_, _) => JsStr(s"/${r.source}/${r.flags}"))
    case other => throw new JsError(s"unsupported RegExp member '.$other'")
  }

  /** JS split-limit coercion (ToUint32): absent/undefined → no limit,
    * negative wraps to a huge unsigned (→ effectively no limit), NaN → 0. */
  private def splitLimit(as: Seq[JsVal]): Int = as.lift(1) match {
    case None | Some(JsUndefined) => Int.MaxValue
    case Some(v) =>
      val n = toNumber(v)
      if (n.isNaN) 0
      else Math.min(n.toLong & 0xFFFFFFFFL, Int.MaxValue.toLong).toInt
  }

  /** JS String.split with a literal separator ("a,,b".split(",") keeps the
    * empty middle AND trailing empties, unlike Java's split). */
  private def splitLiteral(s: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var from = 0
    var idx = s.indexOf(sep, from)
    while (idx >= 0) {
      out += s.substring(from, idx)
      from = idx + sep.length
      idx = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.result()
  }

  private def pad(s: String, as: Seq[JsVal], start: Boolean): String = {
    val target = num(as, 0).toInt
    val padStr = as.lift(1).map(toStr).getOrElse(" ")
    if (s.length >= target || padStr.isEmpty) s
    else {
      val need = target - s.length
      val fill = (padStr * (need / padStr.length + 1)).substring(0, need)
      if (start) fill + s else s + fill
    }
  }

  private def clamp(d: Double, len: Int): Int =
    if (d.isNaN) 0 else Math.max(0, Math.min(len, d.toInt))

  /** slice(from, until) index resolution shared by strings and arrays. */
  private def sliceRange(len: Int, as: Seq[JsVal]): (Int, Int) = {
    def resolve(d: Double): Int =
      if (d < 0) Math.max(0, len + d.toInt) else Math.min(len, d.toInt)
    val from = as.headOption.map(v => resolve(toNumber(v))).getOrElse(0)
    val until = as.lift(1) match {
      case Some(JsUndefined) | None => len
      case Some(v)                  => resolve(toNumber(v))
    }
    (from, until)
  }

  private def arrayMember(a: JsArr, name: String, interp: JsInterp): Option[JsVal] = Some(name match {
    case idx if idx.nonEmpty && idx.forall(c => c >= '0' && c <= '9') && idx.length <= 9 =>
      val i = idx.toInt // arr["3"] reaching the member path (e.g. call position)
      if (i < a.items.length) a.items(i) else JsUndefined
    case "length" => JsNum(a.items.length.toDouble)
    case "push" => JsNative(name, (_, as) => { a.items ++= as; JsNum(a.items.length.toDouble) })
    case "pop"  => JsNative(name, (_, _) =>
      if (a.items.isEmpty) JsUndefined else a.items.remove(a.items.length - 1))
    case "shift" => JsNative(name, (_, _) =>
      if (a.items.isEmpty) JsUndefined else a.items.remove(0))
    case "unshift" => JsNative(name, (_, as) => { a.items.prependAll(as); JsNum(a.items.length.toDouble) })
    case "map" => JsNative(name, (_, as) => {
      val f = fnArg(as, "map")
      JsArr.of(a.items.zipWithIndex.map { case (v, i) => interp.call(f, JsUndefined, Seq(v, JsNum(i), a)) })
    })
    case "filter" => JsNative(name, (_, as) => {
      val f = fnArg(as, "filter")
      JsArr.of(a.items.zipWithIndex.collect {
        case (v, i) if truthy(interp.call(f, JsUndefined, Seq(v, JsNum(i), a))) => v
      })
    })
    case "forEach" => JsNative(name, (_, as) => {
      val f = fnArg(as, "forEach")
      a.items.zipWithIndex.foreach { case (v, i) => interp.call(f, JsUndefined, Seq(v, JsNum(i), a)) }
      JsUndefined
    })
    case "reduce" => JsNative(name, (_, as) => {
      val f = fnArg(as, "reduce")
      var acc: JsVal = null
      var startIdx = 0
      if (as.length >= 2) acc = as(1)
      else {
        if (a.items.isEmpty) throw new JsError("reduce of empty array with no initial value")
        acc = a.items(0); startIdx = 1
      }
      var i = startIdx
      while (i < a.items.length) {
        acc = interp.call(f, JsUndefined, Seq(acc, a.items(i), JsNum(i), a))
        i += 1
      }
      acc
    })
    case "some" => JsNative(name, (_, as) => {
      val f = fnArg(as, "some")
      JsBool(a.items.zipWithIndex.exists { case (v, i) => truthy(interp.call(f, JsUndefined, Seq(v, JsNum(i), a))) })
    })
    case "every" => JsNative(name, (_, as) => {
      val f = fnArg(as, "every")
      JsBool(a.items.zipWithIndex.forall { case (v, i) => truthy(interp.call(f, JsUndefined, Seq(v, JsNum(i), a))) })
    })
    case "find" => JsNative(name, (_, as) => {
      val f = fnArg(as, "find")
      a.items.zipWithIndex.collectFirst {
        case (v, i) if truthy(interp.call(f, JsUndefined, Seq(v, JsNum(i), a))) => v
      }.getOrElse(JsUndefined)
    })
    case "findIndex" => JsNative(name, (_, as) => {
      val f = fnArg(as, "findIndex")
      JsNum(a.items.zipWithIndex.collectFirst {
        case (v, i) if truthy(interp.call(f, JsUndefined, Seq(v, JsNum(i), a))) => i
      }.getOrElse(-1).toDouble)
    })
    case "indexOf"  => JsNative(name, (_, as) =>
      JsNum(a.items.indexWhere(strictEq(_, as.headOption.getOrElse(JsUndefined))).toDouble))
    case "includes" => JsNative(name, (_, as) =>
      JsBool(a.items.exists(strictEq(_, as.headOption.getOrElse(JsUndefined)))))
    case "join"  => JsNative(name, (_, as) => {
      val sep = as.headOption.map(toStr).getOrElse(",")
      JsStr(a.items.map(v => if (v == JsNull || v == JsUndefined) "" else toStr(v)).mkString(sep))
    })
    case "slice" => JsNative(name, (_, as) => {
      val (from, until) = sliceRange(a.items.length, as)
      JsArr.of(if (from >= until) Vector.empty else a.items.slice(from, until))
    })
    case "concat" => JsNative(name, (_, as) => {
      val out = mutable.ArrayBuffer.from(a.items)
      as.foreach { case arr: JsArr => out ++= arr.items; case v => out += v }
      new JsArr(out)
    })
    case "reverse" => JsNative(name, (_, _) => {
      val rev = a.items.reverse
      a.items.clear(); a.items ++= rev
      a
    })
    case "sort" => JsNative(name, (_, as) => {
      val sorted = as.headOption match {
        case Some(cmp @ (_: JsFunc | _: JsNative)) =>
          a.items.sortWith((x, y) => toNumber(interp.call(cmp, JsUndefined, Seq(x, y))) < 0)
        case _ => a.items.sortBy(toStr) // default sort: string order, per spec
      }
      a.items.clear(); a.items ++= sorted
      a
    })
    case "flat" => JsNative(name, (_, as) => {
      val depth = as.headOption.map(toNumber(_).toInt).getOrElse(1)
      def go(items: Seq[JsVal], d: Int): Seq[JsVal] = items.flatMap {
        case inner: JsArr if d > 0 => go(inner.items.toSeq, d - 1)
        case v                     => Seq(v)
      }
      JsArr.of(go(a.items.toSeq, depth))
    })
    case "flatMap" => JsNative(name, (_, as) => {
      val f = fnArg(as, "flatMap")
      JsArr.of(a.items.zipWithIndex.flatMap { case (v, i) =>
        interp.call(f, JsUndefined, Seq(v, JsNum(i), a)) match {
          case inner: JsArr => inner.items.toSeq
          case single       => Seq(single)
        }
      })
    })
    case "at" => JsNative(name, (_, as) => {
      val i0 = num(as, 0).toInt
      val i = if (i0 < 0) a.items.length + i0 else i0
      if (i >= 0 && i < a.items.length) a.items(i) else JsUndefined
    })
    case "keys"   => JsNative(name, (_, _) => JsArr.of(a.items.indices.map(i => JsNum(i.toDouble))))
    case "toString" => JsNative(name, (_, _) => JsStr(toStr(a)))
    case other => throw new JsError(s"unsupported array method '.$other'")
  })

  private def fnArg(as: Seq[JsVal], m: String): JsVal = as.headOption match {
    case Some(f @ (_: JsFunc | _: JsNative)) => f
    case _ => throw new JsError(s"Array.$m expects a function argument")
  }

  private def numberMember(d: Double, name: String): Option[JsVal] = Some(name match {
    case "toFixed" => JsNative(name, (_, as) => {
      val digits = as.headOption.map(toNumber(_).toInt).getOrElse(0)
      JsStr(String.format(java.util.Locale.ROOT, s"%.${digits}f", java.lang.Double.valueOf(d)))
    })
    case "toString" => JsNative(name, (_, as) => as.headOption match {
      case Some(r) if toNumber(r).toInt != 10 =>
        JsStr(java.lang.Long.toString(d.toLong, toNumber(r).toInt))
      case _ => JsStr(numToString(d))
    })
    case "toPrecision" => JsNative(name, (_, as) => {
      val p = as.headOption.map(toNumber(_).toInt).getOrElse(6)
      JsStr(new java.math.BigDecimal(d).round(new java.math.MathContext(p)).toString)
    })
    case other => throw new JsError(s"unsupported number method '.$other'")
  })

  private def dateMember(date: JsDate, name: String): JsVal = {
    lazy val utc = java.time.Instant.ofEpochMilli(date.millis).atOffset(java.time.ZoneOffset.UTC)
    name match {
      case "getTime" | "valueOf" => JsNative(name, (_, _) => JsNum(date.millis.toDouble))
      case "getFullYear"  => JsNative(name, (_, _) => JsNum(utc.getYear.toDouble))
      case "getMonth"     => JsNative(name, (_, _) => JsNum((utc.getMonthValue - 1).toDouble))
      case "getDate"      => JsNative(name, (_, _) => JsNum(utc.getDayOfMonth.toDouble))
      case "getDay"       => JsNative(name, (_, _) => JsNum((utc.getDayOfWeek.getValue % 7).toDouble))
      case "getHours"     => JsNative(name, (_, _) => JsNum(utc.getHour.toDouble))
      case "getMinutes"   => JsNative(name, (_, _) => JsNum(utc.getMinute.toDouble))
      case "getSeconds"   => JsNative(name, (_, _) => JsNum(utc.getSecond.toDouble))
      case "getMilliseconds" => JsNative(name, (_, _) => JsNum((date.millis % 1000).toDouble))
      case "toISOString"  => JsNative(name, (_, _) => JsStr(isoString(date.millis)))
      case "toString"     => JsNative(name, (_, _) => JsStr(isoString(date.millis)))
      // getUTC* aliases (we are always UTC)
      case "getUTCFullYear" => JsNative(name, (_, _) => JsNum(utc.getYear.toDouble))
      case "getUTCMonth"    => JsNative(name, (_, _) => JsNum((utc.getMonthValue - 1).toDouble))
      case "getUTCDate"     => JsNative(name, (_, _) => JsNum(utc.getDayOfMonth.toDouble))
      case "getUTCHours"    => JsNative(name, (_, _) => JsNum(utc.getHour.toDouble))
      case other => throw new JsError(s"unsupported Date method '.$other'")
    }
  }
}
