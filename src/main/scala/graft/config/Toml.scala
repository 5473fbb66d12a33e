package graft.config

import scala.collection.mutable

/** Minimal TOML parser covering the subset conveyor pipelines use
  * (reference: every example pipeline under examples/ + the
  * src/core/config.rs:189-201 model):
  * comments, [table] / nested [a.b] headers, [[array-of-tables]] and their
  * subtables ([stages.config]), key = value with basic/literal/multiline
  * strings, ints, floats, bools, homogeneous-or-not arrays (multiline ok),
  * inline tables, dotted keys. No datetimes (unused by the reference).
  *
  * Written from the TOML v1.0 spec; offline build has no TOML library
  * (SURVEY §7 constraint).
  */
object Toml {

  def parse(text: String): CTbl = new Parser(text).parseDocument()

  final class TomlError(msg: String, line: Int)
      extends RuntimeException(s"TOML parse error at line $line: $msg")

  private final class Parser(text: String) {
    private val src = text
    private var pos = 0
    private var line = 1

    // document root: mutable tree of CVal
    private val root = mutable.LinkedHashMap[String, Any]() // String -> mutable tree | CVal
    // current insertion table (points into root tree)
    private var current: mutable.LinkedHashMap[String, Any] = root

    def parseDocument(): CTbl = {
      while (pos < src.length) {
        skipWsAndComments()
        if (pos >= src.length) ()
        else if (peek == '[') parseHeader()
        else parseKeyValue(current)
      }
      freezeTable(root)
    }

    private def freeze(v: Any): CVal = v match {
      case t: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => freezeTable(t)
      case a: mutable.ArrayBuffer[Any @unchecked] => CArr(a.map(freeze).toVector)
      case c: CVal => c
    }
    private def freezeTable(t: mutable.LinkedHashMap[String, Any]): CTbl =
      CTbl(t.map { case (k, v) => k -> freeze(v) }.toMap)

    private def peek: Char = src(pos)
    private def err(msg: String): Nothing = throw new TomlError(msg, line)

    private def skipInlineWs(): Unit =
      while (pos < src.length && (peek == ' ' || peek == '\t')) pos += 1

    private def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < src.length) {
        peek match {
          case ' ' | '\t' | '\r' => pos += 1
          case '\n' => line += 1; pos += 1
          case '#' => while (pos < src.length && peek != '\n') pos += 1
          case _ => go = false
        }
      }
    }

    private def parseHeader(): Unit = {
      pos += 1 // '['
      val isArray = pos < src.length && peek == '['
      if (isArray) pos += 1
      val path = parseDottedKey(closing = ']')
      if (isArray) { expect(']'); expect(']') } else expect(']')
      skipInlineWs()
      if (pos < src.length && peek == '#') while (pos < src.length && peek != '\n') pos += 1
      // navigate/create
      var node = root
      path.dropRight(1).foreach { seg =>
        node = descend(node, seg)
      }
      val last = path.last
      if (isArray) {
        val arr = node.getOrElseUpdate(last, mutable.ArrayBuffer[Any]()) match {
          case a: mutable.ArrayBuffer[Any @unchecked] => a
          case _ => err(s"key '$last' is not an array of tables")
        }
        val tbl = mutable.LinkedHashMap[String, Any]()
        arr += tbl
        current = tbl
      } else {
        current = node.getOrElseUpdate(last, mutable.LinkedHashMap[String, Any]()) match {
          case t: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => t
          case _ => err(s"key '$last' already defined as a value")
        }
      }
    }

    /** descend into table `seg`; if seg is an array-of-tables, descend into
      * its LAST element (TOML [stages.config] semantics). */
    private def descend(node: mutable.LinkedHashMap[String, Any], seg: String): mutable.LinkedHashMap[String, Any] =
      node.getOrElseUpdate(seg, mutable.LinkedHashMap[String, Any]()) match {
        case t: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => t
        case a: mutable.ArrayBuffer[Any @unchecked] if a.nonEmpty =>
          a.last match {
            case t: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => t
            case _ => err(s"cannot descend into '$seg'")
          }
        case _ => err(s"cannot descend into '$seg'")
      }

    private def parseDottedKey(closing: Char): Vector[String] = {
      val parts = mutable.ArrayBuffer[String]()
      var done = false
      while (!done) {
        skipInlineWs()
        parts += parseKeySegment()
        skipInlineWs()
        if (pos < src.length && peek == '.') pos += 1
        else done = true
      }
      parts.toVector
    }

    private def parseKeySegment(): String = {
      skipInlineWs()
      if (pos >= src.length) err("unexpected end of input in key")
      peek match {
        case '"'  => parseBasicString()
        case '\'' => parseLiteralString()
        case _ =>
          val start = pos
          while (pos < src.length && (peek.isLetterOrDigit || peek == '_' || peek == '-')) pos += 1
          if (pos == start) err(s"invalid key character '${peek}'")
          src.substring(start, pos)
      }
    }

    private def expect(c: Char): Unit = {
      skipInlineWs()
      if (pos >= src.length || peek != c) err(s"expected '$c'")
      pos += 1
    }

    private def parseKeyValue(into: mutable.LinkedHashMap[String, Any]): Unit = {
      val path = parseDottedKey(closing = '=')
      expect('=')
      skipInlineWs()
      val v = parseValue()
      var node = into
      path.dropRight(1).foreach(seg => node = descend(node, seg))
      if (node.contains(path.last)) err(s"duplicate key '${path.last}'")
      node(path.last) = v
      // rest of line must be ws/comment
      skipInlineWs()
      if (pos < src.length && peek == '#') while (pos < src.length && peek != '\n') pos += 1
      if (pos < src.length && peek == '\r') pos += 1
      if (pos < src.length && peek == '\n') { line += 1; pos += 1 }
      else if (pos < src.length) err(s"unexpected trailing content after value")
    }

    private def parseValue(): Any = {
      if (pos >= src.length) err("expected value")
      peek match {
        case '"' =>
          if (src.startsWith("\"\"\"", pos)) CStr(parseMultilineBasic())
          else CStr(parseBasicString())
        case '\'' =>
          if (src.startsWith("'''", pos)) CStr(parseMultilineLiteral())
          else CStr(parseLiteralString())
        case '[' => parseArray()
        case '{' => parseInlineTable()
        case 't' if src.startsWith("true", pos)  => pos += 4; CBool(true)
        case 'f' if src.startsWith("false", pos) => pos += 5; CBool(false)
        case _ => parseNumber()
      }
    }

    private def parseBasicString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (pos < src.length && peek != '"') {
        if (peek == '\\') {
          pos += 1
          if (pos >= src.length) err("unterminated escape")
          peek match {
            case 'n' => sb += '\n'; pos += 1
            case 't' => sb += '\t'; pos += 1
            case 'r' => sb += '\r'; pos += 1
            case '"' => sb += '"'; pos += 1
            case '\\' => sb += '\\'; pos += 1
            case 'b' => sb += '\b'; pos += 1
            case 'f' => sb += '\f'; pos += 1
            case 'u' =>
              pos += 1
              val hex = src.substring(pos, math.min(pos + 4, src.length))
              if (hex.length < 4) err("bad \\u escape")
              sb += Integer.parseInt(hex, 16).toChar; pos += 4
            case 'U' =>
              pos += 1
              val hex = src.substring(pos, math.min(pos + 8, src.length))
              if (hex.length < 8) err("bad \\U escape")
              sb.append(Character.toChars(Integer.parseInt(hex, 16))); pos += 8
            case c => err(s"unknown escape '\\$c'")
          }
        } else if (peek == '\n') err("newline in basic string")
        else { sb += peek; pos += 1 }
      }
      expect('"')
      sb.result()
    }

    private def parseLiteralString(): String = {
      expect('\'')
      val start = pos
      while (pos < src.length && peek != '\'' && peek != '\n') pos += 1
      if (pos >= src.length || peek != '\'') err("unterminated literal string")
      val s = src.substring(start, pos)
      pos += 1
      s
    }

    private def parseMultilineBasic(): String = {
      pos += 3
      if (pos < src.length && peek == '\n') { line += 1; pos += 1 }
      else if (pos + 1 < src.length && peek == '\r' && src(pos + 1) == '\n') { line += 1; pos += 2 }
      val sb = new StringBuilder
      while (pos < src.length && !src.startsWith("\"\"\"", pos)) {
        if (peek == '\\' && pos + 1 < src.length && (src(pos + 1) == '\n' || src(pos + 1) == '\r' || src(pos + 1) == ' ' || src(pos + 1) == '\t')) {
          // line-ending backslash: trim following whitespace
          pos += 1
          while (pos < src.length && (peek == ' ' || peek == '\t' || peek == '\n' || peek == '\r')) {
            if (peek == '\n') line += 1
            pos += 1
          }
        } else if (peek == '\\') {
          // reuse escape handling by faking a tiny basic-string parse
          pos += 1
          peek match {
            case 'n' => sb += '\n'; pos += 1
            case 't' => sb += '\t'; pos += 1
            case 'r' => sb += '\r'; pos += 1
            case '"' => sb += '"'; pos += 1
            case '\\' => sb += '\\'; pos += 1
            case c => err(s"unknown escape '\\$c'")
          }
        } else {
          if (peek == '\n') line += 1
          sb += peek; pos += 1
        }
      }
      if (!src.startsWith("\"\"\"", pos)) err("unterminated multiline string")
      pos += 3
      sb.result()
    }

    private def parseMultilineLiteral(): String = {
      pos += 3
      if (pos < src.length && peek == '\n') { line += 1; pos += 1 }
      val start = pos
      while (pos < src.length && !src.startsWith("'''", pos)) {
        if (peek == '\n') line += 1
        pos += 1
      }
      if (!src.startsWith("'''", pos)) err("unterminated multiline literal")
      val s = src.substring(start, pos)
      pos += 3
      s
    }

    private def parseArray(): CVal = {
      expect('[')
      val items = mutable.ArrayBuffer[Any]()
      var done = false
      while (!done) {
        skipWsAndComments()
        if (pos < src.length && peek == ']') { pos += 1; done = true }
        else {
          items += parseValue()
          skipWsAndComments()
          if (pos < src.length && peek == ',') pos += 1
          else if (pos < src.length && peek == ']') { pos += 1; done = true }
          else err("expected ',' or ']' in array")
        }
      }
      CArr(items.map {
        case c: CVal => c
        case t: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
          CTbl(t.map { case (k, v) => k -> (v match { case c: CVal => c; case _ => err("bad nested") }) }.toMap)
      }.toVector)
    }

    private def parseInlineTable(): CVal = {
      expect('{')
      val tbl = mutable.LinkedHashMap[String, Any]()
      skipInlineWs()
      if (pos < src.length && peek == '}') { pos += 1 }
      else {
        var done = false
        while (!done) {
          skipInlineWs()
          val path = parseDottedKey(closing = '=')
          expect('=')
          skipInlineWs()
          val v = parseValue()
          var node = tbl
          path.dropRight(1).foreach(seg => node = descend(node, seg))
          node(path.last) = v
          skipInlineWs()
          if (pos < src.length && peek == ',') { pos += 1 }
          else if (pos < src.length && peek == '}') { pos += 1; done = true }
          else err("expected ',' or '}' in inline table")
        }
      }
      freezeMutable(tbl)
    }

    private def freezeMutable(t: mutable.LinkedHashMap[String, Any]): CTbl =
      CTbl(t.map { case (k, v) =>
        k -> (v match {
          case c: CVal => c
          case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => freezeMutable(m)
          case a: mutable.ArrayBuffer[Any @unchecked] => CArr(a.map {
            case c: CVal => c
            case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => freezeMutable(m)
          }.toVector)
        })
      }.toMap)

    private def parseNumber(): CVal = {
      val start = pos
      while (pos < src.length && (peek.isDigit || "+-._eExXoObBabcdefABCDEF".indexOf(peek) >= 0)) pos += 1
      val raw = src.substring(start, pos).replace("_", "")
      if (raw.isEmpty) err("expected value")
      if (raw.startsWith("0x") || raw.startsWith("0X")) CLong(java.lang.Long.parseLong(raw.drop(2), 16))
      else if (raw.startsWith("0o")) CLong(java.lang.Long.parseLong(raw.drop(2), 8))
      else if (raw.startsWith("0b")) CLong(java.lang.Long.parseLong(raw.drop(2), 2))
      else if (raw.contains('.') || raw.contains('e') || raw.contains('E'))
        try CDouble(raw.toDouble) catch { case _: NumberFormatException => err(s"bad number '$raw'") }
      else
        try CLong(raw.toLong) catch { case _: NumberFormatException => err(s"bad number '$raw'") }
    }
  }
}
