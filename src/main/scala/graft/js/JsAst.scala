package graft.js

import scala.collection.mutable

/** Tokens, AST, lexer and parser for the `js.eval` ECMAScript subset.
  *
  * Supported surface (declared — JsInterpSpec pins each item):
  *   - literals: numbers (dec/hex/exponent), 'single'/"double" strings with
  *     escapes, template literals with `${expr}` interpolation, booleans,
  *     null, undefined, object/array literals (incl. shorthand props,
  *     computed keys, spread in array/object literals)
  *   - functions: declarations, expressions, arrow functions (expression
  *     and block bodies), closures, `return`
  *   - statements: var/let/const (multi-declarator), if/else, while,
  *     do-while, classic for, for-of, for-in, break, continue, block,
  *     throw, try/catch/finally, switch (with fall-through), expression
  *     statements
  *   - operators: + - * / % **, comparisons, == != === !==, && || ??,
  *     ! unary- unary+ typeof, ternary, assignment (= += -= *= /= %=),
  *     ++/-- (pre/post), member access (. [] ?.), calls, `new`, `in`
  *   - regex: /pattern/flags literals + new RegExp(p, f), compiled to
  *     java.util.regex; g/i/m/s flags; test/exec and the regex-aware
  *     string methods (replace/replaceAll/match/matchAll/search/split)
  *   - destructuring in declarations, for-of binders AND function
  *     params: object/array patterns, nesting, renames, defaults,
  *     holes, ...rest; default + rest parameters
  *   - assignment-position destructuring: `[a, b] = [b, a]`,
  *     `({x, y: p.q = 3, ...rest} = obj)` — targets may be identifiers,
  *     members, indexes, or nested patterns (object form needs parens in
  *     statement position, as in real JS)
  *   - classes: declarations with constructor, instance methods, instance
  *     fields, static methods/fields, `extends` + `super(...)` /
  *     `super.m(...)`, `this` (lexical in arrows), `instanceof`. Methods
  *     resolve through the class, so Object.keys/JSON.stringify over an
  *     instance see own data fields only, like real prototypes.
  * Deliberately out of scope (clear parse/runtime errors, documented in
  * COVERAGE.md): generators/async, labels, getters/setters, class
  * expressions, raw prototype manipulation, stateful regex exec
  * (lastIndex).
  */
object JsTok {
  sealed trait Token { def pos: Int }
  final case class TNum(d: Double, pos: Int) extends Token
  final case class TStr(s: String, pos: Int) extends Token
  /** Template literal: literal chunks interleaved with expression sources.
    * chunks.size == exprs.size + 1. */
  final case class TTemplate(chunks: Vector[String], exprs: Vector[Vector[Token]], pos: Int) extends Token
  final case class TIdent(name: String, pos: Int) extends Token
  final case class TKw(name: String, pos: Int) extends Token
  final case class TPunct(s: String, pos: Int) extends Token
  final case class TRegex(pattern: String, flags: String, pos: Int) extends Token
  final case class TEof(pos: Int) extends Token

  val keywords: Set[String] = Set(
    "function", "return", "var", "let", "const", "if", "else", "for",
    "while", "do", "break", "continue", "new", "true", "false", "null",
    "undefined", "typeof", "in", "of", "throw",
    "try", "catch", "finally", "switch", "case", "default",
    "class", "extends", "super", "instanceof")
}

object JsLexer {
  import JsTok._

  /** After these tokens a `/` is division; anywhere else it starts a regex
    * literal (the standard operand-position heuristic). */
  private def regexAllowed(prev: Option[Token]): Boolean = prev match {
    case None => true
    case Some(_: TNum | _: TStr | _: TTemplate | _: TIdent | _: TRegex) => false
    case Some(TKw(w, _)) => !Set("true", "false", "null", "undefined").contains(w)
    case Some(TPunct(p, _)) => !Set(")", "]", "}", "++", "--").contains(p)
    case Some(_: TEof) => false
  }

  def lex(src: String): Vector[Token] = {
    val out = mutable.ArrayBuffer.empty[Token]
    var i = 0
    val n = src.length
    def fail(msg: String) = throw new JsError(s"js parse error at offset $i: $msg")

    while (i < n) {
      val c = src.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        val end = src.indexOf("*/", i + 2)
        if (end < 0) fail("unterminated /* comment")
        i = end + 2
      } else if (c == '/' && regexAllowed(out.lastOption)) {
        val start = i
        i += 1
        val b = new java.lang.StringBuilder
        var inClass = false
        var closed = false
        while (!closed) {
          if (i >= n || src.charAt(i) == '\n') fail("unterminated regex literal")
          val ch = src.charAt(i)
          if (ch == '\\') {
            if (i + 1 >= n) fail("unterminated regex literal")
            b.append(ch).append(src.charAt(i + 1)); i += 2
          } else if (ch == '[') { inClass = true; b.append(ch); i += 1 }
          else if (ch == ']' && inClass) { inClass = false; b.append(ch); i += 1 }
          else if (ch == '/' && !inClass) { i += 1; closed = true }
          else { b.append(ch); i += 1 }
        }
        val fs = i
        while (i < n && Character.isJavaIdentifierPart(src.charAt(i))) i += 1
        out += TRegex(b.toString, src.substring(fs, i), start)
      } else if (Character.isDigit(c) || (c == '.' && i + 1 < n && Character.isDigit(src.charAt(i + 1)))) {
        val start = i
        if (c == '0' && i + 1 < n && (src.charAt(i + 1) == 'x' || src.charAt(i + 1) == 'X')) {
          i += 2
          while (i < n && isHex(src.charAt(i))) i += 1
          out += TNum(java.lang.Long.parseLong(src.substring(start + 2, i), 16).toDouble, start)
        } else {
          while (i < n && Character.isDigit(src.charAt(i))) i += 1
          if (i < n && src.charAt(i) == '.') { i += 1; while (i < n && Character.isDigit(src.charAt(i))) i += 1 }
          if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
            i += 1
            if (i < n && (src.charAt(i) == '+' || src.charAt(i) == '-')) i += 1
            while (i < n && Character.isDigit(src.charAt(i))) i += 1
          }
          out += TNum(src.substring(start, i).toDouble, start)
        }
      } else if (c == '"' || c == '\'') {
        val start = i
        i += 1
        val b = new java.lang.StringBuilder
        var closed = false
        while (!closed) {
          if (i >= n) fail("unterminated string")
          val ch = src.charAt(i); i += 1
          if (ch == c) closed = true
          else if (ch == '\\') { val (decoded, ni) = escape(src, i); b.append(decoded); i = ni }
          else b.append(ch)
        }
        out += TStr(b.toString, start)
      } else if (c == '`') {
        val start = i
        i += 1
        val chunks = Vector.newBuilder[String]
        val exprs = Vector.newBuilder[Vector[Token]]
        val b = new java.lang.StringBuilder
        var closed = false
        while (!closed) {
          if (i >= n) fail("unterminated template literal")
          val ch = src.charAt(i)
          if (ch == '`') { i += 1; closed = true }
          else if (ch == '\\') { i += 1; val (decoded, ni) = escape(src, i); b.append(decoded); i = ni }
          else if (ch == '$' && i + 1 < n && src.charAt(i + 1) == '{') {
            chunks += b.toString; b.setLength(0)
            i += 2
            // find matching close brace, tracking nesting + strings
            val exprStart = i
            var depth = 1
            while (depth > 0) {
              if (i >= n) fail("unterminated ${ in template literal")
              val e = src.charAt(i)
              if (e == '{') depth += 1
              else if (e == '}') depth -= 1
              else if (e == '"' || e == '\'') {
                val q = e; i += 1
                while (i < n && src.charAt(i) != q) { if (src.charAt(i) == '\\') i += 1; i += 1 }
              }
              i += 1
            }
            exprs += lex(src.substring(exprStart, i - 1))
          } else { b.append(ch); i += 1 }
        }
        chunks += b.toString
        out += TTemplate(chunks.result(), exprs.result(), start)
      } else if (Character.isJavaIdentifierStart(c)) {
        val start = i
        while (i < n && Character.isJavaIdentifierPart(src.charAt(i))) i += 1
        val w = src.substring(start, i)
        out += (if (keywords(w)) TKw(w, start) else TIdent(w, start))
      } else {
        val start = i
        val three = if (i + 3 <= n) src.substring(i, i + 3) else ""
        val two = if (i + 2 <= n) src.substring(i, i + 2) else ""
        if (Set("===", "!==", "**=", "...").contains(three)) { out += TPunct(three, start); i += 3 }
        else if (Set("==", "!=", "<=", ">=", "&&", "||", "??", "?.", "=>",
                     "+=", "-=", "*=", "/=", "%=", "++", "--", "**").contains(two)) {
          out += TPunct(two, start); i += 2
        } else if ("+-*/%<>=!?:.,;()[]{}&|".indexOf(c) >= 0) {
          out += TPunct(c.toString, start); i += 1
        } else fail(s"unexpected character '$c'")
      }
    }
    out += TEof(n)
    out.toVector
  }

  private def isHex(c: Char) =
    Character.isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Decode one escape starting at src(i) (the char after the backslash);
    * returns (decoded string, next index). */
  private def escape(src: String, i: Int): (String, Int) = {
    if (i >= src.length) throw new JsError("dangling backslash")
    src.charAt(i) match {
      case 'n' => ("\n", i + 1)
      case 't' => ("\t", i + 1)
      case 'r' => ("\r", i + 1)
      case 'b' => ("\b", i + 1)
      case 'f' => ("\f", i + 1)
      case '0' => ("\u0000", i + 1)
      case 'u' =>
        if (i + 1 < src.length && src.charAt(i + 1) == '{') {
          val end = src.indexOf('}', i + 2)
          if (end < 0) throw new JsError("unterminated \\u{...}")
          (new String(Character.toChars(Integer.parseInt(src.substring(i + 2, end), 16))), end + 1)
        } else {
          if (i + 5 > src.length) throw new JsError("bad \\u escape")
          (Integer.parseInt(src.substring(i + 1, i + 5), 16).toChar.toString, i + 5)
        }
      case 'x' =>
        if (i + 3 > src.length) throw new JsError("bad \\x escape")
        (Integer.parseInt(src.substring(i + 1, i + 3), 16).toChar.toString, i + 3)
      case '\n' => ("", i + 1) // line continuation
      case other => (other.toString, i + 1)
    }
  }
}

// ------------------------------------------------------------------- AST

sealed trait Expr
final case class ENum(d: Double) extends Expr
final case class EStr(s: String) extends Expr
/** Regex literal — compiled once per AST (scripts parse once per
  * partition; JsRegex is immutable so cross-row sharing is safe). */
final case class ERegex(pattern: String, flags: String) extends Expr {
  lazy val compiled: JsRegex = new JsRegex(pattern, flags)
}
final case class ETemplate(chunks: Vector[String], exprs: Vector[Expr]) extends Expr
final case class EBool(b: Boolean) extends Expr
case object ENull extends Expr
case object EUndefined extends Expr
final case class EIdent(name: String) extends Expr
final case class EArr(items: Vector[Expr], spreads: Set[Int]) extends Expr
/** key is either a literal name or (for computed keys) an Expr. */
final case class EObjLit(entries: Vector[(Either[String, Expr], Expr)], spreads: Vector[Expr], order: Vector[Either[Int, Int]]) extends Expr
/** Function parameter: binding pattern + optional default + rest flag
  * (`...rest` must be last and a plain identifier). */
final case class Param(pat: Pat, default: Option[Expr], rest: Boolean)

final case class EFunc(params: Vector[Param], body: Vector[Stmt], name: String) extends Expr
final case class EUn(op: String, e: Expr) extends Expr
final case class EUpdate(op: String, target: Expr, prefix: Boolean) extends Expr
final case class EBin(op: String, l: Expr, r: Expr) extends Expr
final case class ELogical(op: String, l: Expr, r: Expr) extends Expr
final case class ECond(c: Expr, t: Expr, f: Expr) extends Expr
final case class EAssign(op: String, target: Expr, value: Expr) extends Expr
final case class EMember(obj: Expr, name: String, optional: Boolean) extends Expr
final case class EIndex(obj: Expr, idx: Expr, optional: Boolean) extends Expr
final case class ECall(callee: Expr, args: Vector[Expr], optional: Boolean) extends Expr
final case class ENew(callee: Expr, args: Vector[Expr]) extends Expr
/** `super` — valid only as a call (`super(...)`) or member base
  * (`super.m`); resolved against the running method's home class. */
case object ESuper extends Expr
/** Object-literal shorthand-with-default `{a = 1}` — legal only when the
  * literal is consumed as a destructuring-assignment pattern. */
final case class EShorthandDefault(name: String, dflt: Expr) extends Expr

/** Destructuring binding pattern (declarations and for-of binders).
  * Patterns nest: `const {a: {b}, c: [d] = []} = x`. */
sealed trait Pat
final case class PIdent(name: String) extends Pat
/** entries: (propertyKey, target pattern, default); rest: `...name`. */
final case class PObj(entries: Vector[(String, Pat, Option[Expr])], rest: Option[String]) extends Pat
/** items: None = hole (`[a, , b]`); rest: `...name`. */
final case class PArr(items: Vector[Option[(Pat, Option[Expr])]], rest: Option[String]) extends Pat

sealed trait Stmt
final case class SExpr(e: Expr) extends Stmt
final case class SDecl(kind: String, decls: Vector[(String, Option[Expr])]) extends Stmt
/** One destructuring declarator: `const {a, b} = init`. */
final case class SDeclPat(kind: String, pat: Pat, init: Expr) extends Stmt
/** Statement sequence WITHOUT a new scope (mixed declarator lists). */
final case class SSeq(stmts: Vector[Stmt]) extends Stmt
/** for (const [k, v] of iter) — pattern-binding loop. */
final case class SForOfPat(decl: String, pat: Pat, iter: Expr, body: Vector[Stmt]) extends Stmt
final case class SFunc(name: String, params: Vector[Param], body: Vector[Stmt]) extends Stmt
final case class SReturn(e: Option[Expr]) extends Stmt
final case class SIf(c: Expr, t: Vector[Stmt], f: Vector[Stmt]) extends Stmt
final case class SWhile(c: Expr, body: Vector[Stmt]) extends Stmt
final case class SDoWhile(body: Vector[Stmt], c: Expr) extends Stmt
final case class SFor(init: Option[Stmt], cond: Option[Expr], update: Option[Expr], body: Vector[Stmt]) extends Stmt
final case class SForOf(decl: String, name: String, iter: Expr, body: Vector[Stmt], keys: Boolean) extends Stmt
case object SBreak extends Stmt
case object SContinue extends Stmt
final case class SThrow(e: Expr) extends Stmt
final case class SBlock(body: Vector[Stmt]) extends Stmt
final case class STry(body: Vector[Stmt], catchParam: Option[String],
                      catchBody: Option[Vector[Stmt]], finallyBody: Vector[Stmt]) extends Stmt
/** cases: (test, body); None test = default. Fall-through per JS. */
final case class SSwitch(scrutinee: Expr, cases: Vector[(Option[Expr], Vector[Stmt])]) extends Stmt
/** One class member: method or field, instance or static. Exactly one of
  * `method` / `fieldInit`-shaped payloads is set per kind. */
final case class ClassMethod(name: String, params: Vector[Param], body: Vector[Stmt], static: Boolean)
final case class ClassField(name: String, init: Option[Expr], static: Boolean)
/** `class Name [extends Parent] { ... }` (declaration position only). */
final case class SClass(name: String, parentE: Option[Expr],
                        ctor: Option[(Vector[Param], Vector[Stmt])],
                        methods: Vector[ClassMethod],
                        fields: Vector[ClassField]) extends Stmt

object JsParser {
  import JsTok._

  def parseProgram(src: String): Vector[Stmt] = {
    val p = new JsParser(JsLexer.lex(src))
    val stmts = Vector.newBuilder[Stmt]
    while (!p.atEof) stmts += p.statement()
    stmts.result()
  }

  def parseTokens(toks: Vector[Token]): Expr = {
    val p = new JsParser(toks)
    val e = p.expression()
    if (!p.atEof) throw new JsError("js parse error: trailing tokens in interpolation")
    e
  }
}

final class JsParser(toks: Vector[JsTok.Token]) {
  import JsTok._

  private var pos = 0
  private def peek: Token = toks(pos)
  private def peek2: Token = if (pos + 1 < toks.size) toks(pos + 1) else toks.last
  private def advance(): Token = { val t = toks(pos); if (pos < toks.size - 1) pos += 1; t }
  def atEof: Boolean = peek.isInstanceOf[TEof]
  private def fail(msg: String) =
    throw new JsError(s"js parse error at offset ${peek.pos}: $msg (found ${describe(peek)})")
  private def describe(t: Token) = t match {
    case TNum(d, _) => s"number $d"
    case TStr(s, _) => s"string \"$s\""
    case _: TTemplate => "template literal"
    case TIdent(n, _) => s"identifier '$n'"
    case TKw(n, _) => s"keyword '$n'"
    case TPunct(s, _) => s"'$s'"
    case TRegex(p, f, _) => s"regex /$p/$f"
    case _: TEof => "end of script"
  }
  private def isPunct(s: String): Boolean = peek match { case TPunct(x, _) => x == s; case _ => false }
  private def isKw(s: String): Boolean = peek match { case TKw(x, _) => x == s; case _ => false }
  private def eatPunct(s: String): Unit = if (isPunct(s)) advance() else fail(s"expected '$s'")
  private def eatKw(s: String): Unit = if (isKw(s)) advance() else fail(s"expected '$s'")
  private def tryPunct(s: String): Boolean = if (isPunct(s)) { advance(); true } else false
  private def ident(): String = peek match {
    case TIdent(n, _) => advance(); n
    // allow non-reserved-feeling keywords as property names handled at member site
    case _ => fail("expected identifier")
  }
  private def eatSemi(): Unit = { while (isPunct(";")) advance() }

  // ------------------------------------------------------------ statements

  def statement(): Stmt = {
    val s = statementInner()
    eatSemi()
    s
  }

  private def block(): Vector[Stmt] = {
    eatPunct("{")
    val b = Vector.newBuilder[Stmt]
    while (!isPunct("}") && !atEof) b += statement()
    eatPunct("}")
    b.result()
  }

  /** A statement body that may be a block or a single statement. */
  private def bodyOrBlock(): Vector[Stmt] =
    if (isPunct("{")) block() else Vector(statement())

  private def statementInner(): Stmt = peek match {
    case TPunct("{", _) => SBlock(block())
    case TPunct(";", _) => advance(); SBlock(Vector.empty)
    case TKw("var" | "let" | "const", _) => declStatement()
    case TKw("function", _) =>
      advance()
      val name = ident()
      val params = paramList()
      SFunc(name, params, block())
    case TKw("class", _) => classDecl()
    case TKw("return", _) =>
      advance()
      if (isPunct(";") || isPunct("}") || atEof) SReturn(None) else SReturn(Some(expression()))
    case TKw("if", _) =>
      advance(); eatPunct("(")
      val c = expression(); eatPunct(")")
      val t = bodyOrBlock()
      val f = if (isKw("else")) { advance(); bodyOrBlock() } else Vector.empty
      SIf(c, t, f)
    case TKw("while", _) =>
      advance(); eatPunct("(")
      val c = expression(); eatPunct(")")
      SWhile(c, bodyOrBlock())
    case TKw("do", _) =>
      advance()
      val b = bodyOrBlock()
      eatKw("while"); eatPunct("(")
      val c = expression(); eatPunct(")")
      SDoWhile(b, c)
    case TKw("for", _) => forStatement()
    case TKw("break", _)    => advance(); SBreak
    case TKw("continue", _) => advance(); SContinue
    case TKw("throw", _)    => advance(); SThrow(expression())
    case TKw("try", _) =>
      advance()
      val body = block()
      val (cp, cb) = if (isKw("catch")) {
        advance()
        val param = if (tryPunct("(")) { val p = ident(); eatPunct(")"); Some(p) } else None
        (param, Some(block()))
      } else (None, None)
      val fin = if (isKw("finally")) { advance(); block() } else Vector.empty
      if (cb.isEmpty && fin.isEmpty) fail("try requires catch or finally")
      STry(body, cp, cb, fin)
    case TKw("switch", _) =>
      advance(); eatPunct("(")
      val scrut = expression(); eatPunct(")")
      eatPunct("{")
      val cases = Vector.newBuilder[(Option[Expr], Vector[Stmt])]
      while (!isPunct("}") && !atEof) {
        val test = peek match {
          case TKw("case", _)    => advance(); val e = expression(); eatPunct(":"); Some(e)
          case TKw("default", _) => advance(); eatPunct(":"); None
          case _                 => fail("expected 'case' or 'default' in switch")
        }
        val body = Vector.newBuilder[Stmt]
        while (!isPunct("}") && !isKw("case") && !isKw("default") && !atEof)
          body += statement()
        cases += ((test, body.result()))
      }
      eatPunct("}")
      SSwitch(scrut, cases.result())
    case _ => SExpr(expression())
  }

  private def declStatement(): Stmt = {
    val kind = advance().asInstanceOf[TKw].name
    val stmts = Vector.newBuilder[Stmt]
    val plain = Vector.newBuilder[(String, Option[Expr])]
    var sawPattern = false
    var more = true
    while (more) {
      if (isPunct("{") || isPunct("[")) {
        sawPattern = true
        val p = pattern()
        if (!tryPunct("=")) fail("destructuring declaration requires an initializer")
        stmts += SDeclPat(kind, p, assignExpr())
      } else {
        val name = ident()
        val init = if (tryPunct("=")) Some(assignExpr()) else None
        plain += ((name, init))
        stmts += SDecl(kind, Vector((name, init)))
      }
      more = tryPunct(",")
    }
    if (!sawPattern) SDecl(kind, plain.result())
    else {
      val all = stmts.result()
      if (all.size == 1) all.head else SSeq(all)
    }
  }

  /** Parse a binding pattern: identifier, {…}, or […]. */
  private def pattern(): Pat = peek match {
    case TPunct("{", _) =>
      advance()
      val entries = Vector.newBuilder[(String, Pat, Option[Expr])]
      var rest: Option[String] = None
      var more = !isPunct("}")
      while (more) {
        if (tryPunct("...")) {
          rest = Some(ident())
          more = false
        } else {
          val key = memberName()
          val target: Pat = if (tryPunct(":")) pattern() else PIdent(key)
          val dflt = if (tryPunct("=")) Some(assignExpr()) else None
          entries += ((key, target, dflt))
          more = tryPunct(",") && !isPunct("}")
        }
      }
      eatPunct("}")
      PObj(entries.result(), rest)
    case TPunct("[", _) =>
      advance()
      val items = Vector.newBuilder[Option[(Pat, Option[Expr])]]
      var rest: Option[String] = None
      var more = !isPunct("]")
      while (more) {
        if (isPunct(",")) { items += None; advance(); more = !isPunct("]") } // hole
        else if (tryPunct("...")) { rest = Some(ident()); more = false }
        else {
          val target = pattern()
          val dflt = if (tryPunct("=")) Some(assignExpr()) else None
          items += Some((target, dflt))
          more = tryPunct(",") && !isPunct("]")
        }
      }
      eatPunct("]")
      PArr(items.result(), rest)
    case _ => PIdent(ident())
  }

  /** `class Name [extends Expr] { constructor/methods/fields }`. A leading
    * `static` marks the member static unless it IS the member name
    * (`static() {}`, `static = 1`). */
  private def classDecl(): Stmt = {
    eatKw("class")
    val name = ident()
    val parentE = if (isKw("extends")) { advance(); Some(postfix()) } else None
    eatPunct("{")
    var ctor: Option[(Vector[Param], Vector[Stmt])] = None
    val methods = Vector.newBuilder[ClassMethod]
    val fields = Vector.newBuilder[ClassField]
    while (!isPunct("}") && !atEof) {
      if (!tryPunct(";")) {
        val static = peek match {
          case TIdent("static", _) => peek2 match {
            case TPunct("(" | "=" | ";" | "}", _) => false
            case _ => advance(); true
          }
          case _ => false
        }
        peek match {
          case TIdent("get" | "set", _) if (peek2 match {
            case TPunct("(" | "=" | ";" | "}", _) => false; case _ => true
          }) => fail("getters/setters are not supported in js.eval classes")
          case _ =>
        }
        val mname = memberName()
        if (isPunct("(")) {
          val params = paramList()
          val body = block()
          if (mname == "constructor" && !static) {
            if (ctor.isDefined) fail("duplicate constructor")
            ctor = Some((params, body))
          } else methods += ClassMethod(mname, params, body, static)
        } else {
          val init = if (tryPunct("=")) Some(assignExpr()) else None
          fields += ClassField(mname, init, static)
        }
        eatSemi()
      }
    }
    eatPunct("}")
    SClass(name, parentE, ctor, methods.result(), fields.result())
  }

  private def forStatement(): Stmt = {
    eatKw("for"); eatPunct("(")
    // for (const x of iter) / for (const k in obj)
    val save = pos
    peek match {
      case TKw(k @ ("var" | "let" | "const"), _) =>
        advance()
        (peek, peek2) match {
          case (TIdent(name, _), TKw(io @ ("of" | "in"), _)) =>
            advance(); advance()
            val iter = expression(); eatPunct(")")
            return SForOf(k, name, iter, bodyOrBlock(), keys = io == "in")
          case (TPunct("{" | "[", _), _) =>
            val p = pattern()
            if (isKw("in")) fail("for...in requires a plain identifier binder")
            eatKw("of")
            val iter = expression(); eatPunct(")")
            return SForOfPat(k, p, iter, bodyOrBlock())
          case _ => pos = save
        }
      case _ =>
    }
    // classic for
    val init: Option[Stmt] =
      if (isPunct(";")) None
      else peek match {
        case TKw("var" | "let" | "const", _) => Some(declStatement())
        case _ => Some(SExpr(expression()))
      }
    eatPunct(";")
    val cond = if (isPunct(";")) None else Some(expression())
    eatPunct(";")
    val update = if (isPunct(")")) None else Some(expression())
    eatPunct(")")
    SFor(init, cond, update, bodyOrBlock())
  }

  private def paramList(): Vector[Param] = {
    eatPunct("(")
    val ps = Vector.newBuilder[Param]
    if (!isPunct(")")) {
      var more = true
      while (more) {
        if (tryPunct("...")) {
          ps += Param(PIdent(ident()), None, rest = true)
          more = false // rest must be last
        } else {
          val pat = pattern()
          val dflt = if (tryPunct("=")) Some(assignExpr()) else None
          ps += Param(pat, dflt, rest = false)
          more = tryPunct(",")
        }
      }
    }
    eatPunct(")")
    ps.result()
  }

  // ----------------------------------------------------------- expressions

  def expression(): Expr = {
    var e = assignExpr()
    while (isPunct(",")) { advance(); e = EBin(",", e, assignExpr()) }
    e
  }

  def assignExpr(): Expr = {
    // arrow-function lookahead: IDENT => ...  or  ( params ) => ...
    peek match {
      case TIdent(name, _) if punct2("=>") =>
        advance(); advance()
        return EFunc(Vector(Param(PIdent(name), None, rest = false)), arrowBody(), "<arrow>")
      case TPunct("(", _) =>
        // attempt a full param list (patterns/defaults/rest included); a
        // parenthesized expression fails the parse or lacks the '=>'
        val save = pos
        try {
          val params = paramList()
          if (isPunct("=>")) {
            advance()
            return EFunc(params, arrowBody(), "<arrow>")
          }
          pos = save
        } catch { case _: JsError => pos = save }
      case _ =>
    }
    val lhs = conditional()
    peek match {
      case TPunct(op @ ("=" | "+=" | "-=" | "*=" | "/=" | "%=" | "**="), _) =>
        lhs match {
          case _: EIdent | _: EMember | _: EIndex =>
            advance()
            EAssign(op, lhs, assignExpr())
          // assignment-position destructuring: [a, b] = …, ({x} = …)
          case (_: EArr | _: EObjLit) if op == "=" =>
            advance()
            EAssign("=", lhs, assignExpr())
          case _ => fail(s"invalid assignment target before '$op'")
        }
      case _ => lhs
    }
  }

  private def punct2(s: String): Boolean = peek2 match { case TPunct(x, _) => x == s; case _ => false }

  private def arrowBody(): Vector[Stmt] =
    if (isPunct("{")) block()
    else Vector(SReturn(Some(assignExpr())))

  private def conditional(): Expr = {
    val c = nullish()
    if (tryPunct("?")) {
      val t = assignExpr()
      eatPunct(":")
      ECond(c, t, assignExpr())
    } else c
  }

  private def nullish(): Expr = {
    var l = or()
    while (isPunct("??")) { advance(); l = ELogical("??", l, or()) }
    l
  }
  private def or(): Expr = {
    var l = and()
    while (isPunct("||")) { advance(); l = ELogical("||", l, and()) }
    l
  }
  private def and(): Expr = {
    var l = equality()
    while (isPunct("&&")) { advance(); l = ELogical("&&", l, equality()) }
    l
  }
  private def equality(): Expr = {
    var l = relational()
    var more = true
    while (more) peek match {
      case TPunct(op @ ("==" | "!=" | "===" | "!=="), _) => advance(); l = EBin(op, l, relational())
      case _ => more = false
    }
    l
  }
  private def relational(): Expr = {
    var l = additive()
    var more = true
    while (more) peek match {
      case TPunct(op @ ("<" | "<=" | ">" | ">="), _) => advance(); l = EBin(op, l, additive())
      case TKw("in", _) => advance(); l = EBin("in", l, additive())
      case TKw("instanceof", _) => advance(); l = EBin("instanceof", l, additive())
      case _ => more = false
    }
    l
  }
  private def additive(): Expr = {
    var l = multiplicative()
    var more = true
    while (more) peek match {
      case TPunct(op @ ("+" | "-"), _) => advance(); l = EBin(op, l, multiplicative())
      case _ => more = false
    }
    l
  }
  private def multiplicative(): Expr = {
    var l = exponent()
    var more = true
    while (more) peek match {
      case TPunct(op @ ("*" | "/" | "%"), _) => advance(); l = EBin(op, l, exponent())
      case _ => more = false
    }
    l
  }
  private def exponent(): Expr = {
    val l = unary()
    if (isPunct("**")) { advance(); EBin("**", l, exponent()) } // right-assoc
    else l
  }

  private def unary(): Expr = peek match {
    case TPunct(op @ ("!" | "-" | "+"), _) => advance(); EUn(op, unary())
    case TKw("typeof", _)                  => advance(); EUn("typeof", unary())
    case TPunct(op @ ("++" | "--"), _) =>
      advance()
      EUpdate(op, unary(), prefix = true)
    case TKw("new", _) =>
      advance()
      val callee = primary()
      val args = if (isPunct("(")) callArgs() else Vector.empty
      postfixOps(ENew(callee, args))
    case _ => postfix()
  }

  private def postfix(): Expr = {
    val e = postfixOps(primary())
    peek match {
      case TPunct(op @ ("++" | "--"), _) =>
        e match {
          case _: EIdent | _: EMember | _: EIndex => advance(); EUpdate(op, e, prefix = false)
          case _ => e
        }
      case _ => e
    }
  }

  private def postfixOps(start: Expr): Expr = {
    var e = start
    var more = true
    while (more) peek match {
      case TPunct(".", _) =>
        advance()
        e = EMember(e, memberName(), optional = false)
      case TPunct("?.", _) =>
        advance()
        if (isPunct("(")) e = ECall(e, callArgs(), optional = true)
        else if (isPunct("[")) { advance(); val idx = expression(); eatPunct("]"); e = EIndex(e, idx, optional = true) }
        else e = EMember(e, memberName(), optional = true)
      case TPunct("[", _) =>
        advance()
        val idx = expression()
        eatPunct("]")
        e = EIndex(e, idx, optional = false)
      case TPunct("(", _) =>
        e = ECall(e, callArgs(), optional = false)
      case _ => more = false
    }
    e
  }

  /** Property names may be keywords (`row.new`, `x.in`). */
  private def memberName(): String = peek match {
    case TIdent(n, _) => advance(); n
    case TKw(n, _)    => advance(); n
    case _            => fail("expected property name")
  }

  private def callArgs(): Vector[Expr] = {
    eatPunct("(")
    val args = Vector.newBuilder[Expr]
    if (!isPunct(")")) {
      var more = true
      while (more) {
        if (tryPunct("...")) args += EUn("...", assignExpr())
        else args += assignExpr()
        more = tryPunct(",")
      }
    }
    eatPunct(")")
    args.result()
  }

  private def primary(): Expr = peek match {
    case TNum(d, _)  => advance(); ENum(d)
    case TStr(s, _)  => advance(); EStr(s)
    case TRegex(p, f, _) => advance(); ERegex(p, f)
    case t: TTemplate =>
      advance()
      ETemplate(t.chunks, t.exprs.map(JsParser.parseTokens))
    case TKw("true", _)      => advance(); EBool(true)
    case TKw("false", _)     => advance(); EBool(false)
    case TKw("null", _)      => advance(); ENull
    case TKw("undefined", _) => advance(); EUndefined
    case TKw("function", _)  =>
      advance()
      val name = peek match { case TIdent(n, _) => advance(); n; case _ => "<anonymous>" }
      val params = paramList()
      EFunc(params, block(), name)
    case TKw("super", _) => advance(); ESuper
    case TKw("class", _) =>
      fail("class expressions are not supported — declare the class as a statement")
    case TIdent(n, _) => advance(); EIdent(n)
    case TPunct("(", _) =>
      advance()
      val e = expression()
      eatPunct(")")
      e
    case TPunct("[", _) =>
      advance()
      val items = Vector.newBuilder[Expr]
      val spreads = mutable.Set.empty[Int]
      var idx = 0
      if (!isPunct("]")) {
        var more = true
        while (more) {
          if (tryPunct("...")) { spreads += idx; items += assignExpr() }
          else items += assignExpr()
          idx += 1
          more = tryPunct(",") && !isPunct("]") // allow trailing comma
        }
      }
      eatPunct("]")
      EArr(items.result(), spreads.toSet)
    case TPunct("{", _) => objectLiteral()
    case _ => fail("expected an expression")
  }

  private def objectLiteral(): Expr = {
    eatPunct("{")
    val entries = Vector.newBuilder[(Either[String, Expr], Expr)]
    val spreads = Vector.newBuilder[Expr]
    val order = Vector.newBuilder[Either[Int, Int]]
    var nEntries = 0
    var nSpreads = 0
    if (!isPunct("}")) {
      var more = true
      while (more) {
        if (tryPunct("...")) {
          spreads += assignExpr()
          order += Right(nSpreads); nSpreads += 1
        } else {
          val key: Either[String, Expr] = peek match {
            case TIdent(n, _) => advance(); Left(n)
            case TKw(n, _)    => advance(); Left(n)
            case TStr(s, _)   => advance(); Left(s)
            case TNum(d, _)   => advance(); Left(JsVal.numToString(d))
            case TPunct("[", _) => advance(); val e = assignExpr(); eatPunct("]"); Right(e)
            case _ => fail("expected property key")
          }
          val value: Expr =
            if (tryPunct(":")) assignExpr()
            else if (isPunct("(")) { // method shorthand
              val params = paramList()
              EFunc(params, block(), key.left.getOrElse("<method>"))
            } else if (isPunct("=")) key match {
              // shorthand default { a = 1 } — only legal when this literal
              // is consumed as a destructuring-assignment pattern
              case Left(n)  => advance(); EShorthandDefault(n, assignExpr())
              case Right(_) => fail("computed key requires a value")
            } else key match { // shorthand { a }
              case Left(n) => EIdent(n)
              case Right(_) => fail("computed key requires a value")
            }
          entries += ((key, value))
          order += Left(nEntries); nEntries += 1
        }
        more = tryPunct(",") && !isPunct("}") // allow trailing comma
      }
    }
    eatPunct("}")
    EObjLit(entries.result(), spreads.result(), order.result())
  }
}
