package graft.js

import scala.collection.mutable

/** Tree-walking evaluator for the `js.eval` subset.
  *
  * One `JsInterp` is built per PARTITION (script parsed once, globals set up
  * once); `callTransform` then runs per row. Contrast with the reference,
  * which constructs a fresh Boa engine and re-evaluates the script source
  * for every row (reference plugins-wasm/conveyor-plugin-js-wasm/src/
  * lib.rs:166-176) — same semantics, two orders of magnitude less setup
  * work in the row loop.
  */
final class JsInterp(script: String) {

  import JsVal._

  private val program: Vector[Stmt] = JsParser.parseProgram(script)
  private val globals: Env = new Env(null)
  Builtins.install(globals)

  // evaluate top-level once: function declarations + any setup code
  exec(program, globals)

  /** The user's entry point. The reference requires a global `transform`
    * function (lib.rs test `test_transform_row_missing_function`). */
  private val transformFn: JsVal = globals.lookup("transform").getOrElse(
    throw new JsError(
      "js.eval script must define a transform function: function transform(row) { ... }"))

  def callTransform(row: JsVal): JsVal = call(transformFn, JsUndefined, Seq(row))

  // ------------------------------------------------------------- execution

  private sealed trait Signal
  private case object SigNone extends Signal
  private case object SigBreak extends Signal
  private case object SigContinue extends Signal
  private final case class SigReturn(v: JsVal) extends Signal

  private def exec(stmts: Vector[Stmt], env: Env): Signal = {
    // hoist function declarations (JS function hoisting)
    stmts.foreach {
      case SFunc(name, params, body) => env.define(name, JsFunc(params, body, env, name))
      case _ =>
    }
    var i = 0
    while (i < stmts.length) {
      val sig = execOne(stmts(i), env)
      if (sig != SigNone) return sig
      i += 1
    }
    SigNone
  }

  private def execOne(s: Stmt, env: Env): Signal = s match {
    case SExpr(e)  => eval(e, env); SigNone
    case _: SFunc  => SigNone // hoisted
    case SDecl(_, decls) =>
      decls.foreach { case (name, init) =>
        env.define(name, init.map(eval(_, env)).getOrElse(JsUndefined))
      }
      SigNone
    case SDeclPat(_, pat, init) =>
      destructure(pat, eval(init, env), env)
      SigNone
    case SSeq(stmts) => // declarator sequence — same scope, no new env
      var i = 0
      while (i < stmts.length) {
        val sig = execOne(stmts(i), env)
        if (sig != SigNone) return sig
        i += 1
      }
      SigNone
    case SReturn(e) => SigReturn(e.map(eval(_, env)).getOrElse(JsUndefined))
    case SIf(c, t, f) =>
      if (truthy(eval(c, env))) exec(t, env.child) else exec(f, env.child)
    case SWhile(c, body) =>
      var sig: Signal = SigNone
      while (sig == SigNone && truthy(eval(c, env))) {
        exec(body, env.child) match {
          case SigBreak          => sig = SigBreak
          case r: SigReturn      => sig = r
          case SigContinue | SigNone =>
        }
      }
      if (sig.isInstanceOf[SigReturn]) sig else SigNone
    case SDoWhile(body, c) =>
      var sig: Signal = SigNone
      var continue = true
      while (continue && sig == SigNone) {
        exec(body, env.child) match {
          case SigBreak     => sig = SigBreak
          case r: SigReturn => sig = r
          case _            =>
        }
        continue = truthy(eval(c, env))
      }
      if (sig.isInstanceOf[SigReturn]) sig else SigNone
    case SFor(init, cond, update, body) =>
      val loopEnv = env.child
      init.foreach(execOne(_, loopEnv))
      var sig: Signal = SigNone
      while (sig == SigNone && cond.forall(c => truthy(eval(c, loopEnv)))) {
        exec(body, loopEnv.child) match {
          case SigBreak     => sig = SigBreak
          case r: SigReturn => sig = r
          case _            => update.foreach(eval(_, loopEnv))
        }
      }
      if (sig.isInstanceOf[SigReturn]) sig else SigNone
    case SForOf(_, name, iterExpr, body, keys) =>
      val iterable = eval(iterExpr, env)
      val items: Seq[JsVal] = (iterable, keys) match {
        case (a: JsArr, false) => a.items.toSeq
        case (a: JsArr, true)  => a.items.indices.map(i => JsStr(i.toString))
        case (o: JsObj, true)  => o.fields.keys.map(JsStr(_)).toSeq
        case (o: JsObj, false) =>
          throw new JsError("for...of over a plain object — use for...in or Object.values")
        case (JsStr(str), false) => str.map(ch => JsStr(ch.toString))
        case (JsNull | JsUndefined, _) =>
          throw new JsError(s"for loop over ${toStr(iterable)}")
        case _ => throw new JsError(s"value is not iterable: ${toStr(iterable)}")
      }
      var sig: Signal = SigNone
      val it = items.iterator
      while (sig == SigNone && it.hasNext) {
        val iterEnv = env.child
        iterEnv.define(name, it.next())
        exec(body, iterEnv) match {
          case SigBreak     => sig = SigBreak
          case r: SigReturn => sig = r
          case _            =>
        }
      }
      if (sig.isInstanceOf[SigReturn]) sig else SigNone
    case SForOfPat(_, pat, iterExpr, body) =>
      val iterable = eval(iterExpr, env)
      val items: Seq[JsVal] = iterable match {
        case a: JsArr   => a.items.toSeq
        case JsStr(str) => str.map(ch => JsStr(ch.toString))
        case _: JsObj   => throw new JsError("for...of over a plain object — use Object.entries")
        case other      => throw new JsError(s"value is not iterable: ${toStr(other)}")
      }
      var sig: Signal = SigNone
      val it = items.iterator
      while (sig == SigNone && it.hasNext) {
        val iterEnv = env.child
        destructure(pat, it.next(), iterEnv)
        exec(body, iterEnv) match {
          case SigBreak     => sig = SigBreak
          case r: SigReturn => sig = r
          case _            =>
        }
      }
      if (sig.isInstanceOf[SigReturn]) sig else SigNone
    case SBreak    => SigBreak
    case SContinue => SigContinue
    case SThrow(e) =>
      val v = eval(e, env)
      val msg = v match {
        case o: JsObj => o.fields.get("message").map(toStr).getOrElse(stringify(o))
        case x        => toStr(x)
      }
      throw new JsError(msg)
    case SBlock(body) => exec(body, env.child)
    case STry(body, catchParam, catchBody, finallyBody) =>
      val sig =
        try exec(body, env.child)
        catch {
          // builtins can surface raw JVM exceptions (NumberFormatException
          // et al.) — all non-fatal throws are catchable, like real JS
          case e if catchBody.isDefined && scala.util.control.NonFatal(e) =>
            val cEnv = env.child
            catchParam.foreach(p => cEnv.define(p,
              JsObj("message" -> JsStr(String.valueOf(e.getMessage)), "name" -> JsStr("Error"))))
            exec(catchBody.get, cEnv)
        } finally {
          // a return/break/continue inside finally is out of scope (loud
          // error beats silently swallowing the pending signal, JS allows
          // but strongly discourages it)
          if (finallyBody.nonEmpty && exec(finallyBody, env.child) != SigNone)
            throw new JsError("return/break/continue inside finally is not supported")
        }
      sig
    case SSwitch(scrutE, cases) =>
      val v = eval(scrutE, env)
      val switchEnv = env.child
      val start = cases.indexWhere(_._1.exists(t => strictEq(eval(t, switchEnv), v))) match {
        case -1 => cases.indexWhere(_._1.isEmpty) // default clause
        case i  => i
      }
      if (start < 0) SigNone
      else {
        // fall-through from the matched clause until break/return
        var sig: Signal = SigNone
        var i = start
        while (sig == SigNone && i < cases.length) {
          sig = exec(cases(i)._2, switchEnv)
          i += 1
        }
        sig match {
          case SigBreak     => SigNone // break leaves the switch
          case r: SigReturn => r
          case other        => other // continue propagates to the enclosing loop
        }
      }
    case SClass(name, parentE, ctorDef, methodDefs, fieldDefs) =>
      val parent = parentE.map { pe =>
        eval(pe, env) match {
          case c: JsClass => c
          case other => throw new JsError(
            s"class $name extends a non-class value (${typeOf(other)})")
        }
      }
      val cls = new JsClass(
        name, parent, ctorDef,
        methodDefs.filterNot(_.static).map(m => m.name -> ((m.params, m.body))).toMap,
        mutable.LinkedHashMap.empty,
        fieldDefs.filterNot(_.static).map(f => f.name -> f.init),
        env)
      // define before statics evaluate so they can reference the class
      env.define(name, cls)
      methodDefs.filter(_.static).foreach { m =>
        cls.statics(m.name) = JsFunc(m.params, m.body, env, m.name, cls)
      }
      fieldDefs.filter(_.static).foreach { f =>
        val frame = env.child
        frame.define("this", cls)
        cls.statics(f.name) = f.init.map(eval(_, frame)).getOrElse(JsUndefined)
      }
      SigNone
  }

  /** `new C(args)`: fresh instance, field initializers parent-first (each
    * with `this` bound), then the nearest constructor in the chain.
    * `super(...)` inside a derived constructor runs the parent constructor
    * body on the same instance (fields are already initialized — a derived
    * constructor that never calls super() skips the parent body; real JS
    * would throw there, we stay permissive). */
  private def instantiate(cls: JsClass, args: Seq[JsVal]): JsObj = {
    val obj = new JsObj(mutable.LinkedHashMap.empty, cls)
    def initFields(c: JsClass): Unit = {
      c.parent.foreach(initFields)
      c.fieldInits.foreach { case (n, init) =>
        val frame = c.closure.child
        frame.define("this", obj)
        frame.define("<home>", c)
        obj.fields(n) = init.map(eval(_, frame)).getOrElse(JsUndefined)
      }
    }
    initFields(cls)
    cls.findCtor.foreach { case (h, (ps, body)) =>
      call(JsFunc(ps, body, h.closure, "constructor", h), obj, args)
    }
    obj
  }

  /** The class whose method body is currently executing (anchors `super`). */
  private def homeClass(env: Env): JsClass = env.lookup("<home>") match {
    case Some(c: JsClass) => c
    case _ => throw new JsError("'super' is only valid inside a class method")
  }

  private def thisVal(env: Env): JsVal = env.lookup("this").getOrElse(JsUndefined)

  /** Resolve `super.name` to the parent-chain method as a callable. */
  private def superMember(name: String, env: Env): JsFunc = {
    val parent = homeClass(env).parent.getOrElse(
      throw new JsError("'super' used in a class without an extends clause"))
    parent.findMethod(name) match {
      case Some((h, (ps, body))) => JsFunc(ps, body, h.closure, name, h)
      case None => throw new JsError(s"super.$name is not defined")
    }
  }

  // ------------------------------------------------------------ evaluation

  def eval(e: Expr, env: Env): JsVal = e match {
    case ENum(d)  => JsNum(d)
    case EStr(s)  => JsStr(s)
    case r: ERegex => r.compiled
    case EBool(b) => JsBool(b)
    case ENull    => JsNull
    case EUndefined => JsUndefined
    case ETemplate(chunks, exprs) =>
      val b = new java.lang.StringBuilder(chunks.head)
      var i = 0
      while (i < exprs.length) {
        b.append(toStr(eval(exprs(i), env)))
        b.append(chunks(i + 1))
        i += 1
      }
      JsStr(b.toString)
    case EIdent(name) =>
      env.lookup(name).getOrElse(throw new JsError(s"$name is not defined"))
    case EArr(items, spreads) =>
      val buf = mutable.ArrayBuffer.empty[JsVal]
      items.zipWithIndex.foreach { case (item, idx) =>
        val v = eval(item, env)
        if (spreads(idx)) v match {
          case a: JsArr  => buf ++= a.items
          case JsStr(s)  => buf ++= s.map(c => JsStr(c.toString))
          case other     => throw new JsError(s"cannot spread ${typeOf(other)} in array literal")
        } else buf += v
      }
      new JsArr(buf)
    case EObjLit(entries, spreads, order) =>
      val m = mutable.LinkedHashMap.empty[String, JsVal]
      order.foreach {
        case Left(i) =>
          val (k, vExpr) = entries(i)
          val key = k match {
            case Left(name)  => name
            case Right(expr) => toStr(eval(expr, env))
          }
          m(key) = eval(vExpr, env)
        case Right(i) =>
          eval(spreads(i), env) match {
            case o: JsObj => o.fields.foreach { case (k, v) => m(k) = v }
            case JsNull | JsUndefined => // spec: no-op
            case other => throw new JsError(s"cannot spread ${typeOf(other)} in object literal")
          }
      }
      new JsObj(m)
    case EFunc(params, body, name) => JsFunc(params, body, env, name)
    case EUn(op, inner) =>
      op match {
        case "!" => JsBool(!truthy(eval(inner, env)))
        case "-" => JsNum(-toNumber(eval(inner, env)))
        case "+" => JsNum(toNumber(eval(inner, env)))
        case "typeof" =>
          inner match {
            case EIdent(n) => JsStr(env.lookup(n).map(typeOf).getOrElse("undefined"))
            case _         => JsStr(typeOf(eval(inner, env)))
          }
        case "..." => throw new JsError("spread (...) only valid inside call arguments and literals")
        case other => throw new JsError(s"unsupported unary operator '$other'")
      }
    case EUpdate(op, target, prefix) =>
      val old = toNumber(evalRef(target, env))
      val neu = if (op == "++") old + 1 else old - 1
      assignTo(target, JsNum(neu), env)
      JsNum(if (prefix) neu else old)
    case EBin(op, l, r)    => binop(op, l, r, env)
    case ELogical(op, l, r) =>
      val lv = eval(l, env)
      op match {
        case "&&" => if (truthy(lv)) eval(r, env) else lv
        case "||" => if (truthy(lv)) lv else eval(r, env)
        case "??" => if (lv == JsNull || lv == JsUndefined) eval(r, env) else lv
      }
    case ECond(c, t, f) => if (truthy(eval(c, env))) eval(t, env) else eval(f, env)
    case EAssign(op, target, value) =>
      val v =
        if (op == "=") eval(value, env)
        else binopValues(op.dropRight(1), evalRef(target, env), eval(value, env))
      target match {
        case _: EArr | _: EObjLit => destructureAssign(target, v, env)
        case _                    => assignTo(target, v, env)
      }
      v
    case ESuper =>
      throw new JsError("'super' is only valid as super(...) or super.method(...)")
    case EShorthandDefault(name, _) =>
      throw new JsError(
        s"shorthand default '{ $name = … }' is only valid as a destructuring-assignment target")
    case EMember(ESuper, name, _) => superMember(name, env)
    case EMember(objE, name, optional) =>
      val obj = eval(objE, env)
      if (optional && (obj == JsNull || obj == JsUndefined)) JsUndefined
      else member(obj, name, objE)
    case EIndex(objE, idxE, optional) =>
      val obj = eval(objE, env)
      if (optional && (obj == JsNull || obj == JsUndefined)) JsUndefined
      else {
        val idx = eval(idxE, env)
        (obj, idx) match {
          case (a: JsArr, JsNum(d)) =>
            val i = d.toInt
            if (i >= 0 && i < a.items.length) a.items(i) else JsUndefined
          // JS: arr["0"] === arr[0] (property keys are strings; for...in
          // yields string indices)
          case (a: JsArr, JsStr(s)) if isIndexString(s) =>
            val i = s.toInt
            if (i < a.items.length) a.items(i) else JsUndefined
          case (JsStr(s), JsNum(d)) =>
            val i = d.toInt
            if (i >= 0 && i < s.length) JsStr(s.charAt(i).toString) else JsUndefined
          case (o: JsObj, k) =>
            val key = toStr(k)
            if (o.klass != null && !o.fields.contains(key)) member(o, key, objE)
            else o.fields.getOrElse(key, JsUndefined)
          case (other, k)    => member(other, toStr(k), objE)
        }
      }
    case ECall(calleeE, argEs, optional) =>
      // method calls need `this` binding from the member base
      val (fn, thisv) = calleeE match {
        case ESuper => // super(args): the parent constructor on this instance
          val parent = homeClass(env).parent.getOrElse(
            throw new JsError("super(...) requires an extends clause"))
          val ctorFn = parent.findCtor
            .map { case (h, (ps, body)) => JsFunc(ps, body, h.closure, "constructor", h): JsVal }
            .getOrElse(JsNative("constructor", (_, _) => JsUndefined))
          (ctorFn, thisVal(env))
        case EMember(ESuper, name, _) => (superMember(name, env), thisVal(env))
        case EMember(objE, name, opt) =>
          val obj = eval(objE, env)
          if (opt && (obj == JsNull || obj == JsUndefined)) (JsUndefined, JsUndefined)
          else (member(obj, name, objE), obj)
        case EIndex(objE, idxE, opt) =>
          val obj = eval(objE, env)
          if (opt && (obj == JsNull || obj == JsUndefined)) (JsUndefined, JsUndefined)
          else {
            val k = toStr(eval(idxE, env))
            (member(obj, k, objE), obj)
          }
        case other => (eval(other, env), JsUndefined)
      }
      if (optional && (fn == JsNull || fn == JsUndefined)) JsUndefined
      else {
        val args = argEs.flatMap {
          case EUn("...", inner) =>
            eval(inner, env) match {
              case a: JsArr => a.items.toSeq
              case other    => throw new JsError(s"cannot spread ${typeOf(other)} in call")
            }
          case a => Seq(eval(a, env))
        }
        call(fn, thisv, args)
      }
    case ENew(calleeE, argEs) =>
      val args = argEs.map(eval(_, env))
      calleeE match {
        case EIdent("Date")  => Builtins.newDate(args)
        case EIdent("RegExp") => args match {
          case Seq(r: JsRegex)             => new JsRegex(r.source, r.flags)
          case Seq(r: JsRegex, JsStr(f))   => new JsRegex(r.source, f)
          case Seq(JsStr(p))               => new JsRegex(p, "")
          case Seq(JsStr(p), JsStr(f))     => new JsRegex(p, f)
          case _ => throw new JsError("new RegExp expects (pattern[, flags]) strings")
        }
        case EIdent("Error") | EIdent("TypeError") | EIdent("RangeError") =>
          JsObj("message" -> args.headOption.getOrElse(JsStr("")), "name" -> JsStr("Error"))
        case EIdent("Array") => args match {
          case Seq(JsNum(n)) => JsArr.of(Vector.fill(n.toInt)(JsUndefined))
          case other         => JsArr.of(other)
        }
        case EIdent("Set") | EIdent("Map") =>
          throw new JsError("Set/Map are not supported in js.eval — use objects/arrays")
        case other =>
          eval(other, env) match {
            case cls: JsClass => instantiate(cls, args)
            case f: JsFunc => // constructor-function pattern: fresh `this`,
              // returned unless the body returns an object itself
              val obj = JsObj.empty
              call(f, obj, args) match {
                case o: JsObj => o
                case a: JsArr => a
                case _        => obj
              }
            case n: JsNative => n.fn(JsObj.empty, args)
            case v => throw new JsError(s"${toStr(v)} is not a constructor")
          }
      }
  }

  /** Evaluate an lvalue expression for its current value (for +=, ++). */
  /** Bind a destructuring pattern against a value (declaration / for-of
    * binder semantics): object patterns read properties (missing →
    * undefined → default), array patterns index (holes skip, `...rest`
    * collects the tail). Destructuring null/undefined throws, per JS. */
  private def destructure(pat: Pat, v: JsVal, env: Env): Unit = pat match {
    case PIdent(name) => env.define(name, v)
    case PObj(entries, rest) =>
      if (v == JsNull || v == JsUndefined)
        throw new JsError(s"cannot destructure ${toStr(v)}")
      entries.foreach { case (key, target, dflt) =>
        val raw = patternProp(v, key)
        val bound = if (raw == JsUndefined) dflt.map(eval(_, env)).getOrElse(JsUndefined) else raw
        destructure(target, bound, env)
      }
      rest.foreach { r =>
        val taken = entries.map(_._1).toSet
        val rem = v match {
          case o: JsObj => JsObj(o.fields.toSeq.filterNot { case (k, _) => taken(k) }: _*)
          case _        => JsObj.empty
        }
        env.define(r, rem)
      }
    case PArr(items, rest) =>
      val seq: Seq[JsVal] = v match {
        case a: JsArr   => a.items.toSeq
        case JsStr(s)   => s.map(c => JsStr(c.toString))
        case JsNull | JsUndefined => throw new JsError(s"cannot destructure ${toStr(v)}")
        case other      => throw new JsError(s"value is not iterable: ${toStr(other)}")
      }
      items.zipWithIndex.foreach {
        case (Some((target, dflt)), i) =>
          val raw = seq.lift(i).getOrElse(JsUndefined)
          val bound = if (raw == JsUndefined) dflt.map(eval(_, env)).getOrElse(JsUndefined) else raw
          destructure(target, bound, env)
        case (None, _) => // hole
      }
      rest.foreach(r => env.define(r, JsArr.of(seq.drop(items.length))))
  }

  /** Property read for pattern binding: object fields, or primitive builtin
    * data members — never builtin methods, and lookups that THROW for
    * unknown names (strings) must not escape a destructuring. */
  private def patternProp(v: JsVal, key: String): JsVal = v match {
    case o: JsObj => o.fields.getOrElse(key, JsUndefined)
    case _ =>
      (try Builtins.member(v, key, this).getOrElse(JsUndefined)
       catch { case _: JsError => JsUndefined }) match {
        case _: JsNative => JsUndefined
        case other       => other
      }
  }

  /** Assignment-position destructuring: the `=` target parsed as an
    * array/object literal; reinterpret it as a pattern whose leaves are
    * lvalues (identifier/member/index) or nested patterns. Array form:
    * `[a, b.c, ...rest] = xs`, defaults via `[a = 1] = xs`. Object form:
    * `({x, y: t.u = 2, ...rest} = o)`. */
  private def destructureAssign(target: Expr, v: JsVal, env: Env): Unit = target match {
    case EArr(items, spreads) =>
      val seq: Seq[JsVal] = v match {
        case a: JsArr   => a.items.toSeq
        case JsStr(s)   => s.map(c => JsStr(c.toString))
        case JsNull | JsUndefined => throw new JsError(s"cannot destructure ${toStr(v)}")
        case other      => throw new JsError(s"value is not iterable: ${toStr(other)}")
      }
      items.zipWithIndex.foreach { case (item, i) =>
        if (spreads(i)) {
          if (i != items.length - 1)
            throw new JsError("rest element must be last in a destructuring assignment")
          assignPatternLeaf(item, JsArr.of(seq.drop(i)), env)
        } else item match {
          case EAssign("=", t, dflt) =>
            val raw = seq.lift(i).getOrElse(JsUndefined)
            assignPatternLeaf(t, if (raw == JsUndefined) eval(dflt, env) else raw, env)
          case t =>
            assignPatternLeaf(t, seq.lift(i).getOrElse(JsUndefined), env)
        }
      }
    case EObjLit(entries, spreadExprs, order) =>
      if (v == JsNull || v == JsUndefined)
        throw new JsError(s"cannot destructure ${toStr(v)}")
      val taken = mutable.Set.empty[String]
      order.zipWithIndex.foreach {
        case (Left(i), _) =>
          val (k, vExpr) = entries(i)
          val key = k match {
            case Left(nm)  => nm
            case Right(ke) => toStr(eval(ke, env))
          }
          taken += key
          val raw = patternProp(v, key)
          vExpr match {
            case EShorthandDefault(nm, dflt) =>
              assignPatternLeaf(EIdent(nm), if (raw == JsUndefined) eval(dflt, env) else raw, env)
            case EAssign("=", t, dflt) =>
              assignPatternLeaf(t, if (raw == JsUndefined) eval(dflt, env) else raw, env)
            case t => assignPatternLeaf(t, raw, env)
          }
        case (Right(i), pos) =>
          if (pos != order.length - 1)
            throw new JsError("rest element must be last in a destructuring assignment")
          val rem = v match {
            case o: JsObj => JsObj(o.fields.toSeq.filterNot { case (k, _) => taken(k) }: _*)
            case _        => JsObj.empty
          }
          assignPatternLeaf(spreadExprs(i), rem, env)
      }
    case other => assignTo(other, v, env)
  }

  private def assignPatternLeaf(t: Expr, v: JsVal, env: Env): Unit = t match {
    case _: EArr | _: EObjLit => destructureAssign(t, v, env)
    case _: EIdent | _: EMember | _: EIndex => assignTo(t, v, env)
    case _ => throw new JsError("invalid destructuring-assignment target")
  }

  private def evalRef(target: Expr, env: Env): JsVal = eval(target, env)

  /** "0", "15", … — a canonical non-negative array index (no leading +,
    * no leading zeros beyond "0", bounded to Int). */
  private def isIndexString(s: String): Boolean =
    s.nonEmpty && s.length <= 9 && s.forall(c => c >= '0' && c <= '9') &&
      (s == "0" || s.charAt(0) != '0')

  private def assignTo(target: Expr, v: JsVal, env: Env): Unit = target match {
    case EIdent(name) => env.assign(name, v)
    case EMember(objE, name, _) =>
      eval(objE, env) match {
        case o: JsObj => o.fields(name) = v
        case a: JsArr if name == "length" =>
          val n = toNumber(v).toInt
          if (n < a.items.length) a.items.remove(n, a.items.length - n)
          else while (a.items.length < n) a.items += JsUndefined
        case other => throw new JsError(s"cannot set property '$name' on ${typeOf(other)}")
      }
    case EIndex(objE, idxE, _) =>
      val obj = eval(objE, env)
      val idx = eval(idxE, env)
      (obj, idx) match {
        case (a: JsArr, JsNum(d)) =>
          val i = d.toInt
          if (i < 0) throw new JsError("negative array index assignment")
          while (a.items.length <= i) a.items += JsUndefined
          a.items(i) = v
        case (a: JsArr, JsStr(s)) if isIndexString(s) =>
          val i = s.toInt
          while (a.items.length <= i) a.items += JsUndefined
          a.items(i) = v
        case (o: JsObj, k) => o.fields(toStr(k)) = v
        case (other, _)    => throw new JsError(s"cannot index-assign on ${typeOf(other)}")
      }
    case other => throw new JsError(s"invalid assignment target")
  }

  private def binop(op: String, lE: Expr, rE: Expr, env: Env): JsVal = {
    if (op == ",") { eval(lE, env); return eval(rE, env) }
    if (op == "in") {
      val k = eval(lE, env)
      return eval(rE, env) match {
        case o: JsObj => JsBool(o.fields.contains(toStr(k)))
        case a: JsArr => val i = toNumber(k).toInt; JsBool(i >= 0 && i < a.items.length)
        case other    => throw new JsError(s"'in' on ${typeOf(other)}")
      }
    }
    if (op == "instanceof") {
      val lv = eval(lE, env)
      return eval(rE, env) match {
        case c: JsClass => lv match {
          case o: JsObj if o.klass != null => JsBool(o.klass.isSubclassOf(c))
          case _                           => JsBool(false)
        }
        case other => throw new JsError(
          s"right-hand side of instanceof must be a class (got ${typeOf(other)})")
      }
    }
    binopValues(op, eval(lE, env), eval(rE, env))
  }

  private def binopValues(op: String, lv: JsVal, rv: JsVal): JsVal = op match {
    case "+" =>
      (lv, rv) match {
        case (JsStr(a), b) => JsStr(a + toStr(b))
        case (a, JsStr(b)) => JsStr(toStr(a) + b)
        case (a: JsArr, b) => JsStr(toStr(a) + toStr(b))
        case (a, b: JsArr) => JsStr(toStr(a) + toStr(b))
        case (a: JsObj, b) => JsStr(toStr(a) + toStr(b))
        case (a, b: JsObj) => JsStr(toStr(a) + toStr(b))
        case (a, b)        => JsNum(toNumber(a) + toNumber(b))
      }
    case "-"  => JsNum(toNumber(lv) - toNumber(rv))
    case "*"  => JsNum(toNumber(lv) * toNumber(rv))
    case "/"  => JsNum(toNumber(lv) / toNumber(rv))
    case "%"  => JsNum(toNumber(lv) % toNumber(rv))
    case "**" => JsNum(Math.pow(toNumber(lv), toNumber(rv)))
    case "==" => JsBool(looseEq(lv, rv))
    case "!=" => JsBool(!looseEq(lv, rv))
    case "===" => JsBool(strictEq(lv, rv))
    case "!==" => JsBool(!strictEq(lv, rv))
    case "<" | "<=" | ">" | ">=" =>
      (lv, rv) match {
        case (JsStr(a), JsStr(b)) =>
          val c = a.compareTo(b)
          JsBool(op match {
            case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0; case _ => c >= 0
          })
        case (a, b) =>
          val (x, y) = (toNumber(a), toNumber(b))
          JsBool(op match {
            case "<" => x < y; case "<=" => x <= y; case ">" => x > y; case _ => x >= y
          })
      }
    case other => throw new JsError(s"unsupported operator '$other'")
  }

  def call(fn: JsVal, thisv: JsVal, args: Seq[JsVal]): JsVal = fn match {
    case f @ JsFunc(params, body, closure, _, home) =>
      val frame = closure.child
      // arrows keep the lexical `this`/`super`; everything else rebinds.
      // "<home>" can't collide with user identifiers ('<' can't lex).
      if (!f.isArrow) {
        frame.define("this", thisv)
        if (home != null) frame.define("<home>", home)
      }
      params.zipWithIndex.foreach { case (Param(pat, dflt, rest), i) =>
        if (rest) destructure(pat, JsArr.of(args.drop(i)), frame)
        else {
          val raw = if (i < args.length) args(i) else JsUndefined
          // defaults eval in the frame, so they may reference earlier params
          val v = if (raw == JsUndefined) dflt.map(eval(_, frame)).getOrElse(JsUndefined) else raw
          destructure(pat, v, frame)
        }
      }
      frame.define("arguments", JsArr.of(args))
      exec(body, frame) match {
        case SigReturn(v) => v
        case _            => JsUndefined
      }
    case JsNative(_, f) => f(thisv, args)
    case JsUndefined    => throw new JsError("called a value that is undefined (not a function)")
    case other          => throw new JsError(s"${toStr(other)} is not a function")
  }

  private def member(obj: JsVal, name: String, objE: Expr): JsVal = obj match {
    // class instance: own fields shadow, then the method chain, then the
    // generic object builtins (hasOwnProperty)
    case o: JsObj if o.klass != null && !o.fields.contains(name) =>
      o.klass.findMethod(name) match {
        case Some((h, (ps, body))) => JsFunc(ps, body, h.closure, name, h)
        case None => Builtins.member(obj, name, this).getOrElse(JsUndefined)
      }
    case c: JsClass =>
      c.findStatic(name).getOrElse(if (name == "name") JsStr(c.name) else JsUndefined)
    case _ =>
      Builtins.member(obj, name, this).getOrElse {
        obj match {
          case JsNull | JsUndefined =>
            val where = objE match { case EIdent(n) => s" of $n"; case _ => "" }
            throw new JsError(s"cannot read property '$name'$where (value is ${toStr(obj)})")
          case _ => JsUndefined
        }
      }
  }
}
