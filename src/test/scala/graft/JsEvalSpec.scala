package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.js._
import graft.config.Cfg
import graft.core.{GraftPlanError, StageContext}
import graft.operators.JsEvalOp

/** Interpreter-level tests for the graft.js ECMAScript subset (no Spark). */
class JsInterpSpec extends AnyFunSuite {

  /** Run `transform` over a JSON row, return the result as a JSON string. */
  private def run(script: String, rowJson: String = "{}"): String = {
    val interp = new JsInterp(script)
    JsVal.stringify(interp.callTransform(JsVal.parseJson(rowJson)))
  }
  private def expr(e: String, rowJson: String = "{}"): String =
    run(s"function transform(row) { return { v: $e }; }", rowJson)

  test("arithmetic, precedence, exponent") {
    assert(expr("1 + 2 * 3") === """{"v":7}""")
    assert(expr("(1 + 2) * 3") === """{"v":9}""")
    assert(expr("2 ** 10") === """{"v":1024}""")
    assert(expr("7 % 3") === """{"v":1}""")
    assert(expr("10 / 4") === """{"v":2.5}""")
    assert(expr("-3 + +2") === """{"v":-1}""")
    assert(expr("0x1F") === """{"v":31}""")
    assert(expr("1.5e2") === """{"v":150}""")
  }

  test("string concat and coercion follow JS + semantics") {
    assert(expr("'a' + 'b'") === """{"v":"ab"}""")
    assert(expr("'n=' + 5") === """{"v":"n=5"}""")
    assert(expr("1 + '2'") === """{"v":"12"}""")
    assert(expr("'3' * '4'") === """{"v":12}""")
    assert(expr("true + 1") === """{"v":2}""")
  }

  test("comparisons, equality, strict vs loose") {
    assert(expr("1 < 2 && 2 <= 2 && 3 > 2 && 3 >= 3") === """{"v":true}""")
    assert(expr("'abc' < 'abd'") === """{"v":true}""")
    assert(expr("1 == '1'") === """{"v":true}""")
    assert(expr("1 === '1'") === """{"v":false}""")
    assert(expr("null == undefined") === """{"v":true}""")
    assert(expr("null === undefined") === """{"v":false}""")
    assert(expr("NaN === NaN") === """{"v":false}""")
    assert(expr("2 != '2'") === """{"v":false}""")
  }

  test("logical operators return operands; ?? only fires on nullish") {
    assert(expr("null ?? 'dflt'") === """{"v":"dflt"}""")
    assert(expr("0 ?? 'dflt'") === """{"v":0}""")
    assert(expr("0 || 'dflt'") === """{"v":"dflt"}""")
    assert(expr("'x' && 'y'") === """{"v":"y"}""")
    assert(expr("false && row.missing.boom") === """{"v":false}""") // short-circuit
  }

  test("ternary, typeof, template literals") {
    assert(expr("5 > 3 ? 'big' : 'small'") === """{"v":"big"}""")
    assert(expr("typeof 'x'") === """{"v":"string"}""")
    assert(expr("typeof undeclared_name") === """{"v":"undefined"}""")
    assert(run(
      "function transform(row) { const n = 2; return { v: `a${n + 1}b${'c'}` }; }")
      === """{"v":"a3bc"}""")
  }

  test("row field access: dot, bracket, optional chaining, in") {
    val row = """{"a": 1, "b": {"c": [10, 20]}, "s": "hi"}"""
    assert(expr("row.a", row) === """{"v":1}""")
    assert(expr("row.b.c[1]", row) === """{"v":20}""")
    assert(expr("row['b']['c'][0]", row) === """{"v":10}""")
    assert(expr("row.missing", row) === """{}""") // undefined dropped by stringify
    assert(expr("row.missing?.deep", row) === """{}""")
    assert(expr("row.missing?.deep ?? -1", row) === """{"v":-1}""")
    assert(expr("'a' in row", row) === """{"v":true}""")
    assert(expr("'z' in row", row) === """{"v":false}""")
    assert(expr("row.s.length", row) === """{"v":2}""")
  }

  test("accessing property of undefined raises a named error") {
    val e = intercept[JsError](expr("row.missing.deep"))
    assert(e.getMessage.contains("'deep'"))
  }

  test("var/let/const, assignment operators, ++/--") {
    assert(run(
      """function transform(row) {
        |  let x = 1; x += 4; x *= 2; x -= 1; x /= 3; x %= 2;
        |  var y = 0; y++; ++y; y--;
        |  const z = x + y;
        |  return { x: x, y: y, z: z };
        |}""".stripMargin) === """{"x":1,"y":1,"z":2}""")
  }

  test("if/else, while, do-while, classic for, break/continue") {
    assert(run(
      """function transform(row) {
        |  let evens = 0, total = 0, i = 0;
        |  for (let k = 0; k < 10; k++) {
        |    if (k % 2 === 0) evens++; else continue;
        |    if (k > 6) break;
        |    total += k;
        |  }
        |  while (i < 3) i++;
        |  let j = 0;
        |  do { j++; } while (j < 2);
        |  return { evens: evens, total: total, i: i, j: j };
        |}""".stripMargin) === """{"evens":5,"total":12,"i":3,"j":2}""")
  }

  test("for-of over arrays/strings, for-in over object keys") {
    assert(run(
      """function transform(row) {
        |  let sum = 0;
        |  for (const x of row.nums) sum += x;
        |  let keys = [];
        |  for (const k in row.obj) keys.push(k);
        |  let chars = 0;
        |  for (const c of 'abc') chars++;
        |  return { sum: sum, keys: keys.join(','), chars: chars };
        |}""".stripMargin,
      """{"nums": [1, 2, 3], "obj": {"p": 1, "q": 2}}""")
      === """{"sum":6,"keys":"p,q","chars":3}""")
  }

  test("functions: declarations, expressions, arrows, closures, recursion") {
    assert(run(
      """function fact(n) { return n <= 1 ? 1 : n * fact(n - 1); }
        |const double = x => x * 2;
        |const add = (a, b) => { return a + b; };
        |function counter() { let c = 0; return () => ++c; }
        |function transform(row) {
        |  const inc = counter();
        |  inc(); inc();
        |  return { f: fact(5), d: double(21), a: add(1, 2), c: inc() };
        |}""".stripMargin) === """{"f":120,"d":42,"a":3,"c":3}""")
  }

  test("object literals: shorthand, computed keys, spread, methods") {
    assert(run(
      """function transform(row) {
        |  const a = 1, key = 'dyn';
        |  const base = { x: 10, y: 20 };
        |  const o = { a, [key + '1']: 2, ...base, y: 99 };
        |  return o;
        |}""".stripMargin) === """{"a":1,"dyn1":2,"x":10,"y":99}""")
  }

  test("array literals, spread, index assignment") {
    assert(run(
      """function transform(row) {
        |  const a = [1, 2];
        |  const b = [0, ...a, 3];
        |  b[5] = 9;
        |  return { b: b, len: b.length };
        |}""".stripMargin) === """{"b":[0,1,2,3,null,9],"len":6}""")
  }

  test("string methods") {
    assert(expr("' Hi World '.trim().toUpperCase()") === """{"v":"HI WORLD"}""")
    assert(expr("'a,b,,c'.split(',').length") === """{"v":4}""")
    assert(expr("'hello'.slice(1, 3)") === """{"v":"el"}""")
    assert(expr("'hello'.slice(-3)") === """{"v":"llo"}""")
    assert(expr("'hello'.substring(3, 1)") === """{"v":"el"}""")
    assert(expr("'hello'.indexOf('ll')") === """{"v":2}""")
    assert(expr("'hello'.includes('ell')") === """{"v":true}""")
    assert(expr("'hello'.replace('l', 'L')") === """{"v":"heLlo"}""")
    assert(expr("'hello'.replaceAll('l', 'L')") === """{"v":"heLLo"}""")
    assert(expr("'5'.padStart(3, '0')") === """{"v":"005"}""")
    assert(expr("'ab'.repeat(3)") === """{"v":"ababab"}""")
    assert(expr("'abc'.charAt(1)") === """{"v":"b"}""")
    assert(expr("'abc'.charCodeAt(0)") === """{"v":97}""")
    assert(expr("'abc'.at(-1)") === """{"v":"c"}""")
    assert(expr("'a-b'.startsWith('a') && 'a-b'.endsWith('b')") === """{"v":true}""")
  }

  test("array methods: map/filter/reduce/find/sort/join/flat") {
    val row = """{"xs": [3, 1, 4, 1, 5, 9, 2, 6]}"""
    assert(expr("row.xs.map(x => x * 2).slice(0, 3)", row) === """{"v":[6,2,8]}""")
    assert(expr("row.xs.filter(x => x > 3)", row) === """{"v":[4,5,9,6]}""")
    assert(expr("row.xs.reduce((a, b) => a + b, 0)", row) === """{"v":31}""")
    assert(expr("row.xs.reduce((a, b) => a + b)", row) === """{"v":31}""")
    assert(expr("row.xs.find(x => x > 4)", row) === """{"v":5}""")
    assert(expr("row.xs.findIndex(x => x > 4)", row) === """{"v":4}""")
    assert(expr("row.xs.some(x => x === 9) && row.xs.every(x => x < 10)", row) === """{"v":true}""")
    assert(expr("row.xs.sort((a, b) => a - b).join('')", row) === """{"v":"11234569"}""")
    assert(expr("[10, 9, 1].sort().join(',')", row) === """{"v":"1,10,9"}""") // default string sort
    assert(expr("[[1, 2], [3, [4]]].flat(2)", row) === """{"v":[1,2,3,4]}""")
    assert(expr("[1, 2, 3].flatMap(x => [x, x * 10])", row) === """{"v":[1,10,2,20,3,30]}""")
    assert(expr("row.xs.includes(9)", row) === """{"v":true}""")
    assert(expr("row.xs.indexOf(4)", row) === """{"v":2}""")
    assert(expr("[...row.xs].reverse()[0]", row) === """{"v":6}""")
  }

  test("Object/Array statics, JSON, Math, Number, parse fns") {
    val row = """{"o": {"a": 1, "b": 2}}"""
    assert(expr("Object.keys(row.o).join('|')", row) === """{"v":"a|b"}""")
    assert(expr("Object.values(row.o)", row) === """{"v":[1,2]}""")
    assert(expr("Object.entries(row.o).map(e => e[0] + '=' + e[1]).join(',')", row) === """{"v":"a=1,b=2"}""")
    assert(expr("Object.fromEntries([['x', 1]]).x", row) === """{"v":1}""")
    assert(expr("Object.assign({}, row.o, {b: 9}).b", row) === """{"v":9}""")
    assert(expr("Array.isArray([1]) && !Array.isArray('s')", row) === """{"v":true}""")
    assert(expr("JSON.parse('{\"k\": [1, true, null]}').k[1]", row) === """{"v":true}""")
    assert(expr("JSON.stringify({a: [1, 'x']})", row) === """{"v":"{\"a\":[1,\"x\"]}"}""")
    assert(expr("Math.floor(3.7) + Math.ceil(3.2) + Math.round(2.5)") === """{"v":10}""")
    assert(expr("Math.round(-2.5)") === """{"v":-2}""") // JS half-up
    assert(expr("Math.max(1, 5, 3) - Math.min(2, -1)") === """{"v":6}""")
    assert(expr("Math.abs(-4) + Math.sqrt(16) + Math.pow(2, 3)") === """{"v":16}""")
    assert(expr("Math.trunc(-3.9)") === """{"v":-3}""")
    assert(expr("parseInt('42px')") === """{"v":42}""")
    assert(expr("parseInt('ff', 16)") === """{"v":255}""")
    assert(expr("parseFloat('3.14abc')") === """{"v":3.14}""")
    assert(expr("isNaN(parseInt('x'))") === """{"v":true}""")
    assert(expr("Number('12.5') + Number(true)") === """{"v":13.5}""")
    assert(expr("Number.isInteger(5) && !Number.isInteger(5.5)") === """{"v":true}""")
    assert(expr("String(42) + String(null)") === """{"v":"42null"}""")
    assert(expr("Boolean('') || Boolean('x')") === """{"v":true}""")
    assert(expr("(1234.5678).toFixed(2)") === """{"v":"1234.57"}""")
    assert(expr("(255).toString(16)") === """{"v":"ff"}""")
  }

  test("Date: construction, accessors, ISO output") {
    assert(expr("new Date(86400000).getTime()") === """{"v":86400000}""")
    assert(expr("new Date('2020-03-15T12:30:45Z').getFullYear()") === """{"v":2020}""")
    assert(expr("new Date('2020-03-15T12:30:45Z').getMonth()") === """{"v":2}""")
    assert(expr("new Date('2020-03-15T12:30:45Z').getDate()") === """{"v":15}""")
    assert(expr("new Date('2020-03-15T12:30:45Z').getHours()") === """{"v":12}""")
    assert(expr("new Date('2020-03-15').toISOString()") === """{"v":"2020-03-15T00:00:00.000Z"}""")
    assert(expr("new Date(2020, 0, 31).toISOString()") === """{"v":"2020-01-31T00:00:00.000Z"}""")
    // reference example script shape: new Date().getFullYear()
    assert(run(
      "function transform(row) { return { ok: new Date().getFullYear() >= 2025 }; }")
      === """{"ok":true}""")
    assert(expr("Date.parse('1970-01-02T00:00:00Z')") === """{"v":86400000}""")
  }

  test("throw raises; error message propagates") {
    val e = intercept[JsError](run(
      "function transform(row) { throw new Error('bad row ' + row.id); }", """{"id": 7}"""))
    assert(e.getMessage === "bad row 7")
  }

  test("regex literals: test/exec, flags, division stays division") {
    assert(expr("""/\d+/.test("abc123")""") === """{"v":true}""")
    assert(expr("""/^\d+$/.test("abc123")""") === """{"v":false}""")
    assert(expr("""/ab/i.test("XAByz")""") === """{"v":true}""")
    assert(expr("""/a(b+)(x)?/.exec("aabbb")""") === """{"v":["abbb","bbb",null]}""")
    assert(expr("""/zz/.exec("aabbb")""") === """{"v":null}""")
    // operand-position heuristic: these are divisions, not regexes
    assert(expr("10 / 2 / 5") === """{"v":1}""")
    assert(expr("(8) / 2") === """{"v":4}""")
    // regex after punctuation/keyword positions
    assert(run("""function transform(row) {
      var hits = 0;
      if (/b/.test(row.s)) hits = hits + 1;
      return { v: hits, w: [/c/.test(row.s), row.n / 2] };
    }""", """{"s": "abc", "n": 10}""") === """{"v":1,"w":[true,5]}""")
  }

  test("regex-aware string methods: replace/replaceAll with $-refs and functions") {
    assert(expr(""""a1b22c".replace(/\d+/, "#")""") === """{"v":"a#b22c"}""")
    assert(expr(""""a1b22c".replace(/\d+/g, "#")""") === """{"v":"a#b#c"}""")
    assert(expr(""""john smith".replace(/(\w+) (\w+)/, "$2 $1")""") === """{"v":"smith john"}""")
    assert(expr(""""price: 5".replace(/(\d+)/, "$&$1")""") === """{"v":"price: 55"}""")
    assert(expr(""""x".replace(/x/, "$$")""") === """{"v":"$"}""")
    assert(expr(""""a-b".replace(/(?<l>\w)-(?<r>\w)/, "$<r>-$<l>")""") === """{"v":"b-a"}""")
    assert(expr(""""aaa".replaceAll(/a/g, "b")""") === """{"v":"bbb"}""")
    assert(expr(""""a1b2".replace(/\d/g, function(m) { return "<" + m + ">"; })""") ===
      """{"v":"a<1>b<2>"}""")
    assert(expr(""""ab12cd".replace(/([a-z]+)(\d+)/, (m, p1, p2) => p2 + p1)""") ===
      """{"v":"12abcd"}""")
    val e = intercept[JsError](expr(""""x".replaceAll(/x/, "y")"""))
    assert(e.getMessage.contains("/g"))
  }

  test("regex match/matchAll/search/split") {
    assert(expr(""""a1b22".match(/\d+/g)""") === """{"v":["1","22"]}""")
    assert(expr(""""a1b22".match(/(\d)(\d)?/)""") === """{"v":["1","1",null]}""")
    assert(expr(""""abc".match(/z/g)""") === """{"v":null}""")
    assert(expr(""""a1b2".matchAll(/([a-z])(\d)/g).map(m => m[2] + m[1]).join(",")""") ===
      """{"v":"1a,2b"}""")
    assert(expr(""""xxabc".search(/bc/)""") === """{"v":3}""")
    assert(expr(""""xx".search(/z/)""") === """{"v":-1}""")
    assert(expr(""""a1b,c2d".split(/,/)""") === """{"v":["a1b","c2d"]}""")
    assert(expr(""""a, b ,c".split(/\s*,\s*/)""") === """{"v":["a","b","c"]}""")
    assert(expr(""""a1b2c".split(/(\d)/)""") === """{"v":["a","1","b","2","c"]}""")
    assert(expr(""""a,b,".split(/,/)""") === """{"v":["a","b",""]}""")
  }

  test("new RegExp, flags accessors, dynamic patterns") {
    assert(expr("""new RegExp("\\d+").test("x9")""") === """{"v":true}""")
    assert(expr("""new RegExp("ab", "i").test("XAB")""") === """{"v":true}""")
    assert(expr("""/x/gi.flags""") === """{"v":"gi"}""")
    assert(expr("""/x/g.global && !/x/.global""") === """{"v":true}""")
    assert(expr("""/abc/.source""") === """{"v":"abc"}""")
    assert(run("""function transform(row) {
      var re = new RegExp(row.pat, "g");
      return { v: row.s.replace(re, "_") };
    }""", """{"pat": "[aeiou]", "s": "banana"}""") === """{"v":"b_n_n_"}""")
    val e = intercept[JsError](expr("""/x/Q.test("x")"""))
    assert(e.getMessage.contains("flag"))
  }

  test("destructuring declarations: object/array patterns, renames, defaults, rest") {
    assert(run("""function transform(row) {
      const { a, b: bee, missing = 9 } = row;
      return { a: a, bee: bee, missing: missing };
    }""", """{"a": 1, "b": 2}""") === """{"a":1,"bee":2,"missing":9}""")
    assert(run("""function transform(row) {
      const [x, , z = 7, ...rest] = row.arr;
      return { x: x, z: z, rest: rest };
    }""", """{"arr": [10, 20]}""") === """{"x":10,"z":7,"rest":[]}""")
    assert(run("""function transform(row) {
      let { u: { v }, w: [first] = [5] } = row;
      const { a, ...others } = row;
      return { v: v, first: first, others: Object.keys(others) };
    }""", """{"u": {"v": 3}, "a": 1, "b": 2, "c": 3}""") ===
      """{"v":3,"first":5,"others":["u","b","c"]}""")
    // mixed declarator list keeps plain declarators in the same scope
    assert(expr("(() => { const n = 1, { m } = { m: 2 }; return n + m; })()") === """{"v":3}""")
  }

  test("for-of destructuring over entries and nested arrays") {
    assert(run("""function transform(row) {
      var out = {};
      for (const [k, v] of Object.entries(row)) out[k.toUpperCase()] = v * 2;
      return out;
    }""", """{"a": 1, "b": 2}""") === """{"A":2,"B":4}""")
    assert(run("""function transform(row) {
      let sum = 0;
      for (const { x, y = 10 } of row.pts) sum += x + y;
      return { sum: sum };
    }""", """{"pts": [{"x": 1, "y": 2}, {"x": 3}]}""") === """{"sum":16}""")
  }

  test("function params: patterns, defaults, rest") {
    assert(run("""function transform(row) {
      const pick = ({ a, b = 5 }) => a + b;
      const add = (x, y = x * 2) => x + y;        // default sees earlier param
      function tally(first, ...rest) { return first + rest.length; }
      return { p: pick(row), q: pick({ a: 1, b: 2 }), r: add(3), s: tally(10, 1, 2, 3) };
    }""", """{"a": 4}""") === """{"p":9,"q":3,"r":9,"s":13}""")
    // array-pattern params in callbacks over entries
    assert(run("""function transform(row) {
      return { keys: Object.entries(row).map(([k, v]) => k + v).join("|") };
    }""", """{"a": 1, "b": 2}""") === """{"keys":"a1|b2"}""")
    // parenthesized expressions still parse as expressions
    assert(expr("(1 + 2) * 3") === """{"v":9}""")
    assert(expr("((x => x + 1))(4)") === """{"v":5}""")
  }

  test("review fixes: split limit coercion, literal $-substitution, primitive patterns") {
    // negative limit wraps to huge (no limit); NaN → 0; undefined → no limit
    assert(expr(""""a,b,c".split(/,/, -1)""") === """{"v":["a","b","c"]}""")
    assert(expr(""""a,b".split(",", undefined)""") === """{"v":["a","b"]}""")
    assert(expr(""""a,b".split(",", 0/0)""") === """{"v":[]}""")
    assert(expr(""""a,b,c".split(",", 2)""") === """{"v":["a","b"]}""")
    // $-refs apply to string patterns too (GetSubstitution)
    assert(expr(""""abc".replace("b", "[$&]")""") === """{"v":"a[b]c"}""")
    assert(expr(""""abc".replace("b", "$`|$'")""") === """{"v":"aa|cc"}""")
    assert(expr(""""x".replace("x", "$$")""") === """{"v":"$"}""")
    assert(expr(""""aba".replaceAll("a", "<$&>")""") === """{"v":"<a>b<a>"}""")
    assert(expr(""""aba".replaceAll("a", "_")""") === """{"v":"_b_"}""")
    // object-pattern destructuring of a primitive binds defaults, not throws
    assert(run("""function transform(row) {
      const { foo = 1, length } = row.s;
      return { foo: foo, length: length };
    }""", """{"s": "hi"}""") === """{"foo":1,"length":2}""")
  }

  test("destructuring null/undefined throws a named error") {
    val e = intercept[JsError](run(
      "function transform(row) { const { a } = row.nope; return { a: a }; }"))
    assert(e.getMessage.contains("destructure"))
  }

  test("script without transform function is rejected") {
    val e = intercept[JsError](new JsInterp("var x = 10;"))
    assert(e.getMessage.contains("transform"))
  }

  test("syntax errors carry offset context") {
    val e = intercept[JsError](new JsInterp("function transform(row) { return { x: } }"))
    assert(e.getMessage.contains("parse error"))
  }

  test("unsupported features fail loudly, not silently") {
    intercept[JsError](new JsInterp("function* gen() {}; function transform(r) { return r; }"))
    intercept[JsError](run("function transform(r) { return { v: new Set() }; }"))
    // match with a string arg coerces to a regex per JS (regex support)
    assert(run("function transform(r) { return { v: 'x'.match('x') }; }") === """{"v":["x"]}""")
  }

  test("reference example script: js-transform-example.toml") {
    // reference examples/js-transform-example.toml stages.config.script
    val script =
      """function transform(row) {
        |    const fullName = row.firstName + ' ' + row.lastName;
        |    const currentYear = new Date().getFullYear();
        |    const age = currentYear - row.birthYear;
        |    const isAdult = age >= 18;
        |    return {
        |        id: row.id,
        |        fullName: fullName,
        |        birthYear: row.birthYear,
        |        age: age,
        |        isAdult: isAdult
        |    };
        |}""".stripMargin
    val out = run(script, """{"id": 1, "firstName": "John", "lastName": "Doe", "birthYear": 1990}""")
    assert(out.contains(""""fullName":"John Doe""""))
    assert(out.contains(""""isAdult":true"""))
  }

  test("reference unit-test scripts behave identically (lib.rs tests)") {
    // reference plugins-wasm/conveyor-plugin-js-wasm/src/lib.rs test_transform_row_basic
    assert(run(
      """function transform(row) {
        |  return { name: row.name, age: row.age, adult: row.age >= 18 };
        |}""".stripMargin,
      """{"name": "Alice", "age": 30}""") === """{"name":"Alice","age":30,"adult":true}""")
  }

  test("JSON number round-trip: integral values stay integral in output") {
    assert(expr("1000000 * 3") === """{"v":3000000}""")
    assert(expr("0.1 + 0.2") === """{"v":0.30000000000000004}""") // IEEE, same as JS
  }

  test("try/catch/finally: JsErrors bind as {message}, finally always runs") {
    assert(run(
      """function transform(row) {
        |  let log = [];
        |  try {
        |    log.push('t');
        |    throw new Error('boom ' + row.id);
        |  } catch (e) {
        |    log.push('c:' + e.message);
        |  } finally {
        |    log.push('f');
        |  }
        |  try { log.push('ok'); } finally { log.push('f2'); }
        |  let caught = 'no';
        |  try { row.missing.deep; } catch { caught = 'yes'; }
        |  return { log: log.join('|'), caught };
        |}""".stripMargin, """{"id": 3}""")
      === """{"log":"t|c:boom 3|f|ok|f2","caught":"yes"}""")
  }

  test("switch: strict matching, fall-through, default, break") {
    val script =
      """function transform(row) {
        |  let out = [];
        |  switch (row.k) {
        |    case 1: out.push('one'); break;
        |    case '2': out.push('two-str'); // falls through
        |    case 3: out.push('three'); break;
        |    default: out.push('other');
        |  }
        |  return { v: out.join(',') };
        |}""".stripMargin
    assert(run(script, """{"k": 1}""") === """{"v":"one"}""")
    assert(run(script, """{"k": "2"}""") === """{"v":"two-str,three"}""")
    assert(run(script, """{"k": 3}""") === """{"v":"three"}""")
    assert(run(script, """{"k": 2}""") === """{"v":"other"}""") // 2 !== '2'
  }

  test("switch inside a function can return directly") {
    assert(run(
      """function label(n) {
        |  switch (true) {
        |    case n < 0: return 'neg';
        |    case n === 0: return 'zero';
        |    default: return 'pos';
        |  }
        |}
        |function transform(row) {
        |  return { a: label(-5), b: label(0), c: label(7) };
        |}""".stripMargin) === """{"a":"neg","b":"zero","c":"pos"}""")
  }

  test("array indexing by numeric string: arr['0'] === arr[0], for...in sums work") {
    assert(run(
      """function transform(row) {
        |  let s = 0;
        |  for (const k in row.nums) s += row.nums[k];
        |  const a = [9];
        |  a["1"] = 5;
        |  return { s: s, first: row.nums["0"], a1: a[1] };
        |}""".stripMargin,
      """{"nums": [1, 2, 3]}""") === """{"s":6,"first":1,"a1":5}""")
  }

  test("interpreter instance is reusable across rows (per-partition reuse)") {
    val interp = new JsInterp(
      "let calls = 0; function transform(row) { calls++; return { n: row.n * 2, calls: calls }; }")
    val r1 = JsVal.stringify(interp.callTransform(JsVal.parseJson("""{"n": 1}""")))
    val r2 = JsVal.stringify(interp.callTransform(JsVal.parseJson("""{"n": 2}""")))
    assert(r1 === """{"n":2,"calls":1}""")
    assert(r2 === """{"n":4,"calls":2}""") // top-level state persists, parsed once
  }

  // ------------------------------------------- assignment destructuring

  test("array destructuring assignment: swap, defaults, rest, member targets") {
    assert(run(
      """function transform(row) {
        |  let a = 1, b = 2;
        |  [a, b] = [b, a];
        |  let [c = 10, d = 20] = [undefined, 7]; // declaration form still works
        |  let e, f;
        |  [e = 99, f = 98] = [5];
        |  let head, tail;
        |  [head, ...tail] = [1, 2, 3, 4];
        |  const o = { arr: [0, 0] };
        |  [o.x, o.arr[1]] = ['mx', 'ix'];
        |  return { a, b, c, d, e, f, head, tail, ox: o.x, oa: o.arr };
        |}""".stripMargin) ===
      """{"a":2,"b":1,"c":10,"d":7,"e":5,"f":98,"head":1,"tail":[2,3,4],"ox":"mx","oa":[0,"ix"]}""")
  }

  test("object destructuring assignment: parens form, rename, default, rest, nesting") {
    assert(run(
      """function transform(row) {
        |  let x, y, z, rest, deep;
        |  ({ x, y: z = 42, ...rest } = { x: 1, w: 2, q: 3 });
        |  ({ a: { b: deep } } = { a: { b: 'inner' } });
        |  const t = {};
        |  ({ p: t.prop = 'dflt' } = {});
        |  let [m, { n }] = [[7, { n: 8 }]][0] ? [7, { n: 8 }] : [];
        |  return { x, z, rest, deep, tprop: t.prop, m, n };
        |}""".stripMargin) ===
      """{"x":1,"z":42,"rest":{"w":2,"q":3},"deep":"inner","tprop":"dflt","m":7,"n":8}""")
  }

  test("destructuring assignment error cases stay loud") {
    val e1 = intercept[JsError](run(
      "function transform(row) { let a; [a] = null; return {}; }"))
    assert(e1.getMessage.contains("cannot destructure"))
    val e2 = intercept[JsError](run(
      "function transform(row) { let a, b; [...a, b] = [1, 2]; return {}; }"))
    assert(e2.getMessage.contains("rest element must be last"))
    // shorthand default outside a pattern is rejected, not silently assigned
    val e3 = intercept[JsError](run(
      "function transform(row) { const o = { a = 1 }; return o; }"))
    assert(e3.getMessage.contains("destructuring"))
  }

  // ------------------------------------------------------------- classes

  test("class with constructor, fields, methods and this") {
    assert(run(
      """class Doc {
        |  views = 0;
        |  constructor(title, body) {
        |    this.title = title;
        |    this.body = body;
        |  }
        |  wordCount() { return this.body.split(/\s+/).filter(w => w.length > 0).length; }
        |  summary(n = 2) { return this.title + ': ' + this.body.split(' ').slice(0, n).join(' '); }
        |}
        |function transform(row) {
        |  const d = new Doc(row.title, row.body);
        |  d.views++;
        |  return { wc: d.wordCount(), sum: d.summary(), views: d.views,
        |           keys: Object.keys(d), json: JSON.stringify(d) };
        |}""".stripMargin,
      """{"title": "T", "body": "alpha beta gamma"}""") ===
      """{"wc":3,"sum":"T: alpha beta","views":1,"keys":["views","title","body"],""" +
      """"json":"{\"views\":1,\"title\":\"T\",\"body\":\"alpha beta gamma\"}"}""")
  }

  test("class inheritance: extends, super(...), super.m(...), instanceof") {
    assert(run(
      """class Animal {
        |  constructor(name) { this.name = name; }
        |  speak() { return this.name + ' makes a sound'; }
        |  legs() { return 4; }
        |}
        |class Dog extends Animal {
        |  constructor(name) { super(name); this.kind = 'dog'; }
        |  speak() { return super.speak() + ' (woof)'; }
        |}
        |function transform(row) {
        |  const d = new Dog('Rex');
        |  const a = new Animal('Generic');
        |  return { s: d.speak(), legs: d.legs(), name: d.name, kind: d.kind,
        |           dIsAnimal: d instanceof Animal, dIsDog: d instanceof Dog,
        |           aIsDog: a instanceof Dog, plainIsDog: ({}) instanceof Dog };
        |}""".stripMargin) ===
      """{"s":"Rex makes a sound (woof)","legs":4,"name":"Rex","kind":"dog",""" +
      """"dIsAnimal":true,"dIsDog":true,"aIsDog":false,"plainIsDog":false}""")
  }

  test("static methods and fields; class name; methods named like modifiers") {
    assert(run(
      """class MathUtil {
        |  static twoPi = 2 * Math.PI;
        |  static double(x) { return x * 2; }
        |  static() { return 'instance method literally named static'; }
        |}
        |class Child extends MathUtil {}
        |function transform(row) {
        |  const m = new MathUtil();
        |  return { d: MathUtil.double(21), pi2: Math.round(MathUtil.twoPi * 100) / 100,
        |           inherited: Child.double(3), nm: MathUtil.name, s: m.static() };
        |}""".stripMargin) ===
      """{"d":42,"pi2":6.28,"inherited":6,"nm":"MathUtil","s":"instance method literally named static"}""")
  }

  test("arrows capture lexical this; extracted methods lose it, like JS") {
    assert(run(
      """class Counter {
        |  n = 0;
        |  bump3() {
        |    [1, 2, 3].forEach(() => { this.n++; });
        |    return this.n;
        |  }
        |}
        |function transform(row) {
        |  const c = new Counter();
        |  return { n: c.bump3() };
        |}""".stripMargin) === """{"n":3}""")
    val e = intercept[JsError](run(
      """class A { m() { return this.x; } }
        |function transform(row) {
        |  const a = new A(); a.x = 1;
        |  const f = a.m;
        |  return { v: f() };
        |}""".stripMargin))
    assert(e.getMessage.contains("undefined"))
  }

  test("class field initializers may call methods; derived fields see super chain") {
    assert(run(
      """class Base {
        |  base = 'b';
        |  tag() { return 'base'; }
        |}
        |class Derived extends Base {
        |  label = this.tag() + '!';
        |}
        |function transform(row) {
        |  const d = new Derived();
        |  return { label: d.label, base: d.base };
        |}""".stripMargin) === """{"label":"base!","base":"b"}""")
  }

  test("constructor-function pattern via new f() binds this and returns the instance") {
    assert(run(
      """function Point(x, y) { this.x = x; this.y = y; }
        |function transform(row) {
        |  const p = new Point(3, 4);
        |  return { x: p.x, y: p.y, dist: Math.sqrt(p.x * p.x + p.y * p.y) };
        |}""".stripMargin) === """{"x":3,"y":4,"dist":5}""")
  }

  test("class declarations stay out of JSON output; unsupported class forms error clearly") {
    val e1 = intercept[JsError](new JsInterp(
      "const C = class { m() {} }; function transform(row) { return {}; }"))
    assert(e1.getMessage.contains("class expressions"))
    val e2 = intercept[JsError](new JsInterp(
      "class G { get x() { return 1; } } function transform(row) { return {}; }"))
    assert(e2.getMessage.contains("getters/setters"))
    val e3 = intercept[JsError](run(
      "class A {} function transform(row) { return { v: 1 instanceof 2 }; }"))
    assert(e3.getMessage.contains("instanceof"))
  }
}

/** DataFrame-level tests for the js.eval stage. */
class JsEvalOpSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def eval(df: org.apache.spark.sql.DataFrame, cfg: Map[String, Any]) =
    JsEvalOp(StageContext.one(spark, df, Cfg.of(cfg.toSeq: _*)))

  test("basic transform: computed columns, schema inferred") {
    val out = eval(salesDf, Map("script" ->
      """function transform(row) {
        |  return { id: row.id, name: row.name.toUpperCase(), big: row.value >= 150 };
        |}""".stripMargin))
    assert(out.columns.sorted.toSeq === Seq("big", "id", "name"))
    val rows = out.orderBy("id").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Boolean]("big")))
    assert(rows.toSeq === Seq((1L, "ALICE", false), (2L, "BOB", true), (3L, "CHARLIE", true)))
  }

  test("explicit schema skips inference and casts") {
    val out = eval(salesDf, Map(
      "script" -> "function transform(row) { return { id: row.id, dbl: row.value * 2 }; }",
      "schema" -> "id BIGINT, dbl BIGINT"))
    assert(out.schema.map(_.dataType.simpleString).toSeq === Seq("bigint", "bigint"))
    assert(out.orderBy("id").collect().map(_.getAs[Long]("dbl")).toSeq === Seq(200L, 400L, 300L).sorted
      || out.orderBy("id").collect().map(_.getAs[Long]("dbl")).toSeq === Seq(200L, 400L, 300L))
  }

  test("returning null drops the row (transform-as-filter)") {
    val out = eval(salesDf, Map("script" ->
      "function transform(row) { return row.value > 120 ? { id: row.id } : null; }"))
    assert(out.collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(2L, 3L))
  }

  test("returning an array emits multiple rows (flat-map)") {
    val out = eval(salesDf, Map("script" ->
      """function transform(row) {
        |  return [{ id: row.id, half: 1 }, { id: row.id, half: 2 }];
        |}""".stripMargin))
    assert(out.count() === 6)
  }

  test("null input fields arrive as null, not undefined") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "opt")
    val out = eval(df, Map("script" ->
      "function transform(row) { return { id: row.id, isNull: row.opt === null }; }"))
    assert(out.orderBy("id").collect().map(_.getAs[Boolean]("isNull")).toSeq === Seq(false, true))
  }

  test("on_error=skip drops failing rows; default fails the job") {
    import spark.implicits._
    val df = Seq(("a", "1"), ("b", "not"), ("c", "3")).toDF("k", "v")
    val script =
      """function transform(row) {
        |  const n = parseInt(row.v);
        |  if (isNaN(n)) throw new Error('bad int: ' + row.v);
        |  return { k: row.k, n: n };
        |}""".stripMargin
    val ok = eval(df, Map("script" -> script, "on_error" -> "skip"))
    assert(ok.collect().map(_.getAs[String]("k")).sorted.toSeq === Seq("a", "c"))
    val e = intercept[org.apache.spark.SparkException](
      eval(df, Map("script" -> script)).collect())
    assert(e.getMessage.contains("bad int") || e.getCause.getMessage.contains("bad int"))
  }

  test("errors inside a returned array respect on_error and row context") {
    import spark.implicits._
    val df = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    val skip = eval(df, Map("script" ->
      "function transform(row) { return row.id === 1 ? [1, 2] : [{id: row.id}]; }",
      "on_error" -> "skip"))
    assert(skip.collect().map(_.getAs[Long]("id")).toSeq === Seq(2L))
    val e = intercept[org.apache.spark.SparkException](
      eval(df, Map("script" ->
        "function transform(row) { return [row.id]; }")).collect())
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("js.eval failed on row"))
  }

  test("raw JVM exceptions from builtins (parseInt overflow) obey on_error=skip") {
    import spark.implicits._
    val df = Seq(("a", "123"), ("b", "99999999999999999999999")).toDF("k", "v")
    val out = eval(df, Map("script" ->
      "function transform(row) { return { k: row.k, n: parseInt(row.v, 10) }; }",
      "on_error" -> "skip"))
    // the overflowing parse throws NumberFormatException inside parseInt;
    // skip must drop the row, not kill the job
    assert(out.collect().map(_.getAs[String]("k")).toSeq === Seq("a"))
  }

  test("invalid script fails at plan time with GraftPlanError") {
    intercept[GraftPlanError](eval(salesDf, Map("script" -> "function transform(row) { return {")))
    intercept[GraftPlanError](eval(salesDf, Map("script" -> "var noTransform = 1;")))
  }

  test("nested output objects become struct columns") {
    val out = eval(salesDf, Map("script" ->
      """function transform(row) {
        |  return { id: row.id, meta: { upper: row.name.toUpperCase(), len: row.name.length } };
        |}""".stripMargin))
    val m = out.orderBy("id").select("meta.upper", "meta.len").collect().head
    assert(m.getAs[String]("upper") === "ALICE")
    assert(m.getAs[Long]("len") === 5L)
  }

  test("the reference's js-transform-example.toml runs END-TO-END unmodified (path swap only)") {
    // reference examples/js-transform-example.toml verbatim; its data file
    // (examples/data/users.json, absent even in the reference repo) is
    // reconstructed here with the fields the script reads
    val dataDir = java.nio.file.Files.createTempDirectory("graft_jsex")
    val users = dataDir.resolve("users.json")
    java.nio.file.Files.writeString(users,
      """[{"id": 1, "firstName": "John", "lastName": "Doe", "birthYear": 1990,
        |  "email": "john@example.com", "status": "active"},
        | {"id": 2, "firstName": "Jane", "lastName": "Roe", "birthYear": 2015,
        |  "email": "jane@example.com", "status": "inactive"}]""".stripMargin)
    val toml = java.nio.file.Files.readString(
      java.nio.file.Path.of("/root/reference/examples/js-transform-example.toml"))
      .replace("examples/data/users.json", users.toString)
    val outputs = graft.core.DagCompiler.default.run(
      spark, graft.config.PipelineConfig.fromString(toml))
    val out = outputs("js_transform").orderBy("id").collect()
    assert(out.map(_.getAs[String]("fullName")).toSeq === Seq("John Doe", "Jane Roe"))
    assert(out.map(_.getAs[Boolean]("isAdult")).toSeq === Seq(true, false))
    assert(out.head.getAs[Long]("age") >= 36L) // currentYear - 1990
  }

  test("reference example pipeline end-to-end shape (users fixture)") {
    import spark.implicits._
    val users = Seq(
      (1L, "John", "Doe", 1990L, "john@example.com", "active"),
      (2L, "Jane", "Roe", 2010L, "jane@example.com", "active"))
      .toDF("id", "firstName", "lastName", "birthYear", "email", "status")
    val out = eval(users, Map("script" ->
      """function transform(row) {
        |    const fullName = row.firstName + ' ' + row.lastName;
        |    const currentYear = new Date().getFullYear();
        |    const age = currentYear - row.birthYear;
        |    return { id: row.id, fullName: fullName, age: age, isAdult: age >= 18,
        |             email: row.email, status: row.status };
        |}""".stripMargin))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("fullName")).toSeq === Seq("John Doe", "Jane Roe"))
    assert(rows.head.getAs[Boolean]("isAdult") === true)
  }
}
