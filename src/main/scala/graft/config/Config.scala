package graft.config

/** Minimal dynamic config value model — the target of the TOML parser and
  * the input to every stage. Mirrors the reference's TOML-scalar lattice
  * (reference: src/core/config.rs:171-186 — stage config is a free-form
  * TOML table): String/Integer/Float/Boolean/Array/Table.
  */
sealed trait CVal {
  def render: String = this match {
    case CStr(v)    => v
    case CLong(v)   => v.toString
    case CDouble(v) => v.toString
    case CBool(v)   => v.toString
    case CArr(v)    => v.map(_.render).mkString("[", ", ", "]")
    case CTbl(v)    => v.map { case (k, x) => s"$k = ${x.render}" }.mkString("{", ", ", "}")
  }
}
final case class CStr(v: String) extends CVal
final case class CLong(v: Long) extends CVal
final case class CDouble(v: Double) extends CVal
final case class CBool(v: Boolean) extends CVal
final case class CArr(v: Vector[CVal]) extends CVal
final case class CTbl(v: Map[String, CVal]) extends CVal

object CVal {
  /** Lift plain Scala values into CVal (for programmatic config building). */
  def of(x: Any): CVal = x match {
    case v: CVal       => v
    case v: String     => CStr(v)
    case v: Int        => CLong(v.toLong)
    case v: Long       => CLong(v)
    case v: Double     => CDouble(v)
    case v: Float      => CDouble(v.toDouble)
    case v: Boolean    => CBool(v)
    case v: Seq[_]     => CArr(v.map(of).toVector)
    case v: Map[_, _]  => CTbl(v.map { case (k, x) => k.toString -> of(x) })
    case other => throw new IllegalArgumentException(s"cannot lift $other to CVal")
  }
}

/** Typed accessor wrapper around a config table. Throws GraftConfigError with
  * the key path on type/missing errors (reference reports similar per-key
  * errors, e.g. src/modules/transforms/filter.rs:93-116).
  */
final case class Cfg(table: Map[String, CVal]) {
  def get(key: String): Option[CVal] = table.get(key)
  def has(key: String): Boolean = table.contains(key)

  def str(key: String): String =
    strOpt(key).getOrElse(missing(key, "string"))
  def strOpt(key: String): Option[String] = get(key).map {
    case CStr(v) => v
    case other   => bad(key, "string", other)
  }
  def strOr(key: String, dflt: String): String = strOpt(key).getOrElse(dflt)

  def long(key: String): Long = longOpt(key).getOrElse(missing(key, "integer"))
  def longOpt(key: String): Option[Long] = get(key).map {
    case CLong(v) => v
    case other    => bad(key, "integer", other)
  }
  def longOr(key: String, dflt: Long): Long = longOpt(key).getOrElse(dflt)

  def doubleOpt(key: String): Option[Double] = get(key).map {
    case CDouble(v) => v
    case CLong(v)   => v.toDouble
    case other      => bad(key, "float", other)
  }
  def doubleOr(key: String, dflt: Double): Double = doubleOpt(key).getOrElse(dflt)

  def boolOr(key: String, dflt: Boolean): Boolean = get(key).map {
    case CBool(v) => v
    case other    => bad(key, "boolean", other)
  }.getOrElse(dflt)

  def arrOpt(key: String): Option[Vector[CVal]] = get(key).map {
    case CArr(v) => v
    case other   => bad(key, "array", other)
  }

  /** string | [string] — the reference accepts both for `columns`/`by`
    * (e.g. src/modules/transforms/select.rs:52-81). */
  def strList(key: String): Vector[String] = get(key) match {
    case Some(CStr(v))  => Vector(v)
    case Some(CArr(vs)) => vs.map {
      case CStr(s) => s
      case other   => bad(key, "array of strings", other)
    }
    case Some(other) => bad(key, "string or array of strings", other)
    case None        => missing(key, "string or array of strings")
  }
  def strListOr(key: String, dflt: Vector[String]): Vector[String] =
    if (has(key)) strList(key) else dflt

  def tblOpt(key: String): Option[Cfg] = get(key).map {
    case CTbl(v) => Cfg(v)
    case other   => bad(key, "table", other)
  }
  def tblArr(key: String): Vector[Cfg] = arrOpt(key).getOrElse(Vector.empty).map {
    case CTbl(v) => Cfg(v)
    case other   => bad(key, "array of tables", other)
  }

  /** raw scalar for typed-literal comparisons (filter value). */
  def scalar(key: String): CVal =
    get(key).getOrElse(missing(key, "scalar"))

  private def missing(key: String, want: String): Nothing =
    throw new GraftConfigError(s"missing required config key '$key' (expected $want)")
  private def bad(key: String, want: String, got: CVal): Nothing =
    throw new GraftConfigError(s"config key '$key': expected $want, got ${got.getClass.getSimpleName}(${got.render})")
}

object Cfg {
  val empty: Cfg = Cfg(Map.empty[String, CVal])
  /** Programmatic builder: Cfg.of("column" -> "l_quantity", "value" -> 30) */
  def of(kvs: (String, Any)*): Cfg =
    Cfg(kvs.map { case (k, v) => k -> CVal.of(v) }.toMap)
}

class GraftConfigError(msg: String) extends RuntimeException(msg)
class GraftValidationError(msg: String) extends RuntimeException(msg)
