package graft.rules

/** Constant values usable in `const` / `enum` rules.
  *
  * Mirrors the reference's `ConstValue::{Null, Boolean, Number, String}`
  * (`/root/reference/src/lib.rs:115-126`); arrays/objects constants are
  * supported at compile time via deep struct equality (`lib.rs:145-188`
  * → Spark's `===` on struct/array columns is already deep).
  */
sealed trait ConstVal
object ConstVal {
  case object VNull extends ConstVal
  final case class VBool(b: Boolean) extends ConstVal
  final case class VInt(i: Long) extends ConstVal
  final case class VNum(d: Double) extends ConstVal
  final case class VStr(s: String) extends ConstVal
  final case class VArr(items: List[ConstVal]) extends ConstVal
  final case class VObj(fields: Map[String, ConstVal]) extends ConstVal

  /** format_yaml_data rendering (`/root/reference/src/utils.rs:56-94`):
    * strings quoted, scalars plain.
    */
  def render(c: ConstVal): String = c match {
    case VNull    => "null"
    case VBool(b) => b.toString
    case VInt(i)  => i.toString
    case VNum(d)  => Num.fmt(d)
    case VStr(s)  => "\"" + s + "\""
    case VArr(items) => items.map(render).mkString("[", ", ", "]") // utils.rs:91
    case VObj(fs) => fs.map { case (k, v) => s"$k: ${render(v)}" }
      .mkString("{ ", ", ", " }") // utils.rs:79
  }
}

/** Rust-`Display`-style number formatting used in reference messages:
  * `format!("{}", 1.0f64)` renders as `1`, `1.5` as `1.5`.
  */
object Num {
  def fmt(d: Double): String =
    if (d.isWhole && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}

/** The compiled rule tree — the engine's logical plan, analogous to the
  * reference's `RootSchema -> YamlSchema -> Subschema`
  * (`/root/reference/src/schemas/root_schema.rs:21-26`,
  * `schemas/yaml_schema.rs:45-50,325-360`). Built once on the driver,
  * then compiled by [[RuleCompiler]] into Catalyst `Column` expressions.
  */
sealed trait Rule

object Rule {

  /** Empty schema / `true` — accepts everything (`yaml_schema.rs:171,181`). */
  case object Accept extends Rule

  /** `false` schema — rejects everything (`yaml_schema.rs:183-186`). */
  case object Reject extends Rule

  /** A `$ref` to a named definition; resolved (inlined) before compilation
    * with compile-time cycle detection (`context.rs:219-236` does this at
    * runtime; a static rule tree lets us do it at load).
    */
  final case class Ref(name: String) extends Rule

  /** One keyword-bearing subschema. All present keywords must pass
    * (implicit allOf), matching `Subschema::validate` keyword order
    * (`yaml_schema.rs:705-898`).
    */
  final case class Check(kw: Keywords) extends Rule

  /** Deterministic canonical rendering — map entries sorted by key, every
    * keyword in a fixed order. The stable input for commit-log rule hashing
    * (case-class `toString` depends on Scala Map iteration order, so two
    * loads of the same YAML could hash differently — or two different rule
    * sets could collide on a 32-bit hashCode).
    *
    * Every user-supplied string (pattern, format, map keys, required names,
    * const/enum strings, $ref names) renders QUOTED with `"` and `\\`
    * escaped, so no crafted value can collide with the `-` absent-sentinel
    * or smuggle a delimiter — distinct rule trees always render (and hash)
    * distinctly.
    */
  def canonical(r: Rule): String = {
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c => c.toString
      } + "\""
    r match {
    case Accept => "T"
    case Reject => "F"
    case Ref(n) => s"ref<${q(n)}>"
    case Check(kw) =>
      def rm(m: Map[String, Rule]): String = m.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}=${canonical(v)}" }.mkString("{", ",", "}")
      def ro(o: Option[Rule]): String = o.map(canonical).getOrElse("-")
      def rl(l: List[Rule]): String = l.map(canonical).mkString("[", ",", "]")
      def cv(c: ConstVal): String = c match {
        case ConstVal.VObj(fs) => fs.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}:${cv(v)}" }.mkString("{", ",", "}")
        case ConstVal.VArr(is) => is.map(cv).mkString("[", ",", "]")
        case ConstVal.VStr(s)  => q(s)
        case other             => other.toString
      }
      Seq(
        "ty=" + kw.types.map(_.mkString("|")).getOrElse("-"),
        "const=" + kw.const.map(cv).getOrElse("-"),
        "enum=" + kw.enum_.map(_.map(cv).mkString("|")).getOrElse("-"),
        "min=" + kw.minimum.getOrElse("-"),
        "max=" + kw.maximum.getOrElse("-"),
        "xmin=" + kw.exclusiveMinimum.getOrElse("-"),
        "xmax=" + kw.exclusiveMaximum.getOrElse("-"),
        "mult=" + kw.multipleOf.getOrElse("-"),
        "minLen=" + kw.minLength.getOrElse("-"),
        "maxLen=" + kw.maxLength.getOrElse("-"),
        "pat=" + kw.pattern.map(q).getOrElse("-"),
        "fmt=" + kw.format.map(q).getOrElse("-"),
        "props=" + rm(kw.properties),
        "patProps=" + rm(kw.patternProperties),
        "addProps=" + ro(kw.additionalProperties),
        "propNames=" + ro(kw.propertyNames),
        "req=" + kw.required.map(q).mkString("|"),
        "minProps=" + kw.minProperties.getOrElse("-"),
        "maxProps=" + kw.maxProperties.getOrElse("-"),
        "depReq=" + kw.dependentRequired.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}=${v.map(q).mkString("|")}" }
          .mkString("{", ",", "}"),
        "depSch=" + rm(kw.dependentSchemas),
        "items=" + ro(kw.items),
        "prefix=" + rl(kw.prefixItems),
        "minItems=" + kw.minItems.getOrElse("-"),
        "maxItems=" + kw.maxItems.getOrElse("-"),
        "uniq=" + kw.uniqueItems,
        "contains=" + ro(kw.contains),
        "minCont=" + kw.minContains.getOrElse("-"),
        "maxCont=" + kw.maxContains.getOrElse("-"),
        "unevalProps=" + ro(kw.unevaluatedProperties),
        "unevalItems=" + ro(kw.unevaluatedItems),
        "allOf=" + rl(kw.allOf),
        "anyOf=" + rl(kw.anyOf),
        "oneOf=" + rl(kw.oneOf),
        "not=" + ro(kw.not),
        "if=" + ro(kw.ifRule),
        "then=" + ro(kw.thenRule),
        "else=" + ro(kw.elseRule)
      ).mkString("chk(", ";", ")")
    }
  }
}

/** All supported keywords of one subschema level (JSON Schema 2020-12
  * vocabulary as implemented by the reference, SURVEY.md §2.2-2.6).
  */
final case class Keywords(
    // type: single or list ("string","number","integer","boolean","null","object","array")
    types: Option[List[String]] = None,
    const: Option[ConstVal] = None,
    enum_ : Option[List[ConstVal]] = None,
    // numeric (schemas/numeric.rs:18-58)
    minimum: Option[Double] = None,
    maximum: Option[Double] = None,
    exclusiveMinimum: Option[Double] = None,
    exclusiveMaximum: Option[Double] = None,
    multipleOf: Option[Double] = None,
    // string (validation/strings.rs:55-98)
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    pattern: Option[String] = None,
    format: Option[String] = None,
    // object (validation/objects.rs)
    properties: Map[String, Rule] = Map.empty,
    patternProperties: Map[String, Rule] = Map.empty,
    additionalProperties: Option[Rule] = None, // None = allowed (2020-12 default)
    propertyNames: Option[Rule] = None,
    required: List[String] = Nil,
    minProperties: Option[Int] = None,
    maxProperties: Option[Int] = None,
    dependentRequired: Map[String, List[String]] = Map.empty,
    dependentSchemas: Map[String, Rule] = Map.empty,
    // array (schemas/array.rs)
    items: Option[Rule] = None, // Some(Reject) models `items: false`
    prefixItems: List[Rule] = Nil,
    minItems: Option[Int] = None,
    maxItems: Option[Int] = None,
    uniqueItems: Boolean = false,
    contains: Option[Rule] = None,
    minContains: Option[Int] = None,
    maxContains: Option[Int] = None,
    // unevaluated* (yaml_schema.rs:921-1003) — compile-time evaluated-set
    // lowering per SURVEY.md §2.5; Some(Rule.Reject) models `false`
    unevaluatedProperties: Option[Rule] = None,
    unevaluatedItems: Option[Rule] = None,
    // composition (schemas/{all,any,one}_of.rs, not.rs, if_then_else.rs)
    allOf: List[Rule] = Nil,
    anyOf: List[Rule] = Nil,
    oneOf: List[Rule] = Nil,
    not: Option[Rule] = None,
    ifRule: Option[Rule] = None,
    thenRule: Option[Rule] = None,
    elseRule: Option[Rule] = None
)
