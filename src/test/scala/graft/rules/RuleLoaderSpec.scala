package graft.rules

import graft.SparkSpec
import graft.model.Violation
import graft.operators.Validate

/** End-to-end: YAML rule text (the reference's schema language) → loader →
  * compiler → violations, covering the main Gherkin families.
  */
class RuleLoaderSpec extends SparkSpec {
  import spark.implicits._

  test("yaml schema end-to-end: load, compile, validate") {
    val yaml =
      """type: object
        |required: [name]
        |properties:
        |  name:
        |    type: string
        |    minLength: 3
        |  age:
        |    type: integer
        |    minimum: 0
        |    maximum: 150
        |  color:
        |    enum: [red, amber, green]
        |""".stripMargin
    val loaded = RuleLoader.loadString(yaml)
    val df = Seq(
      ("d1", Some("Alice"), Some(30), Some("red")),
      ("d2", Some("Al"), Some(-5), Some("blue")),
      ("d3", None: Option[String], Some(200), Some("green")))
      .toDF("doc_id", "name", "age", "color")
    val vs = Validate.violations(df, loaded.root, loaded.defs).collect().toSeq
      .sortBy(v => (v.doc_id, v.path, v.rule))
    assert(vs == Seq(
      Violation("d2", "age", "minimum", "Number must be greater than or equal to 0"),
      Violation("d2", "color", "enum",
        "Value \"blue\" is not in the enum: [\"red\", \"amber\", \"green\"]"),
      Violation("d2", "name", "minLength", "String is too short! (min length: 3)"),
      Violation("d3", "", "required", "Required property 'name' is missing!"),
      Violation("d3", "age", "maximum", "Number must be less than or equal to 150")))
  }

  test("$defs + $ref resolve; $ref short-circuits siblings (yaml_schema.rs:713-734)") {
    val yaml =
      """$defs:
        |  nonneg:
        |    type: number
        |    minimum: 0
        |properties:
        |  x:
        |    $ref: "#/$defs/nonneg"
        |""".stripMargin
    val loaded = RuleLoader.loadString(yaml)
    val df = Seq(("d1", -1.0), ("d2", 1.0)).toDF("doc_id", "x")
    val vs = Validate.violations(df, loaded.root, loaded.defs).collect()
    assert(vs.map(_.doc_id).toSeq == Seq("d1"))
  }

  test("circular $ref rejected at load (features/references.feature:33)") {
    // same-value-position cycle (through allOf, no descent) — can never
    // terminate; the reference detects the analogous condition at runtime
    val yaml =
      """$defs:
        |  a:
        |    allOf: [{ $ref: "#/$defs/b" }]
        |  b:
        |    allOf: [{ $ref: "#/$defs/a" }]
        |properties:
        |  root: { $ref: "#/$defs/a" }
        |""".stripMargin
    val e = intercept[IllegalArgumentException](RuleLoader.loadString(yaml))
    assert(e.getMessage.startsWith("Circular $ref detected: #/$defs/"))
  }

  test("fractional integer keyword values fail the load, never truncate") {
    val e = intercept[IllegalArgumentException](RuleLoader.loadString(
      "properties:\n  name: { minLength: 2.9 }\n"))
    assert(e.getMessage.contains("Expected an integer"), e.getMessage)
    // whole-valued numbers still load (YAML may hand back 3 as Double)
    RuleLoader.loadString("properties:\n  name: { minLength: 3 }\n")
  }

  test("recursive $ref through properties is legitimate and compiles finitely") {
    val yaml =
      """$defs:
        |  node:
        |    minimum: 0
        |    properties:
        |      child: { $ref: "#/$defs/node" }
        |properties:
        |  n: { $ref: "#/$defs/node" }
        |""".stripMargin
    val loaded = RuleLoader.loadString(yaml) // must not throw
    val df = Seq(("d1", -3), ("d2", 3)).toDF("doc_id", "n")
    val vs = Validate.violations(df, loaded.root, loaded.defs).collect()
    assert(vs.map(_.doc_id).toSeq == Seq("d1"))
  }

  test("boolean schemas, composition, conditionals parse and evaluate") {
    val yaml =
      """properties:
        |  a: true
        |  b: false
        |  n:
        |    oneOf:
        |      - minimum: 10
        |      - maximum: 5
        |  m:
        |    if: { minimum: 100 }
        |    then: { multipleOf: 10 }
        |    else: { minimum: 0 }
        |""".stripMargin
    val loaded = RuleLoader.loadString(yaml)
    val df = Seq(("d1", "x", "y", 7, 105), ("d2", "x", "y", 3, -2))
      .toDF("doc_id", "a", "b", "n", "m")
    val vs = Validate.violations(df, loaded.root, loaded.defs).collect().toSeq
      .sortBy(v => (v.doc_id, v.path))
    assert(vs.map(v => (v.doc_id, v.path, v.rule)).toSet == Set(
      ("d1", "b", "false"), ("d2", "b", "false"),
      ("d1", "n", "oneOf"), // 7 matches neither branch
      ("d1", "m", "multipleOf"), // 105 not multiple of 10
      ("d2", "m", "minimum"))) // -2 under else-branch minimum
  }

  test("invalid pattern fails at load, not per row") {
    intercept[java.util.regex.PatternSyntaxException] {
      RuleLoader.loadString("properties:\n  s: { pattern: 'a(b' }\n")
    }
  }

  test("the reference's own meta-schema file loads (yaml-schema.yaml)") {
    // public reference file, parsed as input data (189 lines)
    val loaded = RuleLoader.loadFile("/root/reference/yaml-schema.yaml")
    assert(loaded.defs.nonEmpty)
  }
}
