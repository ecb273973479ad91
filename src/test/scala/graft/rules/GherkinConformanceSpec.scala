package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** Replays the reference's own Gherkin corpus (the .feature files under
  * /root/reference/features — 109 schema scenarios, ~350 accept/NOT-accept
  * cases) against this engine: each case's instance YAML becomes a 1-row
  * DataFrame (JSON-inferred schema; map-typed objects when the schema uses
  * open-object keywords), the scenario's schema compiles through
  * RuleLoader+RuleCompiler, and the predicate must agree with the
  * reference's accept/reject verdict.
  *
  * Known representational gaps are skipped EXPLICITLY with reasons
  * (counted, asserted) — everything else must match.
  */
class GherkinConformanceSpec extends SparkSpec {

  private val featuresDir = "/root/reference/features"

  // scenarios this table-engine cannot represent 1:1, with reasons
  private val skipScenarios: Map[String, String] = Map(
    "Validate with external schemas" -> "URL $refs (zero-egress build)",
    "Validate with external schema with $id" -> "URL $refs (zero-egress build)",
    "$ref to a remote full URI with fragment" -> "URL $refs (zero-egress build)",
    "Error for nonexistent $ref" ->
      "runtime per-doc $ref error is a load-time error here",
    "Property names integer keys" ->
      "non-string mapping keys (table model canonicalizes keys to strings)",
    "Property names subschema" ->
      "non-string mapping keys (table model canonicalizes keys to strings)")

  private case class GCase(instance: String, accept: Boolean)
  private case class Scenario(file: String, name: String, schema: String,
      cases: Seq[GCase], expectLoadFail: Option[String])

  // --- minimal Gherkin parsing (Given schema / accept / NOT accept) ---
  private def parseFeature(path: java.nio.file.Path): Seq[Scenario] = {
    val lines = java.nio.file.Files.readAllLines(path).asScala.toList
    val out = Seq.newBuilder[Scenario]
    var name = ""
    var schema: Option[String] = None
    var cases = Seq.newBuilder[GCase]
    var loadFail: Option[String] = None
    var i = 0
    def flush(): Unit = {
      schema.foreach(s =>
        out += Scenario(path.getFileName.toString, name, s, cases.result(), loadFail))
      schema = None; cases = Seq.newBuilder[GCase]; loadFail = None
    }
    def fence(start: Int): (String, Int) = {
      // expects lines(start) to be ``` ; returns (block, indexAfterClose)
      val sb = new StringBuilder
      var j = start + 1
      while (j < lines.length && !lines(j).trim.startsWith("```")) {
        sb.append(lines(j).replaceAll("^      ", "")).append('\n')
        j += 1
      }
      (sb.toString, j + 1)
    }
    while (i < lines.length) {
      val t = lines(i).trim
      if (t.startsWith("Scenario:")) { flush(); name = t.stripPrefix("Scenario:").trim; i += 1 }
      else if (t == "Given a YAML schema:") { val (b, j) = fence(i + 1); schema = Some(b); i = j }
      else if (t.matches("(Then|And|But) it should accept:")) {
        val (b, j) = fence(i + 1); cases += GCase(b, accept = true); i = j
      }
      else if (t.matches("(Then|And|But) it should NOT accept:")) {
        val (b, j) = fence(i + 1); cases += GCase(b, accept = false); i = j
      }
      else if (t.matches("(Then|And|But) it should fail with .*")) {
        loadFail = Some(t.replaceAll("^(Then|And|But) it should fail with ", "")
          .stripPrefix("\"").stripSuffix("\"")); i += 1
      }
      else i += 1
    }
    flush()
    out.result()
  }

  // --- YAML -> JSON (for spark.read.json schema inference) ---
  private def yamlToJson(v: Any): String = v match {
    case null => "null"
    case b: java.lang.Boolean => b.toString
    case n: Number => n.toString
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case d: java.util.Date => "\"" + d.toString + "\""
    case l: java.util.List[_] => l.asScala.map(yamlToJson).mkString("[", ",", "]")
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => yamlToJson(String.valueOf(k)) + ":" + yamlToJson(vv) }
        .mkString("{", ",", "}")
    case other => yamlToJson(other.toString)
  }

  /** Instances with heterogeneous-type arrays can't round-trip through a
    * typed table column (JSON inference coerces to a common type, which
    * changes type-check outcomes) — those cases are unrepresentable.
    */
  private def hasMixedArray(v: Any): Boolean = v match {
    case l: java.util.List[_] =>
      val kinds = l.asScala.map {
        case _: String => "s"
        case _: java.lang.Boolean => "b"
        case _: java.lang.Integer | _: java.lang.Long => "n"
        case _: java.lang.Double | _: java.lang.Float => "n"
        case _: java.util.List[_] => "l"
        case _: java.util.Map[_, _] => "m"
        case null => "z"
        case _ => "o"
      }.toSet
      kinds.size > 1 || l.asScala.exists(hasMixedArray)
    case m: java.util.Map[_, _] => m.asScala.values.exists(hasMixedArray)
    case _ => false
  }

  /** Build a 1-row DF with column v holding the parsed instance. Returns
    * None when the value isn't representable (mixed-type arrays).
    */
  private def valueDf(instanceYaml: String)
      : Option[org.apache.spark.sql.DataFrame] = {
    import spark.implicits._
    val parsed = new org.yaml.snakeyaml.Yaml().load[Any](instanceYaml)
    if (hasMixedArray(parsed)) return None
    val json = s"""{"v":${yamlToJson(parsed)}}"""
    // inference drops all-null / empty composite fields — pin those schemas
    val pinned: Option[DataType] = parsed match {
      case null => Some(StringType)
      case m: java.util.Map[_, _] if m.isEmpty => Some(MapType(StringType, StringType))
      case l: java.util.List[_] if l.isEmpty => Some(ArrayType(StringType))
      case _ => None
    }
    pinned.foreach { dt =>
      return Some(spark.read.schema(StructType(Seq(StructField("v", dt))))
        .json(Seq(json).toDS))
    }
    val df = spark.read.json(Seq(json).toDS)
    if (df.columns.contains("_corrupt_record") || !df.columns.contains("v")) return None
    Some(df)
  }

  /** None = unrepresentable instance (legitimate skip); Some(Failure) = the
    * compiler/evaluator THREW — that is a real failure, never a skip (a
    * regression that makes compile throw must not silently weaken this
    * gate).
    */
  private def evalCase(loaded: RuleLoader.Loaded, c: GCase): Option[Try[Boolean]] =
    valueDf(c.instance).map { df =>
      Try {
        val dt = df.schema("v").dataType
        val compiled = RuleCompiler.compile(loaded.root, col("v"), dt, loaded.defs)
        df.select(coalesce(compiled.pred, lit(false))).collect()(0).getBoolean(0)
      }
    }

  test("reference Gherkin corpus replays against the engine") {
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(featuresDir))
      .iterator().asScala.filter(_.toString.endsWith(".feature"))
      .filterNot(_.getFileName.toString == "cli.feature") // runs the Rust binary
      .toSeq.sortBy(_.toString)
    val scenarios = files.flatMap(parseFeature)
    var passed, failedLoadOk = 0
    val failures = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]

    scenarios.foreach { sc =>
      if (skipScenarios.contains(sc.name)) skipped += s"${sc.name}: ${skipScenarios(sc.name)}"
      else Try(RuleLoader.loadString(sc.schema)) match {
        case Failure(e) =>
          if (sc.expectLoadFail.isDefined ||
            e.getMessage != null && e.getMessage.startsWith("Circular $ref")) failedLoadOk += 1
          else failures += s"[${sc.file}] ${sc.name}: load failed: ${e.getMessage}"
        case Success(loaded) if sc.expectLoadFail.isDefined =>
          failures += s"[${sc.file}] ${sc.name}: expected load failure"
        case Success(loaded) =>
          var scOk = true
          sc.cases.foreach { c =>
            evalCase(loaded, c) match {
              case Some(Success(got)) if got == c.accept => // ok
              case Some(Success(got)) =>
                scOk = false
                failures += s"[${sc.file}] ${sc.name}: expected accept=${c.accept} got=$got " +
                  s"for instance: ${c.instance.trim.take(60)}"
              case Some(Failure(e)) =>
                scOk = false
                failures += s"[${sc.file}] ${sc.name}: compile/eval threw " +
                  s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)} " +
                  s"for instance: ${c.instance.trim.take(60)}"
              case None =>
                skipped += s"[${sc.file}] ${sc.name}: unrepresentable instance " +
                  s"${c.instance.trim.take(40)}"
            }
          }
          if (scOk) passed += 1
      }
    }
    val failList = failures.result()
    val skipList = skipped.result()
    info(s"scenarios=${scenarios.size} passed=$passed loadFailOk=$failedLoadOk " +
      s"caseFailures=${failList.size} skipped=${skipList.size}")
    skipList.foreach(s => info(s"SKIP $s"))
    failList.foreach(s => info(s"FAIL $s"))
    assert(failList.isEmpty, s"${failList.size} conformance failures:\n" +
      failList.mkString("\n"))
    assert(passed >= 90, s"only $passed scenarios fully passed")
    // skip growth = silent gate weakening; round-1 baseline is 28 reasoned
    // skips — any new one must be added deliberately (and justified)
    assert(skipList.size <= 30, s"skip count grew to ${skipList.size}:\n" +
      skipList.mkString("\n"))
  }
}
