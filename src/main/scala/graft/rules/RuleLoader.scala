package graft.rules

import scala.jdk.CollectionConverters._

/** YAML rule-file loader: YAML text → [[Rule]] tree + resolved `$defs`.
  *
  * The analogue of the reference's `loader.rs` + `RootSchema::try_from` +
  * `Subschema::try_from` (`/root/reference/src/loader.rs:27-59`,
  * `schemas/root_schema.rs:90-133`, `schemas/yaml_schema.rs:439-660`):
  * rules are parsed and compiled once on the driver; regex/format validity
  * can surface at load (fail-fast) rather than per row.
  *
  * `$ref` handling: local `#/$defs/name` refs resolve against the document's
  * `$defs` (`root_schema.rs:64-88`); cycles are detected at load time by a
  * DFS over the static rule graph — the runtime `(ref, position)` cycle
  * tracking of `context.rs:219-236` is unnecessary when the table schema is
  * static, because unbounded recursion can never terminate on finite-depth
  * rows; message matches `features/references.feature:33`. External
  * (file/HTTP) refs are out of scope in this zero-egress build (SURVEY.md
  * §2.6).
  */
object RuleLoader {

  final case class Loaded(root: Rule, defs: Map[String, Rule])

  def loadString(yaml: String): Loaded = loadString(yaml, None)

  /** `baseDir` enables external FILE `$ref`s (`other.yaml`,
    * `other.yaml#/$defs/x`) resolved relative to the referencing file and
    * cached by canonical path — the file-scheme subset of the reference's
    * URI-keyed external-schema cache (`/root/reference/src/schemas/
    * yaml_schema.rs:735-819`, cache keying `root_schema.rs:57-61`; a
    * document's `$id`, when present, aliases the cache entry like
    * `ys.rs:107-120`). HTTP refs stay out of scope (zero egress).
    */
  def loadString(yaml: String, baseDir: Option[java.nio.file.Path]): Loaded = {
    val loader = new Loading(baseDir)
    val root = loader.loadDoc(yaml, prefix = "")
    detectCycles(root, loader.defs.toMap)
    Loaded(root, loader.defs.toMap)
  }

  def loadFile(path: String): Loaded = loadFiles(Seq(path))

  /** Multi-schema preload (`ys.rs:133-177`): the FIRST path is the
    * evaluation root; every path is preloaded keyed by canonical path and —
    * when the document declares a top-level `$id` — by that id too
    * (`ys.rs:107-120` cache-key aliasing), so `$ref: <id>` resolves across
    * files regardless of load order.
    */
  def loadFiles(paths: Seq[String]): Loaded = {
    require(paths.nonEmpty, "at least one rules file is required")
    val canon = paths.map(p => java.nio.file.Paths.get(p).toAbsolutePath.normalize)
    val loader = new Loading(Some(canon.head.getParent))
    // pre-scan $id declarations first so refs resolve in any order (the
    // parse is cached — preload/loadDoc below reuse it, one read per file)
    canon.foreach { p =>
      loader.parsedFor(p) match {
        case m: java.util.Map[_, _] =>
          m.asScala.collectFirst {
            case (k, id: String) if s"$k" == "$id" => loader.registerId(id, p)
          }
        case _ =>
      }
      ()
    }
    canon.tail.foreach(loader.preloadFile)
    val root = loader.loadParsed(loader.parsedFor(canon.head), prefix = "")
    detectCycles(root, loader.defs.toMap)
    Loaded(root, loader.defs.toMap)
  }

  /** One load pass: accumulates `$defs` of the root document plus every
    * transitively referenced file (file defs namespaced by canonical path).
    */
  private final class Loading(baseDir: Option[java.nio.file.Path]) {
    val defs = scala.collection.mutable.Map.empty[String, Rule]
    private val fileCache = scala.collection.mutable.Map.empty[String, String]
    // `$id` -> canonical file path (multi-schema preload aliasing)
    private val idAliases = scala.collection.mutable.Map.empty[String, java.nio.file.Path]

    def registerId(id: String, path: java.nio.file.Path): Unit = idAliases(id) = path

    // one read + one parse per file, however many times it is referenced
    // (the $id pre-scan, preload, and $ref resolution all share these)
    private val parsedCache = scala.collection.mutable.Map.empty[String, Any]
    def parsedFor(p: java.nio.file.Path): Any =
      parsedCache.getOrElseUpdate(p.toString, {
        val text = try java.nio.file.Files.readString(p)
        catch { case _: Exception =>
          throw new IllegalArgumentException(s"Schema $p not found")
        }
        new org.yaml.snakeyaml.Yaml().load[Any](text)
      })

    /** Load a whole file as a ref target under its canonical-path key. */
    def preloadFile(p: java.nio.file.Path): Unit = {
      val key = p.toString
      if (!fileCache.contains(key)) {
        fileCache(key) = key
        defs(key) = loadParsed(parsedFor(p), prefix = key)
      }
    }

    def loadDoc(yaml: String, prefix: String): Rule =
      loadParsed(new org.yaml.snakeyaml.Yaml().load[Any](yaml), prefix)

    def loadParsed(parsed: Any, prefix: String): Rule = {
      parsed match {
        case m: java.util.Map[_, _] =>
          m.asScala.collectFirst {
            case (k, v: java.util.Map[_, _]) if s"$k" == "$defs" =>
              v.asScala.foreach { case (name, sub) =>
                defs(s"$prefix#/$$defs/$name") = toRule(sub, this, prefix)
              }
          }
        case _ =>
      }
      toRule(parsed, this, prefix)
    }

    /** Resolve a `$ref` string to the symbol-table key, loading external
      * files on first use.
      */
    def resolveRef(ref: String, prefix: String): String =
      if (ref.startsWith("#")) prefix + ref // local pointer
      else {
        val (file, frag) = ref.indexOf('#') match {
          case -1 => (ref, "")
          case i  => (ref.substring(0, i), ref.substring(i))
        }
        // preloaded `$id` alias (bare or with a fragment into its $defs),
        // else resolve as a file path relative to the referencing document
        val key = idAliases.get(file) match {
          case Some(p) =>
            preloadFile(p)
            p.toString
          case None =>
            val dir = baseDir.getOrElse(throw new IllegalArgumentException(
              s"Schema $ref not found")) // no base dir => can't resolve files
            val p = dir.resolve(file).toAbsolutePath.normalize
            val k = p.toString
            if (!fileCache.contains(k)) {
              fileCache(k) = k // mark before parsing (cycle-safe)
              val parsed = try parsedFor(p)
              catch { case _: Exception =>
                throw new IllegalArgumentException(s"Schema $ref not found")
              }
              defs(k) = loadParsed(parsed, prefix = k) // whole-document target
            }
            k
        }
        if (frag.isEmpty || frag == "#") key else key + frag
      }
  }

  // --- cycle detection over the static rule graph ---

  /** Refs reachable WITHOUT descending into a child value — only these can
    * recurse unboundedly (recursion through properties/items descends into
    * finite table structure and terminates; the reference's meta-schema is
    * recursive in exactly that legitimate way).
    */
  private def refsOf(r: Rule): Seq[String] = r match {
    case Rule.Ref(n) => Seq(n)
    case Rule.Check(kw) =>
      (kw.dependentSchemas.values ++ kw.allOf ++ kw.anyOf ++ kw.oneOf ++
        kw.not ++ kw.ifRule ++ kw.thenRule ++ kw.elseRule)
        .flatMap(refsOf).toSeq
    case _ => Nil
  }

  private def detectCycles(root: Rule, defs: Map[String, Rule]): Unit = {
    def visit(name: String, stack: List[String]): Unit = {
      if (stack.contains(name)) {
        throw new IllegalArgumentException(s"Circular $$ref detected: $name")
      }
      defs.get(name).foreach { target =>
        refsOf(target).foreach(visit(_, name :: stack))
      }
    }
    (refsOf(root) ++ defs.keys).distinct.foreach(visit(_, Nil))
  }

  // --- YAML node -> Rule ---

  private def str(v: Any): String = String.valueOf(v)

  private def toConst(v: Any): ConstVal = v match {
    case null                  => ConstVal.VNull
    case b: java.lang.Boolean  => ConstVal.VBool(b)
    case i: java.lang.Integer  => ConstVal.VInt(i.longValue())
    case l: java.lang.Long     => ConstVal.VInt(l)
    case d: java.lang.Double   => ConstVal.VNum(d)
    case f: java.lang.Float    => ConstVal.VNum(f.doubleValue())
    case b: java.math.BigInteger => ConstVal.VInt(b.longValueExact())
    case s: String             => ConstVal.VStr(s)
    case l: java.util.List[_]  => ConstVal.VArr(l.asScala.map(x => toConst(x)).toList)
    case m: java.util.Map[_, _] =>
      ConstVal.VObj(m.asScala.map { case (k, v) => str(k) -> toConst(v) }.toMap)
    case other =>
      throw new IllegalArgumentException(s"Unsupported const value: $other")
  }

  private def dbl(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(s"Expected a number, got: $other")
  }
  private def int(v: Any): Int = v match {
    // fail fast on fractional values (the reference rejects `minLength:
    // 2.9` at load; silently truncating would change the rule's meaning)
    case n: java.lang.Double if n.doubleValue() != math.floor(n.doubleValue()) =>
      throw new IllegalArgumentException(s"Expected an integer, got: $n")
    case n: java.lang.Float if n.floatValue() != math.floor(n.floatValue()) =>
      throw new IllegalArgumentException(s"Expected an integer, got: $n")
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(s"Expected an integer, got: $other")
  }

  def toRule(node: Any): Rule = toRule(node, new Loading(None), "")

  private def toRule(node: Any, l: Loading, prefix: String): Rule = node match {
    case null => Rule.Accept // empty schema accepts everything
    case b: java.lang.Boolean => if (b) Rule.Accept else Rule.Reject
    case m: java.util.Map[_, _] =>
      val kv = m.asScala.map { case (k, v) => str(k) -> v.asInstanceOf[Any] }.toMap
      if (kv.isEmpty) Rule.Accept
      else kv.get("$ref") match {
        // $ref short-circuits sibling keywords (yaml_schema.rs:713-734)
        case Some(refPath) => Rule.Ref(l.resolveRef(str(refPath), prefix))
        case None => Rule.Check(toKeywords(kv, l, prefix))
      }
    case other =>
      throw new IllegalArgumentException(s"Unsupported schema node: $other")
  }

  private def ruleMap(v: Any, l: Loading, prefix: String): Map[String, Rule] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, sub) => str(k) -> toRule(sub, l, prefix) }.toMap
    case other => throw new IllegalArgumentException(s"Expected a mapping, got: $other")
  }
  private def ruleList(v: Any, l: Loading, prefix: String): List[Rule] = v match {
    case lst: java.util.List[_] => lst.asScala.map(toRule(_, l, prefix)).toList
    case other => throw new IllegalArgumentException(s"Expected a list, got: $other")
  }
  private def strList(v: Any): List[String] = v match {
    case l: java.util.List[_] => l.asScala.map(str).toList
    case other => throw new IllegalArgumentException(s"Expected a list, got: $other")
  }

  // scalastyle:off cyclomatic.complexity
  private def toKeywords(kv: Map[String, Any], l: Loading, prefix: String): Keywords = {
    def ruleOf(v: Any): Rule = toRule(v, l, prefix)
    def rm(v: Any): Map[String, Rule] = ruleMap(v, l, prefix)
    def rl(v: Any): List[Rule] = ruleList(v, l, prefix)
    // type inference like the reference: omitted `type` with properties =>
    // object; with string facets => string (yaml_schema.rs:606-621)
    val allowedTypes =
      Set("string", "number", "integer", "object", "array", "boolean", "null")
    def checkType(t: String): String =
      if (allowedTypes.contains(t)) t
      else throw new IllegalArgumentException(
        "Unsupported type: Expected type: string, number, integer, object, " +
          s"array, boolean, or null, but got: $t")
    val types = kv.get("type").map {
      case null                 => List("null") // YAML `type: null` is a null scalar
      case s: String            => List(checkType(s))
      case l: java.util.List[_] => l.asScala.map(x => checkType(str(x))).toList
      case other => throw new IllegalArgumentException(s"Unsupported type: $other")
    }
    Keywords(
      types = types,
      const = kv.get("const").map(toConst),
      enum_ = kv.get("enum").map {
        case l: java.util.List[_] => l.asScala.map(v => toConst(v)).toList
        case other => throw new IllegalArgumentException(s"Expected a list, got: $other")
      },
      minimum = kv.get("minimum").map(dbl),
      maximum = kv.get("maximum").map(dbl),
      exclusiveMinimum = kv.get("exclusiveMinimum").map(dbl),
      exclusiveMaximum = kv.get("exclusiveMaximum").map(dbl),
      multipleOf = kv.get("multipleOf").map(dbl),
      minLength = kv.get("minLength").map(int),
      maxLength = kv.get("maxLength").map(int),
      pattern = kv.get("pattern").map { p =>
        val s = str(p)
        java.util.regex.Pattern.compile(s) // eager compile, fail at load
        s
      },
      format = kv.get("format").map(str),
      properties = kv.get("properties").map(rm).getOrElse(Map.empty),
      patternProperties = kv.get("patternProperties").map(rm).getOrElse(Map.empty),
      additionalProperties = kv.get("additionalProperties").map(ruleOf),
      propertyNames = kv.get("propertyNames").map(ruleOf),
      required = kv.get("required").map(strList).getOrElse(Nil),
      minProperties = kv.get("minProperties").map(int),
      maxProperties = kv.get("maxProperties").map(int),
      dependentRequired = kv.get("dependentRequired").map {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, v) => str(k) -> strList(v) }.toMap
        case other => throw new IllegalArgumentException(s"Expected a mapping, got: $other")
      }.getOrElse(Map.empty),
      dependentSchemas = kv.get("dependentSchemas").map(rm).getOrElse(Map.empty),
      unevaluatedProperties = kv.get("unevaluatedProperties").map(ruleOf),
      unevaluatedItems = kv.get("unevaluatedItems").map(ruleOf),
      items = kv.get("items").map(ruleOf),
      prefixItems = kv.get("prefixItems").map(rl).getOrElse(Nil),
      minItems = kv.get("minItems").map(int),
      maxItems = kv.get("maxItems").map(int),
      uniqueItems = kv.get("uniqueItems").exists {
        case b: java.lang.Boolean => b
        case _ => false
      },
      contains = kv.get("contains").map(ruleOf),
      minContains = kv.get("minContains").map(int),
      maxContains = kv.get("maxContains").map(int),
      allOf = kv.get("allOf").map(rl).getOrElse(Nil),
      anyOf = kv.get("anyOf").map(rl).getOrElse(Nil),
      oneOf = kv.get("oneOf").map(rl).getOrElse(Nil),
      not = kv.get("not").map(ruleOf),
      ifRule = kv.get("if").map(ruleOf),
      thenRule = kv.get("then").map(ruleOf),
      elseRule = kv.get("else").map(ruleOf))
  }
  // scalastyle:on cyclomatic.complexity
}
