package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import graft.rules.{Keywords, Rule, RuleCompiler}

/** Rule-driven value repair: make a failing row PASS where a mechanical
  * fix exists, and log exactly what changed.
  *
  * The reference can only report (`/root/reference/src/engine.rs:37-59`
  * emits errors; the caller decides what to do). At corpus scale the
  * standard triage for the long tail of mechanical violations is
  * repair-with-lineage: clamp out-of-range numbers to the violated bound,
  * replace out-of-enum / pattern-failing strings with a declared default,
  * truncate over-length strings, fill missing required fields — and keep
  * an auditable (id, path, rule, old, new) log of every change.
  *
  * Each repair CONDITION is the negation of the validator's own compiled
  * single-keyword predicate (`RuleCompiler.compile(...).pred` over the
  * property value), so repair can never disagree with [[Validate]] about
  * what fails; the closure property — `validate(repair(df))` is clean for
  * every repaired keyword — is spec-asserted.
  *
  * Supported repairs, applied per property in this fixed order (later
  * conditions see the already-repaired value):
  *   1. `required` + default  → fill a null value
  *   2. `enum` + default      → replace an out-of-enum value
  *   3. `pattern` + default   → replace a non-matching value
  *   4. `minimum` / `maximum` → clamp to the violated bound
  *   5. `maxLength`           → truncate to the limit
  * Keywords with no mechanical fix (minLength with no default, multipleOf,
  * format, array/object shapes) are left for [[Enforce]] to quarantine.
  *
  * 100 TB shape: every repair is a pure CASE-WHEN Column over its own row
  * — [[withRepairs]] is one scan, zero shuffle, whole-stage codegen; the
  * log is a scan-stage explode of the per-row repair array (output mass ∝
  * repairs made, not corpus size).
  */
object Repair {

  /** One applied-repair log entry (the `_graft_repairs` array element). */
  private def entry(path: String, ruleName: String, old: Column,
      next: Column): Column =
    struct(lit(path).as("path"), lit(ruleName).as("rule"),
      old.cast(StringType).as("old"), next.cast(StringType).as("new"))

  /** Failing-value condition for one single-keyword sub-rule, evaluated on
    * the CURRENT (possibly already part-repaired) value: non-null and the
    * validator's own compiled predicate rejects it.
    */
  private def fails(kw: Keywords, cur: Column, dt: DataType): Column =
    cur.isNotNull &&
      !coalesce(RuleCompiler.compile(Rule.Check(kw), cur, dt).pred, lit(true))

  /** The per-property repair chain: (repaired column, log entries). */
  private def repairCol(p: String, kw: Keywords, c: Column, dt: DataType,
      default: Option[Column]): (Column, Seq[Column]) = {
    var cur = c
    val log = Seq.newBuilder[Column]
    def step(ruleName: String, cond: Column, fix: Column): Unit = {
      log += when(cond, entry(p, ruleName, cur, fix))
      cur = when(cond, fix).otherwise(cur)
    }
    kw.enum_.foreach { vals =>
      default.foreach(d =>
        step("enum", fails(Keywords(enum_ = Some(vals)), cur, dt), d.cast(dt)))
    }
    kw.pattern.foreach { pat =>
      default.foreach(d =>
        step("pattern", fails(Keywords(pattern = Some(pat)), cur, dt), d.cast(dt)))
    }
    kw.minimum.foreach { m =>
      step("minimum", fails(Keywords(minimum = Some(m)), cur, dt),
        lit(m).cast(dt))
    }
    kw.maximum.foreach { m =>
      step("maximum", fails(Keywords(maximum = Some(m)), cur, dt),
        lit(m).cast(dt))
    }
    kw.maxLength.foreach { n =>
      step("maxLength", fails(Keywords(maxLength = Some(n)), cur, dt),
        substring(cur, 1, n))
    }
    (cur, log.result())
  }

  /** df with every repairable property rewritten + `_graft_repairs`
    * (array of (path, rule, old, new) for the repairs applied to the row)
    * — the one-pass form. `defaults` supplies the replacement value for
    * enum/pattern/required repairs, keyed by property name; properties
    * without a default get only the default-free repairs (clamp,
    * truncate). `rule` must be an object rule (`properties`).
    */
  def withRepairs(df: DataFrame, rule: Rule,
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    val kw = rule match {
      case Rule.Check(k) => k
      case other => throw new IllegalArgumentException(
        s"repair needs an object rule with properties, got: $other")
    }
    val schema = df.schema
    // every repaired column AND every log entry is an expression over the
    // ORIGINAL columns, emitted in one select — sequencing them through
    // withColumn would rebind the log's col(p) to the already-repaired
    // value and no condition would ever fire
    val repairedCols = Map.newBuilder[String, Column]
    val allLogs = Seq.newBuilder[Column]
    kw.properties.toSeq.sortBy(_._1).foreach {
      case (p, Rule.Check(pk)) if schema.fieldNames.contains(p) =>
        val dt = schema(p).dataType
        // required-fill first: a null value becomes the default, and the
        // later keyword repairs then see the filled value
        var c: Column = col(p)
        val reqLog = if (kw.required.contains(p) && defaults.contains(p)) {
          val d = defaults(p).cast(dt)
          val e = when(c.isNull, entry(p, "required", c, d))
          c = coalesce(c, d)
          Seq(e)
        } else Seq.empty
        val (repaired, log) = repairCol(p, pk, c, dt, defaults.get(p))
        repairedCols += p -> repaired
        allLogs ++= reqLog ++ log
      case _ => () // non-Check sub-rule or absent column: nothing mechanical
    }
    val entries = allLogs.result()
    val arr = if (entries.isEmpty) array().cast("array<struct<path:string,rule:string,old:string,new:string>>")
      else array_compact(array(entries: _*))
    val byName = repairedCols.result()
    val outCols = df.columns.map(c => byName.getOrElse(c, col(c)).as(c)) :+
      arr.as("_graft_repairs")
    df.select(outCols: _*)
  }

  /** The repaired table, original schema. */
  def repaired(df: DataFrame, rule: Rule,
      defaults: Map[String, Column] = Map.empty): DataFrame =
    withRepairs(df, rule, defaults).drop("_graft_repairs")

  /** Flat audit log: (idCol, path, rule, old, new) — one row per applied
    * repair, |log| ∝ repairs, never corpus-sized.
    */
  def log(df: DataFrame, rule: Rule, defaults: Map[String, Column] = Map.empty,
      idCol: String = "doc_id"): DataFrame =
    withRepairs(df, rule, defaults)
      .select(col(idCol), explode(col("_graft_repairs")).as("r"))
      .select(col(idCol), col("r.path").as("path"), col("r.rule").as("rule"),
        col("r.old").as("old"), col("r.new").as("new"))
}
