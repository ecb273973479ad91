package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.rules.{ConstVal, Keywords, Rule}

/** Schema/rule INFERENCE — the inverse of the validator: profile a corpus
  * and propose the rule set it already satisfies, as a bootstrap for tables
  * that have data but no schema yet. The reference ships the forward
  * direction only (a hand-written schema validates documents,
  * `/root/reference/src/ys.rs`); inference closes the loop: `infer` then
  * `Validate` over the same corpus yields zero violations by construction
  * (the closure property the spec asserts), and any NEW row that breaks the
  * observed envelope surfaces as a violation.
  *
  * What is inferred per column (conservative — only keywords the data
  * proves): `type` from the Spark schema (long→integer, double→number,
  * string→string, boolean→boolean); `required` when the column has no
  * nulls; `minimum`/`maximum` for numerics; `minLength`/`maxLength`
  * (Unicode scalar count) for strings; `enum` when the exact distinct
  * count is ≤ `enumMaxDistinct`. Formats/patterns are deliberately NOT
  * guessed (a 500-row corpus matching `^src[0-9]$` proves nothing about
  * row 501 — the user promotes observations to constraints, not the
  * profiler).
  *
  * Scale shape: pass 1 is ONE full-scan aggregation (counts, bounds,
  * exact distinct counts — all map-side combined). Pass 2 collects enum
  * VALUE sets only for the columns pass 1 qualified (distinct ≤ k), so
  * every `collect_set` is bounded by k elements per column — no
  * unbounded driver collect ever happens; columns that fail the
  * cardinality gate are never collected at all.
  */
object Inference {

  private def jsonType(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("integer")
    case FloatType | DoubleType | _: DecimalType => Some("number")
    case StringType => Some("string")
    case BooleanType => Some("boolean")
    case _ => None
  }

  /** Long-exact rendering of a numeric bound (whole doubles print as
    * integers, matching the engine's message rendering rules).
    */
  private def num(d: Double): String = graft.rules.Num.fmt(d)

  /** Escape a string for a double-quoted YAML scalar: backslash, quote and
    * control characters must not pass through bare, or a corpus value like
    * `he said "hi"\n` would render malformed YAML and break the documented
    * loadString round-trip (inference output must always re-load).
    */
  private[operators] def yamlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '"' => sb ++= "\\\""
      case '\n' => sb ++= "\\n"
      case '\t' => sb ++= "\\t"
      case '\r' => sb ++= "\\r"
      case c if c < 0x20 || c == 0x7f => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb.result()
  }

  private case class ColProfile(name: String, jtype: String, required: Boolean,
      lo: Option[Double], hi: Option[Double],
      minLen: Option[Long], maxLen: Option[Long],
      distinct: Long, enumVals: Option[Seq[String]])

  /** The two-pass profile (driver-side result is one small struct per
    * column). `columns` defaults to every atomic column.
    */
  private def profile(df: DataFrame, columns: Seq[String],
      enumMaxDistinct: Int): Seq[ColProfile] = {
    val fields = df.schema.fields.filter(f => jsonType(f.dataType).isDefined)
      .filter(f => columns.isEmpty || columns.contains(f.name))
    require(fields.nonEmpty, "infer: no atomic columns to profile")
    val aggs = fields.flatMap { f =>
      val v = col(f.name)
      val base = Seq(
        count(v).as(s"${f.name}__cnt"),
        count_distinct(v).as(s"${f.name}__dst"))
      val typed = f.dataType match {
        case StringType => Seq(
          min(length(v)).cast(LongType).as(s"${f.name}__lo"),
          max(length(v)).cast(LongType).as(s"${f.name}__hi"))
        case BooleanType => Seq( // no numeric bounds (ANSI forbids the cast)
          lit(null).cast(DoubleType).as(s"${f.name}__lo"),
          lit(null).cast(DoubleType).as(s"${f.name}__hi"))
        case _ => Seq(
          min(v).cast(DoubleType).as(s"${f.name}__lo"),
          max(v).cast(DoubleType).as(s"${f.name}__hi"))
      }
      base ++ typed
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getAs[Long]("__total")
    val enumCols = fields.filter { f =>
      f.dataType == StringType &&
        row.getAs[Long](s"${f.name}__dst") <= enumMaxDistinct &&
        row.getAs[Long](s"${f.name}__dst") > 0
    }
    // pass 2: value sets ONLY for qualifying columns — each bounded by k
    val enumSets: Map[String, Seq[String]] =
      if (enumCols.isEmpty) Map.empty
      else {
        val eAggs = enumCols.map(f =>
          sort_array(collect_set(col(f.name))).as(f.name))
        val eRow = df.agg(eAggs.head, eAggs.tail: _*).collect()(0)
        enumCols.map(f =>
          f.name -> eRow.getAs[scala.collection.Seq[String]](f.name).toSeq).toMap
      }
    fields.toSeq.map { f =>
      val cnt = row.getAs[Long](s"${f.name}__cnt")
      val isStr = f.dataType == StringType
      ColProfile(
        name = f.name,
        jtype = jsonType(f.dataType).get,
        required = cnt == total && total > 0,
        lo = if (isStr || f.dataType == BooleanType || cnt == 0) None
          else Some(row.getAs[Double](s"${f.name}__lo")),
        hi = if (isStr || f.dataType == BooleanType || cnt == 0) None
          else Some(row.getAs[Double](s"${f.name}__hi")),
        minLen = if (isStr && cnt > 0) Some(row.getAs[Long](s"${f.name}__lo")) else None,
        maxLen = if (isStr && cnt > 0) Some(row.getAs[Long](s"${f.name}__hi")) else None,
        distinct = row.getAs[Long](s"${f.name}__dst"),
        enumVals = enumSets.get(f.name))
    }
  }

  /** Inferred keywords as ROWS (column, keyword, value) — the report form
    * (and the driver-oracle form: every value is reproducible in SQL).
    * Keyword order per column: type, required?, enum?, bounds/lengths.
    */
  def inferKeywords(df: DataFrame, columns: Seq[String] = Nil,
      enumMaxDistinct: Int = 8): DataFrame = {
    val rows = profile(df, columns, enumMaxDistinct).flatMap { p =>
      val b = Seq.newBuilder[(String, String, String)]
      b += ((p.name, "type", p.jtype))
      if (p.required) b += ((p.name, "required", "true"))
      p.enumVals.foreach { vs =>
        b += ((p.name, "enum",
          vs.map(v => "\"" + yamlEscape(v) + "\"").mkString("[", ", ", "]")))
      }
      p.lo.foreach(v => b += ((p.name, "minimum", num(v))))
      p.hi.foreach(v => b += ((p.name, "maximum", num(v))))
      p.minLen.foreach(v => b += ((p.name, "minLength", v.toString)))
      p.maxLen.foreach(v => b += ((p.name, "maxLength", v.toString)))
      b.result()
    }
    import df.sparkSession.implicits._
    rows.toDF("column", "keyword", "value").orderBy("column", "keyword")
  }

  /** The inferred rule as the engine's own [[Rule]] — directly
    * compilable; `Validate.withViolations(df, inferRule(df))` passes every
    * row of `df` by construction.
    */
  def inferRule(df: DataFrame, columns: Seq[String] = Nil,
      enumMaxDistinct: Int = 8): Rule = {
    val ps = profile(df, columns, enumMaxDistinct)
    val props = ps.map { p =>
      val kw = Keywords(
        types = Some(List(p.jtype)),
        enum_ = p.enumVals.map(_.toList.map(ConstVal.VStr(_))),
        minimum = p.lo, maximum = p.hi,
        minLength = p.minLen.map(_.toInt), maxLength = p.maxLen.map(_.toInt))
      p.name -> (Rule.Check(kw): Rule)
    }.toMap
    Rule.Check(Keywords(properties = props,
      required = ps.filter(_.required).map(_.name).toList))
  }

  /** Render an inferred rule as a YAML schema document the engine's own
    * loader round-trips (`RuleLoader.loadString(toYaml(r))` compiles to
    * the same checks). Covers the inference subset: type, enum, numeric
    * bounds, length bounds, required, one level of properties.
    */
  def toYaml(rule: Rule): String = rule match {
    case Rule.Check(kw) =>
      val sb = new StringBuilder("type: object\n")
      if (kw.required.nonEmpty)
        sb ++= kw.required.map(r => s"  - $r").mkString("required:\n", "\n", "\n")
      if (kw.properties.nonEmpty) {
        sb ++= "properties:\n"
        kw.properties.toSeq.sortBy(_._1).foreach { case (name, r) =>
          sb ++= s"  $name:\n"
          r match {
            case Rule.Check(k) =>
              k.types.foreach(ts => sb ++= s"    type: ${ts.head}\n")
              k.enum_.foreach { vs =>
                sb ++= "    enum:\n"
                vs.foreach {
                  case ConstVal.VStr(s) => sb ++= s"      - \"${yamlEscape(s)}\"\n"
                  case other => sb ++= s"      - ${ConstVal.render(other)}\n"
                }
              }
              k.minimum.foreach(v => sb ++= s"    minimum: ${num(v)}\n")
              k.maximum.foreach(v => sb ++= s"    maximum: ${num(v)}\n")
              k.minLength.foreach(v => sb ++= s"    minLength: $v\n")
              k.maxLength.foreach(v => sb ++= s"    maxLength: $v\n")
            case _ => ()
          }
        }
      }
      sb.result()
    case _ => throw new IllegalArgumentException(
      "toYaml renders inferred Check rules only")
  }

  /** Rule-bound RELAXATION suggestions — "repair the schema, not the
    * data": for each declared numeric bound, how many rows fall below /
    * above it, the observed corpus extremes, and the bound that would
    * make the rule pass (declared if it already does, the observed
    * extreme otherwise). [[graft.operators.Validate.ruleCoverage]] says a
    * bound rule is firing; this says what to change it TO — the triage
    * for "the schema is stale, not the data broken" (a new upstream
    * legitimately shipping values past a bound written last year).
    *
    * Each entry: (rule, column, declaredMin, declaredMax). Nulls never
    * count (consistent with keyword rules' absent-passes contract —
    * bounds constrain present values).
    *
    * Scale: ONE aggregation scan (conditional sums + min/max per entry),
    * folded map-side to a single row, exploded to entries-sized output.
    */
  def boundSuggestions(df: DataFrame,
      bounds: Seq[(String, String, Option[Double], Option[Double])])
      : DataFrame = {
    require(bounds.nonEmpty, "boundSuggestions: no bounds")
    require(bounds.forall(b => b._3.nonEmpty || b._4.nonEmpty),
      "boundSuggestions: each entry needs a declared min or max")
    val aggs = bounds.zipWithIndex.flatMap { case ((_, c, lo, hi), i) =>
      val v = col(c).cast("double")
      Seq(
        sum(when(lo.map(v < _).getOrElse(lit(false)), 1L).otherwise(0L))
          .as(s"_b$i"),
        sum(when(hi.map(v > _).getOrElse(lit(false)), 1L).otherwise(0L))
          .as(s"_a$i"),
        min(v).as(s"_mn$i"), max(v).as(s"_mx$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(bounds.zipWithIndex.map {
        case ((name, c, lo, hi), i) =>
          struct(lit(name).as("rule"), lit(c).as("col_name"),
            lo.map(lit(_)).getOrElse(lit(null).cast("double"))
              .as("declared_min"),
            hi.map(lit(_)).getOrElse(lit(null).cast("double"))
              .as("declared_max"),
            coalesce(col(s"_b$i"), lit(0L)).as("n_below"),
            coalesce(col(s"_a$i"), lit(0L)).as("n_above"),
            col(s"_mn$i").as("obs_min"), col(s"_mx$i").as("obs_max"))
      }: _*)).as("m"))
      .select(col("m.rule").as("rule"), col("m.col_name").as("col_name"),
        col("m.declared_min").as("declared_min"),
        col("m.declared_max").as("declared_max"),
        col("m.n_below").as("n_below"), col("m.n_above").as("n_above"),
        col("m.obs_min").as("obs_min"), col("m.obs_max").as("obs_max"),
        when(col("m.n_below") > 0, col("m.obs_min"))
          .otherwise(col("m.declared_min")).as("suggested_min"),
        when(col("m.n_above") > 0, col("m.obs_max"))
          .otherwise(col("m.declared_max")).as("suggested_max"))
  }

  /** Undeclared-property discovery over a JSON column: which keys
    * ride along in a semi-structured column UNDECLARED by the schema, how
    * many documents carry each. Catches upstream producers quietly adding
    * fields before anyone writes a rule for them (the moment to decide
    * validate-or-strip). Invalid JSON contributes no KEYS
    * (`json_object_keys` yields null → explode drops the row) but still
    * COUNTS in the denominator: `doc_share` is per non-null-STRING
    * document, so a feed half-full of malformed JSON shows every prop at
    * ≤ 50% share — deliberately, since the share answers "how much of the
    * feed carries this field", not "how much of the parseable subset".
    *
    * Scale: one scan (keys explode inside the scan stage, declared-key
    * filter BEFORE the shuffle), map-side-combined groupBy on the
    * undeclared key names, broadcast 1-row total.
    */
  def undeclaredProps(df: DataFrame, jsonCol: String,
      declared: Seq[String]): DataFrame = {
    val nonNull = df.filter(col(jsonCol).isNotNull)
    val total = nonNull.agg(count(lit(1)).as("_docs"))
    nonNull
      .select(explode(json_object_keys(col(jsonCol))).as("prop"))
      .filter(!col("prop").isin(declared: _*))
      .groupBy(col("prop")).agg(count(lit(1)).as("n_docs"))
      .join(broadcast(total))
      .select(col("prop"), col("n_docs"),
        round(col("n_docs").cast("double") / col("_docs"), 6)
          .as("doc_share"))
  }
}
