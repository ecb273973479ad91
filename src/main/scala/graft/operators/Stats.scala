package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column statistics profiling (north rule: "per-column stats
  * (min/max/null-rate/cardinality via approx_count_distinct and HyperLogLog
  * sketches)"). The reference validates one value at a time and has no stats
  * operator (SURVEY.md §2.7); this is the set-at-a-time capability layered on
  * top.
  *
  * One full-scan aggregation computes every column's stats in a single job
  * (no per-column passes); HLL sketches (`hll_sketch_agg`, Spark ≥ 3.5 /
  * 4.x, Apache DataSketches under the hood) are mergeable across partitions
  * — at cluster scale the per-partition sketches combine on the reducer
  * without ever materializing distinct values.
  */
object Stats {

  /** One output row per profiled column:
    * (column, non_null_count, null_rate, min, max, approx_distinct,
    * hll_distinct). min/max rendered as strings for schema uniformity.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.schema.fields.collect {
      case f if isProfilable(f.dataType) => f.name
    }.toSeq
    require(cols.nonEmpty,
      "profile: no profilable (atomic-typed) columns — an empty stack() " +
        "would fail to parse; pass `columns` explicitly or project first")
    // the melt below builds SQL text; names with quote/backtick metachars
    // would corrupt it, so fail with a clear message instead
    cols.find(c => c.contains("'") || c.contains("`")).foreach { bad =>
      throw new IllegalArgumentException(
        s"profile: column name '$bad' contains a quote/backtick — rename or alias it")
    }
    val total = count(lit(1))
    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(v).as(s"${c}__cnt"),
        min(v).cast(StringType).as(s"${c}__min"),
        max(v).cast(StringType).as(s"${c}__max"),
        approx_count_distinct(v).as(s"${c}__acd"),
        hll_sketch_estimate(hll_sketch_agg(v.cast(StringType))).as(s"${c}__hll"))
    } :+ total.as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)

    // melt the single wide row into one row per column (tiny: done with a
    // stack expression, still one Spark job end-to-end)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__cnt`, `${c}__min`, `${c}__max`, `${c}__acd`, `${c}__hll`"
    }.mkString(", ")
    row.select(
      expr(s"stack(${cols.size}, $stackArgs) as " +
        "(column, non_null_count, min, max, approx_distinct, hll_distinct)"),
      col("__total"))
      .select(
        col("column"), col("non_null_count"),
        round(lit(1.0) - col("non_null_count") / col("__total"), 6).as("null_rate"),
        col("min"), col("max"), col("approx_distinct"), col("hll_distinct"))
  }

  private def isProfilable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType | TimestampType => true
    case _ => false
  }

  /** Per-day COMPLETENESS (null-rate) trend for a set of columns — the
    * continuous-monitoring form of [[profile]]'s null_rate (the classic
    * "completeness" data-quality check over event time: which day did the
    * producer start dropping a field?). One map-side-combined groupBy on
    * the day with each column's non-null count as a conditional sum in
    * the SAME pass (never a per-column scan), then a tiny `stack()` melt
    * to long form (day, column, n_rows, n_null, null_rate). Shuffle mass
    * = days × columns. All counts are exact integers; the rate is one
    * long/long division — bit-identical in any engine, so no rounding.
    */
  def completenessTrend(df: DataFrame, columns: Seq[String],
      tsCol: String): DataFrame = {
    require(columns.nonEmpty, "completenessTrend: no columns")
    columns.find(c => c.contains("'") || c.contains("`")).foreach { bad =>
      throw new IllegalArgumentException(
        s"completenessTrend: column name '$bad' contains a quote/backtick — rename or alias it")
    }
    val aggs: Seq[Column] =
      columns.map(c => count(col(c)).as(s"${c}__cnt")) :+ count(lit(1)).as("__n")
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.map(c => s"'$c', `${c}__cnt`").mkString(", ")
    daily.select(col("day"), col("__n"),
        expr(s"stack(${columns.size}, $stackArgs) as (column, __cnt)"))
      .select(col("day"), col("column"), col("__n").as("n_rows"),
        (col("__n") - col("__cnt")).as("n_null"),
        ((col("__n") - col("__cnt")) / col("__n")).as("null_rate"))
  }

  /** Mergeable per-partition HLL sketches for a column: one binary sketch
    * per `part`, union-able later with `hll_union_agg` — the building block
    * for incremental/resumable cardinality at 10^12 docs.
    */
  def partitionSketches(df: DataFrame, column: String, partCol: String = "part"): DataFrame =
    df.groupBy(col(partCol))
      .agg(hll_sketch_agg(col(column).cast(StringType)).as("sketch"),
        count(lit(1)).as("rows"))

  /** Union previously materialized per-partition sketches into a global
    * distinct-count estimate.
    */
  def unionSketches(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_estimate"),
      sum(col("rows")).as("rows"))

  /** Hot-key diagnosis: the top-k heaviest values of `keyCol` with their
    * multiplicity, skew ratio vs the mean key frequency, and the salt
    * fan-out the two-phase aggregations ([[Uniqueness]]'s salted groupBy,
    * AQE's skew-join split) would need to level them.
    *
    * Why it exists: at 10^12 docs a single viral `media_ref` (or a default
    * `doc_id` from a buggy producer) concentrates billions of rows on one
    * reducer; every skew mitigation in this engine (salting factor, AQE
    * advisory partition size) is parameterized by exactly the numbers this
    * report produces. The reference validates one document at a time and
    * has no analogue (SURVEY.md §2.7 "grouping" row is the closest).
    *
    * Plan: one map-side-combined groupBy on the key (the only shuffle,
    * carrying one (key, count) row per distinct key per mapper), then a
    * TakeOrdered top-k — no Window, no global sort. `recommended_salt` =
    * ceil(count / targetRowsPerTask), floored at 1.
    */
  /** Functional-dependency audit: determinant values that map to MORE than
    * one dependent value — the violation report for an expected
    * `det → dep` dependency (producer id → schema version, media_ref →
    * mime, source → language). Output (det, n_values, n_rows) for
    * violating determinants only.
    *
    * One map-side-combined groupBy on the determinant; the two-phase
    * count_distinct never materializes value lists. At 10^12 rows the
    * shuffle carries one row per distinct (det, dep) pair after partial
    * aggregation — dependency audits are cheap exactly when the dependency
    * mostly holds.
    */
  def fdViolations(df: DataFrame, detCol: String, depCol: String): DataFrame =
    df.filter(col(detCol).isNotNull)
      .groupBy(col(detCol).as("det"))
      .agg(count_distinct(col(depCol)).as("n_values"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_values") > 1)
      .orderBy("det")

  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      targetRowsPerTask: Long): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    // mean frequency = total rows / distinct keys, computed from the SAME
    // aggregate (one extra tiny reduction, not a second scan of df)
    val tot = counts.agg(sum(col("cnt")).as("t"), count(lit(1)).as("d"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        round(col("cnt") / (col("t") / col("d")), 4).as("skew_ratio"),
        greatest(lit(1L), ceil(col("cnt") / lit(targetRowsPerTask)))
          .cast(LongType).as("recommended_salt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
  }
}
