package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema migration — the constructive twin of `Diff.schemaDiff` and the
  * enforcement sibling of `Repair`: given a target column list, cast
  * existing columns (`try_cast` semantics: a value that cannot convert
  * becomes null instead of failing the job), add missing columns with a
  * default, and drop extras. The audit reports, per column, what was done
  * and how many values a lossy cast nulled out — the number a pipeline
  * owner checks before swapping the migrated table in.
  *
  * Scale shape: the migration itself is a pure projection (scan-stage,
  * whole-stage codegen, zero shuffle); the audit is one aggregate pass
  * producing a single row of counters (one per cast column), collected to
  * the driver — bounded by column count, never row count.
  */
object Migrate {

  /** One target column: `toType` to cast to (None = keep current type),
    * `default` to fill when the column is missing from the source (a
    * present column is never overwritten by the default — migration
    * changes shape, `Repair` changes values).
    */
  final case class Target(name: String, toType: Option[DataType] = None,
      default: Option[Column] = None)

  private def castCol(df: DataFrame, t: Target): Column = {
    val cur = df.schema(t.name).dataType
    t.toType match {
      case Some(to) if to != cur => col(t.name).try_cast(to)
      case _ => col(t.name)
    }
  }

  /** The migrated frame: target columns in target order. Extra source
    * columns are dropped when `dropExtras` (the default — a migration ends
    * at exactly the target schema), kept at the end otherwise.
    */
  def migrate(df: DataFrame, targets: Seq[Target],
      dropExtras: Boolean = true): DataFrame = {
    val have = df.columns.toSet
    val cols = targets.map { t =>
      if (have(t.name)) castCol(df, t).as(t.name)
      else t.default.getOrElse(lit(null)).as(t.name)
    }
    val extras =
      if (dropExtras) Nil
      else df.columns.filterNot(c => targets.exists(_.name == c)).map(col).toSeq
    df.select(cols ++ extras: _*)
  }

  /** Per-column audit: (column, action, cast_failures) where action is
    * `cast` / `keep` / `add` / `drop` and cast_failures counts source
    * values a lossy cast turned into null (0 for every other action).
    * One aggregate job over the source; output is column-count-sized.
    */
  def audit(df: DataFrame, targets: Seq[Target],
      dropExtras: Boolean = true): DataFrame = {
    val have = df.columns.toSet
    val casted = targets.filter(t => have(t.name) &&
      t.toType.exists(_ != df.schema(t.name).dataType))
    val failCounts: Map[String, Long] =
      if (casted.isEmpty) Map.empty
      else {
        val aggs = casted.map { t =>
          sum(when(col(t.name).isNotNull && castCol(df, t).isNull, 1L)
            .otherwise(0L)).as(t.name)
        }
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        casted.zipWithIndex.map { case (t, i) =>
          t.name -> (if (r.isNullAt(i)) 0L else r.getLong(i))
        }.toMap
      }
    val targetRows = targets.map { t =>
      // action reflects the DECLARED intent (`toType` present -> cast),
      // not a comparison against the runtime source type: the same target
      // list must audit identically regardless of how an environment's
      // parquet reader materializes the source column (e.g. a writer that
      // already stored o_orderdate as DATE). A cast to the column's
      // current type is a no-op with 0 failures, still reported as `cast`.
      val action =
        if (!have(t.name)) "add"
        else if (t.toType.isDefined) "cast"
        else "keep"
      Row(t.name, action, failCounts.getOrElse(t.name, 0L))
    }
    val dropRows =
      if (dropExtras)
        df.columns.filterNot(c => targets.exists(_.name == c))
          .map(c => Row(c, "drop", 0L)).toSeq
      else Nil
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("action", StringType, nullable = false),
      StructField("cast_failures", LongType, nullable = false)))
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList((targetRows ++ dropRows): _*), schema)
  }
}
