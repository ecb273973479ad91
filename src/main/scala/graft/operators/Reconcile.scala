package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregate-level reconciliation between two pipelines of the same fact:
  * per-group row counts and measure sums, compared side by side, emitting
  * ONLY the groups that disagree.
  *
  * This is the cheap first-line version-vs-version / source-vs-replica
  * audit: [[Diff]] answers "WHICH rows changed" with an id-level
  * full-outer join (corpus-sized work); reconcile answers "DID anything
  * change, and roughly where" with two independent aggregation scans
  * whose outputs are group-count-sized — at 10^12 docs that is the
  * difference between a full shuffle and two map-side-combined groupBys
  * plus a join of two tiny summaries. The reference has no multi-run
  * notion at all (one process = one validation, `ys.rs:215-243`);
  * reconciliation is what its verdicts become when runs repeat.
  *
  * Numeric contract: measures are summed EXACTLY as given — pass DECIMAL
  * columns (not doubles) when cross-engine bit-equality matters; float
  * sums are order-dependent and will false-positive at tight tolerances.
  *
  * 100 TB shape: one scan per side with partial aggregation (shuffle mass
  * = #groups × #measures, not rows); the two summaries join on the group
  * key — broadcastable whenever #groups is bounded, which is the point of
  * reconciling at group grain. Output mass ∝ disagreeing groups.
  */
object Reconcile {

  /** Per-group (count + per-measure sum) summary of one side. */
  private def summarize(df: DataFrame, keys: Seq[String],
      measures: Seq[String], side: String): DataFrame = {
    val aggs = count(lit(1)).as(s"rows_$side") +:
      measures.map(m => sum(col(m)).as(s"${m}_$side"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Groups where the two sides disagree on row count or any measure sum
    * (beyond `tol`). Output: keys, rows_left, rows_right, then
    * `<m>_left`, `<m>_right` per measure — a group missing from one side
    * keeps nulls on that side (and always disagrees).
    */
  def aggregates(left: DataFrame, right: DataFrame, keys: Seq[String],
      measures: Seq[String], tol: Double = 0.0): DataFrame = {
    require(keys.nonEmpty, "reconcile: no group keys")
    val l = summarize(left, keys, measures, "left")
    val r = summarize(right, keys, measures, "right")
    val joined = l.join(r, keys, "full_outer")
    def measureDiffers(m: String): Column = {
      val (a, b) = (col(s"${m}_left"), col(s"${m}_right"))
      if (tol == 0.0) !(a <=> b)
      else when(a.isNull || b.isNull, !(a <=> b))
        .otherwise(abs(a - b) > lit(tol))
    }
    val differs = measures.map(measureDiffers)
      .foldLeft(!(col("rows_left") <=> col("rows_right")))(_ || _)
    joined.filter(differs)
  }
}
