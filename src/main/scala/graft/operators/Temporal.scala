package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operators don't express directly:
  * the as-of join (each left row picks the LATEST right row at-or-before
  * its timestamp, per key) and the interval range join (each point row
  * finds the interval(s) containing it). Both are staples of event/feature
  * pipelines — "what was the user's plan when this event fired", "which
  * maintenance window does this reading fall into" — and both degenerate
  * to disasters when written naively (an inequality theta-join is a
  * cartesian product per key). No reference analogue (single-document
  * validator); DuckDB's native `ASOF JOIN` serves as the independent
  * oracle.
  *
  * Scale notes:
  *   - [[asofJoin]] is the union-sort form: tag both sides, ONE shuffle on
  *     the key, ONE sort by (time, side), and a running `last(_, ignoreNulls)`
  *     carries each right row's payload forward to the left rows that
  *     follow it. Cost = sort-merge-join cost without the join; no
  *     per-key backtracking, no range explosion. Skew caveat: a single
  *     key with 10^8 rows is one task's sort — pre-split such keys by
  *     time-chunk first (the chunked form below) if the key histogram
  *     says so.
  *   - [[rangeJoin]] chunks TIME, not keys: intervals explode into the
  *     fixed-width chunks they overlap (an interval touching c chunks
  *     emits c rows — bounded by duration/chunk), points map to exactly
  *     one chunk, and the equi-join on (key, chunk) makes the inequality
  *     a residual filter instead of a join condition. Chunk width is the
  *     knob: ~median interval length keeps the explosion factor ≈ 2.
  */
object Temporal {

  /** As-of join: every row of `left` gains `rightVals` from the latest
    * `right` row with the same `key` and `right.timeCol <= left.timeCol`
    * (inclusive — a right row AT the left timestamp matches, like DuckDB
    * `ASOF JOIN ... ON l.t >= r.t`). Left rows with no prior right row
    * keep nulls (left-outer semantics). `tieBreak` orders right rows that
    * share (key, time): the one sorting LAST wins, so pass e.g.
    * `col("event_id")` to make the max-id row authoritative —
    * deterministic where a naive implementation is engine-arbitrary.
    *
    * One Exchange on `key`, one Sort by (time, side, tiebreak) — the
    * minimum any time-ordered join can do.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVals: Seq[String],
      tieBreak: Column = lit(0)): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows sort BEFORE a left row at the same timestamp (side 0 < 1)
    // so the inclusive <= semantics fall out of the running last().
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
    val taggedRight = right
      .select((key +: rightTime +: rightVals.distinct.filterNot(v => v == key || v == rightTime))
        .map(col): _*)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_tie", tieBreak.cast("long"))
    // align schemas: left side carries null right-payload, right side null left-payload
    val rightPayload = rightVals.distinct
    val unioned = {
      val l = leftCols.map(col) ++
        rightPayload.map(v => lit(null).cast(taggedRight.schema(v).dataType).as(s"_r_$v"))
      val r = leftCols.map(c => lit(null).cast(taggedLeft.schema(c).dataType).as(c)) ++
        rightPayload.map(v => col(v).as(s"_r_$v"))
      taggedLeft.select(l ++ Seq(col(key).as("_k"), col("_t"), col("_side"), col("_tie")): _*)
        .unionByName(
          taggedRight.select(r ++ Seq(col(key).as("_k"), col("_t"), col("_side"), col("_tie")): _*))
    }
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one running last() per right column; ignoreNulls skips the left rows'
    // null payloads, so each left row sees the most recent right payload.
    // A right payload that is LEGITIMATELY null would be skipped too, so
    // carry the payload as one struct (non-null per right row by construction).
    val packed = struct(rightPayload.map(v => col(s"_r_$v").as(v)): _*)
    val withState = unioned
      .withColumn("_rstruct", when(col("_side") === 0, packed))
      .withColumn("_asof", last(col("_rstruct"), ignoreNulls = true).over(w))
    withState
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(v => col(s"_asof.$v").as(s"asof_$v")): _*)
  }

  /** Sequence-ordering audit: rows whose `tsCol` runs BACKWARD against the
    * running maximum over `seqCol` order within a key — the event-level
    * twin of the span-offset invariant ("event ids were assigned in time
    * order; where does the stream disagree?"). Output: the violating rows
    * (key, seq, ts, prev_max_ts), |violations|-sized.
    *
    * One Window per key (running max over the seq order, exclusive of the
    * current row): partition-bounded sort, same skew caveat as
    * [[asofJoin]] for single mega-keys.
    */
  def orderViolations(df: DataFrame, keyCol: String, seqCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol), col(seqCol), col(tsCol))
      .withColumn("prev_max_ts", max(col(tsCol)).over(w))
      .filter(col(tsCol) < col("prev_max_ts"))
  }

  /** Interval range join: `points` (with `pointTime`) against `intervals`
    * (with `startCol` inclusive, `endCol` exclusive), both keyed by `key`.
    * Returns every point row joined to each containing interval's
    * `intervalVals` (inner semantics — uncovered points drop; wrap with a
    * left anti-join for coverage audits). `chunk` is the time-chunk width
    * in the same units as the time columns.
    *
    * The equi-join key is (key, floor(t / chunk)); intervals emit one row
    * per chunk they overlap via an in-plan `sequence()` explode — never a
    * driver loop, never a theta-join.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String,
      intervalVals: Seq[String], chunk: Long): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    val ivals = intervals.select(
      (key +: startCol +: endCol +: intervalVals.distinct
        .filterNot(v => v == key || v == startCol || v == endCol)).map(col): _*)
    // end is exclusive: an interval [s, e) overlaps chunks floor(s/c)..floor((e-1)/c)
    val exploded = ivals
      .filter(col(endCol) > col(startCol))
      .withColumn("_chunk",
        explode(sequence(floor(col(startCol) / chunk),
          floor((col(endCol) - 1) / chunk))))
    val pts = points
      .withColumn("_chunk", floor(col(pointTime) / chunk))
    pts.join(exploded, Seq(key, "_chunk"))
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("_chunk")
  }

  /** First-order state-transition matrix over per-key event sequences:
    * for each (state, next-state) pair, its count and the row-conditional
    * probability P(next | state) — the behavioral fingerprint that feeds
    * funnel design, bot detection (machine traffic has near-deterministic
    * rows) and session simulation. The terminal event of each key has no
    * successor and contributes nothing (standard Markov-estimate
    * contract).
    *
    * Scale: ONE per-key window (lead over the key's sequence order —
    * partition-bounded, the [[orderViolations]] shape), then a map-side-
    * combined groupBy to the ≤ |states|² matrix; the probability
    * normalization is a window over the MATRIX-sized table, never the
    * corpus.
    */
  def transitions(df: DataFrame, keyCol: String, seqCol: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val wFrom = Window.partitionBy(col("from_state"))
    df.select(col(keyCol), col(seqCol), col(stateCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") / sum(col("n")).over(wFrom), 6))
  }
}
