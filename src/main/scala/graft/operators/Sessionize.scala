package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props): gap-based
  * sessionization, tumbling-window verdicts, and JSON-props extraction —
  * the event-side capabilities a training-data pipeline needs next to the
  * document validators. No reference analogue (single-document validator);
  * the windowed-verdict form is the batch twin of
  * `streaming/StreamValidate.windowedVerdicts`.
  *
  * Scale notes:
  *   - sessionization needs per-user ordering, but a Window partitioned by
  *     user alone is UNBOUNDED: one bot emitting 10^8 events becomes a
  *     single task's sort. The Window here partitions by (user, day) —
  *     bounded by one user-day — and sessions are stitched across day
  *     edges with a second Window over the per-(user, day) SUMMARY (one
  *     row per user-day, thousands of rows per user-year, never raw
  *     events). Output is identical to the single-Window form.
  *   - tumbling windows lower to `window()` = a groupBy on
  *     floor(ts/slide) — map-side combined, no sort.
  */
object Sessionize {

  /** Gap-based sessionization: a user's event starts a NEW session when it
    * is more than `gapMinutes` after their previous event. Adds
    * `session_index` (0-based per user).
    *
    * Hot-user-safe plan (see object scaladoc): the event-level Window sorts
    * within (user, day) buckets only; a per-bucket summary (first/last ts,
    * local session count) is stitched with a tiny Window over user and
    * joined back, shifting each bucket's local indices to global ones.
    * A bucket whose first event is within the gap of the previous bucket's
    * last event CONTINUES that session (its local session 0 merges), so
    * day edges never split or renumber sessions.
    */
  private def gapInterval(gapMinutes: Int): Column =
    // interval comparison works for both TIMESTAMP and TIMESTAMP_NTZ (a
    // cast-to-long epoch diff is rejected for NTZ under ANSI)
    expr(s"INTERVAL $gapMinutes MINUTES")

  /** ONE window spec (over the materialized _bucket column) for the
    * bucket-local lag AND the running sum — partitioning by the
    * date_trunc EXPRESSION in one and the _bucket ATTRIBUTE in the other
    * would be semantically identical but not syntactically equal, so
    * CollapseWindow could not merge them and the event table would sort
    * twice (PlanSpec asserts the merge: one Window node on the event
    * side).
    */
  private def byBucket(userCol: String, tsCol: String) =
    Window.partitionBy(col(userCol), col("_bucket")).orderBy(col(tsCol))

  /** Events + (_bucket, _new_local): the bucket-local new-session flag
    * from one lag over [[byBucket]].
    */
  private def withNewFlag(df: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    val prev = lag(col(tsCol), 1).over(byBucket(userCol, tsCol))
    df.withColumn("_bucket", date_trunc("DAY", col(tsCol)))
      .withColumn("_new_local",
        when(prev.isNull || col(tsCol) > prev + gapInterval(gapMinutes), 1L)
          .otherwise(0L))
  }

  /** Per-(user, day) stitched summary — ONE row per bucket (the only
    * thing the cross-bucket Window ever sorts): _n_local local sessions,
    * _n_events, _stitch (1 when the bucket's first event continues the
    * previous bucket's last session), _contrib = sessions this bucket
    * adds globally, _cum_before = global sessions before this bucket.
    * Both byUser window functions (the lag and the running sum) share one
    * spec, so they too collapse to a single sort of the summary.
    */
  private def stitchedSummary(flagged: DataFrame, userCol: String,
      tsCol: String, gapMinutes: Int): DataFrame = {
    val summary = flagged.groupBy(col(userCol), col("_bucket"))
      .agg(min(col(tsCol)).as("_first_ts"), max(col(tsCol)).as("_last_ts"),
        sum(col("_new_local")).as("_n_local"),
        count(lit(1)).as("_n_events"))
    val byUser = Window.partitionBy(col(userCol)).orderBy(col("_bucket"))
    val prevLast = lag(col("_last_ts"), 1).over(byUser)
    summary
      .withColumn("_stitch",
        when(prevLast.isNotNull &&
          col("_first_ts") <= prevLast + gapInterval(gapMinutes), 1L)
          .otherwise(0L))
      // sessions this bucket ADDS globally (a stitched first session merges
      // into the previous bucket's last session)
      .withColumn("_contrib", col("_n_local") - col("_stitch"))
      .withColumn("_cum_before",
        coalesce(sum(col("_contrib")).over(
          byUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
  }

  def withSessions(df: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30): DataFrame = {
    val flagged = withNewFlag(df, userCol, tsCol, gapMinutes)
    val withLocal = flagged.withColumn("_local_idx",
      sum(col("_new_local")).over(byBucket(userCol, tsCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)

    // NULL-SAFE stitch join (<=> on both keys): a null timestamp makes
    // `_bucket` null and a Seq-join's EqualTo would silently drop those
    // rows — the single-Window form kept them (each null-ts row its own
    // session, nulls-first), and null users form a group of their own the
    // same way. The summary side is one row per (user, day) — orders of
    // magnitude below the event table — so size-based planning broadcasts
    // it in any normal run and the window-sorted event side needs no
    // second exchange; there is deliberately NO mandatory broadcast()
    // hint: summary cardinality is users × days, which a planet-scale
    // slice can push past the broadcast hard limit, and a forced hint
    // would then OOM the driver where a shuffle join just works.
    val st = stitchedSummary(flagged, userCol, tsCol, gapMinutes)
      .select(col(userCol), col("_bucket"), col("_stitch"), col("_cum_before"))
      .withColumnRenamed(userCol, "_st_user").withColumnRenamed("_bucket", "_st_bucket")
    withLocal
      .join(st,
        col(userCol) <=> col("_st_user") && col("_bucket") <=> col("_st_bucket"))
      .withColumn("session_index",
        col("_cum_before") - col("_stitch") + col("_local_idx"))
      .drop("_st_user", "_st_bucket", "_bucket", "_new_local", "_local_idx",
        "_stitch", "_cum_before")
  }

  /** Per-user session stats: sessions, events, events per session.
    *
    * Computed from the stitched SUMMARY alone — n_sessions = Σ _contrib,
    * n_events = Σ _n_events — so unlike [[withSessions]] there is no
    * join back to the event table and no per-event running sum: one
    * bucket-bounded lag over the events, one summary aggregation, two
    * collapsed summary-sized windows, one final groupBy. Identical output
    * to aggregating withSessions (max(session_index)+1 ≡ Σ contrib).
    */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30): DataFrame =
    stitchedSummary(withNewFlag(df, userCol, tsCol, gapMinutes),
      userCol, tsCol, gapMinutes)
      .groupBy(col(userCol))
      .agg(sum(col("_contrib")).as("n_sessions"),
        sum(col("_n_events")).as("n_events"))

  /** Tumbling-window verdicts: per (window start, group) event count and
    * failed count under `failPred` — the batch form of the streaming
    * windowed verdicts.
    */
  def windowVerdicts(df: DataFrame, tsCol: String, groupCol: String,
      failPred: Column, windowLen: String = "1 hour"): DataFrame =
    df.groupBy(window(col(tsCol), windowLen).getField("start").as("window_start"),
      col(groupCol))
      .agg(count(lit(1)).as("events"),
        sum(when(failPred, 1L).otherwise(0L)).as("failed"))
}
