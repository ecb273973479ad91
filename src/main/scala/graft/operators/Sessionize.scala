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
  *   - sessionization partitions by USER and sorts within user only — the
  *     per-user event list is small, so this is the one legitimate Window
  *     use (the semantics ARE per-user ordering); skewed power-users are
  *     bounded by the gap rule itself (sessions don't span users).
  *   - tumbling windows lower to `window()` = a groupBy on
  *     floor(ts/slide) — map-side combined, no sort.
  */
object Sessionize {

  /** Gap-based sessionization: a user's event starts a NEW session when it
    * is more than `gapMinutes` after their previous event. Adds
    * `session_index` (0-based per user).
    */
  def withSessions(df: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(byUser)
    // interval comparison works for both TIMESTAMP and TIMESTAMP_NTZ (a
    // cast-to-long epoch diff is rejected for NTZ under ANSI)
    val isNew = when(prev.isNull ||
      col(tsCol) > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
      .otherwise(0L)
    df.withColumn("_new_session", isNew)
      .withColumn("session_index",
        sum(col("_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("_new_session")
  }

  /** Per-user session stats: sessions, events, events per session. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30): DataFrame =
    withSessions(df, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol))
      .agg((max(col("session_index")) + 1L).as("n_sessions"),
        count(lit(1)).as("n_events"))

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
