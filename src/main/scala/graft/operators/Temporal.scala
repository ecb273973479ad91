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

  /** Hour-of-day periodicity profile with a chi-square uniformity term:
    * per hour bucket (0–23), event count, share, and the bucket's
    * contribution (O−E)²/E against the uniform expectation over the
    * PRESENT buckets — Σ chi2_term is the test statistic (df = buckets−1).
    * Organic traffic has a smooth diurnal curve; a spike concentrated in
    * one bucket is batch/bot traffic, a perfectly FLAT profile
    * (chi² ≈ 0 at large n) is synthetic data that forgot to model time.
    * Null timestamps are excluded (they carry no hour).
    *
    * Scale: one map-side-combined groupBy to ≤ 24 rows; the expectation
    * and terms are windows over the 24-row table, never the corpus.
    */
  def periodicity(df: DataFrame, timeCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    df.filter(col(timeCol).isNotNull)
      .groupBy(hour(col(timeCol)).as("hour_of_day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_exp",
        sum(col("n")).over(wAll).cast("double")
          / count(lit(1)).over(wAll))
      .select(col("hour_of_day"), col("n"),
        round(col("n") / sum(col("n")).over(wAll), 6).as("share"),
        round((col("n") - col("_exp")) * (col("n") - col("_exp"))
          / col("_exp"), 6).as("chi2_term"))
  }

  /** Per-key inter-event burstiness: over each key's time-ordered gap
    * sequence, the gap count, mean gap and population-stddev gap (integer
    * SECONDS — exact in any accumulation order via sum/sum-of-squares
    * longs), the coefficient of variation, and the Goh–Barabási
    * burstiness index B = (σ−μ)/(σ+μ): B ≈ −1 is a metronome (machine
    * heartbeat), B ≈ 0 Poisson (organic), B → 1 extreme bursts. Keys
    * with fewer than `minGaps` gaps are excluded — a one-gap CV is
    * noise, not behavior.
    *
    * Scale: one partition-bounded per-key window (lag) then a map-side-
    * combined groupBy to key-sized output; the moment sums are integer
    * longs, so the only floats are per-key finals. A key with 10^8
    * events is one task's sort — the [[asofJoin]] skew caveat applies.
    */
  /** Per-key (key, gap_s, start_s) frame: whole-second gaps between a
    * key's time-ordered events, with the epoch second each gap started.
    * ONE definition shared by [[burstiness]] and [[gapsAudit]] — it
    * carries two load-bearing choices: the NTZ-safe floored-second epoch
    * (session runs UTC; the cast preserves the wall clock; floor keeps
    * downstream moment sums exact longs), and the rename BEFORE the
    * window so consumers' groupBy("key") sees the window's
    * hashpartitioning(key) and reuses it (windowing the pre-rename
    * column would strand the partitioning on an out-of-scope attribute
    * and buy a second Exchange — PlanSpec-asserted for both consumers).
    */
  private def gapFrame(df: DataFrame, keyCol: String,
      timeCol: String): DataFrame = {
    val epochS = floor(unix_micros(col(timeCol).cast("timestamp"))
      / lit(1000000L)).cast("long")
    val base = df.filter(col(timeCol).isNotNull)
      .select(col(keyCol).as("key"), epochS.as("_ep"))
    val w = Window.partitionBy(col("key")).orderBy(col("_ep"))
    base
      .select(col("key"), lag(col("_ep"), 1).over(w).as("start_s"),
        col("_ep"))
      .filter(col("start_s").isNotNull)
      .select(col("key"), (col("_ep") - col("start_s")).as("gap_s"),
        col("start_s"))
  }

  def burstiness(df: DataFrame, keyCol: String, timeCol: String,
      minGaps: Int = 2): DataFrame = {
    gapFrame(df, keyCol, timeCol).groupBy(col("key"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("_s"),
        sum(col("gap_s") * col("gap_s")).as("_ss"))
      .filter(col("n_gaps") >= minGaps)
      .withColumn("_mean", col("_s").cast("double") / col("n_gaps"))
      .withColumn("_sd", sqrt(greatest(
        col("_ss").cast("double") / col("n_gaps") - col("_mean") * col("_mean"),
        lit(0.0))))
      .select(col("key"), col("n_gaps"),
        round(col("_mean"), 6).as("mean_gap_s"),
        round(col("_sd"), 6).as("sd_gap_s"),
        when(col("_mean") > 0, round(col("_sd") / col("_mean"), 6))
          .as("cv"),
        when(col("_sd") + col("_mean") > 0,
          round((col("_sd") - col("_mean")) / (col("_sd") + col("_mean")), 6))
          .as("burstiness"))
  }

  /** Silent-gap (downtime) audit per segment: over each segment's
    * time-ordered event sequence, the gap count, the LARGEST gap in whole
    * seconds with the epoch second it started at (ties resolve to the
    * earliest start — deterministic cross-engine), and how many gaps
    * exceed `thresholdS`. The stream-health view that turns "the feed
    * looks thin" into "feed X went dark for 6h starting at T" — and the
    * measurement that sizes retry/watermark policy before an incident
    * does. Ordering and gaps use the SAME floored-second epoch (ties
    * within a second permute freely but the sorted second-sequence — and
    * therefore every gap and its start — is unique).
    *
    * Scale: the [[burstiness]] shape — one partition-bounded per-key lag
    * window, one map-side-combined rollup to segment-sized output; the
    * argmax rides a single struct-max, no second pass.
    */
  def gapsAudit(df: DataFrame, segCol: String, timeCol: String,
      thresholdS: Long): DataFrame = {
    require(thresholdS >= 0, s"gapsAudit: need thresholdS >= 0, got $thresholdS")
    gapFrame(df, segCol, timeCol)
      .groupBy(col("key").as("segment"))
      .agg(count(lit(1)).as("n_gaps"),
        // struct max: largest gap first, then LATEST -start = earliest
        // start among equal gaps
        max(struct(col("gap_s"), (-col("start_s")).as("_ns"))).as("_m"),
        sum(when(col("gap_s") > thresholdS, 1L).otherwise(0L))
          .as("n_over"))
      .select(col("segment"), col("n_gaps"),
        col("_m.gap_s").as("max_gap_s"),
        (-col("_m._ns")).as("max_gap_start_s"), col("n_over"))
  }

  /** Lag-k autocorrelation (ACF) per key over an ordered INTEGER series —
    * the periodicity detector for arbitrary cycles ([[periodicity]] is
    * pinned to hour-of-day): r(k) = Pearson correlation of (v_t, v_{t+k})
    * for k = 1..maxLag. A weekly-cycled feed shows r(7) ≫ r(1); a
    * level-shifted one shows uniformly high r at all lags (see
    * [[graft.operators.Stats.changepoint]]).
    *
    * All moment sums are exact integer arithmetic (the series is cast to
    * long — overflow bound: n·v² must stay under 2⁶³, i.e. daily values
    * ≲ 1.5·10⁸ for a year of days); doubles appear only in each (key,
    * lag)'s final r, so results replay bit-identically cross-engine.
    * Degenerate pairs (n < 2 or zero variance on either side) → null r;
    * a null time or value excludes the observation entirely (it would
    * otherwise count in n_pairs while vanishing from the sums).
    *
    * Scale: ALL lags ride ONE Exchange+Sort — the `lead(v, k)` windows
    * share the same (key, t) partitioning/ordering, then a single
    * map-side-combined groupBy folds every lag's six sums at once and
    * explodes to (key, lag) rows. Series-sized throughout.
    */
  def autocorrelation(series: DataFrame, keyCols: Seq[String], tCol: String,
      vCol: String, maxLag: Int): DataFrame = {
    require(keyCols.nonEmpty, "autocorrelation: need key columns")
    require(maxLag >= 1, s"autocorrelation: need maxLag >= 1, got $maxLag")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_t"))
    val lags = 1 to maxLag
    val s = series
      .select(keyCols.map(col) ++ Seq(col(tCol).as("_t"),
        col(vCol).cast("long").as("_v")): _*)
      .filter(col("_t").isNotNull && col("_v").isNotNull)
      .select(keyCols.map(col) ++ (col("_v") +: lags.map(k =>
        lead(col("_v"), k).over(w).as(s"_l$k"))): _*)
    val aggs = lags.flatMap { k =>
      val l = col(s"_l$k")
      val have = l.isNotNull
      Seq(
        sum(when(have, 1L).otherwise(0L)).as(s"_n$k"),
        sum(when(have, col("_v")).otherwise(0L)).as(s"_sx$k"),
        sum(when(have, l).otherwise(0L)).as(s"_sy$k"),
        sum(when(have, col("_v") * col("_v")).otherwise(0L)).as(s"_sxx$k"),
        sum(when(have, l * l).otherwise(0L)).as(s"_syy$k"),
        sum(when(have, col("_v") * l).otherwise(0L)).as(s"_sxy$k"))
    }
    s.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keyCols.map(col) :+ explode(array(lags.map { k =>
        struct(lit(k).as("lag"), col(s"_n$k").as("n"),
          col(s"_sx$k").as("sx"), col(s"_sy$k").as("sy"),
          col(s"_sxx$k").as("sxx"), col(s"_syy$k").as("syy"),
          col(s"_sxy$k").as("sxy"))
      }: _*)).as("m"): _*)
      .select(keyCols.map(col) ++ {
        val n = col("m.n")
        val vx = n * col("m.sxx") - col("m.sx") * col("m.sx")
        val vy = n * col("m.syy") - col("m.sy") * col("m.sy")
        val cov = n * col("m.sxy") - col("m.sx") * col("m.sy")
        Seq(col("m.lag").as("lag"), n.as("n_pairs"),
          when(n >= 2L && vx > 0L && vy > 0L,
            round(cov.cast("double")
              / sqrt(vx.cast("double") * vy.cast("double")), 6)).as("r"))
      }: _*)
  }

  /** Peak concurrency per day (sweep-line): each event opens an activity
    * interval `[t, t + activeSeconds)`; the report is each day's maximum
    * number of simultaneously open intervals and the epoch second the
    * peak is FIRST reached — the capacity-planning number ([[gapsAudit]]
    * is "when was the feed dark", this is "how hot does it burn").
    *
    * Day-reset contract: intervals clip at midnight, each calendar day's
    * curve starts at 0 (a `-1` landing exactly on the day boundary is
    * emitted but can never affect that day's max — nothing follows it).
    * That is what makes the sweep partition-parallel: without the reset,
    * the running count is one global sequential scan.
    *
    * Exact integers throughout. Equal-timestamp ties: ends (`-1`) order
    * before starts (`+1`), the half-open-interval convention; within an
    * equal `(t, delta)` run the running sum's intermediate values depend
    * on tie order but the run's END value — and therefore the day max and
    * its first-reached second — do not, so the output is deterministic
    * and any engine replays it with the same ORDER BY.
    *
    * Scale: 2 delta rows per event, ONE Exchange+Sort partitioned by day
    * (the cumulative sum and the day rollup share it); no join.
    */
  def peakConcurrency(df: DataFrame, timeCol: String,
      activeSeconds: Long): DataFrame = {
    require(activeSeconds > 0,
      s"peakConcurrency: need activeSeconds > 0, got $activeSeconds")
    val epochS = floor(unix_micros(col(timeCol).cast("timestamp"))
      / lit(1000000L)).cast("long")
    val base = df.filter(col(timeCol).isNotNull)
      .select(epochS.as("_s"))
      .select(col("_s"), (floor(col("_s") / lit(86400L)) * 86400L)
        .cast("long").as("_day0"))
    val deltas = base
      .select(col("_day0"), col("_s").as("t"), lit(1).as("delta"))
      .unionByName(base.select(col("_day0"),
        least(col("_s") + lit(activeSeconds), col("_day0") + lit(86400L))
          .as("t"),
        lit(-1).as("delta")))
    val w = Window.partitionBy(col("_day0"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .select(col("_day0"), col("t"), sum(col("delta")).over(w).as("_cur"))
      .groupBy(col("_day0"))
      // struct max: highest concurrency, then earliest second it is hit
      .agg(max(struct(col("_cur").as("c"), (-col("t")).as("nt"))).as("m"))
      .select(to_date(timestamp_seconds(col("_day0"))).cast("string")
          .as("day"),
        col("m.c").as("peak_concurrency"),
        (-col("m.nt")).as("first_peak_s"))
  }

  /** Hour-of-day LOAD PROFILE per group: event counts by (group, hour),
    * each hour's share of its group, and the group's peak hour — the
    * capacity-planning / anomaly-baseline view ([[g_anomaly]]-style
    * watchdogs need exactly this seasonal shape to avoid flagging the
    * daily peak as an outlier). Share is an exact division of the two
    * integer counts; peak = rank 1 by (n desc, hour asc), deterministic.
    *
    * Scale: ONE map-side-combined groupBy (group, hour) — the shuffle
    * carries ≤ 24 rows per group per partition; the share/peak windows
    * run on the 24×groups summary, partitioned by group.
    */
  /** Per-day user LIFECYCLE: active users, how many are NEW (first-ever
    * activity that day), how many are RETURNING (active but not new),
    * and how many were LAST SEEN that day (their final activity in the
    * corpus — the trailing edge a churn window is computed from). The
    * acquisition-vs-retention decomposition behind every DAU chart.
    *
    * Scale: ONE distinct over (user, day) — the only corpus-sized
    * shuffle; first/last per user and all three day rollups run on the
    * user-days summary; the day joins are day-count-sized.
    */
  def userLifecycle(df: DataFrame, userCol: String,
      timeCol: String): DataFrame = {
    val ud = df.filter(col(timeCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(timeCol)).as("d"))
      .distinct()
    val fl = ud.groupBy(col("u"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val act = ud.groupBy(col("d")).agg(count(lit(1)).as("active_users"))
    val nw = fl.groupBy(col("first_d").as("d"))
      .agg(count(lit(1)).as("new_users"))
    val ls = fl.groupBy(col("last_d").as("d"))
      .agg(count(lit(1)).as("last_seen_users"))
    act.join(nw, Seq("d"), "left").join(ls, Seq("d"), "left")
      .select(col("d").cast("string").as("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        (col("active_users") - coalesce(col("new_users"), lit(0L)))
          .as("returning_users"),
        coalesce(col("last_seen_users"), lit(0L)).as("last_seen_users"))
  }

  /** DAU / trailing-window AU stickiness: per day, distinct active users
    * that day vs distinct users active in the `windowDays` ending that
    * day, and their ratio — the how-often-do-actives-show-up metric
    * (DAU/WAU at the default 7). The sliding distinct is an explode of
    * `windowDays` day-offsets over the DISTINCT user-days (each user-day
    * contributes to the windows ending day..day+w−1), so the fan-out is
    * w × user-days — linear, never a per-day rescan; early days carry
    * partial windows by construction (standard convention).
    */
  def stickiness(df: DataFrame, userCol: String, timeCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"stickiness: bad window $windowDays")
    val ud = df.filter(col(timeCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(timeCol)).as("d"))
      .distinct()
    val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("u"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"), col("d"))
      .select(col("u"), date_add(col("d"), col("off")).as("d"))
      .distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    // inner join: ghost trailing days (windows ending past the corpus)
    // have no dau row and drop out
    dau.join(wau, Seq("d"))
      .select(col("d").cast("string").as("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  /** SEASONALLY-adjusted volume anomaly: for every (group, date, hour)
    * cell, compare the observed event count to the group's MEDIAN count
    * for that hour-of-day across all dates — the baseline [[loadProfile]]
    * describes — and flag cells outside [median/factor, median·factor].
    * A plain daily watchdog flags every evening peak; this one flags
    * "Tuesday 14:00 did 5× its usual 14:00". Median is the exact
    * interpolating percentile over integer counts (replays in any
    * engine); hours with a single observed date never flag (their median
    * IS the observation).
    *
    * Scale: ONE map-side-combined groupBy (group, date, hour) — the only
    * corpus shuffle; the median rollup and the flag join run on the
    * cells×groups summary (broadcast-eligible).
    */
  def seasonalAnomaly(df: DataFrame, groupCol: String, timeCol: String,
      factor: Double): DataFrame = {
    require(factor > 1.0, s"seasonalAnomaly: need factor > 1, got $factor")
    val cells = df.filter(col(timeCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("key"),
        to_date(col(timeCol)).cast("string").as("day"),
        hour(col(timeCol)).cast("int").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val base = cells.groupBy(col("key").as("_k"), col("hour").as("_h"))
      .agg(percentile(col("n_events"), lit(0.5)).as("hour_median"))
    cells.join(broadcast(base),
        col("key") === col("_k") && col("hour") === col("_h"))
      .select(col("key"), col("day"), col("hour"), col("n_events"),
        round(col("hour_median"), 4).as("hour_median"),
        (col("n_events") > col("hour_median") * factor ||
          col("n_events") < col("hour_median") / factor).as("anomalous"))
  }

  def loadProfile(df: DataFrame, groupCol: String, timeCol: String): DataFrame = {
    val per = df.filter(col(timeCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("key"),
        hour(col(timeCol)).cast("int").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val wSum = Window.partitionBy(col("key"))
    val wRank = Window.partitionBy(col("key"))
      .orderBy(col("n_events").desc, col("hour"))
    per.select(col("key"), col("hour"), col("n_events"),
      round(col("n_events").cast("double") /
        sum(col("n_events")).over(wSum), 6).as("share"),
      (row_number().over(wRank) === 1).as("is_peak"))
  }

  /** Per-group data FRESHNESS audit: when did each feed last deliver,
    * relative to the corpus watermark (the max event time across ALL
    * groups — "now" as the data itself defines it, so the report is
    * deterministic and replayable, unlike wall-clock now()). A group is
    * `stale` when its lag exceeds `staleAfterSeconds` — the
    * pipeline-is-silently-down alarm per upstream source, which
    * corpus-level lateness histograms can't see because a dead feed
    * simply stops contributing rows.
    *
    * Exact integer epoch-second arithmetic throughout (no division).
    *
    * Scale: ONE corpus scan (map-side-combined per-group max+count);
    * the watermark is a single-partition window over the feed-count-
    * sized summary (a second aggregation branch would re-scan the
    * corpus — column pruning makes the branches differ, defeating
    * exchange reuse; PlanSpec-asserted).
    */
  def freshness(df: DataFrame, groupCol: String, timeCol: String,
      staleAfterSeconds: Long): DataFrame = {
    require(staleAfterSeconds > 0,
      s"freshness: need staleAfterSeconds > 0, got $staleAfterSeconds")
    val epochS = floor(unix_micros(col(timeCol).cast("timestamp"))
      / lit(1000000L)).cast("long")
    val w = Window.partitionBy(lit(1))
    df.filter(col(timeCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("key"))
      .agg(max(epochS).as("last_epoch"), count(lit(1)).as("n_events"))
      .withColumn("watermark", max(col("last_epoch")).over(w))
      .select(col("key"), col("n_events"), col("last_epoch"),
        col("watermark"),
        (col("watermark") - col("last_epoch")).as("lag_seconds"),
        (col("watermark") - col("last_epoch") > staleAfterSeconds)
          .as("stale"))
  }
}
