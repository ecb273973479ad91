package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust anomaly detection over a METRIC SERIES — the watchdog that
  * turns a validation engine's per-batch metrics (violation rates, row
  * counts, drift statistics riding the [[graft.sources.CommitLog]]) into
  * "this batch is not like the others" flags.
  *
  * Median/MAD robust z-score (the standard outlier-resistant form:
  * mean/stddev would let one bad batch inflate its own threshold):
  *   z = (x − median) / (1.4826 · MAD),   MAD = median(|x − median|)
  * flagged when |z| > k (default 3.5, the usual Iglewicz–Hoaglin cut).
  * A zero MAD (constant series) degenerates to: anomalous iff x differs
  * from the median at all, with z = null.
  *
  * Scale contract: this operates on SUMMARY tables (groups × buckets —
  * e.g. per-day per-rule violation counts), never on the raw corpus; the
  * exact two-pass median (one aggregation for the median, one for the
  * MAD, each a narrow shuffle of series-sized data + a broadcast join
  * back) is the right trade at that size. Upstream aggregation from the
  * corpus to the series is the caller's (map-side-combined) groupBy.
  *
  * Reference analogue: none — yaml-schema validates one document per run
  * (`ys.rs:215-243`); batch-over-batch metric surveillance only exists
  * once validation is a repeated distributed job.
  */
object Anomaly {

  /** df + (med, mad, z, is_anomaly) per row, medians computed within each
    * `keys` group. `valueCol` should be a double.
    */
  def robustZ(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Double = 3.5): DataFrame = {
    require(keys.nonEmpty, "robustZ: no series keys")
    val v = col(valueCol)
    val med = df.groupBy(keys.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), keys)
    val mad = withMed.groupBy(keys.map(col): _*)
      .agg(percentile(abs(v - col("med")), lit(0.5)).as("mad"))
    val z = when(col("mad") === 0.0, lit(null).cast("double"))
      .otherwise((v - col("med")) / (lit(1.4826) * col("mad")))
    withMed.join(broadcast(mad), keys)
      .withColumn("z", z)
      .withColumn("is_anomaly",
        when(col("mad") === 0.0, v =!= col("med")).otherwise(abs(col("z")) > k))
  }

  /** Exact per-group median from a VALUE HISTOGRAM — `percentile` buffers
    * every value per group (a driver-memory bomb on a corpus), but for
    * discrete / bounded-cardinality columns (char counts, token counts,
    * small scores) the exact median needs only `groupBy((keys, value))`
    * counts: a map-side-combined aggregation whose output is Σ per-group
    * distinct values, NOT corpus-sized. Order statistics then come from a
    * cumulative sum over that tiny relation (Window partitions = one
    * group's distinct values, bounded by construction). Even-n groups
    * interpolate (mean of the two middle order statistics) — the same
    * convention as SQL `median()`, so any engine replays it exactly.
    */
  def groupMedian(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "groupMedian: no group keys")
    val v = col(valueCol).cast("double")
    medianOfHist(df.filter(v.isNotNull)
      .groupBy((keys.map(col) :+ v.as("v")): _*)
      .agg(count(lit(1)).as("cnt")), keys)
  }

  /** Median per `keys` group of a (keys…, v, cnt) histogram: the two middle
    * 1-indexed ranks r1 = ⌊(n+1)/2⌋, r2 = ⌊(n+2)/2⌋ are each "the smallest
    * v whose cumulative count reaches the rank"; their mean is the
    * interpolating median (equal for odd n).
    */
  private def medianOfHist(hist: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("v"))
    def valAt(rank: Column): Column = min(when(col("cum") >= rank, col("v")))
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(keys.map(col): _*)))
      .groupBy(keys.map(col): _*)
      .agg(((valAt(floor((col("n") + 1) / 2)) +
        valAt(floor((col("n") + 2) / 2))) / 2).as("med"))
  }

  /** ROW-LEVEL outlier flagging: every row of `df` gains (med, mad, z,
    * is_outlier) where med/MAD are the per-`keys`-group robust statistics
    * of `valueCol` and z the robust score ([[robustZ]]'s formula). Unlike
    * [[robustZ]] — which is for series-sized SUMMARY tables and uses exact
    * `percentile` — this is corpus-shaped: both medians come from value
    * histograms ([[groupMedian]]'s trick; the MAD histogram |v − med| is
    * DERIVED from the value histogram, no second corpus scan), so the
    * whole thing is one histogram aggregation + one broadcast-join flag
    * pass over the corpus. Zero-MAD groups degenerate exactly like
    * [[robustZ]]: z null, outlier iff the value differs from the median.
    */
  def rowOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Double = 3.5): DataFrame = {
    require(keys.nonEmpty, "rowOutliers: no group keys")
    val v = col(valueCol).cast("double")
    val hist = df.filter(v.isNotNull)
      .groupBy((keys.map(col) :+ v.as("v")): _*)
      .agg(count(lit(1)).as("cnt"))
    val med = medianOfHist(hist, keys)
    val madHist = hist.join(broadcast(med), keys)
      .select((keys.map(col) :+ abs(col("v") - col("med")).as("v") :+ col("cnt")): _*)
      .groupBy((keys.map(col) :+ col("v")): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val mad = medianOfHist(madHist, keys).withColumnRenamed("med", "mad")
    // LEFT join: a row whose group produced no statistics (all-null values,
    // or a null group key, which never matches) still flows through with
    // (med, mad, z) null and is_outlier false — "every row of df gains the
    // columns" is the contract, not "every row with a computable group"
    df.join(broadcast(med.join(mad, keys)), keys, "left")
      .withColumn("z",
        when(col("mad").isNull || col("mad") === 0.0, lit(null).cast("double"))
          .otherwise((v - col("med")) / (lit(1.4826) * col("mad"))))
      .withColumn("is_outlier",
        when(col("mad").isNull, lit(false))
          .when(col("mad") === 0.0, coalesce(v =!= col("med"), lit(false)))
          .otherwise(coalesce(abs(col("z")) > k, lit(false))))
  }
}
