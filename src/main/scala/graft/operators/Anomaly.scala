package graft.operators

import org.apache.spark.sql.DataFrame
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
}
