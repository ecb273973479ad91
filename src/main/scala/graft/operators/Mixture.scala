package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture planning: turn "the training set should be 40% src0,
  * 35% src1, 25% src2 by token mass" into per-source sampling rates and a
  * deterministic sample that realizes them. This is the mixture-weighting
  * step every LLM pretraining pipeline runs between curation and packing
  * (cf. the per-source epoch tables of public pretraining recipes); the
  * reference has no analogue (single-document validator) — corpus-level
  * capability like Sampling/Packing.
  *
  * Feasibility contract: a target share can only be DOWN-sampled from what
  * the corpus holds (no upsampling here — [[Sampling.upsample]] is the
  * epoch-repeat operator). With available mass n_s per source and target
  * weights w_s, the largest total T that keeps every source's rate at or
  * under `maxRate` is T = min_s(maxRate * n_s / w_s); each source then
  * samples at rate_s = w_s * T / n_s, so the sampled masses sit exactly at
  * the target proportions and the binding source sits exactly at
  * `maxRate`. Sources not in `targets` get no row (rate 0 — excluded from
  * the mix); targeted sources absent from the corpus contribute no cap row
  * and their share is simply unattainable (documented, not an error — the
  * plan is still the best achievable mix over the sources present).
  *
  * Scale: one map-side-combined aggregate to per-source masses (rows =
  * #sources), a broadcast join against the target literals, and a 1-row
  * min() cross-joined back — driver never sees corpus-sized data. The
  * sample itself is a broadcast-joined scan-stage filter (no shuffle), the
  * same shape as [[Sampling.sample]], so it survives any corpus size.
  *
  * Determinism/oracle: rates are IEEE-double arithmetic over exact BIGINT
  * masses in a fixed expression order, and the per-row coin is the integer
  * value of the first 8 hex chars of md5(id) — both replayable exactly by
  * an independent engine.
  */
object Mixture {

  /** Per-source sampling plan: (source, mass, target_w, rate, planned_mass)
    * where `planned_mass` = floor(rate * mass), the expected token mass the
    * sample keeps from this source.
    */
  def rates(df: DataFrame, srcCol: String, massCol: String,
      targets: Map[String, Double], maxRate: Double = 1.0): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(w => w > 0),
      s"target weights must be positive: $targets")
    require(maxRate > 0 && maxRate <= 1.0, s"maxRate out of (0,1]: $maxRate")
    val spark = df.sparkSession
    import spark.implicits._
    val masses = df.groupBy(col(srcCol).as("source"))
      .agg(sum(col(massCol)).cast("long").as("mass"))
    val tgt = targets.toSeq.sortBy(_._1).toDF("source", "target_w")
    val joined = masses.join(broadcast(tgt), Seq("source"))
    // the largest feasible total mass: the binding source hits maxRate
    val total = joined
      .agg(min(lit(maxRate) * col("mass") / col("target_w")).as("t_mass"))
    joined.crossJoin(broadcast(total))
      .select(col("source"), col("mass"), col("target_w"),
        (col("target_w") * col("t_mass") / col("mass")).as("rate"))
      .withColumn("planned_mass",
        floor(col("rate") * col("mass")).cast("long"))
  }

  /** Integer value of the first 8 hex chars of md5(id): a uniform
    * deterministic coin in [0, 2^32) — the numeric twin of
    * [[Sampling]]'s hex-string threshold, needed here because the
    * threshold is a data-dependent column, not a literal.
    */
  private def coin(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Materialize a mixture plan: keep each row of `df` whose id coin falls
    * under its source's rate. Rows from sources absent in `plan` are
    * dropped (rate 0). Pure broadcast-join + scan filter.
    */
  def sampleByRates(df: DataFrame, idCol: String, srcCol: String,
      plan: DataFrame): DataFrame = {
    // prefixed plan columns: srcCol is usually literally "source"
    val p = plan.select(col("source").as("_mx_source"), col("rate").as("_mx_rate"))
    df.join(broadcast(p), col(srcCol) === col("_mx_source"))
      .filter(coin(col(idCol)) <
        floor(col("_mx_rate") * lit(4294967296.0)).cast("long"))
      .drop("_mx_source", "_mx_rate")
  }
}
