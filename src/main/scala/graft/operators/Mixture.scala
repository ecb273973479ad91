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

  /** Temperature (exponent) re-weighting of source shares — the standard
    * multi-source/multilingual LM sampling knob (sample source i with
    * probability ∝ massᵢ^α, α ∈ (0, 1]; published as exponentiated
    * smoothing in the multilingual-pretraining literature): α = 1 keeps
    * natural proportions, α → 0 flattens toward uniform, lifting
    * low-resource sources without the hard floor/ceiling cliffs of
    * [[rates]]' explicit targets. Output per source: mass, natural share,
    * temperature share, and the boost (temp/natural — > 1 means the
    * source is upsampled relative to its natural frequency).
    *
    * Cross-engine exactness: α = 0.5 and 0.25 lower to sqrt /
    * sqrt∘sqrt — IEEE-754 correctly-rounded operations any engine
    * reproduces bit-for-bit, unlike general `pow`, whose libm
    * implementations differ in ULPs. Other α use `pow` and rely on the
    * 6-decimal output rounding.
    *
    * Scale: ONE map-side-combined groupBy to a source-sized table;
    * the share windows run on that table. Compose with [[sampleByRates]]
    * (rate = boost · maxRate normalization) to materialize the sample.
    */
  def temperaturePlan(df: DataFrame, srcCol: String, massCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    val powered: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      m => if (alpha == 1.0) m
      else if (alpha == 0.5) sqrt(m)
      else if (alpha == 0.25) sqrt(sqrt(m))
      else pow(m, lit(alpha))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    df.groupBy(col(srcCol).as("source"))
      .agg(sum(col(massCol)).cast("long").as("mass"))
      .select(col("source"), col("mass"),
        col("mass").cast("double").as("_m"),
        powered(col("mass").cast("double")).as("_p"))
      .select(col("source"), col("mass"),
        // a zero-mass source keeps null shares (ANSI: never divide by 0);
        // totals are over the source-sized table, no second scan
        when(sum(col("_m")).over(w) > 0.0,
          col("_m") / sum(col("_m")).over(w)).as("_share"),
        when(sum(col("_p")).over(w) > 0.0,
          col("_p") / sum(col("_p")).over(w)).as("_tshare"))
      .select(col("source"), col("mass"),
        round(col("_share"), 6).as("share"),
        round(col("_tshare"), 6).as("temp_share"),
        when(col("_share") > 0.0,
          round(col("_tshare") / col("_share"), 6)).as("boost"))
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
