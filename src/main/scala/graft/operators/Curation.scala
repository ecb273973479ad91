package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data run
  * actually executes, built entirely from this engine's operators —
  *
  *   1. language gate ([[TextAnalysis.langId]]),
  *   2. quality gate ([[TextAnalysis.qualityScore]]),
  *   3. repetition gate (distinct-token fraction, the cheapest Gopher
  *      signal),
  *   4. exact dedup with keep-min-id representatives
  *      ([[TextAnalysis.fingerprintMd5]] + groupBy min),
  *   5. deterministic hash downsampling ([[Sampling.sample]]).
  *
  * Exists as one operator because composition is where pipelines go wrong
  * at scale (a gate AFTER dedup dedups rows it then throws away; sampling
  * BEFORE dedup biases the keep choice) — this pins the canonical order:
  * cheap per-row gates first (scan-stage, shuffle-free, shrink the data),
  * then the one dedup shuffle over survivors only, then the free sample
  * filter. Every stage is deterministic, so the full five-stage output is
  * DuckDB-oracle-checkable (p_curate).
  */
object Curation {

  /** Returns the curated rows: (id, lang_id, quality) for every kept doc.
    * `sampleFraction` applies AFTER dedup (sampling representatives, not
    * raw rows).
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
      langs: Set[String], minQuality: Double, minDistinctFrac: Double,
      sampleFraction: Double): DataFrame = {
    require(langs.nonEmpty && minQuality >= 0 && minDistinctFrac >= 0)
    val text = col(textCol)
    // NoInline fence (guide §4.4 / the lshBands precedent): the gate
    // filter below references these computed columns, and predicate
    // pushdown would otherwise re-inline each definition into the pushed
    // conjuncts — profiled as the pipeline's dominant cost (every doc
    // re-ran the langId folds and quality regexes 2-3×).
    def fence(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.GraftShims
      GraftShims.column(graft.plans.NoInline(GraftShims.expression(c)))
    }
    // materialize BOTH token arrays ONCE: interpreted HOFs get no
    // common-subexpression elimination, so every textual reference to a
    // tokenizing expression re-tokenizes the row (the ~30x-per-lambda cost
    // Dedup.shingles documents). `_tk` (plain space split) feeds the
    // repetition gate; `_ntk` (normalized, TextAnalysis.toks) feeds the
    // langIdTk argmax (4 folds) AND qualityScoreTk's stopword fold — 6
    // tokenizations collapsed to 2.
    val gated = df
      .withColumn("_tk", fence(filter(split(lower(text), " "), t => length(t) > 0)))
      .withColumn("_ntk", fence(TextAnalysis.toks(text)))
      .withColumn("lang_id", fence(TextAnalysis.langIdTk(col("_ntk"))))
      .withColumn("quality", fence(TextAnalysis.qualityScoreTk(text, col("_ntk"))))
      .withColumn("_df",
        size(array_distinct(col("_tk"))).cast("double") / size(col("_tk")))
      .filter(size(col("_tk")) > 0 && col("lang_id").isin(langs.toSeq: _*) &&
        col("quality") >= minQuality && col("_df") >= minDistinctFrac)
      .withColumn("_fp", TextAnalysis.fingerprintMd5(text))
    // keep-min-id per exact fingerprint — over gate SURVIVORS only, as ONE
    // min(struct) aggregation that carries the representative row out
    // directly: a groupBy(min(id)) + join-back would evaluate the regex
    // gates a second time on the join's probe side and add a shuffle
    val deduped = gated
      .groupBy(col("_fp"))
      .agg(min(struct(col(idCol), col("lang_id"), col("quality"))).as("_rep"))
      .select(col("_rep").getField(idCol).as(idCol),
        col("_rep.lang_id").as("lang_id"), col("_rep.quality").as("quality"))
    Sampling.sample(deduped, idCol, sampleFraction)
  }
}
