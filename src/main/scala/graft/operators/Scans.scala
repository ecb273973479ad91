package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-shape helpers shared by the operators. */
object Scans {

  /** Widen a NARROW scan to the session's core count before CPU-heavy
    * per-row work (shingling/minhash kernels, langId folds, quality
    * regexes). A small parquet table plans into a handful of input splits
    * — the sf0.1 documents table is 3 splits — which strands a
    * compute-bound projection on 3 of 32 cores (r6 job profile:
    * 0.5-1.2 s single-digit-task stages across the text queries). At
    * production scale the same scan has orders of magnitude more splits
    * than cores, so this is the IDENTITY there (no exchange added):
    * scale-adaptive by construction, not a local-mode constant — target =
    * `defaultParallelism` (the cluster's core count), trigger = only when
    * the planned scan has fewer partitions. The round-robin exchange this
    * inserts on the narrow side carries the projected input once and is
    * deterministic under retries (sort-before-repartition, SPARK-23207).
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
