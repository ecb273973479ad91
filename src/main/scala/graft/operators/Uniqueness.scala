package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Global `doc_id` uniqueness — the table-level generalization of the
  * reference's within-array `uniqueItems` (`/root/reference/src/schemas/
  * array.rs:176-187`), required by the north rule ("uniqueness: doc_id via
  * salted groupBy + two-phase dedup to handle skew").
  *
  * Two-phase salted aggregation: phase 1 groups on `(salt, key)` where the
  * salt carries PER-ROW entropy (`xxhash64(key, spark_partition_id())`), so
  * the same hot key lands in up to `salt` distinct phase-1 groups; phase 2
  * re-aggregates by `key` alone and filters `total > 1`.
  *
  * Why the salt matters at 100 TB: Spark's hash aggregate already does
  * map-side partial aggregation, which collapses benign duplicates early —
  * but a pathological hot key (billions of occurrences of one `doc_id`, e.g.
  * a default/placeholder id) still funnels every partial row for that key to
  * a single reducer, and any per-key payload (example offsets, first/last
  * file) amplifies it. The salt fans one key out over `salt` reducers; the
  * phase-2 re-agg then sees at most `salt` rows per key. Phase 2's input is
  * bounded by (#distinct keys that appear in >0 salt buckets) ≤ phase-1
  * output, which is already tiny relative to the corpus.
  *
  * The salt MUST NOT be a pure function of the key (e.g.
  * `hash(key) % salt`): that maps every occurrence of a hot key to the same
  * shuffle partition and the "fan-out" never happens. Mixing in
  * `spark_partition_id()` keeps the salt deterministic for a fixed input
  * partitioning while giving a hot key spread across many map tasks up to
  * `salt` distinct reduce groups (map tasks ≫ salt at scale).
  */
object Uniqueness {

  /** Violation-shaped output: one row per duplicated key value with its
    * multiplicity (count > 1).
    *
    * NULL keys are deliberately excluded: a null id is a per-row
    * completeness violation (the `required`/type rules report every such
    * row individually), not a uniqueness collision — counting the null
    * group here would report one giant "duplicate" that double-flags rows
    * already failing validation.
    */
  def duplicates(df: DataFrame, keyCol: String, salt: Int = 64): DataFrame = {
    val keyed = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
    keyed
      .groupBy(pmod(xxhash64(col(keyCol), spark_partition_id()), lit(salt.toLong))
        .as("_salt"), col(keyCol))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("count"))
      .filter(col("count") > 1)
  }

  /** Violation rows in the engine's standard shape. */
  def violations(df: DataFrame, keyCol: String, salt: Int = 64): DataFrame =
    duplicates(df, keyCol, salt).select(
      col(keyCol).cast("string").as("doc_id"),
      lit("").as("path"),
      lit("uniqueItems").as("rule"),
      concat(lit(s"Duplicate $keyCol: appears "), col("count").cast("string"),
        lit(" times")).as("message"))
}
