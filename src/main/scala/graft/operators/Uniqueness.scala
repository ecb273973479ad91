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

  /** Duplicate-scope attribution: for every key with > 1 copy, whether
    * the copies sit inside ONE ingest batch/partition (`intra_batch` —
    * the producer-retry / double-write signature) or span several
    * (`cross_batch` — a replay or re-crawl). [[duplicates]] counts the
    * collisions; this tells the operator WHERE to look — same batch means
    * fix the writer, cross batch means fix the scheduler/crawler — which
    * is the first question a 100 TB dedup incident review asks.
    *
    * Output: one row per scope with the distinct duplicated keys and the
    * excess rows (copies − 1 summed) a keep-one pass would drop.
    *
    * Scale: one groupBy on the key — `count` is map-side combined, and
    * the distinct-batch count's pre-aggregation state is bounded by the
    * batches a single key actually touches (≪ total batches), so the
    * shuffle stays one row per distinct (key, batch). The scope rollup
    * runs on the duplicate-keys-sized result. NULL keys are excluded for
    * the same reason as [[duplicates]] (they are completeness
    * violations, not collisions); a NULL batch is a real batch value.
    */
  def duplicateScope(df: DataFrame, keyCol: String,
      batchCol: String): DataFrame = {
    val g = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("copies"),
        // struct-wrap so a NULL batch is a countable value (bare
        // countDistinct drops null rows, undercounting the batch span)
        countDistinct(struct(col(batchCol))).as("n_batches"))
      .filter(col("copies") > 1)
    g.select(
        when(col("n_batches") === 1L, lit("intra_batch"))
          .otherwise(lit("cross_batch")).as("scope"),
        col("copies"))
      .groupBy(col("scope"))
      .agg(count(lit(1)).as("dup_keys"),
        sum(col("copies") - 1L).as("excess_rows"))
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
