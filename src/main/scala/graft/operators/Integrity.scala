package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Content-integrity manifests: an order-independent per-partition digest
  * of a table's content, for verifying that two physical copies of a
  * corpus (a cross-cluster replica, a re-compacted or re-sorted layout, a
  * restored snapshot) still hold exactly the same rows. No reference
  * analogue (the reference validates one document at a time); this is the
  * table-level integrity check a 100 TB pipeline runs after every bulk
  * move.
  *
  * Scale shape: one scan with map-side partial aggregation; the output is
  * one row per logical partition (source, day, shard — caller's choice),
  * never row-sized. The digest is a SUM of per-row 40-bit content hashes,
  * so it is invariant under row order and file layout — exactly what
  * z-order/compaction must preserve — and any single-row change moves it
  * with probability ~1-2^-40.
  *
  * Cross-engine exactness: the row hash is the first 10 hex chars of
  * md5 (40 bits, so a BIGINT sum stays exact far past 10^6 rows per
  * partition against the 2^63 ceiling), and min/max fingerprints are
  * lowercase-hex strings — all replayable bit-for-bit in DuckDB.
  */
object Integrity {

  /** 40-bit integer view of a row's content fingerprint. */
  private def digest(content: Column): Column =
    conv(substring(md5(content), 1, 10), 16, 10).cast(LongType)

  /** Per-partition content manifest: (part, n_rows, digest_sum, fp_min,
    * fp_max). `content` should deterministically serialize the row's
    * payload (e.g. `concat_ws` of the content columns with null
    * sentinels); `partCol` is the logical partition to summarize by.
    */
  def contentManifest(df: DataFrame, partCol: Column, content: Column): DataFrame = {
    val fp = md5(content)
    df.groupBy(partCol.as("part"))
      .agg(count(lit(1)).as("n_rows"),
        sum(digest(content)).as("digest_sum"),
        min(fp).as("fp_min"),
        max(fp).as("fp_max"))
  }

  /** Compare two manifests (same `part` domain): one row per partition
    * that differs, with a status of `added` (only in `b`), `removed`
    * (only in `a`) or `changed`. The join is manifest-sized (one row per
    * partition), never corpus-sized — comparing two 100 TB copies costs
    * two scans plus a tiny join.
    */
  /** Incremental manifest maintenance: given the previous manifest, the
    * CURRENT corpus, and the set of partitions a commit touched (`dirty`,
    * one `part` column — straight from the commit log / snapshot diff),
    * produce the up-to-date manifest by recomputing ONLY the dirty
    * partitions and splicing them over the old rows. A dirty partition
    * with zero surviving rows drops out (partition deleted).
    *
    * Scale shape: the corpus scan is semi-joined against the broadcast
    * dirty list — with partition-pruned storage that is a scan of the
    * dirty partitions only, never the corpus; the splice is a
    * manifest-sized anti-join. Keeping a 100 TB table's manifest current
    * costs |touched data| per commit, not a full recompute — and
    * [[manifestDiff]] against a full recompute is the audit that proves
    * the incremental path honest.
    */
  def manifestUpdate(oldManifest: DataFrame, corpus: DataFrame,
      partCol: Column, content: Column, dirty: DataFrame): DataFrame = {
    val d = dirty.select(col("part").as("_dirty_part")).distinct()
    val recomputed = contentManifest(
      corpus.join(broadcast(d), partCol <=> col("_dirty_part"), "left_semi"),
      partCol, content)
    val untouched = oldManifest
      .join(broadcast(d), col("part") <=> col("_dirty_part"), "left_anti")
    untouched.unionByName(recomputed)
  }

  def manifestDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val left = a.select(col("part").as("part_a"), col("n_rows").as("rows_a"),
      col("digest_sum").as("dig_a"))
    val right = b.select(col("part").as("part_b"), col("n_rows").as("rows_b"),
      col("digest_sum").as("dig_b"))
    left.join(right, col("part_a") <=> col("part_b"), "full_outer")
      .filter(col("part_a").isNull || col("part_b").isNull ||
        col("rows_a") =!= col("rows_b") || col("dig_a") =!= col("dig_b"))
      .select(coalesce(col("part_a"), col("part_b")).as("part"),
        when(col("part_a").isNull, "added")
          .when(col("part_b").isNull, "removed")
          .otherwise("changed").as("status"),
        col("rows_a"), col("rows_b"), col("dig_a"), col("dig_b"))
  }
}
