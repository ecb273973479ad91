package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: find pairs of rows whose name strings are
  * within a small edit distance, without the O(n²) all-pairs join.
  *
  * The reference validates each document in isolation (engine.rs walks one
  * instance at a time); cross-document identity resolution — "are these two
  * records the same entity up to a typo?" — is the corpus-level counterpart
  * a training-data pipeline needs (near-identical titles / author strings /
  * URLs that exact dedup misses and shingle-Jaccard over-merges, because a
  * one-character edit barely moves an edit distance but can leave Jaccard
  * high for unrelated short strings).
  *
  * Scale shape — candidate generation by BLOCKING, not comparison:
  *
  *   1. each row emits two block keys, its name's first `blockLen` chars
  *      and its last `blockLen` chars (prefix OR suffix must survive the
  *      edits for a pair to be found: a pair escapes only if edits touch
  *      BOTH ends, the standard multi-pass blocking recall contract —
  *      documented, not hidden);
  *   2. blocks larger than `maxBlock` rows are dropped whole (a degenerate
  *      block — all-empty names, a boilerplate prefix — would re-create the
  *      quadratic join; the cap bounds per-block work exactly like the LSH
  *      bucket cap in [[Similarity]]);
  *   3. the self-join runs per block (shuffle on the block key, so work is
  *      Σ|block|² not n²), guarded by the free length-difference bound
  *      (|len a − len b| ≤ d implies nothing is lost: lev ≥ |Δlen|);
  *   4. the survivors pay one thresholded `levenshtein(a, b, maxDist)` —
  *      Spark's banded O(d·min(m,n)) form that bails out at the threshold
  *      instead of filling the full O(m·n) matrix.
  *
  * A pair found through both its prefix and suffix block is emitted once
  * (final distinct on the pair). Rows whose name is shorter than `blockLen`
  * or null are excluded (no full-width block key exists for them).
  */
object Linkage {

  /** Returns (id_a, id_b, dist) with id_a < id_b for every pair within
    * `maxDist` edits that shares a surviving prefix- or suffix-block.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int, blockLen: Int, maxBlock: Long): DataFrame = {
    require(maxDist >= 0 && blockLen > 0 && maxBlock > 0)
    val named = df
      .select(col(idCol).as("id"), col(nameCol).as("name"))
      .filter(col("name").isNotNull && length(col("name")) >= blockLen)
    val keyed = named.select(col("id"), col("name"),
      explode(array(
        concat(lit("p"), substring(col("name"), 1, blockLen)),
        concat(lit("s"), substring(col("name"), -blockLen, blockLen))))
        .as("bkey"))
    // block-size gate: usually tiny (≤ distinct-block-key rows), but its
    // size tracks the distinct 4-char prefix/suffix universe, which
    // maxBlock does NOT bound — no broadcast hint (a hint is honored
    // regardless of size and would OOM the driver on a high-cardinality
    // corpus); the planner broadcasts while it fits and AQE demotes to a
    // shuffle join otherwise (the dropOversizedBuckets policy)
    val smallBlocks = keyed.groupBy(col("bkey"))
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBlock)
      .select(col("bkey"))
    val ok = keyed.join(smallBlocks, Seq("bkey"))
    val left = ok.select(col("bkey"), col("id").as("id_a"),
      col("name").as("name_a"))
    val right = ok.select(col("bkey"), col("id").as("id_b"),
      col("name").as("name_b"))
    left.join(right, Seq("bkey"))
      .filter(col("id_a") < col("id_b")
        && abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }
}
