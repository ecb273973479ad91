package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for dataset curation — the selection operators a
  * training-data pipeline runs before/after dedup and quality filtering.
  * No reference analogue (single-document validator); corpus-level
  * capability like Dedup/Similarity.
  *
  * All sampling is HASH-deterministic (md5 of the id), never `rand()`:
  * the same row set is selected on every run, every cluster size, and any
  * engine (md5 is universal, so an independent engine can re-derive the
  * exact sample — the property that makes these operators oracle-checkable
  * AND makes samples reproducible for experiment lineage).
  *
  * Scale notes:
  *   - [[sample]] / [[stratified]] are pure per-row filters — no shuffle,
  *     fully pushed into the scan stage, trivially 100 TB-safe;
  *   - [[reservoirPerGroup]] needs per-group top-k by hash; it uses
  *     `row_number` over (group, hash) + `<= k`, which Spark ≥ 3.5 lowers
  *     to `WindowGroupLimit` — each partition keeps only k rows per group
  *     BEFORE the shuffle (a map-side top-k, not a full per-group sort of
  *     all rows), so a hot group costs k per upstream partition, not its
  *     full cardinality.
  */
object Sampling {

  /** Uniform selection pseudo-randomness: the first 8 hex chars of
    * md5(id). Lowercase-hex strings compare identically everywhere, so the
    * threshold is a plain string comparison.
    */
  private def hashKey(id: Column): Column =
    substring(md5(id.cast("string")), 1, 8)

  /** `fraction` of [0,1] as an 8-hex-digit threshold: rows whose hash key
    * sorts below it are kept. 2^32 buckets — granularity 2.3e-10.
    */
  private[graft] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    // fraction 1.0 means KEEP ALL: 'g' sorts above every lowercase-hex
    // prefix, so `hashKey < 'g'` is vacuously true — clamping to
    // 'ffffffff' instead would silently drop the ~2^-32 of rows whose
    // hash prefix is exactly ffffffff
    if (fraction >= 1.0) "g"
    else {
      val t = (fraction * 4294967296.0).toLong
      f"$t%08x"
    }
  }

  /** Deterministic uniform sample: keeps ~`fraction` of rows, selected by
    * id hash (stable across runs/partitionings — NOT Spark's `sample()`,
    * which is seed- and partition-layout-dependent).
    */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashKey(col(idCol)) < lit(thresholdHex(fraction)))

  /** Stratified sample: a different fraction per stratum value (e.g.
    * downsample boilerplate languages, keep all rare ones). Strata absent
    * from the map get `defaultFraction`. The per-stratum threshold folds to
    * a literal CASE — still a pure scan-stage filter.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(hashKey(col(idCol)) < thr)
  }

  /** Deterministic mixture upsampling: repeat each row `weight(stratum)`
    * times — the source/domain re-weighting step of a training-data mix
    * (e.g. 2.25 epochs of curated text, 0.5 of crawl). Integer part =
    * unconditional copies; fractional part = one extra copy for the rows
    * whose id hash falls under the fraction's threshold (the same
    * deterministic coin as [[sample]], so the SAME rows get the extra
    * epoch on every run/engine). Output adds `epoch` (0-based copy index)
    * so downstream shuffles can decorrelate copies.
    *
    * Scale: weights fold to a literal CASE; the explode happens in the
    * scan stage (no shuffle, no driver state); output size = sum of
    * weights × stratum sizes, exactly as requested.
    */
  def upsample(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      s"upsample weights must be in [0,100]: $weights / $defaultWeight")
    def copiesFor(w: Double): Column =
      lit(math.floor(w).toInt) +
        when(hashKey(col(idCol)) < lit(thresholdHex(w - math.floor(w))), 1).otherwise(0)
    val copies = weights.toSeq.sortBy(_._1).foldLeft(copiesFor(defaultWeight)) {
      case (acc, (stratum, w)) =>
        when(col(strataCol) === lit(stratum), copiesFor(w)).otherwise(acc)
    }
    df.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0) // sequence(0, -1) would count DOWN
      .withColumn("epoch", explode(sequence(lit(0), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Deterministic reservoir of `k` rows per group: the k smallest id
    * hashes within each group (a uniform-without-replacement sample, fixed
    * forever). Adds `sample_rank` (1-based).
    */
  def reservoirPerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(hashKey(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic train/validation/test (or any n-way) split assignment:
    * the id hash lands in cumulative-weight buckets, so every row gets
    * exactly one `split` label that is stable across runs, cluster sizes
    * and engines (the property that makes held-out sets leak-proof: a row
    * can never migrate between train and test when the corpus is
    * re-partitioned or re-sampled). Pure scan-stage CASE filter —
    * trivially 100 TB-safe; weights must sum to 1.
    */
  def splits(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitCol(col(idCol), weights))

  /** The split-assignment expression itself, applicable to ANY id-valued
    * Column — [[splits]] is `withColumn("split", splitCol(...))`, and the
    * leak audit below applies it to both sides of a near-dup pair without
    * joining back to the corpus.
    */
  def splitCol(id: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0) &&
      math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must be >= 0 and sum to 1, got $weights")
    val cums = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    val key = hashKey(id)
    // first matching cumulative threshold wins; the LAST bucket is the
    // else-branch (its threshold is 1.0 — no hex compare needed, and no
    // row can fall through on rounding)
    weights.init.zip(cums.init)
      .foldRight(lit(weights.last._1): Column) { case (((name, _), cum), acc) =>
        when(key < lit(thresholdHex(cum)), lit(name)).otherwise(acc)
      }
  }

  /** Train/test contamination audit: near-dup pairs that STRADDLE split
    * boundaries — the held-out set is only honest if no test document has
    * a near-duplicate in train, a property hash-bucketed assignment alone
    * cannot give (near-dups have different ids, so they split
    * independently). Input is a verified near-dup pair list
    * (id_a, id_b, ...) from [[Dedup.nearDupPairsExact]] /
    * [[Similarity]]; output is the pairs whose two sides land in
    * different splits, with both labels attached.
    *
    * Scale notes: split assignment is a pure function of the id
    * ([[splitCol]]), so both labels are computed IN the scan over the
    * pair list — no join back to the corpus, no shuffle beyond what the
    * pair finder already did; the pair list is candidate-sized, not
    * corpus-sized. The standard remedy for flagged pairs — promote the
    * whole dup CLUSTER ([[DupClusters.clusters]]) into one split — is a
    * second scan-stage relabel by cluster_id.
    */
  def splitLeaks(pairs: DataFrame,
      weights: Seq[(String, Double)]): DataFrame =
    pairs
      .withColumn("split_a", splitCol(col("id_a"), weights))
      .withColumn("split_b", splitCol(col("id_b"), weights))
      .filter(col("split_a") =!= col("split_b"))

  /** The remedy for [[splitLeaks]] findings: promote every member of a dup
    * CLUSTER into one split — the cluster representative's. Input is
    * [[DupClusters.clusters]] output (id, cluster_id, keep); since
    * `cluster_id` IS the cluster-min id, `splitCol(cluster_id)` is the
    * representative's split, and after healing no near-dup pair can
    * straddle a boundary (both sides carry the same cluster_id — zero
    * leaks by construction, which the spec asserts through splitLeaks).
    *
    * Scan-stage relabel over the cluster table (|dup docs| rows, not the
    * corpus); singleton docs keep their hash split untouched — only rows
    * present in the cluster assignment need relabeling.
    */
  def splitsHealed(clusters: DataFrame,
      weights: Seq[(String, Double)]): DataFrame =
    clusters.select(col("id"),
      splitCol(col("id"), weights).as("split"),
      splitCol(col("cluster_id"), weights).as("healed_split"))

  /** Deterministic global shuffle + shard assignment — the "shuffle the
    * corpus before training" step, reproducible by construction instead of
    * seed-and-pray: each row's shard is the low bits of md5(seed:id), and
    * its position within the shard is its rank by the same hash. The same
    * (seed, corpus) always yields the same shard files in the same order,
    * on any cluster size and any input layout — experiment lineage for the
    * epoch-0 data order.
    *
    * Output (id, shard, pos); writers then `repartition(shard)` +
    * `sortWithinPartitions(pos)` — one shuffle, one task per shard. The
    * rank Window partitions by shard, so the sort is shard-sized
    * (corpus/nShards): pick nShards so a shard fits a task (same knob the
    * writer needs anyway). `pos` is 1-based.
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    // first 40 bits of the md5 as the shard coin (exactly replayable in
    // any engine as a 10-hex-digit polynomial; see SparkEntry's oracle)
    val shard = pmod(conv(substring(key, 1, 10), 16, 10).cast("long"),
      lit(nShards.toLong))
    df.select(col(idCol), key.as("_key"), shard.as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_key"), col(idCol))))
      .select(col(idCol), col("shard"), col("pos").cast("long").as("pos"))
  }

  /** Token-budget-capped corpus assembly: per group (source, language,
    * ...), keep documents — in deterministic md5(seed:id) order, the same
    * unbiased coin as [[sample]] — until the group's running token sum
    * exceeds `budget`; the kept set is exactly the docs whose cumulative
    * sum (inclusive) stays ≤ budget. "Give me at most 10B tokens per
    * source, chosen reproducibly" is the last step of most mixture plans;
    * hash order makes the selection layout- and cluster-size-invariant
    * (a random() coin is neither).
    *
    * One Window per group (running sum over the hash order): partition-
    * bounded sort, group-count parallelism — same scaling knob as every
    * per-source operator here. Output: (id, group, tokens, cum_tokens).
    */
  def budgetCap(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, budget: Long, seed: String): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol), col(tokensCol))
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Exact global 1-based rank by `orderCols` WITHOUT a single-partition
    * sort (the naive `row_number() OVER (ORDER BY ...)` funnels the whole
    * corpus through one task — a non-starter at 10^12 rows). Two-phase
    * distributed rank instead:
    *
    *   1. `repartitionByRange(orderCols)` — Spark's RangePartitioner puts
    *      partition i strictly before partition i+1 in the order;
    *   2. per-partition row counts (ONE #partitions-sized collect) prefix-
    *      sum into offsets on the driver;
    *   3. `row_number()` windowed per partition id (partition-bounded
    *      sorts) + the broadcast offset.
    *
    * `orderCols` MUST be a total order (append the row id as the last
    * column) — ties at a range boundary may land in either partition, and
    * only a total order makes the resulting rank well-defined. Cost: one
    * range exchange + one hash exchange on the partition id, every sort
    * partition-sized, plus a MEMORY_AND_DISK cache of the range-
    * partitioned input (the price of boundary consistency between the
    * counts phase and the rank phase — see the persist note in the body).
    * PROJECT to the ordering + id columns before calling (the cache holds
    * whatever you pass in); long-running sessions should `unpersist` the
    * result's lineage or `spark.catalog.clearCache()` once ranks are
    * consumed. Output: `df` + `rank` (long).
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column]): DataFrame =
    globalRankWithTotal(df, orderCols)._1

  /** [[globalRank]] plus the total row count (already on the driver from
    * the counts phase — callers needing N, like [[curriculum]], must not
    * pay a second corpus pass for it).
    */
  private[graft] def globalRankWithTotal(df: DataFrame,
      orderCols: Seq[Column]): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    require(orderCols.nonEmpty, "globalRank needs ordering columns")
    // persist the range-partitioned intermediate: the counts job below and
    // the returned rank plan must see the SAME partition boundaries, and
    // RangePartitioner SAMPLES to pick them (two independent executions
    // may disagree at boundaries on skewed data, silently corrupting
    // ranks). Both consumers share one InMemoryRelation; an evicted block
    // recomputes through the same RDD lineage, so boundaries stay fixed.
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // #partitions rows — driver-bounded by construction
    val counts = parted.groupBy(col("_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offMap = counts.map(_._1).zip(offsets).toMap
    // literal-map lookup, not a nested when-chain: thousands of shuffle
    // partitions would otherwise build a thousands-deep CaseWhen tree
    // (codegen fallback / stack risk)
    val offCol =
      if (offMap.isEmpty) lit(0L)
      else element_at(typedlit(offMap), col("_pid"))
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
    val ranked = parted
      .withColumn("rank", (offCol + row_number().over(w)).cast("long"))
      .drop("_pid")
    (ranked, counts.map(_._2).sum)
  }

  /** Curriculum-ordered training buckets: every row gains its exact
    * global `rank` by `orderCols` (easiest-first or highest-quality-first
    * — the caller's ordering) and its `bucket` in 1..n with standard SQL
    * `ntile` semantics (first `N mod n` buckets get the extra row), so
    * bucket 1 is the first curriculum stage. Built on [[globalRank]];
    * the bucket is pure arithmetic on the rank — deterministic on any
    * cluster size or input layout, unlike `ntile()` over a global window
    * (which is also a single-task sort).
    */
  def curriculum(df: DataFrame, orderCols: Seq[Column], n: Int): DataFrame = {
    require(n > 0, s"bucket count must be positive: $n")
    // N comes back from the rank phase's own driver-side counts — the
    // bucket boundaries below are pure literals, no second corpus pass
    val (ranked, total) = globalRankWithTotal(df, orderCols)
    val q = total / n
    val r = total % n
    val cut = (q + 1) * r // ranks <= cut live in the (q+1)-sized buckets
    // math.max(q, 1): when N < n the otherwise-branch is never selected
    // (cut = N covers every rank), but its divisor must still be nonzero
    ranked.withColumn("bucket",
      when(col("rank") <= cut, floor((col("rank") - 1) / (q + 1)) + 1)
        .otherwise(floor((col("rank") - 1 - cut) / math.max(q, 1L)) + (r + 1))
        .cast("long"))
  }

  /** Split distribution-parity audit: after [[splits]] assigns rows, did
    * every split inherit the same distribution of `c`? Per non-baseline
    * split: its non-null row count and its PSI against the FIRST-named
    * split (the baseline, conventionally `train`) over `bins` equal-width
    * bins on [lo, hi] — the [[graft.operators.Drift.psi]] recipe (clamped
    * floor buckets, 1e-6 eps floor) applied across splits instead of
    * snapshots. A hash split is unbiased by construction; this measures
    * the SAMPLING NOISE actually realized (small splits of skewed columns
    * can still land visibly off), and catches id↔value correlation — ids
    * assigned in value order make a hash of id NOT independent of the
    * value column's layout-coupled artifacts. An empty split emits
    * n = 0 with null PSI (a finding, not a crash).
    *
    * Scale: ONE corpus scan to a (splits × bins)-sized histogram — not
    * one [[graft.operators.Drift.psi]] call (= 2 scans) per split pair.
    * The histogram is collected (≤ splits·bins rows by construction —
    * the [[graft.operators.Drift.ksFixedGridBinned]] cell-count pattern)
    * and the PSI folds run on the driver in fixed bucket order, so the
    * corpus is provably scanned exactly once and the float sums are
    * order-deterministic.
    */
  def splitParity(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], c: String, lo: Double, hi: Double,
      bins: Int = 10): DataFrame = {
    require(hi > lo, s"splitParity: need hi > lo, got [$lo, $hi]")
    require(bins >= 1, s"splitParity: need bins >= 1, got $bins")
    require(weights.size >= 2, "splitParity: need a baseline + >= 1 split")
    val base = weights.head._1
    val hist = df.filter(col(c).isNotNull)
      .select(splitCol(col(idCol), weights).as("split"),
        least(greatest(floor(((col(c).cast("double") - lit(lo))
            / lit(hi - lo)) * lit(bins)), lit(0.0)),
          lit((bins - 1).toDouble)).cast("int").as("bucket"))
      .groupBy(col("split"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val eps = 1e-6
    def counts(split: String): IndexedSeq[Long] =
      (0 until bins).map(b => hist.getOrElse((split, b), 0L))
    val cb = counts(base)
    val tb = cb.sum
    val rows = weights.map(_._1).filter(_ != base).map { s =>
      val cs = counts(s)
      val n = cs.sum
      // null PSI when this split OR the baseline is empty — a finding
      // row, not an eps-saturated fake maximum
      val psi = if (n == 0 || tb == 0) None
      else Some {
        val raw = (0 until bins).map { b =>
          val p = math.max(cs(b).toDouble / n, eps)
          val q = math.max(cb(b).toDouble / tb, eps)
          (p - q) * math.log(p / q)
        }.sum
        // HALF_UP, matching Spark round() and DuckDB round() — the one
        // driver-side rounding site must follow the same policy as every
        // in-plan round(_, 6)
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
      (s, n, psi)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("split", "n", "psi")
  }
}
