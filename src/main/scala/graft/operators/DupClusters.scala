package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster assignment: connected components over the undirected
  * pair graph produced by [[Dedup]] / [[Similarity]] candidate+verify
  * stages. Near-dup pairs only relate documents two at a time; a real
  * dedup pipeline must then pick ONE representative per transitive
  * cluster (a~b, b~c => keep one of {a,b,c}) — this operator closes that
  * gap, going beyond the single-document reference engine (its engine
  * validates one document per run, engine.rs:24-66; cluster semantics
  * have no analogue there and follow the public MapReduce
  * connected-components literature instead).
  *
  * Algorithm: min-label propagation with POINTER JUMPING. Every vertex
  * starts as its own component; each round every vertex takes the min of
  * its own label and its neighbors' labels (fixpoint = component-min
  * everywhere), then additionally jumps to its label's label (path
  * doubling). Plain propagation needs diameter rounds — fine for near-dup
  * graphs, which are almost-cliques (members of one cluster share LSH
  * buckets pairwise; 2-3 rounds) but fatal for chain-shaped graphs; the
  * jump step contracts label paths geometrically, giving the same
  * O(log diameter) round bound as the large-star/small-star scheme
  * (Kiveris et al., "Connected Components in MapReduce and Beyond") with
  * one cheap extra join per round on the LABEL table only (|V| of the
  * pair graph), instead of a different edge-rewriting algorithm.
  *
  * 100 TB design:
  *  - each round is two shuffles (edge-label join + min agg), both keyed
  *    and map-side combined; no sorts, no windows, no driver data;
  *  - the symmetric edge list is persisted once (MEMORY_AND_DISK) and
  *    reused every round — at pair-graph scale (|pairs| << |docs|, since
  *    only near-dups appear) this is the small relation of the job;
  *  - `localCheckpoint` after every round truncates lineage — without it
  *    the iterated-join plan grows exponentially and the optimizer
  *    re-plans the whole history each round; each round's checkpoint
  *    replaces the previous one's only reference, so Spark's
  *    ContextCleaner frees the superseded label copies asynchronously
  *    (peak residency ≈ 2 rounds of (id, comp) pairs, not maxIter);
  *  - convergence is detected with a `changed` count on the materialized
  *    checkpoint (one cheap job over cached partitions, not a recompute).
  */
object DupClusters {

  /** Connected components of the undirected graph given as an edge list.
    * Returns one row per distinct vertex: (id, comp) with `comp` = min
    * vertex id of the component. Vertices not mentioned in `edges` do not
    * appear (singletons are trivially their own component).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // materialize the (pair-list-sized) edge pipeline ONCE: the union
    // below references it twice, and an expensive upstream (LSH banding +
    // exact verify) would otherwise run twice before the persist kicks in
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // initial label = min over the CLOSED neighborhood (id ∧ min neighbor)
    // — the same map-side-combined aggregate a plain `distinct` would run,
    // but it bakes round 1's propagation into the init, typically saving a
    // full loop round (each round = 2 joins + 1 agg + a convergence count)
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("_nbr_min"))
      .select(col("id"), least(col("id"), col("_nbr_min")).as("comp"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min neighbor label per vertex, folded into the current label
      val nbrMin = sym
        .join(labels.select(col("id").as("src"), col("comp")), "src")
        .groupBy(col("dst").as("nid")).agg(min("comp").as("nbr_min"))
      // carry the pre-step label through as `_prev` — re-joining `labels`
      // for it after the jump was a third join per round for a column this
      // row already had (r6: one join/shuffle per round removed)
      val stepped = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"), col("comp").as("_prev"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("cand"))
      // pointer jump (path doubling): also take the candidate label's OWN
      // label — labels only ever decrease toward the component min, so the
      // jump is always sound and contracts label chains geometrically
      // (a diameter-d path closes in O(log d) rounds, not d)
      val parents = labels.select(col("id").as("_pid"), col("comp").as("_pcomp"))
      // lazy checkpoint: the convergence count below is the materializing
      // action (eager would spend an extra job per round)
      val next = stepped.join(parents, col("cand") === col("_pid"), "left")
        .select(col("id"),
          least(col("cand"), coalesce(col("_pcomp"), col("cand"))).as("comp"),
          col("_prev"))
        .withColumn("chg", col("comp") < col("_prev"))
        .localCheckpoint(false)
      changed = next.filter(col("chg")).count()
      labels = next.select("id", "comp")
      iter += 1
    }
    sym.unpersist()
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "with pointer jumping this needs a component diameter over " +
        s"2^$maxIter; raise maxIter if you really have one")
    labels
  }

  /** Cluster membership from a near-dup pair list (id_a, id_b, ...):
    * (id, cluster_id, keep) where cluster_id is the component-min id and
    * `keep` marks the canonical representative — the same keep-min-id
    * policy as [[Dedup.exactMembers]], now transitive across pairs.
    */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 25): DataFrame =
    connectedComponents(pairs, idA, idB, maxIter)
      .select(col("id"), col("comp").as("cluster_id"),
        (col("id") === col("comp")).as("keep"))

  /** Cluster-size histogram + dedup savings: from a [[clusters]] table,
    * one row per distinct cluster size with the number of clusters of
    * that size and the rows a keep-one-per-cluster pass would drop
    * ((size − 1) · n_clusters) — the "how much does dedup buy us" summary
    * a curation review reads before committing to the rewrite. Two
    * map-side-combined groupBys (members → cluster sizes → histogram);
    * output is distinct-size-sized.
    */
  def clusterStats(clusterDf: DataFrame): DataFrame =
    clusterDf.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("_size"))
      .groupBy(col("_size").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("rows_dropped"))

  /** Quality-based retention: instead of keep-min-id, keep the HIGHEST
    * `scoreCol` doc of each cluster (ties → min id), and tell every
    * dropped doc which doc replaced it — the drop list a dedup pass
    * actually applies, and the redirect map downstream provenance needs.
    * Output: (id, cluster_id, score, keep, kept_id), one row per
    * CLUSTERED doc (docs in no cluster are trivially kept and not
    * re-emitted — the output stays drop-list-sized, never corpus-sized).
    *
    * Scale: one join of the cluster membership (pair-list-sized) against
    * the docs' (id, score) projection; the winner per cluster is a
    * map-side-combined `min(struct(-score, id))` aggregate (1 row per
    * cluster per upstream partition in the shuffle — a mega-cluster never
    * buffers its membership), joined back cluster-count-sized (AQE
    * broadcasts it when small).
    */
  def retention(clusterDf: DataFrame, docs: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val members = clusterDf.select(col("id"), col("cluster_id"))
      .join(docs.select(col(idCol).as("id"), col(scoreCol).as("score")), Seq("id"))
    val winners = members.groupBy(col("cluster_id"))
      .agg(min(struct((col("score") * -1).as("neg_score"), col("id"))).as("w"))
      .select(col("cluster_id"), col("w.id").as("kept_id"))
    members.join(winners, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("score"),
        (col("id") === col("kept_id")).as("keep"), col("kept_id"))
  }

  /** Dedup ROI by segment: what a keep-one retention pass actually costs
    * each source/feed — per segment, total docs and token mass next to the
    * docs and mass the retention DROPS, with the dropped share. The view
    * that turns "dedup removed 4% of the corpus" into "dedup removes 31%
    * of feed X" (a feed that mostly re-sends others' content), which is an
    * ingestion decision, not a dedup parameter.
    *
    * `retained` is [[retention]] output (id, keep); `docs` supplies the
    * segment and the mass measure. Scale: one corpus-scan aggregate for
    * the totals, a drop-list-sized semi-join + aggregate for the dropped
    * side, segment-sized join of the two summaries.
    */
  def dedupImpact(retained: DataFrame, docs: DataFrame, idCol: String,
      segCol: String, massCol: Column): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      col(segCol).as("segment"), massCol.cast("long").as("mass"))
    val totals = base.groupBy(col("segment"))
      .agg(count(lit(1)).as("docs"), sum(col("mass")).as("token_mass"))
    val drops = base
      .join(retained.filter(!col("keep")).select(col("id")), Seq("id"),
        "left_semi")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("dropped_docs"),
        sum(col("mass")).as("dropped_tokens"))
    totals.join(drops, totals("segment") <=> drops("segment"), "left")
      .select(totals("segment"), col("docs"), col("token_mass"),
        coalesce(col("dropped_docs"), lit(0L)).as("dropped_docs"),
        coalesce(col("dropped_tokens"), lit(0L)).as("dropped_tokens"),
        // ANSI-safe: a segment whose docs all carry zero mass has no
        // meaningful share (null), not a divide-by-zero error
        when(col("token_mass") > 0,
          round(coalesce(col("dropped_tokens"), lit(0L)).cast("double")
            / col("token_mass"), 6)).as("dropped_share"))
  }

  /** Cluster purity against a label column (lang, source, license…): per
    * cluster, the dominant label's share plus how many distinct segments
    * the cluster spans. The QA view on the near-dup graph itself: a
    * LOW-purity language cluster is usually translations or template
    * boilerplate (don't dedup those as equals), and a cluster spanning
    * many sources is the copy-propagation signal [[Dedup.sourceOverlap]]
    * aggregates corpus-wide.
    *
    * Labels coalesce to "∅" before grouping so a NULL label is a real,
    * deterministically-ordered label. Dominant pick = min(struct(−count,
    * label)) — the [[retention]] winner trick, map-side combined, never
    * buffers a cluster. All inputs/outputs are cluster-sized.
    */
  def purity(clusterDf: DataFrame, docs: DataFrame, idCol: String,
      labelCol: String, segCol: String): DataFrame = {
    val members = clusterDf.select(col("id"), col("cluster_id"))
      .join(docs.select(col(idCol).as("id"),
        coalesce(col(labelCol).cast("string"), lit("∅")).as("label"),
        col(segCol).as("seg")), Seq("id"))
    val byLabel = members.groupBy(col("cluster_id"), col("label"))
      .agg(count(lit(1)).as("c"))
    val top = byLabel.groupBy(col("cluster_id"))
      .agg(sum(col("c")).as("size"), count(lit(1)).as("n_labels"),
        min(struct((col("c") * -1).as("nc"), col("label"))).as("w"))
    val segs = members.groupBy(col("cluster_id"))
      .agg(count_distinct(col("seg")).as("n_segments"))
    top.join(segs, Seq("cluster_id"))
      .select(col("cluster_id"), col("size"), col("n_labels"),
        col("w.label").as("top_label"),
        round((col("w.nc") * -1).cast("double") / col("size"), 4)
          .as("purity"),
        col("n_segments"))
  }
}
