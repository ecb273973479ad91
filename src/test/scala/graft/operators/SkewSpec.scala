package graft.operators

import graft.SparkSpec
import graft.sources.DocsGen
import org.apache.spark.sql.functions._

/** Skew-path behavior (north rule: "AQE skew-join handling", "salting for
  * skew"): the generator's skew knob concentrates ~95% of media refs onto
  * one hot ref; the shuffle (non-broadcast) anti-join and the salted
  * uniqueness agg must stay correct under it.
  */
class SkewSpec extends SparkSpec {

  test("shuffle anti-join stays correct under a hot media_ref (AQE on)") {
    val docs = DocsGen.docs(spark, DocsGen.Knobs(nDocs = 5000, nParts = 4,
      skew = 19, danglingRefPerMille = 20))
    val catalog = DocsGen.mediaCatalog(spark, DocsGen.Knobs())
    // broadcast path (the default) vs forced shuffle path must agree
    val viaBroadcast = RefIntegrity.dangling(docs, catalog, broadcastCatalog = true)
      .orderBy("doc_id", "media_ref").collect()
    val viaShuffle = RefIntegrity.dangling(docs, catalog, broadcastCatalog = false)
      .orderBy("doc_id", "media_ref").collect()
    assert(viaBroadcast.sameElements(viaShuffle))
    assert(viaBroadcast.nonEmpty, "dangling refs expected with danglingRefPerMille=20")
    // all dangling refs are in the generator's never-cataloged namespace
    assert(viaBroadcast.forall(_.getString(0).startsWith("m-ffff")))
  }

  test("salted uniqueness agg finds duplicates under doc_id hash skew") {
    val docs = DocsGen.docs(spark, DocsGen.Knobs(nDocs = 8000, nParts = 4,
      dupPerMille = 100))
    val dups = Uniqueness.duplicates(docs, "doc_id", salt = 16)
    val expected = docs.groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dups.count() == expected && expected > 0)
  }

  test("salt actually fans a hot key out over multiple phase-1 groups") {
    // one pathological doc_id repeated across every input partition: the
    // phase-1 (salt, key) grouping must produce >1 group for it — a
    // key-derived salt (the bug this guards against) would produce exactly 1
    val hot = spark.range(100000).repartition(16)
      .select(lit("d-hot").as("doc_id"))
    val phase1Groups = hot
      .groupBy(pmod(xxhash64(col("doc_id"), spark_partition_id()), lit(16L))
        .as("_salt"), col("doc_id"))
      .count()
    assert(phase1Groups.count() > 1,
      "hot key collapsed to a single phase-1 group: salt has no per-row entropy")
    // and end-to-end the duplicate is still reported exactly once, with the
    // exact global multiplicity
    val dups = Uniqueness.duplicates(hot, "doc_id", salt = 16).collect()
    assert(dups.length == 1 && dups(0).getLong(1) == 100000L)
  }

  test("hot-ref distribution really is skewed (generator knob sanity)") {
    val docs = DocsGen.docs(spark, DocsGen.Knobs(nDocs = 5000, nParts = 4, skew = 19))
    val top = docs.select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .groupBy(col("s.media_ref")).count().orderBy(col("count").desc)
      .limit(1).collect()(0)
    val total = docs.select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media").count()
    assert(top.getLong(1).toDouble / total > 0.8,
      s"hot ref carries ${top.getLong(1)} of $total")
  }
}
