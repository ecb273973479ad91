package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mixture planning/sampling, quality retention and packed-bin
  * materialization — the round-5 second wave.
  */
class MixturePackSpec extends SparkSpec {
  import spark.implicits._

  test("mixture rates: binding source at maxRate, proportions exact, " +
      "absent sources ignored") {
    // masses: a=1000, b=4000, c=500; targets a 50%, b 30%, c 20% cap 0.8
    // caps: a 0.8*1000/0.5=1600, b 0.8*4000/0.3=10666.7, c 0.8*500/0.2=2000
    // T = 1600 (a binds): rate_a=0.8, rate_b=1600*0.3/4000=0.12,
    // rate_c=1600*0.2/500=0.64
    val docs = (Seq.fill(10)(("a", 100L)) ++ Seq.fill(10)(("b", 400L)) ++
      Seq.fill(10)(("c", 50L)) ++ Seq.fill(3)(("zz", 999L)))
      .zipWithIndex.map { case ((s, m), i) => (i.toLong, s, m) }
      .toDF("id", "source", "mass")
    val r = Mixture.rates(docs, "source", "mass",
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2, "nope" -> 0.0001), maxRate = 0.8)
      .orderBy("source").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b", "c")) // zz/nope absent
    val rates = r.map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(math.abs(rates("a") - 0.8) < 1e-12)
    assert(math.abs(rates("b") - 0.12) < 1e-12)
    assert(math.abs(rates("c") - 0.64) < 1e-12)
    // planned masses realize the target proportions exactly
    val planned = r.map(x => x.getString(0) -> x.getLong(4)).toMap
    assert(planned == Map("a" -> 800L, "b" -> 480L, "c" -> 320L))
  }

  test("sampleByRates is deterministic, layout-invariant, and a subset " +
      "honoring per-source rates") {
    val docs = spark.range(0, 2000)
      .select(col("id"), concat(lit("s"), pmod(col("id"), lit(3))).as("source"),
        (col("id") % 7 + 1).as("mass"))
    val plan = Mixture.rates(docs, "source", "mass",
      Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2), maxRate = 0.9)
    val s1 = Mixture.sampleByRates(docs, "id", "source", plan)
      .select("id").as[Long].collect().sorted
    val s2 = Mixture.sampleByRates(docs.repartition(7).orderBy(col("id").desc),
        "id", "source", plan)
      .select("id").as[Long].collect().sorted
    assert(s1.sameElements(s2), "sample not layout-invariant")
    assert(s1.nonEmpty && s1.length < 2000)
    // per-source realized fraction tracks the planned rate (md5 coin is
    // uniform; 3-sigma bound on ~667 Bernoulli trials)
    val rates = plan.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val bySrc = docs.filter(col("id").isin(s1: _*))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, rate) <- rates) {
      val n = 667.0
      val got = bySrc.getOrElse(src, 0L).toDouble / n
      assert(math.abs(got - rate) < 3 * math.sqrt(rate * (1 - rate) / n) + 0.01,
        s"$src: got $got want ~$rate")
    }
  }

  test("retention keeps the highest score per cluster, ties to min id, " +
      "and points members at the winner") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 2L),
      (99L, 100L)).toDF("doc_id", "quality")
    val r = DupClusters.retention(clusters, docs, "doc_id", "quality")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, 1L, 5L, false, 2L),   // 2 and 3 tie at 9 -> min id 2 wins
      (2L, 1L, 9L, true, 2L),
      (3L, 1L, 9L, false, 2L),
      (10L, 10L, 4L, true, 10L),
      (11L, 10L, 2L, false, 10L)))
    // unclustered doc 99 is not re-emitted: output stays drop-list-sized
    assert(!r.exists(_._1 == 99L))
  }

  test("boilerplate: shingles over the doc-frequency threshold, per-doc share") {
    val docs = Seq(
      (1L, "legal header text alpha beta"),
      (2L, "legal header text gamma delta"),
      (3L, "legal header text"),
      (4L, "completely original content here today")).toDF("doc_id", "text")
    val b = Dedup.boilerplateShingles(docs, "doc_id", "text", k = 3, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(b.toSeq == Seq(("legal header text", 3L)))
    val share = Dedup.boilerplateShare(docs, "doc_id", "text", k = 3, minDocs = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 3 has 3 tokens -> 1 shingle, 100% boilerplate; doc 4 has none
    assert(share.find(_._1 == 3L).get == ((3L, 1L, 1L, 1.0)))
    assert(share.find(_._1 == 4L).get._3 == 0L)
    assert(share.find(_._1 == 1L).get == ((1L, 3L, 1L, round6(1.0 / 3))))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("asOfFiles: resolves the newest snapshot <= asOf; pre-history is empty") {
    val manifest = Seq(
      ("f1", 1L, 10L), ("f2", 1L, 20L),
      ("f1", 2L, 11L), ("f3", 2L, 30L)).toDF("path", "snapshot_seq", "bytes")
    def ls(asOf: Long) = Layout.asOfFiles(manifest, asOf)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(ls(1L).toSeq == Seq(("f1", 10L, 1L), ("f2", 20L, 1L)))
    assert(ls(2L).toSeq == Seq(("f1", 11L, 2L), ("f3", 30L, 2L)))
    assert(ls(5L).toSeq == Seq(("f1", 11L, 2L), ("f3", 30L, 2L))) // newest <= 5 is 2
    assert(ls(0L).isEmpty)
  }

  test("entropy: uniform is log2(k) bits, constant is 0, null is a value") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("c") ++
      Seq.fill(5)("d")).map(v => (v, "k", null.asInstanceOf[String]))
      .toDF("u", "const", "nul")
    val r = Stats.entropy(df, Seq("u", "const", "nul"))
      .orderBy("column").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    val byCol = r.map(t => t._1 -> t).toMap
    assert(byCol("u")._4 == 2.0 && byCol("u")._3 == 4L) // uniform 4-way
    assert(byCol("const")._4 == 0.0 && byCol("const")._5 == 1.0)
    assert(byCol("nul")._3 == 1L && byCol("nul")._5 == 1.0) // null counted
  }

  test("packedTexts: bins reconstruct the shard stream, straddlers cut " +
      "at the boundary, fills match binFill") {
    // one shard, capacity 5; docs of 3/4/2 tokens -> stream of 9 tokens:
    // bin0 = t1 t2 t3 u1 u2 | bin1 = u3 u4 v1 v2
    val docs = Seq(
      (1L, "t1 t2  t3"), // double space collapses
      (2L, "u1 u2 u3 u4"),
      (3L, "v1 v2"))
      .toDF("doc_id", "text")
      .withColumn("_shard", lit(0))
      .withColumn("_nt", TextAnalysis.tokenCountWs(col("text")).cast("long"))
    val manifest = Packing.packConcatCounted(docs, "doc_id", "_nt",
      capacity = 5, shards = 1, shardCol = Some("_shard"))
    val bins = Packing.packedTexts(manifest, docs, "doc_id", "text", capacity = 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(bins.toSeq == Seq(
      (0L, 2L, "t1 t2 t3 u1 u2"),
      (1L, 2L, "u3 u4 v1 v2")))
    // every bin's whitespace token count equals its binFill fill
    val fills = Packing.binFill(manifest, capacity = 5)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getLong(2)))
    val counted = bins.map { case (b, _, txt) => (b, txt.split(" ").length.toLong) }
    assert(counted.toSeq == fills.toSeq.map(f => (f._1, f._2)))
  }

  test("shuffleShards: deterministic, layout-invariant, dense 1-based ranks") {
    val ids = (1L to 500L).toDF("doc_id")
    val a = Sampling.shuffleShards(ids, "doc_id", seed = "s1", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Sampling.shuffleShards(ids.repartition(13), "doc_id", "s1", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)                   // layout-invariant
    assert(a.map(_._1).distinct.length == 500)   // every row exactly once
    // positions within each shard are exactly 1..shardSize
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a different seed yields a different permutation
    val c = Sampling.shuffleShards(ids, "doc_id", "s2", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(c.toSeq != a.toSeq)
  }

  test("corpusCard: counts, shares, exact interpolating median per group") {
    val docs = Seq(
      (1L, "a", "en", 10L), (2L, "a", "en", 20L),
      (3L, "a", "de", 30L), (4L, "a", "en", 40L),
      (5L, "b", "fr", 7L)).toDF("doc_id", "source", "lang", "n_chars")
    val card = Stats.corpusCard(docs, Seq("source"), "lang", "n_chars")
      .orderBy("source").collect()
    val a = card(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 4L && a.getLong(2) == 2L)
    assert(a.getLong(3) == 100L)
    assert(a.getDouble(4) == 25.0)      // even n: (20+30)/2 interpolated
    assert(a.getDouble(5) == 0.8)
    val b = card(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1L && b.getDouble(4) == 7.0)
  }
}
