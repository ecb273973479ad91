package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 wave-16 operators: shingle doc-frequency histogram, dedup ROI
  * by segment, PMI collocations.
  */
class Wave16Spec extends SparkSpec {
  import spark.implicits._

  test("shingleDfHistogram: df buckets count distinct shingles; docs " +
      "under k tokens contribute nothing") {
    val df = Seq(
      (1L, "a b c d"),  // shingles: "a b c", "b c d"
      (2L, "a b c"),    // shingle: "a b c"
      (3L, "x y")       // too short: none
    ).toDF("id", "text")
    val out = Dedup.shingleDfHistogram(df, "text", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "a b c" in 2 docs; "b c d" in 1
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("dedupImpact: drops attribute to the right segment, a clean " +
      "segment reports zeros, a NULL segment is a real segment") {
    val retained = Seq((10L, true), (11L, false), (20L, true), (21L, false))
      .toDF("id", "keep")
    val sch = StructType(Seq(StructField("doc_id", LongType),
      StructField("src", StringType), StructField("tk", LongType)))
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, "s1", 100L), Row(11L, "s1", 40L), Row(20L, null, 10L),
      Row(21L, null, 30L), Row(30L, "s2", 7L))), sch)
    val out = DupClusters.dedupImpact(retained, docs, "doc_id", "src",
      col("tk")).collect().map(r => Option(r.getString(0)).orNull ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out("s1") == ((2L, 140L, 1L, 40L, 0.285714)))
    assert(out(null) == ((2L, 40L, 1L, 30L, 0.75)))
    assert(out("s2") == ((1L, 7L, 0L, 0L, 0.0)))
  }

  test("pmiPairs: a stuck pair scores ln(4) on the two-token corpus; " +
      "minCount gates sparse pairs") {
    // ten identical two-token docs: pair "a b" x10, tokens a x10, b x10
    val df = (1 to 10).map(i => (i.toLong, "a b")).toDF("id", "text")
    val rows = TextAnalysis.pmiPairs(df, "text", minCount = 5).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((10L, 10L, 10L)))
    // pmi = ln((10/10) / ((10/20) * (10/20))) = ln 4
    assert(r.getDouble(5) == math.rint(math.log(4.0) * 1e4) / 1e4)
    // minCount above the pair count -> empty
    assert(TextAnalysis.pmiPairs(df, "text", minCount = 11).count() == 0L)
  }

  test("transitions: per-key lead pairs, row-conditional probabilities, " +
      "terminal events contribute nothing") {
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 1L, "c")).toDF("user_id", "event_id", "event_type")
    val out = Temporal.transitions(ev, "user_id", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // user 1: a->b, b->a, a->c; user 2's single event is terminal
    assert(out(("a", "b")) == ((1L, 0.5)))
    assert(out(("a", "c")) == ((1L, 0.5)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("zipfFit: two ranks with counts 8 and 2 fit slope -2 and " +
      "intercept 3 ln 2 exactly") {
    val docs = ((1 to 8).map(i => (i.toLong, "aa")) ++
      (9 to 10).map(i => (i.toLong, "bb"))).toDF("id", "text")
    val r = TextAnalysis.zipfFit(docs, "text", topN = 2).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == -2.0)
    assert(r.getDouble(2) == math.rint(3 * math.log(2.0) * 1e4) / 1e4)
  }
}
