package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 wave-15 operators: completeness by segment, portable-MinHash
  * quality audit, dup-cluster purity.
  */
class Wave15Spec extends SparkSpec {
  import spark.implicits._

  test("completenessBySegment: per-(segment, column) null rates; a NULL " +
      "segment is a real segment") {
    val sch = StructType(Seq(StructField("src", StringType),
      StructField("a", StringType), StructField("b", LongType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("s1", null, 1L), Row("s1", "x", null), Row(null, null, 2L))), sch)
    val out = Stats.completenessBySegment(df, "src", Seq("a", "b"))
      .collect().map(r => ((Option(r.getString(0)).orNull, r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("s1", "a")) == ((1L, 2L, 0.5)))
    assert(out(("s1", "b")) == ((1L, 2L, 0.5)))
    assert(out((null, "a")) == ((1L, 1L, 1.0)))
    assert(out((null, "b")) == ((0L, 1L, 0.0)))
  }

  test("minHashPortableSig: deterministic, null on empty/null text, " +
      "identical docs share the signature") {
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "something else entirely"), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val sigs = df.select(col("id"),
      Dedup.minHashPortableSig(col("text"), k = 1, numHashes = 8).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(sigs(1L) != null && sigs(1L).length == 8)
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(4L) == null)
    // every slot is an md5 hex digest, never the 'g' sentinel
    assert(sigs(1L).forall(h => h.length == 32 && h.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))))
  }

  test("minHashQuality: identical docs estimate 1.0 with 0 error; " +
      "disjoint docs estimate 0.0; errors bounded by the MinHash math") {
    val df = Seq(
      (0L, "a b c d e f g h"), (1L, "a b c d e f g h"), // identical
      (2L, "p q r s t u v w"), (3L, "x y z aa bb cc dd ee"), // disjoint
      (4L, "a b c d e f g h"), (5L, "a b c d x y z w")) // J = 4/12
      .toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.minHashQuality(df, pairs, "doc_id", "text",
      k = 1, numHashes = 16).collect()
      .map(r => (r.getLong(0), (r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(out(0L) == ((1.0, 1.0, 0.0)))
    assert(out(2L)._1 == 0.0 && out(2L)._2 == 0.0)
    assert(out(4L)._2 == 0.3333) // exact J = 4/12
    // 16 slots: |err| can be at most 1; sanity-bound it to < 0.5 here
    assert(out(4L)._3 < 0.5)
  }

  test("purity: dominant label share with min-label tie-break; NULL label " +
      "is the '∅' label; source span counted") {
    val clusters = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L), (21L, 2L))
      .toDF("id", "cluster_id")
    val sch = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("src", StringType)))
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, "en", "s1"), Row(11L, "en", "s2"), Row(12L, null, "s1"),
      Row(20L, "de", "s1"), Row(21L, "fr", "s1"))), sch)
    val out = DupClusters.purity(clusters, docs, "doc_id", "lang", "src")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getLong(5)))).toMap
    // cluster 1: en x2 + null -> top en 2/3, 2 labels, 2 sources
    assert(out(1L) == ((3L, 2L, "en", 0.6667, 2L)))
    // cluster 2: de/fr tie at 1 -> min label 'de' wins
    assert(out(2L) == ((2L, 2L, "de", 0.5, 1L)))
  }
}
