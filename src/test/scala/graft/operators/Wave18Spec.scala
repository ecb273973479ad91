package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 wave-18 operators: top-k rank drift, segment vocabulary
  * Jaccard, split distribution parity.
  */
class Wave18Spec extends SparkSpec {
  import spark.implicits._

  test("rankDrift: entered/left/swapped keys with rank shifts; ranks " +
      "tie-break on the key; keys outside both top-k lists are absent") {
    val a = Seq("x", "x", "x", "y", "y", "z").toDF("k")
    val b = Seq("y", "y", "y", "w", "w", "z").toDF("k")
    val out = Drift.rankDrift(a, b, "k", 2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("x", "y", "w"))   // z never makes a top-2
    val x = out("x")
    assert(x.getInt(1) == 1 && x.isNullAt(2) && x.getString(6) == "only_a")
    val y = out("y")
    assert(y.getInt(1) == 2 && y.getInt(2) == 1)
    assert(y.getInt(5) == -1 && y.getString(6) == "both") // moved up one
    val w = out("w")
    assert(w.isNullAt(1) && w.getInt(2) == 2 && w.getString(6) == "only_b")
  }

  test("segmentVocabJaccard: intersection over union of DISTINCT type " +
      "sets; disjoint pairs absent; NULL segment becomes the sentinel") {
    val sch = StructType(Seq(StructField("src", StringType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("A", "a b c"), Row("A", "a a"),   // types {a,b,c}
      Row("B", "b c d"),                    // types {b,c,d}
      Row(null, "x"))), sch)                // types {x}
    val out = TextAnalysis.segmentVocabJaccard(df, "src", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (A,B) intersects: |{b,c}| = 2, union 4 -> J = 0.5; "<null>"
    // shares nothing with either
    assert(out.keySet == Set(("A", "B")))
    assert(out(("A", "B")) == ((3L, 3L, 2L, 0.5)))
  }

  test("splitParity: identical (constant) distributions score PSI = 0; " +
      "a zero-weight split surfaces as n = 0 with null PSI") {
    val df = spark.range(1, 1001).toDF("id").withColumn("v", lit(42.0))
    val out = Sampling.splitParity(df, "id",
      Seq("tr" -> 0.5, "va" -> 0.5), "v", lo = 0.0, hi = 100.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("va"))            // baseline itself not scored
    assert(out("va").getLong(1) > 0L)
    assert(out("va").getDouble(2) == 0.0)      // p = q in every bucket
    val empty = Sampling.splitParity(df, "id",
      Seq("tr" -> 1.0, "nix" -> 0.0), "v", lo = 0.0, hi = 100.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(empty("nix").getLong(1) == 0L)
    assert(empty("nix").isNullAt(2))           // a finding, not a fake max
  }

  test("splitParity: PSI is non-negative and every split's n sums to the " +
      "non-null total") {
    val df = spark.range(1, 2001).toDF("id")
      .withColumn("v", (col("id") * 7919 % 256).cast("double"))
    val rows = Sampling.splitParity(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      "v", lo = 0.0, hi = 256.0, bins = 8).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getDouble(2) >= 0.0)
    }
  }
}
