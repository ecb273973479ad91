package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-7 operators: embedding hygiene, cross-source duplicate
  * provenance, canonical text normalization, IQR fences, and the
  * partition-layout health report.
  */
class Wave7Spec extends SparkSpec {
  import spark.implicits._

  test("vecHealth: disjoint priority classes, counts sum to corpus") {
    val rows = Seq(
      (1L, Some(Seq(1.0f, 2.0f))),            // ok
      (2L, None),                             // null_vec
      (3L, Some(Seq(1.0f))),                  // wrong_dim
      (4L, Some(Seq(Float.NaN, 1.0f))),       // has_nan
      (5L, Some(Seq(Float.PositiveInfinity, 0f))), // has_nan (non-finite)
      (6L, Some(Seq(0.0f, 0.0f))),            // zero_vec
      (7L, Some(Seq(Float.NaN)))              // wrong_dim wins over nan
    ).toDF("id", "vec")
    val out = Similarity.vecHealth(rows, "vec", expectedDim = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("ok" -> 1L, "null_vec" -> 1L, "wrong_dim" -> 2L,
      "has_nan" -> 2L, "zero_vec" -> 1L))
    assert(out.values.sum == 7L)
  }

  test("sourceOverlap: distinct shared contents per source pair") {
    val df = Seq(
      ("hello  world", "a"), ("hello world", "b"), // same normalized
      ("hello world", "b"),                        // dup within b: once
      ("unique a", "a"), ("other", "c"), ("hello world", "c")
    ).toDF("text", "source")
    val out = Dedup.sourceOverlap(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("normalizeText: control strip, whitespace collapse, idempotent") {
    val df = Seq("  AB\t\tc  d\n", "already canonical").toDF("t")
    val once = df.select(TextAnalysis.normalizeText(col("t")).as("n"))
    assert(once.as[String].collect().toSeq ==
      Seq("a b c d", "already canonical"))
    val twice = once.select(TextAnalysis.normalizeText(col("n")).as("n2"),
      col("n"))
    assert(twice.filter(col("n2") =!= col("n")).count() == 0L)
  }

  test("iqrOutliers: fences from exact quartiles; null group kept") {
    // group a: values 1..4 plus outlier 100 -> q1=2, q3=4 over
    // (1,2,3,4,100): p25 = 2, p75 = 4, iqr 2 -> fences [-1, 7]
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      (null.asInstanceOf[String], 5L)).toDF("g", "v")
    val out = Stats.iqrOutliers(df, Seq("g"), "v").collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(5), r.getLong(6))))
      .toMap
    assert(out(Some("a")) == ((5L, 1L))) // 100 outside [-1, 7]
    assert(out(None) == ((1L, 0L)))      // single-value group, no outlier
  }

  test("partitionHealth: quantiles, skew ratio, small-file fraction") {
    val m = Seq(
      ("p1", "f1", 100L), ("p1", "f2", 100L), ("p1", "f3", 100L),
      ("p1", "f4", 700L),
      ("p2", "g1", 500L)
    ).toDF("part", "path", "bytes")
    val out = Layout.partitionHealth(m, smallFileBytes = 200L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5),
          r.getDouble(6)))).toMap
    // p1: p50 of (100,100,100,700) = 100, skew 7.0, small 3/4
    assert(out("p1") == ((4L, 1000L, 100.0, 7.0, 0.75)))
    assert(out("p2") == ((1L, 500L, 500.0, 1.0, 0.0)))
  }
}
