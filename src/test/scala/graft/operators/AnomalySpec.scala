package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // series a: 9 quiet points + one 100x spike; series b: constant
  private def series = (
    (1 to 9).map(i => ("a", i, 10.0 + (i % 3))) :+ (("a", 10, 1000.0))
  ) ++ (1 to 5).map(i => ("b", i, 7.0))

  private def df = series.toDF("metric", "t", "value")

  test("one spike in a noisy series is the only flagged point") {
    val flagged = Anomaly.robustZ(df, Seq("metric"), "value")
      .filter(col("is_anomaly"))
      .select("metric", "t").as[(String, Int)].collect()
    assert(flagged.toSeq == Seq(("a", 10)))
  }

  test("the spike does not inflate its own threshold (robustness)") {
    val row = Anomaly.robustZ(df, Seq("metric"), "value")
      .filter(col("metric") === "a" && col("t") === 10)
      .select("med", "mad", "z").head()
    // median/MAD ignore the spike: med ~11, mad ~1 -> z in the hundreds.
    // mean/stddev would put the spike at z ~ 2.8 and MISS it at k=3.5.
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 1.0)
    assert(row.getDouble(2) > 100.0)
  }

  test("constant series: zero MAD degenerates to any-change, z null") {
    val shifted = df.union(Seq(("b", 6, 8.0)).toDF("metric", "t", "value"))
    val b = Anomaly.robustZ(shifted, Seq("metric"), "value")
      .filter(col("metric") === "b")
      .select(col("t"), col("is_anomaly"), col("z").isNull.as("zn"))
      .as[(Int, Boolean, Boolean)].collect().sortBy(_._1)
    assert(b.forall(_._3), "z must be null when mad == 0")
    assert(b.filter(_._2).map(_._1).toSeq == Seq(6))
  }

  test("plan: summary joins are broadcast (series-sized, never shuffled)") {
    val plan = Anomaly.robustZ(df, Seq("metric"), "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"summary join shuffled:\n$plan")
  }

  test("histogram groupMedian equals exact percentile: odd, even, ties") {
    // odd n with duplicates, even n interpolating between distinct middles
    val data = Seq(("a", 1.0), ("a", 3.0), ("a", 3.0), ("a", 7.0), ("a", 9.0),
      ("b", 2.0), ("b", 4.0), ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    val got = Anomaly.groupMedian(data, Seq("g"), "v")
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 3.0, "b" -> 7.0), got.toString)
    val exact = data.groupBy("g").agg(percentile(col("v"), lit(0.5)).as("m"))
      .as[(String, Double)].collect().toMap
    assert(got == exact, s"hist=$got percentile=$exact")
  }

  test("rowOutliers flags exactly the injected rows; corpus-shaped stats agree with robustZ") {
    // 300 quiet rows per group + 3 injected 50x spikes
    val quiet = (1 to 300).flatMap(i => Seq(("a", i.toLong, (100 + i % 7).toDouble),
      ("b", i.toLong + 1000, (40 + i % 5).toDouble)))
    val spikes = Seq(("a", 9001L, 5000.0), ("a", 9002L, 5100.0), ("b", 9003L, 2000.0))
    val rows = (quiet ++ spikes).toDF("g", "id", "v")
    val out = Anomaly.rowOutliers(rows, Seq("g"), "v")
    val flagged = out.filter(col("is_outlier")).select("id").as[Long].collect().sorted
    assert(flagged.toSeq == Seq(9001L, 9002L, 9003L), flagged.mkString(","))
    // med/mad identical to the percentile-based series form on the same data
    val histStats = out.select("g", "med", "mad").distinct()
      .as[(String, Double, Double)].collect()
      .map { case (g, m, d) => g -> (m, d) }.toMap
    val seriesStats = Anomaly.robustZ(rows, Seq("g"), "v")
      .select("g", "med", "mad").distinct()
      .as[(String, Double, Double)].collect()
      .map { case (g, m, d) => g -> (m, d) }.toMap
    assert(histStats == seriesStats, s"hist=$histStats series=$seriesStats")
  }

  test("rowOutliers: zero-MAD group degenerates to any-change with null z") {
    val rows = (Seq.fill(9)(("c", 5.0)) :+ (("c", 6.0)))
      .zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      .toDF("g", "id", "v")
    val out = Anomaly.rowOutliers(rows, Seq("g"), "v")
      .select(col("v"), col("is_outlier"), col("z").isNull.as("zn"))
      .as[(Double, Boolean, Boolean)].collect()
    assert(out.forall(_._3), "z must be null at mad == 0")
    assert(out.filter(_._2).map(_._1).toSeq == Seq(6.0))
  }

  test("plan: rowOutliers joins the tiny stats broadcast, no corpus SortMergeJoin") {
    val rows = (1 to 100).map(i => ("a", i.toLong, (i % 9).toDouble)).toDF("g", "id", "v")
    val plan = Anomaly.rowOutliers(rows, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"stats join shuffled:\n$plan")
  }
}
