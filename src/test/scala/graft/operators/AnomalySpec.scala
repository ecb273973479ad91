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
}
