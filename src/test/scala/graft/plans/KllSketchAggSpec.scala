package graft.plans

import graft.SparkSpec
import graft.operators.Drift
import org.apache.spark.sql.functions._

/** Custom TypedImperativeAggregate: KLL quantile sketches — accuracy,
  * mergeability (per-partition union == global), and the sketch-based KS.
  */
class KllSketchAggSpec extends SparkSpec {

  private lazy val uniform = spark.range(100000)
    .select((col("id") % 1000).cast("double").as("x"),
      (col("id") % 8).cast("int").as("part"))

  test("sketch quantiles are within KLL error of exact quantiles") {
    val bytes = uniform.agg(Kll.sketchAgg(col("x")).as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    val qs = Kll.quantiles(bytes, Seq(0.1, 0.5, 0.9))
    assert(math.abs(qs(0) - 100) < 30, s"p10=${qs(0)}")
    assert(math.abs(qs(1) - 500) < 30, s"p50=${qs(1)}")
    assert(math.abs(qs(2) - 900) < 30, s"p90=${qs(2)}")
  }

  test("per-partition sketches union to the global sketch (mergeable)") {
    val global = uniform.agg(Kll.sketchAgg(col("x")).as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    val parts = Drift.partitionKllSketches(uniform, "x")
      .collect().map(_.getAs[Array[Byte]]("sketch")).toSeq
    assert(parts.size == 8)
    val unioned = Kll.union(parts)
    val qg = Kll.quantiles(global, Seq(0.5))(0)
    val qu = Kll.quantiles(unioned, Seq(0.5))(0)
    assert(math.abs(qg - qu) < 40, s"global=$qg unioned=$qu")
  }

  test("sketch KS ~ 0 for same distribution, large for shifted") {
    val a = spark.range(50000).select((col("id") % 100).cast("double").as("x"))
    val b = spark.range(50000).select(((col("id") % 100) + 50).cast("double").as("x"))
    val same = Drift.ksSketch(a, a, "x")
    val diff = Drift.ksSketch(a, b, "x")
    assert(same < 0.02 && diff > 0.4, s"same=$same diff=$diff")
  }
}
