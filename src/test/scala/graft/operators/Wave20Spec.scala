package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-5 wave-20 operators: silent-gap audit, Pearson correlations. */
class Wave20Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gapsAudit: max gap with earliest-start tie-break, threshold " +
      "count, single-event segments excluded") {
    val df = Seq(
      // segment a: gaps 60, 7200 (start 00:01), 7200 (start 02:01)
      ("a", ts("2026-01-01 00:00:00")), ("a", ts("2026-01-01 00:01:00")),
      ("a", ts("2026-01-01 02:01:00")), ("a", ts("2026-01-01 04:01:00")),
      ("b", ts("2026-01-01 00:00:00"))  // no gaps -> absent
    ).toDF("seg", "t")
    val out = Temporal.gapsAudit(df, "seg", "t", thresholdS = 3600L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a"))
    val a = out("a")
    assert(a.getLong(1) == 3L)                       // n_gaps
    assert(a.getLong(2) == 7200L)                    // max_gap_s
    // tie between the two 7200 s gaps resolves to the EARLIEST start
    assert(a.getLong(3) ==
      ts("2026-01-01 00:01:00").toInstant.getEpochSecond)
    assert(a.getLong(4) == 2L)                       // n_over (> 3600)
  }

  test("correlations: perfect linear r = 1, anti r = -1, constant " +
      "column null, pairwise-complete n") {
    val sch = StructType(Seq(StructField("x", DoubleType),
      StructField("y", DoubleType), StructField("z", DoubleType),
      StructField("c", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1.0, 2.0, -1.0, 5.0), Row(2.0, 4.0, -2.0, 5.0),
      Row(3.0, 6.0, -3.0, 5.0), Row(4.0, null, -4.0, 5.0))), sch)
    val out = Stats.correlations(df,
      Seq(("x", "y"), ("x", "z"), ("x", "c"))).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = out(("x", "y"))
    assert(xy.getLong(2) == 3L)                      // null y row excluded
    assert(xy.getDouble(3) == 1.0)
    assert(out(("x", "z")).getDouble(3) == -1.0)
    assert(out(("x", "c")).isNullAt(3))              // zero variance
  }
}
