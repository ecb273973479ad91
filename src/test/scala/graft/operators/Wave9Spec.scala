package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-9 operators: sequence-ordering audit and the k-anonymity
  * release gate (span-kind stats and the funnel are oracle-checked
  * compositions in SparkEntry).
  */
class Wave9Spec extends SparkSpec {
  import spark.implicits._

  test("orderViolations: backward rows against the running max; " +
      "first row per key never flags") {
    val ev = Seq(
      (1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 150L), // 3 regresses vs 200
      (1L, 4L, 210L),                                  // recovers
      (2L, 1L, 50L),                                   // lone row: no prev
      (3L, 1L, 90L), (3L, 2L, 10L)                     // immediate regress
    ).toDF("user_id", "event_id", "ts")
    val out = Temporal.orderViolations(ev, "user_id", "event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set((1L, 3L, 150L, 200L), (3L, 2L, 10L, 90L)))
  }

  test("kAnonymityRisk: combos under k surface, nulls are members") {
    val df = Seq(
      ("en", "a"), ("en", "a"), ("en", "a"),
      ("de", "b"),
      (null.asInstanceOf[String], "c"), (null.asInstanceOf[String], "c")
    ).toDF("lang", "src")
    val out = Stats.kAnonymityRisk(df, Seq("lang", "src"), k = 3L)
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2))).toSet
    assert(out == Set((Some("de"), "b", 1L), (None, "c", 2L)))
  }

  test("benford: exact expectations, digit from any rendering") {
    import spark.implicits._
    // 30 values: first digits 1 x15, 2 x9, 3 x6 (not Benford; chi2 > 0)
    val vals = Seq.fill(15)(0.019) ++ Seq.fill(9)(2000.0) ++
      Seq.fill(6)(3.5e7)
    val df = vals.toDF("v")
    val out = Stats.benford(df, "v").orderBy("digit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(x => (x._1, x._2)).toSeq ==
      Seq((1, 15L), (2, 9L), (3, 6L)))
    // expected(1) = log10(2) * 30
    assert(math.abs(out(0)._3 - math.log10(2.0) * 30) < 1e-5)
  }

  test("nullPatterns: correlated nulls form one pattern, order fixed") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some("b")), (None, None), (Some("c"), None)
    ).toDF("x", "y")
    val out = Stats.nullPatterns(df, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("--" -> 1L, "NN" -> 1L, "-N" -> 1L))
  }
}
