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
}
