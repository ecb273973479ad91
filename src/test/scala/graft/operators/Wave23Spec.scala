package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-23 operators: CUSUM changepoint, per-segment top-k
  * tokens, sweep-line peak concurrency.
  */
class Wave23Spec extends SparkSpec {
  import spark.implicits._

  test("changepoint: closed-form split on a planted level shift; " +
      "equal-G tie breaks to the EARLIEST split; n=1 key absent") {
    val df = Seq(
      ("a", 1, 1L), ("a", 2, 1L), ("a", 3, 1L), ("a", 4, 9L), ("a", 5, 9L),
      // symmetric spike: G ties at t=1 and t=2 -> earliest wins
      ("b", 1, 0L), ("b", 2, 10L), ("b", 3, 0L),
      ("c", 1, 5L))
      .toDF("k", "t", "v")
    val out = Stats.changepoint(df, Seq("k"), "t", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b"))              // c (n=1) absent
    val a = out("a")
    // C=[1,2,3,12,21], T=21: G=|5C-21t| = 16,32,48,24 -> split t=3
    assert(a.getLong(1) == 5L && a.getInt(2) == 3 && a.getLong(3) == 48L)
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 9.0
      && a.getDouble(6) == 8.0)
    val b = out("b")
    // G=|3C-10t| at t=1,2: |0-10|=10, |30-20|=10 -> earliest split t=1
    assert(b.getInt(2) == 1 && b.getLong(3) == 10L)
    assert(b.getDouble(4) == 0.0 && b.getDouble(5) == 5.0)
  }

  test("topTokensBySegment: per-segment ranks, count-desc/token-asc " +
      "ties, NULL segment is a real segment; WindowGroupLimit lowering") {
    val df = Seq(
      (Some("en"), "x x x y y z"),
      (Some("de"), "a b b"),
      (None, "q q r")
    ).toDF("lang", "text")
    val res = TextAnalysis.topTokensBySegment(df, "lang", "text", 2)
    val out = res.collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2),
        r.getInt(3)))
      .toSet
    assert(out == Set(
      (Some("en"), "x", 3L, 1), (Some("en"), "y", 2L, 2),
      (Some("de"), "b", 2L, 1), (Some("de"), "a", 1L, 2),
      (None, "q", 2L, 1), (None, "r", 1L, 2)), out.mkString(","))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not lower to WindowGroupLimit:\n$plan")
  }

  test("peakConcurrency: overlap counting, half-open end-before-start " +
      "ties, midnight clipping") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val day = 86400L
    val df = Seq(
      // day 0: two overlapping 60s intervals -> peak 2 at t=10
      ts(0L), ts(10L),
      // back-to-back: starts exactly when the first pair's last ends
      // (ends sort before starts -> never 3 concurrent)
      ts(70L),
      // day 1: a single event 30s before midnight of day 2 (clipped)
      ts(2 * day - 30L)
    ).toDF("ts")
    val out = Temporal.peakConcurrency(df, "ts", 60L).orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2, out.mkString(","))
    assert(out(0) == (("1970-01-01", 2L, 10L)), out(0).toString)
    assert(out(1) == (("1970-01-02", 1L, 2 * day - 30L)), out(1).toString)
  }
}
