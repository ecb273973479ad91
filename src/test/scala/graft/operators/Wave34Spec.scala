package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-34 operators: per-day user lifecycle, DAU/WAU
  * stickiness, split shingle-coverage.
  */
class Wave34Spec extends SparkSpec {
  import spark.implicits._

  private def evts(rows: (Long, Long)*) =
    rows.toDF("u", "epoch")
      .select(col("u"), timestamp_seconds(col("epoch")).as("ts"))

  test("userLifecycle: new / returning / last-seen per day; multiple " +
      "events per user-day count once") {
    val day = 86400L
    val df = evts(
      (1L, 0L), (1L, 10L),            // u1 day0 (twice: one user-day)
      (2L, 0L),                        // u2 day0 only -> last seen day0
      (1L, day), (3L, day),            // day1: u1 returns, u3 new
      (1L, 2 * day))                   // day2: u1 only, last seen day2
    val out = Temporal.userLifecycle(df, "u", "ts").orderBy("day")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("1970-01-01", 2L, 2L, 0L, 1L),  // u1,u2 active+new; u2 last seen
      ("1970-01-02", 2L, 1L, 1L, 1L),  // u3 new, u1 returning, u3 last
      ("1970-01-03", 1L, 0L, 1L, 1L)), out.mkString(","))
  }

  test("stickiness: trailing-window distinct users, partial early " +
      "windows, ghost trailing days dropped, dau <= wau always") {
    val day = 86400L
    val df = evts((1L, 0L), (2L, 0L), (1L, day), (3L, 3 * day))
    val out = Temporal.stickiness(df, "u", "ts", windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // day0: dau {1,2}=2, wau(window d-2..d collapses to d0) = 2
    // day1: dau {1}=1, wau {1,2} = 2
    // day3: dau {3}=1, wau over d1..d3 = {1,3} = 2; days 2,4,5 ghost/no-dau
    assert(out.toSeq == Seq(
      ("1970-01-01", 2L, 2L, 1.0),
      ("1970-01-02", 1L, 2L, 0.5),
      ("1970-01-04", 1L, 2L, 0.5)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Temporal.stickiness(df, "u", "ts", windowDays = 0)
    }
  }

  test("splitShingleCoverage: fully-covered, partially-covered and " +
      "disjoint splits against the reference vocabulary") {
    val df = Seq(
      ("train", "a b c d e"),          // shingles: abc bcd cde
      ("val", "a b c"),                // abc -> 1/1 covered
      ("test", "a b c x y z w"),       // abc bcx cxy xyz yzw -> 1/5
      ("heldout", "p q r s")           // pqr qrs -> 0/2
    ).toDF("split", "text")
    val out = Dedup.splitShingleCoverage(df, "text", "split",
        refSplit = "train", k = 3)
      .orderBy("split").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("heldout", 2L, 0L, 0.0),
      ("test", 5L, 1L, 0.2),
      ("val", 1L, 1L, 1.0)), out.mkString(","))
  }
}
