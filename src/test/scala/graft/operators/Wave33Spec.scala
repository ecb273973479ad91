package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-33 operators: seasonally-adjusted volume anomaly,
  * rule-bound relaxation suggestions, null-run (dark-window) audit.
  */
class Wave33Spec extends SparkSpec {
  import spark.implicits._

  test("seasonalAnomaly: a cell at 5x its hour median flags, in-family " +
      "cells don't, single-date hours never flag (median = observation)") {
    // hour 1 on three days: counts 2, 2, 10 -> median 2, 10 > 4 flags;
    // hour 2 on one day only: count 7, median 7 -> never flags
    val rows =
      Seq.fill(2)(86400L * 0 + 3600L) ++ Seq.fill(2)(86400L * 1 + 3600L) ++
      Seq.fill(10)(86400L * 2 + 3600L) ++ Seq.fill(7)(86400L * 2 + 7200L)
    val df = rows.map(e => ("a", e)).toDF("g", "epoch")
      .select(col("g"), timestamp_seconds(col("epoch")).as("ts"))
    val out = Temporal.seasonalAnomaly(df, "g", "ts", factor = 2.0)
      .orderBy("day", "hour").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("1970-01-01", 1, 2L, 2.0, false),
      ("1970-01-02", 1, 2L, 2.0, false),
      ("1970-01-03", 1, 10L, 2.0, true),
      ("1970-01-03", 2, 7L, 7.0, false)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Temporal.seasonalAnomaly(df, "g", "ts", factor = 1.0)
    }
  }

  test("boundSuggestions: violated bounds suggest the observed extreme, " +
      "clean bounds keep the declared value, nulls never count") {
    val df = Seq(Some(5L), Some(250L), Some(-3L), None).toDF("x")
    val out = Inference.boundSuggestions(df, Seq(
        ("hi", "x", None, Some(100.0)),
        ("lo", "x", Some(0.0), None),
        ("both_clean", "x", Some(-10.0), Some(1000.0))))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(5),
        if (r.isNullAt(8)) None else Some(r.getDouble(8)),
        if (r.isNullAt(9)) None else Some(r.getDouble(9))))
    assert(out.toSeq == Seq(
      ("both_clean", 0L, 0L, Some(-10.0), Some(1000.0)),
      ("hi", 0L, 1L, None, Some(250.0)),
      ("lo", 1L, 0L, Some(-3.0), None)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Inference.boundSuggestions(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Inference.boundSuggestions(df, Seq(("bad", "x", None, None)))
    }
  }

  test("nullRuns: consecutive nulls in segment order form runs; max run " +
      "with its earliest start; null-free segments absent") {
    val df = Seq(
      ("s1", 1L, Some(9L)), ("s1", 2L, None), ("s1", 3L, None),
      ("s1", 4L, Some(9L)), ("s1", 5L, None),
      ("s2", 1L, Some(9L)), ("s2", 2L, Some(9L)),
      // s3: two runs of equal length 2 -> earliest start wins
      ("s3", 1L, None), ("s3", 2L, None), ("s3", 3L, Some(9L)),
      ("s3", 4L, None), ("s3", 5L, None)
    ).toDF("seg", "ord", "v")
    val out = Stats.nullRuns(df, "seg", "ord", "v")
      .orderBy("segment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("s1", 2L, 3L, 2L, 2L),
      ("s3", 2L, 4L, 2L, 1L)), out.mkString(","))
  }
}
