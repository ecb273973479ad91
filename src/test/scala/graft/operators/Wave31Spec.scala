package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-31 operators: cross-field consistency audit, LSH
  * banding-parameter advisor, hour-of-day load profile.
  */
class Wave31Spec extends SparkSpec {
  import spark.implicits._

  test("crossFieldAudit: field-vs-field violations counted with smallest " +
      "offending id, null comparisons violate, clean check yields null id") {
    val df = Seq(
      (1L, Some(3L), "abc"),
      (2L, Some(9L), "ab"),    // mismatch
      (3L, None, "abcd"),      // null n_chars: cannot evaluate -> violates
      (4L, Some(1L), "a")
    ).toDF("doc_id", "n_chars", "text")
    val out = Validate.crossFieldAudit(df, Seq(
        ("chars_match", col("n_chars") === length(col("text"))),
        ("id_pos", col("doc_id") > 0)), "doc_id")
      .orderBy("invariant").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out.toSeq == Seq(
      ("chars_match", 2L, 4L, 0.5, 2L),
      ("id_pos", 0L, 4L, 0.0, -1L)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Validate.crossFieldAudit(df, Seq.empty, "doc_id")
    }
  }

  test("bandingAdvisor: all factorizations of numHashes, knee closed " +
      "form, exactly one recommended row nearest the target") {
    val out = Dedup.bandingAdvisor(spark, numHashes = 16,
        targetThreshold = 0.5)
      .orderBy("bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(5)))
    assert(out.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 16L), (2L, 8L), (4L, 4L), (8L, 2L), (16L, 1L)),
      out.mkString(","))
    // knee(4 bands, 4 rows) = (1/4)^(1/4) ~ 0.7071; knee(8,2) =
    // (1/8)^(1/2) ~ 0.3536; 16x1 -> 1/16 = 0.0625; nearest to 0.5 is
    // (8,2) at |0.3536-0.5| = 0.1464 vs (4,4) at 0.2071
    val byBands = out.map(x => x._1 -> x).toMap
    assert(byBands(4L)._3 == 0.7071 && byBands(8L)._3 == 0.3536,
      out.mkString(","))
    assert(out.filter(_._4).map(_._1).toSeq == Seq(8L), out.mkString(","))
  }

  test("loadProfile: per-group hour counts, exact shares, deterministic " +
      "peak (count desc then hour asc), null rows excluded") {
    val df = Seq(
      ("a", Some(3600L)), ("a", Some(3700L)),  // hour 1 x2
      ("a", Some(7300L)),                      // hour 2 x1
      ("b", Some(0L)), ("b", Some(3600L)),     // hours 0 and 1: tie -> 0
      ("b", None), (null, Some(0L))
    ).toDF("g", "epoch")
      .select(col("g"), timestamp_seconds(col("epoch")).as("ts"))
    val out = Temporal.loadProfile(df, "g", "ts")
      .orderBy("key", "hour").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 1, 2L, 0.666667, true), ("a", 2, 1L, 0.333333, false),
      ("b", 0, 1L, 0.5, true), ("b", 1, 1L, 0.5, false)),
      out.mkString(","))
  }
}
