package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 wave-17 operators: hour-of-day periodicity, inter-event
  * burstiness, vocabulary richness, Theil's uncertainty coefficient.
  */
class Wave17Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("periodicity: counts per present hour, shares sum to 1, chi2 term " +
      "is (o-e)^2/e against uniform over PRESENT buckets; null ts excluded") {
    val df = Seq(
      Some(ts("2026-01-01 03:00:01")), Some(ts("2026-01-01 03:10:00")),
      Some(ts("2026-01-01 03:59:59")), Some(ts("2026-01-02 07:00:00")),
      None
    ).toDF("t")
    val out = Temporal.periodicity(df, "t").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // 4 events over 2 present buckets -> e = 2 per bucket
    assert(out(3) == ((3L, 0.75, 0.5)))   // (3-2)^2/2
    assert(out(7) == ((1L, 0.25, 0.5)))   // (1-2)^2/2
    assert(out.size == 2)
  }

  test("burstiness: a metronome scores B = -1 and cv = 0; a bursty key " +
      "scores B > -1; keys under minGaps are excluded") {
    val df = Seq(
      // metronome: gaps 60, 60, 60
      ("m", ts("2026-01-01 00:00:00")), ("m", ts("2026-01-01 00:01:00")),
      ("m", ts("2026-01-01 00:02:00")), ("m", ts("2026-01-01 00:03:00")),
      // bursty: gaps 1, 1, 598
      ("b", ts("2026-01-01 00:00:00")), ("b", ts("2026-01-01 00:00:01")),
      ("b", ts("2026-01-01 00:00:02")), ("b", ts("2026-01-01 00:10:00")),
      // one gap only: excluded at minGaps = 2
      ("x", ts("2026-01-01 00:00:00")), ("x", ts("2026-01-01 00:00:05"))
    ).toDF("k", "t")
    val out = Temporal.burstiness(df, "k", "t").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("m", "b"))
    val m = out("m")
    assert(m.getLong(1) == 3L)                 // n_gaps
    assert(m.getDouble(2) == 60.0)             // mean
    assert(m.getDouble(3) == 0.0)              // sd
    assert(m.getDouble(4) == 0.0)              // cv
    assert(m.getDouble(5) == -1.0)             // B: zero-variance metronome
    val b = out("b")
    assert(b.getLong(1) == 3L && b.getDouble(2) == 200.0)
    assert(b.getDouble(5) > 0.0)               // heavy burst: B well above 0
  }

  test("vocabularyRichness: types, hapax share, punctuation-normalized " +
      "tokens; a NULL segment is a real segment") {
    val sch = StructType(Seq(StructField("src", StringType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", "the cat, the hat"),  // tokens: the x2, cat, hat
      Row("a", "the cat"),           // the, cat
      Row(null, "zz zz"))), sch)
    val out = TextAnalysis.vocabularyRichness(df, "src", "text").collect()
      .map(r => Option(r.getString(0)).orNull ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // segment a: 6 tokens, 3 types (the x3, cat x2, hat x1), hapax = hat
    assert(out("a") == ((6L, 3L, 0.5, 0.333333)))
    assert(out(null) == ((2L, 1L, 0.5, 0.0)))
  }

  test("theilsU: a determining column explains all of the determined " +
      "column's entropy (U = 1 one way, < 1 the other); a constant " +
      "column yields null U") {
    // b determines a (b=1,2 -> a=x; b=3 -> a=y), but a does NOT
    // determine b
    val df = Seq(("x", "1"), ("x", "1"), ("x", "2"), ("y", "3"))
      .toDF("a", "b")
    val r = Stats.theilsU(df, Seq(("a", "b"))).collect()(0)
    assert(r.getDouble(5) == 1.0)              // u_a_given_b
    assert(r.getDouble(6) < 1.0)               // u_b_given_a
    // self-pair pins the scale: U = 1 both ways
    val s = Stats.theilsU(df, Seq(("a", "a"))).collect()(0)
    assert(s.getDouble(5) == 1.0 && s.getDouble(6) == 1.0)
    // constant column: H = 0 -> U undefined (null) in that direction
    val c = Stats.theilsU(df.withColumn("k", lit("c")), Seq(("k", "b")))
      .collect()(0)
    assert(c.isNullAt(5))                      // u_k_given_b: H(k) = 0
  }
}
