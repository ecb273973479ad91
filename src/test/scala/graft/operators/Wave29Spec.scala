package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-29 operators: join-explosion pre-flight advisor,
  * per-feed freshness audit, per-label embedding dispersion.
  */
class Wave29Spec extends SparkSpec {
  import spark.implicits._

  test("joinExplosion: per-key multiplicative contributions, integer " +
      "cross-multiplied hot flag, unmatched and null keys excluded") {
    val left = Seq(Some("a"), Some("a"), Some("b"), Some("b"), Some("b"),
      Some("c"), None).toDF("k")
    val right = Seq(Some("a"), Some("a"), Some("a"), Some("a"), Some("b"),
      Some("d"), None).toDF("k")
    val out = Layout.joinExplosion(left, "k", right, "k",
        hotFactor = 1L, topK = 100)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(5)))
    // a: 2x4=8 of total 11, 8*2keys > 1*11 -> hot; b: 3x1=3 -> not;
    // c and d match nothing; nulls never join
    assert(out.toSeq == Seq(("a", 2L, 4L, 8.0, true),
      ("b", 3L, 1L, 3.0, false)), out.mkString(","))
  }

  test("joinExplosion: topK truncates by contribution with key tie-break") {
    val df = Seq("a", "b", "b").toDF("k")
    val out = Layout.joinExplosion(df, "k", df, "k", hotFactor = 8L,
        topK = 1)
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("b"), out.mkString(","))
  }

  test("freshness: lag vs the data-defined watermark, stale flag, null " +
      "time/group rows excluded, exact integer seconds") {
    val df = Seq(
      (Some("feed_a"), Some(1000L)), (Some("feed_a"), Some(940L)),
      (Some("feed_b"), Some(1100L)), (Some("feed_b"), Some(400L)),
      (None, Some(1200L)),           // null group: excluded entirely
      (Some("feed_c"), None)         // null ts: excluded -> feed_c absent
    ).toDF("feed", "epoch")
      .select(col("feed"), timestamp_seconds(col("epoch")).as("ts"))
    val out = Temporal.freshness(df, "feed", "ts", staleAfterSeconds = 50L)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("feed_a", 2L, 1000L, 1100L, 100L, true),
      ("feed_b", 2L, 1100L, 1100L, 0L, false)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Temporal.freshness(df, "feed", "ts", staleAfterSeconds = 0L)
    }
  }

  test("labelDispersion: msd equals the sum of per-dim population " +
      "variances, centroid_sq_norm = ||c||^2, single-vector label is 0") {
    val df = Seq(
      (0, Seq(1.0, 3.0)), (0, Seq(3.0, 5.0)),
      (1, Seq(2.0, 2.0))
    ).toDF("label", "embedding")
    val out = Similarity.labelDispersion(df, "label", "embedding")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2),
        r.getDouble(3), r.getDouble(4)))
    // label 0: dims (1,3) and (3,5) -> var 1 each -> msd 2; c=(2,4) ->
    // ||c||^2 = 20. label 1: zero variance, c=(2,2) -> 8
    assert(out.toSeq == Seq((0, 2L, false, 2.0, 20.0),
      (1, 1L, false, 0.0, 8.0)), out.mkString(","))
  }

  test("labelDispersion: a RAGGED label (mixed vector lengths) flags and " +
      "nulls its msd instead of summing variances over different ns") {
    val df = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0)),  // ragged
      (1, Seq(4.0, 6.0)), (1, Seq(6.0, 8.0))
    ).toDF("label", "embedding")
    val out = Similarity.labelDispersion(df, "label", "embedding")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getBoolean(2), r.isNullAt(3)))
    assert(out.toSeq == Seq((0, true, true), (1, false, false)),
      out.mkString(","))
  }

  test("labelDispersion: brute-force cross-check — msd equals the mean " +
      "squared euclidean distance to the label centroid") {
    // deterministic pseudo-random 3-dim vectors, 2 labels
    val rows = (0 until 40).map { i =>
      val v = Seq(0, 1, 2).map(d => ((i * 37 + d * 101) % 17) / 4.0)
      (i % 2, v)
    }
    val df = rows.toDF("label", "embedding")
    val got = Similarity.labelDispersion(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val want = rows.groupBy(_._1).map { case (l, vs) =>
      val n = vs.size
      val c = Seq(0, 1, 2).map(d => vs.map(_._2(d)).sum / n)
      l -> vs.map(v => v._2.zip(c).map { case (x, m) =>
        (x - m) * (x - m) }.sum).sum / n
    }
    want.foreach { case (l, m) =>
      assert(math.abs(got(l) - m) < 1e-3, s"label $l: got ${got(l)} want $m")
    }
  }
}
