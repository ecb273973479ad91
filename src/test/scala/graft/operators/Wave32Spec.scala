package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-32 operators: mime-mismatch audit, undeclared-props
  * discovery, bucket-count planner.
  */
class Wave32Spec extends SparkSpec {
  import spark.implicits._

  test("mimeMismatch: magic-byte detection vs declared mime — matches, " +
      "a mislabeled WAV, and an unparseable payload as 'unknown'") {
    val rows = Seq(
      ("m-1", "image/png", Multimodal.HeaderBytes.png(10, 20)),
      ("m-2", "image/png", Multimodal.HeaderBytes.wav(8000, 1, 100)),
      ("m-3", "audio/wav", Multimodal.HeaderBytes.wav(8000, 2, 50)),
      ("m-4", "audio/wav", Array[Byte](1, 2, 3, 4))
    ).toDF("media_ref", "mime", "content")
    val out = Multimodal.mimeMismatch(rows)
      .orderBy("declared_mime", "detected_mime").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("audio/wav", "audio/wav", 1L, "m-3", false),
      ("audio/wav", "unknown", 1L, "m-4", true),
      ("image/png", "audio/wav", 1L, "m-2", true),
      ("image/png", "image/png", 1L, "m-1", false)), out.mkString(","))
  }

  test("detectMime: every shipped container + null + garbage") {
    import Multimodal.{HeaderBytes => HB, HeaderCodec => HC}
    assert(HC.detectMime(HB.png(4, 4)) == "image/png")
    assert(HC.detectMime(HB.wav(8000, 1, 10)) == "audio/wav")
    assert(HC.detectMime(null) == "unknown")
    assert(HC.detectMime(Array[Byte](0, 1)) == "unknown")
  }

  test("undeclaredProps: injected keys surface with doc shares, declared " +
      "keys invisible, null and invalid JSON excluded from everything") {
    val df = Seq(
      """{"k": 1, "debug": true}""",
      """{"k": 2}""",
      """{"k": 3, "debug": false, "exp": "a"}""",
      "not json",
      null
    ).toDF("props")
    val out = Inference.undeclaredProps(df, "props", Seq("k"))
      .orderBy("prop").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // denominator counts the 4 non-null rows ("not json" is non-null but
    // yields no keys); debug in 2 of 4, exp in 1 of 4
    assert(out.toSeq == Seq(("debug", 2L, 0.5), ("exp", 1L, 0.25)),
      out.mkString(","))
  }

  test("bucketPlan: ceil by integer DIV, next-pow2 via binary length, " +
      "exact-power and tiny-partition edges, integer est bytes") {
    val df = Seq(
      ("a", 1L),                      // b0 = 1 -> 1 bucket
      ("b", 4000L),                   // b0 = 2 -> 2 (exact power stays)
      ("c", 4001L), ("c", 1999L)      // total 6000 -> b0 = 3 -> 4
    ).toDF("part", "bytes")
    val out = Layout.bucketPlan(df, Seq("part"), targetBucketBytes = 2000L)
      .orderBy("part").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 1L, 1L, 1L, 1L),
      ("b", 1L, 4000L, 2L, 2000L),
      ("c", 2L, 6000L, 4L, 1500L)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Layout.bucketPlan(df, Seq.empty, 2000L)
    }
  }
}
