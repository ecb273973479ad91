package graft.operators

import graft.SparkSpec
import graft.rules.{ConstVal, Keywords, Rule}
import org.apache.spark.sql.functions._

/** Round-5 wave-35 operators: composite DQ score, volume contract,
  * media storage budget.
  */
class Wave35Spec extends SparkSpec {
  import spark.implicits._

  test("dqScore: completeness / validity / uniqueness decouple and blend " +
      "into the weighted score; null key passes rules but not presence") {
    val df = Seq(
      (Some(1L), Some("en"), "aaa"),
      (Some(2L), Some("xx"), "bbb"),   // invalid lang
      (Some(3L), None, "aaa"),         // incomplete (null lang passes rule)
      (Some(4L), Some("en"), "aaa")    // dup content of rows 1 and 3
    ).toDF("doc_id", "lang", "text")
    val rules = Seq("lang_enum" -> Rule.Check(Keywords(properties = Map(
      "lang" -> Rule.Check(Keywords(enum_ = Some(List(
        ConstVal.VStr("en")))))))))
    val byAll = Validate.dqScore(df.withColumn("g", lit("all")), rules,
        Seq("doc_id", "lang"), "text", Seq("g"))
      .collect()(0)
    // completeness 3/4; validity 3/4 (xx fails, null lang passes);
    // uniqueness 2/4 (aaa x3 + bbb); score = (3+3+2)/(4*3) = 0.666667
    assert(byAll.getLong(1) == 4L && byAll.getDouble(2) == 0.75 &&
      byAll.getDouble(3) == 0.75 && byAll.getDouble(4) == 0.5 &&
      byAll.getDouble(5) == 0.666667, byAll.toString)
    intercept[IllegalArgumentException] {
      Validate.dqScore(df, rules, Seq("doc_id"), "text", Seq("doc_id"),
        weights = (0.0, 0.0, 0.0))
    }
  }

  test("volumeContract: under / over / in-range partitions, bad bounds " +
      "rejected") {
    val df = (Seq.fill(2)("a") ++ Seq.fill(5)("b") ++ Seq.fill(9)("c"))
      .toDF("p")
    val out = Validate.volumeContract(df, "p", minRows = 3L, maxRows = 8L)
      .orderBy("part_key").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(4)) "-" else r.getString(4)))
    assert(out.toSeq == Seq(("a", 2L, "under"), ("b", 5L, "-"),
      ("c", 9L, "over")), out.mkString(","))
    intercept[IllegalArgumentException] {
      Validate.volumeContract(df, "p", 5L, 4L)
    }
  }

  test("mediaBudget: groups by DETECTED container with byte shares; " +
      "garbage and null payloads land in 'unknown'") {
    val rows = Seq(
      ("m-1", "image/png", Multimodal.HeaderBytes.png(4, 4)),
      ("m-2", "audio/wav", Multimodal.HeaderBytes.png(4, 4)), // mislabeled
      ("m-3", "audio/wav", Multimodal.HeaderBytes.wav(8000, 1, 10)),
      ("m-4", "video/mp4", Array[Byte](1, 2)),
      ("m-5", "video/mp4", null.asInstanceOf[Array[Byte]])
    ).toDF("media_ref", "mime", "content")
    val out = Multimodal.mediaBudget(rows)
      .orderBy("detected_mime").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val png = Multimodal.HeaderBytes.png(4, 4).length.toLong
    val wav = Multimodal.HeaderBytes.wav(8000, 1, 10).length.toLong
    assert(out.toSeq == Seq(
      ("audio/wav", 1L, wav),
      ("image/png", 2L, 2 * png),
      ("unknown", 2L, 2L)), out.mkString(","))
  }
}
