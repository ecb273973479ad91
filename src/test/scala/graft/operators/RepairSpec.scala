package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.rules.{ConstVal, Keywords, Rule}

class RepairSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", 50L, "abcdef"),
    (2L, "xx", 50L, "abcdef"),          // enum fallback
    (3L, "en", 700L, "abcdef"),         // clamp to maximum
    (4L, "en", -5L, "abcdef"),          // clamp to minimum
    (5L, "en", 50L, "abcdefghij"),      // truncate to maxLength
    (6L, null.asInstanceOf[String], 50L, "abcdef")) // required fill
    .toDF("id", "lang", "n", "s")

  private val rule = Rule.Check(Keywords(
    required = List("lang"),
    properties = Map(
      "lang" -> Rule.Check(Keywords(
        enum_ = Some(List("en", "de").map(ConstVal.VStr(_))))),
      "n" -> Rule.Check(Keywords(minimum = Some(0), maximum = Some(500))),
      "s" -> Rule.Check(Keywords(maxLength = Some(6))))))
  private val defaults = Map("lang" -> lit("en"))

  test("each repair kind rewrites the value and logs old/new") {
    val log = Repair.log(docs, rule, defaults, idCol = "id")
      .as[(Long, String, String, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(log.toSeq == Seq(
      (2L, "lang", "enum", "xx", "en"),
      (3L, "n", "maximum", "700", "500"),
      (4L, "n", "minimum", "-5", "0"),
      (5L, "s", "maxLength", "abcdefghij", "abcdef"),
      (6L, "lang", "required", null, "en")))
  }

  test("repaired table: types preserved, untouched rows identical") {
    val r = Repair.repaired(docs, rule, defaults)
    assert(r.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      docs.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = r.orderBy("id").as[(Long, String, Long, String)].collect()
    assert(rows.toSeq == Seq(
      (1L, "en", 50L, "abcdef"), (2L, "en", 50L, "abcdef"),
      (3L, "en", 500L, "abcdef"), (4L, "en", 0L, "abcdef"),
      (5L, "en", 50L, "abcdef"), (6L, "en", 50L, "abcdef")))
  }

  test("closure: validate(repair(df)) is clean for every repaired keyword") {
    val repaired = Repair.repaired(docs, rule, defaults)
    val viols = Validate.withViolations(repaired, rule)
      .filter(size(col("violations")) > 0).count()
    assert(viols == 0L)
  }

  test("no default: enum/pattern/required are left alone (no invented values)") {
    val r = Repair.withRepairs(docs, rule, Map.empty)
    val touched = r.filter(size(col("_graft_repairs")) > 0)
      .select("id").as[Long].collect().sorted
    assert(touched.toSeq == Seq(3L, 4L, 5L)) // only clamp/truncate apply
    val langs = r.orderBy("id").select("lang").as[String].collect()
    assert(langs(1) == "xx" && langs(5) == null)
  }

  test("plan: withRepairs is scan-only — no shuffle, no join") {
    val plan = Repair.withRepairs(docs, rule, defaults)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }
}
