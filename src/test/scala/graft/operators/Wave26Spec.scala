package graft.operators

import graft.SparkSpec
import graft.rules.{ConstVal, Keywords, Rule}

/** Round-5 wave-26 operators: lag-k autocorrelation, top offending
  * values per rule.
  */
class Wave26Spec extends SparkSpec {
  import spark.implicits._

  test("autocorrelation: period-2 series pins r(1) = -1 / r(2) = 1; " +
      "constant series null; single-pair lag null") {
    val df = Seq(
      ("p2", 1, 1L), ("p2", 2, 5L), ("p2", 3, 1L), ("p2", 4, 5L),
      ("p2", 5, 1L), ("p2", 6, 5L),
      ("flat", 1, 7L), ("flat", 2, 7L), ("flat", 3, 7L),
      ("tiny", 1, 1L), ("tiny", 2, 9L))
      .toDF("k", "t", "v")
    val out = Temporal.autocorrelation(df, Seq("k"), "t", "v", maxLag = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    val p1 = out(("p2", 1))
    assert(p1.getLong(2) == 5L && p1.getDouble(3) == -1.0)
    val p2 = out(("p2", 2))
    assert(p2.getLong(2) == 4L && p2.getDouble(3) == 1.0)
    assert(out(("flat", 1)).isNullAt(3))     // zero variance
    val t1 = out(("tiny", 1))
    assert(t1.getLong(2) == 1L && t1.isNullAt(3))  // n < 2
    assert(out(("tiny", 2)).getLong(2) == 0L)      // no pairs at lag 2
  }

  test("topOffenders: dominant value first, count-desc/value-asc ties, " +
      "null offender renders as <null>; WindowGroupLimit lowering") {
    val df = Seq(Some("bad"), Some("bad"), Some("worse"), Some("en"), None)
      .toDF("lang")
    // enum rule where null FAILS too: required makes the property
    // mandatory, so the None row becomes a '<null>' offender
    val rules = Seq(
      ("lang_enum", Rule.Check(Keywords(
        required = List("lang"),
        properties = Map("lang" -> Rule.Check(
          Keywords(enum_ = Some(List(ConstVal.VStr("en")))))))), "lang"))
    val res = Validate.topOffenders(df, rules, k = 2)
    val out = res.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.sortBy(_._3).toSeq ==
      Seq(("bad", 2L, 1), ("<null>", 1L, 2)), out.mkString(","))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not lower to WindowGroupLimit:\n$plan")
  }
}
