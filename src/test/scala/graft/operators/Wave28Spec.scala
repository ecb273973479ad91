package graft.operators

import graft.SparkSpec
import graft.rules.{Keywords, Rule}
import org.apache.spark.sql.functions._

/** Round-5 wave-28 operators: corpus-wide subset-duplicate containment
  * pairs, Flesch readability stats, cost-aware fail-fast rule schedule.
  */
class Wave28Spec extends SparkSpec {
  import spark.implicits._

  test("containmentPairs: subset dup found, boilerplate shingles (df > " +
      "maxDf) excluded from sizes AND candidates, df=1 docs pair-free") {
    // with k=2, maxDf=2: 'a b' appears in docs 1,2,4 (df 3 > 2, dropped
    // everywhere); doc 2's kept set is then just {'b c'} which doc 1
    // contains -> containment 1.0. Docs 3 and 4 hold only df<2 kept
    // shingles after the drop -> never joined.
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c"),
      (3L, "x y z"),
      (4L, "a b q")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        k = 2, maxDf = 2, minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)), out.mkString(","))
  }

  test("containmentPairs: a short doc embedded in a long one has LOW " +
      "Jaccard (invisible to minhash banding) but containment 1.0") {
    val df = Seq(
      (1L, "p q r s t u v w"), // 7 2-shingles
      (2L, "r s t u")          // 3 2-shingles, all inside doc 1
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val jac = Dedup.ngramJaccard(df, pairs, "doc_id", "text", k = 2)
      .collect()(0).getDouble(2)
    assert(jac < 0.5, s"jaccard $jac should be low for a subset pair")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        k = 2, maxDf = 100, minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)), out.mkString(","))
  }

  test("containmentPairs plan: inverted-index equi-join, no cartesian") {
    val df = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val plan = Dedup.containmentPairs(df, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"containment degenerated to an all-pairs join:\n$plan")
  }

  test("readabilityStats: words, vowel-run syllables, sentence runs, " +
      "flesch formula on a known sentence") {
    val df = Seq((1L, "The cat sat. It ran!")).toDF("id", "text")
    val r = df.select(TextAnalysis.readabilityStats(col("text")).as("r"))
      .select(col("r.words"), col("r.sentences"), col("r.syllables"),
        col("r.flesch"))
      .collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L && r.getLong(2) == 5L,
      r.toString)
    // 206.835 - 1.015*5/2 - 84.6*5/5 = 119.6975
    assert(r.getDouble(3) == 119.6975, r.getDouble(3).toString)
  }

  test("readabilityStats: vowel GROUPS count once, no-vowel tokens floor " +
      "at 1 syllable, missing terminator floors sentences at 1") {
    val df = Seq((1L, "beautiful tsktsk")).toDF("id", "text")
    val r = df.select(TextAnalysis.readabilityStats(col("text")).as("r"))
      .select(col("r.words"), col("r.sentences"), col("r.syllables"))
      .collect()(0)
    // beautiful -> eau|i|u = 3 runs; tsktsk -> 0 runs -> floor 1
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 4L,
      r.toString)
  }

  test("readabilityStats: word-free document yields words=0 and null " +
      "flesch (undefined), not a division error") {
    val df = Seq((1L, "... !!!")).toDF("id", "text")
    val r = df.select(TextAnalysis.readabilityStats(col("text")).as("r"))
      .select(col("r.words"), col("r.flesch")).collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1), r.toString)
  }

  test("ruleSchedule: efficiency = catch_rate / cost ranks a cheap " +
      "always-firing rule first and a silent rule last") {
    val df = Seq(
      (1L, "en"), (2L, "xx"), (3L, "en"), (4L, "yy")
    ).toDF("doc_id", "lang")
    val rules = Seq(
      ("lang_en", Rule.Check(Keywords(properties = Map(
        "lang" -> Rule.Check(Keywords(enum_ = Some(List(
          graft.rules.ConstVal.VStr("en")))))))), 2.0),
      ("id_pos", Rule.Check(Keywords(properties = Map(
        "doc_id" -> Rule.Check(Keywords(minimum = Some(0)))))), 0.5),
      ("id_neg", Rule.Check(Keywords(properties = Map(
        "doc_id" -> Rule.Check(Keywords(maximum = Some(-1)))))), 0.5))
    val out = Validate.ruleSchedule(df, rules)
      .orderBy("sched_rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4),
        r.getDouble(5), r.getInt(6)))
    // id_neg catches 4/4 at cost 0.5 -> eff 2.0; lang_en catches 2/4 at
    // cost 2.0 -> eff 0.25; id_pos catches none -> eff 0
    assert(out.toSeq == Seq(
      ("id_neg", 4L, 1.0, 2.0, 1),
      ("lang_en", 2L, 0.5, 0.25, 2),
      ("id_pos", 0L, 0.0, 0.0, 3)), out.mkString(","))
  }

  test("ruleSchedule: empty corpus yields zero caught, null rates, and a " +
      "deterministic alphabetical rank; non-positive cost rejected") {
    val df = Seq((1L, "en")).toDF("doc_id", "lang").filter(col("doc_id") < 0)
    val rules = Seq(
      ("b_rule", Rule.Check(Keywords(properties = Map(
        "doc_id" -> Rule.Check(Keywords(minimum = Some(0)))))), 1.0),
      ("a_rule", Rule.Check(Keywords(properties = Map(
        "doc_id" -> Rule.Check(Keywords(maximum = Some(-1)))))), 1.0))
    val out = Validate.ruleSchedule(df, rules).orderBy("sched_rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.isNullAt(4), r.getInt(6)))
    assert(out.toSeq == Seq(("a_rule", 0L, true, 1), ("b_rule", 0L, true, 2)),
      out.mkString(","))
    intercept[IllegalArgumentException] {
      Validate.ruleSchedule(df, Seq(("bad", rules.head._2, 0.0)))
    }
  }
}
