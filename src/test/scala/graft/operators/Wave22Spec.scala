package graft.operators

import graft.SparkSpec
import graft.rules.{Keywords, Rule}
import org.apache.spark.sql.functions._

/** Round-5 wave-22 operators: unreferenced catalog assets, fail-fast
  * short-circuit profile, Mann–Kendall monotonic trend.
  */
class Wave22Spec extends SparkSpec {
  import spark.implicits._

  test("unreferenced: catalog entries nothing references, duplicates " +
      "preserved, text spans don't count as references") {
    val docs = Seq(
      (1L, Seq(("media", "", "m-1", 0), ("text", "m-3", "", 10))),
      (2L, Seq(("media", "", "m-2", 0)))
    ).toDF("doc_id", "raw")
      .select(col("doc_id"), expr(
        "transform(raw, x -> named_struct('kind', x._1, 'text', x._2, " +
          "'media_ref', x._3, 'offset', x._4))").as("spans"))
    // m-3 appears only as TEXT content, never as a media ref; the catalog
    // lists it twice (both copies are waste)
    val catalog = Seq("m-1", "m-2", "m-3", "m-3").toDF("media_ref")
    val out = RefIntegrity.unreferenced(catalog, docs)
      .collect().map(_.getString(0)).sorted
    assert(out.sameElements(Array("m-3", "m-3")), out.mkString(","))
  }

  test("failFastProfile: a doc failing several rules counts only at its " +
      "FIRST rank; cumulative coverage; passing docs in none") {
    // r1 fails v < 10; r2 fails v < 20 (strictly weaker, fires first on
    // overlap): v=5 fails both -> counted at r1 only; v=15 first caught
    // by r2; v=25 passes both
    val df = Seq(5L, 15L, 25L, 30L).toDF("v")
    val rules = Seq(
      "r1" -> Rule.Check(Keywords(properties = Map(
        "v" -> Rule.Check(Keywords(minimum = Some(10)))))),
      "r2" -> Rule.Check(Keywords(properties = Map(
        "v" -> Rule.Check(Keywords(minimum = Some(20)))))))
    val out = Validate.failFastProfile(df, rules).orderBy("rank").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("r1", "r2"))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))   // first_caught
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L))   // cum_caught
    assert(out.map(_.getLong(4)).toSeq == Seq(4L, 4L))   // docs
    assert(out.map(_.getDouble(5)).toSeq == Seq(0.25, 0.5))
  }

  test("failFastProfile: empty corpus yields zero counts and null " +
      "share, never a divide-by-zero") {
    val df = Seq.empty[Long].toDF("v")
    val rules = Seq("r1" -> Rule.Check(Keywords(properties = Map(
      "v" -> Rule.Check(Keywords(minimum = Some(0)))))))
    val out = Validate.failFastProfile(df, rules).collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 0L && out(0).getLong(4) == 0L)
    assert(out(0).isNullAt(5))
  }

  test("mannKendall: monotone series hit the closed-form S and z; " +
      "all-tied and single-point series are insufficient") {
    val df = Seq(
      // up: strictly increasing 5 points -> S = 10, var = 5*4*15/18
      ("up", 1, 10L), ("up", 2, 20L), ("up", 3, 30L), ("up", 4, 40L),
      ("up", 5, 50L),
      // down: strictly decreasing -> S = -10
      ("down", 1, 50L), ("down", 2, 40L), ("down", 3, 30L),
      ("down", 4, 20L), ("down", 5, 10L),
      // flat: all tied -> var degenerates to 0
      ("flat", 1, 7L), ("flat", 2, 7L), ("flat", 3, 7L),
      // one: a single observation
      ("one", 1, 3L)
    ).toDF("k", "t", "v")
    val out = Stats.mannKendall(df, Seq("k"), "t", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val up = out("up")
    assert(up.getLong(1) == 5L && up.getLong(2) == 10L)
    // var = (5*4*15 - 0)/18 = 16.666667; z = 9/sqrt(var) = 2.204541
    assert(up.getDouble(3) == 16.666667 && up.getDouble(4) == 2.204541)
    assert(up.getString(5) == "increasing")
    val down = out("down")
    assert(down.getLong(2) == -10L && down.getDouble(4) == -2.204541)
    assert(down.getString(5) == "decreasing")
    val flat = out("flat")
    assert(flat.getLong(2) == 0L && flat.isNullAt(3) && flat.isNullAt(4))
    assert(flat.getString(5) == "insufficient")
    val one = out("one")
    assert(one.getLong(1) == 1L && one.getLong(2) == 0L
      && one.getString(5) == "insufficient")
  }
}
