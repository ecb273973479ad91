package graft.operators

import graft.SparkSpec
import graft.rules.{ConstVal, Keywords, Rule}
import org.apache.spark.sql.functions._

/** Round-5 wave-14 operators: verdict rollup cube, Gini concentration,
  * FD confidence, winsorization report, packing ROI (the Wilson-CI and
  * kappa queries are pure query-level math, oracle-checked in SparkEntry).
  */
class Wave14Spec extends SparkSpec {
  import spark.implicits._

  private val langRule = "enum" -> Rule.Check(Keywords(properties = Map(
    "lang" -> Rule.Check(Keywords(enum_ = Some(
      List(ConstVal.VStr("en"), ConstVal.VStr("de"))))))))

  test("verdictRollup: subtotal levels sum correctly and a real null " +
      "dimension value stays distinct from the ALL marker") {
    val docs = Seq(
      ("en", "a"), ("en", "a"), ("zz", "a"),
      ("de", "b"), (null, "b")).toDF("lang", "src")
    val out = Validate.verdictRollup(docs, Seq(langRule), Seq("lang", "src"))
      .collect().map(r => ((Option(r.getString(0)).orNull,
        Option(r.getString(1)).orNull), (r.getLong(3), r.getLong(4))))
      .toMap
    // leaf: (en, a) 0/2 failed; (zz, a) 1/1; (null, b) 0/1 — an ABSENT
    // (null) property passes the enum, the same null-explicit contract
    // the driver oracles encode (lang IS NULL OR lang IN (...))
    assert(out(("en", "a")) == ((0L, 2L)))
    assert(out(("zz", "a")) == ((1L, 1L)))
    assert(out((null, "b")) == ((0L, 1L)))
    // lang subtotal: (en, ALL); null lang subtotal is (null, ALL) — NOT
    // merged into (ALL, ALL)
    assert(out(("en", "ALL")) == ((0L, 2L)))
    assert(out((null, "ALL")) == ((0L, 1L)))
    // grand total
    assert(out(("ALL", "ALL")) == ((1L, 5L)))
    // row count = (leaf combos + distinct langs + 1) * nRules
    assert(out.size == 4 + 4 + 1)
  }

  test("verdictRollup plan: ONE aggregate pass (a single Expand, no join, " +
      "at most one corpus Exchange)") {
    val docs = Seq(("en", "a"), ("de", "b")).toDF("lang", "src")
    val plan = Validate.verdictRollup(docs, Seq(langRule), Seq("lang", "src"))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("gini: equal masses give 0; one group owning everything gives " +
      "(n-1)/n; top_share matches") {
    val eq = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("g", "m")
    val r1 = Stats.gini(eq, "g", col("m")).collect()(0)
    assert(r1.getLong(0) == 4L && r1.getLong(1) == 40L)
    assert(r1.getDouble(2) == 0.25 && r1.getDouble(3) == 0.0)
    val skew = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 100L))
      .toDF("g", "m")
    val r2 = Stats.gini(skew, "g", col("m")).collect()(0)
    assert(r2.getDouble(2) == 1.0 && r2.getDouble(3) == 0.75) // (n-1)/n
  }

  test("fdConfidence: exact FD gives confidence 1 and 0 violating rows; " +
      "a broken det scores g1 exactly; NULL dep is a real value") {
    val clean = Seq((1, "x"), (1, "x"), (2, "y")).toDF("det", "dep")
    val r1 = Stats.fdConfidence(clean, "det", "dep").collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((2L, 3L, 0L)))
    assert(r1.getDouble(3) == 1.0)
    // det 1 maps to x,x,z -> keep 2 of 3; det 2 maps to {null} only ->
    // consistent
    val dirty = Seq((1, "x"), (1, "x"), (1, "z"), (2, null))
      .toDF("det", "dep")
    val r2 = Stats.fdConfidence(dirty, "det", "dep").collect()(0)
    assert(r2.getLong(2) == 1L && r2.getDouble(3) == 0.75)
  }

  test("winsorizeReport: fences, clip counts, and integer-micro mass " +
      "delta on a hand-computed group") {
    // values 0..10: p1 = 0.1, p99 = 9.9 (percentile_cont interpolation)
    val df = (0 to 10).map(v => ("g", v.toLong)).toDF("grp", "v")
    val r = Stats.winsorizeReport(df, Seq("grp"), "v", 0.01, 0.99)
      .collect()(0)
    assert(r.getDouble(1) == 0.1 && r.getDouble(2) == 9.9)
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((11L, 1L, 1L)))
    // clamp moves 0 -> 0.1 (+0.1) and 10 -> 9.9 (-0.1): net 0 micro
    assert(r.getLong(6) == 0L)
  }

  test("packingRoi invariants: solo waste >= packed waste, packed waste " +
      "< shards * capacity, masses exact") {
    val docs = (1L to 400L).map(i => (i, 1L + (i % 97))).toDF("id", "tk")
    val rows = Packing.packingRoi(docs, "id", "tk", Seq(128, 512), 4)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (cap, mass) = (r.getInt(0), r.getLong(2))
      val (soloPad, packedBins, packedPad) =
        (r.getLong(4), r.getLong(6), r.getLong(7))
      assert(soloPad >= packedPad && packedPad >= mass)
      assert(packedPad - mass < 4L * cap) // <= shards * (capacity - 1)
      assert(packedBins >= mass / cap)
      assert(r.getDouble(5) >= r.getDouble(8)) // solo frac >= packed frac
    }
  }
}
