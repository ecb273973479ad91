package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-27 operators: blocked fuzzy linkage, calibration bins,
  * shuffle-skew advisor.
  */
class Wave27Spec extends SparkSpec {
  import spark.implicits._

  test("fuzzyPairs: finds prefix- and suffix-blocked pairs within maxDist, " +
      "emits each pair once, excludes beyond-threshold and short names") {
    val df = Seq(
      (1L, "abcdefgh"),  // base
      (2L, "abcdefgx"),  // dist 1 via prefix block
      (3L, "xbcdefgh"),  // dist 1 vs 1 via SUFFIX block (prefix broken);
                         // note (2,3) is dist 2 but edits touch BOTH ends,
                         // so no shared block exists: the documented
                         // recall-contract miss, asserted absent below
      (4L, "abcdzzzz"),  // shares prefix block but dist 4 > 2
      (5L, "abcdefgh"),  // exact dup of 1 -> dist 0
      (6L, "ab"),        // shorter than blockLen -> excluded
      (7L, null)         // null name -> excluded
    ).toDF("id", "name")
    val out = Linkage.fuzzyPairs(df, "id", "name",
        maxDist = 2, blockLen = 4, maxBlock = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 1), (1L, 3L, 1), (1L, 5L, 0),
      (2L, 5L, 1), (3L, 5L, 1)), out.toSeq.sorted.mkString(","))
  }

  test("fuzzyPairs: oversize blocks are dropped whole (cap), but a pair " +
      "also sharing a small block survives through it") {
    // 5 rows share prefix 'aaaa' (block size 5 > cap 4); rows 1 and 2 also
    // share the suffix block 'efgh' (size 2 <= cap) and stay linked
    val df = Seq(
      (1L, "aaaadefgh"), (2L, "aaaaxefgh"), (3L, "aaaammmmm"),
      (4L, "aaaannnnn"), (5L, "aaaaooooo")
    ).toDF("id", "name")
    val out = Linkage.fuzzyPairs(df, "id", "name",
        maxDist = 2, blockLen = 4, maxBlock = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)), out.mkString(","))
  }

  test("fuzzyPairs plan: per-block join, no cartesian product") {
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefgx")).toDF("id", "name")
    val plan = Linkage.fuzzyPairs(df, "id", "name", 2, 4, 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"blocked linkage degenerated to an all-pairs join:\n$plan")
  }

  test("calibration: bins partition [0, scale], integral sums are exact, " +
      "gap is |mean - rate| from the same integers") {
    // scale 100, 4 bins: edges 0-24, 25-49, 50-74, 75-100 (top bin closed)
    val df = Seq(
      (0L, true), (24L, false),     // bin 0: n=2 pass=1 sum=24
      (25L, true),                  // bin 1
      (74L, false),                 // bin 2
      (75L, true), (100L, true)     // bin 3 (100*4 DIV 100 = 4 -> clamped)
    ).toDF("sm", "p")
    val out = Stats.calibration(df, col("sm"), 100, col("p"), 4)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val b0 = out(0)
    assert(b0.getLong(1) == 2L && b0.getLong(2) == 1L
      && b0.getLong(3) == 24L)
    // mean = 24/200 = 0.12, rate = 0.5, gap = |24-100|/200 = 0.38
    assert(b0.getDouble(4) == 0.12 && b0.getDouble(5) == 0.5
      && b0.getDouble(6) == 0.38)
    val b3 = out(3)
    assert(b3.getLong(1) == 2L && b3.getLong(2) == 2L
      && b3.getDouble(5) == 1.0)
  }

  test("calibration: perfectly calibrated input has zero gap everywhere") {
    // each bin's mean milli-score equals its pass rate by construction:
    // score 250 -> 1 of 4 pass; score 750 -> 3 of 4 pass
    val rows = Seq.tabulate(4)(i => (250L, i == 0)) ++
      Seq.tabulate(4)(i => (750L, i != 0))
    val out = Stats.calibration(rows.toDF("sm", "p"),
        col("sm"), 1000, col("p"), 4).collect()
    assert(out.length == 2 && out.forall(_.getDouble(6) == 0.0),
      out.mkString(","))
  }

  test("skewAdvisor: integer cross-multiplied flag, ceil salt, " +
      "empty when nothing is skewed; single shuffle + broadcast join") {
    val df = (Seq.fill(90)("hot") ++ Seq.fill(6)("a") ++ Seq.fill(4)("b"))
      .toDF("k")
    val res = Layout.skewAdvisor(df, Seq("k"),
      targetRowsPerTask = 40L, skewFactor = 2)
    val out = res.collect()
    // mean = 100/3; hot: 90*3 = 270 > 2*100 -> flagged, salt ceil(90/40)=3
    assert(out.length == 1)
    assert(out(0).getString(0) == "hot" && out(0).getLong(1) == 90L
      && out(0).getDouble(2) == 0.9 && out(0).getLong(3) == 3L)
    val none = Layout.skewAdvisor(
      (Seq.fill(5)("a") ++ Seq.fill(5)("b")).toDF("k"), Seq("k"), 40L, 2)
    assert(none.count() == 0L)
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"),
      s"totals side not broadcast:\n$plan")
    // the totals branch must REUSE the per-key count exchange (one input
    // scan + one key shuffle total), not recompute it
    assert(plan.contains("ReusedExchange"),
      s"count exchange not reused by the totals branch:\n$plan")
    assert("\\+- Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"more than the one count shuffle:\n$plan")
  }

  test("skewAdvisor: empty input yields empty output (no ANSI div-by-zero)") {
    val empty = Seq.empty[String].toDF("k")
    assert(Layout.skewAdvisor(empty, Seq("k"), 10L, 2).count() == 0L)
  }
}
