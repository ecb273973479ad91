package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-8 operators: categorical association (Cramér's V),
  * token-budget-capped assembly, dup-cluster statistics.
  */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  test("cramersV: 1.0 for identical columns, 0.0 for independence, " +
      "empty cells still count") {
    // 2x2 perfectly independent: every cell 5
    val ind = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val vInd = Stats.cramersV(ind, Seq(("a", "b"))).collect()(0)
    assert(vInd.getDouble(3) == 0.0 && vInd.getDouble(4) == 0.0)
    // identical columns: V = 1 exactly — only possible if the ABSENT
    // off-diagonal cells' expected mass enters chi2 (sum o^2/e - n)
    val self = Seq("x", "x", "y", "z").toDF("a").withColumn("b", col("a"))
    val vSelf = Stats.cramersV(self, Seq(("a", "b"))).collect()(0)
    assert(vSelf.getDouble(4) == 1.0)
    assert(vSelf.getDouble(3) == 8.0) // n(k-1) = 4 * 2
  }

  test("cramersV: constant column yields null V, null is a category") {
    val df = Seq(("x", Some("u")), ("x", None), ("x", Some("u")))
      .toDF("a", "b")
    val r = Stats.cramersV(df, Seq(("a", "b"))).collect()(0)
    assert(r.isNullAt(4)) // card(a) = 1
  }

  test("budgetCap: per-group hash-order cumsum, boundary inclusive") {
    val df = Seq((1L, "s", 10L), (2L, "s", 10L), (3L, "s", 10L),
      (4L, "t", 25L), (5L, "t", 10L)).toDF("id", "g", "tok")
    val out = Sampling.budgetCap(df, "id", "g", "tok",
      budget = 25L, seed = "z")
    // every kept row's cumsum <= 25 and group sums never exceed budget
    val rows = out.collect().map(r => (r.getString(1), r.getLong(3)))
    assert(rows.forall(_._2 <= 25L))
    val perGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(perGroup.values.forall(_ <= 25L))
    // determinism: same seed -> same ids; different seed may differ
    val again = Sampling.budgetCap(df, "id", "g", "tok", 25L, "z")
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("clusterStats: histogram and rows_dropped from cluster table") {
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)).toDF("id", "cluster_id")
    val out = DupClusters.clusterStats(cl).orderBy("cluster_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 2L, 2L), (3L, 1L, 2L)))
  }
}
