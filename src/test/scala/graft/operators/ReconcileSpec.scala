package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L))
    .toDF("k", "m")
  // b's sum drifts by 1; c is missing entirely; d is extra on the right
  private def right = Seq(
    ("a", 10L), ("a", 20L), ("b", 6L), ("d", 9L))
    .toDF("k", "m")

  test("only disagreeing groups surface; missing groups keep nulls") {
    val out = Reconcile.aggregates(left, right, Seq("k"), Seq("m"))
      .orderBy("k")
      .select("k", "rows_left", "rows_right", "m_left", "m_right")
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
    assert(out.toSeq == Seq(
      ("b", Some(1L), Some(1L), Some(5L), Some(6L)),
      ("c", Some(1L), None, Some(7L), None),
      ("d", None, Some(1L), None, Some(9L))))
  }

  test("tolerance suppresses small measure drift but never count drift") {
    val keys = Reconcile.aggregates(left, right, Seq("k"), Seq("m"), tol = 2.0)
      .select("k").as[String].collect().sorted
    // b's |5-6| = 1 <= tol is suppressed; c/d (count + null) still differ
    assert(keys.toSeq == Seq("c", "d"))
  }

  test("identical sides reconcile to zero rows") {
    assert(Reconcile.aggregates(left, left, Seq("k"), Seq("m")).count() == 0L)
  }

  test("plan: two partial aggregations, one join, no corpus-side join") {
    val plan = Reconcile.aggregates(left, right, Seq("k"), Seq("m"))
      .queryExecution.executedPlan.toString
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1, s"expected 1 summary join, got $joins:\n$plan")
    assert(plan.contains("partial"), s"expected map-side partial agg:\n$plan")
  }
}
