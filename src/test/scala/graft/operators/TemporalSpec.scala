package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join and interval range join — semantics against brute-force
  * expectations plus the physical-plan properties the scale design
  * claims (one Exchange for the as-of union-sort; equi-join, never a
  * cartesian residual, for the range join).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, 5L),   // (event, user, t)
    (2L, 10L, 20L),
    (3L, 10L, 30L),
    (4L, 11L, 7L),
    (5L, 12L, 50L)   // user with no right rows at all
  ).toDF("event_id", "user_id", "t")

  private val right = Seq(
    (100L, 10L, 5L, 1.5),   // exactly AT left t=5 -> inclusive match
    (101L, 10L, 25L, 2.5),
    (102L, 11L, 99L, 9.9)   // after every left row of user 11
  ).toDF("rid", "user_id", "t", "v")

  test("asofJoin: latest at-or-before per key, inclusive, left-outer") {
    val out = Temporal.asofJoin(left, right, "user_id", "t", "t",
        Seq("rid", "v"), tieBreak = col("rid"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(100L), Some(1.5)), // t=5 matches the t=5 right row (inclusive)
      (2L, Some(100L), Some(1.5)), // t=20: latest <= is still rid 100
      (3L, Some(101L), Some(2.5)), // t=30: rid 101 at t=25
      (4L, None, None),            // user 11's only right row is later
      (5L, None, None)))           // user 12 has no right rows
  }

  test("asofJoin: tie on (key, time) resolves to the max tieBreak row") {
    val dupRight = Seq((200L, 10L, 5L, 1.0), (201L, 10L, 5L, 2.0))
      .toDF("rid", "user_id", "t", "v")
    val out = Temporal.asofJoin(left.filter(col("user_id") === 10), dupRight,
        "user_id", "t", "t", Seq("rid", "v"), tieBreak = col("rid"))
      .orderBy("event_id").collect().map(_.getLong(3))
    assert(out.toSeq == Seq(201L, 201L, 201L))
  }

  test("asofJoin: legitimately-null right payload values still attach") {
    val nullRight = Seq((300L, 10L, 4L, null.asInstanceOf[java.lang.Double]))
      .toDF("rid", "user_id", "t", "v")
    val out = Temporal.asofJoin(left.filter(col("event_id") === 1), nullRight,
        "user_id", "t", "t", Seq("rid", "v")).collect().head
    assert(out.getLong(3) == 300L && out.isNullAt(4))
  }

  test("asofJoin plan: exactly one Exchange (union-sort, not a join)") {
    val out = Temporal.asofJoin(left, right, "user_id", "t", "t", Seq("rid"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 Exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  private val intervals = Seq(
    (10L, 0L, 25L, 900L),    // spans chunks 0..2 at chunk=10
    (10L, 30L, 31L, 901L),   // sub-chunk interval
    (11L, 5L, 5L, 902L)      // empty [5,5) -> never matches
  ).toDF("user_id", "s", "e", "win_id")

  test("rangeJoin: containment incl. multi-chunk intervals, end-exclusive") {
    val pts = Seq((1L, 10L, 0L), (2L, 10L, 24L), (3L, 10L, 25L),
      (4L, 10L, 30L), (5L, 11L, 5L)).toDF("pid", "user_id", "t")
    val out = Temporal.rangeJoin(pts, intervals, "user_id", "t", "s", "e",
        Seq("win_id"), chunk = 10L)
      .select("pid", "win_id").orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq(
      (1L, 900L),   // t=0 at interval start (inclusive)
      (2L, 900L),   // t=24 inside, third chunk of the interval
      (4L, 901L)))  // t=30 at start; t=25 excluded (end-exclusive), [5,5) empty
  }

  test("rangeJoin: a point inside two overlapping windows matches both") {
    val over = Seq((10L, 0L, 20L, 910L), (10L, 5L, 9L, 911L))
      .toDF("user_id", "s", "e", "win_id")
    val pts = Seq((1L, 10L, 7L)).toDF("pid", "user_id", "t")
    val out = Temporal.rangeJoin(pts, over, "user_id", "t", "s", "e",
        Seq("win_id"), chunk = 10L)
      .select("win_id").orderBy("win_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(910L, 911L))
  }

  test("rangeJoin plan: equi-join on (key, chunk), no cartesian/theta join") {
    val pts = Seq((1L, 10L, 7L)).toDF("pid", "user_id", "t")
    val out = Temporal.rangeJoin(pts, intervals, "user_id", "t", "s", "e",
      Seq("win_id"), chunk = 10L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a product:\n$plan")
  }
}
