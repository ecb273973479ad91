package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-21 operators: categorical domain drift, duplicate-scope
  * attribution, vocabulary novelty. (The wave's fourth operator —
  * `StreamValidate.keyedProfileStream` — is exercised in
  * `graft.streaming.StreamValidateSpec`.)
  */
class Wave21Spec extends SparkSpec {
  import spark.implicits._

  test("domainDrift: added/removed/kept with NULL as a real domain " +
      "member and per-side shares") {
    val a = Seq(Some("en"), Some("en"), Some("fr"), None).toDF("lang")
    val b = Seq(Some("en"), Some("pt"), Some("pt"), None, None).toDF("lang")
    val out = Drift.domainDrift(a, b, "lang").collect()
      .map(r => Option(r.getString(0)) -> r).toMap
    assert(out.size == 4)
    val en = out(Some("en"))
    assert(en.getString(1) == "kept" && en.getLong(2) == 2L
      && en.getLong(3) == 1L)
    assert(en.getDouble(4) == 0.5 && en.getDouble(5) == 0.2)
    assert(en.getDouble(6) == -0.3)
    val fr = out(Some("fr"))
    assert(fr.getString(1) == "removed" && fr.getLong(3) == 0L)
    val pt = out(Some("pt"))
    assert(pt.getString(1) == "added" && pt.getLong(2) == 0L
      && pt.getLong(3) == 2L)
    val nul = out(None)
    assert(nul.getString(1) == "kept" && nul.getLong(2) == 1L
      && nul.getLong(3) == 2L)
  }

  test("domainDrift: empty side yields null shares, never a " +
      "divide-by-zero") {
    val a = Seq("en", "fr").toDF("lang")
    val out = Drift.domainDrift(a, a.limit(0), "lang").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getString(1) == "removed")
      assert(!r.isNullAt(4))            // share_v1 defined
      assert(r.isNullAt(5) && r.isNullAt(6))  // v2 shares null, no throw
    }
  }

  test("duplicateScope: intra vs cross batch, null key excluded, null " +
      "batch is a countable batch value") {
    val df = Seq(
      (Option("x"), Option(1)), (Option("x"), Option(1)),   // intra
      (Option("y"), Option(1)), (Option("y"), Option(2)),   // cross
      (Option("z"), Option(1)),                             // not a dup
      (None, Option(1)), (None, Option(2)),                 // null key: out
      (Option("w"), None), (Option("w"), None)              // null batch
    ).toDF("k", "b")
    val out = Uniqueness.duplicateScope(df, "k", "b").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // w's two null batches are ONE batch value -> intra
    assert(out("intra_batch") == ((2L, 2L)))
    assert(out("cross_batch") == ((1L, 1L)))
  }

  test("vocabNovelty: first-seen counts, zero-novelty batch, " +
      "cumulative vocabulary") {
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (2L, "b")
    ).toDF("batch", "text")
    val out = TextAnalysis.vocabNovelty(docs, col("batch"), "text")
      .orderBy("batch").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L, 1L))   // n_types
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L))   // new_types
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.5, 0.0))
    assert(out.map(_.getLong(4)).toSeq == Seq(2L, 3L, 3L))   // cum_types
  }

  test("vocabNovelty: join-free single pipeline (one corpus shuffle, " +
      "both counters from the exploded membership view)") {
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("batch", "text")
    val plan = TextAnalysis.vocabNovelty(docs, col("batch"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }
}
