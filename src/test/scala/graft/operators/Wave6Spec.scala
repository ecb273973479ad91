package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-6 operators: incremental manifest maintenance, violation
  * evidence sampling, exact group quantiles, prefix-containment dedup,
  * id-continuity islands, and the streaming tombstone filter.
  */
class Wave6Spec extends SparkSpec {
  import spark.implicits._

  test("manifestUpdate: incremental splice equals full recompute; " +
      "emptied dirty partition drops") {
    val v1 = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L), (4L, "d", 2L))
      .toDF("id", "text", "p")
    // commit: edit id 3 (part 1 dirty), delete BOTH part-2 rows (part 2
    // dirty and emptied), part 0 untouched
    val v2 = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c2", 1L))
      .toDF("id", "text", "p")
    val content = concat_ws("", col("id"), col("text"))
    val dirty = Seq(1L, 2L).toDF("part")
    val incr = Integrity.manifestUpdate(
      Integrity.contentManifest(v1, col("p"), content), v2, col("p"),
      content, dirty)
    val full = Integrity.contentManifest(v2, col("p"), content)
    assert(Integrity.manifestDiff(incr, full).count() == 0L)
    assert(incr.count() == 2L) // parts 0 and 1; part 2 dropped
  }

  test("forgetStream semantics: anti-join suppression, null ids survive") {
    // the join is stream-static; its row semantics are engine-identical on
    // a batch frame (the executed-stream path is oracle-checked by the
    // e_stream_forget driver row)
    val docs = Seq(Some(1L), Some(2L), Some(3L), None)
      .toDF("doc_id")
    val dels = Seq(2L, 2L, 9L).toDF("del")
    val kept = graft.streaming.StreamValidate
      .forgetStream(docs, dels, "doc_id", "del")
      .collect().map(r => Option(r.get(0))).toSet
    assert(kept == Set(Some(1L), Some(3L), None))
  }

  test("evidence: first k docs per (path, rule), deterministic rn") {
    val viols = Seq(
      (5L, "lang", "enum"), (1L, "lang", "enum"), (3L, "lang", "enum"),
      (9L, "lang", "enum"), (2L, "source", "pattern")
    ).toDF("doc_id", "path", "rule")
    val out = Validate.evidence(viols, k = 2)
      .select("path", "doc_id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(("lang", 1L, 1), ("lang", 3L, 2),
      ("source", 2L, 1)))
  }

  test("groupQuantiles: percentile_cont interpolation, null group kept") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      (null.asInstanceOf[String], 10L)).toDF("g", "v")
    val rows = Stats.groupQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5))
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    // (n-1)*q: 0.25 -> idx 0.75 -> 1 + 0.75*(2-1) = 1.75; median 2.5
    assert(rows(Some("a")) == ((1.75, 2.5)))
    assert(rows(None) == ((10.0, 10.0)))
  }

  test("prefixDups: finds strict-prefix pairs, skips equals and shorts") {
    val base = "x" * 40
    val df = Seq(
      (1L, base + "tail and more"), // long
      (2L, base),                   // strict prefix of 1 (40 >= 32)
      (3L, base),                   // equal to 2 -> NOT emitted
      (4L, "short"),                // < minPrefix -> out of scope
      (5L, "y" * 40)                // different bucket
    ).toDF("id", "text")
    val pairs = Dedup.prefixDups(df, "id", "text", minPrefix = 32)
      .select("id_a", "id_b", "prefix_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((2L, 1L, 40L), (3L, 1L, 40L)))
  }

  test("idIslands: runs, gaps, duplicates collapse, single id") {
    val df = Seq(1L, 2L, 3L, 3L, 7L, 8L, 12L).toDF("id")
    val out = Stats.idIslands(df, "id").orderBy("start_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 3L), (7L, 8L, 2L), (12L, 12L, 1L)))
  }
}
