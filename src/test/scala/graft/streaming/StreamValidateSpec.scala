package graft.streaming

import graft.SparkSpec
import graft.rules.{Keywords, Rule}
import graft.sources.DocsGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming smoke: the identical compiled rules over a file-source stream
  * must produce the same violations as the batch path on the same data.
  */
class StreamValidateSpec extends SparkSpec {

  private val rule = Rule.Check(Keywords(required = List("doc_id", "spans")))

  test("file-source stream produces the same violations as batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val docs = DocsGen.docs(spark, DocsGen.Knobs(nDocs = 2000, nParts = 4,
      badKindPerMille = 20, badOrderPerMille = 10, nullDocIdPerMille = 5))
    docs.write.mode("overwrite").parquet(s"$dir/in")

    val batch = StreamValidate.violations(spark.read.parquet(s"$dir/in"), rule)
      .orderBy("doc_id", "path", "rule").collect()

    val streamIn = spark.readStream
      .schema(docs.schema)
      .parquet(s"$dir/in")
    val q = StreamValidate.violations(streamIn, rule)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_viols")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("stream_viols")
      .orderBy("doc_id", "path", "rule").collect()

    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream=${streamed.length} batch=${batch.length}")
    assert(batch.nonEmpty)
  }

  test("windowed verdicts aggregate per (window, part) with watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_w").toString
    val docs = DocsGen.docs(spark, DocsGen.Knobs(nDocs = 1000, nParts = 2,
      badOrderPerMille = 50))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("doc_id")), lit(120L))))
    docs.write.mode("overwrite").parquet(s"$dir/in")

    val streamIn = spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = StreamValidate.verdictsByWindow(streamIn, rule, "ts")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_verdicts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("stream_verdicts").collect()
    assert(out.nonEmpty)
    val totalDocs = out.map(_.getAs[Long]("docs")).sum
    assert(totalDocs == 1000L, s"docs=$totalDocs")
  }

  test("streaming dedup drops re-sent content within the watermark horizon") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_d").toString
    // 3 distinct contents, each sent 1-3 times within a few seconds; case/
    // whitespace variants must collapse too (contentHash normalizes)
    Seq(
      (1L, "alpha beta gamma", 0L), (2L, "alpha  BETA gamma", 3L),
      (3L, "delta epsilon", 1L), (4L, "delta epsilon", 2L),
      (5L, "zeta", 4L), (6L, "alpha beta gamma", 5L))
      .toDF("doc_id", "text", "off")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("off")))
      .drop("off")
      .write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
    val q = StreamValidate.dedupStream(streamIn, "text", "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("stream_dedup").collect()
    // exactly one survivor per distinct normalized content
    assert(out.length == 3, out.mkString(","))
    val hashes = out.map(_.getAs[String]("content_hash")).toSet
    assert(hashes.size == 3)
  }

  test("streaming session_window sessions equal the batch sessionization") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_s").toString
    // user 1: two sessions (65-min gap); user 2: one 3-event session.
    // user 99 is a far-future sentinel: append mode only emits sessions
    // the WATERMARK has passed, so the sentinel (plus a tight 1 s delay)
    // pushes the final watermark beyond every real session's close.
    val t0 = 1700000000L
    Seq(
      (1L, t0), (1L, t0 + 600), (1L, t0 + 600 + 65 * 60), // gap 65 min
      (2L, t0 + 30), (2L, t0 + 90), (2L, t0 + 1500),
      (99L, t0 + 7200))
      .toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/in")

    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
    val q = StreamValidate.sessionsStream(streamIn, watermark = "1 second")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("stream_sessions")
      .filter(col("user_id") < 99L)
      .select("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._1, x._2))
    assert(got.sameElements(Array((1L, 1L), (1L, 2L), (2L, 3L))), got.mkString(","))

    // batch twin agrees on sessions-per-user
    val batch = graft.operators.Sessionize.sessionStats(
      spark.read.parquet(s"$dir/in").filter(col("user_id") < 99L), "user_id", "ts")
      .select("user_id", "n_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(batch.sameElements(Array((1L, 2L), (2L, 1L))), batch.mkString(","))
  }

  test("keyedProfileStream: per-key state-store prefixes across pinned " +
      "micro-batches (late event raises the count, not the max)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kps").toString
    def us(s: String): Long =
      java.sql.Timestamp.valueOf(s).toInstant.toEpochMilli * 1000L
    def writeSlice(i: Int, rows: Seq[(Long, String)]): Unit = {
      val tmp = s"$dir/_tmp_$i"
      rows.map { case (u, t) => (u, java.sql.Timestamp.valueOf(t)) }
        .toDF("user_id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(s"$dir/slice_$i.parquet")
      assert(part.renameTo(dst))
      // oldest-first is the file source's pick order
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    writeSlice(0, Seq(
      (1L, "2026-01-01 10:00:00"), (1L, "2026-01-01 10:05:00"),
      (2L, "2026-01-01 10:02:00")))
    writeSlice(1, Seq(
      (1L, "2026-01-01 09:00:00"),     // LATE: count moves, max must not
      (3L, "2026-01-01 11:00:00")))

    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = StreamValidate.keyedProfileStream(streamIn, "user_id", "ts")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 1, 2L, us("2026-01-01 10:05:00")),
      (2L, 1, 1L, us("2026-01-01 10:02:00")),
      (1L, 2, 3L, us("2026-01-01 10:05:00")),  // late event absorbed
      (3L, 1, 1L, us("2026-01-01 11:00:00"))), got.toSeq.sorted.mkString(","))
  }

  test("keyedEvictStream: mid-stream expiry on a sat-out batch, fresh " +
      "episode on re-appearance, trailing flush closes live keys, a key " +
      "whose deadline outruns the final watermark stays unflushed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evict").toString
    def writeSlice(i: Int, rows: Seq[(Long, Long)]): Unit = {
      val tmp = s"$dir/_tmp_$i"
      rows.toDF("user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(s"$dir/slice_$i.parquet")
      assert(part.renameTo(dst))
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    // key 99 is the per-slice sentinel max (>> every deadline); key 1
    // sits out slice 1 (expires in batch 1, returns fresh in slice 2);
    // key 2 never sits out (single episode, trailing flush)
    writeSlice(0, Seq((1L, 1000L), (2L, 2000L), (99L, 100000L)))
    writeSlice(1, Seq((2L, 200000L), (99L, 300000L)))
    writeSlice(2, Seq((1L, 400000L), (2L, 410000L), (99L, 500000L)))

    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = StreamValidate
      .keyedEvictStream(streamIn, "user_id", "ts", timeoutMs = 1800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 1000L * 1000000L),      // episode {slice 0}, mid-stream
      (1L, 1L, 400000L * 1000000L),    // fresh episode {slice 2}, flushed
      (2L, 3L, 410000L * 1000000L)),   // one merged episode, flushed
      got.toSeq.sorted.mkString(","))
    // 99's deadline (500000s + 30min) outruns the final watermark
    // (500000s - 1s): its state is live at shutdown and never emits
  }
}
