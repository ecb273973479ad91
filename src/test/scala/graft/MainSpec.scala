package graft

/** CLI helper goldens (path parsing is session-free; the --forget helper
  * drives the shared test session).
  */
class MainSpec extends SparkSpec {

  test("localDocsParent: bare paths, encoded and unencoded file URIs") {
    assert(Main.localDocsParent("/data/corpus/docs.parquet").toString
      == "/data/corpus")
    // spec-compliant percent-encoded URI (java.nio.Path.toUri / as_uri form)
    assert(Main.localDocsParent("file:///data/my%20docs/corpus.parquet").toString
      == "/data/my docs")
    // raw unencoded path with a space (what humans type; strict URI throws)
    assert(Main.localDocsParent("file:///data/my docs/corpus.parquet").toString
      == "/data/my docs")
    assert(Main.localDocsParent("file:///tmp/plain/docs.parquet").toString
      == "/tmp/plain")
    // remote schemes are a clear error, not a crash
    val e = intercept[IllegalArgumentException] {
      Main.localDocsParent("s3a://bucket/docs.parquet")
    }
    assert(e.getMessage.contains("pass --rules"))
  }

  test("--forget path: tombstones applied before validation, " +
      "audit written with zero residual") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_forget").toString
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val dels = Seq(2L, 4L).toDF("doc_id")
    dels.write.mode("overwrite").parquet(s"$dir/deletes")
    val kept = Main.applyForget(spark, docs, s"$dir/deletes", "doc_id",
      s"$dir/out")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    val audit = spark.read.parquet(s"$dir/out/forget_audit").collect()(0)
    assert(audit.getLong(1) == 4L && audit.getLong(2) == 2L &&
      audit.getLong(3) == 2L && audit.getLong(4) == 0L)
  }
}
