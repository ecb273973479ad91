package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI helper goldens that need no Spark session. */
class MainSpec extends AnyFunSuite {

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
}
