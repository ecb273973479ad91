package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-30 operators: canonical-URL dedup, dedup threshold ROI
  * sweep, exact duplicate embeddings.
  */
class Wave30Spec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u")
      .select(TextAnalysis.canonicalUrl(col("u"))).collect()(0).getString(0)

  test("canonicalUrl: fragment, host case, www, default ports, tracking " +
      "params, param sort, trailing slash — path case preserved") {
    assert(canon("https://Site1.example.org:443/p/8/?utm_source=mail&ref=1")
      == "https://site1.example.org/p/8?ref=1")
    assert(canon("http://www.Example.COM:80/A/B/?b=2&a=1&utm_x=9#frag")
      == "http://example.com/A/B?a=1&b=2")
    assert(canon("https://a.com/") == "https://a.com")
    assert(canon("https://a.com/x?gclid=123") == "https://a.com/x")
    // non-default port and plain URLs survive untouched
    assert(canon("https://a.com:8080/x") == "https://a.com:8080/x")
    assert(canon("http://a.com/x") == "http://a.com/x")
    // non-http(s) inputs fall back to their own (fragment/query-stripped)
    // base — two unrelated unparseable URLs must NOT share a canonical
    assert(canon("ftp://h/f") == "ftp://h/f")
    assert(canon("example.com/a?x=1") == "example.com/a?x=1")
    assert(canon("ftp://h/f") != canon("mailto:a@b"))
  }

  test("urlDupGroups: decorated variants collapse to one group, distinct " +
      "pages stay apart, singletons dropped") {
    val df = Seq(
      "https://A.com/p/1/?utm_source=x&ref=2",
      "https://a.com/p/1?ref=2#top",
      "https://www.a.com:443/p/1?ref=2",
      "http://a.com/p/1?ref=2",  // scheme differs: NOT the same page
      "https://a.com/p/2?ref=2"  // different page: singleton, dropped
    ).toDF("url")
    val out = Dedup.urlDupGroups(df, "url").collect()
    assert(out.length == 1, out.mkString(","))
    val r = out(0)
    assert(r.getString(0) == "https://a.com/p/1?ref=2"
      && r.getLong(1) == 3L && r.getLong(2) == 3L
      && r.getString(3) == "https://A.com/p/1/?utm_source=x&ref=2",
      r.toString)
  }

  test("thresholdSweep: exact dup in band 9, 70% twin in its jaccard " +
      "decile, per-band docs and top-down cumulative pairs") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 8 distinct 3-shingles
      (2L, "a b c d e f g h i j"), // exact dup of 1 -> J=1, band 9
      (3L, "a b c d e f g")        // 5-shingle prefix -> J=5/8, band 6
    ).toDF("doc_id", "text")
    val out = Dedup.thresholdSweep(df, "doc_id", "text",
        k = 3, numHashes = 32, bands = 32, minThreshold = 0.5)
      .orderBy("band").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (6, 0.6, 2L, 3L, 3L),  // (1,3) and (2,3); cum includes band 9
      (9, 0.9, 1L, 2L, 1L)), out.mkString(","))
  }

  test("exactVecDups: bit-identical groups only, min id kept, triple " +
      "counted once, singletons and null vectors dropped") {
    val df = Seq(
      (5L, Seq(1.0f, 2.0f)), (3L, Seq(1.0f, 2.0f)), (9L, Seq(1.0f, 2.0f)),
      (2L, Seq(1.0f, 2.5f)), (7L, Seq(1.0f, 2.5f)),
      (4L, Seq(0.0f, 0.0f)),           // singleton
      (8L, null.asInstanceOf[Seq[Float]])
    ).toDF("vec_id", "embedding")
    val out = Similarity.exactVecDups(df, "vec_id", "embedding")
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 2L), (3L, 3L)), out.mkString(","))
  }
}
