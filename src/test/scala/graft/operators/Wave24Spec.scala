package graft.operators

import graft.SparkSpec

/** Round-5 wave-24 operators: near-miss reference repair. (The wave's
  * streaming eviction operator is exercised in
  * `graft.streaming.StreamValidateSpec`.)
  */
class Wave24Spec extends SparkSpec {
  import spark.implicits._

  test("nearMissRefs: substitution/insertion/deletion at distance 1 " +
      "match; transpositions (distance 2) blocked by the residual " +
      "filter despite sharing a deletion variant") {
    val dangling = Seq("m-0003", "m-003", "m-10").toDF("media_ref")
    val catalog = Seq(
      "m-0002",   // substitution of the last digit of m-0003
      "m-0013",   // substitution of a middle digit of m-0003
      "m-0003x",  // m-0003 + one INSERTED char
      "m-0003",   // exact (never reaches the operator for true dangling
                  //        refs, but distance 0 must not crash)
      "m-01",     // TRANSPOSITION of m-10: shares variants, distance 2
      "m-9999"    // far away
    ).toDF("media_ref")
    val out = RefIntegrity.nearMissRefs(dangling, catalog)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(out == Set(
      ("m-0003", "m-0002", 1),
      ("m-0003", "m-0013", 1),
      ("m-0003", "m-0003x", 1),
      ("m-0003", "m-0003", 0),
      ("m-003", "m-0003", 1),          // deletion-side match
      ("m-003", "m-0013", 1)),         // delete '1' / delete '0' meet
      out.mkString(","))
    // the transposition pair (m-10, m-01) is absent: candidate via the
    // shared "m-0"/"m-1" variants, killed by levenshtein = 2
    assert(!out.exists(_._1 == "m-10"))
  }
}
