package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-37 operators: char-class composition profile, packing
  * shard balance.
  */
class Wave37Spec extends SparkSpec {
  import spark.implicits._

  test("charClassProfile: exact shares on a hand string, classes sum to " +
      "1, null text/group rows excluded") {
    val df = Seq(
      (Some("a"), Some("ab 12!")),  // 6 chars: 2 alpha, 2 digit, 1 sp, 1 other
      (Some("a"), Some("cd")),      // 2 alpha
      (Some("b"), Some("99")),      // digits only
      (None, Some("zz")), (Some("c"), None)
    ).toDF("g", "text")
    val out = TextAnalysis.charClassProfile(df, "g", "text")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", 8L, 0.5, 0.25, 0.125, 0.125),
      ("b", 2L, 0.0, 1.0, 0.0, 0.0)), out.mkString(","))
  }

  test("shardBalance: exact bin ceils, load ratio vs the busiest shard, " +
      "bad capacity rejected") {
    // manifest shape from packConcatCounted: (shard, id, n_tokens, ...)
    val manifest = Seq(
      (0, 1L, 600L), (0, 2L, 424L),  // shard 0: 1024 tokens -> 2 bins
      (1, 3L, 512L),                 // shard 1: 512 -> 1 bin, ratio 0.5
      (2, 4L, 1L)                    // shard 2: 1 -> 1 bin
    ).toDF("shard", "id", "n_tokens")
    val out = Packing.shardBalance(manifest, capacity = 512)
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0, 2L, 1024L, 2L, 1.0),
      (1, 1L, 512L, 1L, 0.5),
      (2, 1L, 1L, 1L, 0.000977)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Packing.shardBalance(manifest, capacity = 0)
    }
  }
}
