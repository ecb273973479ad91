package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 wave-25 operators: temperature mixing plan, real parquet
  * footer audit.
  */
class Wave25Spec extends SparkSpec {
  import spark.implicits._

  test("temperaturePlan: alpha=0.5 closed forms, alpha=1 is the " +
      "identity, zero-mass source gets null boost") {
    val df = Seq(("a", 100L), ("a", 0L), ("b", 400L)).toDF("src", "m")
    val half = Mixture.temperaturePlan(df, "src", "m", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    // masses 100/400 -> shares .2/.8; sqrt 10/20 -> temp 1/3, 2/3
    assert(half("a").getDouble(2) == 0.2
      && half("a").getDouble(3) == 0.333333
      && half("a").getDouble(4) == 1.666667)
    assert(half("b").getDouble(2) == 0.8
      && half("b").getDouble(3) == 0.666667
      && half("b").getDouble(4) == 0.833333)
    val one = Mixture.temperaturePlan(df, "src", "m", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(one("a").getDouble(2) == one("a").getDouble(3))
    assert(one("b").getDouble(4) == 1.0)
    val withZero = Mixture.temperaturePlan(
      Seq(("z", 0L), ("b", 100L)).toDF("src", "m"), "src", "m", 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(withZero("z").getDouble(2) == 0.0 && withZero("z").isNullAt(4))
    assert(withZero("b").getDouble(2) == 1.0
      && withZero("b").getDouble(4) == 1.0)
  }

  test("parquetFooterAudit: footer row counts equal the data row " +
      "counts, one row per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_foot").toString
    spark.range(1234).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t1.parquet")
    spark.range(77).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t2.parquet")
    // audit the part files inside the two table dirs
    val out = Layout.parquetFooterAudit(spark, s"$dir/*.parquet",
        glob = "part-*.parquet")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3) > 0L,
        r.getLong(4) > 0L))
    assert(out.length == 2, out.mkString(","))
    assert(out.map(_._2).sorted.sameElements(Array(77L, 1234L)))
    assert(out.forall(x => x._1 >= 1 && x._3 && x._4))
  }
}
