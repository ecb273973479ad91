package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-5 wave-19 operators: encoding-anomaly audit, unicode script
  * profile, lognormal length fit.
  */
class Wave19Spec extends SparkSpec {
  import spark.implicits._

  test("encodingAudit: counts U+FFFD / C0 controls / zero-width exactly; " +
      "a clean segment reports zeros and rate 0") {
    val zwsp = 0x200B.toChar
    val ctl = 0x01.toChar
    val df = Seq(
      ("bad", s"a�b�c"),        // 2 replacement chars, 5 chars
      ("bad", s"x${ctl}y$zwsp"),    // 1 control + 1 zero-width, 4 chars
      ("clean", "hello world")
    ).toDF("src", "text")
    val out = TextAnalysis.encodingAudit(df, "src", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    val b = out("bad")
    assert(b.getLong(1) == 2L && b.getLong(2) == 9L)   // docs, chars
    assert(b.getLong(3) == 1L && b.getLong(4) == 2L)   // repl_docs, repl_chars
    assert(b.getLong(5) == 1L && b.getLong(6) == 1L)   // ctrl, zw
    // (2+1+1) * 10000 / 9
    assert(b.getDouble(7) == 4444.444444)
    val c = out("clean")
    assert(c.getLong(4) == 0L && c.getLong(5) == 0L && c.getLong(6) == 0L)
    assert(c.getDouble(7) == 0.0)
  }

  test("scriptProfile: Latin/digit/Cyrillic/Han masses are exact and " +
      "`other` closes the sum to chars") {
    val df = Seq(
      ("a", "abc 123 привет"),   // latin 3, digits 3, cyrillic 6, ws 2
      ("b", "漢字!")              // han 2, other 1
    ).toDF("src", "text")
    val out = TextAnalysis.scriptProfile(df, "src", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 14L && a.getLong(2) == 3L && a.getLong(3) == 3L)
    assert(a.getLong(4) == 0L && a.getLong(5) == 6L && a.getLong(7) == 2L)
    assert(a.getLong(8) == 0L)                          // other
    val b = out("b")
    assert(b.getLong(1) == 3L && b.getLong(4) == 2L && b.getLong(8) == 1L)
    // columns sum to chars by construction
    Seq(a, b).foreach { r =>
      assert((2 to 8).map(r.getLong).sum == r.getLong(1))
    }
  }

  test("lengthFit: exact ln-moment arithmetic on e-powers; non-positive " +
      "and null values are excluded AND counted") {
    val e = math.E
    val sch = StructType(Seq(StructField("src", StringType),
      StructField("v", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", e), Row("a", e), Row("a", e * e * e),
      Row("a", 0.0), Row("a", null))), sch)
    val r = Stats.lengthFit(df, "src", "v").collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.666667)                  // (1+1+3)/3
    // sqrt(11/3 - 25/9) = sqrt(8)/3
    assert(r.getDouble(4) == math.rint(math.sqrt(8.0) / 3 * 1e6) / 1e6)
  }
}
