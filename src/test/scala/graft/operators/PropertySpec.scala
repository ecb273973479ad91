package graft.operators

import graft.SparkSpec
import graft.plans.{CosineOps, SimHashOps, SpanOps}
import graft.rules.{ConstVal, Keywords, Rule, RuleLoader}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based pins on the pure kernels: randomized inputs instead of
  * hand-picked fixtures, for the contracts whose failure modes are
  * data-shaped (escaping, byte-level parsing, hash thresholds, float
  * folds). Runs scalacheck directly (no scalatestplus bridge in the
  * offline cache); each property is checked with 300 random cases.
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, cases: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  // valid unicode strings: no isolated surrogates (YAML cannot carry
  // them), but everything else — controls, quotes, backslashes, emoji
  private val cleanString: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.choose(0x20.toChar, 0x7e.toChar),
    1 -> Gen.oneOf('"', '\\', '\n', '\t', '\r', 0x01.toChar, 0x7f.toChar),
    1 -> Gen.choose(0xa0.toChar, 0xd7ff.toChar),
    1 -> Gen.oneOf("é", "漢", "🙂").flatMap(s => Gen.const(s))
  )).map(_.mkString)

  test("yamlEscape round-trip: ANY enum string survives " +
      "toYaml -> RuleLoader.loadString (the ADVICE-r4 escaping contract)") {
    check(Prop.forAll(cleanString) { s =>
      val rule = Rule.Check(Keywords(properties = Map("f" -> Rule.Check(
        Keywords(types = Some(List("string")),
          enum_ = Some(List(ConstVal.VStr(s))))))))
      val loaded = RuleLoader.loadString(Inference.toYaml(rule)).root
      loaded match {
        case Rule.Check(kw) => kw.properties("f") match {
          case Rule.Check(k) =>
            k.enum_.contains(List(ConstVal.VStr(s)))
          case _ => false
        }
        case _ => false
      }
    })
  }

  test("SpanOps.refOk is byte-for-byte equivalent to ^m-[0-9a-f]{8}$ " +
      "on arbitrary strings") {
    val refLike: Gen[String] = Gen.frequency(
      3 -> (for {
        n <- Gen.choose(6, 10)
        cs <- Gen.listOfN(n, Gen.frequency(
          8 -> Gen.oneOf(('0' to '9') ++ ('a' to 'f')),
          1 -> Gen.oneOf('g', 'A', 'F', '-', 'é')))
      } yield "m-" + cs.mkString),
      1 -> cleanString)
    check(Prop.forAll(refLike) { s =>
      SpanOps.refOk(UTF8String.fromString(s)) ==
        s.matches("^m-[0-9a-f]{8}$")
    })
  }

  test("thresholdHex is monotone in the fraction and inverts to " +
      "floor(f * 2^32)") {
    val frac = Gen.chooseNum(0.0, 1.0)
    check(Prop.forAll(frac, frac) { (f1, f2) =>
      val (lo, hi) = if (f1 <= f2) (f1, f2) else (f2, f1)
      Sampling.thresholdHex(lo) <= Sampling.thresholdHex(hi)
    })
    check(Prop.forAll(Gen.chooseNum(0.0, 0.999999999)) { f =>
      java.lang.Long.parseLong(Sampling.thresholdHex(f), 16) ==
        (f * 4294967296.0).toLong
    })
  }

  test("CosineOps.cosine: symmetric, bounded, self-similarity 1, null " +
      "on length mismatch") {
    val vec = Gen.nonEmptyListOf(Gen.chooseNum(-1e3, 1e3))
      .map(_.toArray)
    def ad(a: Array[Double]) = new GenericArrayData(a.map(_.asInstanceOf[Any]))
    check(Prop.forAll(vec, vec) { (a, b0) =>
      val b = b0.take(a.length).padTo(a.length, 0.0)
      val ab = CosineOps.cosine(ad(a), ad(b))
      val ba = CosineOps.cosine(ad(b), ad(a))
      ab == ba && math.abs(ab.doubleValue()) <= 1.0 + 1e-9
    })
    check(Prop.forAll(vec) { a =>
      val self = CosineOps.cosine(ad(a), ad(a)).doubleValue()
      if (a.exists(_ != 0.0)) math.abs(self - 1.0) <= 1e-9 else self == 0.0
    })
    check(Prop.forAll(vec) { a =>
      CosineOps.cosine(ad(a), ad(a ++ Array(1.0))) == null
    })
  }

  test("SimHashOps.simhash is order-invariant (per-token votes commute) " +
      "and deterministic") {
    val toks = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    def ad(ts: Seq[String]) =
      new GenericArrayData(ts.map(t => UTF8String.fromString(t): Any).toArray)
    check(Prop.forAll(toks, Gen.long) { (ts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ts)
      SimHashOps.simhash(ad(ts)) == SimHashOps.simhash(ad(shuffled)) &&
        SimHashOps.simhash(ad(ts)) == SimHashOps.simhash(ad(ts))
    })
  }
}
