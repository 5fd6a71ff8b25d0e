package graft.dml

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the hypothesis round-trip property (test_parser.py:752-776):
  * for all lowercase-alpha identifiers, name and algorithm survive the
  * parse round trip. Raw ScalaCheck (no scalatest bridge on the offline
  * classpath), seeded via fixed parameters for determinism. */
class ParserPropertySpec extends AnyFunSuite {

  private val lowerIdent: Gen[String] =
    Gen.nonEmptyListOf(Gen.choose('a', 'z')).map(_.mkString)

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("property_based_parse_roundtrip") {
    check(Prop.forAll(lowerIdent, lowerIdent, lowerIdent, lowerIdent, lowerIdent) {
      (modelName, algorithm, source, target, feature) =>
        val text =
          s"TRAIN MODEL $modelName USING $algorithm FROM $source " +
            s"PREDICT $target WITH FEATURES($feature)"
        val m = DmlParser.parse(text).asInstanceOf[TrainSpec]
        m.name == modelName && m.algorithm == algorithm &&
          m.source == source && m.target == target &&
          m.features == List(feature)
    })
  }

  test("property_extended_statement_roundtrip") {
    // identifiers survive the parse round trip for every extended statement
    check(Prop.forAll(lowerIdent, lowerIdent, lowerIdent) { (a, b, c) =>
      val p = DmlParser.parse(
        s"PREDICT USING MODEL $a FROM $b STORE RESULTS IN $c")
        .asInstanceOf[PredictSpec]
      val d = DmlParser.parse(s"DEPLOY MODEL $a TO ENDPOINT $b")
        .asInstanceOf[DeploySpec]
      val m = DmlParser.parse(s"MONITOR MODEL $a FOR $b")
        .asInstanceOf[MonitorSpec]
      val e = DmlParser.parse(
        s"EXPLAIN PREDICTION $a USING $b SHOW TOP 3 features")
        .asInstanceOf[ExplainSpec]
      val s = DmlParser.parse(s"SUBSCRIBE TO '$a.%' EXECUTE $b")
        .asInstanceOf[SubscribeSpec]
      p == PredictSpec(a, b, c) &&
        d == DeploySpec(a, b) &&
        m == MonitorSpec(a, b) &&
        e == ExplainSpec(a, method = Some(b), topK = Some(3L)) &&
        s == SubscribeSpec(s"$a.%", Some(b))
    })
  }

  test("property_canonical_feature_roundtrip") {
    // canonical(parse(canonical(e))) is a fixpoint for arithmetic trees
    val leaf: Gen[String] = Gen.oneOf(
      lowerIdent, Gen.choose(0, 999).map(_.toString))
    val expr: Gen[String] = for {
      a <- leaf; b <- leaf; c <- leaf
      op1 <- Gen.oneOf("+", "-", "*", "/")
      op2 <- Gen.oneOf("+", "-", "*", "/")
    } yield s"$a $op1 ($b $op2 $c)"
    check(Prop.forAll(expr) { e =>
      val canon = FeatureExpr.canonical(DmlParser.parseFeature(e))
      FeatureExpr.canonical(DmlParser.parseFeature(canon)) == canon
    })
  }
}
