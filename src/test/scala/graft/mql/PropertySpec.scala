package graft.mql

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: parse(render(ast)) == ast over random MQL trees
  * (plain ScalaCheck generators, deterministic seeds).
  */
class RenderRoundTripSpec extends AnyFunSuite {

  private val genField: Gen[MqlField] =
    Gen.oneOf("alpha", "beta", "x1", "long_field_name").map(MqlField)

  private val genScalarLit: Gen[MqlLit] = Gen.oneOf(
    Gen.choose(-1000L, 1000L).map(MqlLit(_)),
    Gen.choose(-100.0, 100.0).map(d => MqlLit(math.round(d * 1000).toDouble / 1000)),
    Gen.alphaNumStr.suchThat(_.length <= 12).map(MqlLit(_)),
    Gen.oneOf(MqlLit(true), MqlLit(false), MqlLit(null)))

  private val genRhs: Gen[MqlExpr] = Gen.oneOf(
    genScalarLit,
    Gen.nonEmptyListOf(genScalarLit).map(l => MqlList(l.take(5))),
    Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length <= 8)
      .flatMap(p => Gen.oneOf(MqlRegex(p, false), MqlRegex(p, true))),
    Gen.choose(0L, 2000000000L).map(e => MqlDate(e.toDouble)))

  private val genCmp: Gen[MqlExpr] = for {
    f <- genField
    rhs <- genRhs
    op <- rhs match {
      case _: MqlList => Gen.oneOf(CmpOp.In, CmpOp.NotIn)
      case _: MqlRegex => Gen.oneOf(CmpOp.Eq, CmpOp.NotEq)
      case _ => Gen.oneOf(CmpOp.Eq, CmpOp.NotEq, CmpOp.Gt, CmpOp.GtE, CmpOp.Lt, CmpOp.LtE)
    }
  } yield MqlCmp(f, op, rhs)

  private def genExpr(depth: Int): Gen[MqlExpr] =
    if (depth <= 0) Gen.oneOf(genCmp, genField.map(MqlEmpty))
    else Gen.frequency(
      4 -> genCmp,
      1 -> genField.map(MqlEmpty),
      2 -> Gen.listOfN(2, genExpr(depth - 1)).map(MqlAnd(_)),
      2 -> Gen.listOfN(2, genExpr(depth - 1)).map(MqlOr(_)),
      1 -> genExpr(depth - 1).map(MqlNot))

  test("parse(render(ast)) == ast over 500 random trees") {
    val params = Gen.Parameters.default
    var checked = 0
    (0 until 1000).foreach { i =>
      genExpr(3).apply(params, Seed(i.toLong)).foreach { e =>
        val rendered = Render.render(e)
        val reparsed = Parser.parse(rendered)
        assert(reparsed == e, s"seed $i rendered as: $rendered")
        checked += 1
      }
    }
    assert(checked >= 500, s"only $checked trees generated")
  }
}
