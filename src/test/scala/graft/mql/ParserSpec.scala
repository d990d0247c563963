package graft.mql

import graft.model.TimeUtils
import org.scalatest.funsuite.AnyFunSuite

/** Parser/date-range goldens (mirrors the reference's test_parse.py). */
class ParserSpec extends AnyFunSuite {

  test("comparisons and literals") {
    assert(Parser.parse("a == 5") == MqlCmp(MqlField("a"), CmpOp.Eq, MqlLit(5L)))
    assert(Parser.parse("a != 'x'") == MqlCmp(MqlField("a"), CmpOp.NotEq, MqlLit("x")))
    assert(Parser.parse("a >= 2.5") == MqlCmp(MqlField("a"), CmpOp.GtE, MqlLit(2.5)))
    assert(Parser.parse("a == None") == MqlCmp(MqlField("a"), CmpOp.Eq, MqlLit(null)))
    assert(Parser.parse("a == True") == MqlCmp(MqlField("a"), CmpOp.Eq, MqlLit(true)))
    assert(Parser.parse("a == -3") == MqlCmp(MqlField("a"), CmpOp.Eq, MqlLit(-3L)))
  }

  test("membership") {
    assert(Parser.parse("a in [1, 2, 3]") ==
      MqlCmp(MqlField("a"), CmpOp.In, MqlList(Seq(MqlLit(1L), MqlLit(2L), MqlLit(3L)))))
    assert(Parser.parse("a not in ['x', 'y']") ==
      MqlCmp(MqlField("a"), CmpOp.NotIn, MqlList(Seq(MqlLit("x"), MqlLit("y")))))
    // tuple syntax
    assert(Parser.parse("a in (1, 2)") ==
      MqlCmp(MqlField("a"), CmpOp.In, MqlList(Seq(MqlLit(1L), MqlLit(2L)))))
  }

  test("boolean combinators are n-ary") {
    val e = Parser.parse("a == 1 and b == 2 and c == 3")
    assert(e.isInstanceOf[MqlAnd] && e.asInstanceOf[MqlAnd].items.size == 3)
    val o = Parser.parse("a == 1 or b == 2 or c == 3")
    assert(o.isInstanceOf[MqlOr] && o.asInstanceOf[MqlOr].items.size == 3)
    assert(Parser.parse("not a == 1") == MqlNot(Parser.parse("a == 1")))
    // precedence: and binds tighter than or
    val p = Parser.parse("a == 1 or b == 2 and c == 3")
    assert(p.isInstanceOf[MqlOr])
  }

  test("calls: date / regex / iregex / empty") {
    assert(Parser.parse("a == date('2014-01-01')") ==
      MqlCmp(MqlField("a"), CmpOp.Eq, MqlDate(TimeUtils.dt2ts("2014-01-01"))))
    assert(Parser.parse("a == regex('^x')") ==
      MqlCmp(MqlField("a"), CmpOp.Eq, MqlRegex("^x", caseInsensitive = false)))
    assert(Parser.parse("a != iregex('y$')") ==
      MqlCmp(MqlField("a"), CmpOp.NotEq, MqlRegex("y$", caseInsensitive = true)))
    assert(Parser.parse("empty(tags)") == MqlEmpty(MqlField("tags")))
  }

  test("parse errors") {
    intercept[MqlParseException](Parser.parse("a =="))
    intercept[MqlParseException](Parser.parse("a == 'unterminated"))
    intercept[MqlParseException](Parser.parse("a == 1 extra"))
    intercept[MqlParseException](Parser.parse("=="))
  }

  test("date_range goldens (reference: parse.py:74-130, test_parse.py:54-76)") {
    import graft.model.Meta
    assert(DateRange.toMql(None).contains(s"${Meta.END} == None"))
    assert(DateRange.toMql(Some("~")).isEmpty)
    val d = "2014-01-01"
    val ep = TimeUtils.dt2ts(d)
    assert(DateRange.toMql(Some(d)).contains(
      s"_start < date('$d') and (_end >= date('$d') or _end == None)"))
    assert(DateRange.toMql(Some(s"~$d")).contains(s"_start < date('$d')"))
    assert(DateRange.toMql(Some(s"$d~")).contains(s"(_end >= date('$d') or _end == None)"))
    assert(DateRange.toMql(Some("2014-01-01~2014-02-01")).contains(
      "_start < date('2014-02-01') and (_end >= date('2014-01-01') or _end == None)"))
    assert(ep == 1388534400.0)
  }

  test("parse_fields normalization (reference: parse.py:37-71)") {
    assert(Fields.parseFields(null: String) == Nil)
    assert(Fields.parseFields("~") == Nil)
    assert(Fields.parseFields("B, a , a") == Seq("a", "b"))
    assert(Fields.applyDefaultFields(Seq("x")) == Seq("x", "_start", "_end", "_oid"))
    assert(Fields.applyDefaultFields(Nil) == Nil)
  }
}
