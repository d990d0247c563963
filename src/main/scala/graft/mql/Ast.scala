package graft.mql

/** AST for MQL — the reference's tiny Python-expression query language
  * (reference: metrique/parse.py:133-287). Values are parsed into this
  * engine-neutral tree, then compiled to Catalyst `Column`s by
  * [[Compiler]].
  */
sealed trait MqlExpr

/** Literal scalar: Long, Double, String, Boolean, or null (None). */
final case class MqlLit(value: Any) extends MqlExpr

/** A column reference. */
final case class MqlField(name: String) extends MqlExpr

/** List literal (membership RHS). */
final case class MqlList(items: Seq[MqlLit]) extends MqlExpr

/** `regex("pat")` / `iregex("pat")` call (reference: parse.py:227-245). */
final case class MqlRegex(pattern: String, caseInsensitive: Boolean) extends MqlExpr

/** `date("2014-01-01")` literal → epoch seconds (reference: parse.py:277-283). */
final case class MqlDate(epoch: Double) extends MqlExpr

/** Comparison operators (reference: parse.py:190-199 `op_dict`). */
object CmpOp extends Enumeration {
  val Eq, NotEq, Gt, GtE, Lt, LtE, In, NotIn = Value
}

/** `field <op> rhs` — rhs is a literal / list / regex / date. */
final case class MqlCmp(field: MqlField, op: CmpOp.Value, rhs: MqlExpr) extends MqlExpr

/** n-ary boolean combinators (reference: parse.py:175-188). */
final case class MqlAnd(items: Seq[MqlExpr]) extends MqlExpr
final case class MqlOr(items: Seq[MqlExpr]) extends MqlExpr
final case class MqlNot(item: MqlExpr) extends MqlExpr

/** `empty(field)` — array field has no elements (reference: parse.py:272-276). */
final case class MqlEmpty(field: MqlField) extends MqlExpr

final class MqlParseException(msg: String) extends RuntimeException(msg)
