package graft.mql

/** Render an MQL AST back to its surface syntax (parse ∘ render = id,
  * property-tested). Useful for composing programmatic queries with
  * the date-range fragments and for debugging.
  */
object Render {

  def render(e: MqlExpr): String = e match {
    case MqlLit(v) => lit(v)
    case MqlField(n) => n
    case MqlList(items) => items.map(i => lit(i.value)).mkString("[", ", ", "]")
    case MqlRegex(p, ci) =>
      (if (ci) "iregex(" else "regex(") + quote(p) + ")"
    case MqlDate(epoch) => s"date('${fmt(epoch)}')"
    case MqlCmp(f, op, rhs) => s"${f.name} ${opStr(op)} ${render(rhs)}"
    case MqlAnd(items) => items.map(paren).mkString(" and ")
    case MqlOr(items) => items.map(paren).mkString(" or ")
    case MqlNot(item) => s"not ${paren(item)}"
    case MqlEmpty(f) => s"empty(${f.name})"
  }

  private def paren(e: MqlExpr): String = e match {
    case _: MqlAnd | _: MqlOr | _: MqlNot => s"(${render(e)})"
    case _ => render(e)
  }

  private def opStr(op: CmpOp.Value): String = op match {
    case CmpOp.Eq => "=="
    case CmpOp.NotEq => "!="
    case CmpOp.Gt => ">"
    case CmpOp.GtE => ">="
    case CmpOp.Lt => "<"
    case CmpOp.LtE => "<="
    case CmpOp.In => "in"
    case CmpOp.NotIn => "not in"
  }

  private def lit(v: Any): String = v match {
    case null => "None"
    case true => "True"
    case false => "False"
    case s: String => quote(s)
    case d: Double => d.toString
    case other => other.toString
  }

  private def quote(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def fmt(epoch: Double): String =
    if (epoch == math.floor(epoch)) epoch.toLong.toString else epoch.toString
}
