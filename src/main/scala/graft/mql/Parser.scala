package graft.mql

import graft.model.TimeUtils

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled tokenizer + recursive-descent parser for MQL.
  *
  * The reference parses MQL with CPython's `ast.parse(mode='eval')` and
  * interprets the tree (reference: metrique/parse.py:133-287). The
  * grammar actually accepted is tiny, so we parse it directly:
  *
  * {{{
  * or_expr   := and_expr ('or' and_expr)*
  * and_expr  := not_expr ('and' not_expr)*
  * not_expr  := 'not' not_expr | cmp_expr
  * cmp_expr  := '(' or_expr ')'
  *            | 'empty' '(' NAME ')'
  *            | NAME (op rhs)?
  * op        := '==' '!=' '>' '>=' '<' '<=' 'in' | 'not' 'in'
  * rhs       := literal | list | 'date(..)' | '(i)regex(..)'
  * literal   := NUMBER | STRING | None | True | False
  * list      := '[' literal (',' literal)* ']' | '(' ... ')'
  * }}}
  */
object Parser {

  sealed trait Tok
  case class TName(s: String) extends Tok
  case class TNum(s: String) extends Tok
  case class TStr(s: String) extends Tok
  case class TOp(s: String) extends Tok
  case class TPunct(s: String) extends Tok

  def tokenize(input: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        out += TName(input.substring(start, i))
      } else if (c.isDigit || (c == '-' && i + 1 < n && input(i + 1).isDigit &&
          (out.isEmpty || out.last.isInstanceOf[TOp] || out.last == TPunct("[") ||
            out.last == TPunct("(") || out.last == TPunct(",")))) {
        val start = i
        i += 1
        while (i < n && (input(i).isDigit || input(i) == '.' ||
            input(i) == 'e' || input(i) == 'E' ||
            ((input(i) == '+' || input(i) == '-') &&
              (input(i - 1) == 'e' || input(i - 1) == 'E')))) i += 1
        out += TNum(input.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && input(i) != quote) {
          if (input(i) == '\\' && i + 1 < n) {
            i += 1
            sb += (input(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
          } else sb += input(i)
          i += 1
        }
        if (i >= n) throw new MqlParseException(s"unterminated string in: $input")
        i += 1
        out += TStr(sb.toString)
      } else if (c == '=' || c == '!' || c == '<' || c == '>') {
        if (i + 1 < n && input(i + 1) == '=') { out += TOp(input.substring(i, i + 2)); i += 2 }
        else if (c == '<' || c == '>') { out += TOp(c.toString); i += 1 }
        else throw new MqlParseException(s"bad operator at '$c' in: $input")
      } else if ("()[],".contains(c)) { out += TPunct(c.toString); i += 1 }
      else throw new MqlParseException(s"unexpected character '$c' in: $input")
    }
    out.toVector
  }

  def parse(input: String): MqlExpr = {
    val toks = tokenize(input)
    val p = new P(toks, input)
    val e = p.orExpr()
    p.expectEnd()
    e
  }

  private final class P(toks: Vector[Tok], src: String) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length) throw new MqlParseException(s"unexpected end of query: $src")
      val t = toks(pos); pos += 1; t
    }
    def expectEnd(): Unit =
      if (pos != toks.length)
        throw new MqlParseException(s"trailing tokens at ${toks(pos)} in: $src")
    private def expect(t: Tok): Unit = {
      val got = next()
      if (got != t) throw new MqlParseException(s"expected $t but got $got in: $src")
    }

    def orExpr(): MqlExpr = {
      val items = ArrayBuffer(andExpr())
      while (peek.contains(TName("or"))) { next(); items += andExpr() }
      if (items.size == 1) items.head else MqlOr(items.toSeq)
    }

    private def andExpr(): MqlExpr = {
      val items = ArrayBuffer(notExpr())
      while (peek.contains(TName("and"))) { next(); items += notExpr() }
      if (items.size == 1) items.head else MqlAnd(items.toSeq)
    }

    private def notExpr(): MqlExpr = peek match {
      case Some(TName("not")) if !isNotIn =>
        next(); MqlNot(notExpr())
      case _ => cmpExpr()
    }

    // distinguish `not <expr>` from a field named "not" (never valid anyway)
    private def isNotIn: Boolean = false

    private def cmpExpr(): MqlExpr = next() match {
      case TPunct("(") =>
        val e = orExpr(); expect(TPunct(")")); e
      case TName("empty") =>
        expect(TPunct("("))
        val f = next() match {
          case TName(n) => MqlField(n)
          case other => throw new MqlParseException(s"empty() wants a field, got $other")
        }
        expect(TPunct(")"))
        MqlEmpty(f)
      case TName(name) if !Set("and", "or", "not", "in").contains(name) =>
        peek match {
          case Some(TOp(op)) =>
            next()
            MqlCmp(MqlField(name), symbolOp(op), rhs())
          case Some(TName("in")) =>
            next()
            MqlCmp(MqlField(name), CmpOp.In, listRhs())
          case Some(TName("not")) =>
            next(); expect(TName("in"))
            MqlCmp(MqlField(name), CmpOp.NotIn, listRhs())
          case _ =>
            // bare truthy field: `f` ⇒ f == True (matches Python truthiness
            // only for booleans; reference queries never use bare non-bools)
            MqlCmp(MqlField(name), CmpOp.Eq, MqlLit(true))
        }
      case other => throw new MqlParseException(s"unexpected $other in: $src")
    }

    private def symbolOp(op: String): CmpOp.Value = op match {
      case "==" => CmpOp.Eq
      case "!=" => CmpOp.NotEq
      case ">" => CmpOp.Gt
      case ">=" => CmpOp.GtE
      case "<" => CmpOp.Lt
      case "<=" => CmpOp.LtE
      case other => throw new MqlParseException(s"unknown operator $other")
    }

    private def rhs(): MqlExpr = next() match {
      case TNum(s) => numLit(s)
      case TStr(s) => MqlLit(s)
      case TName("None") => MqlLit(null)
      case TName("True") => MqlLit(true)
      case TName("False") => MqlLit(false)
      case TName("date") =>
        expect(TPunct("("))
        val s = next() match {
          case TStr(v) => v
          case TNum(v) => v
          case other => throw new MqlParseException(s"date() wants a string, got $other")
        }
        expect(TPunct(")"))
        MqlDate(TimeUtils.dt2ts(s))
      case TName("regex") => regexCall(ci = false)
      case TName("iregex") => regexCall(ci = true)
      case TPunct("[") => listItems("]")
      case TPunct("(") => listItems(")")
      case other => throw new MqlParseException(s"bad comparison value $other in: $src")
    }

    private def regexCall(ci: Boolean): MqlExpr = {
      expect(TPunct("("))
      val pat = next() match {
        case TStr(v) => v
        case other => throw new MqlParseException(s"regex() wants a string, got $other")
      }
      expect(TPunct(")"))
      MqlRegex(pat, ci)
    }

    private def listRhs(): MqlExpr = next() match {
      case TPunct("[") => listItems("]")
      case TPunct("(") => listItems(")")
      case other => throw new MqlParseException(s"'in' wants a list, got $other in: $src")
    }

    private def listItems(close: String): MqlList = {
      val items = ArrayBuffer.empty[MqlLit]
      var done = peek.contains(TPunct(close))
      if (done) next()
      while (!done) {
        items += (next() match {
          case TNum(s) => numLit(s)
          case TStr(s) => MqlLit(s)
          case TName("None") => MqlLit(null)
          case TName("True") => MqlLit(true)
          case TName("False") => MqlLit(false)
          case other => throw new MqlParseException(s"bad list element $other")
        })
        next() match {
          case TPunct(",") => if (peek.contains(TPunct(close))) { next(); done = true }
          case TPunct(`close`) => done = true
          case other => throw new MqlParseException(s"expected ',' or '$close', got $other")
        }
      }
      MqlList(items.toSeq)
    }

    private def numLit(s: String): MqlLit =
      if (s.contains('.') || s.contains('e') || s.contains('E')) MqlLit(s.toDouble)
      else MqlLit(s.toLong)
  }
}
