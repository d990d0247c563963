package graft.mql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compile an MQL AST into a Catalyst `Column` predicate.
  *
  * Schema-aware: array-typed fields get the reference's array semantics
  * (ANY-element for `==`/`in`/regex, ALL-elements for `!=`/`not in`;
  * reference: metrique/parse.py:139-162,201-245). Everything compiles
  * to codegen'd builtins — `isin`, `rlike`, `exists`, `forall`,
  * `arrays_overlap`, `size` — so the filter enters Catalyst as an
  * ordinary predicate and reaches the parquet scan via pushdown.
  */
object Compiler {

  /** Compile `expr` into a boolean Column given the table schema. */
  def compile(expr: MqlExpr, schema: StructType): Column = {
    val arrays: Set[String] =
      schema.fields.collect { case f if f.dataType.isInstanceOf[ArrayType] => f.name }.toSet
    val known: Set[String] = schema.fieldNames.toSet
    compileExpr(expr, known, arrays)
  }

  /** Convenience: parse + compile. */
  def compile(query: String, schema: StructType): Column =
    compile(Parser.parse(query), schema)

  private def checkField(f: MqlField, known: Set[String]): Unit =
    if (known.nonEmpty && !known.contains(f.name))
      throw new MqlParseException(s"unknown field: ${f.name}")

  private def litOf(v: Any): Column = v match {
    case null => lit(null)
    case other => lit(other)
  }

  private def compileExpr(e: MqlExpr, known: Set[String], arrays: Set[String]): Column =
    e match {
      case MqlAnd(items) => items.map(compileExpr(_, known, arrays)).reduce(_ && _)
      case MqlOr(items) => items.map(compileExpr(_, known, arrays)).reduce(_ || _)
      case MqlNot(item) => !compileExpr(item, known, arrays)
      case MqlEmpty(f) =>
        checkField(f, known)
        // null containers are normalized to [] at ingest
        // (reference: core_api.py:490-494); treat null as empty too.
        coalesce(size(col(f.name)), lit(0)) === 0
      case MqlCmp(f, op, rhs) =>
        checkField(f, known)
        if (arrays.contains(f.name)) compileArrayCmp(col(f.name), op, rhs)
        else compileScalarCmp(col(f.name), op, rhs)
      case other =>
        throw new MqlParseException(s"expression is not a predicate: $other")
    }

  private def compileScalarCmp(c: Column, op: CmpOp.Value, rhs: MqlExpr): Column =
    (op, rhs) match {
      // None comparisons ⇒ null tests (reference: `_end == None`)
      case (CmpOp.Eq, MqlLit(null)) => c.isNull
      case (CmpOp.NotEq, MqlLit(null)) => c.isNotNull
      case (CmpOp.Eq, MqlLit(v)) => c === litOf(v)
      case (CmpOp.NotEq, MqlLit(v)) => c =!= litOf(v)
      case (CmpOp.Gt, MqlLit(v)) => c > litOf(v)
      case (CmpOp.GtE, MqlLit(v)) => c >= litOf(v)
      case (CmpOp.Lt, MqlLit(v)) => c < litOf(v)
      case (CmpOp.LtE, MqlLit(v)) => c <= litOf(v)
      case (CmpOp.Eq, MqlDate(ts)) => c === lit(ts)
      case (CmpOp.NotEq, MqlDate(ts)) => c =!= lit(ts)
      case (CmpOp.Gt, MqlDate(ts)) => c > lit(ts)
      case (CmpOp.GtE, MqlDate(ts)) => c >= lit(ts)
      case (CmpOp.Lt, MqlDate(ts)) => c < lit(ts)
      case (CmpOp.LtE, MqlDate(ts)) => c <= lit(ts)
      case (CmpOp.In, MqlList(items)) => inList(c, items)
      case (CmpOp.NotIn, MqlList(items)) => !inList(c, items)
      case (CmpOp.Eq, MqlRegex(p, ci)) => rlikeOf(c, p, ci)
      case (CmpOp.NotEq, MqlRegex(p, ci)) => !rlikeOf(c, p, ci)
      case (o, r) => throw new MqlParseException(s"unsupported comparison $o $r")
    }

  /** `in [..]` honoring None membership: `x in [None, 1]` matches nulls. */
  private def inList(c: Column, items: Seq[MqlLit]): Column = {
    val (nulls, vals) = items.partition(_.value == null)
    val base =
      if (vals.nonEmpty) c.isin(vals.map(_.value): _*)
      else lit(false)
    if (nulls.nonEmpty) base || c.isNull else base
  }

  private def rlikeOf(c: Column, pattern: String, ci: Boolean): Column =
    if (ci) c.rlike("(?i)" + pattern) else c.rlike(pattern)

  /** Array-field comparisons (reference: parse.py:201-245 `arr_op_dict` +
    * regex-array PG operators `~@`/`~*@`, sqlalchemy.py:1026-1039).
    */
  private def compileArrayCmp(c: Column, op: CmpOp.Value, rhs: MqlExpr): Column =
    (op, rhs) match {
      case (CmpOp.Eq, MqlLit(null)) => c.isNull || size(c) === 0
      case (CmpOp.NotEq, MqlLit(null)) => c.isNotNull && size(c) > 0
      case (CmpOp.Eq, MqlLit(v)) => array_contains(c, v)
      case (CmpOp.NotEq, MqlLit(v)) => forall(c, x => x =!= litOf(v))
      case (CmpOp.In, MqlList(items)) =>
        arrays_overlap(c, array(items.map(i => litOf(i.value)): _*))
      case (CmpOp.NotIn, MqlList(items)) =>
        !arrays_overlap(c, array(items.map(i => litOf(i.value)): _*))
      case (CmpOp.Eq, MqlRegex(p, ci)) => exists(c, x => rlikeOf(x, p, ci))
      case (CmpOp.NotEq, MqlRegex(p, ci)) => forall(c, x => !rlikeOf(x, p, ci))
      case (CmpOp.Gt, MqlLit(v)) => exists(c, x => x > litOf(v))
      case (CmpOp.GtE, MqlLit(v)) => exists(c, x => x >= litOf(v))
      case (CmpOp.Lt, MqlLit(v)) => exists(c, x => x < litOf(v))
      case (CmpOp.LtE, MqlLit(v)) => exists(c, x => x <= litOf(v))
      case (o, r) => throw new MqlParseException(s"unsupported array comparison $o $r")
    }
}
